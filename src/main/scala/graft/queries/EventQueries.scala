package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, conv, md5, substring}
import graft.Tables._
import graft.operators.EventOps

/** Event/windowing queries over `events`. Output timestamps are epoch
  * seconds (EventOps scaladoc: the parquet is ns, Spark truncates to µs —
  * epoch-floor makes results engine-portable; session boundaries compare
  * at µs so gap semantics are exact).
  */
object EventQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev1_tumbling" -> ((s, d) => EventOps.tumbling(events(s, d), "1 hour")),
    "ev2_sliding" -> ((s, d) =>
      EventOps.sliding(events(s, d), "1 hour", "30 minutes")),
    "ev3_session" -> ((s, d) =>
      EventOps.sessions(events(s, d), "30 minutes")),
    "ev4_latest" -> ((s, d) => EventOps.latestPerUser(events(s, d))),
    "ev5_json_agg" -> ((s, d) => EventOps.jsonKeyAgg(events(s, d))),
    // Banded range join: clicks within 30 minutes before each purchase.
    "ev7_band_join" -> ((s, d) =>
      EventOps.bandJoin(events(s, d), "30 minutes")),

    // Interval-overlap join with NO equi key (the case ev7 can't
    // express): per-(user, day) activity spans × corpus-wide "busy
    // hour" intervals (hours at >1.15x the mean rate — the threshold is
    // cross-multiplied integers, so it discriminates at every scale).
    // Lowered to a bin-replicated EQUI join with emit-once pair
    // dedup — never a nested-loop product.
    "ev19_interval_join" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val e = events(s, d).select(col("user_id"),
        unix_timestamp(col("ts")).as("es"))
      val spans = e.groupBy(col("user_id"), expr("es div 86400").as("day"))
        .agg(min(col("es")).as("a_start"),
          (max(col("es")) + 1L).as("a_end"))
      val hours = e.groupBy(expr("(es div 3600) * 3600").as("b_start"))
        .agg(count(lit(1)).as("n_events"))
      val tot = hours.agg(sum("n_events").as("_tot"),
        count(lit(1)).as("_h"))
      val busy = hours.crossJoin(broadcast(tot))
        .filter(col("n_events") * col("_h") * 20 > col("_tot") * 23)
        .select(col("b_start"), (col("b_start") + 3600L).as("b_end"),
          col("n_events"))
      EventOps.intervalOverlapJoin(spans, busy, binSec = 21600L)
        .select("user_id", "day", "a_start", "a_end", "b_start",
          "n_events")
    }),
    // Interval coalescing (union of overlapping intervals): each event
    // opens a 30-minute activity interval; overlapping-or-touching
    // intervals per user merge into maximal spans. One window shuffle
    // on user_id, running-max(end) span detection (nested intervals
    // correct), integer µs throughout.
    "ev20_interval_coalesce" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val iv = events(s, d).select(col("user_id"),
        unix_micros(col("ts")).as("ivs"),
        (unix_micros(col("ts")) + 1800000000L).as("ive"))
      EventOps.coalesceIntervals(iv, "user_id", "ivs", "ive")
        .select(col("user_id"), col("span_start"), col("span_end"),
          col("n_intervals"))
    }),
    // Nearest-within-tolerance as-of (merge_asof direction='nearest'):
    // each purchase takes the click minimizing |Δt| within 30 min,
    // EITHER direction, past-preferred on exact ties; unmatched
    // purchases survive with nulls. One union-sort shuffle, no join —
    // the exchange carries |purchases|+|clicks| rows, never the
    // candidate pairs.
    "ev21_asof_nearest" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      EventOps.asOfNearest(purchases, clicks, "user_id", "ts",
          toleranceUs = 1800000000L, rightCols = Seq("click_id"))
        .select(col("purchase_id"), col("user_id"),
          col("_m").getField("click_id").as("click_id"), col("delta_us"))
    }),

    // Spark-4 VARIANT path for semi-structured props: parse_json →
    // typed variant_get, then bucket agg (the engine-native JSON lane;
    // ev5 is the json_extract string lane).
    "ev9_variant" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      events(s, d)
        .select(col("value"),
          variant_get(parse_json(col("props")), "$.k", "int").as("k"))
        .groupBy((col("k") % 5).as("k_mod"))
        .agg(count(lit(1)).as("n"), round(max(col("value")), 2).as("max_v"))
    }),

    // Incremental view maintenance: per-user count/sum state built from
    // history (< Jan 20), advanced by the delta partition (>= Jan 20)
    // WITHOUT rescanning history — the merged result must equal the
    // full-corpus aggregate, which is exactly what the oracle computes.
    "ev14_incremental_agg" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val ev = events(s, d)
      val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
      val state = EventOps.aggState(ev.filter(col("ts") < cutoff),
        Seq("user_id"), "value")
      EventOps.mergeAggState(state, ev.filter(col("ts") >= cutoff),
          Seq("user_id"), "value")
        .select(col("user_id"), col("n"),
          round(col("total"), 2).as("total"))
    }),

    // Windowed ranking composition: the dominant event type per
    // tumbling hour — tumbling-window agg feeding the TopKPerKey heap
    // (top-1 per window, type-asc tiebreak).
    "ev17_top_per_window" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val hourly = events(s, d)
        .groupBy(((floor(unix_timestamp(col("ts")) / 3600) * 3600)
            .cast("long")).as("win_start"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      graft.plans.TopK.perKey(hourly, Seq("win_start"),
        Seq(col("n").desc, col("event_type").asc), 1)
    }),

    // Time-series resampling: per-user daily grid between first and
    // last event, empty days filled by last-observation-carried-forward.
    "ev15_gap_fill" -> ((s, d) =>
      EventOps.gapFillLocf(events(s, d), stepSec = 86400L)),

    // RANGE-frame trailing aggregate: 30-minute time-distance window
    // per user — peers by seconds, not row count (what rowsBetween
    // cannot express on irregular streams).
    "ev16_range_window" -> ((s, d) =>
      EventOps.trailingRangeSum(events(s, d), windowSec = 1800L)),

    // Trailing-baseline k-sigma anomaly flags, cross-multiplied to
    // exact integers on cent-quantized values — no division, sqrt, or
    // float accumulation anywhere, so the flag column replays
    // bit-exactly (the gopherRules discipline on a RANGE frame). The
    // 3-day window matches the corpus's ~7 h median per-user gap:
    // 74% of events clear minBase=5 and k=2 flags ~9% — every path
    // (thin history / clean / flagged) fires at the gated scales.
    "ev18_anomaly" -> ((s, d) =>
      EventOps.anomalyFlags(events(s, d), windowSec = 259200L,
        k = 2L, minBase = 5L)),

    // Event-transition matrix: consecutive (prev → next) event-type
    // pairs per user with mean gap (lag window exercise).
    "ev8_transitions" -> ((s, d) => EventOps.transitions(events(s, d))),

    // Funnel: view → click → purchase, strictly ordered per user, over
    // a SPARSE md5-sampled event slice — on the full dense corpus every
    // user completes and the oracle compare would have zero
    // discrimination (a constant column catches no ordering bugs).
    "ev10_funnel" -> ((s, d) => {
      val sparse = events(s, d).filter(
        conv(substring(md5(col("event_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 20 === 0)
      EventOps.funnel(sparse, Seq("view", "click", "purchase"))
    }),

    // Cohort retention by integer week since the corpus epoch.
    "ev11_retention" -> ((s, d) => EventOps.retention(events(s, d))),

    // SCD2-style state timeline: each user's event-type history as
    // validity intervals (next event closes the previous interval).
    "ev13_state_timeline" -> ((s, d) =>
      EventOps.stateTimeline(events(s, d), "user_id", "event_type")),

    // Recency-weighted event value per type (half-life ≈ 7 days).
    "ev12_decayed" -> ((s, d) =>
      EventOps.decayedSum(events(s, d), "event_type", "value",
        asOf = "2024-03-01", lambda = 0.1)),
    // As-of join: each purchase matched to the user's latest click at or
    // before it (point-in-time lookup; EventOps.asOfJoin composition).
    "ev6_asof" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("event_id").as("click_event"),
          unix_micros(col("ts")).as("click_us"))
      EventOps.asOfJoin(purchases, clicks, "user_id", "ts",
          Seq("click_event", "click_us"))
        .select(col("event_id"), col("user_id"),
          col("_match.click_event").as("click_id"),
          col("_match.click_us").as("click_us"))
    })
  )

  val oracles: Map[String, String] = Map(
    "ev17_top_per_window" ->
      """WITH h AS (SELECT (floor(epoch(ts))::BIGINT // 3600) * 3600
                      AS win_start,
                    event_type, count(*) AS n
                    FROM events GROUP BY win_start, event_type)
         SELECT win_start, event_type, n, rk FROM (
           SELECT win_start, event_type, n,
             row_number() OVER (PARTITION BY win_start
               ORDER BY n DESC, event_type ASC)::INT AS rk
           FROM h)
         WHERE rk <= 1""",
    "ev15_gap_fill" ->
      """WITH s AS (SELECT user_id,
                      (floor(epoch(ts))::BIGINT // 86400) * 86400 AS slot,
                      value
                    FROM events),
         sa AS (SELECT user_id, slot, round(sum(value), 2) AS slot_value
                FROM s GROUP BY user_id, slot),
         sp AS (SELECT user_id,
                  unnest(range(lo, hi + 86400, 86400)) AS slot
                FROM (SELECT user_id, min(slot) AS lo, max(slot) AS hi
                      FROM s GROUP BY user_id)),
         j AS (SELECT sp.user_id, sp.slot, sa.slot_value
               FROM sp LEFT JOIN sa USING (user_id, slot))
         SELECT user_id, slot, slot_value IS NOT NULL AS observed,
           last_value(slot_value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY slot
             ROWS UNBOUNDED PRECEDING) AS filled
         FROM j""",
    "ev16_range_window" ->
      """SELECT event_id, user_id,
           floor(epoch(ts))::BIGINT AS epoch_s,
           round(sum(value) OVER (PARTITION BY user_id
             ORDER BY floor(epoch(ts))::BIGINT
             RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW), 2)
             AS trailing_sum
         FROM events""",
    "ev19_interval_join" ->
      """WITH e AS (
           SELECT user_id, floor(epoch(ts))::BIGINT AS es FROM events),
         spans AS (
           SELECT user_id, es // 86400 AS day, min(es) AS a_start,
             max(es) + 1 AS a_end
           FROM e GROUP BY 1, 2),
         hours AS (
           SELECT (es // 3600) * 3600 AS b_start, count(*) AS n_events
           FROM e GROUP BY 1),
         tot AS (SELECT sum(n_events)::BIGINT AS t, count(*) AS h
                 FROM hours),
         busy AS (SELECT b_start, b_start + 3600 AS b_end, n_events
                  FROM hours, tot WHERE n_events * h * 20 > t * 23)
         SELECT s.user_id, s.day, s.a_start, s.a_end, b.b_start,
           b.n_events
         FROM spans s JOIN busy b
           ON s.a_start < b.b_end AND b.b_start < s.a_end""",
    "ev21_asof_nearest" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'purchase'),
         c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click'),
         cand AS (SELECT p.event_id AS purchase_id, p.user_id,
                    c.event_id AS click_id,
                    abs(epoch_us(c.ts) - epoch_us(p.ts)) AS ad,
                    CASE WHEN epoch_us(c.ts) <= epoch_us(p.ts)
                         THEN 0 ELSE 1 END AS dir
                  FROM p JOIN c ON p.user_id = c.user_id
                   AND abs(epoch_us(c.ts) - epoch_us(p.ts)) <= 1800000000),
         best AS (SELECT purchase_id, click_id, ad FROM cand
                  QUALIFY row_number() OVER (PARTITION BY purchase_id
                    ORDER BY ad, dir) = 1)
         SELECT p.event_id AS purchase_id, p.user_id, b.click_id,
           b.ad AS delta_us
         FROM p LEFT JOIN best b ON b.purchase_id = p.event_id""",
    "ev20_interval_coalesce" ->
      """WITH iv AS (
           SELECT user_id, epoch_us(ts) AS ivs,
             epoch_us(ts) + 1800000000 AS ive
           FROM events),
         f AS (
           SELECT user_id, ivs, ive,
             CASE WHEN max(ive) OVER pv IS NULL
                    OR ivs > max(ive) OVER pv
                  THEN 1 ELSE 0 END AS brk
           FROM iv
           WINDOW pv AS (PARTITION BY user_id ORDER BY ivs, ive
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         g AS (
           SELECT user_id, ivs, ive,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ivs, ive
               ROWS UNBOUNDED PRECEDING) AS span
           FROM f)
         SELECT user_id, min(ivs) AS span_start, max(ive) AS span_end,
           count(*) AS n_intervals
         FROM g GROUP BY user_id, span""",
    "ev18_anomaly" ->
      """WITH e AS (
           SELECT event_id, user_id, floor(epoch(ts))::BIGINT AS epoch_s,
             round(value * 100)::BIGINT AS cents
           FROM events),
         w AS (
           SELECT event_id, user_id, epoch_s, cents,
             count(*) OVER fr AS n_base,
             coalesce(sum(cents) OVER fr, 0)::BIGINT AS s,
             coalesce(sum(cents * cents) OVER fr, 0)::BIGINT AS q
           FROM e
           WINDOW fr AS (PARTITION BY user_id ORDER BY epoch_s
             RANGE BETWEEN 259200 PRECEDING AND 1 PRECEDING))
         SELECT event_id, user_id, epoch_s, cents, n_base,
           n_base >= 5 AS enough_history,
           (n_base >= 5 AND
            (n_base * cents - s) * (n_base * cents - s) >
              4 * (n_base * q - s * s)) AS flagged
         FROM w""",
    // the incremental state merge must be indistinguishable from the
    // full-corpus aggregate
    "ev14_incremental_agg" ->
      """SELECT user_id, count(*) AS n, round(sum(value), 2) AS total
         FROM events GROUP BY user_id""",
    "ev1_tumbling" ->
      """SELECT (floor(epoch(ts))::BIGINT // 3600) * 3600 AS win_start,
           event_type, count(*) AS n, round(sum(value), 2) AS total
         FROM events GROUP BY win_start, event_type""",
    // sliding(1h, 30m): each event belongs to exactly two windows —
    // the 30-min-aligned starts at floor30(ts) and floor30(ts)-1800
    "ev2_sliding" ->
      """WITH e AS (
           SELECT event_type, value,
             (floor(epoch(ts))::BIGINT // 1800) * 1800 AS es30
           FROM events),
         w AS (SELECT event_type, value,
                 unnest([es30, es30 - 1800]) AS win_start FROM e)
         SELECT win_start, event_type, count(*) AS n,
           round(sum(value), 2) AS total
         FROM w GROUP BY win_start, event_type""",
    // session_window(30 min): merge while gap < 30min (µs precision);
    // session_start = floor-seconds of the first event
    "ev3_session" ->
      """WITH e AS (SELECT user_id, value, epoch_us(ts) AS us FROM events),
         f AS (SELECT user_id, value, us,
                 CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                        >= 1800000000
                      OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                      THEN 1 ELSE 0 END AS brk
               FROM e),
         g AS (SELECT user_id, value, us,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY us
                                ROWS UNBOUNDED PRECEDING) AS sid
               FROM f)
         SELECT user_id, (min(us) // 1000000)::BIGINT AS session_start,
           count(*) AS n_events, round(sum(value), 2) AS total
         FROM g GROUP BY user_id, sid""",
    "ev4_latest" ->
      """SELECT user_id, event_id, event_type, round(value, 2) AS value
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts) DESC, event_id DESC) AS rk
               FROM events)
         WHERE rk = 1""",
    "ev5_json_agg" ->
      """SELECT (json_extract_string(props, '$.k')::INTEGER % 10) AS k_bucket,
           count(*) AS n, round(sum(value), 2) AS total
         FROM events GROUP BY k_bucket""",
    "ev7_band_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
           count(c.user_id) AS n_clicks
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON p.user_id = c.user_id
          AND epoch_us(c.ts) >= epoch_us(p.ts) - 1800000000
          AND epoch_us(c.ts) < epoch_us(p.ts)
         GROUP BY purchase_id, p.user_id""",
    "ev9_variant" ->
      """SELECT (json_extract_string(props, '$.k')::INTEGER % 5) AS k_mod,
           count(*) AS n, round(max(value), 2) AS max_v
         FROM events GROUP BY k_mod""",
    "ev13_state_timeline" ->
      """SELECT user_id, event_type,
           epoch_us(ts) AS valid_from,
           lead(epoch_us(ts)) OVER (PARTITION BY user_id
             ORDER BY ts, event_id) AS valid_to
         FROM events""",
    "ev12_decayed" ->
      """SELECT event_type, count(*) AS n,
           round(sum(value *
             exp(-0.1 * date_diff('day', ts::DATE, DATE '2024-03-01'))), 4)
             AS decayed_total
         FROM events GROUP BY event_type""",
    "ev11_retention" ->
      """WITH w AS (SELECT user_id,
                      -- floor, not //: DuckDB's // truncates toward
                      -- zero, Spark's floor() rounds toward -inf, and
                      -- they disagree on pre-epoch events
                      floor(date_diff('day', DATE '2024-01-01', ts::DATE)
                        / 7.0)::INT AS wk
                    FROM events),
         c AS (SELECT user_id, min(wk) AS cohort FROM w GROUP BY user_id)
         SELECT c.cohort AS cohort_week, w.wk - c.cohort AS week_offset,
           count(DISTINCT w.user_id) AS n_users
         FROM w JOIN c ON w.user_id = c.user_id
         GROUP BY 1, 2""",
    "ev10_funnel" ->
      """WITH ev AS (SELECT * FROM events
                     WHERE ('0x' || substr(md5(event_id::VARCHAR), 1, 8))
                       ::UBIGINT % 20 = 0),
         s1 AS (SELECT user_id, min(row(ts, event_id)) AS p
                     FROM ev WHERE event_type = 'view'
                     GROUP BY user_id),
         s2 AS (SELECT e.user_id, min(row(e.ts, e.event_id)) AS p
                FROM ev e JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'click' AND row(e.ts, e.event_id) > s1.p
                GROUP BY e.user_id),
         s3 AS (SELECT e.user_id, min(row(e.ts, e.event_id)) AS p
                FROM ev e JOIN s2 ON e.user_id = s2.user_id
                WHERE e.event_type = 'purchase'
                  AND row(e.ts, e.event_id) > s2.p
                GROUP BY e.user_id)
         SELECT u.user_id,
           CASE WHEN s3.user_id IS NOT NULL THEN 3
                WHEN s2.user_id IS NOT NULL THEN 2
                WHEN s1.user_id IS NOT NULL THEN 1
                ELSE 0 END AS steps_reached,
           s3.user_id IS NOT NULL AS completed
         FROM (SELECT DISTINCT user_id FROM ev) u
         LEFT JOIN s1 ON u.user_id = s1.user_id
         LEFT JOIN s2 ON u.user_id = s2.user_id
         LEFT JOIN s3 ON u.user_id = s3.user_id""",
    "ev8_transitions" ->
      """WITH o AS (
           SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS gap_us
           FROM events)
         SELECT prev_type, event_type, count(*) AS n,
           round(avg(gap_us) / 1000000, 2) AS avg_gap_s
         FROM o WHERE prev_type IS NOT NULL
         GROUP BY prev_type, event_type""",
    "ev6_asof" ->
      """SELECT p.event_id, p.user_id, c.event_id AS click_id,
           epoch_us(c.ts) AS click_us
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON p.user_id = c.user_id AND p.ts >= c.ts"""
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{array_join, broadcast, col, count,
  expr, lit, sum, unix_timestamp, when, window}
import graft.streaming.{StreamParity, StreamingOps}

/** Oracle-gated drains of the Structured Streaming surface (st*).
  *
  * Each lane runs a REAL [[StreamingOps]] operator as a stream — file
  * source over the driver's events table, watermarked stateful
  * processing, `Trigger.AvailableNow` — drains it to completion, and
  * returns the final batch frame for the standard DuckDB
  * rows/schema/hash gate. The emission semantics the oracles encode
  * (ms-floored final watermark, append emits window/session END ≤
  * watermark, single-file source ⇒ one data batch + finalize batch)
  * are pinned in [[graft.streaming.StreamParity]]'s scaladoc and
  * StreamParitySpec.
  *
  * Watermark delay is 2 hours everywhere here, so every lane's output
  * genuinely exercises the emission cutoff: the trailing ~2h of
  * windows/sessions exist in state but are NOT emitted, and the oracle
  * must reproduce exactly that boundary (a delay longer than the
  * corpus would emit nothing; zero delay would emit everything and
  * verify no watermark behavior at all).
  */
object StreamParityQueries {

  private val WM = "2 hours"
  /** DuckDB fragment: the final watermark in µs — max event time
    * floored to ms (Spark tracks event-time stats in ms) minus the 2h
    * delay. */
  private val WmCte =
    "wm AS (SELECT (epoch_us(max(ts))//1000)*1000 - 7200000000 AS wm_us FROM events)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Watermarked tumbling-window agg drained in append mode: emitted
    // windows are exactly those finalized by the last watermark.
    "st1_stream_tumbling" -> ((s, d) =>
      StreamParity.drainAppend(
        StreamingOps.tumblingStream(
          StreamParity.eventsStream(s, d), "1 hour", WM))),

    // Sliding windows (1h width / 30m slide): two open windows per
    // event, same append-mode emission rule per window.
    "st2_stream_sliding" -> ((s, d) =>
      StreamParity.drainAppend(
        StreamingOps.slidingStream(
          StreamParity.eventsStream(s, d), "1 hour", "30 minutes", WM))),

    // Session windows per user (30m gap): a session ends gap after its
    // last event; emitted once the watermark passes that end.
    "st3_stream_session" -> ((s, d) =>
      StreamParity.drainAppend(
        StreamingOps.sessionStream(
          StreamParity.eventsStream(s, d), "30 minutes", WM))),

    // Within-watermark dedup on a COARSE key, projected to the key:
    // which physical row survives is arrival-order-dependent, the set
    // of keys is not — so the key set is the verifiable surface.
    "st4_stream_distinct" -> ((s, d) =>
      StreamParity.drainAppend(
        StreamParity.eventsStream(s, d)
          .withWatermark("ts", WM)
          .dropDuplicatesWithinWatermark("user_id", "event_type")
          .select(col("user_id"), col("event_type")))),

    // Stream-stream interval join (clicks within 30m before each
    // purchase): with the fixed input set fully drained, the emitted
    // pair set equals the batch interval join.
    "st5_stream_attribution" -> ((s, d) => {
      val ev = StreamParity.eventsStream(s, d)
      StreamParity.drainAppend(
        StreamingOps.clickAttributionStream(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"),
          "30 minutes", WM))
    }),

    // mapGroupsWithState running totals with the EXACT integer-cents
    // accumulator (bit-identical under any batch split / replay —
    // which is precisely what makes it oracle-gatable; the double twin
    // stays golden). Update-mode drain over one data batch = final
    // state per user.
    "st6_stream_running" -> ((s, d) =>
      StreamParity.drainUpdate(
        StreamingOps.runningTotalsCents(s,
          StreamParity.eventsStream(s, d)))),

    // Misra-Gries heavy hitters per 6h window. k=32 exceeds the
    // event-type cardinality so the sketch is provably exact here —
    // this lane verifies the streaming WINDOW/emission path end-to-end
    // (the sketch's approximation contract under k < distinct is
    // tx43's probe, not this gate).
    "st7_stream_heavy" -> ((s, d) =>
      StreamParity.drainAppend(
        StreamingOps.heavyHittersStream(
          StreamParity.eventsStream(s, d),
          "event_type", "ts", "6 hours", 32, WM))),

    // Per-key admission quota (flatMapGroupsWithState): WHICH rows are
    // admitted is arrival-order-dependent — that is what admission
    // means — but the admitted COUNT per (user, 6h window) is the
    // CONTRACT: min(offered, quota), order-independent and plain SQL.
    // That contract is the gated surface; the admitted-ids-are-a-
    // subset-of-offered half stays in StreamingSpec. quota=3 caps 46
    // (user, window) groups at sf0.01 and leaves 7631 under it, so
    // both admission branches fire.
    "st8_stream_quota" -> ((s, d) =>
      StreamParity.drainAppend(
        StreamingOps.perKeyQuotaStream(s,
          StreamParity.eventsStream(s, d),
          windowSec = 21600L, quota = 3L, watermark = WM))
        .groupBy(col("user_id"), col("win_start"))
        .agg(count(lit(1)).as("n_admitted"))),

    // Inactivity alerts (EventTimeTimeout): with a fixed drained input
    // the TIMER path is deterministic too — batch 0 builds per-user
    // state (watermark still 0, nothing fires), the finalize batch
    // advances the watermark to max(ts)-2h and fires exactly the
    // users whose (ms-floored last_seen + gap) timeout lies below it.
    // gap=6h alerts 72/150 users at sf0.01 (710/1500 at sf0.1), so
    // both the fired and still-live branches are exercised. This gates
    // the state-TIMEOUT half of flatMapGroupsWithState that st8's
    // admission lane doesn't touch.
    "st9_stream_inactivity" -> ((s, d) =>
      StreamParity.drainAppend(
        StreamingOps.inactivityAlerts(s,
          StreamParity.eventsStream(s, d),
          gapSec = 21600L, watermark = WM))),

    // upsertSink end-to-end: two drains through the versioned-snapshot
    // CDC sink — initial publish, then an idempotent anti-join
    // re-apply onto v=1 — gated on the final snapshot (= last event
    // row per user; (user_id, ts) is unique on the corpus so the
    // producer-retry fingerprint tiebreak never decides). See
    // StreamParity.upsertParity.
    "st10_stream_upsert" -> ((s, d) => StreamParity.upsertParity(s, d)),

    // Streaming heavy hitters: the MG sketch IS the streaming state
    // (≤ k entries per open window vs per-distinct-item state of a
    // plain groupBy). Sketch CONTENT is merge-order-sensitive; the
    // CONTRACT is not — any item above n/(k+1) per finalized window is
    // present, estimates undercount by ≤ n/(k+1) and never overcount —
    // so the gated surface is the tx43/tx5 shape: exact counts of the
    // frequent items (SQL-replayable) plus the contract booleans the
    // oracle asserts as literal TRUE, all cross-multiplied to exact
    // integers. Item skew (every 5th user folded to 'hot', ~20% of
    // events vs the n/9 = 11% threshold) guarantees a frequent item
    // per window, and ~120 distinct items/window against capacity 8
    // keeps EVICTION constantly exercised — a sketch that never evicts
    // verifies nothing (the tx46 8×2 lesson).
    "st11_stream_heavy" -> ((s, d) => {
      val k = 8
      val item = when(col("user_id") % 5 === 0, lit("hot"))
        .otherwise(col("user_id").cast("string")).as("item")
      val drained = StreamParity.drainAppend(
        StreamingOps.heavyHittersStream(
          StreamParity.eventsStream(s, d).select(item, col("ts")),
          "item", "ts", "1 day", k = k, watermark = WM))
      val ev = graft.Tables.events(s, d).select(item, col("ts"))
      val winStart = unix_timestamp(
        window(col("ts"), "1 day").getField("start"))
      val wmF = ev.agg(expr(
        "unix_micros(max(ts)) div 1000 * 1000 - 7200000000").as("wm_us"))
      val perItem = ev.groupBy(winStart.as("win_start"), col("item"))
        .agg(count(lit(1)).as("exact_count"))
      val perWin = perItem.groupBy("win_start")
        .agg(sum("exact_count").as("n"))
      val est = col("est")
      perItem
        .join(broadcast(perWin), "win_start")
        .crossJoin(broadcast(wmF))
        .filter((col("win_start") + 86400L) * 1000000L <= col("wm_us"))
        .filter(col("exact_count") * (k + 1) > col("n"))
        .join(drained, Seq("win_start", "item"), "left")
        .select(col("win_start"), col("item"), col("exact_count"),
          est.isNotNull.as("guaranteed_present"),
          (est.isNotNull && est <= col("exact_count") &&
            (col("exact_count") - est) * (k + 1) <= col("n"))
            .as("est_within_bound"))
    }),

    // Stream-static enrichment join: each event picks up its user's
    // nation from a STATIC dimension (customer ⋈ nation, broadcast) —
    // joined statelessly per micro-batch, no dimension row ever enters
    // a state store — then a watermarked 6h tumbling aggregate per
    // nation. The emitted windows obey the same append-mode cutoff as
    // st1, so this gates the one streaming join shape st5's
    // stream-stream lane doesn't: static-side enrichment.
    "st12_stream_enrich" -> ((s, d) => {
      val dim = graft.Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))
        .join(broadcast(graft.Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name"))
      StreamParity.drainAppend(
        StreamingOps.enrichedWindowStream(
          StreamParity.eventsStream(s, d), dim, "6 hours", WM))
    }),

    // LEFT OUTER stream-stream interval join: st5's matched pairs PLUS
    // a click_id-NULL row per provably-unmatched purchase, emitted on
    // state eviction. The operative watermark is the MIN of the two
    // sides' own watermarks (each withWatermark sits above its
    // event_type filter, so clicks and purchases track separate
    // ms-floored maxima; multipleWatermarkPolicy=min) — the oracle
    // encodes that, measured/bracketed at both sfs. This gates the
    // state-EVICTION emission path of stream-stream joins that st5's
    // inner lane never exercises, plus the min-of-watermarks rule
    // itself.
    "st13_stream_outer" -> ((s, d) => {
      val ev = StreamParity.eventsStream(s, d)
      StreamParity.drainAppend(
        StreamingOps.clickAttributionOuterStream(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"),
          "30 minutes", WM))
    }),

    // FULL-outer stream-stream interval join (st19): st13 gates only
    // the LEFT side's eviction path; here BOTH sides emit null-padded
    // rows on expiry, and the two sides evict at DIFFERENT watermark
    // offsets (purchases at purchase_ts, clicks at click_ts + window —
    // the range condition's forward interval), which the oracle
    // encodes exactly. Min-of-sides operative watermark as in st13.
    "st19_stream_fullouter" -> ((s, d) => {
      val ev = StreamParity.eventsStream(s, d)
      StreamParity.drainAppend(
        StreamingOps.clickAttributionFullOuterStream(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"),
          "30 minutes", WM))
    }),

    // STREAMING media ingest (st14): the real BMP synth + decode
    // kernels run UNCHANGED on a readStream — stateless mapPartitions
    // compose with Structured Streaming by construction, and this lane
    // gates it end-to-end (schema, encoder, batch shape) rather than
    // asserting it: the drained rows must hash-equal mm8's batch
    // semantics. No watermark — stateless append emits every decoded
    // row exactly once under AvailableNow; corrupt payloads stay
    // in-band exactly as in batch.
    "st14_stream_decode" -> ((s, d) => {
      import graft.operators.MultimodalOps
      StreamParity.drainAppend(
        MultimodalOps.decodeImageFeatures(
          MultimodalOps.synthBmpAssets(
            StreamParity.documentsStream(s, d), "doc_id"))
          .select(col("asset_id"), col("img_w"), col("img_h"),
            col("sum_r"), col("sum_g"), col("sum_b"), col("decoded")))
    }),

    // STATEFUL streaming on real-kernel rows (st15): st14 gates the
    // stateless decode stream; this lane pushes the decoded
    // fingerprints through the STATE STORE — aHash over the mm12 pair
    // fixture, then dropDuplicatesWithinWatermark on the fingerprint
    // (the st4 pattern on media rows). Every row carries the SAME
    // event time, so the watermark never passes it, no key ever
    // expires, and the drained output is exactly the distinct
    // fingerprint set — which physical row survives per key is
    // arrival-dependent, the key set is not (st4's verifiable-surface
    // rule).
    "st15_stream_neardup" -> ((s, d) => {
      import graft.operators.MultimodalOps
      StreamParity.drainAppend(
        MultimodalOps.aHashBits(
          MultimodalOps.synthBmpPairAssets(
            StreamParity.documentsStream(s, d), "doc_id"))
          .withColumn("ts",
            lit("2020-01-01 00:00:00").cast("timestamp"))
          .withWatermark("ts", WM)
          .dropDuplicatesWithinWatermark("ahash_bits")
          .select(col("ahash_bits")))
    }),

    // STREAMING containment (st16): mm16's frame-hash vote as a
    // stream-STATIC join — the ingest-time twin of mm21. The streamed
    // clips (%5 = 0) decode and hash per micro-batch, the state store
    // dedupes (asset, fhash) (st15's constant-event-time discipline),
    // and the join probes the PERSISTED mm21 index. Scale shape: the
    // static side is pre-filtered to corpus buckets <= cap (an
    // index-only bucket past the cap — the all-zeros flat hash — can
    // never survive the full-universe cap, so it must never reach the
    // streaming join where it would fan out against every flat stream
    // clip), which bounds per-stream-row fan-out at cap. The EXACT
    // full-universe cap (stream members included) and the >= 2 vote run
    // post-drain on the drained candidates: for any fhash with an index
    // member, drained rows carry the complete stream-side bucket, so
    // stream_n + index_n is exactly the rebuild's bucket size — the
    // oracle replays mm16's capped universe restricted to
    // (stream, corpus) pairs.
    "st16_stream_containment" -> ((s, d) => {
      import graft.operators.{FrameIndexFixture, MultimodalOps}
      val index = graft.Tables.immutablePath(s, FrameIndexFixture.dir(s, d))
        .select(col("asset_id").as("b"), col("fhash"))
      val indexN = index.groupBy("fhash").agg(count(lit(1)).as("_in"))
      val probed = index.join(indexN.filter(col("_in") <= 8), Seq("fhash"))
      val streamFh = MultimodalOps.videoFrameHashes(
          MultimodalOps.synthY4mTrimAssets(
            StreamParity.documentsStream(s, d), "doc_id")
            .filter(col("asset_id") % 5 === 0))
        .filter(col("fhash").isNotNull)
        .withColumn("ts", lit("2020-01-01 00:00:00").cast("timestamp"))
        .withWatermark("ts", WM)
        .dropDuplicatesWithinWatermark("asset_id", "fhash")
        .select(col("asset_id").as("a"), col("fhash"))
      val drained = StreamParity.drainAppend(
        streamFh.join(probed, Seq("fhash"))
          .select(col("a"), col("b"), col("fhash"), col("_in")))
      val streamN = drained.select("a", "fhash").distinct()
        .groupBy("fhash").agg(count(lit(1)).as("_sn"))
      drained.join(streamN, Seq("fhash"))
        .filter(col("_sn") + col("_in") <= 8)
        .groupBy("a", "b").agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 2)
    }),

    // STREAMING quality gate (st17): dq3's row-level constraint tagger
    // running at INGEST time — the shape a 100-TB pipeline actually
    // wants (bad rows tagged and routed the moment they land, not in a
    // nightly batch). tagViolations is one stateless narrow projection,
    // so it composes with Structured Streaming by construction; the
    // lane gates the composition end-to-end per ROW (tag content, not
    // just counts): drained rows carry each document's violation names
    // in check order plus the quarantine verdict, hash-equal to the
    // batch tagger's semantics replayed analytically. NULL predicates
    // fail closed, exactly as in batch.
    "st17_stream_quality" -> ((s, d) => {
      import graft.operators.DataQualityOps
      import graft.operators.DataQualityOps._
      StreamParity.drainAppend(
        DataQualityOps.tagViolations(
          StreamParity.documentsStream(s, d), Seq(
            rowInSet("lang", Seq("en", "de", "fr")),
            rowMin("n_chars", 50L),
            rowMax("n_chars", 520L)))
          .select(col("doc_id"),
            array_join(col("violations"), ",").as("violations"),
            col("_quarantined").as("quarantined")))
    }),

    // STREAMING caption ingest (st18): the mm26 VTT cue profile
    // running unchanged on a readStream — sidecars arrive with their
    // media and the cue statistics (incl. the strict in-band miss for
    // torn files) are computed at ingest, st14's discipline on the
    // timed-text modality. Stateless append; drained rows hash-equal
    // the batch profile's semantics.
    "st18_stream_captions" -> ((s, d) => {
      import graft.operators.MultimodalOps
      StreamParity.drainAppend(
        MultimodalOps.vttCueProfile(
          MultimodalOps.synthVttAssets(
            StreamParity.documentsStream(s, d), "doc_id"))
          .select(col("asset_id"), col("n_cues"), col("total_cue_ms"),
            col("n_overlaps"), col("n_lines"), col("parsed")))
    }),

    // STREAMING crawl ingest (st20): the mm32 WARC container walk
    // running unchanged on a readStream — crawl archives arrive as a
    // stream in production and the record census (types, payload
    // octets, response digest, in-band corrupt taxonomy) is computed
    // at ingest. Stateless append (mapPartitions codec kernel);
    // drained rows hash-equal the batch walk's semantics.
    "st20_stream_warc" -> ((s, d) => {
      import graft.operators.MultimodalOps
      StreamParity.drainAppend(
        MultimodalOps.warcProfile(
          MultimodalOps.synthWarcAssets(
            StreamParity.documentsStream(s, d), "doc_id", "text"))
          .select(col("asset_id"), col("n_records"), col("n_warcinfo"),
            col("n_request"), col("n_response"), col("n_metadata"),
            col("payload_bytes"), col("response_md5"), col("parsed")))
    })
  )

  val oracles: Map[String, String] = Map(
    "st1_stream_tumbling" ->
      s"""WITH $WmCte
         SELECT (floor(epoch(ts))::BIGINT // 3600) * 3600 AS win_start,
           event_type, count(*) AS n, round(sum(value), 2) AS total
         FROM events, wm
         WHERE ((floor(epoch(ts))::BIGINT // 3600) * 3600 + 3600) * 1000000
               <= wm_us
         GROUP BY win_start, event_type""",
    "st2_stream_sliding" ->
      s"""WITH $WmCte,
         e AS (SELECT event_type, value,
                 (floor(epoch(ts))::BIGINT // 1800) * 1800 AS es30
               FROM events),
         w AS (SELECT event_type, value,
                 unnest([es30, es30 - 1800]) AS win_start FROM e)
         SELECT win_start, event_type, count(*) AS n,
           round(sum(value), 2) AS total
         FROM w, wm
         WHERE (win_start + 3600) * 1000000 <= wm_us
         GROUP BY win_start, event_type""",
    // ev3's sessionization plus the emission cutoff: session end =
    // last event + gap, emitted iff end <= final watermark.
    "st3_stream_session" ->
      s"""WITH $WmCte,
         e AS (SELECT user_id, value, epoch_us(ts) AS us FROM events),
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
         FROM g, wm GROUP BY user_id, sid, wm_us
         HAVING max(us) + 1800000000 <= wm_us""",
    "st4_stream_distinct" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    "st5_stream_attribution" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
           c.event_id AS click_id
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         JOIN (SELECT * FROM events WHERE event_type = 'click') c
           ON p.user_id = c.user_id
          AND epoch_us(c.ts) >= epoch_us(p.ts) - 1800000000
          AND epoch_us(c.ts) < epoch_us(p.ts)""",
    "st6_stream_running" ->
      """SELECT user_id, count(*) AS n,
           sum(round(value * 100)::BIGINT)::BIGINT AS total_cents
         FROM events GROUP BY user_id""",
    "st7_stream_heavy" ->
      s"""WITH $WmCte
         SELECT (floor(epoch(ts))::BIGINT // 21600) * 21600 AS win_start,
           event_type AS item, count(*) AS est
         FROM events, wm
         WHERE ((floor(epoch(ts))::BIGINT // 21600) * 21600 + 21600) * 1000000
               <= wm_us
         GROUP BY win_start, item""",
    // admitted = min(offered, quota) per (user, 6h window); the
    // operator's window start is ms-floored to the window boundary,
    // which equals the epoch-seconds floor for positive timestamps.
    "st8_stream_quota" ->
      """SELECT user_id,
           (floor(epoch(ts))::BIGINT // 21600) * 21600 AS win_start,
           least(count(*), 3) AS n_admitted
         FROM events GROUP BY user_id, win_start""",
    // timeout timestamp = ms-floored last-seen + gap (the operator sets
    // it in ms); fires when STRICTLY below the final watermark.
    "st9_stream_inactivity" ->
      s"""WITH $WmCte,
         u AS (SELECT user_id, count(*) AS n_events,
                 max(epoch_us(ts)) AS last_us
               FROM events GROUP BY user_id)
         SELECT user_id, n_events, last_us AS last_seen_us
         FROM u, wm
         WHERE (last_us // 1000) * 1000 + 21600000000 < wm_us""",
    "st10_stream_upsert" ->
      """SELECT user_id, ts_us, event_id, value FROM (
           SELECT user_id, epoch_us(ts) AS ts_us, event_id, value,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC) AS rn
           FROM events)
         WHERE rn = 1""",
    // the MG contract per finalized window is provable from exact SQL
    // alone, so both sketch-side booleans are asserted literal TRUE
    "st11_stream_heavy" ->
      s"""WITH $WmCte,
         it AS (SELECT CASE WHEN user_id % 5 = 0 THEN 'hot'
                       ELSE user_id::VARCHAR END AS item,
                  (floor(epoch(ts))::BIGINT // 86400) * 86400 AS win_start
                FROM events),
         fin AS (SELECT item, win_start FROM it, wm
                 WHERE (win_start + 86400) * 1000000 <= wm_us),
         ex AS (SELECT win_start, item, count(*) AS exact_count
                FROM fin GROUP BY 1, 2),
         tot AS (SELECT win_start, count(*) AS n FROM fin GROUP BY 1)
         SELECT e.win_start, e.item, e.exact_count,
           TRUE AS guaranteed_present, TRUE AS est_within_bound
         FROM ex e JOIN tot t USING (win_start)
         WHERE e.exact_count * 9 > t.n""",
    // matched pairs emit unconditionally (inner results are not
    // watermark-gated in append mode); the outer NULL row for an
    // unmatched purchase emits iff the JOIN's final watermark passes
    // its event time. That watermark is NOT the WmCte one: each side's
    // withWatermark sits above its event_type filter, so each side
    // tracks its OWN ms-floored max and the engine takes the MIN
    // (multipleWatermarkPolicy=min) — measured at both sfs, the
    // emitted/withheld split brackets exactly this min-of-sides value
    // and rejects both the all-events watermark and any window-width
    // offset.
    "st13_stream_outer" ->
      """WITH wm2 AS (SELECT least(
           (SELECT (epoch_us(max(ts))//1000)*1000 FROM events
            WHERE event_type = 'click'),
           (SELECT (epoch_us(max(ts))//1000)*1000 FROM events
            WHERE event_type = 'purchase')) - 7200000000 AS wm_us),
         p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click'),
         m AS (SELECT p.event_id AS purchase_id, p.user_id,
                 c.event_id AS click_id
               FROM p JOIN c ON p.user_id = c.user_id
                AND epoch_us(c.ts) >= epoch_us(p.ts) - 1800000000
                AND epoch_us(c.ts) < epoch_us(p.ts))
         SELECT purchase_id, user_id, click_id FROM m
         UNION ALL
         SELECT p.event_id, p.user_id, NULL::BIGINT
         FROM p, wm2
         WHERE p.event_id NOT IN (SELECT purchase_id FROM m)
           AND epoch_us(p.ts) < wm_us""",
    // st13's min-of-sides watermark, TWO eviction cutoffs: purchases
    // unmatched emit once wm passes purchase_ts; clicks unmatched emit
    // once wm passes click_ts + the 30-minute forward match interval
    // (the state watermark Spark derives from the range condition) —
    // the 1800000000 us offset brackets exactly that trailing edge
    "st19_stream_fullouter" ->
      """WITH wm2 AS (SELECT least(
           (SELECT (epoch_us(max(ts))//1000)*1000 FROM events
            WHERE event_type = 'click'),
           (SELECT (epoch_us(max(ts))//1000)*1000 FROM events
            WHERE event_type = 'purchase')) - 7200000000 AS wm_us),
         p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click'),
         m AS (SELECT p.event_id AS purchase_id, p.user_id,
                 c.event_id AS click_id
               FROM p JOIN c ON p.user_id = c.user_id
                AND epoch_us(c.ts) >= epoch_us(p.ts) - 1800000000
                AND epoch_us(c.ts) < epoch_us(p.ts))
         SELECT purchase_id, user_id, click_id FROM m
         UNION ALL
         SELECT p.event_id, p.user_id, NULL::BIGINT
         FROM p, wm2
         WHERE p.event_id NOT IN (SELECT purchase_id FROM m)
           AND epoch_us(p.ts) < wm_us
         UNION ALL
         SELECT NULL::BIGINT, c.user_id, c.event_id
         FROM c, wm2
         WHERE c.event_id NOT IN (SELECT click_id FROM m)
           AND epoch_us(c.ts) + 1800000000 < wm_us""",
    "st12_stream_enrich" ->
      s"""WITH $WmCte
         SELECT (floor(epoch(ts))::BIGINT // 21600) * 21600 AS win_start,
           n_name, count(*) AS n, round(sum(value), 2) AS total
         FROM events e
         JOIN customer c ON e.user_id = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey, wm
         WHERE ((floor(epoch(ts))::BIGINT // 21600) * 21600 + 21600)
               * 1000000 <= wm_us
         GROUP BY win_start, n_name""",

    // st14 is stateless: the drained stream must equal mm8's batch
    // semantics exactly — same analytic-decode CTE, no watermark cutoff
    "st14_stream_decode" ->
      s"""WITH ${MultimodalQueries.sumsCte}
         SELECT id AS asset_id,
           CASE WHEN id % 13 = 0 THEN NULL ELSE w::INT END AS img_w,
           CASE WHEN id % 13 = 0 THEN NULL ELSE h::INT END AS img_h,
           CASE WHEN id % 13 = 0 THEN NULL ELSE sr END AS sum_r,
           CASE WHEN id % 13 = 0 THEN NULL ELSE sg END AS sum_g,
           CASE WHEN id % 13 = 0 THEN NULL ELSE sb END AS sum_b,
           (id % 13 <> 0) AS decoded
         FROM sums""",

    // st15's state-store dedup drained to completion equals batch
    // DISTINCT over the analytically replayed fingerprints (constant
    // event time → no key expiry → the full distinct set, exactly once)
    "st15_stream_neardup" ->
      s"""WITH ${MultimodalQueries.ahashBitsCte}
         SELECT DISTINCT ahash_bits FROM bits""",

    // st16 drained to completion equals mm16's capped containment vote
    // restricted to (streamed clip, corpus clip) pairs: the full
    // analytic frame-hash CTE (bucket cap over ALL ids — the streaming
    // lane reconstructs exactly this via index_n + drained stream_n),
    // sides split on the %5 ingest rule, no l<r needed (disjoint)
    "st16_stream_containment" ->
      s"""WITH ${MultimodalQueries.frameCappedCte}
SELECT l.id AS a, r.id AS b, count(*)::BIGINT AS shared
FROM capped l JOIN capped r ON l.fhash = r.fhash
WHERE l.id % 5 = 0 AND r.id % 5 <> 0
GROUP BY 1, 2
HAVING count(*) >= 2""",

    // st17 is stateless: drained rows ≡ the batch tagger per row —
    // violation names concatenated in check order (names are
    // comma-free so the join is unambiguous), NULL predicates fail
    // closed via the same coalesce
    "st17_stream_quality" ->
      """WITH v AS (SELECT doc_id,
           NOT coalesce(lang IN ('en','de','fr'), FALSE) AS v_set,
           NOT coalesce(n_chars >= 50, FALSE) AS v_min,
           NOT coalesce(n_chars <= 520, FALSE) AS v_max
         FROM documents)
         SELECT doc_id,
           substr(
             (CASE WHEN v_set THEN ',in_set(lang)' ELSE '' END)
             || (CASE WHEN v_min THEN ',min(n_chars)' ELSE '' END)
             || (CASE WHEN v_max THEN ',max(n_chars)' ELSE '' END), 2)
             AS violations,
           v_set OR v_min OR v_max AS quarantined
         FROM v""",

    // st18 is stateless: the drained stream must equal mm26's batch
    // cue-profile semantics exactly — same analytic oracle
    "st18_stream_captions" -> MultimodalQueries.oracles("mm26_vtt_cues"),

    // st20 is stateless: drained WARC census ≡ mm32's batch semantics
    "st20_stream_warc" -> MultimodalQueries.oracles("mm32_warc_walk")
  )
}

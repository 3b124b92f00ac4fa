package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props). Batch forms here;
  * `graft.streaming.StreamingOps` runs the same aggregations under
  * Structured Streaming with watermarks.
  *
  * Scale: every aggregation shuffles exactly once on its natural key
  * (window/type, user). Timestamps are compared in epoch seconds at the
  * output boundary so results are portable across engines with different
  * sub-second precision (the source parquet is ns; Spark truncates to µs).
  */
object EventOps {

  /** Tumbling-window aggregation (fixed windows). */
  def tumbling(events: DataFrame, width: String): DataFrame =
    events.groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(unix_timestamp(col("w.start")).as("win_start"),
        col("event_type"), col("n"), col("total"))

  /** Sliding-window aggregation: each event lands in width/slide windows. */
  def sliding(events: DataFrame, width: String, slide: String): DataFrame =
    events.groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(unix_timestamp(col("w.start")).as("win_start"),
        col("event_type"), col("n"), col("total"))

  /** Session-window aggregation per user: sessions close after `gap` of
    * inactivity. Session start = first event's ts (Spark's session_window
    * start; its `end` is last event + gap, deliberately not emitted so
    * the output is engine-portable).
    */
  def sessions(events: DataFrame, gap: String): DataFrame =
    events.groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total"))
      .select(col("user_id"),
        unix_timestamp(col("w.start")).as("session_start"),
        col("n_events"), col("total"))

  /** Keep-latest dedup: the most recent event per user (window rank, one
    * shuffle on user_id — the standard changelog-compaction shape).
    */
  def latestPerUser(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    events.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        round(col("value"), 2).as("value"))
  }

  /** As-of join: attach to each `left` row the LATEST `right` row with
    * the same key and `right.time <= left.time` (inclusive — the classic
    * point-in-time lookup).
    *
    * Spark lacks the operator; per the preference ladder this is
    * composition (a), not a custom plan: tag both sides, union, and take
    * a running `last(..., ignoreNulls)` over (key, time) with right rows
    * ordered before left rows at equal timestamps. ONE shuffle on the
    * key, no range-explosion join, no per-row subquery — the same plan
    * at 60k rows and at 100 TB (skewed keys split by AQE).
    *
    * Returns all `left` columns plus `_match` (struct of `rightCols`,
    * null when no prior right row exists).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               time: String, rightCols: Seq[String]): DataFrame = {
    val r = right.select(
      col(key), col(time),
      struct(rightCols.map(col): _*).as("_r"),
      lit(1).as("_isR"))
    val l = left.withColumn("_isR", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    // _r joins the sort key so duplicate right-side (key, time) rows
    // have a TOTAL order (struct comparison is lexicographic over
    // time + rightCols): last() then picks the max _r deterministically
    // instead of a partition-order-dependent winner.
    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col("_isR").desc, col("_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_isR") === 0)
      .drop("_r", "_isR")
  }

  /** Nearest-within-tolerance as-of join (merge_asof direction =
    * 'nearest'): each left row picks the right row minimizing |Δt|
    * within `toleranceUs`, ties broken toward the PAST row (the
    * backward-join convention); duplicate right-side (key, time) rows
    * resolve to the max payload struct via the window's total order,
    * so determinism does NOT rest on right-side uniqueness. Same
    * union-sort trick as [[asOfJoin]] — no join
    * at all: ONE shuffle on the key and two RUNNING `last` frames, one
    * over the forward sort (nearest past right row) and one over the
    * reversed sort (nearest future; same-ts rights sort ahead of the
    * left row in both directions, so a Δ=0 match arrives — once — via
    * the past side's tie-break). Both frames are
    * (unboundedPreceding, currentRow), the ONLY frame shape Spark
    * evaluates incrementally: the obvious one-sort alternative —
    * `first over (1, unboundedFollowing)` — re-scans to the partition
    * end for EVERY row (O(n²) per key; measured 117 s vs 3 s on the
    * PerfCompare asof probe before this form). The candidate pair
    * never materializes — the exchange carries exactly |L| + |R| rows,
    * vs the band join's |L|·(candidates) intermediate; the band join
    * wins only when the tolerance window is sparse (PERF.md measures
    * both regimes). Unmatched left rows survive with nulls (the
    * no-match branch is data, not absence).
    */
  def asOfNearest(left: DataFrame, right: DataFrame, key: String,
                  time: String, toleranceUs: Long,
                  rightCols: Seq[String]): DataFrame = {
    val r = right.select(
      col(key), col(time),
      struct((col(time) +: rightCols.map(col)): _*).as("_r"),
      lit(1).as("_isR"))
    val l = left.withColumn("_isR", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    // _r in the sort key totalizes the order under duplicate right-side
    // (key, time) rows — without it, last(_r) over either frame picks a
    // partition-order-dependent winner (and the oracle's row_number tie
    // is equally nondeterministic, so the gate could flake). Struct
    // comparison is lexicographic over (time, rightCols), so both
    // frames agree on which duplicate wins: the max struct.
    val fwd = Window.partitionBy(key)
      .orderBy(col(time).asc, col("_isR").desc, col("_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rev = Window.partitionBy(key)
      .orderBy(col(time).desc, col("_isR").desc, col("_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val past = last(col("_r"), ignoreNulls = true).over(fwd)
    val future = last(col("_r"), ignoreNulls = true).over(rev)
    val t = unix_micros(col(time))
    val bd = t - unix_micros(col("_past").getField(time))
    val fd = unix_micros(col("_fut").getField(time)) - t
    val backOk = col("_past").isNotNull && bd <= toleranceUs
    val fwdOk = col("_fut").isNotNull && fd <= toleranceUs
    u.withColumn("_past", past).withColumn("_fut", future)
      .filter(col("_isR") === 0)
      .withColumn("_m",
        when(backOk && (!fwdOk || bd <= fd), col("_past"))
          .when(fwdOk, col("_fut")))
      .withColumn("delta_us",
        abs(unix_micros(col("_m").getField(time)) - t))
      .drop("_past", "_fut", "_isR")
  }

  /** Banded (range) self-join: for each purchase event, count the same
    * user's click events in the preceding `window` (funnel attribution).
    *
    * The equality key (`user_id`) makes this a plain shuffled equi-join
    * with the time band as a join-time filter — NOT a nested-loop range
    * join — so it's one shuffle on user_id at any scale, and the band
    * bounds the per-key match blowup. Skewed power-users split via AQE.
    */
  def bandJoin(events: DataFrame, window: String = "30 minutes"): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(c, p("user_id") === c("c_user") &&
        c("c_ts") >= p("p_ts") - expr(s"INTERVAL $window") &&
        c("c_ts") < p("p_ts"), "left")
      .groupBy("purchase_id", "user_id")
      .agg(count(col("c_user")).as("n_clicks"))
  }

  /** Interval-overlap join with NO equality key — the case [[bandJoin]]
    * cannot express (there, `user_id` carries the shuffle; here nothing
    * does, and a naive formulation is a broadcast-nested-loop over the
    * full cross product). Inputs are half-open integer intervals:
    * `a(a_start, a_end, …)` × `b(b_start, b_end, …)`, emit every pair
    * with `a_start < b_end AND b_start < a_end`.
    *
    * Scale shape — bin replication, the standard distributed range-join
    * lowering: each interval is exploded to the `binSec`-sized time
    * bins it covers (a `sequence` explode — narrow, no shuffle), the
    * join runs as a plain EQUI join on the bin id, and each surviving
    * pair is emitted EXACTLY ONCE by keeping it only in the canonical
    * bin containing `greatest(a_start, b_start)` — a point that lies in
    * the intersection, hence in exactly one bin both sides replicated
    * to (the dd15 emit-once discipline, so no distinct exchange
    * downstream). Shuffle volume is rows × replication where
    * replication ≈ interval_length/binSec + 1: pick binSec near the
    * TYPICAL interval length (~2× replication); the in-column
    * `maxBinsPerInterval` guard fails loudly when an outlier interval
    * would fan out past it (the sourceOverlap idiom — a degenerate
    * month-long interval silently exploding to 10⁵ bins is how this
    * pattern dies at scale; cap it, or split the long-interval stratum
    * to a broadcast side first). Bin-id skew (rush-hour bins) is AQE's
    * skew-join case, same as any hot equi key.
    */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame, binSec: Long,
                          maxBinsPerInterval: Int = 64): DataFrame = {
    require(binSec > 0, s"binSec must be positive: $binSec")
    def binned(df: DataFrame, s: String, e: String): DataFrame = {
      val lo = expr(s"$s div $binSec")
      val hi = expr(s"($e - 1) div $binSec")
      // Guard BOTH directions before sequencing. An inverted interval
      // (end < start) makes hi - lo negative, which passes the upper
      // bound but turns sequence(lo, hi) into a step=-1 generator of
      // |lo-hi|+1 bins — one corrupt row fans out unbounded, the exact
      // blowup the cap exists to stop. A zero-length interval
      // (end == start) is empty under the half-open semantics yet can
      // still satisfy the emitted predicate (b_start < a_end = a_start
      // < b_end), so both degenerate shapes fail loudly here rather
      // than corrupting the output.
      val guarded = when(col(e) <= col(s), raise_error(
        concat(lit("intervalOverlapJoin: empty or inverted interval ["),
          col(s).cast("string"), lit(", "), col(e).cast("string"),
          lit(") — half-open intervals require start < end; filter or" +
            " repair degenerate rows before joining"))))
        .when(hi - lo < maxBinsPerInterval, sequence(lo, hi))
        .otherwise(raise_error(
        concat(lit("intervalOverlapJoin: an interval spans "),
          (hi - lo + 1).cast("string"),
          lit(s" bins, over maxBinsPerInterval=$maxBinsPerInterval —" +
            " raise binSec or route long intervals separately"))))
      df.withColumn("_bin", explode(guarded))
    }
    val ab = binned(a, "a_start", "a_end")
    val bb = binned(b, "b_start", "b_end")
    ab.join(bb, ab("_bin") === bb("_bin") &&
        col("a_start") < col("b_end") && col("b_start") < col("a_end") &&
        ab("_bin") ===
          expr(s"greatest(a_start, b_start) div $binSec"))
      .drop("_bin")
  }

  /** JSON property extraction + aggregation (the `props` column is a JSON
    * string; extraction stays codegen'd via get_json_object).
    */
  /** Event-transition matrix: per user, order events by (ts, event_id)
    * and count each consecutive (prev_type → type) pair with its mean
    * gap. The lag window is keyed on user_id, so each user's timeline
    * sorts independently; the final agg has ~|types|² keys.
    */
  def transitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val us = unix_micros(col("ts"))
    events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("gap_us", us - lag(us, 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("n"),
        round(avg(col("gap_us")) / 1000000L, 2).as("avg_gap_s"))
  }

  def jsonKeyAgg(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))

  /** State timeline (SCD2-style interval versioning): each event opens
    * a validity interval for its key that the key's NEXT event closes —
    * one lead() window per key, no self-join. The open (current)
    * interval has a null `valid_to`. Timestamps are emitted as epoch
    * microseconds (the repo-wide event-time convention).
    */
  def stateTimeline(events: DataFrame, keyCol: String,
                    stateCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col("ts"), col("event_id"))
    events
      .select(col(keyCol), col(stateCol), col("ts"), col("event_id"),
        unix_micros(col("ts")).as("valid_from"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .select(col(keyCol), col(stateCol), col("valid_from"),
        col("valid_to"))
  }

  /** Time-decayed aggregate: recency-weighted value per key,
    * `sum(value * exp(-lambda * age_days))` against a fixed `asOf`
    * anchor. Age is INTEGER day arithmetic (engine-exact); exp() and
    * the summation order are NOT bit-guaranteed across engines — the
    * output rounding is what makes the cross-engine compare stable
    * (the repo-wide convention for aggregated doubles). Map-side
    * partial agg; one keyed shuffle.
    */
  def decayedSum(events: DataFrame, keyCol: String, valueCol: String,
                 asOf: String, lambda: Double): DataFrame = {
    val age = datediff(lit(asOf).cast("date"), col("ts").cast("date"))
    events
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        round(sum(col(valueCol) * exp(lit(-lambda) * age)), 4)
          .as("decayed_total"))
  }

  /** Cohort retention: users bucketed by the week of their FIRST event
    * (integer weeks since `epochDate` — integer math, not calendar
    * truncation, so any engine replays it exactly), counted distinct in
    * each later week offset. Two keyed shuffles (per-user min, the
    * cohort×offset distinct); the per-user cohort rides a broadcast-able
    * frame at any realistic user cardinality — and when it isn't, the
    * join is an equi-join on user_id that AQE can split.
    */
  def retention(events: DataFrame,
                epochDate: String = "2024-01-01"): DataFrame = {
    val wk = floor(datediff(col("ts").cast("date"),
      lit(epochDate).cast("date")) / 7).cast("int")
    val weeks = events.select(col("user_id"), wk.as("_wk"))
    val cohorts = weeks.groupBy("user_id").agg(min("_wk").as("_cohort"))
    weeks.join(cohorts, Seq("user_id"))
      .groupBy(col("_cohort").as("cohort_week"),
        (col("_wk") - col("_cohort")).as("week_offset"))
      .agg(countDistinct("user_id").as("n_users"))
  }

  /** Time-series gap filling with last-observation-carried-forward:
    * per key, generate the full `stepSec` grid between the key's first
    * and last event (row-local `sequence` + explode — no driver-side
    * spine, no cross join), attach each slot's own aggregate where one
    * exists, and fill empty slots with the most recent earlier value
    * (`last(ignoreNulls)` over an unbounded-preceding window). The
    * resampling primitive for regularizing irregular event streams.
    *
    * Scale shape: one keyed agg for the per-key span, one explode
    * (grid-sized, bounded by span/step), one keyed agg for slot
    * values, one join on (key, slot), one window per key — every wide
    * op keyed by the entity, so parallelism is the key cardinality.
    */
  def gapFillLocf(events: DataFrame, stepSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val slotted = events.select(col("user_id"),
      (floor(unix_timestamp(col("ts")) / stepSec) * stepSec).as("slot"),
      col("value"))
    val slotAgg = slotted.groupBy(col("user_id"), col("slot"))
      .agg(round(sum(col("value")), 2).as("slot_value"))
    val spine = slotted.groupBy(col("user_id"))
      .agg(min(col("slot")).as("_lo"), max(col("slot")).as("_hi"))
      .select(col("user_id"),
        explode(sequence(col("_lo"), col("_hi"), lit(stepSec)))
          .as("slot"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(slotAgg, Seq("user_id", "slot"), "left")
      .select(col("user_id"), col("slot"),
        col("slot_value").isNotNull.as("observed"),
        last(col("slot_value"), ignoreNulls = true).over(w).as("filled"))
  }

  /** Trailing RANGE-frame aggregate: per key, the sum of `value` over
    * the `windowSec`-second interval ending at each event — a range
    * frame over event time (peers by time distance, not row count),
    * the semantics a rows-frame cannot express on irregular streams.
    * One window shuffle on the key.
    */
  def trailingRangeSum(events: DataFrame, windowSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("_es"))
      .rangeBetween(-windowSec, 0)
    events
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("_es"), col("value"))
      .withColumn("trailing_sum", round(sum(col("value")).over(w), 2))
      .select(col("event_id"), col("user_id"), col("_es").as("epoch_s"),
        col("trailing_sum"))
  }

  /** Trailing-baseline anomaly flags: each event compared against the
    * `windowSec`-second RANGE frame of the SAME key's PRIOR events
    * (frame upper bound −1 s, so the event never baselines itself and
    * same-second peers are excluded identically in any engine — the
    * frame is defined by time distance, not row peers, so ties in the
    * timestamp cannot reorder it). The test is the classic k-sigma
    * rule |x − mean| > k·σ, but cross-multiplied to EXACT integers on
    * cent-quantized values: with n = baseline count, s = Σcents,
    * q = Σcents², flag iff (n·x − s)² > k²·(n·q − s²) — algebraically
    * n²·(x−mean)² > k²·n·(n·Var), i.e. the same predicate with no
    * division, no sqrt, and no float accumulation anywhere, so the
    * report is bit-identical under any partitioning and replays
    * exactly in the oracle (the gopherRules cross-multiplication
    * discipline applied to streaming-shaped analytics). Events with
    * fewer than `minBase` baseline points are never flagged
    * (`enough_history` carries the reason in-band). A zero-variance
    * baseline flags ANY deviation — the deterministic reading of
    * k·σ = 0.
    *
    * One window shuffle on the key; count/sum/sum-of-squares share the
    * single frame. Overflow headroom: every term is bounded by
    * (n·max|cents|)², which must stay under 2⁶³ — i.e. keep
    * n·max|cents| below 3·10⁹ (e.g. 10⁴ baseline events of ≤ $3000
    * each); beyond that rescale the quantization first. ANSI mode
    * faults loudly on the boundary rather than wrapping.
    */
  def anomalyFlags(events: DataFrame, windowSec: Long, k: Long = 3L,
                   minBase: Long = 5L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowSec > 0 && k > 0 && minBase >= 1,
      s"bad anomalyFlags params: windowSec=$windowSec k=$k minBase=$minBase")
    val w = Window.partitionBy(col("user_id")).orderBy(col("_es"))
      .rangeBetween(-windowSec, -1)
    val lhsRoot = col("n_base") * col("cents") - col("_s")
    val rhs = lit(k * k) *
      (col("n_base") * col("_q") - col("_s") * col("_s"))
    events
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("_es"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("n_base", count(lit(1)).over(w))
      .withColumn("_s", coalesce(sum(col("cents")).over(w), lit(0L)))
      .withColumn("_q",
        coalesce(sum(col("cents") * col("cents")).over(w), lit(0L)))
      .select(col("event_id"), col("user_id"), col("_es").as("epoch_s"),
        col("cents"), col("n_base"),
        (col("n_base") >= minBase).as("enough_history"),
        (col("n_base") >= minBase &&
          lhsRoot * lhsRoot > rhs).as("flagged"))
  }

  /** Partial-aggregate STATE of a keyed count/sum — the persistable
    * half of incremental view maintenance: an aggregate-sized table
    * (key, n, total) that [[mergeAggState]] can advance with new data
    * without ever rescanning history. count+sum are the canonical
    * mergeable pair (avg = total/n at read time; min/max merge the
    * same way).
    */
  def aggState(events: DataFrame, keyCols: Seq[String],
               valueCol: String): DataFrame =
    events.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))

  /** Advance an aggregate state by a delta: aggregate ONLY the delta,
    * union its partials with the state, and combine with one keyed agg
    * over aggregate-sized inputs. This is incremental view maintenance
    * for distributive aggregates — at 100 TB the nightly refresh scans
    * the new partition, not the corpus; the merge cost is proportional
    * to the KEY cardinality, not history size.
    */
  def mergeAggState(state: DataFrame, delta: DataFrame,
                    keyCols: Seq[String], valueCol: String): DataFrame =
    state.unionByName(aggState(delta, keyCols, valueCol))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("total")).as("total"))

  /** Funnel progression per user: how far through the ordered `steps`
    * each user's event sequence gets (a later step must occur strictly
    * AFTER the matched earlier one in (ts, event_id) order). One keyed
    * shuffle: collect + sort each user's (ts, event_id, type) triples,
    * then a row-local greedy fold walks the sequence against the steps
    * — greedy earliest-match is optimal for subsequence reach, so this
    * equals the per-step min-after formulation without its per-step
    * join passes.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // non-step types can never advance the fold: the when() makes them
    // null and collect_list SKIPS nulls, so only matchable rows enter
    // the agg buffers (and the sort) while every user — including
    // zero-step users the funnel must still report — keeps a group
    val seq = sort_array(collect_list(
      when(col("event_type").isin(steps: _*),
        struct(col("ts"), col("event_id"), col("event_type")))))
    events
      .groupBy("user_id")
      .agg(seq.as("_seq"))
      .select(col("user_id"),
        aggregate(col("_seq"), lit(0), (acc, x) =>
          when(acc < lit(steps.size) &&
              x.getField("event_type") ===
                element_at(typedLit(steps), acc + 1),
            acc + 1).otherwise(acc)).as("steps_reached"))
      .withColumn("completed", col("steps_reached") === lit(steps.size))
  }

  /** Coalesce per-key overlapping-or-touching intervals into maximal
    * spans (the interval-union operator: activity spans from padded
    * event instants, copyright windows, lease periods). Input rows
    * carry `[startCol, endCol]` longs; two intervals merge when the
    * later one starts at or before the running maximum end seen so far
    * (`start <= max(prev ends)` — strictly-after starts open a new
    * span, so touching endpoints DO merge).
    *
    * Shape: ONE shuffle on the key (the window sort), then a map-side
    * span-id scan and a partial-aggregated groupBy that reuses the same
    * partitioning — Catalyst plans the second shuffle away because the
    * grouping keys extend the window partition key. The running
    * `max(end)` (not `lag(end)`) is what makes nested intervals
    * correct: a long interval swallowing several short ones keeps the
    * span open however the short ones interleave. All arithmetic is
    * integer, so the result is bit-identical across partitionings and
    * engines. Skew note: one key's intervals sort in one task — for a
    * pathological single-key corpus, pre-split the key by a coarse
    * time bucket whose width exceeds the max interval length, coalesce
    * per (key, bucket), then merge ACROSS bucket boundaries with one
    * more pass over the per-bucket boundary spans (bounded: ≤ 2 rows
    * per bucket).
    */
  def coalesceIntervals(df: DataFrame, keyCol: String,
                        startCol: String, endCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    df.withColumn("_new_span",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("_span", sum(col("_new_span"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("_span"))
      .agg(min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_intervals"))
      .drop("_span")
  }

  /** Skew-robust twin of [[coalesceIntervals]] (identical result set,
    * property-tested equal): a key whose intervals all sort in ONE
    * window task caps [[coalesceIntervals]]'s parallelism at the key
    * count — fatal when one hot key carries most of the corpus (a
    * bot's activity log, the `null`-like catch-all key). Two stages:
    *
    *  1. per (key, `floor(start / bucketWidth)`) union — a hot key's
    *     buckets coalesce in PARALLEL tasks; each bucket's output is
    *     its locally-maximal spans with their interval counts;
    *  2. per-key union OVER THE BUCKET SPANS (running-max window again,
    *     counts summed). Correct with no precondition on `bucketWidth`
    *     vs interval length: the union of per-bucket unions is the
    *     union, and stage 2 re-links any chain that crosses bucket
    *     boundaries — including an interval longer than a whole bucket
    *     swallowing spans several buckets to its right.
    *
    * Stage 2 still sorts one hot key in one task, but over per-bucket
    * SPANS, not raw intervals — on the dense-activity corpus that
    * makes a key hot in the first place that is ~1 row per bucket
    * (the ScaleSmoke `ivc` lane measures the collapse). On a corpus of
    * mostly-disjoint intervals there is no reduction to find — prefer
    * the single-pass form there; this variant's extra shuffle only
    * pays for itself under merge-heavy skew. Pick `bucketWidth` so a
    * hot key yields thousands of buckets (≫ cores), each a few k
    * intervals.
    */
  def coalesceIntervalsBucketed(df: DataFrame, keyCol: String,
                                startCol: String, endCol: String,
                                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val w1 = Window.partitionBy(col(keyCol), col("_bkt"))
      .orderBy(col(startCol), col(endCol))
    val prevMax1 = max(col(endCol))
      .over(w1.rowsBetween(Window.unboundedPreceding, -1))
    val bucketSpans = df
      .withColumn("_bkt", floor(col(startCol) / bucketWidth))
      .withColumn("_new_span",
        when(prevMax1.isNull || col(startCol) > prevMax1, 1L).otherwise(0L))
      .withColumn("_span", sum(col("_new_span"))
        .over(w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("_bkt"), col("_span"))
      .agg(min(col(startCol)).as(startCol), max(col(endCol)).as(endCol),
        count(lit(1)).as("_n"))
    val w2 = Window.partitionBy(keyCol).orderBy(col(startCol), col(endCol))
    val prevMax2 = max(col(endCol))
      .over(w2.rowsBetween(Window.unboundedPreceding, -1))
    bucketSpans
      .withColumn("_new_span",
        when(prevMax2.isNull || col(startCol) > prevMax2, 1L).otherwise(0L))
      .withColumn("_span", sum(col("_new_span"))
        .over(w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("_span"))
      .agg(min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        sum(col("_n")).as("n_intervals"))
      .drop("_span")
  }
}

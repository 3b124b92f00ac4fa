package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming forms of the event aggregations (EventOps holds
  * the batch twins — same expressions, same results once the stream is
  * drained).
  *
  * The reference has no streaming surface (SURVEY.md §2.9); this is the
  * engine-native extension: watermarked tumbling/sliding/session windows
  * and an arbitrary-stateful running aggregate via
  * `mapGroupsWithState`.
  *
  * Deployment note (measured — PERF.md "state boundedness"): every
  * watermark here bounds state in ROWS, but the default
  * `HDFSBackedStateStoreProvider` holds those rows as JVM-heap maps and
  * OOMs a tight executor even with the bound holding (observed at 8 g
  * on the LSH self-join lane). Run large-state streams — the joins and
  * `nearDupWithinStream` especially — with
  * `spark.sql.streaming.stateStore.providerClass` set to
  * `RocksDBStateStoreProvider`, which degrades to native memory + disk
  * instead of dying.
  */
object StreamingOps {

  /** Watermarked tumbling-window aggregation over a streaming frame with
    * an `events`-shaped schema.
    */
  def tumblingStream(events: DataFrame, width: String,
                     watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(unix_timestamp(col("w.start")).as("win_start"),
        col("event_type"), col("n"), col("total"))

  /** Watermarked sliding-window aggregation (width/slide windows per
    * event; state per open window, evicted past the watermark).
    */
  def slidingStream(events: DataFrame, width: String, slide: String,
                    watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(unix_timestamp(col("w.start")).as("win_start"),
        col("event_type"), col("n"), col("total"))

  /** Stream-static enrichment: join each streamed event to a STATIC
    * dimension frame (keyed `c_custkey`, carrying `n_name`), then a
    * watermarked tumbling aggregate per (window, n_name).
    *
    * The production pattern this pins: the static side is joined
    * STATELESSLY per micro-batch — no state store entry is ever
    * created for dimension rows (only the post-join aggregate keeps
    * windowed state), and the explicit `broadcast` keeps the stream
    * side un-shuffled through the join. At 100 TB/day of events with a
    * multi-GB dimension, the broadcast is per-executor-once while any
    * stateful-join formulation would checkpoint the dimension into
    * every state store.
    */
  def enrichedWindowStream(events: DataFrame, dim: DataFrame,
                           width: String,
                           watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), width).as("w"), col("n_name"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
      .select(unix_timestamp(col("w.start")).as("win_start"),
        col("n_name"), col("n"), col("total"))

  /** Watermarked session windows per user. */
  def sessionStream(events: DataFrame, gap: String,
                    watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total"))
      .select(col("user_id"),
        unix_timestamp(col("w.start")).as("session_start"),
        col("n_events"), col("total"))

  /** Streaming exact dedup on `event_id` (the streaming twin of
    * `DedupOps.dedupExact` / at-least-once ingest compaction).
    * `dropDuplicatesWithinWatermark` keys the state store on the id
    * columns only and EVICTS state once the watermark passes an id's
    * event time — bounded state at any scale, unlike plain
    * `dropDuplicates` on a stream, whose state grows without bound.
    */
  def dedupStream(events: DataFrame,
                  watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming near-duplicate detection against a STATIC corpus: each
    * incoming document is banded by the whole-pipeline MinHash generator
    * (stateless — generators run unchanged in streaming plans) and
    * joined against the static corpus's band index. The stream side
    * never accumulates state; the static side is a normal broadcast-able
    * batch plan, the production shape for "is this incoming doc a dup of
    * anything we already have".
    * Returns (doc_id, n_dup_candidates = distinct static docs sharing ≥1
    * band).
    */
  def nearDupAgainstStatic(stream: DataFrame, corpus: DataFrame,
                           idCol: String = "doc_id",
                           textCol: String = "text",
                           shingleK: Int = 3,
                           bloomExpectedBands: Option[Long] = None)
      : DataFrame = {
    import graft.functions.MinhashSig.minhashTextBandsGen
    def banded(df: DataFrame, id: String) = df
      .select(col(idCol).as(id),
        minhashTextBandsGen(col(textCol), shingleK, 16, 4))
      .toDF(id, "_band", "_bh")
    val index = banded(corpus, "_static_id")
    val streamBanded = banded(stream, "doc_id")
    // optional bloom pre-filter over the (band, hash) key: when the
    // static index outgrows the broadcast threshold and the join must
    // shuffle each microbatch, the filter (built ONCE at stream setup —
    // the static side is batch) drops definite-miss band rows before
    // they reach the exchange. Results are identical: no false
    // negatives, and false positives die in the equi-join.
    val key = concat_ws("\u0000", col("_band"), col("_bh"))
    val joined = bloomExpectedBands match {
      case Some(n) =>
        // the bloom path exists for the index-too-big-to-broadcast
        // regime, so do NOT hint broadcast here: let the planner pick
        // (and the threshold reject) it; only bloom survivors reach
        // the shuffle
        val bloom = graft.operators.BloomJoin.buildBloom(index, key, n)
        streamBanded
          .filter(graft.operators.BloomJoin.mightContain(bloom, key))
          .join(index, Seq("_band", "_bh"))
      case None =>
        streamBanded.join(broadcast(index), Seq("_band", "_bh"))
    }
    joined
      .groupBy("doc_id")
      // distinct aggs aren't allowed on streams; a collect_set buffer is
      // (bounded by the static corpus's matching docs per stream doc)
      .agg(size(collect_set(col("_static_id"))).as("n_dup_candidates"))
  }

  /** Streaming BPE tokenization — the tokenizer loop's APPLY side as a
    * serving path (the streaming twin of
    * `TextAnalysisOps.bpeTokenCount`): the model is trained ONCE on
    * the static corpus at stream setup (a deployed tokenizer is frozen
    * by definition — see `bpeSymCountMap`), broadcast as a plain map,
    * and every streamed doc folds to its token counts ROW-LOCALLY — no
    * join, no aggregation, ZERO state, so any output mode works and a
    * microbatch costs exactly its own rows. Out-of-vocabulary words
    * are skipped and docs with no known word emit nothing, mirroring
    * the batch operator's inner-join semantics (there the vocabulary
    * derives from the same corpus, so every extracted word matches; on
    * a stream the static corpus is the training set).
    */
  def bpeTokenizeStream(stream: DataFrame, corpus: DataFrame,
                        idCol: String = "doc_id",
                        textCol: String = "text",
                        nMerges: Int = 3): DataFrame = {
    val model = stream.sparkSession.sparkContext.broadcast(
      graft.operators.TextAnalysisOps.bpeSymCountMap(
        corpus, textCol, nMerges))
    // Compiled ONCE and captured by the closure (java.util.regex.Pattern
    // is Serializable and thread-safe) — compiling inside the lambda
    // would re-build the Pattern for every streamed row on the serving
    // hot path.
    val wordPat = java.util.regex.Pattern.compile("[a-z]+")
    val tok = udf { (text: String) =>
      val m = model.value
      var nb = 0L
      var nw = 0L
      if (text != null) {
        val mt = wordPat.matcher(text.toLowerCase)
        while (mt.find()) {
          m.get(mt.group) match {
            case Some(c) => nb += c; nw += 1
            case None => ()
          }
        }
      }
      (nb, nw)
    }
    stream.select(col(idCol), tok(col(textCol)).as("_t"))
      .select(col(idCol), col("_t._1").as("n_bpe_tokens"),
        col("_t._2").as("n_words"))
      .filter(col("n_words") > 0)
  }

  /** Near-dup candidate pairs WITHIN the stream (the streaming twin of
    * `DedupOps.minhashCandidates`): a watermarked stream-stream SELF
    * join on the LSH band key, bounded to pairs whose event times lie
    * within `horizonSec` of each other — the range condition is what
    * lets Spark evict join state once the watermark passes, so the
    * buffered window is `horizon`, not the whole stream. Emits one row
    * per SHARED BAND (a pair sharing b bands appears b times;
    * candidates feed an exact downstream check anyway, same contract
    * as the batch operator before its distinct). `a < b` keeps each
    * unordered pair one-directional.
    */
  def nearDupWithinStream(stream: DataFrame, horizonSec: Long,
                          idCol: String = "doc_id",
                          tsCol: String = "ts",
                          textCol: String = "text",
                          shingleK: Int = 3,
                          watermark: String = "1 hour"): DataFrame = {
    import graft.functions.MinhashSig.minhashTextBandsGen
    def banded(side: String) = stream
      .select(col(idCol), col(tsCol),
        minhashTextBandsGen(col(textCol), shingleK, 16, 4))
      .toDF(s"${side}_id", s"${side}_ts", s"${side}_band", s"${side}_bh")
      .withWatermark(s"${side}_ts", watermark)
    // Known benign noise: StreamingJoinHelper probes every </>
    // predicate in the condition for a state-watermark constraint and
    // WARN-logs an internal-error stack for the non-time a_id < b_id
    // pair-dedup predicate (once per side per micro-batch). Writing the
    // predicate as a post-join filter does NOT avoid it — the optimizer
    // pushes a both-sides filter straight back into the condition. The
    // time-range predicates still extract their state watermark, so
    // state eviction is unaffected; the logger is quieted in the test
    // harness (SparkSpec) rather than contorting the plan.
    banded("a").join(banded("b"),
      col("a_band") === col("b_band") && col("a_bh") === col("b_bh") &&
        col("a_id") < col("b_id") &&
        col("b_ts") >= col("a_ts") - expr(s"INTERVAL $horizonSec SECONDS") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $horizonSec SECONDS"))
      .select(col("a_id").as("a"), col("b_id").as("b"),
        col("a_band").as("band"))
  }

  /** Bounded-admission backlog source — the production answer to the
    * measured overload failure mode (PERF.md r5: offering the interval
    * join 2× its sustainable rate stalls the watermark, evictions stop,
    * and state grows without bound; at sustainable rate the same lane
    * plateaus with 90% of state evicted). A watermark can only bound
    * state if the query keeps DRAINING: admission control caps what each
    * micro-batch ingests so batch duration stays bounded and the
    * watermark keeps advancing through the backlog — the semantics
    * Kafka's `maxOffsetsPerTrigger` / files' `maxFilesPerTrigger` give a
    * real deployment, re-expressed here on Spark's `rate-micro-batch`
    * source so the probe harness can drive it without external infra.
    *
    * Models an upstream that produced (or is producing) rows at
    * `offeredRowsPerSec` — event timestamps embedded at that rate — while
    * the query ADMITS at most `maxRowsPerTrigger` rows per micro-batch,
    * regardless of how deep the backlog is. Same (timestamp, value)
    * schema as the `rate` source, so every shaping projection in the
    * probes applies unchanged.
    *
    * `alignMillisPerBatch` keeps MULTI-source queries (e.g. a
    * stream-stream join) consistent: all sides of a join must advance
    * event time by the SAME wall per batch or their watermarks diverge —
    * pass the value computed from the highest-rate side to the others.
    */
  /** The admission plan behind [[boundedBacklogSource]]: rows admitted
    * per micro-batch and the event-time advance per batch. Pure so the
    * alignment contract is testable: every side of a multi-source query
    * must produce the same `advanceMs` (or their watermarks diverge),
    * and each side's rows-per-batch must preserve ITS OWN offered rate
    * over that shared span.
    */
  private[graft] def admissionPlan(offeredRowsPerSec: Long,
                                   maxRowsPerTrigger: Long,
                                   alignMillisPerBatch: Option[Long])
      : (Long, Long) = {
    val advanceMs = alignMillisPerBatch.getOrElse(
      math.max(1L, maxRowsPerTrigger * 1000L / math.max(offeredRowsPerSec, 1L)))
    // rows per batch honors the offered rate when an alignment stretches
    // the batch's event-time span: rows = rate × span
    val rows = alignMillisPerBatch match {
      case Some(ms) => math.max(1L, offeredRowsPerSec * ms / 1000L)
      case None     => math.max(1L, maxRowsPerTrigger)
    }
    (rows, advanceMs)
  }

  def boundedBacklogSource(spark: SparkSession, offeredRowsPerSec: Long,
                           maxRowsPerTrigger: Long,
                           alignMillisPerBatch: Option[Long] = None,
                           numPartitions: Option[Int] = None): DataFrame = {
    val (rows, advanceMs) = admissionPlan(offeredRowsPerSec,
      maxRowsPerTrigger, alignMillisPerBatch)
    val base = spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rows)
      .option("advanceMillisPerBatch", advanceMs)
      .option("startTimestamp", 0L)
    numPartitions.fold(base)(n => base.option("numPartitions", n)).load()
  }

  /** Stream-stream interval join (the batch twin is EventOps.bandJoin):
    * purchases joined to the same user's clicks in the preceding
    * `window`. Both sides are watermarked and the join carries a range
    * condition on event time, so each side's buffered state is bounded —
    * rows age out once the watermark passes their interval. Append-mode
    * only (Spark's stream-stream join contract).
    */
  def clickAttributionStream(clicks: DataFrame, purchases: DataFrame,
                             window: String = "30 minutes",
                             watermark: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    p.join(c, expr(
      s"""user_id = c_user AND
          click_ts >= purchase_ts - INTERVAL $window AND
          click_ts < purchase_ts"""))
      .select("purchase_id", "user_id", "click_id")
  }

  /** LEFT OUTER twin of [[clickAttributionStream]]: purchases with no
    * qualifying click still emit, click_id null — the "unattributed
    * conversion" row a funnel report needs in-band rather than as the
    * absence of a row. Matched pairs emit as they form; the NULL row
    * for purchase p emits when Spark evicts p's buffered state, i.e.
    * once the JOIN watermark passes purchase_ts. Because each side's
    * withWatermark sits above its own event-type filter, the two sides
    * track SEPARATE ms-floored maxima and the operative watermark is
    * their MIN (multipleWatermarkPolicy=min, measured and bracketed at
    * both gated sfs in the st13 oracle) — a quiet side therefore
    * delays outer emissions for the busy side, the production reason
    * to feed both sides from one watermarked source when types share a
    * stream. Cost: nothing beyond the inner join's bounded state.
    */
  def clickAttributionOuterStream(clicks: DataFrame, purchases: DataFrame,
                                  window: String = "30 minutes",
                                  watermark: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    p.join(c, expr(
      s"""user_id = c_user AND
          click_ts >= purchase_ts - INTERVAL $window AND
          click_ts < purchase_ts"""), "leftOuter")
      .select("purchase_id", "user_id", "click_id")
  }

  /** FULL OUTER twin of [[clickAttributionStream]] — the remaining
    * stream-stream join shape: BOTH sides emit their null-padded row
    * on watermark expiry, so unattributed conversions (purchase, null
    * click) AND dead-end clicks (null purchase, click) surface
    * in-band. State eviction is per-side, derived from the range
    * condition: a purchase p buffers until the watermark passes
    * `purchase_ts` (no older click can still arrive), a click c until
    * the watermark passes `click_ts + window` (no purchase inside
    * c's forward match interval can still arrive) — so the click
    * side's outer rows trail the purchase side's by exactly the
    * window width, which the st19 oracle encodes and brackets at
    * both gated sfs. Same min-of-sides operative watermark as st13.
    * Cost: nothing beyond the inner join's bounded state.
    */
  def clickAttributionFullOuterStream(clicks: DataFrame,
      purchases: DataFrame, window: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    p.join(c, expr(
      s"""user_id = c_user AND
          click_ts >= purchase_ts - INTERVAL $window AND
          click_ts < purchase_ts"""), "fullOuter")
      .select(col("purchase_id"),
        coalesce(col("user_id"), col("c_user")).as("user_id"),
        col("click_id"))
  }

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserTotal(user_id: Long, n: Long, total: Double)

  /** Custom-state running per-user totals (`mapGroupsWithState`): the
    * state survives across micro-batches — the shape a dedup cache or a
    * feature accumulator takes in a production ingest stream.
    */
  def runningTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserEvent], st: GroupState[UserTotal]) =>
          val prev = st.getOption.getOrElse(UserTotal(uid, 0L, 0.0))
          val (n, tot) = it.foldLeft((prev.n, prev.total)) {
            case ((c, t), e) => (c + 1, t + e.value)
          }
          // state keeps the UNROUNDED total (rounding the accumulator
          // each micro-batch would permanently discard sub-cent value);
          // rounding happens only on the emitted row
          st.update(UserTotal(uid, n, tot))
          UserTotal(uid, n, math.rint(tot * 100) / 100)
      }.toDF()
  }

  final case class UserCents(user_id: Long, cents: Long)
  final case class UserTotalCents(user_id: Long, n: Long, total_cents: Long)

  /** [[runningTotals]] with an EXACT integer accumulator: per-event
    * money values are quantized to cents at ingest and summed as
    * longs. The double-accumulator form is the general shape, but a
    * float sum is association-order-dependent — across micro-batch
    * boundaries, task merge order, or a replay after failover, the
    * low-order bits (and occasionally a rounded cent) can differ. For
    * anything reconciled downstream (billing, quotas, exactly-once
    * sinks) the integer form is the production choice: bit-identical
    * under any partitioning, batch split, or replay — which is also
    * what makes it the oracle-gated parity lane (st6) while the double
    * twin stays golden-gated.
    */
  def runningTotalsCents(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events.select(col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[UserCents]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserCents], st: GroupState[UserTotalCents]) =>
          val prev = st.getOption.getOrElse(UserTotalCents(uid, 0L, 0L))
          val (n, tot) = it.foldLeft((prev.n, prev.total_cents)) {
            case ((c, t), e) => (c + 1, t + e.cents)
          }
          val next = UserTotalCents(uid, n, tot)
          st.update(next)
          next
      }.toDF()
  }

  final case class QuotaState(counts: Map[Long, Long])

  /** Per-key admission quota — the PER-TENANT half of admission
    * control. [[boundedBacklogSource]] caps GLOBAL per-trigger ingest,
    * but one hot tenant can still monopolize that budget; this admits
    * at most `quota` events per (user, event-time window) and drops
    * the rest at the state boundary, before they reach any downstream
    * join or aggregation. State = one small (window-start →
    * admitted-count) map per live user — bounded by active users ×
    * (watermark horizon / window) entries, NOT by stream length:
    * expired windows are pruned against the watermark on every
    * invocation and the whole user entry times out once its newest
    * window closes.
    *
    * Admission is inherently arrival-order-dependent (that is what
    * admission means), so the verified surface is the CONTRACT: per
    * (user, window), admitted = min(offered, quota) and the admitted
    * ids are a subset of the offered ids — asserted in StreamingSpec.
    * Late rows beyond the watermark are the caller's filter, as for
    * every flatMapGroupsWithState op.
    */
  def perKeyQuotaStream(spark: SparkSession, events: DataFrame,
                        windowSec: Long, quota: Long,
                        watermark: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    require(quota > 0 && windowSec > 0)
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[(Long, java.sql.Timestamp, Long)],
         st: GroupState[QuotaState]) =>
          if (st.hasTimedOut) { st.remove(); Iterator.empty }
          else {
            val wmMs = st.getCurrentWatermarkMs()
            var counts = st.getOption.map(_.counts)
              .getOrElse(Map.empty[Long, Long])
              .filter { case (wStart, _) =>
                wStart + windowSec * 1000 > wmMs }
            // force the admission fold BEFORE the state update — the
            // iterator is lazy and single-shot
            val admitted = it.flatMap { case (_, t, eid) =>
              val wStart =
                t.getTime - math.floorMod(t.getTime, windowSec * 1000)
              val c = counts.getOrElse(wStart, 0L)
              if (c < quota) {
                counts = counts.updated(wStart, c + 1)
                Iterator.single((uid, eid, wStart / 1000))
              } else Iterator.empty
            }.toVector
            if (counts.isEmpty) st.remove()
            else {
              st.update(QuotaState(counts))
              st.setTimeoutTimestamp(counts.keys.max + windowSec * 1000)
            }
            admitted.iterator
          }
      }.toDF("user_id", "event_id", "win_start")
  }

  final case class LastSeen(user_id: Long, last_us: Long, n: Long)
  final case class InactivityAlert(user_id: Long, n_events: Long,
                                   last_seen_us: Long)

  /** Inactivity detection via EVENT-TIME STATE TIMEOUT
    * (`flatMapGroupsWithState` + `EventTimeTimeout`): a user's state
    * carries their last-seen event time; when the watermark passes
    * `last_seen + gap` with no new events, the timeout fires, an alert
    * row is emitted, and the state is dropped (re-appearing users
    * start a fresh session). This is the heartbeat/churn primitive —
    * the state-timeout half of the arbitrary-stateful API that
    * windowed aggregations cannot express (nothing arrives to trigger
    * the "nothing arrived" output; the TIMER does).
    *
    * State size is one (long, long, long) per live user, evicted on
    * alert — bounded by active-user cardinality, not stream length.
    */
  def inactivityAlerts(spark: SparkSession, events: DataFrame,
                       gapSec: Long, watermark: String = "10 minutes")
      : DataFrame = {
    import spark.implicits._
    // keep the watermark-tagged `ts` attribute itself through the
    // projection — deriving a new column (unix_micros) strips the
    // event-time metadata the timeout machinery requires
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[(Long, java.sql.Timestamp)],
         st: GroupState[LastSeen]) =>
          if (st.hasTimedOut) {
            val s = st.get
            st.remove()
            Iterator(InactivityAlert(uid, s.n, s.last_us))
          } else {
            val prev = st.getOption.getOrElse(LastSeen(uid, Long.MinValue, 0L))
            // getTime is millis; the sub-millisecond part lives in
            // getNanos — both contribute to the true microsecond stamp
            def micros(t: java.sql.Timestamp): Long =
              t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
            val (last, n) = it.foldLeft((prev.last_us, prev.n)) {
              case ((l, c), (_, t)) => (math.max(l, micros(t)), c + 1)
            }
            st.update(LastSeen(uid, last, n))
            st.setTimeoutTimestamp(last / 1000 + gapSec * 1000)
            Iterator.empty
          }
      }.toDF()
  }

  /** Latest snapshot version in a [[upsertSink]] state dir: the highest
    * `v=N` subdirectory whose parquet commit marker (`_SUCCESS`) exists
    * — a half-written snapshot from a crashed batch is never visible.
    */
  def latestVersion(stateDir: String): Option[Long] = {
    val root = new java.io.File(stateDir)
    val versions = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .filter(f => new java.io.File(f, "_SUCCESS").exists())
      .map(_.getName.stripPrefix("v=").toLong)
    if (versions.isEmpty) None else Some(versions.max)
  }

  /** Read the current [[upsertSink]] snapshot (None before the first
    * commit). */
  def currentSnapshot(spark: SparkSession, stateDir: String)
      : Option[DataFrame] =
    latestVersion(stateDir).map(v => spark.read.parquet(s"$stateDir/v=$v"))

  /** Streaming upsert sink — CDC apply onto plain parquet, no table
    * format: each micro-batch is reduced to its LAST row per key (by
    * `orderCol`, then by key for determinism), merged into the current
    * snapshot via `TransformOps.upsert` (one anti join), and written as
    * a NEW `v=N+1` snapshot directory. Read-modify-overwrite of the
    * files being read would corrupt on mid-write failure; immutable
    * versioned snapshots give atomic publish (the `_SUCCESS` marker),
    * crash safety (a torn snapshot is simply not the max committed
    * version), and history — the mechanism table formats formalize.
    * Combined with the streaming checkpoint, a replayed batch rewrites
    * the same logical content rather than double-applying.
    *
    * Scale shape per batch: one heap top-1 per key over the (small)
    * batch, one broadcast-able anti join against the snapshot, one
    * partition-parallel write. Snapshot compaction/GC of old versions
    * is `sources.Compaction`'s job, scheduled separately.
    */
  def upsertSink(stream: DataFrame, stateDir: String, checkpoint: String,
                 keyCols: Seq[String], orderCol: String,
                 trigger: Trigger = Trigger.AvailableNow())
      : StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        // null-keyed CDC rows are malformed (the anti-join merge can
        // never retire them — null keys don't equi-match, so one would
        // accumulate per batch forever): drop them here
        val keyed = batch.toDF()
          .filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
        // tiebreak on a digest of the WHOLE row, not the key (constant
        // within the window partition): two rows with the same key and
        // orderCol — a producer retry — must pick the same winner on
        // every replay of the batch
        val rowFp = md5(to_json(struct(keyed.columns.map(col): _*)))
        val latest = graft.plans.TopK.perKey(
          keyed.withColumn("_fp", rowFp), keyCols,
          Seq(col(orderCol).desc, col("_fp").asc), 1)
          .drop("rk", "_fp")
        val merged = currentSnapshot(spark, stateDir) match {
          case Some(cur) =>
            graft.operators.TransformOps.upsert(cur, latest, keyCols)
          case None => latest
        }
        val next = latestVersion(stateDir).getOrElse(-1L) + 1
        merged.write.mode("overwrite").parquet(s"$stateDir/v=$next")
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Drain a streaming aggregation into an in-memory table and return the
    * result — the batch-equivalence harness used by the tests.
    */
  /** Streaming heavy hitters: a per-event-time-window Misra–Gries
    * sketch — hot-key monitoring at line rate. The decisive state
    * economics vs a streaming `groupBy(item)`: that keeps state PER
    * DISTINCT ITEM (unbounded for n-gram/URL streams); here the sketch
    * buffer IS the streaming state — one ≤ k-entry map per open
    * window, merged incrementally across micro-batches by the
    * mergeable-summaries rule, which is exactly why the MG guarantees
    * survive arbitrary batch boundaries. Contract (not content) is the
    * verified surface, as in the batch lane (tx43): any item above
    * n_window/(k+1) is present, estimates undercount by at most that
    * and never overcount.
    */
  def heavyHittersStream(stream: DataFrame, itemCol: String,
                         tsCol: String, windowDur: String, k: Int,
                         watermark: String = "1 hour"): DataFrame = {
    val mg = udaf(new graft.operators.MisraGries(k),
      org.apache.spark.sql.Encoders.STRING)
    stream.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("w"))
      .agg(mg(col(itemCol).cast("string")).as("sketch"))
      .select(unix_timestamp(col("w.start")).as("win_start"),
        explode(col("sketch")))
      .toDF("win_start", "item", "est")
  }

  def drainToTable(df: DataFrame, name: String,
                   mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q: StreamingQuery = df.writeStream
      .format("memory").queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }
}

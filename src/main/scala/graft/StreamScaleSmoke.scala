package graft

import org.apache.spark.sql.functions._

/** Streaming scale smoke: drives the watermarked streaming operators
  * from the executor-side `rate` source at a sustained row rate and
  * reads back the STATE-STORE metrics from query progress. The claim
  * under test is the one that matters at scale — state stays BOUNDED
  * because the watermark evicts it (numRowsRemoved > 0 and
  * numRowsTotal ≪ cumulative input), while a plain `dropDuplicates`
  * stream would grow state forever. Wall-clock run, so watermarks are
  * real time: short watermark/gap make eviction observable in a ~45 s
  * window. Run: `runMain graft.StreamScaleSmoke [rowsPerSec] [runSec]
  * [lane]` — prefer one lane per invocation (`dedup`, `session`,
  * `cdc_totals`, `timers`, `click_attribution`,
  * `click_attribution_capped`, `lsh_self_join`): a
  * fresh JVM per lane is the honest measurement, and the numbers in
  * PERF.md come from single-lane runs.
  * `GRAFT_SSMOKE_VERBOSE=1` prints per-batch watermark/state rows;
  * `GRAFT_STATE_STORE=hdfs` flips the state store back to the
  * heap-resident default (reproduces the 8 g OOM — see PERF.md).
  */
object StreamScaleSmoke {
  def main(args: Array[String]): Unit = {
    val rowsPerSec = if (args.length > 0) args(0).toLong else 200000L
    val runSec = if (args.length > 1) args(1).toInt else 45
    val only = if (args.length > 2) Some(args(2)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // State-store provider A/B (GRAFT_STATE_STORE=hdfs to flip back):
    // the default HDFSBackedStateStoreProvider keeps EVERY loaded state
    // partition as JVM-heap maps — large join state OOMs a tight heap
    // even though the watermark bounds it in rows. RocksDB keeps state
    // in native memory + local disk, so "state doesn't fit the heap"
    // degrades to I/O instead of death; it is the production default
    // here and the probe's point on the LSH lane.
    val provider =
      if (sys.env.get("GRAFT_STATE_STORE").contains("hdfs"))
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
      else
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.streaming.stateStore.providerClass", provider)
      .config("spark.sql.session.timeZone", "UTC") // NTZ ts cast precondition (Tables.normalizeEventTs)
      // recentProgress is a RING BUFFER (default 100 batches); the
      // 120-180 s join/LSH lanes with sub-second triggers overflow it,
      // silently undercounting cumulative input/evictions (advisor r5).
      // 4096 covers the longest lane at ~10 batches/s with margin, so
      // drain()'s sums are cumulative, not window-limited.
      .config("spark.sql.streaming.numRecentProgressUpdates", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~20% of ids are duplicates of the previous id — an at-least-once
    // ingest shape for the dedup stream. The 100k-user cohort ROTATES
    // every 20 s (user ids shift wholesale), so earlier users go
    // quiet, their sessions close after gap+watermark, and session
    // state eviction becomes observable within the run window.
    val events = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSec).load()
      .select(
        when(col("value") % 10 < 2, col("value") - 1)
          .otherwise(col("value")).as("event_id"),
        (pmod(col("value"), lit(100000L)) +
          (unix_timestamp(col("timestamp")) / 20).cast("long") * 100000L)
          .as("user_id"),
        col("timestamp").as("ts"),
        (pmod(hash(col("value")), lit(10000)) / 100.0).as("value"))

    def drain(name: String, out: org.apache.spark.sql.DataFrame,
              mode: String, seconds: Int = runSec): Unit = {
      if (only.exists(_ != name)) return
      val q = out.writeStream.format("noop").outputMode(mode)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"graft-ssmoke-$name")
            .toString)
        .start()
      Thread.sleep(seconds * 1000L)
      val progs = q.recentProgress
      if (sys.env.contains("GRAFT_SSMOKE_VERBOSE")) progs.foreach { p =>
        val so = p.stateOperators.map(s =>
          s"${s.operatorName}: total=${s.numRowsTotal} removed=${s.numRowsRemoved}")
          .mkString("; ")
        println(s"[batch ${p.batchId}] rows=${p.numInputRows} " +
          s"wm=${p.eventTime.get("watermark")} $so")
      }
      if (progs.length >= 4096)
        System.err.println(s"[ssmoke] $name: progress buffer FULL " +
          "(4096 batches) — cumulative sums below may undercount")
      val input = progs.map(_.numInputRows).sum
      val st = progs.flatMap(_.stateOperators)
      val stateNow = if (st.nonEmpty) st.last.numRowsTotal else -1L
      val removed = st.map(_.numRowsRemoved).sum
      val rate = progs.flatMap(p => Option(p.processedRowsPerSecond))
        .filterNot(_.isNaN)
      val mean = if (rate.nonEmpty) math.rint(rate.sum / rate.size) else 0
      // trigger durations: the admission-control claim is that batch
      // wall time stays bounded (under the watermark delay) so the
      // watermark keeps advancing — report mean/max so capped-vs-
      // uncapped overload is adjudicable from the JSON line alone
      val durs = progs.flatMap(p =>
        Option(p.durationMs.get("triggerExecution")).map(_.toLong))
      val durMax = if (durs.nonEmpty) durs.max else -1L
      val durMean = if (durs.nonEmpty) durs.sum / durs.length else -1L
      q.stop()
      println(s"""{"stream":"$name","input_rows":$input,""" +
        s""""state_rows_final":$stateNow,"state_rows_removed":$removed,""" +
        s""""mean_rows_per_sec":$mean,"n_batches":${progs.length},""" +
        s""""trigger_ms_mean":$durMean,"trigger_ms_max":$durMax}""")
    }

    drain("dedup",
      streaming.StreamingOps.dedupStream(events, watermark = "5 seconds"),
      "append")
    drain("session",
      streaming.StreamingOps.sessionStream(events, gap = "10 seconds",
        watermark = "5 seconds"),
      "append")

    // CDC running totals (mapGroupsWithState, NoTimeout): state is ONE
    // row per user, so the bound under test is key cardinality, not a
    // watermark — the rotating cohort adds 100k fresh users every 20 s
    // and state_rows_final must track distinct-users-seen (≈ run/20 ×
    // 100k), never cumulative input rows. No eviction by design (the
    // operator is the feature-accumulator shape; a production deploy
    // that needs eviction uses the timer lane's EventTimeTimeout).
    drain("cdc_totals",
      streaming.StreamingOps.runningTotals(spark, events),
      "update")

    // Event-time timers (flatMapGroupsWithState + EventTimeTimeout):
    // per-user last-seen state with a 10 s inactivity timer. The cohort
    // rotation silences 100k users at a time; once the watermark passes
    // last_seen + gap their timers FIRE, alert rows flow, and the state
    // is removed — the probe's claim is that state plateaus at the
    // active cohort (~one rotation of users) instead of accumulating
    // every user ever seen.
    drain("timers",
      streaming.StreamingOps.inactivityAlerts(spark, events, gapSec = 10,
        watermark = "5 seconds"),
      "append")

    // Stream-stream INTERVAL join (click attribution): purchases at a
    // twentieth of the click rate join the same user's clicks in the
    // preceding 10 s. Both sides buffer rows only within
    // watermark + window, so click-side state must plateau near
    // rate × (window + watermark) rows and show removals once the
    // watermark clears the first interval — the range condition is
    // what makes stream-stream join state finite. Click rate is HALF
    // the offered rate: each input row becomes join state (a RocksDB
    // write on ingest + a delete on eviction), so the lane's cost per
    // row is ~2× the stateless lanes'; the window is long because
    // join-state eviction only starts once the watermark clears
    // window + watermark of the FIRST batch.
    val clickRate = math.max(rowsPerSec / 2, 2L)
    val clicks = spark.readStream.format("rate")
      .option("rowsPerSecond", clickRate).load()
      .select(col("value").as("event_id"),
        pmod(col("value"), lit(100000L)).as("user_id"),
        col("timestamp").as("ts"))
    val purchases = spark.readStream.format("rate")
      .option("rowsPerSecond", math.max(clickRate / 10, 1L)).load()
      .select((col("value") + 1000000000L).as("event_id"),
        pmod(col("value") * 7, lit(100000L)).as("user_id"),
        col("timestamp").as("ts"))
    drain("click_attribution",
      streaming.StreamingOps.clickAttributionStream(clicks, purchases,
        window = "10 seconds", watermark = "5 seconds"),
      "append", seconds = math.max(runSec, 120))

    // The SAME interval join under OVERLOAD, with bounded admission: r5
    // measured that offering this lane 2× its sustainable rate via the
    // wall-clock `rate` source stalls the watermark (0 evictions, state
    // growth). Here the offered rate is deliberately overload-grade
    // (the lane's `rowsPerSec` arg, uncut) but admission is capped per
    // trigger (`boundedBacklogSource`), so the claim under test is:
    // batch duration stays bounded, the watermark advances through the
    // backlog, and evictions FLOW where the uncapped run showed none.
    // Cap default ≈ 2 s of sustainable throughput (56 k rows/s measured
    // r5) — well under the 5 s watermark delay per batch.
    val capPerTrigger =
      sys.env.get("GRAFT_SSMOKE_CAP").map(_.toLong).getOrElse(100000L)
    val capAdvanceMs = math.max(1L, capPerTrigger * 1000L / clickRate)
    val cClicks = streaming.StreamingOps.boundedBacklogSource(
      spark, clickRate, capPerTrigger, numPartitions = Some(cpus.toInt))
      .select(col("value").as("event_id"),
        pmod(col("value"), lit(100000L)).as("user_id"),
        col("timestamp").as("ts"))
    val cPurchases = streaming.StreamingOps.boundedBacklogSource(
      spark, math.max(clickRate / 10, 1L), capPerTrigger,
      alignMillisPerBatch = Some(capAdvanceMs),
      numPartitions = Some(cpus.toInt))
      .select((col("value") + 1000000000L).as("event_id"),
        pmod(col("value") * 7, lit(100000L)).as("user_id"),
        col("timestamp").as("ts"))
    drain("click_attribution_capped",
      streaming.StreamingOps.clickAttributionStream(cClicks, cPurchases,
        window = "10 seconds", watermark = "5 seconds"),
      "append", seconds = math.max(runSec, 120))

    // The heaviest streaming shape: watermarked LSH band SELF-join.
    // Docs are ~12-word texts derived from the row value; every run of
    // 5 consecutive ids shares one text (a planted duplicate family),
    // so band matches land inside the 10 s horizon. Join state holds
    // BOTH sides' band rows only within horizon+watermark — the
    // boundedness claim under test. Rate is lower than the stateless
    // lanes: each doc fans out to 4 band rows per join side.
    val docRate = math.max(rowsPerSec / 4, 1L)
    val wordCols = (0 until 12).map(i =>
      concat(lit("w"), pmod(hash((col("value") / 5) * 31 + lit(i)),
        lit(50))))
    val docs = spark.readStream.format("rate")
      .option("rowsPerSecond", docRate).load()
      .select(col("value").as("doc_id"), col("timestamp").as("ts"),
        concat_ws(" ", wordCols: _*).as("text"))
    // Join-state eviction needs watermark + horizon + a batch boundary
    // to pass before the first removal, and this lane's batches run
    // tens of seconds — give it a window long enough to SHOW the
    // plateau, not just the ramp.
    drain("lsh_self_join",
      streaming.StreamingOps.nearDupWithinStream(docs, horizonSec = 10,
        watermark = "5 seconds"),
      "append", seconds = math.max(runSec, 90))
    spark.stop()
  }
}

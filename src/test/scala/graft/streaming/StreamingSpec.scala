package graft.streaming

import graft.SparkSpec
import graft.operators.EventOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
              event_type: String, value: Double)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents: Seq[Ev] = Seq(
    Ev(1, java.sql.Timestamp.valueOf("2024-01-01 00:05:00"), 10, "click", 1.0),
    Ev(2, java.sql.Timestamp.valueOf("2024-01-01 00:50:00"), 10, "click", 2.0),
    Ev(3, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 10, "view", 4.0),
    Ev(4, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), 20, "click", 8.0))

  test("streaming tumbling windows match the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(mkEvents: _*)
    val streamed = StreamingOps.drainToTable(
      StreamingOps.tumblingStream(mem.toDF(), "1 hour"), "t_tumbling")
      .as[(Long, String, Long, Double)].collect().toSet
    val batch = EventOps.tumbling(mkEvents.toDF(), "1 hour")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("perKeyQuotaStream: per-(user, window) admission contract") {
    implicit val sqlCtx = spark.sqlContext
    def ev(i: Int, uid: Long, hhmm: String) =
      Ev(i, java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00"), uid,
        "e", 0.0)
    // user 10: 7 events in window 0, 2 in window 1; user 20: 2 in
    // window 0 — quota 3 per (user, hour-window)
    val evs = (1 to 7).map(i => ev(i, 10, "00:10")) ++
      (8 to 9).map(i => ev(i, 10, "01:10")) ++
      (10 to 11).map(i => ev(i, 20, "00:20"))
    val mem = MemoryStream[Ev]
    mem.addData(evs: _*)
    val out = StreamingOps.drainToTable(
      StreamingOps.perKeyQuotaStream(spark, mem.toDF(),
        windowSec = 3600, quota = 3), "t_quota",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .as[(Long, Long, Long)].collect()
    val byKey = out.groupBy(r => (r._1, r._3))
      .map { case (k, rs) => k -> rs.map(_._2).toSet }
    // admitted = min(offered, quota), and admitted ⊆ offered
    val w0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      .getTime / 1000
    val w1 = java.sql.Timestamp.valueOf("2024-01-01 01:00:00")
      .getTime / 1000
    assert(byKey((10L, w0)).size == 3 &&
      byKey((10L, w0)).subsetOf((1 to 7).map(_.toLong).toSet))
    assert(byKey((10L, w1)) == Set(8L, 9L))
    assert(byKey((20L, w0)) == Set(10L, 11L))
    assert(out.length == 7)
  }

  test("streaming heavy hitters: per-window MG contract, k-bounded state") {
    implicit val sqlCtx = spark.sqlContext
    def ev(i: Int, hhmm: String, item: String) =
      Ev(i, java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00"), 1, item, 0.0)
    // window 0 (00:xx): "hot" ×40 + 30 unique → n=70, thr 70/5=14
    // window 1 (01:xx): "warm" ×20 + 10 unique → n=30, thr 30/5=6
    val w0 = (1 to 40).map(i => ev(i, "00:05", "hot")) ++
      (41 to 70).map(i => ev(i, "00:30", s"u$i"))
    val w1 = (71 to 90).map(i => ev(i, "01:05", "warm")) ++
      (91 to 100).map(i => ev(i, "01:30", s"v$i"))
    val mem = MemoryStream[Ev]
    mem.addData((w0 ++ w1): _*)
    val out = StreamingOps.drainToTable(
      StreamingOps.heavyHittersStream(mem.toDF(), "event_type", "ts",
        "1 hour", k = 4), "t_hh")
      .as[(Long, String, Long)].collect()
    val byWin = out.groupBy(_._1).map { case (w, rows) =>
      w -> rows.map(r => r._2 -> r._3).toMap
    }
    assert(byWin.size == 2)
    val Seq(s0, s1) = byWin.toSeq.sortBy(_._1).map(_._2)
    // capacity bound per window; guaranteed items present with
    // estimates in [exact - n/(k+1), exact]
    assert(s0.size <= 4 && s1.size <= 4)
    assert(s0.contains("hot") && s0("hot") <= 40 && s0("hot") >= 40 - 14)
    assert(s1.contains("warm") && s1("warm") <= 20 && s1("warm") >= 20 - 6)
  }

  test("streaming sliding windows match the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(mkEvents: _*)
    val streamed = StreamingOps.drainToTable(
      StreamingOps.slidingStream(mem.toDF(), "1 hour", "30 minutes"), "t_sliding")
      .as[(Long, String, Long, Double)].collect().toSet
    val batch = EventOps.sliding(mkEvents.toDF(), "1 hour", "30 minutes")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming session windows match the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(mkEvents: _*)
    val streamed = StreamingOps.drainToTable(
      StreamingOps.sessionStream(mem.toDF(), "30 minutes"), "t_session")
      .as[(Long, Long, Long, Double)].collect().toSet
    val batch = EventOps.sessions(mkEvents.toDF(), "30 minutes")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(streamed == batch)
  }

  test("file-source stream over real events parquet matches batch") {
    // the production shape: readStream over a parquet directory
    val dir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(dir.toString).schema
    // same ts normalization as the batch loader — works on a streaming
    // DataFrame too (dispatches on the observed dtype, so the test
    // tracks whichever generation of events.parquet the driver shipped)
    val raw = graft.Tables.normalizeEventTs(
      spark.readStream.schema(schema).parquet(dir.toString))
    val streamed = StreamingOps.drainToTable(
      StreamingOps.tumblingStream(raw, "1 hour"), "t_file_stream")
      .as[(Long, String, Long, Double)].collect().toSet
    val batch = graft.operators.EventOps.tumbling(
      graft.Tables.events(spark, "/root/testdata/sf0.001"), "1 hour")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(streamed == batch)
    assert(streamed.size > 100)
  }

  test("checkpointed file stream restarts exactly-once (no double counting)") {
    import org.apache.spark.sql.streaming.Trigger
    val src = java.nio.file.Files.createTempDirectory("graft-src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt")
    def writeBatch(name: String, evs: Seq[Ev]): Unit =
      evs.toDF().write.mode("append").parquet(s"$src/")
    val schema = mkEvents.toDF().schema

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src.toString)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("value").as("total"))
        .writeStream.format("memory").queryName("t_ckpt")
        .outputMode("complete")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    writeBatch("b1", mkEvents.take(2))
    runOnce()
    writeBatch("b2", mkEvents.drop(2))
    runOnce() // restart from the checkpoint; only new files processed
    val out = spark.table("t_ckpt")
      .as[(Long, Long, Double)].collect()
      .map { case (u, n, t) => u -> ((n, t)) }.toMap
    assert(out(10L) == ((3L, 7.0)))
    assert(out(20L) == ((1L, 8.0)))
  }

  test("streaming dedup drops duplicate event_ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val dup = mkEvents.head.copy(event_type = "replayed", value = 99.0)
    mem.addData(mkEvents :+ dup: _*)
    val streamed = StreamingOps.drainToTable(
      StreamingOps.dedupStream(mem.toDF()), "t_dedup",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .as[Ev].collect()
    assert(streamed.length == mkEvents.length)
    assert(streamed.map(_.event_id).sorted.toSeq ==
      mkEvents.map(_.event_id).sorted)
    // first writer wins: the replayed copy of event 1 was dropped
    assert(streamed.find(_.event_id == 1L).get.value == 1.0)
  }

  test("streaming near-dup detection flags docs sharing bands with the static corpus") {
    implicit val sqlCtx = spark.sqlContext
    case class Doc(doc_id: Long, text: String)
    val staticCorpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "completely different static content about engines")
    ).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    mem.addData(
      (1L, "the quick brown fox jumps over the lazy dog tonight"), // dup of 100
      (2L, "nothing like anything in the static corpus at all"))
    val out = StreamingOps.drainToTable(
      StreamingOps.nearDupAgainstStatic(
        mem.toDF().toDF("doc_id", "text"), staticCorpus),
      "t_neardup").as[(Long, Int)].collect().toMap
    assert(out(1L) >= 1)
    assert(!out.contains(2L) || out(2L) == 0)
  }

  test("bloom-prefiltered streaming near-dup matches the plain variant") {
    implicit val sqlCtx = spark.sqlContext
    val staticCorpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "an entirely different static document about geology"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    mem.addData(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "nothing like anything in the static corpus at all"))
    val out = StreamingOps.drainToTable(
      StreamingOps.nearDupAgainstStatic(
        mem.toDF().toDF("doc_id", "text"), staticCorpus,
        bloomExpectedBands = Some(1000L)),
      "t_neardup_bloom").as[(Long, Int)].collect().toMap
    assert(out(1L) >= 1)
    assert(!out.contains(2L) || out(2L) == 0)
  }

  test("streaming BPE tokenization serves the corpus-trained model row-locally") {
    implicit val sqlCtx = spark.sqlContext
    // training corpus: wf aaab=3, ab=2 → 3 merges collapse both words
    // to single symbols (the ExtOpsSpec cascade)
    val corpus = Seq((1L, "aaab aaab ab"), (2L, "aaab ab"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    mem.addData(
      (10L, "aaab ab"),      // both in-vocab, 1 symbol each
      (11L, "AB! zzz qq"),   // case-folded ab counts; zzz/qq are OOV
      (12L, "zzz"))          // no known word → absent
    val out = StreamingOps.drainToTable(
      StreamingOps.bpeTokenizeStream(
        mem.toDF().toDF("doc_id", "text"), corpus, nMerges = 3),
      "t_bpe_stream",
      // stateless map → append (the zero-state claim, enforced by the
      // engine: complete mode is rejected without an aggregation)
      org.apache.spark.sql.streaming.OutputMode.Append())
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(10L) == ((2L, 2L)))
    assert(out(11L) == ((1L, 1L)))
    assert(!out.contains(12L))
  }

  test("streaming self near-dup: similar docs within the horizon pair up") {
    implicit val sqlCtx = spark.sqlContext
    val t = (s: Int) => java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusSeconds(s))
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    mem.addData(
      (1L, t(0), "the quick brown fox jumps over the lazy dog tonight"),
      (2L, t(60), "the quick brown fox jumps over the lazy dog tonight"),
      (3L, t(120), "completely unrelated text about volcanic geology"))
    val out = StreamingOps.drainToTable(
      StreamingOps.nearDupWithinStream(
        mem.toDF().toDF("doc_id", "ts", "text"), horizonSec = 3600),
      "t_neardup_self", org.apache.spark.sql.streaming.OutputMode.Append())
      .as[(Long, Long, Int)].collect()
    assert(out.nonEmpty)
    assert(out.map(r => (r._1, r._2)).toSet == Set((1L, 2L)))
  }

  test("stream-stream interval join pairs purchases with preceding clicks") {
    implicit val sqlCtx = spark.sqlContext
    val t = (s: Int) => java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusSeconds(s))
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    clicks.addData(
      Ev(1, t(0), 10, "click", 1.0),      // 10 min before purchase → match
      Ev(2, t(300), 10, "click", 1.0),    //  5 min before → match
      Ev(3, t(0), 20, "click", 1.0),      // other user
      Ev(4, t(7200), 10, "click", 1.0))   // after the purchase → no match
    purchases.addData(Ev(100, t(600), 10, "purchase", 5.0))
    val out = StreamingOps.drainToTable(
      StreamingOps.clickAttributionStream(clicks.toDF(), purchases.toDF(),
        "30 minutes"),
      "t_attrib", org.apache.spark.sql.streaming.OutputMode.Append())
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((100L, 10L, 1L), (100L, 10L, 2L)))
  }

  test("left-outer interval join emits NULL for evicted unmatched purchases only") {
    implicit val sqlCtx = spark.sqlContext
    val t = (s: Int) => java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusSeconds(s))
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    clicks.addData(
      Ev(1, t(300), 10, "click", 1.0),     // matches purchase 100
      Ev(4, t(90000), 10, "click", 1.0))   // advances the click watermark
    purchases.addData(
      Ev(100, t(600), 10, "purchase", 5.0),   // matched → real click_id
      Ev(101, t(1200), 20, "purchase", 5.0),  // unmatched, evicted → NULL
      Ev(102, t(90000), 20, "purchase", 5.0)) // unmatched, inside the
                                              // trailing delay → withheld
    val out = StreamingOps.drainToTable(
      StreamingOps.clickAttributionOuterStream(clicks.toDF(),
        purchases.toDF(), "30 minutes", watermark = "1 hour"),
      "t_attrib_outer", org.apache.spark.sql.streaming.OutputMode.Append())
      .as[(Long, Long, Option[Long])].collect().toSet
    assert(out == Set((100L, 10L, Some(1L)), (101L, 20L, None)))
  }

  test("full-outer interval join: both sides emit null-padded rows at their OWN eviction offsets") {
    implicit val sqlCtx = spark.sqlContext
    val t = (s: Int) => java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0).plusSeconds(s))
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    // watermark advances to t(90000) - 1h = t(86400) on both sides
    clicks.addData(
      Ev(1, t(300), 10, "click", 1.0),     // matches purchase 100
      Ev(2, t(1200), 30, "click", 1.0),    // unmatched; 1200+1800 < 86400 → NULL row
      Ev(3, t(85000), 30, "click", 1.0),   // unmatched; 85000+1800 > 86400 → withheld
      Ev(4, t(90000), 10, "click", 1.0))   // watermark driver; withheld
    purchases.addData(
      Ev(100, t(600), 10, "purchase", 5.0),   // matched → real click_id
      Ev(101, t(1200), 20, "purchase", 5.0),  // unmatched, < wm → NULL click
      Ev(102, t(90000), 20, "purchase", 5.0)) // unmatched, ≥ wm → withheld
    val out = StreamingOps.drainToTable(
      StreamingOps.clickAttributionFullOuterStream(clicks.toDF(),
        purchases.toDF(), "30 minutes", watermark = "1 hour"),
      "t_attrib_fullouter",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .as[(Option[Long], Long, Option[Long])].collect().toSet
    assert(out == Set(
      (Some(100L), 10L, Some(1L)),  // matched pair
      (Some(101L), 20L, None),      // purchase-side eviction
      (None, 30L, Some(2L))),       // click-side eviction (trailing 30m)
      out.toString)
  }

  test("stateful query resumes from its checkpoint across a restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val mem = MemoryStream[Ev]
    val totals = StreamingOps.runningTotals(spark, mem.toDF())
    // the memory sink refuses checkpoint recovery; foreachBatch is the
    // recoverable sink shape, collecting into a driver-side buffer
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val collectBatch: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
        Long) => Unit = (batch, _) =>
      seen.synchronized {
        seen ++= batch.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getDouble(2)))
      }
    def run(): Unit = {
      val q = totals.writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(collectBatch)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    mem.addData(Ev(1, t0, 10, "click", 1.5), Ev(2, t0, 10, "click", 2.0))
    run()
    assert(seen.synchronized(seen.lastOption).contains((10L, 2L, 3.5)))
    // second query INSTANCE, same checkpoint: offsets and
    // mapGroupsWithState state must both resume — only the new event is
    // processed, but the emitted total includes the pre-restart ones
    mem.addData(Ev(3, t0, 10, "click", 3.0))
    run()
    assert(seen.synchronized(seen.lastOption).contains((10L, 3L, 6.5)))
  }

  test("upsertSink: versioned snapshots apply CDC batches, survive restart") {
    val src = java.nio.file.Files.createTempDirectory("graft-cdc-src")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc-ckpt")
    val state = java.nio.file.Files.createTempDirectory("graft-cdc-state")
    val rows1 = Seq((1L, 1L, "a0"), (1L, 2L, "a1"), (2L, 1L, "b0"))
    val rows2 = Seq((2L, 2L, "b1"), (3L, 1L, "c0"))
    val schema = rows1.toDF("key_id", "seq", "payload").schema

    def runOnce(): Unit = {
      val q = StreamingOps.upsertSink(
        spark.readStream.schema(schema).parquet(src.toString),
        state.toString, ckpt.toString, Seq("key_id"), "seq")
      q.awaitTermination()
    }
    rows1.toDF("key_id", "seq", "payload")
      .write.mode("append").parquet(s"$src/")
    runOnce()
    val snap0 = StreamingOps.currentSnapshot(spark, state.toString).get
      .as[(Long, Long, String)].collect().toSet
    // within-batch: only the latest row per key reaches the snapshot
    assert(snap0 == Set((1L, 2L, "a1"), (2L, 1L, "b0")))

    rows2.toDF("key_id", "seq", "payload")
      .write.mode("append").parquet(s"$src/")
    runOnce() // new query instance, same checkpoint: only new files apply
    val snap1 = StreamingOps.currentSnapshot(spark, state.toString).get
      .as[(Long, Long, String)].collect().toSet
    assert(snap1 == Set((1L, 2L, "a1"), (2L, 2L, "b1"), (3L, 1L, "c0")))

    // history: the superseded snapshot is still readable (time travel)
    assert(StreamingOps.latestVersion(state.toString).contains(1L))
    val v0 = spark.read.parquet(s"$state/v=0")
      .as[(Long, Long, String)].collect().toSet
    assert(v0 == snap0)
  }

  test("upsertSink: (key, seq) ties resolve deterministically across replays") {
    // two rows with the same key AND the same seq (producer retry with
    // divergent payloads) — the winner must be a pure function of the
    // rows, so a from-scratch replay of the same input picks the same one
    val rows = Seq((1L, 1L, "first"), (1L, 1L, "second"), (2L, 1L, "z"))
    def runFresh(): Set[(Long, Long, String)] = {
      val src = java.nio.file.Files.createTempDirectory("graft-tie-src")
      val ckpt = java.nio.file.Files.createTempDirectory("graft-tie-ckpt")
      val state = java.nio.file.Files.createTempDirectory("graft-tie-st")
      rows.toDF("key_id", "seq", "payload")
        .write.mode("append").parquet(s"$src/")
      val q = StreamingOps.upsertSink(
        spark.readStream.schema(rows.toDF("key_id", "seq", "payload").schema)
          .parquet(src.toString),
        state.toString, ckpt.toString, Seq("key_id"), "seq")
      q.awaitTermination()
      StreamingOps.currentSnapshot(spark, state.toString).get
        .as[(Long, Long, String)].collect().toSet
    }
    val a = runFresh()
    val b = runFresh()
    assert(a == b)
    assert(a.count(_._1 == 1L) == 1) // exactly one winner for the tied key
  }

  test("inactivityAlerts: event-time timeout fires for silent users only") {
    implicit val sqlCtx = spark.sqlContext
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[Ev]
    val q = StreamingOps.inactivityAlerts(spark, mem.toDF(), gapSec = 1800)
      .writeStream.format("memory").queryName("t_inactive")
      .outputMode("append").start()
    // user 10 goes silent after 00:00; user 20 keeps talking
    mem.addData(Ev(1, ts("2024-01-01 00:00:00"), 10, "click", 1.0),
      Ev(2, ts("2024-01-01 00:05:00"), 20, "click", 1.0))
    q.processAllAvailable()
    mem.addData(Ev(3, ts("2024-01-01 02:00:00"), 20, "view", 1.0))
    q.processAllAvailable() // watermark advances past 10's timer AFTER this batch
    mem.addData(Ev(4, ts("2024-01-01 02:10:00"), 30, "view", 1.0))
    q.processAllAvailable() // timer evaluated here → alert for user 10
    q.stop()
    val alerts = spark.table("t_inactive")
      .as[(Long, Long, Long)].collect().toSet
    assert(alerts == Set((10L, 1L, ts("2024-01-01 00:00:00").getTime * 1000)))
  }

  test("mapGroupsWithState running totals accumulate across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = StreamingOps.runningTotals(spark, mem.toDF())
      .writeStream.format("memory").queryName("t_running")
      .outputMode("update").start()
    mem.addData(mkEvents.take(2): _*)
    q.processAllAvailable()
    mem.addData(mkEvents.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    val latest = spark.table("t_running")
      .groupBy("user_id").agg(max("n").as("n"), max("total").as("total"))
      .as[(Long, Long, Double)].collect()
      .map { case (u, n, t) => u -> ((n, t)) }.toMap
    assert(latest(10L) == ((3L, 7.0)))
    assert(latest(20L) == ((1L, 8.0)))
  }
}

/** Admission-plan arithmetic for the bounded-backlog source (probe
  * evidence in PERF.md): the per-trigger cap bounds batch size, the
  * event-time advance preserves the offered rate, and — the bug class
  * worth pinning — every side of a multi-source query aligned to the
  * same advance keeps its own rate over the shared span, so the sides'
  * watermarks move in lockstep.
  */
class AdmissionPlanSpec extends org.scalatest.funsuite.AnyFunSuite {
  private val rnd = new scala.util.Random(20260814)

  test("unaligned: rows == cap, advance preserves the offered rate") {
    for (_ <- 1 to 200) {
      val rate = 1L + rnd.nextInt(500000)
      val cap = 1L + rnd.nextInt(1000000)
      val (rows, adv) = StreamingOps.admissionPlan(rate, cap, None)
      assert(rows == math.max(1L, cap))
      assert(adv == math.max(1L, cap * 1000L / rate))
      // implied event-time rate == offered rate within integer
      // truncation: adv = floor(cap*1000/rate) under-counts by < 1 ms,
      // so the relative error is bounded by 1/adv (clamped advs of 1 ms
      // — cap*1000 < rate — can only OVERestimate the span, never the
      // rate)
      val implied = rows * 1000.0 / adv
      assert(math.abs(implied - rate) <= rate.toDouble / adv + 1,
        s"rate=$rate cap=$cap rows=$rows adv=$adv implied=$implied")
    }
  }

  test("aligned sides share the advance and keep their own rates") {
    for (_ <- 1 to 200) {
      val fastRate = 10000L + rnd.nextInt(500000)
      val slowRate = 1L + rnd.nextInt(10000)
      val cap = 1000L + rnd.nextInt(1000000)
      val (_, adv) = StreamingOps.admissionPlan(fastRate, cap, None)
      val (slowRows, slowAdv) =
        StreamingOps.admissionPlan(slowRate, cap, Some(adv))
      assert(slowAdv == adv) // lockstep watermark advance
      assert(slowRows == math.max(1L, slowRate * adv / 1000L))
      assert(slowRows <= math.max(1L, fastRate * adv / 1000L))
    }
  }
}

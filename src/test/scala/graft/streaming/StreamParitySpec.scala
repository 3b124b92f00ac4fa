package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the drain semantics the st* oracle lanes encode
  * (StreamParity scaladoc): the append-mode emission rule against the
  * final ms-floored watermark, batch-boundary robustness under a
  * time-ordered multi-file split, exact-integer running totals across
  * batch splits, and drain hygiene (no sink-state accumulation).
  */
class StreamParitySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Batch-side reference for the emission rule: windows whose end is
    * at or below max(ts) floored to ms minus the delay.
    */
  private def emittedTumbling(delayUs: Long): Set[(Long, String, Long, Double)] = {
    val ev = graft.Tables.events(spark, sf)
    val maxUs = ev.agg(max(unix_micros(col("ts")))).as[Long].head()
    val wmUs = (maxUs / 1000L) * 1000L - delayUs
    graft.operators.EventOps.tumbling(ev, "1 hour")
      .filter((col("win_start") + 3600L) * 1000000L <= wmUs)
      .as[(Long, String, Long, Double)].collect().toSet
  }

  test("append drain emits exactly the windows finalized by the last watermark") {
    val out = StreamParity.drainAppend(
      StreamingOps.tumblingStream(
        StreamParity.eventsStream(spark, sf), "1 hour", "2 hours"))
      .as[(Long, String, Long, Double)].collect().toSet
    val expected = emittedTumbling(7200L * 1000000L)
    assert(out == expected)
    // the cutoff must bite: open windows exist and are withheld
    val all = graft.operators.EventOps.tumbling(
      graft.Tables.events(spark, sf), "1 hour").count()
    assert(out.size > 100 && out.size < all)
  }

  test("multi-file time-ordered split drains to the same emitted set") {
    // Two files split at the median ts, forced through one-file
    // micro-batches: the watermark rises between batches, early
    // windows emit in batch 1, and the union still equals the
    // single-batch drain because the split respects event-time order
    // (the file source lists lexicographically; part-0 < part-1).
    val ev = graft.Tables.events(spark, sf).cache()
    val midUs = ev.select(unix_micros(col("ts")).as("us"))
      .stat.approxQuantile("us", Array(0.5), 0.0)(0).toLong
    val dir = java.nio.file.Files.createTempDirectory("graft-parity-split")
    ev.filter(unix_micros(col("ts")) <= midUs).coalesce(1)
      .write.parquet(dir.resolve("d0").toString)
    ev.filter(unix_micros(col("ts")) > midUs).coalesce(1)
      .write.parquet(dir.resolve("d1").toString)
    // stage as lexicographically ordered single files
    val drop = java.nio.file.Files.createTempDirectory("graft-parity-drop")
    def onePart(sub: String, name: String): Unit = {
      val part = java.nio.file.Files.list(dir.resolve(sub))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, drop.resolve(name))
    }
    onePart("d0", "part-0.parquet")
    onePart("d1", "part-1.parquet")
    val schema = spark.read.parquet(drop.toString).schema
    val stream = graft.Tables.normalizeEventTs(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(drop.toString))
    val out = StreamParity.drainAppend(
      StreamingOps.tumblingStream(stream, "1 hour", "2 hours"))
      .as[(Long, String, Long, Double)].collect().toSet
    assert(out == emittedTumbling(7200L * 1000000L))
    ev.unpersist()
  }

  test("integer-cents running totals are bit-identical across batch splits") {
    val single = StreamParity.drainUpdate(
      StreamingOps.runningTotalsCents(spark,
        StreamParity.eventsStream(spark, sf)))
      .as[(Long, Long, Long)].collect().toSet
    // batch truth, exact integer arithmetic
    val batch = graft.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("total_cents"))
      .as[(Long, Long, Long)].collect().toSet
    assert(single == batch)
    // update-mode multi-batch drain emits one row per user per batch
    // that touched it; the LAST row per user is the final state
    val drop = java.nio.file.Files.createTempDirectory("graft-cents-drop")
    val ev = graft.Tables.events(spark, sf)
    val midUs = ev.select(unix_micros(col("ts")).as("us"))
      .stat.approxQuantile("us", Array(0.5), 0.0)(0).toLong
    val dir = java.nio.file.Files.createTempDirectory("graft-cents-split")
    ev.filter(unix_micros(col("ts")) <= midUs).coalesce(1)
      .write.parquet(dir.resolve("d0").toString)
    ev.filter(unix_micros(col("ts")) > midUs).coalesce(1)
      .write.parquet(dir.resolve("d1").toString)
    def onePart(sub: String, name: String): Unit = {
      val part = java.nio.file.Files.list(dir.resolve(sub))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.copy(part, drop.resolve(name))
    }
    onePart("d0", "part-0.parquet")
    onePart("d1", "part-1.parquet")
    val schema = spark.read.parquet(drop.toString).schema
    val stream = graft.Tables.normalizeEventTs(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(drop.toString))
    val multi = StreamParity.drainUpdate(
        StreamingOps.runningTotalsCents(spark, stream))
      .withColumn("rk", monotonically_increasing_id())
      .groupBy("user_id")
      .agg(max(struct(col("rk"), col("n"), col("total_cents"))).as("s"))
      .select(col("user_id"), col("s.n"), col("s.total_cents"))
      .as[(Long, Long, Long)].collect().toSet
    assert(multi == batch)
  }

  test("st15: state-store dedup over real-kernel fingerprints equals batch distinct") {
    import graft.operators.MultimodalOps
    val streamed = graft.queries.StreamParityQueries
      .queries("st15_stream_neardup")(spark, sf)
      .as[String].collect().toSet
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val batch = MultimodalOps.aHashBits(
        MultimodalOps.synthBmpPairAssets(docs, "doc_id"))
      .select("ahash_bits").distinct().as[String].collect().toSet
    assert(streamed == batch, "stream drain diverged from batch distinct")
    // the dedup must be REAL state: the fixture plants duplicate
    // fingerprints (pairs + natural collisions), so distinct < rows
    assert(batch.nonEmpty && batch.size < docs.count(),
      s"vacuous dedup: ${batch.size} keys over ${docs.count()} rows")
  }

  test("drain copies the sink out and drops the temp view") {
    val before = spark.catalog.listTables().count()
    val out = StreamParity.drainAppend(
      StreamParity.eventsStream(spark, sf)
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .select(col("user_id"), col("event_type")))
    assert(out.count() ==
      graft.Tables.events(spark, sf)
        .select("user_id", "event_type").distinct().count())
    assert(spark.catalog.listTables().count() == before)
  }
}

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
  * window. Run: `runMain graft.StreamScaleSmoke [rowsPerSec] [runSec]`.
  */
object StreamScaleSmoke {
  def main(args: Array[String]): Unit = {
    val rowsPerSec = if (args.length > 0) args(0).toLong else 200000L
    val runSec = if (args.length > 1) args(1).toInt else 45
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
              mode: String): Unit = {
      val q = out.writeStream.format("noop").outputMode(mode)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"graft-ssmoke-$name")
            .toString)
        .start()
      Thread.sleep(runSec * 1000L)
      val progs = q.recentProgress
      val input = progs.map(_.numInputRows).sum
      val st = progs.flatMap(_.stateOperators)
      val stateNow = if (st.nonEmpty) st.last.numRowsTotal else -1L
      val removed = st.map(_.numRowsRemoved).sum
      val rate = progs.flatMap(p => Option(p.processedRowsPerSecond))
        .filterNot(_.isNaN)
      val mean = if (rate.nonEmpty) math.rint(rate.sum / rate.size) else 0
      q.stop()
      println(s"""{"stream":"$name","input_rows":$input,""" +
        s""""state_rows_final":$stateNow,"state_rows_removed":$removed,""" +
        s""""mean_rows_per_sec":$mean}""")
    }

    drain("dedup",
      streaming.StreamingOps.dedupStream(events, watermark = "5 seconds"),
      "append")
    drain("session",
      streaming.StreamingOps.sessionStream(events, gap = "10 seconds",
        watermark = "5 seconds"),
      "append")
    spark.stop()
  }
}

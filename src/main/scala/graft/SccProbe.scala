package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MapType

/** Driver-round probe for the iterative gr lanes (r19 verdict item 2):
  * counts Spark JOBS and wall time per invocation of a named lane —
  * the before/after evidence for the checkpoint+count fold, since at
  * sf0.1 these lanes are driver-round-latency-bound, not data-bound.
  * Usage: `runMain graft.SccProbe [lane ...]` (default gr12_scc);
  * env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
  */
object SccProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val lanes = if (args.isEmpty) Seq("gr12_scc") else args.toSeq
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_PROBE_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("GRAFT_PROBE_PFIRST", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      val cols = df.schema.fields.map { f =>
        f.dataType match {
          case _: MapType => to_json(col(f.name))
          case _          => col(f.name)
        }
      }
      df.select(xxhash64(cols.toIndexedSeq: _*).as("_h"))
        .agg(bit_xor(col("_h"))).collect()
      ()
    }
    val qs = SparkEntry.queries
    val runs = sys.env.getOrElse("GRAFT_SCCPROBE_RUNS", "3").toInt
    for (lane <- lanes; fn <- qs.get(lane)) {
      force(fn(spark, sfDir)) // warm
      for (i <- 1 to runs) {
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        force(fn(spark, sfDir))
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[sccprobe] $lane run$i: ${sec}%.2f s, " +
          s"jobs=${jobs.get() - j0}")
      }
    }
    Leases.releaseAll()
    spark.stop()
  }
}

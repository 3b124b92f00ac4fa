package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** One-off probe: where does a parity drain's wall-clock actually go?
  * Prints per-micro-batch durationMs maps from StreamingQueryProgress
  * plus the start()/awaitTermination()/table-read/stop split, for the
  * stateless / one-store-agg / four-store-join empty drains. Harness
  * diagnostics only — not part of the library surface.
  */
object DrainProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def emptyEv() = graft.streaming.StreamParity
      .eventsStream(spark, sf).filter(lit(false))

    def probe(name: String, df: org.apache.spark.sql.DataFrame,
              mode: OutputMode): Unit = {
      val ckpt = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "graft-probe-")
      // same knob as the harness it probes (SPARK_GRAFT_DRAIN_RAWFS) —
      // the probe-only GRAFT_PROBE_RAWFS alias is kept for old notes
      val ckptLoc =
        if (sys.env.getOrElse("SPARK_GRAFT_DRAIN_RAWFS",
            sys.env.getOrElse("GRAFT_PROBE_RAWFS", "1")) != "0") {
          graft.streaming.RawCkptFileSystem.register(spark)
          graft.streaming.RawCkptFileSystem.wrap(ckpt)
        } else ckpt.toString
      val qname = "probe_" + name + "_" + System.nanoTime()
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_PROBE_PARTS", "2"))
      val t0 = System.nanoTime()
      val q = df.writeStream.format("memory").queryName(qname)
        .outputMode(mode)
        .option("checkpointLocation", ckptLoc)
        .trigger(Trigger.AvailableNow()).start()
      val t1 = System.nanoTime()
      q.awaitTermination()
      val t2 = System.nanoTime()
      spark.table(qname).collect()
      spark.catalog.dropTempView(qname)
      val t3 = System.nanoTime()
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      println(s"== $name: start=${(t1 - t0) / 1e9} await=${(t2 - t1) / 1e9} " +
        s"read=${(t3 - t2) / 1e9}")
      q.recentProgress.foreach { p =>
        println(s"   batch ${p.batchId}: ${p.durationMs}")
        p.stateOperators.foreach { so =>
          println(s"     state ${so.operatorName}: upd=${so.allUpdatesTimeMs}" +
            s" rm=${so.allRemovalsTimeMs} commit=${so.commitTimeMs}")
        }
      }
      org.apache.spark.sql.graftshim.StateStoreHygiene.unloadAllProviders()
      org.apache.commons.io.FileUtils.deleteQuietly(ckpt.toFile)
    }

    // warm everything once
    for (i <- 0 until 3) {
      probe(s"stateless_$i", emptyEv().select(col("event_id")),
        OutputMode.Append())
      probe(s"agg_$i", graft.streaming.StreamingOps.tumblingStream(
        emptyEv(), "1 hour"), OutputMode.Append())
      val ev = emptyEv()
      probe(s"join_$i", graft.streaming.StreamingOps.clickAttributionStream(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        "30 minutes", "2 hours"), OutputMode.Append())
    }
    if (sys.env.contains("GRAFT_PROBE_RULES")) {
      org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
      val ev = emptyEv()
      probe("join_rules", graft.streaming.StreamingOps.clickAttributionStream(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        "30 minutes", "2 hours"), OutputMode.Append())
      println(org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent())
    }
    spark.stop()
  }
}

package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Microbench: eager localCheckpoint + count (2 jobs) vs lazy
  * checkpoint folded with the count (Ckpt.counted). Dev probe for the
  * r19 driver-round-latency work — not part of any timed lane.
  */
object CkptAB {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    val ser = StorageLevel.MEMORY_AND_DISK_SER
    def frame(): org.apache.spark.sql.DataFrame = spark.range(100000)
      .select((col("id") % 1000).as("k"), col("id"))
      .groupBy("k").agg(sum("id").as("s"))
    // warm both paths
    locally { val c = Ckpt(frame(), ser); c.count(); Release(c) }
    locally { val (c, _) = Ckpt.counted(frame(), ser); c.count(); Release(c) }
    for (round <- 1 to 3) {
      var t0 = System.nanoTime(); var j0 = jobs.get()
      for (_ <- 1 to 10) {
        val c = Ckpt(frame(), ser); val n = c.count()
        require(n == 1000); Release(c)
      }
      println(f"[ckptab] round$round eager+count x10: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s, jobs=${jobs.get() - j0}")
      t0 = System.nanoTime(); j0 = jobs.get()
      for (_ <- 1 to 10) {
        val (c, n) = Ckpt.counted(frame(), ser)
        require(n == 1000); Release(c)
      }
      println(f"[ckptab] round$round counted    x10: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s, jobs=${jobs.get() - j0}")
      // consumer-read check: count again from the materialized frame
      t0 = System.nanoTime(); j0 = jobs.get()
      for (_ <- 1 to 10) {
        val (c, _) = Ckpt.counted(frame(), ser)
        c.count(); Release(c)
      }
      println(f"[ckptab] round$round counted+re : " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s, jobs=${jobs.get() - j0}")
    }
    spark.stop()
  }
}

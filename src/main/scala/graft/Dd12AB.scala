package graft

import org.apache.spark.sql.functions._

/** dd12 staged-vs-reused A/B at bench scale (r18 verdict item 4): the
  * in-code note that rejected a checkpoint between containmentPairs'
  * two posting consumers was measured at 500 k synthetic docs; this
  * probe re-measures BOTH forms on the dd12 lane's actual sf0.1 input
  * (documents ∪ excerpts). Prints min-of-N per form.
  */
object Dd12AB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("GRAFT_AB_RUNS", "5").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("_h"))
        .agg(bit_xor(col("_h"))).collect()
      ()
    }
    def input(): org.apache.spark.sql.DataFrame = {
      val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      val excerpts = docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 20000).as("doc_id"),
          array_join(slice(split(col("text"), " "), 1, 20), " ").as("text"))
      docs.unionByName(excerpts)
    }
    def current(): Unit = force(operators.DedupOps.containmentPairs(
      input(), "doc_id", "text", k = 3, threshold = 0.8, maxDf = 20))
    def staged(): Unit = {
      val (out, rel) = operators.DedupOps.containmentPairsStagedReleasable(
        input(), "doc_id", "text", k = 3, threshold = 0.8, maxDf = 20)
      force(out); rel()
    }
    current(); staged() // warm both
    def timed(label: String)(body: => Unit): Unit = {
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[dd12ab] $label: min=${times.min}%.2f s " +
        s"all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    timed("reused-exchange (current)")(current())
    timed("staged-checkpoint")(staged())
    timed("reused-exchange (repeat)")(current())
    spark.stop()
  }
}

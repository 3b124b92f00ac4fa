package graft

import org.apache.spark.sql.functions._

/** Scale-up smoke for the heavy dedup pipelines: runs each at 5–20×
  * the PerfCompare probe sizes (tens of millions of segments, millions
  * of documents) and prints one JSON line per stage. The POINT is not
  * the wall time — it is that every shape completes with bounded
  * memory: no OOM from an unbounded collect/buffer, no pair explosion
  * from a skewed key, no driver-sized state. Sizes are CLI-overridable:
  * `runMain graft.ScaleSmoke [spanDocs] [containDocs] [lshDocs]`.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spanDocs = if (args.length > 0) args(0).toLong else 10000000L
    val containDocs = if (args.length > 1) args(1).toLong else 2000000L
    val lshDocs = if (args.length > 2) args(2).toLong else 5000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 2 * cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def round1(d: Double): Double = math.rint(d * 10) / 10

    // 24-word docs in duplication groups of 4 — 75% of spans repeat,
    // the boilerplate-heavy crawl shape
    val spanCorpus = spark.range(spanDocs).select(col("id"),
      concat_ws(" ", (0 until 24).map(j =>
        pmod(hash((col("id") - col("id") % 4)).cast("long") * 31 + j,
          lit(500000L)).cast("string")): _*).as("text"))
      .localCheckpoint()
    val (t1, n1) = t(operators.DedupOps
      .spanDedup(spanCorpus, "id", "text", 8).count())
    println(s"""{"span_docs":$spanDocs,"sec":${round1(t1)},"rows":$n1}""")
    spanCorpus.unpersist(blocking = true)

    // every doc carries one GLOBAL boilerplate token: the df cap must
    // absorb a posting list spanning the whole corpus
    val containCorpus = spark.range(containDocs).select(col("id"),
      concat_ws(" ", (lit("thecorpusboilerplate") +:
        (0 until 20).map(j =>
          pmod(hash((col("id") - col("id") % 4)).cast("long") * 31 + j,
            lit(1600000L)).cast("string"))): _*).as("text"))
      .localCheckpoint()
    val (t2, n2) = t(operators.DedupOps.containmentPairs(
      containCorpus, "id", "text", k = 3, threshold = 0.8,
      maxDf = 16).count())
    println(s"""{"contain_docs":$containDocs,"sec":${round1(t2)},"pairs":$n2}""")
    containCorpus.unpersist(blocking = true)

    val lshCorpus = spark.range(lshDocs).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 20).map(j =>
        pmod(hash((col("id") - col("id") % 4)).cast("long") * 31 + j,
          lit(1000000L)).cast("string")): _*).as("text"))
      .localCheckpoint()
    val (t3, n3) = t(operators.DedupOps.minhashCandidates(
      lshCorpus, "doc_id", "text", shingleK = 3, numPerm = 16,
      bands = 4).count())
    println(s"""{"lsh_docs":$lshDocs,"sec":${round1(t3)},"candidate_pairs":$n3}""")
    val pairs = operators.DedupOps.minhashCandidates(
      lshCorpus, "doc_id", "text", shingleK = 3, numPerm = 16, bands = 4)
    val (t4, n4) = t(operators.DedupOps.clusters(pairs, "a", "b").count())
    println(s"""{"cluster_edges_from_docs":$lshDocs,"sec":${round1(t4)},"members":$n4}""")
    spark.stop()
  }
}

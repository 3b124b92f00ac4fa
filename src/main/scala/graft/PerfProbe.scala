package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Dev tool: stage-by-stage timing of the MinHash-LSH dedup pipeline so
  * the dominant cost is measured, not guessed. Prints one JSON line with
  * cumulative per-stage seconds (steady state: each stage timed after a
  * warmup pass).
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC") // NTZ ts cast precondition (Tables.normalizeEventTs)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, sfDir)
    val sh = DedupOps.shingles(col("text"), 3)

    def stage(name: String)(df: => org.apache.spark.sql.DataFrame): (String, Double) = {
      df.count() // warmup
      val t0 = System.nanoTime()
      df.count()
      name -> (System.nanoTime() - t0) / 1e9
    }

    val banded = docs
      .select(col("doc_id").as("_id"),
        functions.MinhashSig.minhashTextBandsGen(col("text"), 3, 16, 4))
      .toDF("_id", "_band", "_bh")

    val sigDf = docs
      .select(col("doc_id").as("_id"), sh.as("_sh"))
      .filter(size(col("_sh")) > 0)
      .select(col("_id"),
        functions.MinhashSig.minhashSigNative(col("_sh"), 16).as("_sig"))

    val results = Seq(
      stage("scan")(docs.select("doc_id")),
      stage("shingles")(docs.select(col("doc_id"), sh.as("_sh"))),
      stage("sig_native")(docs.select(col("doc_id"),
        functions.MinhashSig.minhashSigNative(sh, 16).as("_sig"))),
      stage("sig_hof")(docs.select(col("doc_id"),
        DedupOps.minhashSignature(DedupOps.shingleHashes(sh), 16).as("_sig"))),
      stage("sig_filtered")(sigDf),
      stage("bands_fused")(docs.select(col("doc_id"),
        functions.MinhashSig.minhashBandsNative(sh, 16, 4).as("_bhs"))),
      stage("banded")(banded),
      stage("candidates")(DedupOps.minhashCandidates(
        docs, "doc_id", "text", 3, 16, 4)),
      stage("clusters")(DedupOps.clusters(DedupOps.minhashCandidates(
        docs, "doc_id", "text", 3, 16, 4))))
    println(results.map { case (k, v) => s"\"$k\":$v" }
      .mkString("{", ",", "}"))
    spark.stop()
  }
}

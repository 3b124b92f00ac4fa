package graft

import org.apache.spark.sql.functions._

/** Reproducible A/B probe: the banded LSH self-join under a
  * shuffled-hash vs a sort-merge hint, at ScaleSmoke's 5M-doc size.
  * SHJ builds a non-spillable per-partition hash map (it OOM'd the
  * 8g-heap run outright); SMJ sorts and spills, completing at both
  * heaps with identical pair counts. Measured table in PERF.md —
  * this is why [[operators.DedupOps.minhashCandidates]] pins
  * `hint("merge")`. Run: `runMain graft.JoinAB [docs] [shj|smj]`
  * (heap via SPARK_DRIVER_MEM at sbt launch).
  */
object JoinAB {
  def main(args: Array[String]): Unit = {
    val docs = if (args.length > 0) args(0).toLong else 5000000L
    val mode = if (args.length > 1) args(1) else "smj"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 2 * cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC") // NTZ ts cast precondition (Tables.normalizeEventTs)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = spark.range(docs).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 20).map(j =>
        pmod(hash((col("id") - col("id") % 4)).cast("long") * 31 + j,
          lit(1000000L)).cast("string")): _*).as("text"))
      .localCheckpoint()

    val banded = corpus.select(col("doc_id").as("_id"),
        graft.functions.MinhashSig.minhashTextBandsGen(col("text"), 3, 16, 4))
      .toDF("_id", "_band", "_bh")
    val hint = if (mode == "shj") "shuffle_hash" else "merge"
    val l = banded.hint(hint).as("l")
    val r = banded.hint(hint).as("r")
    val pairs = l.join(r, col("l._band") === col("r._band") &&
        col("l._bh") === col("r._bh") && col("l._id") < col("r._id"))
      .select(col("l._id").as("a"), col("r._id").as("b"))
      .distinct()

    val t0 = System.nanoTime()
    val n = pairs.count()
    val sec = math.rint((System.nanoTime() - t0) / 1e8) / 10
    println(s"""{"mode":"$mode","docs":$docs,"sec":$sec,"pairs":$n}""")
    spark.stop()
  }
}

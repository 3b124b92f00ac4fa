package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev tool: head-to-head of the custom TopKPerKey operator vs the
  * window row_number formulation on a synthetic frame large enough for
  * the shuffle/sort difference to dominate (the driver tables are too
  * small to show it). Prints one JSON line.
  */
object PerfCompare {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 5000000L
    val keys = if (args.length > 1) args(1).toInt else 1000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val df = spark.range(rows)
      .select(col("id"),
        pmod(hash(col("id")), lit(keys)).as("grp"),
        pmod(hash(col("id") + 1), lit(1000000)).cast("double").as("score"))
      .cache()
    df.count() // materialize

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // warmup both paths
    val w = Window.partitionBy("grp")
      .orderBy(col("score").desc, col("id").asc)
    def viaWindow: Long = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5).count()
    def viaNative: Long = plans.TopK.perKey(df, Seq("grp"),
      Seq(col("score").desc, col("id").asc), 5).count()
    viaWindow; viaNative
    val (tw, nw) = time(viaWindow)
    val (tn, nn) = time(viaNative)
    require(nw == nn, s"row count mismatch: $nw vs $nn")
    println(s"""{"rows":$rows,"keys":$keys,"window_sec":$tw,"topk_native_sec":$tn,"result_rows":$nw}""")

    // Connected components: DataFrame large-star/small-star vs GraphX on
    // a synthetic candidate-pair graph shaped like LSH output — many
    // small clusters (chains of length 2-6) plus a few larger hubs.
    val nEdges = if (args.length > 2) args(2).toLong else 1000000L
    val pairs = spark.range(nEdges).select(
      // chain edges inside clusters of size ~5, cluster id = id/5
      (col("id") - (col("id") % 5)).as("a"),
      col("id").as("b"))
      .filter(col("a") =!= col("b"))
      .cache()
    pairs.count()
    def viaDf: Long = operators.DedupOps.clustersDataFrame(pairs).count()
    def viaGx: Long = operators.DedupOps.clusters(pairs).count()
    viaDf; viaGx
    val (td, nd) = time(viaDf)
    val (tg, ng) = time(viaGx)
    require(nd == ng, s"CC row count mismatch: $nd vs $ng")
    println(s"""{"cc_edges":$nEdges,"cc_df_sec":$td,"cc_graphx_sec":$tg,"cc_members":$nd}""")

    // release the earlier sections' caches first — an evicted probe
    // cache would re-derive md5 payloads inside the timed join and
    // swamp the comparison
    df.unpersist(blocking = true)
    pairs.unpersist(blocking = true)

    // Bloom semi-join reduction vs plain shuffle semi join, in the
    // no-broadcast regime (at scale the build side exceeds the
    // broadcast threshold, which is the case the operator exists for).
    // Probe rows carry a payload so exchange volume, not row count,
    // is what the bloom filter saves.
    val probeN = if (args.length > 3) args(3).toLong else 20000000L
    val matchOneIn = 100L
    val probe = spark.range(probeN)
      .select(col("id").as("k"),
        md5(col("id").cast("string")).as("payload"))
      .cache()
    val build = spark.range(probeN / matchOneIn)
      .select((col("id") * matchOneIn).as("k")).cache()
    probe.count(); build.count()
    val bcThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    // wall time at local[4] measures the page cache, not the exchange;
    // the scale-relevant cost is BYTES THROUGH THE SHUFFLE, which is
    // deterministic — read it off the exchange operators' dataSize
    // metric (AQE off so the exchanges sit unwrapped in the plan)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def exchangedBytes(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
        // run THIS QueryExecution (a count() would plan its own copy
        // and leave these operators' metrics untouched)
        val n = df.queryExecution.toRdd.count()
        val bytes = df.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
            e.metrics("dataSize").value
        }.sum
        (n, bytes)
      }
      val (np, bp) = exchangedBytes(probe.join(build, Seq("k"), "left_semi"))
      // measure the SHIPPED operator, not a hand-rolled copy of it
      val (nb, bb) = exchangedBytes(operators.BloomJoin.bloomSemiJoin(
        probe, build, "k", probeN / matchOneIn))
      require(np == nb, s"semi-join row count mismatch: $np vs $nb")
      println(s"""{"bloom_probe_rows":$probeN,"matches":$np,""" +
        s""""plain_exchanged_bytes":$bp,"bloom_exchanged_bytes":$bb}""")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
    }
    probe.unpersist(blocking = true)
    build.unpersist(blocking = true)

    // Span dedup at data scale: 24-word docs in duplication groups of 4
    // (three 8-word spans each, 75% of spans are repeats) — the shape a
    // boilerplate-heavy web crawl gives the first-occurrence window.
    val spanDocs = if (args.length > 4) args(4).toLong else 1000000L
    val corpus = spark.range(spanDocs).select(col("id"),
      concat_ws(" ", (0 until 24).map(j =>
        pmod(hash((col("id") - col("id") % 4)).cast("long") * 31 + j,
          lit(50000L)).cast("string")): _*).as("text"))
      .cache()
    corpus.count()
    def spanRun: Long =
      operators.DedupOps.spanDedup(corpus, "id", "text", 8).count()
    spanRun
    val (ts, ns) = time(spanRun)
    println(s"""{"span_docs":$spanDocs,"span_dedup_sec":$ts,"span_rows":$ns}""")
    corpus.unpersist(blocking = true)

    // Containment join keying: string shingles vs the md5-derived long
    // key the shipped operator uses — same rows, same matches, the
    // exchange carries fixed 8-byte keys instead of variable strings.
    // Like the bloom probe, wall time hides in the page cache locally;
    // bytes through the exchange are the scale-relevant quantity.
    {
      val n = 2000000L
      val postings = spark.range(n).select(col("id").as("doc"),
        // pairs of docs share a shingle (seed = id - id%2), so the two
        // keyings must produce the SAME non-empty pair set
        concat_ws(" ",
          pmod(hash(col("id") - col("id") % 2), lit(200000)).cast("string"),
          pmod(hash(col("id") - col("id") % 2 + 1), lit(200000)).cast("string"),
          pmod(hash(col("id") - col("id") % 2 + 2), lit(200000)).cast("string"))
          .as("s"))
        .cache()
      postings.count()
      val aqeWas2 = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        def bytesOf(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
          val cnt = df.queryExecution.toRdd.count()
          val b = df.queryExecution.executedPlan.collect {
            case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
              e.metrics("dataSize").value
          }.sum
          (cnt, b)
        }
        val str = postings.select(col("s"), col("doc").as("a"))
          .join(postings.select(col("s"), col("doc").as("b")), Seq("s"))
          .filter(col("a") =!= col("b"))
        val keyed = postings.select(
          conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long")
            .as("sk"), col("doc"))
          .cache()
        keyed.count()
        val lng = keyed.select(col("sk"), col("doc").as("a"))
          .join(keyed.select(col("sk"), col("doc").as("b")), Seq("sk"))
          .filter(col("a") =!= col("b"))
        val (ns2, bs) = bytesOf(str)
        val (nl, bl) = bytesOf(lng)
        require(ns2 == nl, s"containment probe row mismatch: $ns2 vs $nl")
        println(s"""{"containment_rows":$n,"pairs":$ns2,""" +
          s""""string_key_exchanged_bytes":$bs,"long_key_exchanged_bytes":$bl}""")
      } finally {
        spark.conf.set("spark.sql.adaptive.enabled", aqeWas2)
      }
      postings.unpersist(blocking = true)
    }

    // k-means at data scale: 16-dim float vectors, k=16, 2 Lloyd
    // rounds — per-iteration cost is one VectorMeanAgg partial agg plus
    // one broadcast re-assignment; the corpus never shuffles by content.
    val kmN = if (args.length > 5) args(5).toLong else 500000L
    val vecs = spark.range(kmN).select(col("id"),
      array((0 until 16).map(j =>
        (pmod(hash(col("id") * 17 + j), lit(1000)) / lit(1000.0))
          .cast("float")): _*).as("embedding"))
      .cache()
    vecs.count()
    def kmRun: Long =
      operators.SimilarityOps.kmeans(vecs, 16, 2, "id", "embedding").count()
    kmRun
    val (tk, nk) = time(kmRun)
    require(nk == kmN, s"kmeans lost rows: $nk of $kmN")
    println(s"""{"kmeans_vecs":$kmN,"kmeans_k16_iter2_sec":$tk}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev tool: head-to-head of the custom TopKPerKey operator vs the
  * window row_number formulation on a synthetic frame large enough for
  * the shuffle/sort difference to dominate (the driver tables are too
  * small to show it). Prints one JSON line per lane.
  *
  * A full run is ~10 min; `GRAFT_PC_ONLY=<lane,...>` replays a subset
  * (lanes: topk, cc, bloom, span, containment, kernels, kmeans, ivf,
  * ivfcurve, bpehybrid, dsir, parse, skew, simhash) — the
  * targeted-replay affordance Bench gets from its query-name args.
  */
object PerfCompare {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 5000000L
    val keys = if (args.length > 1) args(1).toInt else 1000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC") // NTZ ts cast precondition (Tables.normalizeEventTs)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Lane filter for cheap replays (a full run is ~10 min): e.g.
    // GRAFT_PC_ONLY=parse,dsir runs only those blocks. Lane names:
    // topk, cc, bloom, span, containment, kernels, kmeans, ivf,
    // ivfcurve, bpehybrid, dsir, parse, skew, simhash, srccap, budget,
    // knn, hh, mix, pagerank, stdrain, asof, paircap, spanab, packab,
    // substrab.
    // Default (unset) = all. Each lane builds and releases its own
    // caches, so skipping any subset is safe.
    val only = sys.env.get("GRAFT_PC_ONLY")
      .map(_.split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    def lane(name: String)(body: => Unit): Unit =
      if (only.isEmpty || only.contains(name)) body

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    lane("topk") {
      val df = spark.range(rows)
        .select(col("id"),
          pmod(hash(col("id")), lit(keys)).as("grp"),
          pmod(hash(col("id") + 1), lit(1000000)).cast("double").as("score"))
        .cache()
      df.count() // materialize
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
      // release before the next lane — an evicted probe cache would
      // re-derive payloads inside a later timed region
      Release(df, blocking = true)
    }

    // Connected components: DataFrame large-star/small-star vs GraphX on
    // a synthetic candidate-pair graph shaped like LSH output — many
    // small clusters (chains of length 2-6) plus a few larger hubs.
    lane("cc") {
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
      Release(pairs, blocking = true)
    }

    // Bloom semi-join reduction vs plain shuffle semi join, in the
    // no-broadcast regime (at scale the build side exceeds the
    // broadcast threshold, which is the case the operator exists for).
    // Probe rows carry a payload so exchange volume, not row count,
    // is what the bloom filter saves.
    lane("bloom") {
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
    Release(probe, blocking = true)
    Release(build, blocking = true)
    }

    // Span dedup at data scale: 24-word docs in duplication groups of 4
    // (three 8-word spans each, 75% of spans are repeats) — the shape a
    // boilerplate-heavy web crawl gives the first-occurrence window.
    lane("span") {
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
      Release(corpus, blocking = true)
    }

    // r15 A/B: first-occurrence selection on a planted 100%-hot-span
    // corpus (every doc opens with the same 8-word boilerplate) — the
    // r14-charged row_number window partitioned by span TEXT vs the
    // shipped map-side argmin + winner reassembly. The window form
    // parks the whole hot group in one task's external sort; the
    // argmin pre-combines it into O(partials) rows.
    lane("spanab") {
      val n = 1000000L
      val hot = (0 until 8).map(j => s"boiler$j").mkString(" ")
      val corpus = spark.range(n).select(col("id"),
        concat(lit(hot + " "), concat_ws(" ", (0 until 16).map(j =>
          concat(lit("w"), col("id"), lit(s"_$j"))): _*)).as("text"))
        .cache()
      corpus.count()
      import org.apache.spark.sql.expressions.Window
      def windowForm: Long = {
        val segs = corpus.select(col("id"),
          posexplode(graft.functions.ShingleGen.segmentArray(
            col("text"), 8)).as(Seq("seg_idx", "seg")))
        val w = Window.partitionBy(col("seg"))
          .orderBy(col("id").asc, col("seg_idx").asc)
        segs.withColumn("_rn", row_number().over(w))
          .groupBy(col("id"))
          .agg(sum(when(col("_rn") === 1, 1).otherwise(0)).cast("long")
            .as("n_kept"))
          .agg(sum("n_kept")).collect()(0).getLong(0)
      }
      def argminForm: Long =
        operators.DedupOps.spanDedup(corpus, "id", "text", 8)
          .agg(sum("n_kept")).collect()(0).getLong(0)
      // wall-clock at local[32] understates the win (one memory bus,
      // and a 1M-row single-task sort is cheap on one box); the
      // cluster-honest signal is the WIDEST TASK — wall-clock at
      // 1000 executors is the slowest task, and rows-into-one-task is
      // the skew itself (the skew-probe listener discipline)
      val mx = new java.util.concurrent.atomic.AtomicLong
      val mr = new java.util.concurrent.atomic.AtomicLong
      val lst = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          mx.updateAndGet(m => math.max(m, te.taskInfo.duration))
          mr.updateAndGet(m =>
            math.max(m, te.taskMetrics.shuffleReadMetrics.recordsRead))
        }
      }
      def measured(f: => Long): (Double, Long, Long, Long) = {
        mx.set(0); mr.set(0)
        spark.sparkContext.addSparkListener(lst)
        try { val (t, k) = time(f)
          Thread.sleep(500) // let the listener bus drain (private API)
          (t, k, mx.get, mr.get)
        } finally spark.sparkContext.removeSparkListener(lst)
      }
      val (tw, kw, wMs, wRows) = measured(windowForm)
      val (ta, ka, aMs, aRows) = measured(argminForm)
      require(kw == ka && ka == 2 * n + 1,
        s"spanab forms disagree: window=$kw argmin=$ka want ${2 * n + 1}")
      println(s"""{"spanab_docs":$n,"window_sec":$tw,"argmin_sec":$ta,""" +
        s""""window_max_task_ms":$wMs,"argmin_max_task_ms":$aMs,""" +
        s""""window_max_read_rows":$wRows,"argmin_max_read_rows":$aRows}""")
      Release(corpus, blocking = true)
    }

    // r15 A/B: sequence packing with ONE dominant stratum (web = 80%
    // of 2M ~200-byte docs, the real-mixture shape) — the r14-charged
    // form (the per-stratum running-sum window with the DOCUMENT TEXT
    // threaded through it: one task sorts and scans 80% of the
    // corpus, text included) vs the shipped narrow two-phase prefix
    // sum + join-back. Every doc is 32 tokens so both forms land the
    // same bin census exactly.
    lane("packab") {
      val n = 2000000L
      val corpus = spark.range(n).select(col("id"),
        when(col("id") % 5 < 4, lit("web")).otherwise(lit("code"))
          .as("source"),
        concat_ws(" ", (0 until 32).map(j =>
          concat(lit("w"), pmod(col("id") * 31 + j, lit(99999L)))): _*)
          .as("text"))
        .cache()
      corpus.count()
      import org.apache.spark.sql.expressions.Window
      def windowForm: Long = {
        val w = Window.partitionBy("source").orderBy("id")
        corpus.select(col("source"), col("id"), col("text"),
            operators.TextAnalysisOps.tokenCount(col("text"))
              .cast("int").as("n_tokens"))
          .withColumn("cum", sum("n_tokens").over(w))
          .withColumn("bin",
            floor((col("cum") - col("n_tokens")) / 512).cast("int"))
          .groupBy(col("source"), col("bin"))
          .agg(count(lit(1)).as("n_docs"),
            md5(array_join(transform(
              array_sort(collect_list(struct(col("id"), col("text")))),
              x => x.getField("text")), " <|eod|> ")).as("fp"))
          .agg(count(lit(1))).collect()(0).getLong(0)
      }
      def joinBackForm: Long = {
        val (seq, rel) = operators.TextAnalysisOps
          .packSequencesReleasable(corpus, "id", "text", "source",
            budgetTokens = 512)
        val m = seq.agg(count(lit(1))).collect()(0).getLong(0)
        rel(); m
      }
      // same listener rationale as spanab: the widest task IS the
      // cluster cost; the text-carrying stratum window funnels 80% of
      // the corpus (text included) through one task's read+sort
      val mx = new java.util.concurrent.atomic.AtomicLong
      val mr = new java.util.concurrent.atomic.AtomicLong
      val lst = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          mx.updateAndGet(m => math.max(m, te.taskInfo.duration))
          mr.updateAndGet(m =>
            math.max(m, te.taskMetrics.shuffleReadMetrics.recordsRead))
        }
      }
      def measured(f: => Long): (Double, Long, Long, Long) = {
        mx.set(0); mr.set(0)
        spark.sparkContext.addSparkListener(lst)
        try { val (t, k) = time(f)
          Thread.sleep(500) // let the listener bus drain (private API)
          (t, k, mx.get, mr.get)
        } finally spark.sparkContext.removeSparkListener(lst)
      }
      val (tw, mw, wMs, wRows) = measured(windowForm)
      val (tt, mt, jMs, jRows) = measured(joinBackForm)
      require(mw == mt && mt == n / 16,
        s"packab forms disagree: window=$mw joinback=$mt want ${n / 16}")
      println(s"""{"packab_docs":$n,"window_sec":$tw,"joinback_sec":$tt,""" +
        s""""window_max_task_ms":$wMs,"joinback_max_task_ms":$jMs,""" +
        s""""window_max_read_rows":$wRows,"joinback_max_read_rows":$jRows}""")
      Release(corpus, blocking = true)
    }

    // r16 A/B: dd20's anchor first-occurrence selection on a planted
    // 100%-hot-boilerplate corpus (every doc opens with the same
    // 12-token paragraph) — the charged bug class's row_number window
    // partitioned by GRAM TEXT vs the shipped map-side argmin + FULL-
    // KEY anti join. Same selection semantics (non-first anchors);
    // the window parks every hot gram's occurrence set in one task's
    // sort, while the anti join's (gram, id, p) key is unique per row
    // so the hot gram hashes across ALL partitions — no skewed
    // partition EXISTS. (The intermediate design — equi join back on
    // gram alone — measured here first: it re-parks the hot gram in
    // one probe partition, and AQE's skew split cannot rescue it
    // because the winner side's Aggregate breaks OptimizeSkewedJoin's
    // SMJ(Sort(stage), Sort(stage)) pattern. The full-key anti join
    // removes the skew structurally instead of hoping a threshold
    // fires.)
    lane("substrab") {
      val n = 1000000L
      val hot = (0 until 12).map(j => s"boiler$j").mkString(" ")
      val corpus = spark.range(n).select(col("id"),
        concat(lit(hot + " "), concat_ws(" ", (0 until 12).map(j =>
          concat(lit("w"), col("id"), lit(s"_$j"))): _*)).as("text"))
        .cache()
      corpus.count()
      def grams = corpus.select(col("id"),
        posexplode(graft.functions.ShingleGen.shingleArray(
          col("text"), 6, distinct = false)).as(Seq("p", "gram")))
      import org.apache.spark.sql.expressions.Window
      def windowForm: Long = {
        val w = Window.partitionBy(col("gram"))
          .orderBy(col("id").asc, col("p").asc)
        grams.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") > 1).count()
      }
      def argminForm: Long = {
        val firsts = grams.groupBy(col("gram"))
          .agg(min(struct(col("id"), col("p"))).as("_f"))
          .select(col("gram"), col("_f").getField("id").as("id"),
            col("_f").getField("p").as("p"))
        grams.join(firsts, Seq("gram", "id", "p"), "left_anti").count()
      }
      val mx = new java.util.concurrent.atomic.AtomicLong
      val mr = new java.util.concurrent.atomic.AtomicLong
      val lst = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          mx.updateAndGet(m => math.max(m, te.taskInfo.duration))
          mr.updateAndGet(m =>
            math.max(m, te.taskMetrics.shuffleReadMetrics.recordsRead))
        }
      }
      def measured(f: => Long): (Double, Long, Long, Long) = {
        mx.set(0); mr.set(0)
        spark.sparkContext.addSparkListener(lst)
        try { val (t, k) = time(f)
          Thread.sleep(500) // let the listener bus drain (private API)
          (t, k, mx.get, mr.get)
        } finally spark.sparkContext.removeSparkListener(lst)
      }
      // 7 pure-hot anchors per doc are non-first everywhere but doc 0
      val want = 7L * (n - 1)
      val (tw, kw, wMs, wRows) = measured(windowForm)
      val (ta, ka, aMs, aRows) = measured(argminForm)
      require(kw == ka && ka == want,
        s"substrab forms disagree: window=$kw argmin=$ka want $want")
      println(s"""{"substrab_docs":$n,"window_sec":$tw,"argmin_sec":$ta,""" +
        s""""window_max_task_ms":$wMs,"argmin_max_task_ms":$aMs,""" +
        s""""window_max_read_rows":$wRows,"argmin_max_read_rows":$aRows}""")
      Release(corpus, blocking = true)
    }

    // Containment shapes head-to-head: the round-2 pipeline (df-count
    // agg → semi-join back → md5-keyed pair SELF-JOIN) vs the shipped
    // fused shape (ONE bounded-collect posting build → map-side pair
    // fan-out). Both run multi-job (localCheckpoint), so exchange
    // volume is accumulated with a stage listener over ALL jobs — the
    // per-plan dataSize metric would miss the checkpointed shuffle.
    lane("containment") {
      val n = if (args.length > 6) args(6).toLong else 500000L
      // 20-word docs in duplication groups of 4 → heavy true overlap,
      // plus every doc carries one GLOBAL boilerplate word so the
      // df cap has something to bite on
      val docs = spark.range(n).select(col("id"),
        concat_ws(" ", (lit("thecorpusboilerplate") +:
          (0 until 20).map(j =>
            pmod(hash((col("id") - col("id") % 4)).cast("long") * 31 + j,
              lit(400000L)).cast("string"))): _*).as("text"))
        .cache()
      docs.count()
      val shuffled = new java.util.concurrent.atomic.AtomicLong
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit =
          shuffled.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      def shuffleBytesOf(f: => Long): (Long, Long) = {
        spark.sparkContext.addSparkListener(listener)
        shuffled.set(0L)
        val cnt = f
        Thread.sleep(2000) // drain the listener bus (dev tool)
        spark.sparkContext.removeSparkListener(listener)
        (cnt, shuffled.get)
      }
      val maxDf = 16
      // the round-2 shape, inlined for comparison only
      def oldShape: Long = {
        val sh = docs.select(col("id"),
          graft.functions.ShingleGen.shingleGen(col("text"), 3,
            distinct = true)).toDF("id", "_s").localCheckpoint()
        val kept = sh.groupBy(col("_s")).agg(count(lit(1)).as("_df"))
          .filter(col("_df") <= maxDf).select(col("_s"))
        val shF = sh.join(kept, Seq("_s"), "left_semi")
          .select(col("id"),
            conv(substring(md5(col("_s")), 1, 15), 16, 10).cast("long")
              .as("_sk"))
        val nA = shF.groupBy(col("id")).agg(count(lit(1)).as("n_a"))
        shF.select(col("_sk"), col("id").as("a"))
          .join(shF.select(col("_sk"), col("id").as("b")), Seq("_sk"))
          .filter(col("a") =!= col("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_shared"))
          .join(nA.select(col("id").as("a"), col("n_a")), Seq("a"))
          .filter(round(col("n_shared").cast("double") / col("n_a"), 4)
            >= 0.8)
          .count()
      }
      def newShape: Long = operators.DedupOps.containmentPairs(
        docs, "id", "text", k = 3, threshold = 0.8, maxDf = maxDf).count()
      oldShape; newShape // warmup
      val (no, bo) = shuffleBytesOf(oldShape)
      val (nn2, bn) = shuffleBytesOf(newShape)
      require(no == nn2, s"containment pair mismatch: $no vs $nn2")
      println(s"""{"containment_docs":$n,"pairs":$no,""" +
        s""""old_shape_shuffle_bytes":$bo,"fused_shape_shuffle_bytes":$bn}""")
      Release(docs, blocking = true)

      // Bloom singleton pre-filter A/B (r5 verdict item 4) on a corpus
      // whose shingle mass is singleton-DOMINATED, the natural-corpus
      // regime the experiment targets: 70% of docs unique (their
      // shingles appear once), 30% in duplication groups of 4. The
      // harness corpus above (all docs in groups of 4, df≈4 everywhere)
      // has nothing for a singleton filter to drop and would only
      // measure the pre-filter's overhead.
      {
        val grp = when(pmod(col("id"), lit(10)) < 3,
          col("id") - col("id") % 4).otherwise(col("id") + n)
        val natDocs = spark.range(n).select(col("id"),
          concat_ws(" ", (lit("thecorpusboilerplate") +:
            (0 until 20).map(j =>
              pmod(hash(grp).cast("long") * 31 + j, lit(400000L))
                .cast("string"))): _*).as("text"))
          .cache()
        natDocs.count()
        def fusedNat: Long = operators.DedupOps.containmentPairs(
          natDocs, "id", "text", k = 3, threshold = 0.8,
          maxDf = maxDf).count()
        // the rejected variant, inlined for comparison only (measured a
        // LOSS — see containmentPairs scaladoc / PERF.md; same precedent
        // as the round-2 shape above): pass 1 counts df on
        // xxhash64(shingle) longs and blooms the df>=2 hashes; pass 2
        // short-circuits definite singletons into the denominator and
        // sends only in-bloom shingles through the posting exchange.
        // Result-identical: a false positive / hash collision rides the
        // slow path, counts df=1 <= maxDf, pairs with nothing.
        def prefilteredNat: Long = {
          val sh = natDocs.select(col("id"), functions.ShingleGen
            .shingleGen(col("text"), 3, distinct = true)).toDF("id", "_s")
          val multi = sh.groupBy(xxhash64(col("_s")).as("_h"))
            .agg(count(lit(1)).as("_c")).filter(col("_c") >= 2)
            .select(col("_h"))
          val bloom = operators.BloomJoin.buildBloom(multi, col("_h"),
            n * 6)
          val tagged = sh.withColumn("_in",
            operators.BloomJoin.mightContain(bloom, xxhash64(col("_s"))))
          val nSingle = tagged.filter(!col("_in")).groupBy(col("id"))
            .agg(count(lit(1)).as("n_single"))
          val postings = tagged.filter(col("_in")).groupBy(col("_s"))
            .agg(functions.BoundedCollect
              .boundedCollectList(col("id"), maxDf + 1).as("_ids"))
            .filter(size(col("_ids")) <= maxDf)
            .select(col("_ids"))
          val nMulti = postings.select(explode(col("_ids")).as("id"))
            .groupBy(col("id")).agg(count(lit(1)).as("n_multi"))
          val nA = nMulti.join(nSingle, Seq("id"), "left_outer")
            .select(col("id"),
              (col("n_multi") + coalesce(col("n_single"), lit(0L)))
                .as("n_a"))
          postings
            .select(explode(col("_ids")).as("a"), col("_ids"))
            .select(col("a"), explode(col("_ids")).as("b"))
            .filter(col("a") =!= col("b"))
            .groupBy(col("a"), col("b"))
            .agg(count(lit(1)).as("n_shared"))
            .join(nA.select(col("id").as("a"), col("n_a")), Seq("a"))
            .filter(round(col("n_shared").cast("double") / col("n_a"), 4)
              >= 0.8)
            .count()
        }
        fusedNat; prefilteredNat // warmup
        val (nf, bf) = shuffleBytesOf(fusedNat)
        val (np, bp) = shuffleBytesOf(prefilteredNat)
        require(nf == np, s"prefilter pair mismatch: $nf vs $np")
        val (tf, _) = time(fusedNat)
        val (tp, _) = time(prefilteredNat)
        println(s"""{"containment_nat_docs":$n,"nat_pairs":$nf,""" +
          s""""fused_shuffle_bytes":$bf,"prefiltered_shuffle_bytes":$bp,""" +
          s""""fused_sec":$tf,"prefiltered_sec":$tp}""")
        Release(natDocs, blocking = true)
      }
    }

    // Segment-kernel shapes head-to-head (the spanDedup segmentation
    // stage, hash-all action so nothing prunes): declarative HOF vs the
    // shipped scalar segment_array kernel under the builtin posexplode.
    // The custom-Generator variant measured SLOWER than the declarative
    // form on this short-doc shape (CodegenFallback breaks whole-stage
    // codegen around the Generate) and was deleted — see PERF.md.
    lane("kernels") {
      val n = if (args.length > 7) args(7).toLong else 1000000L
      val corpus = spark.range(n).select(col("id"),
        concat_ws(" ", (0 until 24).map(j =>
          pmod(hash((col("id") - col("id") % 4)).cast("long") * 31 + j,
            lit(50000L)).cast("string")): _*).as("text"))
        .cache()
      corpus.count()
      def hashAll(df: org.apache.spark.sql.DataFrame): Long = {
        df.select(xxhash64(df.columns.map(col): _*).as("_h"))
          .agg(bit_xor(col("_h"))).collect(); df.count()
      }
      def declarative: Long = {
        val w = split(col("text"), " ")
        val nSeg = ceil(size(w).cast("double") / 8).cast("int")
        hashAll(corpus.select(col("id"), w.as("_w"), nSeg.as("_n"))
          .select(col("id"),
            posexplode(transform(sequence(lit(0), col("_n") - 1),
              i => array_join(slice(col("_w"), i * 8 + 1, lit(8)), " ")))
              .as(Seq("seg_idx", "seg"))))
      }
      def native: Long = hashAll(corpus.select(col("id"),
        posexplode(functions.ShingleGen.segmentArray(col("text"), 8))
          .as(Seq("seg_idx", "seg"))))
      declarative; native
      val (td, nd) = time(declarative)
      val (tn, nn3) = time(native)
      require(nd == nn3, s"segment row mismatch: $nd vs $nn3")
      println(s"""{"segment_docs":$n,"segment_rows":$nd,""" +
        s""""declarative_sec":$td,"native_array_sec":$tn}""")
      // int8 quantization: declarative HOF quantize under posexplode
      // (the inferred Generate filter re-evaluates the whole tree) vs
      // the one-pass native struct kernel
      val vq = spark.range(100000L).select(col("id"),
        array((0 until 64).map(j =>
          ((pmod(hash(col("id") * 13 + j), lit(2000)) - 1000) / lit(500.0))
            .cast("float")): _*).as("embedding"))
        .cache()
      vq.count()
      def qDecl: Long = hashAll(
        operators.SimilarityOps.quantizeInt8Declarative(vq, "id")
          .select(col("id"), col("qscale"), posexplode(col("q8"))))
      def qNative: Long = hashAll(
        operators.SimilarityOps.quantizeInt8(vq, "id")
          .select(col("id"), col("qscale"), posexplode(col("q8"))))
      qDecl; qNative
      val (tqd, nqd) = time(qDecl)
      val (tqn, nqn) = time(qNative)
      require(nqd == nqn, s"quantize row mismatch: $nqd vs $nqn")
      println(s"""{"quantize_vecs":100000,"quantize_rows":$nqd,""" +
        s""""declarative_sec":$tqd,"native_kernel_sec":$tqn}""")
      // JL projection (ss13 shape): 16 interpreted aggregate(zip_with)
      // folds per row vs the one-pass jl_project kernel, consumed
      // through the same posexplode the catalog query uses
      def jlDecl: Long = hashAll(
        operators.SimilarityOps.randomProjectDeclarative(vq, 64, 16, "id")
          .select(col("id"), posexplode(col("proj_micro"))))
      def jlNative: Long = hashAll(
        operators.SimilarityOps.randomProject(vq, 64, 16, "id")
          .select(col("id"), posexplode(col("proj_micro"))))
      jlDecl; jlNative
      val (tjd, njd) = time(jlDecl)
      val (tjn, njn) = time(jlNative)
      require(njd == njn, s"jl row mismatch: $njd vs $njn")
      println(s"""{"jl_vecs":100000,"jl_rows":$njd,""" +
        s""""declarative_sec":$tjd,"native_kernel_sec":$tjn}""")
      // brute-force ANN ranking (ss1 shape): row_number window — which
      // exchanges AND fully sorts every scored (query, neighbor) row —
      // vs the bounded TopKPerKey heap (≤ k rows per query survive
      // each task) over the same 6.4M-row scored fan-out
      val qs = vq.filter(col("id") < 64)
        .select(col("id").as("query_id"), col("embedding").as("_qv"))
      def scored = vq
        .select(col("id").as("neighbor_id"), col("embedding").as("_cv"))
        .crossJoin(broadcast(qs))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("_sim", functions.CosineF32.cosineF32Native(
          col("_qv"), col("_cv")))
      def topkWindow: Long = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("query_id")
          .orderBy(col("_sim").desc, col("neighbor_id").asc)
        hashAll(scored.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 10)
          .select(col("query_id"), col("neighbor_id"), col("rk")))
      }
      def topkHeap: Long = hashAll(
        graft.plans.TopK.perKey(scored, Seq("query_id"),
          Seq(col("_sim").desc, col("neighbor_id").asc), 10)
          .select(col("query_id"), col("neighbor_id"), col("rk")))
      topkWindow; topkHeap
      val (tkw, nkw) = time(topkWindow)
      val (tkh, nkh) = time(topkHeap)
      require(nkw == nkh, s"topk row mismatch: $nkw vs $nkh")
      println(s"""{"topk_corpus":100000,"topk_queries":64,"topk_rows":$nkw,""" +
        s""""window_sec":$tkw,"heap_sec":$tkh}""")
      Release(corpus, blocking = true)
      Release(vq, blocking = true)
    }

    // k-means at data scale: 16-dim float vectors, k=16, 2 Lloyd
    // rounds — per-iteration cost is one VectorMeanAgg partial agg plus
    // one broadcast re-assignment; the corpus never shuffles by content.
    lane("kmeans") {
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
      Release(vecs, blocking = true)
    }

    // IVF / IVF-PQ build-vs-search split (the ss7/ss14 lanes time search
    // only — the build is a once-per-index artifact cost; this probe is
    // where that cost is recorded). 100k×64-dim corpus, 64 queries.
    lane("ivf") {
      val ivfN = 100000L
      val corpus = spark.range(ivfN).select(col("id").as("vec_id"),
        array((0 until 64).map(j =>
          ((pmod(hash(col("vec_id") * 13 + j), lit(2000)) - 1000)
            / lit(500.0)).cast("float")): _*).as("embedding"))
        .cache()
      corpus.count()
      val qs = corpus.filter(col("vec_id") < 64)
      val kern = functions.CosineF32.cosineF32Native(_, _)
      val dir = java.nio.file.Files
        .createTempDirectory("graft-perf-ivf").toString
      def buildIvf: Long = {
        operators.IvfIndex.build(corpus, s"$dir/ivf", nList = 64,
          idCol = "vec_id", kernel = kern); 1L
      }
      def searchIvf: Long = operators.IvfIndex.search(spark, s"$dir/ivf",
        qs, 10, nProbe = 4, idCol = "vec_id", kernel = kern).count()
      def buildPq: Long = {
        operators.IvfIndex.buildPq(corpus, s"$dir/ivfpq", nList = 64,
          m = 4, subDim = 16, kPq = 16, iters = 1, idCol = "vec_id",
          kernel = kern); 1L
      }
      def searchPq: Long = operators.IvfIndex.searchPq(spark, s"$dir/ivfpq",
        qs, k = 10, nProbe = 4, m = 4, subDim = 16, idCol = "vec_id",
        kernel = kern).count()
      val (tbi, _) = time(buildIvf)
      searchIvf // warmup against the freshly built index
      val (tsi, nsi) = time(searchIvf)
      val (tbp, _) = time(buildPq)
      searchPq
      val (tsp, nsp) = time(searchPq)
      println(s"""{"ivf_corpus":$ivfN,"ivf_build_sec":$tbi,""" +
        s""""ivf_search_sec":$tsi,"ivf_search_rows":$nsi,""" +
        s""""ivfpq_build_sec":$tbp,"ivfpq_search_sec":$tsp,""" +
        s""""ivfpq_search_rows":$nsp}""")
      Release(corpus, blocking = true)
    }

    // Hybrid BPE A/B (round 7): the SAME corpus and merge count through
    // the driver-local merge loop vs the distributed vocab-table
    // fallback (maxLocalVocab=0) — pins the per-iteration coordination
    // cost the hybrid exists to remove, as a measurement instead of an
    // extrapolation. Merge lists must be identical (asserted).
    lane("bpehybrid") {
      val n = 1000000L
      val nMerges = 20
      val word = (j: Int) => translate(lower(conv(
        pmod(hash(col("id") * 31 + j), lit(200000L)).cast("string"),
        10, 36)), "0123456789", "qrstuvwxyz")
      val corpus = spark.range(n).select(col("id"),
        concat_ws(" ", (0 until 24).map(word): _*).as("text"))
        .localCheckpoint()
      def digest(df: org.apache.spark.sql.DataFrame): Long =
        df.select(xxhash64(concat_ws("|", col("rank"), col("pair"),
            col("n"))).as("h"))
          .agg(expr("bit_xor(h)")).first.getLong(0)
      def localRun: Long = digest(operators.TextAnalysisOps
        .bpeLearn(corpus, "text", nMerges))
      def distRun: Long = digest(operators.TextAnalysisOps
        .bpeLearn(corpus, "text", nMerges, maxLocalVocab = 0L))
      localRun // warm the word-frequency agg path
      val (tl, dl) = time(localRun)
      val (td, dd) = time(distRun)
      require(dl == dd, s"merge lists diverged: $dl vs $dd")
      println(s"""{"bpehybrid_docs":$n,"merges":$nMerges,""" +
        s""""local_sec":$tl,"distributed_sec":$td,""" +
        s""""per_merge_overhead_sec":${(td - tl) / nMerges}}""")
      Release(corpus, blocking = true)
    }

    // ANN speed/recall CURVE (round 7): nProbe is the knob a real IVF
    // deployment tunes, and ss15 measures only one point of it. This
    // sweeps nProbe over a persisted index against exact brute-force
    // ground truth on a query sample — one JSON line per setting, the
    // curve PERF.md tabulates. Recall@10 is corpus-level:
    // |approx ∩ exact| / |exact| over all sample queries.
    lane("ivfcurve") {
      // CLUSTERED synthetic embeddings (256 hash-derived centers ±2
      // per dim, ±0.2 noise) — uniform-random vectors have no
      // neighborhood structure, which makes IVF recall artificially
      // terrible (measured 9% at nProbe=1) and unlike any real
      // embedding space; clustered data reproduces the regime the
      // operator exists for
      val n = 500000L
      val cidx = pmod(hash(col("id")), lit(256))
      val corpus = spark.range(n).select(col("id").as("vec_id"),
        array((0 until 64).map(j =>
          (((pmod(hash(cidx * 31 + j), lit(2000)) - 1000) / lit(500.0)) +
           ((pmod(hash(col("id") * 13 + j), lit(400)) - 200)
             / lit(1000.0))).cast("float")): _*).as("embedding"))
        .cache()
      corpus.count()
      val qs = corpus.filter(col("vec_id") < 64)
      val kern = functions.CosineF32.cosineF32Native(_, _)
      val dir = java.nio.file.Files
        .createTempDirectory("graft-perf-ivfcurve").toString
      operators.IvfIndex.build(corpus, s"$dir/ivf", nList = 64,
        idCol = "vec_id", kernel = kern)
      // exact ground truth: ONE brute-force pass for the 64-query
      // sample (the production recipe — truth for a sample, never the
      // corpus)
      val qb = qs.select(col("vec_id").as("query_id"),
        col("embedding").as("_qv"))
      // ranked under the SAME 4-decimal sim rounding the IVF scorer
      // applies — measured with unrounded truth, the curve bottoms out
      // at 0.9609 even for nProbe=64 (exhaustive): a constant ~4%
      // tie-reorder artifact at the k boundary that would mask the
      // knob under tune. Same-discipline truth isolates actual cell
      // misses (exhaustive = 1.0 by construction).
      val scored = corpus
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("_cv"))
        .crossJoin(broadcast(qb))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("_sim", round(kern(col("_qv"), col("_cv")), 4))
      val exact = graft.plans.TopK.perKey(scored, Seq("query_id"),
          Seq(col("_sim").desc, col("neighbor_id").asc), 10)
        .select(col("query_id"), col("neighbor_id")).cache()
      val nExact = exact.count()
      // nProbe=64 probes every cell — exhaustive search, so its recall
      // is the measurement ceiling: any gap from 1.0 there is the
      // approx side's 4-decimal sim rounding reordering ties at the
      // k boundary, not IVF misses
      for (nProbe <- Seq(1, 2, 4, 8, 16, 64)) {
        def searchRun: Long = operators.IvfIndex.search(spark, s"$dir/ivf",
          qs, 10, nProbe = nProbe, idCol = "vec_id", kernel = kern).count()
        searchRun // warm the probed-cell scan
        val (ts, _) = time(searchRun)
        val hits = operators.IvfIndex.search(spark, s"$dir/ivf", qs, 10,
            nProbe = nProbe, idCol = "vec_id", kernel = kern)
          .select(col("query_id"), col("neighbor_id"))
          .join(exact, Seq("query_id", "neighbor_id")).count()
        val rec = math.rint(hits.toDouble / nExact * 10000) / 10000
        println(s"""{"ivfcurve_corpus":$n,"n_probe":$nProbe,""" +
          s""""search_sec":$ts,"recall_at_10":$rec}""")
      }
      exact.unpersist(blocking = true)
      Release(corpus, blocking = true)
    }

    // DSIR gram→bucket pipeline: the pre-r5 shape (two shingle
    // Generates unioned, every gram STRING materialized and pushed
    // through the md5/conv/substring projection) vs the fused
    // gram_buckets Generator (one pass, both gram sizes, md5 over byte
    // ranges, bucket long out). Same downstream consumer (bucket
    // histogram) both sides; values are bit-identical (ExtOpsSpec pin),
    // so the histogram digests must match exactly.
    lane("dsir") {
      val n = 1000000L
      val docs = spark.range(n).select(col("id"),
        concat_ws(" ", (0 until 24).map(j =>
          pmod(hash(col("id") * 31 + j), lit(500000L)).cast("string")): _*)
          .as("text")).cache()
      docs.count()
      val buckets = 1024
      // Parity gate digests the full (bucket, count) HISTOGRAM, not the
      // distinct-bucket count: with 1024 buckets over 1M docs both
      // shapes saturate every bucket, so a count-of-buckets comparison
      // would pass even if per-bucket values diverged (advisor r5). The
      // order-insensitive bit_xor(xxhash64(bucket, count)) digest makes
      // the warmup double as an end-to-end parity check at probe scale
      // (ExtOpsSpec still pins exact small-input parity).
      def histDigest(h: org.apache.spark.sql.DataFrame): Long = h
        .agg(bit_xor(xxhash64(col("_b"), col("count")))).collect()(0).getLong(0)
      def oldShape: Long = {
        val uni = docs.select(col("id"), functions.ShingleGen
          .shingleGen(col("text"), 1, distinct = false)).toDF("id", "_g")
        val bi = docs.select(col("id"), functions.ShingleGen
          .shingleGen(col("text"), 2, distinct = false)).toDF("id", "_g")
        histDigest(uni.unionByName(bi)
          .select((conv(substring(md5(concat(lit("dsir_"), col("_g"))),
            1, 8), 16, 10).cast("long") % buckets).as("_b"))
          .groupBy(col("_b")).count())
      }
      def fused: Long = histDigest(docs
        .select(functions.ShingleGen.gramBuckets(
          col("text"), Seq(1, 2), buckets, "dsir_"))
        .groupBy(col("_b")).count())
      val ro = oldShape; val rf = fused // warmup
      require(ro == rf, s"dsir gram A/B histogram digest mismatch: $ro vs $rf")
      val (tOld, _) = time(oldShape)
      val (tNew, _) = time(fused)
      println(s"""{"dsir_gram_docs":$n,"union_md5_sec":$tOld,"fused_generator_sec":$tNew}""")
      Release(docs, blocking = true)
    }

    // Entry parser: Scala UDF (Encoder round-trip per row) vs the
    // ParseEntryExpr codegen kernel (one static call, InternalRow out) —
    // the flagship pipeline's hottest projection (round-3 verdict item 3).
    // Synthetic city-directory lines at realistic length/shape.
    lane("parse") {
      val n = 2000000L
      val lines = spark.range(n).select(concat(
        lit("Smith J"), pmod(hash(col("id")), lit(1000)),
        lit(", carpenter, "), pmod(hash(col("id") * 7), lit(400)),
        lit(" Broadway, h "), pmod(hash(col("id") * 13), lit(900)),
        lit(" Pearl st")).as("text")).cache()
      lines.count()
      // Value parity check (untimed, once per side): struct-deep via
      // to_json — correctness, not measurement.
      def jsonHash(c: org.apache.spark.sql.Column): Long =
        lines.select(xxhash64(to_json(c)).as("h"))
          .agg(bit_xor(col("h"))).collect().head.getLong(0)
      val hu = jsonHash(parse.EntryParser.parseUdf(col("text")))
      val hk = jsonHash(parse.EntryParser.parseEntry(col("text")))
      require(hu == hk, s"parser A/B hash mismatch: $hu vs $hk")
      // The TIMED consumer is deliberately cheap: array sizes plus one
      // sampled field still force the full parse (the struct is one
      // expression), but skip the heavy JSON serialization that would
      // otherwise run identically on both sides and dilute the
      // UDF-vs-kernel delta being measured (advisor r4).
      def forceParsed(c: org.apache.spark.sql.Column): Long =
        lines.select(xxhash64(
            size(c.getField("subjects")), size(c.getField("occupations")),
            size(c.getField("locations")),
            element_at(c.getField("subjects"), 1)).as("h"))
          .agg(bit_xor(col("h"))).collect().head.getLong(0)
      def viaUdf: Long = forceParsed(parse.EntryParser.parseUdf(col("text")))
      def viaKernel: Long = forceParsed(parse.EntryParser.parseEntry(col("text")))
      viaUdf; viaKernel // warm the cheap-consumer plans
      // interleaved min-of-3 (the Bench discipline): single-shot pairs
      // on this box read up to 1.5x apart on unchanged code — below the
      // session noise floor, a one-shot delta is not a finding
      val us = new Array[Double](3); val ks = new Array[Double](3)
      for (i <- 0 until 3) {
        us(i) = time { viaUdf; n }._1
        ks(i) = time { viaKernel; n }._1
      }
      val (tu, tp) = (us.min, ks.min)
      println(s"""{"parse_lines":$n,"parse_udf_sec":$tu,"parse_kernel_sec":$tp}""")
      Release(lines, blocking = true)
    }

    // Skewed join, three ways: plain sort-merge (one reducer owns the
    // hot key), AQE skew-split (runtime re-plan), and the explicit
    // salted join (SkewOps — plan-time mitigation for when the skew is
    // known). The hot key owns 50% of the big side; broadcast is
    // disabled to model the small-side-too-big regime the mitigation
    // exists for (same rationale as the bloom lane). The signal is the
    // STRAGGLER, not just wall time: max task duration in the timed
    // region shows whether the hot partition was actually split.
    lane("skew") {
      val n = 10000000L
      val kUniform = 1000
      val big = spark.range(n).select(
        when(pmod(col("id"), lit(2)) === 0, lit(0L))
          .otherwise(pmod(hash(col("id")), lit(kUniform)).cast("long") + 1L)
          .as("k"),
        md5(col("id").cast("string")).as("payload")).cache()
      val small = spark.range(kUniform + 1).select(col("id").as("k"),
        md5(concat(lit("dim"), col("id").cast("string"))).as("dim_payload"))
        .cache()
      big.count(); small.count()
      val maxTaskMs = new java.util.concurrent.atomic.AtomicLong
      val maxReadRows = new java.util.concurrent.atomic.AtomicLong
      val taskListener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          maxTaskMs.updateAndGet(m => math.max(m, te.taskInfo.duration))
          // the direct reducer-skew signal: rows into the widest task
          // (durations also cover map/digest tasks and box noise)
          val r = te.taskMetrics.shuffleReadMetrics.recordsRead
          maxReadRows.updateAndGet(m => math.max(m, r))
        }
      }
      // hash-all action (count alone would prune the payloads and
      // shrink the very exchange whose skew is being measured)
      def digestOf(df: org.apache.spark.sql.DataFrame): Long = {
        val cols = df.columns.sorted.map(col)
        df.select(xxhash64(cols: _*).as("h"))
          .agg(bit_xor(col("h"))).collect().head.getLong(0)
      }
      val bcWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      try {
        def withAqe[A](on: Boolean)(f: => A): A = {
          spark.conf.set("spark.sql.adaptive.enabled", on)
          if (on) {
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            // local-scale tuning: the defaults (factor 5, threshold
            // 256m) are sized for cluster partitions; at this probe's
            // ~50m median the same RELATIVE skew needs proportionally
            // smaller cutoffs for the optimizer to see it
            spark.conf.set(
              "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
            spark.conf.set(
              "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
              "32m")
            spark.conf.set(
              "spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
            spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin",
              "true")
          }
          f
        }
        def plain: Long = withAqe(false) {
          digestOf(big.join(small.hint("merge"), Seq("k")))
        }
        def aqeSplit: Long = withAqe(true) {
          digestOf(big.join(small.hint("merge"), Seq("k")))
        }
        val salts = sys.env.getOrElse("GRAFT_SKEW_SALTS", "32").toInt
        def salted: Long = withAqe(false) {
          digestOf(operators.SkewOps.saltedJoin(big, small, Seq("k"),
            salts = salts))
        }
        val dPlain = plain; val dAqe = aqeSplit; val dSalt = salted // warm
        require(dPlain == dAqe && dPlain == dSalt,
          s"skew A/B digest mismatch: $dPlain / $dAqe / $dSalt")
        // interleaved min-of-3 wall; max-task from each shape's
        // fastest pass would race the listener bus, so track the max
        // PER RUN and keep the one paired with the min wall
        spark.sparkContext.addSparkListener(taskListener)
        val wall = Array.fill(3)(new Array[Double](3))
        val straggler = Array.fill(3)(new Array[Long](3))
        val widest = Array.fill(3)(new Array[Long](3))
        val shapes: Array[() => Long] =
          Array(() => plain, () => aqeSplit, () => salted)
        for (pass <- 0 until 3; s <- 0 until 3) {
          maxTaskMs.set(0); maxReadRows.set(0)
          wall(s)(pass) = time { shapes(s)(); n }._1
          Thread.sleep(1500) // drain the listener bus (dev tool)
          straggler(s)(pass) = maxTaskMs.get
          widest(s)(pass) = maxReadRows.get
        }
        spark.sparkContext.removeSparkListener(taskListener)
        def best(s: Int): (Double, Long, Long) = {
          val p = wall(s).indexOf(wall(s).min)
          (wall(s)(p), straggler(s)(p), widest(s)(p))
        }
        val (tp2, mp, rp) = best(0); val (ta, ma, ra) = best(1)
        val (ts2, ms, rs) = best(2)
        println(s"""{"skew_rows":$n,"hot_share":0.5,""" +
          s""""plain_sec":$tp2,"plain_max_task_ms":$mp,"plain_max_task_read_rows":$rp,""" +
          s""""aqe_sec":$ta,"aqe_max_task_ms":$ma,"aqe_max_task_read_rows":$ra,""" +
          s""""salted_sec":$ts2,"salted_max_task_ms":$ms,"salted_max_task_read_rows":$rs}""")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcWas)
        spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      }
      Release(big, blocking = true)
      Release(small, blocking = true)
    }

    // SimHash Hamming LSH (dd15): the 4-band guaranteed-recall union
    // vs a single 15-bit prefix table, both over one cached signature
    // set — candidate-generation cost vs recall, the trade the
    // multi-band design pays for. Corpus: 30-word docs over a 50 k
    // vocab; every 10th doc an EXACT copy of its predecessor-9 (pairs
    // at hamming 0 both variants must find) and every 10th-plus-5 a
    // one-word-perturbed near copy (signature a few flips away — found
    // only when no flip lands in the single prefix, i.e. where the
    // band union earns its keep). End-to-end wall from raw text is
    // reported separately (the production path re-deriving signatures).
    lane("simhash") {
      val n = 200000L
      val base = when(pmod(col("id"), lit(10)) === 9, col("id") - 9)
        .when(pmod(col("id"), lit(10)) === 5, col("id") - 5)
        .otherwise(col("id"))
      val words = (0 until 30).map { j =>
        val w = pmod(hash(base * 31 + j), lit(50000L)).cast("string")
        if (j == 29)
          when(pmod(col("id"), lit(10)) === 5,
            pmod(hash(col("id") * 131 + j), lit(50000L)).cast("string"))
            .otherwise(w)
        else w
      }
      val docs = spark.range(n)
        .select(col("id"), concat_ws(" ", words: _*).as("text")).cache()
      docs.count()
      val sh = operators.DedupOps.simhash60(docs, "id", "text", 3).cache()
      sh.count()
      def pairsFrom(banded: org.apache.spark.sql.DataFrame): Long = {
        val l = banded.select(col("_band"), col("_bv"),
          col("id").as("a"), col("simhash").as("_sa"))
        val r = banded.select(col("_band"), col("_bv"),
          col("id").as("b"), col("simhash").as("_sb"))
        l.join(r, Seq("_band", "_bv"))
          .filter(col("a") < col("b"))
          .select("a", "b", "_sa", "_sb").distinct()
          .filter(bit_count(col("_sa").bitwiseXOR(col("_sb"))) <= 3)
          .count()
      }
      def banded4: Long = pairsFrom(sh.select(col("id"), col("simhash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("simhash"), b * 15).bitwiseAND(lit(32767L))): _*)))
        .toDF("id", "simhash", "_band", "_bv"))
      def prefix1: Long = pairsFrom(sh.select(col("id"), col("simhash"),
        lit(0).as("_band"),
        col("simhash").bitwiseAND(lit(32767L)).as("_bv")))
      def e2e: Long = operators.DedupOps.simhashHammingPairs(
        docs, "id", "text", k = 3, maxHamming = 3, bands = 4).count()
      val pb = banded4; val pp = prefix1 // warmup
      require(pb >= pp,
        s"band union must dominate the single prefix: $pb < $pp")
      // interleaved min-of-3 (the skew-lane convention): single-shot
      // walls on a shared box flip the A/B verdict run to run
      val runs = (0 until 3).map { _ =>
        (time(banded4)._1, time(prefix1)._1, time(e2e)._1)
      }
      val tb = runs.map(_._1).min
      val tp = runs.map(_._2).min
      val te = runs.map(_._3).min
      val nb = banded4; val np = prefix1; val ne = e2e
      require(ne == nb, s"e2e pair count drifted: $ne vs $nb")
      println(s"""{"simhash_docs":$n,"banded4_sec":$tb,"banded4_pairs":$nb,""" +
        s""""prefix1_sec":$tp,"prefix1_pairs":$np,"e2e_sec":$te}""")
      Release(sh, blocking = true)
      Release(docs, blocking = true)
    }

    // tx40 economics: per-source cap under DOMAIN SKEW — one source owns
    // half the corpus (the case the cap exists for). Heap (TopKPerKey,
    // map-side pruned to ≤cap rows/source/task) vs the row_number window
    // (sorts the dominant source's full row set in one task).
    lane("srccap") {
      val n = 10000000L
      val nSrc = 1000
      val cap = 100
      val docs = spark.range(n).select(
          col("id"),
          when(pmod(col("id"), lit(2)) === 0, lit("megasite"))
            .otherwise(concat(lit("s"),
              pmod(hash(col("id")), lit(nSrc)).cast("string"))).as("source"))
        .cache()
      docs.count()
      def viaHeap: Long = operators.TextAnalysisOps
        .sourceCap(docs, "id", "source", cap).count()
      def viaWindow: Long = {
        val w = Window.partitionBy("source")
          .orderBy(md5(col("id").cast("string")).asc, col("id").asc)
        docs.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= cap).select("source", "id").count()
      }
      viaHeap; viaWindow // warmup
      val runs = (0 until 3).map(_ => (time(viaHeap)._1, time(viaWindow)._1))
      val th = runs.map(_._1).min
      val tw = runs.map(_._2).min
      val nh = viaHeap; val nw = viaWindow
      require(nh == nw, s"cap row count mismatch: $nh vs $nw")
      println(s"""{"srccap_docs":$n,"srccap_sources":${nSrc + 1},"cap":$cap,""" +
        s""""heap_sec":$th,"window_sec":$tw,"kept":$nh}""")
      // LARGE-cap regime (cap ≥ per-task per-key volume): the heap path
      // is the one that DIED here — min(task rows, cap) deserialized
      // copies per key, unspillable, OOM at tight heap — so the A/B is
      // histogram-cutoff vs the spillable window, not vs the heap.
      val capL = 100000
      def viaHistL: Long = operators.TextAnalysisOps
        .sourceCap(docs, "id", "source", capL).count()
      def viaWindowL: Long = {
        val w = Window.partitionBy("source")
          .orderBy(md5(col("id").cast("string")).asc, col("id").asc)
        docs.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= capL).select("source", "id").count()
      }
      viaHistL; viaWindowL // warmup
      val runsL = (0 until 3).map(_ =>
        (time(viaHistL)._1, time(viaWindowL)._1))
      val thL = runsL.map(_._1).min
      val twL = runsL.map(_._2).min
      val nhL = viaHistL; val nwL = viaWindowL
      require(nhL == nwL, s"large-cap row count mismatch: $nhL vs $nwL")
      println(s"""{"srccap_docs":$n,"cap":$capL,"hist_sec":$thL,""" +
        s""""window_sec":$twL,"kept":$nhL}""")
      Release(docs, blocking = true)
    }

    // ss16 economics: knnGraph's bits knob traded explicitly — fewer
    // sign bits = bigger buckets = more pair volume AND higher neighbor
    // recall. Ground truth = brute-force top-k for a 1-in-500 query
    // sample (the ivfcurve recipe: measure the curve, not a point).
    lane("knn") {
      val n = 50000L
      val dim = 16
      val k = 5
      val vecs = spark.range(n).select(col("id"),
          array((0 until dim).map(j =>
            ((pmod(hash(col("id") * 31 + j), lit(1000)) - 500) / 500.0)
              .cast("float")): _*).as("embedding"))
        .cache()
      vecs.count()
      val sample = vecs.filter(pmod(col("id"), lit(500)) === 0)
        .select(col("id").as("qid"), col("embedding").as("qv"))
      val exact = operators.SimilarityOps.bruteForceTopK(
          vecs, sample.select(col("qid").as("id"),
            col("qv").as("embedding")),
          k, "id", "embedding")
        .select(col("query_id"), col("neighbor_id")).cache()
      val nExact = exact.count()
      // probes·bits ≤ dim(16): the multi-probe sweep holds bits at 4
      // and adds probes — recall climbs at constant bucket size
      for ((bits, probes) <- Seq((2, 1), (4, 1), (6, 1),
                                 (4, 2), (4, 3), (4, 4), (6, 2))) {
        def graph = operators.SimilarityOps.knnGraphMultiProbe(
          vecs, k, bits, probes, idCol = "id",
          kernel = graft.functions.CosineF32.cosineF32Native(_, _))
        val (sec, edges) = time(graph.count())
        val hits = graph
          .join(sample.select(col("qid").as("a")), Seq("a"), "left_semi")
          .join(exact.select(col("query_id").as("a"),
            col("neighbor_id").as("b")), Seq("a", "b"), "left_semi")
          .count()
        val recall = hits.toDouble / nExact
        println(s"""{"knn_vecs":$n,"bits":$bits,"probes":$probes,""" +
          s""""sec":$sec,"edges":$edges,""" +
          s""""recall_at_$k":${math.rint(recall * 1000) / 1000}}""")
      }
      Release(exact, blocking = true)
      Release(vecs, blocking = true)
    }

    // tx17 economics: mixToBudget under a dominant stratum — the
    // histogram-cutoff rewrite vs the per-stratum window cumsum it
    // replaced. The bench charged the rewrite +0.4 s of fixed overhead
    // at sf0.1's toy strata; this is the regime the operator exists
    // for.
    lane("mix") {
      val n = 10000000L
      val docs = spark.range(n).select(
          col("id"),
          when(pmod(col("id"), lit(2)) === 0, lit("megacorpus"))
            .otherwise(concat(lit("s"),
              pmod(hash(col("id")), lit(200)).cast("string"))).as("source"),
          (lit(5) + pmod(col("id"), lit(20))).as("w"))
        .cache()
      docs.count()
      val budgets = Map("megacorpus" -> 10000000L) // ~1/7 of its tokens
      val dflt = 200000L // ~½ of a small stratum's tokens
      def viaShipped: Long = operators.TextAnalysisOps
        .mixToBudget(docs, "id", "source", "w", budgets, dflt).count()
      def viaWindow: Long = {
        val h = md5(col("id").cast("string"))
        val w = Window.partitionBy(col("source"))
          .orderBy(h.asc, col("id").asc)
          .rowsBetween(Long.MinValue, 0)
        val budget = budgets.foldLeft(lit(dflt): org.apache.spark.sql.Column) {
          case (acc, (s, b)) =>
            when(col("source") === s, lit(b)).otherwise(acc)
        }
        docs.withColumn("_run", sum(col("w").cast("long")).over(w))
          .filter(col("_run") <= budget).count()
      }
      viaShipped; viaWindow // warmup
      val runs = (0 until 3).map(_ =>
        (time(viaShipped)._1, time(viaWindow)._1))
      val ts = runs.map(_._1).min
      val tw = runs.map(_._2).min
      val ns = viaShipped; val nw = viaWindow
      require(ns == nw, s"mix keep count mismatch: $ns vs $nw")
      println(s"""{"mix_docs":$n,"hist_sec":$ts,"window_sec":$tw,"kept":$ns}""")
      Release(docs, blocking = true)
    }

    // tx43 economics: heavy hitters via the MG sketch vs the exact
    // groupBy. 50 M items over ~5 M distinct keys with 16 hot keys
    // holding half the stream: the exact path shuffles every distinct
    // key's partial count; the sketch ships one ≤64-entry map per
    // partition (partial_misragries, verified in the plan).
    lane("hh") {
      val n = 50000000L
      val distinctKeys = 5000000L
      val kSketch = 64 // threshold n/65 ≈ 769k < hot-key freq 1.56M
      val items = spark.range(n).select(
          // id/2 mod 16, NOT id mod 16 — even ids alone hit only the
          // 8 even residues
          when(pmod(col("id"), lit(2)) === 0,
            concat(lit("hot"), pmod(col("id") / 2, lit(16)).cast("string")))
            .otherwise(concat(lit("k"),
              pmod(hash(col("id")), lit(distinctKeys)).cast("string")))
            .as("item"))
        .cache()
      items.count()
      def viaExact: Long = items.groupBy("item")
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("item").asc).limit(kSketch).count()
      def viaSketch: Long = operators.HeavyHitters
        .heavyHitters(items, "item", kSketch).count()
      viaExact; viaSketch // warmup
      val runs = (0 until 3).map(_ =>
        (time(viaExact)._1, time(viaSketch)._1))
      val te = runs.map(_._1).min
      val ts = runs.map(_._2).min
      // contract bite: all 16 hot keys must be in the sketch
      val kept = operators.HeavyHitters
        .heavyHitters(items, "item", kSketch)
        .filter(col("item").startsWith("hot")).count()
      require(kept == 16, s"sketch lost hot keys: $kept/16")
      println(s"""{"hh_items":$n,"hh_distinct":$distinctKeys,""" +
        s""""k":$kSketch,"exact_sec":$te,"sketch_sec":$ts,"hot_kept":$kept}""")
      Release(items, blocking = true)
    }

    // tx41 economics: token-budget selection — two-phase
    // histogram-and-cutoff vs the naive single-partition global window
    // cumsum. ~90 distinct quality values so the boundary tie group is
    // corpus/90; the naive twin sorts the WHOLE corpus in one task.
    lane("budget") {
      val n = 5000000L
      val nStop = pmod(col("id"), lit(7))
      val nFill = lit(8) + pmod(col("id"), lit(13))
      val docs = spark.range(n).select(col("id"),
          array_join(concat(
            array_repeat(lit("the"), nStop.cast("int")),
            array_repeat(lit("zebra"), (nFill - nStop).cast("int"))),
            " ").as("text"))
        .cache()
      docs.count()
      val budget = n * 5 // ≈ half the corpus's tokens → mid-corpus cut
      def viaTwoPhase: Long = {
        val (sel, release) = operators.TextAnalysisOps
          .tokenBudgetSelectReleasable(docs, "id", "text", budget)
        val c = sel.count()
        release()
        c
      }
      def viaNaive: Long = {
        val scored = operators.TextAnalysisOps
          .qualityMetrics(docs, "id", "text")
          .select(col("id"), col("n_tokens").cast("long").as("n_tokens"),
            col("stopword_ratio"))
        val w = Window.orderBy(col("stopword_ratio").desc, col("id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        scored.withColumn("_cum", sum("n_tokens").over(w))
          .filter(col("_cum") <= budget).count()
      }
      viaTwoPhase; viaNaive // warmup
      val runs = (0 until 3).map(_ =>
        (time(viaTwoPhase)._1, time(viaNaive)._1))
      val tt = runs.map(_._1).min
      val tn = runs.map(_._2).min
      val nt = viaTwoPhase; val nn = viaNaive
      require(nt == nn, s"budget keep count mismatch: $nt vs $nn")
      println(s"""{"budget_docs":$n,"budget_tokens":$budget,""" +
        s""""twophase_sec":$tt,"naive_window_sec":$tn,"kept":$nt}""")
      Release(docs, blocking = true)
    }

    // DataFrame fixed-point PageRank vs GraphX's Pregel staticPageRank
    // at the same iteration count — the gr-family side of the dd6
    // DF-vs-GraphX story. NOT a result-equality A/B: GraphX ranks are
    // float (association-order-dependent) with different
    // dangling/teleport scaling; the comparison is wall + the
    // determinism property itself (the DF form's ranks are
    // bit-identical across partitionings, GraphX's are not
    // guaranteed), so only the vertex COUNT is cross-checked.
    lane("pagerank") {
      val gn = if (args.length > 2) args(2).toLong else 1000000L
      val edges = spark.range(gn).select(col("id").as("a"),
          explode(array((0 until 5).map { j =>
            (if (j % 2 == 0) pmod(hash(col("id") * 13 + j), lit(gn / 100))
             else pmod(hash(col("id") * 31 + j), lit(gn))).cast("long")
          }: _*)).as("b"))
        .filter(col("a") =!= col("b"))
        .localCheckpoint()
      def viaDf: Long = {
        val (pr, rel) = operators.GraphOps.pagerankReleasable(edges, 3)
        val n = pr.count(); rel(); n
      }
      def viaGx: Long = {
        val tuples = edges.rdd.map(r => (r.getLong(0), r.getLong(1)))
        val g = org.apache.spark.graphx.Graph.fromEdgeTuples(tuples, 1)
        val n = g.staticPageRank(3, 0.15).vertices.count()
        g.unpersist(false)
        n
      }
      viaDf; viaGx // warmup
      val runs = (0 until 3).map(_ => (time(viaDf)._1, time(viaGx)._1))
      val td = runs.map(_._1).min
      val tg = runs.map(_._2).min
      val nd = viaDf; val ng = viaGx
      println(s"""{"pagerank_edges_from":$gn,"pr_df_sec":$td,""" +
        s""""pr_graphx_sec":$tg,"df_nodes":$nd,"gx_nodes":$ng}""")
      Release(edges, blocking = true)
    }

    // Micro-batch machinery cost attribution (round-9 verdict #3): what
    // part of an st*-style drain is FIXED (checkpoint dir, state-store
    // commit, no-data finalize batch) vs actual join/agg work. Runs the
    // st5 stream-stream interval-join PLAN twice — once over an
    // EMPTY-filtered stream (machinery only: the source lists files,
    // every batch commits, the watermark machinery runs, but zero rows
    // reach the join state) and once over the real sf0.1 events — so
    // PERF.md can state st5's cost split instead of guessing. At scale
    // the fixed part amortizes per micro-batch; the row-dependent part
    // is what grows.
    lane("stdrain") {
      val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      def attribution(empty: Boolean): Long = {
        val ev0 = graft.streaming.StreamParity.eventsStream(spark, sf)
        val ev = if (empty) ev0.filter(lit(false)) else ev0
        graft.streaming.StreamParity.drainAppend(
          graft.streaming.StreamingOps.clickAttributionStream(
            ev.filter(col("event_type") === "click"),
            ev.filter(col("event_type") === "purchase"),
            "30 minutes", "2 hours")).count()
      }
      attribution(empty = true); attribution(empty = false) // warmup
      val te = (0 until 3).map(_ => time(attribution(empty = true))._1).min
      val tf = (0 until 3).map(_ => time(attribution(empty = false))._1).min
      val nf = attribution(empty = false)
      println(s"""{"stdrain_empty_sec":$te,"stdrain_full_sec":$tf,""" +
        s""""join_work_sec":${tf - te},"full_rows":$nf}""")

      // Finer attribution (round 11): split the fixed machinery into
      // its parts so the optimization target is measured, not guessed —
      // (a) stream-source construction alone (batch-table conf replay +
      // schema read + staging stat), (b) a STATELESS empty drain (query
      // start/stop, micro-batch planning, sink, checkpoint log — no
      // state stores), (c) a one-store windowed agg, all empty-filtered.
      // (join − agg) ≈ the 4-store join's extra state machinery;
      // (agg − stateless) ≈ one stateful op's store cost;
      // (stateless − 0) ≈ the irreducible per-query floor.
      def emptyEv() = graft.streaming.StreamParity
        .eventsStream(spark, sf).filter(lit(false))
      val tSrc = (0 until 3).map(_ => time {
        graft.streaming.StreamParity.eventsStream(spark, sf); 0L }._1).min
      def statelessDrain(): Long = graft.streaming.StreamParity
        .drainAppend(emptyEv().select(col("event_id"))).count()
      def aggDrain(): Long = graft.streaming.StreamParity.drainAppend(
        graft.streaming.StreamingOps.tumblingStream(
          emptyEv(), "1 hour")).count()
      statelessDrain(); aggDrain() // warmup
      val tSl = (0 until 3).map(_ => time(statelessDrain())._1).min
      val tAg = (0 until 3).map(_ => time(aggDrain())._1).min
      println(s"""{"stdrain_src_sec":$tSrc,"stdrain_stateless_sec":$tSl,""" +
        s""""stdrain_agg_sec":$tAg,"stdrain_join_sec":$te}""")
    }

    // Nearest as-of: the joinless union-sort lowering (ev21) vs the
    // band-join + per-left argmin formulation. Same result by
    // construction (asserted on count + picked-id checksum); the
    // difference is what rides the exchange — |L|+|R| rows vs every
    // candidate pair. 2M purchases / 20M clicks / 100k users, clicks
    // every 60 s per user, tolerance 120 s (~4 candidates/purchase).
    lane("asof") {
      val users = 100000L
      val clicks = spark.range(20000000L).select(
          (col("id") % users).as("u"),
          timestamp_micros((col("id") / users).cast("long") * 60000000L +
            pmod(hash(col("id")), lit(1000L)) * 1000).as("t"),
          col("id").as("cid"))
        .localCheckpoint()
      val purchases = spark.range(2000000L).select(
          (col("id") % users).as("u"),
          timestamp_micros((col("id") / users).cast("long") * 600000000L +
            pmod(hash(col("id"), lit(7)), lit(50000L)) * 1000).as("t"),
          col("id").as("pid"))
        .localCheckpoint()
      def viaUnionSort(tol: Long): (Long, Long) = {
        val r = operators.EventOps.asOfNearest(purchases, clicks,
            "u", "t", tol, Seq("cid"))
          .agg(count(col("_m")), sum(col("_m").getField("cid"))).head()
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      def viaBandJoin(tol: Long): (Long, Long) = {
        val c = clicks.select(col("u"), col("t").as("ct"), col("cid"))
        val cand = purchases.join(c, Seq("u"))
          .withColumn("ad", abs(unix_micros(col("ct")) -
            unix_micros(col("t"))))
          .filter(col("ad") <= tol)
          .withColumn("dir",
            when(unix_micros(col("ct")) <= unix_micros(col("t")), 0)
              .otherwise(1))
        val r = plans.TopK.perKey(cand, Seq("pid"),
            Seq(col("ad").asc, col("dir").asc, col("cid").asc), 1)
          .agg(count(lit(1)), sum(col("cid"))).head()
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      for (tol <- Seq(120000000L, 3600000000L)) {
        viaUnionSort(tol); viaBandJoin(tol) // warmup
        val t0 = System.nanoTime(); val (nu, su) = viaUnionSort(tol)
        val tu = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime(); val (nb, sb) = viaBandJoin(tol)
        val tb = (System.nanoTime() - t1) / 1e9
        require(nu == nb && su == sb,
          s"asof formulations disagree at tol=$tol: ($nu,$su) vs ($nb,$sb)")
        println(s"""{"asof_purchases":2000000,"asof_clicks":20000000,""" +
          s""""tol_sec":${tol / 1000000},""" +
          s""""unionsort_sec":${math.rint(tu * 10) / 10},""" +
          s""""bandjoin_sec":${math.rint(tb * 10) / 10},"matched":$nu}""")
      }
      Release(clicks, blocking = true)
      Release(purchases, blocking = true)
    }

    // Degenerate-bucket cap forms head-to-head (round 14, the r13
    // charged finding): the same capped fingerprint-pair vote computed
    // three ways on a 2M-asset corpus (4 fingerprints/asset, gid twins,
    // 30% of assets carrying ONE degenerate fingerprint — a 600k-row
    // hot bucket the cap must excise). (a) count(*) OVER (PARTITION BY
    // fp) + filter + self-join — WindowExec colocates the whole hot
    // bucket in one task before the filter sees it; (b) map-side
    // groupBy(fp).count + join-back + self-join — the cap is partial-
    // aggregated but pairs still pay a keyed self-join; (c) the shipped
    // BoundedCollect posting form (cappedContainmentVotes) — O(cap)
    // partial buffers AND map-side pair explosion. Results asserted
    // identical; interleaved min-of-3 walls.
    lane("paircap") {
      val nAssets = math.min(rows, 2000000L)
      val fpRows = spark.range(nAssets)
        .select(col("id").as("a_id"),
          explode(sequence(lit(0), lit(3))).as("j"))
        .select(col("a_id"),
          when(col("a_id") % 10 < 3 && col("j") === 0, lit("DEGENERATE"))
            .otherwise(md5(concat_ws(":",
              (col("a_id") - col("a_id") % 2).cast("string"),
              col("j").cast("string")))).as("fp"))
        .cache()
      fpRows.count()
      def agg(votes: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val r = votes.agg(count(lit(1)),
          coalesce(sum("shared"), lit(0L))).first()
        (r.getLong(0), r.getLong(1))
      }
      def viaWindow(): (Long, Long) = {
        val w = Window.partitionBy("fp")
        val capped = fpRows.withColumn("_n", count(lit(1)).over(w))
          .filter(col("_n") <= 8).drop("_n")
        val l = capped.select(col("a_id").as("a"), col("fp"))
        val r = capped.select(col("a_id").as("b"), col("fp"))
        agg(l.join(r, Seq("fp")).filter(col("a") < col("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("shared"))
          .filter(col("shared") >= 2))
      }
      def viaCountJoin(): (Long, Long) = {
        val keep = fpRows.groupBy("fp").agg(count(lit(1)).as("_n"))
          .filter(col("_n") <= 8).select("fp")
        val capped = fpRows.join(keep, Seq("fp"), "left_semi")
        val l = capped.select(col("a_id").as("a"), col("fp"))
        val r = capped.select(col("a_id").as("b"), col("fp"))
        agg(l.join(r, Seq("fp")).filter(col("a") < col("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("shared"))
          .filter(col("shared") >= 2))
      }
      def viaPosting(): (Long, Long) =
        agg(operators.MultimodalOps.cappedContainmentVotes(
          fpRows, "a_id", "fp", cap = 8, minShared = 2))
      val rw0 = viaWindow(); val rc0 = viaCountJoin(); val rp0 = viaPosting()
      require(rw0 == rc0 && rc0 == rp0,
        s"cap forms disagree: $rw0 vs $rc0 vs $rp0")
      val walls = (0 until 3).map { _ =>
        (time(viaWindow()._1)._1, time(viaCountJoin()._1)._1,
          time(viaPosting()._1)._1)
      }
      val tw = walls.map(_._1).min
      val tc = walls.map(_._2).min
      val tp = walls.map(_._3).min
      println(s"""{"paircap_assets":$nAssets,"pairs":${rp0._1},""" +
        s""""window_sec":${math.rint(tw * 10) / 10},""" +
        s""""countjoin_sec":${math.rint(tc * 10) / 10},""" +
        s""""posting_sec":${math.rint(tp * 10) / 10}}""")
      Release(fpRows, blocking = true)
    }
    spark.stop()
  }
}

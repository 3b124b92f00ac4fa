package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scale-up smoke for the heavy pipelines: runs each at 5–20× the
  * PerfCompare probe sizes (tens of millions of segments, millions of
  * documents/vectors) and prints one JSON line per stage. The POINT is
  * not the wall time — it is that every shape completes with bounded
  * memory: no OOM from an unbounded collect/buffer, no pair explosion
  * from a skewed key, no driver-sized state. Run it at the TIGHT heap
  * (the 8g default = 256 MB/slot at local[32]) — that is the
  * configuration that exposed the unspillable shuffled-hash build
  * (PERF.md). Sizes are CLI-overridable: `runMain graft.ScaleSmoke
  * [spanDocs] [containDocs] [lshDocs] [tfidfDocs] [embVecs] [evEvents]
  * [shardDocs] [vocabDocs] [pqVecs] [dsirDocs]`. `GRAFT_SS_ONLY=
  * <lanes>` replays just the named lanes — any comma-separated subset
  * of simhash, decon, bpe, overlap, curation, capbudget, graph, tri,
  * linkp, ivj, ivc, spj, recallcap, fuzzygeo, aqeskew, codecs, gcj,
  * framedup, unorm.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spanDocs = if (args.length > 0) args(0).toLong else 10000000L
    val containDocs = if (args.length > 1) args(1).toLong else 2000000L
    // 2M is the TIGHT-HEAP (8g) full-suite size — the r6 refresh's
    // documented invocation. 5M LSH docs yield 119.8M candidate edges
    // whose CC pass wants the 48 g headroom profile (PERF.md r3 table);
    // at 8 g it OOMs in the cluster stage (measured again r12). Pass 5M
    // explicitly when running the big profile.
    val lshDocs = if (args.length > 2) args(2).toLong else 2000000L
    val tfidfDocs = if (args.length > 3) args(3).toLong else 10000000L
    val embVecs = if (args.length > 4) args(4).toLong else 2000000L
    val evEvents = if (args.length > 5) args(5).toLong else 20000000L
    val shardDocs = if (args.length > 6) args(6).toLong else 10000000L
    val vocabDocs = if (args.length > 7) args(7).toLong else 10000000L
    val pqVecs = if (args.length > 8) args(8).toLong else 2000000L
    val dsirDocs = if (args.length > 9) args(9).toLong else 5000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 2 * cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC") // NTZ ts cast precondition (Tables.normalizeEventTs)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def round1(d: Double): Double = math.rint(d * 10) / 10

    // Targeted replays (the PerfCompare affordance): GRAFT_SS_ONLY
    // names a subset of the named lanes (simhash, decon, bpe, overlap, capbudget,
    // curation, graph, tri, scc, spandedupskew, packskew, ...); unset
    // runs everything including the legacy block below.
    val only = sys.env.get("GRAFT_SS_ONLY")
      .map(_.split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    def lane(name: String)(body: => Unit): Unit =
      if (only.isEmpty || only.contains(name)) body

    if (only.isEmpty) locally {
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
    Release(spanCorpus, blocking = true)

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
    Release(containCorpus, blocking = true)

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
    Release(lshCorpus, blocking = true)

    // text lane: tf-idf at crawl scale — the (doc, term) partial agg
    // carries ~24 tokens/doc (240M rows), the df table derives from it,
    // and the term join back is UNHINTED so Catalyst may shuffle when
    // the vocabulary (500k terms here) outgrows a broadcast. All stages
    // sort-based and spillable.
    val tfidfCorpus = spark.range(tfidfDocs).select(col("id"),
      concat_ws(" ", (0 until 24).map(j =>
        pmod(hash((col("id") - col("id") % 4)).cast("long") * 31 + j,
          lit(500000L)).cast("string")): _*).as("text"))
      .localCheckpoint()
    val (t5, n5) = t(operators.TextAnalysisOps
      .tfidf(tfidfCorpus, "id", "text", minTf = 1).count())
    println(s"""{"tfidf_docs":$tfidfDocs,"sec":${round1(t5)},"doc_terms":$n5}""")
    Release(tfidfCorpus, blocking = true)

    // similarity lane: embedding near-dup pairs — 24-dim float vectors
    // in duplicate groups of 4 (shared base pattern, per-member noise an
    // order of magnitude below the base scale, so groups land in one
    // sign bucket and cosine ≈ 1). bits=16 → 65k buckets keeps the
    // within-bucket pair formation bounded (~30 vectors/bucket);
    // the bucket equi-join is unhinted → spillable.
    val base = col("vid") - col("vid") % 4
    val embCorpus = spark.range(embVecs)
      .select(col("id").as("vid"))
      .select(col("vid"), array((0 until 24).map(j =>
        ((pmod(hash(base * 31 + j), lit(2001)) - 1000).cast("float") / 1000.0f +
          (pmod(hash(col("vid") * 7 + j), lit(21)) - 10).cast("float") / 10000.0f)
          .cast("float")): _*).as("embedding"))
      .localCheckpoint()
    val (t6, n6) = t(operators.DedupOps.embeddingPairs(
      embCorpus, threshold = 0.99, bits = 16,
      idCol = "vid", vecCol = "embedding").count())
    println(s"""{"emb_vecs":$embVecs,"sec":${round1(t6)},"near_dup_pairs":$n6}""")
    Release(embCorpus, blocking = true)

    // events lane: session windows and the as-of join, with a PLANTED
    // HOT KEY — user 0 owns 5% of all events, so one task receives a
    // million-row partition that forms ONE giant session (worst case
    // for session merging) and one million-row window partition in the
    // as-of. Both shapes must sort-spill, not buffer.
    val events = spark.range(evEvents).select(
        col("id").as("event_id"),
        when(col("id") % 20 === 0, 0L)
          .otherwise(pmod(hash(col("id")), lit(200000L))).as("user_id"),
        timestamp_seconds(lit(1600000000L) +
          pmod(hash(col("id") * 13), lit(10000000L))).as("ts"),
        when(col("id") % 5 === 0, "purchase").otherwise("click")
          .as("event_type"),
        (pmod(hash(col("id") * 7), lit(10000L)) / 100.0).as("value"))
      .localCheckpoint()
    val (t7, n7) = t(operators.EventOps
      .sessions(events, "30 minutes").count())
    println(s"""{"ev_events":$evEvents,"sec":${round1(t7)},"sessions":$n7}""")
    val right = events.filter(col("event_id") % 10 === 0)
      .select(col("user_id"), col("ts"), col("value"))
    // count(_match), not count(): a bare count() lets ColumnPruning
    // delete the unused window projection and the stage measures only
    // the union — the same prune trap Bench's hash-all action closes.
    val (t8, n8) = t(operators.EventOps.asOfJoin(
      events.filter(col("event_type") === "purchase"), right,
      key = "user_id", time = "ts", rightCols = Seq("value"))
      .agg(count(col("_match"))).first.getLong(0))
    println(s"""{"asof_left":${evEvents / 5},"sec":${round1(t8)},"matched":$n8}""")

    // export lane: the deterministic global shuffle at crawl scale —
    // 1024 shards, per-shard sort + order-sensitive XOR fingerprint.
    // The shuffle carries (id, weight) pairs only, never documents;
    // state per task is the sort spill, not a buffer.
    val exportDocs = spark.range(shardDocs).select(col("id"),
      (pmod(hash(col("id") * 3), lit(2000L)) + 24).as("n_tokens"))
      .localCheckpoint()
    val (t9, n9) = t(operators.TextAnalysisOps
      .shardManifest(exportDocs, "id", "n_tokens", 1024).count())
    println(s"""{"shard_docs":$shardDocs,"sec":${round1(t9)},"shards":$n9}""")
    Release(exportDocs, blocking = true)

    // vocab lane: 50k-entry vocabulary over a 500k-term space. The
    // term agg combines map-side; the top-N is TakeOrderedAndProject,
    // whose driver merge is k × shuffle-partitions rows (50k × 64
    // here) — the documented ceiling of this shape. OOV then joins
    // the vocab back BROADCAST against the full token stream.
    val vocabCorpus = spark.range(vocabDocs).select(col("id"),
      concat_ws(" ", (0 until 24).map(j =>
        pmod(hash((col("id") - col("id") % 4)).cast("long") * 31 + j,
          lit(500000L)).cast("string")): _*).as("text"))
      .localCheckpoint()
    val (t10, n10) = t(operators.TextAnalysisOps
      .vocabCoverage(vocabCorpus, "text", 50000).count())
    println(s"""{"vocab_docs":$vocabDocs,"sec":${round1(t10)},"vocab_rows":$n10}""")
    val (t11, n11) = t(operators.TextAnalysisOps
      .oovRate(vocabCorpus, "id", "text", 50000).count())
    println(s"""{"oov_docs":$vocabDocs,"sec":${round1(t11)},"docs_scored":$n11}""")
    Release(vocabCorpus, blocking = true)

    // ann-index lane: persisted IVF-PQ at 2M × 24-dim — build (256
    // cells, 2×12-dim subspaces, 16-centroid codebooks, coded write)
    // then a 100-query batched ADC search whose code scan partition-
    // prunes to the probed cells. The raw vectors are written once and
    // never read by the search.
    val pqBase = col("vid") - col("vid") % 4
    val pqCorpus = spark.range(pqVecs)
      .select(col("id").as("vid"))
      .select(col("vid"), array((0 until 24).map(j =>
        ((pmod(hash(pqBase * 31 + j), lit(2001)) - 1000).cast("float") / 1000.0f +
          (pmod(hash(col("vid") * 7 + j), lit(21)) - 10).cast("float") / 10000.0f)
          .cast("float")): _*).as("embedding"))
      .localCheckpoint()
    val pqDir = java.nio.file.Files
      .createTempDirectory("graft-scale-ivfpq").toString
    val f32 = graft.functions.CosineF32.cosineF32Native(_, _)
    val (t12, _) = t({
      operators.IvfIndex.buildPq(pqCorpus, pqDir, nList = 256, m = 2,
        subDim = 12, kPq = 16, iters = 1, idCol = "vid",
        vecCol = "embedding", kernel = f32)
      1L
    })
    println(s"""{"ivfpq_build_vecs":$pqVecs,"sec":${round1(t12)}}""")
    val (t13, n13) = t(operators.IvfIndex.searchPq(spark, pqDir,
      pqCorpus.filter(col("vid") < 100), k = 10, nProbe = 8, m = 2,
      subDim = 12, idCol = "vid", vecCol = "embedding",
      kernel = f32).count())
    println(s"""{"ivfpq_search_queries":100,"sec":${round1(t13)},"results":$n13}""")
    Release(pqCorpus, blocking = true)

    // dsir lane: importance weights at crawl scale (the catalog's most
    // expensive text query without a scale datapoint until now). The
    // claims under test: the only broadcasts are the ≤`buckets`-row
    // log-ratio table and the two 1-row totals; every shuffle carries
    // (id, bucket, count) rows — never raw text or gram strings (the
    // bucket hash is computed map-side before any exchange); and both
    // histogram aggs combine map-side. Target = corpus/20 drawn from a
    // 100× NARROWER term space so the bucket ratio is non-degenerate.
    val dsirRaw = spark.range(dsirDocs).select(col("id"),
      concat_ws(" ", (0 until 24).map(j =>
        pmod(hash(col("id") * 31 + j), lit(500000L)).cast("string")): _*)
        .as("text"))
      .localCheckpoint()
    val dsirTgt = spark.range(dsirDocs / 20).select(col("id"),
      concat_ws(" ", (0 until 24).map(j =>
        pmod(hash(col("id") * 17 + j), lit(5000L)).cast("string")): _*)
        .as("text"))
      .localCheckpoint()
    val (t14, n14) = t {
      val w = operators.TextAnalysisOps.dsirLogWeights(
        dsirRaw, dsirTgt, "id", "text")
      // agg over log_w, not a bare count(): ColumnPruning would
      // otherwise delete the weighted sum (and the ratio table's log
      // math with it) and the lane would time only the gram counting
      w.agg(count(lit(1)).as("n"), sum(col("log_w"))).first.getLong(0)
    }
    println(s"""{"dsir_raw_docs":$dsirDocs,"dsir_target_docs":${dsirDocs / 20},"sec":${round1(t14)},"docs_weighted":$n14}""")
    // Same-session gram-stage A/B (r5 verdict item 6): the PERF.md
    // 197.7 → 34.6 s claim at 5 M docs spanned sessions on a box with
    // 2-3× wall variance; this pair runs the pre-r5 chain (two shingle
    // Generates unioned → md5/conv/substring bucket projection) and the
    // fused gram_buckets Generator back-to-back on the SAME checkpointed
    // corpus, same consumer (order-insensitive histogram digest, which
    // also re-proves parity at full scale).
    locally {
      val buckets = 1024
      def hist(g: org.apache.spark.sql.DataFrame): Long = g
        .groupBy(col("_b")).count()
        .agg(bit_xor(xxhash64(col("_b"), col("count")))).first.getLong(0)
      def oldChain: Long = hist(
        dsirRaw.select(col("id"), graft.functions.ShingleGen
            .shingleGen(col("text"), 1, distinct = false)).toDF("id", "_g")
          .unionByName(dsirRaw.select(col("id"), graft.functions.ShingleGen
            .shingleGen(col("text"), 2, distinct = false)).toDF("id", "_g"))
          .select((conv(substring(md5(concat(lit("dsir_"), col("_g"))),
            1, 8), 16, 10).cast("long") % buckets).as("_b")))
      def fused: Long = hist(dsirRaw.select(graft.functions.ShingleGen
        .gramBuckets(col("text"), Seq(1, 2), buckets, "dsir_")))
      val (tOld, hOld) = t(oldChain)
      val (tNew, hNew) = t(fused)
      require(hOld == hNew, s"gram A/B digest mismatch: $hOld vs $hNew")
      println(s"""{"dsir_gram_ab_docs":$dsirDocs,"union_md5_sec":${round1(tOld)},"fused_generator_sec":${round1(tNew)}}""")
    }
    Release(dsirRaw, blocking = true)
    Release(dsirTgt, blocking = true)
    } // legacy block

    // simhash lane (round 6): the dd15 family at 2M docs — 60-bit
    // shingle-feature signatures, 4×15-bit guaranteed-recall band join,
    // duplication groups of 4 (C(4,2)=6 hamming-0 pairs per group).
    // Claims under test: the signature is ONE fused map pass with no
    // exchange of its own (SimhashSigExpr, r7 — previously 60 per-bit
    // partial sums aggregated per doc); the band self-join reuses one
    // exchange (no broadcast rebuild); emit-once needs no dedup
    // exchange; and
    // the 15-bit band key space (~32k values/band) keeps bucket
    // enumeration bounded at this N — the documented ceiling: buckets
    // grow ~N/32k, so beyond ~100M docs a wider signature with
    // proportionally wider bands is the production setting.
    lane("simhash") {
      val n = 2000000L
      val shCorpus = spark.range(n).select(col("id"),
        concat_ws(" ", (0 until 24).map(j =>
          pmod(hash((col("id") - col("id") % 4)).cast("long") * 31 + j,
            lit(500000L)).cast("string")): _*).as("text"))
        .localCheckpoint()
      val (ts1, ns1) = t(operators.DedupOps.simhashHammingPairs(
        shCorpus, "id", "text", k = 3, maxHamming = 3, bands = 4).count())
      println(s"""{"simhash_docs":$n,"sec":${round1(ts1)},"pairs":$ns1}""")
      // width A/B (round 7): the 120-bit/8-band geometry — the
      // documented production setting past ~100M docs. Same recall
      // guarantee at maxHamming=3 (3 < 8); expected effects: higher
      // precision (noise pairs spread out in a 120-bit space) and a
      // 2^15-per-band key space × 8 bands, at ~2× signature-agg work.
      val (ts2, ns2) = t(operators.DedupOps.simhashHammingPairsW(
        shCorpus, "id", "text", k = 3, maxHamming = 3,
        bands = 8, bits = 120).count())
      println(s"""{"simhash_docs":$n,"bits":120,"bands":8,"sec":${round1(ts2)},"pairs":$ns2}""")
      Release(shCorpus, blocking = true)
    }

    // decontamination lane (round 6): tx35's span excision at 5M train
    // docs against a 10k-doc eval set, with PLANTED overlaps — every
    // 100th train doc embeds one eval 3-gram mid-document. Claims under
    // test: eval grams broadcast to the train gram stream (the corpus
    // text never shuffles for the hit probe), coverage expansion is a
    // narrow int explode, and the reassembly agg is the only
    // text-carrying exchange.
    lane("decon") {
      val n = 5000000L
      val evalN = 10000L
      val evalDocs = spark.range(evalN).select(col("id"),
        concat_ws(" ", (0 until 12).map(j =>
          pmod(hash(col("id") * 13 + j), lit(30000L)).cast("string")): _*)
          .as("text"))
        .localCheckpoint()
      // train doc: 24 words; every 100th doc splices eval doc (id/100 %
      // evalN)'s words 4..6 at positions 10..12 → one shared 3-gram
      val trainWords = (0 until 24).map { j =>
        val plain = pmod(hash(col("id") * 31 + j), lit(500000L))
          .cast("string")
        if (j >= 10 && j <= 12)
          // SQL `/` is fractional — floor+cast keeps the eval-doc id
          // and the hash input LongType, matching the eval side exactly
          when(col("id") % 100 === 0,
            pmod(hash(floor(col("id") / 100).cast("long") % evalN * 13
              + (j - 6)), lit(30000L)).cast("string"))
            .otherwise(plain)
        else plain
      }
      val trainDocs = spark.range(n)
        .select(col("id"), concat_ws(" ", trainWords: _*).as("text"))
        .localCheckpoint()
      val (td1, nd1) = t {
        val out = operators.TextAnalysisOps.decontaminateSpans(
          trainDocs, evalDocs, "id", "text", k = 3)
        // agg over n_removed so ColumnPruning can't delete the excision
        out.agg(count(lit(1)).as("n"), sum(col("n_removed")))
          .first.getLong(0)
      }
      val removed = operators.TextAnalysisOps.decontaminateSpans(
        trainDocs, evalDocs, "id", "text", k = 3)
        .agg(sum(col("n_removed"))).first.getLong(0)
      println(s"""{"decon_train_docs":$n,"decon_eval_docs":$evalN,"sec":${round1(td1)},"docs":$nd1,"words_removed":$removed}""")
      Release(trainDocs, blocking = true)
      Release(evalDocs, blocking = true)
    }

    // BPE pair-count lane (round 6): tx36 at 10M docs. Claim under
    // test: the corpus crosses ONE word agg; the pair expansion runs on
    // the distinct-word table (~500k rows here), so the lane's wall is
    // the corpus tokenize+agg, not the vocab-side work. Token ids map
    // to pure a-z words (base-36, digits translated) so the extraction
    // regex sees letter words, like real text.
    lane("bpe") {
      val n = 10000000L
      val word = (j: Int) => translate(lower(conv(
        pmod(hash(col("id") * 31 + j), lit(500000L)).cast("string"),
        10, 36)), "0123456789", "qrstuvwxyz")
      val bpeCorpus = spark.range(n).select(col("id"),
        concat_ws(" ", (0 until 24).map(word): _*).as("text"))
        .localCheckpoint()
      val (tb1, nb1) = t {
        // agg over the counts so the merge list's content is forced
        // (a bare count over the limit could shortcut the top-N)
        operators.TextAnalysisOps.bpePairCounts(bpeCorpus, "text", 50)
          .agg(sum(col("n"))).first.getLong(0)
      }
      println(s"""{"bpe_docs":$n,"sec":${round1(tb1)},"top50_mass":$nb1}""")
      // full merge learning on the same corpus: the delta over the
      // count lane above is the cost of the 3 vocab-only iterations —
      // if the corpus-scan-once claim holds, it stays near-constant in
      // corpus size (the vocab is ~500k regardless of doc count)
      val (tb2, nb2) = t {
        operators.TextAnalysisOps.bpeLearn(bpeCorpus, "text", 3)
          .agg(sum(col("n"))).first.getLong(0)
      }
      println(s"""{"bpe_learn_docs":$n,"merges":3,"sec":${round1(tb2)},"merge_mass":$nb2}""")
      // apply side: tokenize the corpus under the learned merges — one
      // more corpus scan joined to the vocab-sized symbol-count table
      val (tb3, nb3) = t {
        operators.TextAnalysisOps
          .bpeTokenCount(bpeCorpus, "id", "text", 3)
          .agg(sum(col("n_bpe_tokens"))).first.getLong(0)
      }
      println(s"""{"bpe_tokenize_docs":$n,"merges":3,"sec":${round1(tb3)},"total_bpe_tokens":$nb3}""")
      // 1000-merge training run — the hybrid's reason to exist:
      // under the per-merge-job fallback this is ~1000 × ~0.23 s of
      // pure scheduling (≈4 min before any work); the driver-local
      // loop makes iteration count a non-term after the one corpus
      // scan. Reports merges actually adopted (the vocab can exhaust
      // first — then the loop stops early by contract).
      val (tb4, nb4) = t {
        operators.TextAnalysisOps.bpeLearn(bpeCorpus, "text", 1000).count()
      }
      println(s"""{"bpe_learn_docs":$n,"merges_requested":1000,"adopted":$nb4,"sec":${round1(tb4)}}""")
      Release(bpeCorpus, blocking = true)
    }

    // Cross-source overlap lane (round 6): tx38 at 5M docs across 20
    // sources with a REALISTIC (non-saturated) gram space — unlike the
    // sf0.1 test table's 31-word vocabulary, grams here are mostly
    // unique, so the distinct (source, gram) table is the volume term
    // and pair volume tracks ACTUAL overlaps: every 10th doc draws its
    // text from a 1000-doc shared pool that recurs across sources, so
    // ~14k grams are cross-source and everything else is singleton.
    lane("overlap") {
      val n = 5000000L
      val srcCol = concat(lit("s"), (col("id") % 20).cast("string"))
      def pw(j: Int, seed: Column): Column = translate(lower(conv(
        pmod(hash(seed * 31 + j), lit(500000L)).cast("string"),
        10, 36)), "0123456789", "qrstuvwxyz")
      // block b = id/20 holds one doc per source; every 10th block is
      // shared: all 20 docs in it draw the SAME pool text (key b%1000),
      // so each of the ~1000 pool texts recurs in all 20 sources
      val block = floor(col("id") / 20).cast("long")
      val uniq = (0 until 16).map(j => pw(j, col("id") * 7 + 3))
      val shared = (0 until 16).map(j => pw(j, (block % 1000) * 13 + 1))
      val ovCorpus = spark.range(n).select(srcCol.as("source"),
          when(block % 10 === 0, concat_ws(" ", shared: _*))
            .otherwise(concat_ws(" ", uniq: _*)).as("text"))
        .localCheckpoint()
      val (to1, no1) = t(operators.TextAnalysisOps
        .sourceOverlap(ovCorpus, "source", "text", 3).count())
      println(s"""{"overlap_docs":$n,"sources":20,"sec":${round1(to1)},"pairs":$no1}""")
      Release(ovCorpus, blocking = true)
    }

    // End-to-end curation composite (round 6): the full training-data
    // pipeline in ONE invocation at the tight heap — gopher quality
    // gate → exact dedup → minhash LSH → CC clusters → keep-first
    // survivors → leakage-coherent split on the cluster rep → shard
    // manifest. The per-lane probes above validate each stage alone;
    // this lane validates the COMPOSITION: checkpoint/unpersist
    // discipline between stages, the members table reused for both the
    // survivor anti-join and the split key, and peak memory with two
    // adjacent stages live. 4M raw docs in dup-groups of 4 (two exact
    // copies + two near variants differing in one word), every 10th
    // doc truncated to fail the word-count rule. Analytic expectations:
    // gate = 3.6M exactly; exact-dedup survivors = 2.8M exactly
    // (600k full groups x3 variants + 200k j0-truncated x3 + 200k
    // j2-truncated x2); near-dup survivors ~1M + LSH misses (~2%/pair
    // at J~0.89, 16 perms / 4 bands); split ~80/10/10 of survivors;
    // manifest mass = train count exactly.
    lane("curation") {
      val n = 4000000L
      val gg = col("id") - col("id") % 4
      val jj = col("id") % 4
      def cw(k: Int): Column = {
        val base = pmod(hash(gg * 53 + k), lit(500000L))
        val v =
          if (k == 30)
            when(jj === 2, pmod(hash(gg * 53 + k + 7919), lit(500000L)))
              .when(jj === 3, pmod(hash(gg * 53 + k + 15838), lit(500000L)))
              .otherwise(base)
          else base
        translate(lower(conv(v.cast("string"), 10, 36)),
          "0123456789", "qrstuvwxyz")
      }
      val fullText = concat_ws(" ",
        ((0 until 52).map(cw) ++ Seq(lit("the"), lit("and"))): _*)
      val shortText = concat_ws(" ", (0 until 8).map(cw): _*)
      val corpus = spark.range(n).select(col("id"),
        when(col("id") % 10 === 0, shortText).otherwise(fullText)
          .as("text"))
        .localCheckpoint()
      val tAll0 = System.nanoTime()
      val gated = operators.TextAnalysisOps
        .gopherFilter(corpus, "id", "text").localCheckpoint()
      val nGate = gated.count()
      Release(corpus, blocking = false)
      val exactIds = operators.DedupOps.dedupExact(
        gated.withColumn("k", md5(col("text"))), Seq("k"), "id")
        .select("id")
      val exact = gated.join(exactIds, Seq("id"), "left_semi")
        .localCheckpoint()
      val nExact = exact.count()
      Release(gated, blocking = false)
      val members = operators.DedupOps.clusters(
        operators.DedupOps.minhashCandidates(exact, "id", "text",
          shingleK = 3, numPerm = 16, bands = 4)).localCheckpoint()
      val drops = members.filter(col("member") =!= col("cluster_rep"))
        .select(col("member").as("id"))
      val survivors = exact.join(drops, Seq("id"), "left_anti")
        .join(members.select(col("member").as("id"), col("cluster_rep")),
          Seq("id"), "left")
        .select(col("id"),
          coalesce(col("cluster_rep"), col("id")).as("rep"))
        .localCheckpoint()
      val nSurv = survivors.count()
      Release(exact, blocking = false)
      val bucket = conv(substring(md5(col("rep").cast("string")), 1, 8),
        16, 10).cast("long") % 100
      val split = survivors.withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val")
          .otherwise("test"))
      val sc = split.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val mass = operators.TextAnalysisOps.shardManifest(
          split.filter(col("split") === "train")
            .withColumn("n_tokens", lit(54L)), "id", "n_tokens", 256)
        .agg(sum("n_docs")).first.getLong(0)
      val secAll = (System.nanoTime() - tAll0) / 1e9
      println(s"""{"curation_docs":$n,"sec":${round1(secAll)},"gate":$nGate,"exact":$nExact,"survivors":$nSurv,"train":${sc.getOrElse("train", 0L)},"val":${sc.getOrElse("val", 0L)},"test":${sc.getOrElse("test", 0L)},"manifest_docs":$mass}""")
      Release(members, blocking = true)
      Release(survivors, blocking = true)
    }

    // The r8 curation additions composed end-to-end: domain cap
    // (bounded heap under a half-corpus megasite) → near-dup keep-best
    // (max_by, no per-cluster window) → token-budget selection
    // (histogram cutoff; 13 distinct quality values so the boundary
    // tie group is corpus/13). The point: the full
    // "cap → dedup → budget" selection chain completes with bounded
    // memory and no corpus-sized sort anywhere.
    lane("capbudget") {
      val n = 3000000L
      // dup groups of 3; ~13 distinct stopword ratios across groups
      val gg = col("id") - col("id") % 3
      def cw(k: Int): Column =
        translate(lower(conv(pmod(hash(gg * 101 + k), lit(400000L))
          .cast("string"), 10, 36)), "0123456789", "qrstuvwxyz")
      val content = concat_ws(" ", (0 until 20).map(cw): _*)
      val text = array_join(concat(split(content, " "),
        array_repeat(lit("the"), (gg % 13).cast("int"))), " ")
      val corpus = spark.range(n).select(col("id"),
          when(pmod(col("id"), lit(2)) === 0, lit("megasite"))
            .otherwise(concat(lit("s"),
              pmod(hash(col("id")), lit(997)).cast("string"))).as("source"),
          text.as("text"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      val capped = operators.TextAnalysisOps
        .sourceCap(corpus, "id", "source", 100000)
      val kept = corpus.join(capped.select("id"), Seq("id"), "left_semi")
        .localCheckpoint()
      val nCap = kept.count()
      Release(corpus, blocking = false)
      val (bestDf, relBest) = operators.DedupOps.dedupKeepBestReleasable(
        kept, "id", "text", length(col("text")).cast("long"))
      val best = bestDf.select(col("id")).localCheckpoint()
      relBest()
      val nBest = best.count()
      val deduped = kept.join(best, Seq("id"), "left_semi")
        .localCheckpoint()
      Release(kept, blocking = false)
      Release(best, blocking = false)
      val (sel, relSel) = operators.TextAnalysisOps
        .tokenBudgetSelectReleasable(deduped, "id", "text",
          nBest * 13L) // ≈ half the surviving tokens
      val nSel = sel.count()
      relSel()
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"""{"capbudget_docs":$n,"sec":${round1(sec)},"capped":$nCap,"kept_best":$nBest,"budget_selected":$nSel}""")
      Release(deduped, blocking = true)
    }

    lane("graph") {
      // 2M nodes, out-degree 5 with SKEWED in-degree (dst hash-mod
      // n/100 for half the edges → 1% of nodes absorb 50% of the
      // contribution traffic — the hub shape a real link graph has).
      // Every node has out-edges, so the fixed-point mass invariant
      // from GraphSpec must hold at this scale too: sum(pr_fixed)
      // within truncation units of SCALE.
      val gn = 2000000L
      val prEdges = spark.range(gn).select(col("id").as("a"),
          explode(array((0 until 5).map { j =>
            (if (j % 2 == 0) pmod(hash(col("id") * 13 + j), lit(gn / 100))
             else pmod(hash(col("id") * 31 + j), lit(gn))).cast("long")
          }: _*)).as("b"))
        .filter(col("a") =!= col("b"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      val pr = operators.GraphOps.pagerank(prEdges, iters = 3)
        .localCheckpoint()
      val prSec = (System.nanoTime() - t0) / 1e9
      val nNodes = pr.count()
      val mass = pr.agg(sum(col("pr_fixed"))).first().getLong(0)
      val massOk = mass <= operators.GraphOps.PrScale &&
        mass > operators.GraphOps.PrScale - 1000L * nNodes
      println(s"""{"pagerank_nodes":$nNodes,"edges_from":$gn,"sec":${round1(prSec)},"mass_ok":$massOk}""")
      require(massOk, s"pagerank mass invariant broke at scale: $mass")
      Release(prEdges, blocking = false)
      Release(pr, blocking = false)

      // planted k-core: 100k blocks of 10 (complete digraph inside
      // each block, induced degree 9) chained by degree-2 links;
      // peeling at k=6 must keep EXACTLY the block members — an
      // output-exact invariant, not a smoke count
      val blocks = 100000L
      val members = spark.range(blocks * 10)
      val blockEdges = members.select(col("id").as("a"),
          explode(array((1 until 10).map(j =>
            (col("id") - pmod(col("id"), lit(10)) +
              pmod(col("id") + j, lit(10))).cast("long")): _*)).as("b"))
      val chain = spark.range(blocks * 10, blocks * 10 + 200000L)
        .select(col("id").as("a"), (col("id") + 1).as("b"))
      val kcEdges = blockEdges.unionByName(chain)
        .unionByName(chain.select(col("b").as("a"), col("a").as("b")))
        .localCheckpoint()
      val t1 = System.nanoTime()
      val core = operators.GraphOps.kcore(kcEdges, k = 6, maxRounds = 8)
      val nCore = core.count()
      val kcSec = (System.nanoTime() - t1) / 1e9
      println(s"""{"kcore_nodes":${blocks * 10 + 200001L},"sec":${round1(kcSec)},"core":$nCore}""")
      require(nCore == blocks * 10,
        s"planted 6-core must be exactly the block members: $nCore")
      Release(kcEdges, blocking = true)
    }

    // Link prediction at graph scale with an OUTPUT-EXACT invariant:
    // 200k blocks of 10 nodes wired as K10 minus a perfect matching —
    // every node misses exactly its partner (id+5 within the block), so
    // the only non-adjacent intra-block pairs are the 5 planted missing
    // links per block, each with cn=8 shared neighbors, du=dv=8,
    // pa=64, jaccard=8/(8+8-8)=1.0 exactly. 2M nodes / 8M undirected
    // edges / C(8,2)=28 wedge pairs per node ≈ 56M map-side candidates
    // through the posting-list expansion — the d²-bounded regime the
    // operator is shaped for.
    lane("linkp") {
      val blocks = 200000L
      val nodes = spark.range(blocks * 10)
      val lpEdges = nodes.select(col("id").as("a"),
          explode(array((1 until 10).filter(_ != 5).map(j =>
            (col("id") - pmod(col("id"), lit(10)) +
              pmod(col("id") + j, lit(10))).cast("long")): _*)).as("b"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      val m = operators.GraphOps.linkPrediction(lpEdges, minCommon = 1L)
        .agg(count(lit(1)), sum(col("cn")), min(col("jaccard")),
          max(col("jaccard")), sum(col("pa"))).first()
      val lpSec = (System.nanoTime() - t0) / 1e9
      val (nPairs, sumCn) = (m.getLong(0), m.getLong(1))
      println(s"""{"linkp_nodes":${blocks * 10},"sec":${round1(lpSec)},"pairs":$nPairs}""")
      require(nPairs == blocks * 5 && sumCn == blocks * 5 * 8 &&
        m.getDouble(2) == 1.0 && m.getDouble(3) == 1.0 &&
        m.getLong(4) == blocks * 5 * 64,
        s"planted missing-link invariant broken: $m")
      Release(lpEdges, blocking = true)
    }

    // Interval-overlap join at 5M×5k with an exact pair-count
    // invariant: unit intervals [10i, 10i+10) against block intervals
    // [1000k, 1000k+1000) laid on the same line — every block overlaps
    // exactly 100 units (half-open: the touching boundary unit is
    // excluded), so the join must emit precisely 100·|b| pairs. binSec
    // 1000 keeps unit replication at ~1.001× (the typical-length rule)
    // and block replication at 2 bins.
    lane("ivj") {
      val aN = 5000000L
      val bN = 5000L
      val ivA = spark.range(aN).select(col("id").as("a_id"),
        (col("id") * 10).as("a_start"), (col("id") * 10 + 10).as("a_end"))
      val ivB = spark.range(bN).select(col("id").as("b_id"),
        (col("id") * 10000).as("b_start"),
        (col("id") * 10000 + 1000).as("b_end"))
      val t0 = System.nanoTime()
      val n = operators.EventOps.intervalOverlapJoin(ivA, ivB,
        binSec = 1000L).count()
      val ivSec = (System.nanoTime() - t0) / 1e9
      println(s"""{"ivj_a":$aN,"ivj_b":$bN,"sec":${round1(ivSec)},"pairs":$n}""")
      require(n == bN * 100,
        s"exact overlap count broken: $n vs ${bN * 100}")
    }

    // Interval coalescing under single-key skew: ONE key carries all
    // 5M intervals (the bot-activity shape), in merge-chains of 1000
    // (each interval overlaps the next by 5; a 1995-unit gap every
    // 1000th) — so the union is exactly 5000 spans of 1000 intervals.
    // The single-pass form sorts all 5M rows in ONE window task; the
    // bucketed twin (width 60k ≈ 1k buckets × ~5k rows) spreads stage 1
    // across the cores and stage 2 sees only the ~2-per-bucket boundary
    // spans. Both must produce the identical exact span set.
    lane("ivc") {
      val ivcN = 5000000L
      val hot = spark.range(ivcN).select(lit(0L).as("k"),
        (col("id") * 10 + floor(col("id") / 1000L) * 2000).as("s"))
        .withColumn("e", col("s") + 15)
        .localCheckpoint()
      def runIvc(f: => org.apache.spark.sql.DataFrame): (Double, Long, Long) = {
        val t0 = System.nanoTime()
        val agg = f.agg(count(lit(1)), sum("n_intervals")).head()
        ((System.nanoTime() - t0) / 1e9, agg.getLong(0), agg.getLong(1))
      }
      val (tPlain, spansP, totP) = runIvc(
        operators.EventOps.coalesceIntervals(hot, "k", "s", "e"))
      val (tBkt, spansB, totB) = runIvc(
        operators.EventOps.coalesceIntervalsBucketed(hot, "k", "s", "e",
          bucketWidth = 60000L))
      println(s"""{"ivc_intervals":$ivcN,"plain_sec":${round1(tPlain)},""" +
        s""""bucketed_sec":${round1(tBkt)},"spans":$spansB}""")
      require(spansP == 5000L && spansB == 5000L && totP == ivcN &&
        totB == ivcN,
        s"interval union broken: plain=($spansP,$totP) bkt=($spansB,$totB)")
      Release(hot, blocking = true)
    }

    // Spatial radius join at 5M × 5M with a CLOSED-FORM exact answer:
    // a 2236² lattice at spacing 1000, radius 1000 — every point pairs
    // with itself (d²=0) and its 4 axis neighbors (d²=r², the inclusive
    // boundary); diagonals (2r²) are excluded. Ordered-pair count is
    // exactly n² + 4n(n−1). This is the exactly-once and boundary
    // semantics of the 3×3 replication verified at 45M replicated rows,
    // not just on the spec's 40-point frame — a duplicate-emitting or
    // boundary-sloppy lowering misses the constant by whole multiples.
    lane("spj") {
      val n = 2236L
      val pts = spark.range(n * n).select(
        ((col("id") % n) * 1000).as("x"),
        (floor(col("id") / n) * 1000).cast("long").as("y"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      val pairs = operators.SpatialOps.radiusJoin(
        pts.select(col("x").as("ax"), col("y").as("ay")), "ax", "ay",
        pts.select(col("x").as("bx"), col("y").as("by")), "bx", "by",
        radius = 1000L).count()
      val spjSec = (System.nanoTime() - t0) / 1e9
      val want = n * n + 4 * n * (n - 1)
      println(s"""{"spj_points":${n * n},"sec":${round1(spjSec)},"pairs":$pairs}""")
      require(pairs == want, s"radius join broken: $pairs vs $want")
      Release(pts, blocking = true)
    }

    // Persisted point index at corpus scale (sp7's machinery): a 10M
    // point lattice (spacing 1000) banked with pointIndexBuild — rows
    // j%5==4 APPENDED so the append half is load-bearing — then a 1M
    // batch (every 10th column, shifted (+1,+1)) probed through
    // radiusJoinIncremental at radius=1000. Closed form: each batch
    // point catches exactly its own lattice site (d²=2) plus the +x
    // and +y neighbors (d²=998002) — 3 matches — except the top row
    // (j=n−1, no +y neighbor): want = 3·|batch| − (n/10). Exactly-once
    // and append-correctness are both inside the invariant: a dropped
    // append row or a double-counted cell shifts the count.
    lane("ptidx") {
      val n = 3160L // 10.0M index points; n % 10 == 0 so batch = n/10 columns
      val pts = spark.range(n * n).select(col("id"),
        ((col("id") % n) * 1000).as("x"),
        (floor(col("id") / n).cast("long") * 1000).as("y"))
      val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        "graft-ss-ptidx").toString
      val (tb, _) = t {
        operators.SpatialOps.pointIndexBuild(
          pts.filter(floor(col("id") / n).cast("long") % 5 =!= 4),
          dir, "id", "x", "y", cell = 1000L)
        operators.SpatialOps.pointIndexAppend(
          pts.filter(floor(col("id") / n).cast("long") % 5 === 4),
          dir, "id", "x", "y")
        0L
      }
      val batch = spark.range(n * n)
        .filter(col("id") % n % 10 === 0)
        .select((col("id") + n * n).as("id"),
          ((col("id") % n) * 1000 + 1).as("x"),
          (floor(col("id") / n).cast("long") * 1000 + 1).as("y"))
      val (tp, pairs) = t(operators.SpatialOps.radiusJoinIncremental(
        batch, dir, "id", "x", "y", radius = 1000L,
        expectedCells = 4000000L).count())
      val batchN = (n / 10) * n
      val want = 3L * batchN - n / 10
      println(s"""{"ptidx_points":${n * n},"batch":$batchN,"build_sec":${round1(tb)},"probe_sec":${round1(tp)},"pairs":$pairs}""")
      require(pairs == want, s"incremental radius join broken: $pairs vs $want")
    }

    // Polygon containment at volume (sp6's machinery): 5M lattice
    // points (spacing 1000) × 90k square rings (4-vertex polygons,
    // half-side 1250, centered on interior lattice points) — each ring
    // strictly contains exactly the 3×3 point block around its center
    // (|Δ| ≤ 1000 < 1250, next ring of points at 2000 > 1250), so
    // pairs = 9 · rings closed-form exact. Exactly-once under the
    // bbox cover replication and the ray cast both sit inside the
    // count.
    lane("polyjoin") {
      val n = 2236L
      val pts = spark.range(n * n).select(col("id").as("pid"),
        ((col("id") % n) * 1000).as("px"),
        (floor(col("id") / n).cast("long") * 1000).as("py"))
        .localCheckpoint()
      val k = 300L // ring centers: a k×k sub-lattice strictly interior
      val rings = spark.range(k * k).select(col("id").as("rid"),
          ((col("id") % k + 2) * 1000).as("cx"),
          (floor(col("id") / k).cast("long") + 2).as("_ry"))
        .withColumn("cy", col("_ry") * 1000).drop("_ry")
        .withColumn("poly", array(
          struct((col("cx") - 1250).as("x"), (col("cy") - 1250).as("y")),
          struct((col("cx") + 1250).as("x"), (col("cy") - 1250).as("y")),
          struct((col("cx") + 1250).as("x"), (col("cy") + 1250).as("y")),
          struct((col("cx") - 1250).as("x"), (col("cy") + 1250).as("y"))))
        .select("rid", "poly")
        .localCheckpoint()
      val t0 = System.nanoTime()
      val pairs = operators.SpatialOps.polygonContainsJoin(
        rings, "poly", pts, "px", "py", cell = 2500L).count()
      val pjSec = (System.nanoTime() - t0) / 1e9
      val want = 9L * k * k
      println(s"""{"polyjoin_points":${n * n},"rings":${k * k},"sec":${round1(pjSec)},"pairs":$pairs}""")
      require(pairs == want, s"polygon join broken: $pairs vs $want")
      Release(pts, blocking = true)
      Release(rings, blocking = true)
    }

    // BFS frontier expansion at graph volume (gr11's machinery): a
    // 1M-node grid lattice (right + down edges, 2M directed → 4M
    // undirected), seeds = the whole left column, maxHops 25. The
    // wavefront is planar — dist(x, y) = x exactly (vertical edges
    // never shorten a path) — so settled count n·(h+1) and settled
    // dist-sum n·h(h+1)/2 are both closed-form exact, and every round
    // must settle exactly one column (a node revisited or dropped by
    // the anti-join shifts both).
    lane("bfs") {
      val n = 1000L
      val nodes = spark.range(n * n)
      val right = nodes.filter(col("id") % n =!= n - 1)
        .select(col("id").as("a"), (col("id") + 1).as("b"))
      val down = nodes.filter(col("id") < n * (n - 1))
        .select(col("id").as("a"), (col("id") + n).as("b"))
      val edges = right.unionByName(down).localCheckpoint()
      val seeds = spark.range(n).select((col("id") * n).as("id"))
      val t0 = System.nanoTime()
      val (dist, relDist) = operators.GraphOps.bfsDistancesReleasable(
        edges, seeds, maxHops = 25)
      val agg = dist.agg(count(lit(1)), sum(col("dist"))).collect()(0)
      val bfsSec = (System.nanoTime() - t0) / 1e9
      relDist()
      val (cnt, dsum) = (agg.getLong(0), agg.getLong(1))
      println(s"""{"bfs_nodes":${n * n},"sec":${round1(bfsSec)},"settled":$cnt,"dist_sum":$dsum}""")
      require(cnt == n * 26 && dsum == n * (25L * 26 / 2),
        s"bfs broken: $cnt/$dsum vs ${n * 26}/${n * 325}")
      Release(edges, blocking = true)
    }

    // Triangle orientation under hub skew. The id-ordered failure mode
    // is a hub whose id sits in the MIDDLE of its neighbors' id range:
    // lower-id neighbors orient INTO it, higher-id ones OUT, so the
    // wedge join routes in×out ≈ d²/4 candidate wedges THROUGH the hub
    // (an extreme-id hub dodges this by luck — one side is empty;
    // production ids grant no such luck). Here: 200k-node ring, hub id
    // 100000 spoked to 25k nodes spread across the full id range
    // (≈12.5k below × 12.5k above → ~156M id-ordered wedges through the
    // hub), consecutive spoke targets chorded so real hub triangles
    // exist. Degree order makes the hub the maximum key — every hub
    // edge points INTO it, its oriented out-degree is 0, and the wedge
    // work collapses to the degree-3 spoke targets. Both variants must
    // agree exactly; the wall gap is the measured skew win.
    lane("tri") {
      val ringN = 200000L
      val hubId = 100000L
      val ring = spark.range(ringN)
        .select(col("id").as("a"), ((col("id") + 1) % ringN).as("b"))
      val spokes = spark.range(25000L)
        .select(lit(hubId).as("a"), (col("id") * 8 + 1).as("b"))
        .filter(col("b") =!= hubId)
      // chord consecutive spoke targets: triangle (hub, 8i+1, 8i+9)
      val chords = spark.range(24999L)
        .select((col("id") * 8 + 1).as("a"), (col("id") * 8 + 9).as("b"))
      val triEdges = ring.unionByName(spokes).unionByName(chords)
        .localCheckpoint()
      def run(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
          : (Double, Long, Long) = {
        val t0 = System.nanoTime()
        val m = f(triEdges).agg(sum(col("n_tri")), count(lit(1))).first()
        ((System.nanoTime() - t0) / 1e9, m.getLong(0), m.getLong(1))
      }
      val (tDeg, sumDeg, nDeg) = run(operators.GraphOps.triangleCountsDegreeOrdered)
      val (tId, sumId, nId) = run(operators.GraphOps.triangleCounts)
      require(sumDeg == sumId && nDeg == nId,
        s"orientation variants disagree: ($sumDeg,$nDeg) vs ($sumId,$nId)")
      println(s"""{"tri_nodes":$ringN,"hub_degree":25000,"id_ordered_sec":${round1(tId)},"degree_ordered_sec":${round1(tDeg)},"triangle_corners":$sumDeg}""")
      Release(triEdges, blocking = true)
    }

    // dd18's truth-side df cap under a SATURATED gram (round 11): every
    // doc carries one corpus-wide 3-gram (df = n) — the hot key that
    // made the uncapped truth equi-join carry |sample|×|corpus| pairs
    // (5·10¹⁰ here; unrunnable). With maxTruthDf = 16 the planted gram
    // drops from the truth universe and every surviving gram has df = 2
    // exactly (twin pairs with injective tails), so per-gram pair
    // fan-out is bounded by construction and the lane completes in
    // seconds. Analytic expectations: one truth row per SAMPLED doc
    // (its twin, capped-universe jaccard 1.0, caught — identical texts
    // share every band), a_capped = b_capped = 1 on every row (each
    // side lost exactly the planted gram), and the bias ledger is ONE
    // row carrying df = n, pair_mass = n(n−1)/2.
    lane("recallcap") {
      val n = 1000000L
      val g = col("id") - col("id") % 2
      val tail = (0 until 10).map(j =>
        concat(lit("w"), (g * 10 + j).cast("string")))
      val capCorpus = spark.range(n).select(col("id"),
          concat_ws(" ",
            (Seq(lit("zq"), lit("zq"), lit("zq")) ++ tail): _*).as("text"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      val out = operators.DedupOps.lshRecallEval(capCorpus, "id", "text",
          shingleK = 3, numPerm = 16, bands = 4, theta = 0.5,
          samplePct = 10, maxTruthDf = 16)
        .agg(count(lit(1)), sum(when(col("jaccard") === 1.0 &&
            col("caught") && col("a_capped") === 1L &&
            col("b_capped") === 1L, 1L).otherwise(0L))).first()
      val wall = (System.nanoTime() - t0) / 1e9
      val rows = out.getLong(0); val good = out.getLong(1)
      val sampled = capCorpus.filter(conv(substring(md5(col("id")
        .cast("string")), 1, 8), 16, 10).cast("long") % 100 < 10).count()
      require(rows == sampled && good == rows,
        s"capped truth broke: rows=$rows sampled=$sampled good=$good")
      val rep = operators.DedupOps.lshTruthCapReport(capCorpus, "id",
          "text", shingleK = 3, maxTruthDf = 16)
        .select(col("df"), col("pair_mass")).collect()
      require(rep.length == 1 && rep(0).getLong(0) == n &&
        rep(0).getLong(1) == n * (n - 1) / 2,
        s"cap ledger broke: ${rep.mkString(",")}")
      println(s"""{"recallcap_docs":$n,"saturated_df":$n,"sec":${round1(wall)},"truth_rows":$rows}""")
      Release(capCorpus, blocking = true)
    }

    // geocodeFuzzyViaJoin under the DEGENERATE DIGIT-LESS REGIME
    // (round 12 boundedness, round 13 rescue): 1M digit-less OCR
    // misses (widows, continuation lines, "h Broadway" forms) against
    // a dimension with 5000 digit-less streets. Pre-r13, the one empty
    // house-number block either cross-joined everything (5·10⁹
    // levenshtein pairs through one hot key, uncapped) or — capped —
    // starved every digit-less address. The alphaBlocks secondary
    // blocking ((first char, band) + (last char, band), capped per
    // block) bounds the fan-out per miss to a handful of sub-cap
    // blocks AND rescues digit-less typos: the lane asserts all three
    // regimes at once — 1M unmatched widows stay in-band found:false
    // without a quadratic join, 100k numbered typos rescue through
    // house blocks, and 50k digit-less 1-edit typos rescue through
    // the secondary blocks.
    lane("fuzzygeo") {
      val missN = 1000000L
      val typoN = 100000L
      val bareTypoN = 50000L
      val geomSql = "named_struct('type', 'Point', 'coordinates'," +
        " array(array(0.0d, 0.0d)))"
      // dimension: 100k numbered "N main street" + 5000 digit-less streets
      val dimNum = spark.range(typoN).select(
        concat(lit("a"), col("id").cast("string")).as("addressId"),
        concat(col("id").cast("string"), lit(" main street")).as("addressName"),
        lit("s").as("streetId"), lit("main street").as("streetName"),
        concat(col("id").cast("string"), lit(" main street")).as("normalizedKey"),
        expr(geomSql).as("geometry"))
      val dimBare = spark.range(5000L).select(
        concat(lit("b"), col("id").cast("string")).as("addressId"),
        concat(lit("bare street "), col("id").cast("string")).as("addressName"),
        lit("s").as("streetId"), lit("bare").as("streetName"),
        concat(lit("bare street "), col("id").cast("string")).as("normalizedKey"),
        expr(geomSql).as("geometry"))
      val fuzzyDim = dimNum.unionByName(dimBare).localCheckpoint()
      // facts: 1M digit-less misses + 100k numbered 1-edit typos
      val bareMiss = spark.range(missN).select(col("id").as("gid"),
        array(struct(concat(lit("widow line "),
          col("id").cast("string")).as("value"))).as("locations"))
      val numTypo = spark.range(typoN).select((col("id") + missN).as("gid"),
        array(struct(concat(col("id").cast("string"),
          lit(" main stret")).as("value"))).as("locations"))
      // digit-less 1-edit typos ("street" → "stret") of real dim keys:
      // must rescue through the secondary blocks, never the house block
      val bareTypo = spark.range(bareTypoN)
        .select((col("id") + missN + typoN).as("gid"),
          array(struct(concat(lit("bare stret "),
            (col("id") % 5000L).cast("string")).as("value"))).as("locations"))
      val facts = bareMiss.unionByName(numTypo).unionByName(bareTypo)
        .select(col("gid"), struct(col("locations")).as("parsed"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      val agg = graft.geocode.Geocoder
        .geocodeFuzzyViaJoin(facts, fuzzyDim, "gid")
        .agg(
          sum(when(expr("geocoded[0].found"), 1L).otherwise(0L)),
          sum(when(col("gid") >= missN + typoN &&
            expr("geocoded[0].found"), 1L).otherwise(0L)),
          count(lit(1))).first()
      val fgSec = (System.nanoTime() - t0) / 1e9
      val found = agg.getLong(0); val bareFound = agg.getLong(1)
      val rows = agg.getLong(2)
      println(s"""{"fuzzygeo_misses":$missN,"typos":$typoN,"bare_typos":$bareTypoN,"sec":${round1(fgSec)},"found":$found}""")
      require(rows == missN + typoN + bareTypoN &&
        found == typoN + bareTypoN && bareFound == bareTypoN,
        s"fuzzy rescue semantics broke: rows=$rows found=$found " +
          s"bare=$bareFound want=${typoN + bareTypoN}")
      Release(fuzzyDim, blocking = true)
      Release(facts, blocking = true)
    }

    // The three real media kernels at volume (round 12): encode +
    // decode streamed through mapPartitions at sizes the oracle lanes
    // never reach — ~0.9 GB of 64×48 BMPs, ~0.8 GB of 4000-sample
    // WAVs, ~2.5 GB of 32×18×24-frame Y4M clips — on the tight heap.
    // The POINT is the memory shape: payloads are generated and decoded
    // iterator-to-iterator with per-frame plane sums computed in place,
    // so nothing asset- or frame-sized accumulates; exact row-count
    // invariants catch a silently skipped or double-walked payload.
    // (Encode rides inside the timed pass — generation IS the scan.)
    lane("codecs") {
      val nImg = 100000L; val nAud = 100000L; val nVid = 20000L
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("asset_id",
          org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType, true)))
      val enc = org.apache.spark.sql.Encoders.row(schema)
      val bmps = spark.range(nImg).mapPartitions { it =>
        it.map { jid => val id = jid.longValue
          org.apache.spark.sql.Row(id,
          operators.ImageCodec.encodeBmp24(64, 48, (x, y) => (
            ((id + x) % 256).toInt, ((id + y) % 256).toInt,
            ((x + y) % 256).toInt)))
        }
      }(enc)
      val (ti, ni) = t(operators.MultimodalOps.decodeImageFeatures(bmps)
        .filter(col("decoded")).count())
      require(ni == nImg, s"image decode lost rows: $ni vs $nImg")
      val wavs = spark.range(nAud).mapPartitions { it =>
        it.map { jid => val id = jid.longValue
          org.apache.spark.sql.Row(id,
          operators.AudioCodec.encodeWavPcm16(16000,
            Array.tabulate(4000)(k =>
              ((id * 31 + k * 17) % 65536 - 32768).toShort)))
        }
      }(enc)
      val (ta, na) = t(operators.MultimodalOps.decodeAudioFeatures(wavs)
        .filter(col("decoded") && col("n_samples") === 4000L).count())
      require(na == nAud, s"audio decode lost rows: $na vs $nAud")
      val clips = spark.range(nVid).mapPartitions { it =>
        it.map { jid => val id = jid.longValue
          org.apache.spark.sql.Row(id,
          operators.VideoCodec.encodeY4m(32, 18, 24, (f, p) => (
            ((id + f + p) % 256).toInt, ((id + 2 * f + p) % 256).toInt,
            ((id + f + 2 * p) % 256).toInt)))
        }
      }(enc)
      val (tv, nv) = t(operators.MultimodalOps
        .sampleVideoFrames(clips, stride = 4)
        .filter(col("decoded")).count())
      require(nv == nVid * 6, s"frame sampling broke: $nv vs ${nVid * 6}")
      // the PNG wire path (r13): JDK ImageIO encode+decode through the
      // same sniffing kernel — slower per byte than the hand codecs
      // (inflate + color model), so sized down; the invariant is the
      // same exact row count
      val nPng = 50000L
      val pngs = spark.range(nPng).mapPartitions { it =>
        it.map { jid => val id = jid.longValue
          org.apache.spark.sql.Row(id,
          operators.PngCodec.encodePng24(64, 48, (x, y) => (
            ((id + x) % 256).toInt, ((id + y) % 256).toInt,
            ((x + y) % 256).toInt)))
        }
      }(enc)
      val (tp, np) = t(operators.MultimodalOps
        .decodeImageFeatures(pngs, kernel = operators.PngCodec.decodeAuto)
        .filter(col("decoded")).count())
      require(np == nPng, s"png decode lost rows: $np vs $nPng")
      println(s"""{"codec_imgs":$nImg,"img_sec":${round1(ti)},"auds":$nAud,"aud_sec":${round1(ta)},"vids":$nVid,"vid_sec":${round1(tv)},"frames":$nv,"pngs":$nPng,"png_sec":${round1(tp)}}""")
    }

    // Frame-level containment at 1M clips (r13, the mm16 shape) with a
    // CLOSED-FORM invariant: clips triple on bs = id − id%3 — member 0
    // samples global time 0..3, member 1 (the trim) 2..5, member 2
    // re-cuts member 0 — and each non-flat frame hash ENCODES (q, t)
    // as a 22-bit mask over the 32 single-pixel blocks (pixels ∈
    // {0, 255} → aHash bit = pixel bit exactly), so hashes are unique
    // by construction: every non-flat triplet contributes exactly 3
    // pairs with shared (4, 2, 2) and nothing crosses triplets. Flat
    // triplets paint constant luma — one all-zeros hash bucket of 3·F
    // rows that the cap must excise (the blank-leader hot key at
    // volume, through the REAL lane shape: per-frame decode walk,
    // distinct, BoundedCollect df-cap, map-side pair explode, vote).
    // Two flat rates share the kernel: 1/7 (the r13 corpus) and the
    // r14 planted-skew variant at 1/3 — ≥30% of the corpus in ONE
    // degenerate fingerprint, the shape the window-form cap died on
    // (count OVER (PARTITION BY fhash) put the whole 1M-row bucket in
    // one window task; the posting-list cap crosses the exchange as
    // O(cap) partial rows no matter the bucket size).
    def framedupClips(nClips: Long,
                      flatMod: Long): org.apache.spark.sql.DataFrame = {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("asset_id",
          org.apache.spark.sql.types.LongType, false),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType, true)))
      val enc = org.apache.spark.sql.Encoders.row(schema)
      spark.range(nClips).mapPartitions { it =>
        it.map { jid => val id = jid.longValue
          val bs = id - id % 3; val m = id % 3; val q = bs / 3
          val flat = q % flatMod == 0
          val off = if (m == 1) 2 else 0
          def lum(f: Int, p: Int) =
            if (flat) 128
            else if (((q * 8 + f + off) >> p & 1L) == 1L) 255 else 0
          org.apache.spark.sql.Row(id,
            operators.VideoCodec.encodeY4m420(8, 4, 4, lum,
              (_, _) => 64, (_, _) => 192))
        }
      }(enc)
    }
    def framedupRun(nClips: Long, flatMod: Long): (Double, Long) = {
      val clips = framedupClips(nClips, flatMod)
      val t0 = System.nanoTime()
      val fh = operators.MultimodalOps.videoFrameHashes(clips)
        .filter(col("fhash").isNotNull)
        .select(col("asset_id"), col("fhash")).distinct()
      val agg = operators.MultimodalOps
        .cappedContainmentVotes(fh, "asset_id", "fhash",
          cap = 8, minShared = 2)
        .agg(count(lit(1)), sum("shared")).first()
      val fdSec = (System.nanoTime() - t0) / 1e9
      val pairs = agg.getLong(0); val sharedSum = agg.getLong(1)
      val trips = nClips / 3
      val flats = (trips + flatMod - 1) / flatMod
      val live = trips - flats
      require(pairs == 3 * live && sharedSum == 8 * live,
        s"containment invariant broke (flatMod=$flatMod): pairs=$pairs " +
          s"want=${3 * live} sharedSum=$sharedSum want=${8 * live}")
      (fdSec, pairs)
    }
    lane("framedup") {
      val nClips = 999999L
      val (fdSec, pairs) = framedupRun(nClips, flatMod = 7L)
      println(s"""{"framedup_clips":$nClips,"sec":${round1(fdSec)},"pairs":$pairs}""")
    }

    // The planted-skew variant: every third triplet flat → one
    // degenerate all-zeros fhash bucket holding ~33% of the corpus
    // (≈333k distinct (asset, hash) rows). Done-criterion from the r13
    // verdict: completes in bounded time with the map-side cap; the
    // invariant arithmetic is identical, only F changes.
    lane("framedupskew") {
      val nClips = 999999L
      val (fdSec, pairs) = framedupRun(nClips, flatMod = 3L)
      println(s"""{"framedupskew_clips":$nClips,"sec":${round1(fdSec)},"pairs":$pairs}""")
    }

    // Incremental posting index at 1M clips (r14, the mm21 shape): the
    // corpus fifths %5 != 0 are banked once (decode + hash + postings
    // write), then the %5 = 0 batch alone decodes and probes the index
    // bloom-reduced. The invariant stays CLOSED-FORM via the triplet
    // frame structure — a triplet has at most one %5 = 0 member (span
    // 3 < 5), and its batch-touching pairs are exactly (2 pairs,
    // shared 6) when the batch member is m0 or m2 (re-cut shares all
    // 4 frames) and (2 pairs, shared 4) when it is m1 (trim shares 2
    // with each) — summed exactly by a driver-side arithmetic loop
    // over triplet indices. The index-side all-zeros flat bucket
    // (~114k rows) passes the bloom (the batch has flat hashes too)
    // and must be excised map-side by the posting cap.
    lane("frameidx") {
      val nClips = 999999L; val flatMod = 7L
      val clips = framedupClips(nClips, flatMod)
      val dir = java.nio.file.Files
        .createTempDirectory("graft-ss-frameidx").toString
      val tb = System.nanoTime()
      operators.MultimodalOps.frameHashIndexBuild(
        clips.filter(col("asset_id") % 5 =!= 0), dir)
      val buildSec = (System.nanoTime() - tb) / 1e9
      val t0 = System.nanoTime()
      val agg = operators.MultimodalOps.frameContainmentIncremental(
          clips.filter(col("asset_id") % 5 === 0), dir)
        .agg(count(lit(1)), sum("shared")).first()
      val incSec = (System.nanoTime() - t0) / 1e9
      val pairs = agg.getLong(0); val sharedSum = agg.getLong(1)
      var wantPairs = 0L; var wantShared = 0L
      var q = 0L
      val trips = nClips / 3
      while (q < trips) {
        if (q % flatMod != 0) {
          val bs = 3 * q
          if (bs % 5 == 0) { wantPairs += 2; wantShared += 6 }
          else if ((bs + 1) % 5 == 0) { wantPairs += 2; wantShared += 4 }
          else if ((bs + 2) % 5 == 0) { wantPairs += 2; wantShared += 6 }
        }
        q += 1
      }
      println(s"""{"frameidx_clips":$nClips,"build_sec":${round1(buildSec)},"inc_sec":${round1(incSec)},"pairs":$pairs}""")
      require(pairs == wantPairs && sharedSum == wantShared,
        s"incremental index invariant broke: pairs=$pairs want=$wantPairs " +
          s"sharedSum=$sharedSum want=$wantShared")
      // tmp postings are per-run scratch
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }

    // unicode_norm_key in the dedup hot path at 10M docs (r13): even
    // ids carry 24-word ASCII text (the fast path — returns the input
    // uncopied), odd ids the SAME text homoglyph-swapped (every 'a' →
    // Cyrillic а, so the whole string walks the NFKC + casefold +
    // strip pipeline). Exact-dedup on md5(unicode_norm_key(text)) must
    // collapse every odd id onto its even twin: exactly nDocs/2
    // representatives — a single mis-normalized codepoint anywhere in
    // 10M multi-byte rows leaves an extra group. Times the two rows
    // separately is pointless (one job); the invariant plus wall time
    // is the measurement: the canonicalizer must not turn dd1 into
    // the bottleneck.
    lane("unorm") {
      val nDocs = 10000000L
      val base = concat_ws(" ", (0 until 24).map(j =>
        pmod(hash((col("id") - col("id") % 2), lit(j)).cast("long"),
          lit(500000L)).cast("string")): _*)
      // plant letters so the homoglyph swap has something to hit:
      // prefix each word stream with "alpha case " — it contains all
      // four swap targets (a×3, e, c, and translate also maps o which
      // the prefix lacks), enough to force the slow path on every odd
      // row
      val corpus = spark.range(nDocs).select(col("id"),
        when(col("id") % 2 === 0,
          concat(lit("alpha case "), base))
          .otherwise(translate(concat(lit("alpha case "), base),
            "aeoc", "\u0430\u0435\u043e\u0441")).as("text"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      val reps = operators.DedupOps.dedupExact(
        corpus.withColumn("_k",
          md5(graft.functions.UnicodeNorm.unicodeNormKey(col("text")))),
        Seq("_k"), "id").count()
      val unSec = (System.nanoTime() - t0) / 1e9
      println(s"""{"unorm_docs":$nDocs,"sec":${round1(unSec)},"reps":$reps}""")
      require(reps == nDocs / 2,
        s"canonical dedup broke: $reps reps, want ${nDocs / 2}")
      Release(corpus, blocking = true)
    }

    // Great-circle radius join at 2.1M × 2.1M with a CLOSED-FORM exact
    // answer — spj's lattice invariant lifted to the sphere (round 12):
    // 21,420 cluster centers on a 1°×2° grid over lat ±59° (grid
    // spacing ≥ 95 km everywhere after the ±0.05° intra-cluster
    // scatter), 100 points per cluster, radius 50 km. Every
    // within-cluster ordered pair qualifies (max separation ~16 km),
    // no cross-cluster pair can (min separation ~95 km), so the count
    // is exactly centers·m² — at 214M result rows, a duplicate-emitting
    // ×27 replication or a cell-boundary bug misses the constant by
    // whole multiples. Clusters straddle the antimeridian (lon −180°
    // with negative scatter) and sit at ±59°: the ECEF gridding's
    // no-wrap/no-pole-case claim is exercised at volume, not just in
    // the 100-point spec.
    // gr12 SCC smoke (r15): a 800k-node bow-tie with closed-form
    // structure — one giant hub-and-spoke SCC (hub 0 ↔ 100k spokes,
    // diameter 2, so the 100k-row frontier exercises the broadcast
    // expansion at volume), one 10-ring (exercises multi-hop reach),
    // and 700k tendril nodes each pointing INTO a spoke (indeg-0 —
    // the whole mass must drain in ONE trim round, never via pivots).
    // Exactly 2 pivot rounds and the component census is exact.
    lane("scc") {
      val spokes = 100000L
      val nTendril = 700000L
      val hubOut = spark.range(1L, spokes + 1)
        .select(lit(0L).as("a"), col("id").as("b"))
      val hubIn = spark.range(1L, spokes + 1)
        .select(col("id").as("a"), lit(0L).as("b"))
      val ring = spark.range(10L).select((col("id") + 200000L).as("a"),
        ((col("id") + 1) % 10 + 200000L).as("b"))
      val tendril = spark.range(300000L, 300000L + nTendril)
        .select(col("id").as("a"), (col("id") % spokes + 1).as("b"))
      val edges = hubOut.unionByName(hubIn).unionByName(ring)
        .unionByName(tendril).localCheckpoint()
      val t0 = System.nanoTime()
      val (scc, rel) = operators.GraphOps
        .stronglyConnectedComponentsReleasable(edges,
          maxPivotRounds = 8, maxHops = 16)
      val sizes = scc.groupBy(col("scc")).agg(count(lit(1)).as("n"))
      val stats = sizes.agg(count(lit(1)).as("comps"), max(col("n")),
        sum(col("n"))).collect()(0)
      val ringN = sizes.filter(col("scc") === 200000L)
        .collect()(0).getLong(1)
      val sccSec = (System.nanoTime() - t0) / 1e9
      println(s"""{"scc_nodes":${spokes + 1 + 10 + nTendril},"sec":${round1(sccSec)},"comps":${stats.getLong(0)}}""")
      require(stats.getLong(0) == nTendril + 2 &&
        stats.getLong(1) == spokes + 1 &&
        stats.getLong(2) == spokes + 1 + 10 + nTendril && ringN == 10L,
        s"scc census broke: comps=${stats.getLong(0)} " +
          s"max=${stats.getLong(1)} sum=${stats.getLong(2)} ring=$ringN")
      rel()
      Release(edges, blocking = true)
    }

    // dd11 planted-skew smoke (r15): EVERY doc opens with the same
    // 8-word boilerplate span — a 100%-hot span group, the degenerate
    // worst case of the skew class the r14 verdict charged (the old
    // row_number window parked the whole group in ONE task's external
    // sort; the argmin form pre-combines it map-side). Closed form:
    // 3 segs/doc, segs 2-3 are id-unique by construction (words carry
    // the literal id, no hash collisions), so doc 0 keeps all 3 and
    // every other doc keeps exactly 2: sum(n_kept) = 2N + 1.
    lane("spandedupskew") {
      val nDocs = 5000000L
      val hot = (0 until 8).map(j => s"boiler$j").mkString(" ")
      val uniq = concat_ws(" ", (0 until 16).map(j =>
        concat(lit("w"), col("id"), lit(s"_$j"))): _*)
      val corpus = spark.range(nDocs).select(col("id"),
        concat(lit(hot + " "), uniq).as("text"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      val agg = operators.DedupOps.spanDedup(corpus, "id", "text", 8)
        .agg(count(lit(1)).as("n"), sum(col("n_kept")).as("kept"),
          min(col("n_kept")).as("mn"), max(col("n_kept")).as("mx"))
        .collect()(0)
      val sdSec = (System.nanoTime() - t0) / 1e9
      val (n, kept) = (agg.getLong(0), agg.getLong(1))
      println(s"""{"spandedupskew_docs":$nDocs,"sec":${round1(sdSec)},"kept":$kept}""")
      require(n == nDocs && kept == 2 * nDocs + 1 &&
        agg.getLong(2) == 2 && agg.getLong(3) == 3,
        s"span skew invariant broke: n=$n kept=$kept " +
          s"mn=${agg.getLong(2)} mx=${agg.getLong(3)} want kept=${2 * nDocs + 1}")
      Release(corpus, blocking = true)
    }

    // dd20 planted-skew smoke (r16): EVERY doc opens with the same
    // 12-token boilerplate paragraph (stronger than the ≥30% bar) —
    // the hot anchor grams' first-occurrence argmin must pre-combine
    // map-side and the join-back must keep the hot gram on the
    // AQE-splittable probe side. Closed form: each doc is 12 hot +
    // 12 id-unique tokens (24 total, 19 anchors); the 7 pure-hot
    // anchors (p 0..6) are non-first everywhere except doc 0, the
    // boundary and tail anchors are id-unique firsts, so every doc
    // except doc 0 excises exactly the [0,12) run: sum(dup_tokens) =
    // 12(N-1), sum(dup_runs) = N-1, doc-0 row = (24, 0, 0).
    lane("substrskew") {
      val nDocs = 2000000L
      val hot = (0 until 12).map(j => s"boiler$j").mkString(" ")
      val uniq = concat_ws(" ", (0 until 12).map(j =>
        concat(lit("w"), col("id"), lit(s"_$j"))): _*)
      val corpus = spark.range(nDocs).select(col("id"),
        concat(lit(hot + " "), uniq).as("text"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      val agg = operators.DedupOps
        .exactSubstringStats(corpus, "id", "text", minTokens = 6)
        .agg(count(lit(1)).as("n"), sum(col("dup_tokens")).as("dt"),
          sum(col("dup_runs")).as("dr"), max(col("dup_tokens")).as("mx"),
          min(col("n_tokens")).as("tmin"), max(col("n_tokens")).as("tmax"))
        .collect()(0)
      val ssSec = (System.nanoTime() - t0) / 1e9
      println(s"""{"substrskew_docs":$nDocs,"sec":${round1(ssSec)},""" +
        s""""dup_tokens":${agg.getLong(1)}}""")
      require(agg.getLong(0) == nDocs &&
        agg.getLong(1) == 12L * (nDocs - 1) &&
        agg.getLong(2) == nDocs - 1 && agg.getLong(3) == 12L &&
        agg.getLong(4) == 24L && agg.getLong(5) == 24L,
        s"substr skew invariant broke: $agg " +
          s"want dup_tokens=${12L * (nDocs - 1)} dup_runs=${nDocs - 1}")
      Release(corpus, blocking = true)
    }

    // tx56 fused crawl→training-text smoke (r17): the WHOLE ingest
    // chain — WARC wrap → container walk → HTML extract → langid +
    // gopher + exact-substring marks — at the 10M-doc size under the
    // tight heap. Closed form: ids %13/%17 are corrupt WARCs and
    // contribute nothing; every 4th parseable doc carries the 12-token
    // boilerplate block whose 7 interior 6-grams mark as ONE 12-token
    // run everywhere but the generation-first boiler doc (id 4);
    // extracted docs are 23 or 35 tokens exactly; zero stopwords and
    // under-50 word counts make lang='en' (tie precedence) and
    // keep=false everywhere.
    lane("warcpipe") {
      val nDocs = sys.env.getOrElse("GRAFT_SS_WARCPIPE_DOCS",
        "10000000").toLong
      val hot = (0 until 12).map(j => s"boiler$j").mkString(" ")
      val uniq = concat_ws(" ", (0 until 12).map(j =>
        concat(lit("w"), col("id"), lit(s"_$j"))): _*)
      val corpus = spark.range(nDocs).select(col("id"),
        when(col("id") % 4 === 0, concat(lit(hot + " "), uniq))
          .otherwise(uniq).as("text"))
      val t0 = System.nanoTime()
      val ext = graft.Ckpt(operators.TextAnalysisOps.htmlExtract(
          operators.MultimodalOps.warcResponseTexts(
            operators.MultimodalOps.synthWarcHtmlAssets(
              corpus, "id", "text")),
          "asset_id", "payload")
          .select(col("asset_id").as("id"), col("extracted").as("text")),
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val lang = operators.TextAnalysisOps.langId(ext, "id", "text")
        .select(col("id"), col("predicted"))
      val gop = operators.TextAnalysisOps.gopherRules(ext, "id", "text")
        .select(col("id"), col("keep"))
      val sub = operators.DedupOps.exactSubstringStats(
        ext, "id", "text", minTokens = 6)
      val agg = ext.select("id").join(lang, "id").join(gop, "id")
        .join(sub, "id")
        .agg(count(lit(1)).as("n"),
          sum(when(col("predicted") === "en", 0L).otherwise(1L)).as("ne"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("nk"),
          sum(col("dup_tokens")).as("dt"), sum(col("dup_runs")).as("dr"),
          max(col("dup_tokens")).as("mx"),
          min(col("n_tokens")).as("tmin"), max(col("n_tokens")).as("tmax"))
        .collect()(0)
      val wpSec = (System.nanoTime() - t0) / 1e9
      def cnt(m: Long): Long = (nDocs - 1) / m + 1 // ids in [0,N) ≡ 0 (mod m)
      val parseable = nDocs - cnt(13) - cnt(17) + cnt(221)
      val boiler = cnt(4) - cnt(52) - cnt(68) + cnt(884)
      println(s"""{"warcpipe_docs":$nDocs,"sec":${round1(wpSec)},""" +
        s""""rows":${agg.getLong(0)},"dup_tokens":${agg.getLong(3)}}""")
      require(agg.getLong(0) == parseable &&
        agg.getLong(1) == 0L && agg.getLong(2) == 0L &&
        agg.getLong(3) == 12L * (boiler - 1) &&
        agg.getLong(4) == boiler - 1 && agg.getLong(5) == 12L &&
        agg.getLong(6) == 23L && agg.getLong(7) == 35L,
        s"warcpipe invariant broke: $agg want rows=$parseable " +
          s"dup_tokens=${12L * (boiler - 1)} dup_runs=${boiler - 1}")
      Release(ext, blocking = true)
    }

    // tx13 dominant-stratum smoke (r15): 80% of the corpus in ONE
    // stratum ('web'), the real-mixture shape that parked the old
    // per-stratum running-sum window in a single task. Every doc is
    // exactly 16 tokens, so the two-phase prefix sum has a closed
    // form: doc at within-stratum rank r has cum = 16r, bin =
    // (r-1)/32 — every bin holds exactly 32 docs when the stratum
    // size divides 32, and max(cum) = 16·|stratum|.
    lane("packskew") {
      val nDocs = 5120000L // 4.096M web + 1.024M code, both % 32 == 0
      val corpus = spark.range(nDocs).select(col("id"),
        when(col("id") % 5 < 4, lit("web")).otherwise(lit("code"))
          .as("source"),
        concat_ws(" ", (0 until 16).map(j => lit(s"t$j")): _*).as("text"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      val (bins, pkRel) = operators.TextAnalysisOps.packBinsReleasable(
        corpus, "id", "text", "source", budgetTokens = 512)
      val agg = bins.groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("nd"), max(col("cum")).as("mc"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("nbins"), min(col("nd")).as("mnd"),
          max(col("nd")).as("mxd"), max(col("mc")).as("mxc"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val pkSec = (System.nanoTime() - t0) / 1e9
      val (webN, codeN) = (nDocs / 5 * 4, nDocs / 5)
      println(s"""{"packskew_docs":$nDocs,"sec":${round1(pkSec)},"webbins":${agg("web")._1}}""")
      require(agg("web") == ((webN / 32, 32L, 32L, 16L * webN)) &&
        agg("code") == ((codeN / 32, 32L, 32L, 16L * codeN)),
        s"pack skew invariant broke: $agg want web=(${webN / 32},32,32," +
          s"${16L * webN}) code=(${codeN / 32},32,32,${16L * codeN})")
      pkRel()
      Release(corpus, blocking = true)
    }

    lane("gcj") {
      val latN = 119L; val lonN = 180L; val m = 100L
      val centers = latN * lonN
      val gpts = spark.range(centers * m).select(
          (pmod(col("id"), lit(lonN)) * 2000000L - 180000000L +
            pmod(hash(col("id")), lit(100001L)) - 50000L).as("lon"),
          (pmod(floor(col("id") / lonN).cast("long"), lit(latN)) * 1000000L -
            59000000L +
            pmod(hash(col("id"), lit(3)), lit(100001L)) - 50000L).as("lat"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      val n = operators.SpatialOps.greatCircleRadiusJoin(
        gpts.select(col("lon").as("alon"), col("lat").as("alat")),
        "alon", "alat",
        gpts.select(col("lon").as("blon"), col("lat").as("blat")),
        "blon", "blat", radiusMeters = 50000.0).count()
      val gcjSec = (System.nanoTime() - t0) / 1e9
      val want = centers * m * m
      println(s"""{"gcj_points":${centers * m},"sec":${round1(gcjSec)},"pairs":$n}""")
      require(n == want, s"great-circle join broken: $n vs $want")
      Release(gpts, blocking = true)
    }

    // The "a dense cell is ordinary AQE skew" claim, PINNED (rolled
    // over from r10/r11): ev19/sp1/sp3/sp4 all lower predicate joins to
    // equi joins on synthetic bin/cell keys and argue a hot bin is
    // AQE's skew-join case. Here the claim runs through the ACTUAL
    // radiusJoin lowering: 2M b-points in ONE grid cell (the dense
    // city) + 4M spread one-per-cell far away, 3 a-points in the hot
    // cell. Broadcast is disabled (3-row side would broadcast and
    // dodge the shuffle entirely) and the skew thresholds are scaled
    // to the local data size the way a 100-TB cluster's 256 MB default
    // relates to its real partitions. Asserts BOTH the exact pair
    // count (closed form) AND that AQE actually split the skewed
    // partition — read back from the executed plan's AQEShuffleRead
    // metrics, not inferred.
    lane("aqeskew") {
      val hotB = 2000000L
      val coldB = 4000000L
      val conf = spark.conf
      val saved = Seq(
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes")
        .map(k => k -> conf.getOption(k))
      try {
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        val r = 1000L
        // hot cell: 2M hash-scattered points inside cell (0,0) — NOT a
        // constant coordinate: skew detection reads COMPRESSED map
        // output sizes, and 2M identical rows LZ4 to almost nothing
        // (measured: skew metric 0 with lit(500) points). Every in-cell
        // point is within sqrt(500^2+500^2) ~ 707 < r of the cell
        // center, so the closed form still holds. Cold: a lattice with
        // spacing 10r starting 100 cells away — never within radius.
        // The a coords must be NON-FOLDABLE (id % 1 + 500, not lit):
        // literal a-points let Catalyst constant-fold the distance
        // predicate into the b scan and prune bx/by off the exchange,
        // leaving the hot partition all-identical cell keys — which
        // again compress below any honest skew threshold.
        val aPts = spark.range(3L).select(
          (col("id") % 1L + 500L).as("ax"), (col("id") % 1L + 500L).as("ay"))
        val bHot = spark.range(hotB).select(
          pmod(hash(col("id")), lit(1000L)).cast("long").as("bx"),
          pmod(hash(col("id"), lit(7)), lit(1000L)).cast("long").as("by"))
        val bCold = spark.range(coldB).select(
          (lit(100000L) + (col("id") % 2000L) * 10000L).as("bx"),
          (lit(100000L) + floor(col("id") / 2000L).cast("long") * 10000L).as("by"))
        val joined = operators.SpatialOps.radiusJoin(
          aPts, "ax", "ay", bHot.unionByName(bCold), "bx", "by", r)
        val agg = joined.groupBy().count()
        val t0 = System.nanoTime()
        // collect(), NOT first(): first() wraps the query in a new
        // Limit plan with its own QueryExecution, leaving agg's
        // executedPlan unexecuted (isFinalPlan=false, all metrics 0)
        val pairs = agg.collect()(0).getLong(0)
        val skSec = (System.nanoTime() - t0) / 1e9
        // walk the adaptive plan for skew-split evidence
        def skewSplits(p: org.apache.spark.sql.execution.SparkPlan): Long = {
          import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
          val self = p.metrics.collect {
            case (name, m) if name.toLowerCase.contains("skew") => m.value
          }.sum
          val kids = p match {
            case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
            case q: QueryStageExec => Seq(q.plan)
            case other => other.children
          }
          self + kids.map(skewSplits).sum
        }
        val skew = skewSplits(agg.queryExecution.executedPlan)
        if (skew == 0) { // diagnostic: what DID the adaptive plan do?
          println(s"adaptive=${conf.get("spark.sql.adaptive.enabled")} " +
            s"root=${agg.queryExecution.executedPlan.getClass.getSimpleName}")
          println(agg.queryExecution.executedPlan.toString.take(4000))
        }
        println(s"""{"aqeskew_hot":$hotB,"cold":$coldB,"sec":${round1(skSec)},"pairs":$pairs,"skew_metric":$skew}""")
        require(pairs == 3L * hotB, s"hot-cell join broken: $pairs vs ${3L * hotB}")
        require(skew > 0, "AQE skew split did not fire — the dense-cell " +
          "claim in ev19/sp1/sp3/sp4 scaladoc is unpinned at these thresholds")
      } finally saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
    spark.stop()
  }
}

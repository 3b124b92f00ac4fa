package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.TextAnalysisOps

/** Text-analysis queries over `documents`. */
object TextQueries {

  /** tx53/tx54's messy-URL generator: every canonicalization class
    * planted on a known doc_id residue (case, default/zero-padded
    * ports, dot-segments, %-variants, tracking params, unsorted
    * query, fragment) — the oracles replay the CANONICAL form
    * closed-form, so the expressions must invert exactly this mess. */
  private def messyUrl(id: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val site = concat(lit("Site"), (id % 7).cast("string"))
    concat(
      when(id % 2 === 0, lit("HTTP")).otherwise(lit("https")),
      lit("://"),
      when(id % 3 === 0, concat(lit("WWW."), site, lit(".CO.UK")))
        .when(id % 3 === 1, concat(lit("Sub."), site, lit(".COM")))
        .otherwise(concat(site, lit(".org"))),
      when(id % 4 === 0,
          when(id % 2 === 0, lit(":80")).otherwise(lit(":443")))
        .when(id % 4 === 1, lit(":8080"))
        .when(id % 4 === 3,
          when(id % 2 === 0, lit(":080")).otherwise(lit(":0443")))
        .otherwise(lit("")),
      when(id % 5 === 0, concat(lit("/a/./b/../c"), (id % 11)))
        .when(id % 5 === 1, concat(lit("/%7Edir/p"), (id % 11)))
        .when(id % 5 === 2, lit(""))
        .when(id % 5 === 3, concat(lit("/x//y"), (id % 11), lit("/")))
        .otherwise(concat(lit("/p"), (id % 11))),
      when(id % 6 === 0, lit("?utm_source=feed&b=2&a=1"))
        .when(id % 6 === 1, concat(lit("?gclid=g"), id))
        .when(id % 6 === 2, lit("?z=%41&y=2"))
        .when(id % 6 === 4, lit("?flag&a=%2F"))
        .when(id % 6 === 5, concat(lit("?k"), (id % 9), lit("=v")))
        .otherwise(lit("")),
      when(id % 2 === 1, concat(lit("#sec"), id)).otherwise(lit("")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting: whitespace tokens + BPE-ish subword pieces.
    "tx1_tokens" -> ((s, d) => {
      documents(s, d).select(col("doc_id"),
        TextAnalysisOps.tokenCount(col("text")).as("n_tokens"),
        TextAnalysisOps.subwordCount(col("text")).as("n_subwords"))
    }),

    // Quality scoring: length/punct/stopword/word-length metrics.
    "tx2_quality" -> ((s, d) => {
      TextAnalysisOps.qualityMetrics(documents(s, d), "doc_id", "text")
    }),

    // Per-source cap (dominant-domain down-sampling): keep at most 15
    // docs per source by deterministic md5 rank — bounded per-key heap,
    // not a window sort (the dominant source IS the skew case).
    "tx40_source_cap" -> ((s, d) => {
      TextAnalysisOps.sourceCap(documents(s, d), "doc_id", "source", 15)
    }),

    // Token-budget selection: best-quality docs until the running token
    // total hits the budget — two-phase histogram-and-cutoff, only the
    // boundary quality-tie group ever sorts.
    "tx41_token_budget" -> ((s, d) => {
      val (out, rel) = TextAnalysisOps.tokenBudgetSelectReleasable(
        documents(s, d), "doc_id", "text", budget = 12000L)
      graft.Leases.swap("tx41_token_budget", rel)(out)
    }),

    // Misra–Gries heavy hitters over the word stream with an injected
    // hot item (docs divisible by 5 contribute 'hotword' per position
    // — the corpus's own distribution is deliberately flat). Verified
    // surface = the sketch CONTRACT (presence + bound for provably-
    // frequent items), the tx5 HLL precedent; sketch content is
    // merge-order-dependent by design.
    "tx43_heavy_hitters" -> ((s, d) => {
      val words = documents(s, d).select(col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      val items = words.select(
        when(col("doc_id") % 5 === 0, lit("hotword"))
          .otherwise(col("w")).as("item"))
      val sk = graft.operators.HeavyHitters.heavyHitters(items, "item", 16)
      val exact = items.groupBy("item").agg(count(lit(1)).as("exact_count"))
      val tot = items.agg(count(lit(1)).cast("double").as("n"))
      exact.crossJoin(broadcast(tot))
        .filter(col("exact_count") > col("n") / 17.0)
        .join(sk, Seq("item"), "left")
        .select(col("item"), col("exact_count"),
          col("est").isNotNull.as("guaranteed_present"),
          (col("est").isNotNull && col("est") <= col("exact_count") &&
            col("est") >= col("exact_count") - col("n") / 17.0)
            .as("est_within_bound"))
    }),

    // Exact heavy hitters by sketch-then-verify: MG candidates →
    // broadcast semi-join → exact counts → threshold. Deterministic
    // output with EXACT counts (any valid sketch's candidates are a
    // superset of the frequent items; the exact filter removes noise).
    "tx45_exact_heavy" -> ((s, d) => {
      val words = documents(s, d).select(col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      val items = words.select(
        when(col("doc_id") % 5 === 0, lit("hotword"))
          .otherwise(col("w")).as("item"))
      graft.operators.HeavyHitters.exactHeavyHitters(items, "item", 16)
    }),

    // Count-Min sketch: the frequency-estimation complement to tx43's
    // MG (any item's approximate count, not just the heavy ones). The
    // grid is a pure function of the data — md5 buckets, order-free
    // sums — so unlike MG the whole surface hash-matches the oracle,
    // including a never-seen probe item.
    "tx46_count_min" -> ((s, d) => {
      import s.implicits._
      val words = documents(s, d).select(
        explode(split(col("text"), " ")).as("item"))
      val sk = graft.operators.HeavyHitters
        .countMinSketch(words, "item", 8, 2)
      val queries = words.select(col("item")).distinct()
        .unionByName(Seq("never_seen_item").toDF("item"))
      val est = graft.operators.HeavyHitters
        .cmsEstimate(sk, queries, "item", 8, 2)
      val exact = words.groupBy("item").agg(count(lit(1)).as("exact_count"))
      est.join(exact, Seq("item"), "left")
        .select(col("item"), col("est"),
          coalesce(col("exact_count"), lit(0L)).as("exact_count"),
          (col("est") >= coalesce(col("exact_count"), lit(0L)))
            .as("never_undercounts"))
    }),

    // Snapshot diff (dataset versioning): old = ids not divisible by 7,
    // new = ids not divisible by 5 with every 11th text modified —
    // exercises all four statuses; the join carries digests, not text.
    "tx42_snapshot_diff" -> ((s, d) => {
      val docs = documents(s, d)
      val oldSnap = docs.filter(col("doc_id") % 7 =!= 0)
      val newSnap = docs.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text", when(col("doc_id") % 11 === 0,
          concat(col("text"), lit(" mod"))).otherwise(col("text")))
      TextAnalysisOps.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
    }),

    // Hashed-linear classifier inference (fasttext/CCNet shape): md5
    // hashing-trick buckets, integer milli-weights, mean-weight logit.
    // The exact-integer logit is the verified surface; keep = logit>0.
    "tx28_classifier" -> ((s, d) => {
      TextAnalysisOps.hashedClassifierScore(documents(s, d))
    }),

    // Gopher quality rules — every verdict an integer comparison
    // (ratios cross-multiplied), so booleans replay exactly.
    "tx29_gopher_rules" -> ((s, d) => {
      TextAnalysisOps.gopherRules(documents(s, d))
    }),

    // Language-ID heuristic with deterministic tie precedence.
    "tx3_langid" -> ((s, d) => {
      TextAnalysisOps.langId(documents(s, d), "doc_id", "text")
    }),

    // Top-100 token vocabulary + cumulative corpus-coverage curve: the
    // pre-tokenizer sizing sweep. Bounded global top-N
    // (TakeOrderedAndProject), rank window over ≤ 100 rows.
    "tx30_vocab_coverage" -> ((s, d) =>
      TextAnalysisOps.vocabCoverage(documents(s, d), "text", 100)),

    // Per-doc out-of-vocabulary rate against that top-100 vocabulary —
    // the UNK-rate gate; vocab is broadcast, docs aggregate map-side.
    "tx31_oov_rate" -> ((s, d) =>
      TextAnalysisOps.oovRate(documents(s, d), "doc_id", "text", 100)),

    // DSIR importance weights: every non-src0 doc scored by how much
    // its hashed unigram+bigram buckets look like src0 (the target)
    // vs the raw pool itself — the data-selection-for-LM primitive;
    // feed log_w to the weighted sampler for the resampling step.
    "tx33_dsir" -> ((s, d) => {
      val docs = documents(s, d)
      TextAnalysisOps.dsirLogWeights(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", "text", buckets = 1024)
    }),

    // Deterministic 16-shard export manifest: md5 shard assignment,
    // md5-ordered within shard, order-sensitive XOR fingerprint —
    // what a training job verifies before trusting a shard set.
    "tx32_shard_manifest" -> ((s, d) => {
      val docs = documents(s, d)
        .withColumn("n_tokens", size(split(col("text"), " ")))
      val (m, rel) = TextAnalysisOps.shardManifestReleasable(
        docs, "doc_id", "n_tokens", 16)
      graft.Leases.swap("tx32_shard_manifest", rel)(m)
    }),

    // Sketch-based distinct counting. The raw HLL estimate is
    // engine-specific, so it can't hash-match an oracle directly;
    // instead the query emits the EXACT distinct count plus a
    // bounded-relative-error boolean on the sketch (rsd 0.02, gate
    // 10% = 5σ), and the oracle asserts the same exact count with the
    // boolean literally true — the sketch's accuracy contract IS the
    // verified value (the tx14 KMV lane proves the pattern).
    // The exact side counts DISTINCT md5(text), not text: a distinct
    // over raw text ships every unique document through the exchange;
    // the digest is 16 bytes and both engines hash identical bytes, so
    // the count is the same, deterministically.
    "tx5_approx_distinct" -> ((s, d) => {
      documents(s, d).groupBy("source")
        .agg(approx_count_distinct(col("text"), 0.02).as("_approx"),
          count_distinct(md5(col("text"))).as("exact_texts"),
          count(lit(1)).as("n"))
        .select(col("source"), col("exact_texts"), col("n"),
          (abs(col("_approx").cast("double") /
            col("exact_texts").cast("double") - 1.0) <= 0.1)
            .as("hll_within_10pct"))
    }),

    // Corpus-level n-gram profile: distinct word-3-gram count per doc +
    // corpus distinct total per source.
    "tx4_ngram_profile" -> ((s, d) => {
      val sh = graft.functions.ShingleGen.shingleArray(col("text"), 3)
      documents(s, d)
        .select(col("source"), col("doc_id"), size(sh).as("n_shingles"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_shingles").as("total_shingles"),
          max("n_shingles").as("max_shingles"))
    }),

    // Sliding-window token chunking (32-token chunks, stride 24): the
    // LLM training-prep explode. Narrow plan — no shuffle.
    "tx7_chunking" -> ((s, d) => {
      TextAnalysisOps.chunk(documents(s, d), "doc_id", "text",
        chunkSize = 32, stride = 24)
    }),

    // Train/eval contamination: distinct 3-gram overlap of every
    // non-src0 doc against the src0 eval set's shingle vocabulary.
    "tx8_contamination" -> ((s, d) => {
      val docs = documents(s, d)
      TextAnalysisOps.contamination(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", "text", k = 3)
    }),

    // Same contamination semantics, bloom-reduced join: the sketch is
    // built distributed over the eval vocabulary, training shingles are
    // pre-filtered by BloomFilterMightContain, and only survivors reach
    // the exact semi join. The oracle is the PLAIN exact SQL — bloom
    // false positives must be invisible in the result.
    "tx15_contamination_bloom" -> ((s, d) => {
      val docs = documents(s, d)
      TextAnalysisOps.contaminationBloom(
        docs.filter(col("source") =!= "src1"),
        docs.filter(col("source") === "src1"),
        "doc_id", "text", k = 3, expectedShingles = 1L << 16)
    }),

    // One-scan column profile (row/null/exact-distinct counts, min/max)
    // over the documents table — the trust-a-new-data-drop sweep.
    "tx19_column_profile" -> ((s, d) => {
      graft.operators.TransformOps.columnProfile(
        documents(s, d), Seq("doc_id", "source", "lang"))
    }),

    // Per-doc code-point entropy via the native single-pass expression
    // (the declarative form explodes rows × chars and shuffles the
    // corpus' character count through two keyed aggs).
    "tx18_char_entropy" -> ((s, d) => {
      documents(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"),
          round(graft.functions.CharEntropy.charEntropy(col("text")), 4)
            .as("char_entropy"))
    }),

    // Corpus mixing to per-source token budgets: md5-hash visiting
    // order, running token sum per source, cut at the budget line —
    // replayed exactly by a DuckDB window.
    "tx17_mix_budget" -> ((s, d) => {
      val docs = documents(s, d)
        .withColumn("n_tokens", size(split(col("text"), " ")))
      TextAnalysisOps.mixToBudget(docs, "doc_id", "source", "n_tokens",
        Map("src0" -> 3000L, "src1" -> 1500L), defaultBudget = 2000L)
        .select("source", "doc_id", "n_tokens")
    }),

    // Temperature mixing (α = 0.5): per-source token budgets ∝
    // sqrt(source tokens), derived in-plan and applied through the
    // histogram cutoff — sqrt is correctly-rounded IEEE so the
    // quantized integer weights replay bit-exactly (pow would not;
    // see temperatureMix scaladoc). total=6000 against a ~25k-token
    // corpus cuts EVERY source at sf0.01 (and deeper at sf0.1), so
    // the budget arithmetic is load-bearing for each stratum.
    "tx47_temperature_mix" -> ((s, d) => {
      val docs = documents(s, d)
        .withColumn("n_tokens", size(split(col("text"), " ")))
      TextAnalysisOps.temperatureMix(docs, "doc_id", "source",
          "n_tokens", totalBudget = 6000L, alphaPct = 50)
        .select("source", "doc_id", "n_tokens")
    }),

    // Weighted sampling without replacement (Efraimidis–Spirakis):
    // exactly 5 docs per source, drawn proportionally to token count,
    // deterministic via the md5 uniform — replayed exactly in DuckDB.
    "tx16_weighted_sample" -> ((s, d) => {
      val docs = documents(s, d)
        .withColumn("n_tokens", size(split(col("text"), " ")))
      TextAnalysisOps.weightedSample(docs, "doc_id", "source",
        "n_tokens", 5)
        .select("source", "doc_id", "n_tokens")
    }),

    // Deterministic stratified hash sampling: per-source keep rates, a
    // pure function of md5(doc_id) — reproducible on any engine.
    "tx9_sample" -> ((s, d) => {
      TextAnalysisOps.stratifiedHashSample(documents(s, d),
        "doc_id", "source",
        Map("src0" -> 80, "src1" -> 50, "src2" -> 10), defaultPct = 25)
        .select("doc_id", "source")
    }),

    // BM25 term scoring (Lucene/Okapi, k1=1.2 b=0.75): every input is
    // an integer corpus statistic, so scores are deterministic doubles
    // on any engine — no summation-order fuzz.
    "tx27_bm25" -> ((s, d) => {
      TextAnalysisOps.bm25(documents(s, d), "doc_id", "text", minTf = 3)
    }),

    // BM25 top-10 retrieval for a fixed 4-query set (terms chosen from
    // the corpus vocabulary, stable across SFs): per-term milli-scores
    // summed as exact integers, ranked on the TopKPerKey heap.
    "tx34_bm25_retrieval" -> ((s, d) => {
      TextAnalysisOps.bm25Retrieve(documents(s, d), "doc_id", "text",
        retrievalQuerySet, k = 10)
    }),

    // Contamination removal (tx8 measures, this excises): every train
    // word covered by a 3-gram that also occurs in the src0 eval set
    // is dropped, survivors reassembled in order. Output carries the
    // cleaned text as an md5 fingerprint (dd11 precedent) plus the
    // removal accounting.
    "tx35_decontaminate" -> ((s, d) => {
      val docs = documents(s, d)
      TextAnalysisOps.decontaminateSpans(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", k = 3)
        .select(col("doc_id"), col("n_words"), col("n_removed"),
          md5(col("clean_text")).as("clean_fp"))
    }),

    // Evasion-resistant decontamination (tx50): tx35 matches grams by
    // RAW bytes, so contamination hidden behind homoglyph swaps (the
    // tx48 classes) sails through — the realistic leak shape when a
    // benchmark is pasted through a "translation" laundering chain.
    // The fixture salts every third train doc with a known eval phrase
    // whose a/e/o/c are swapped for Cyrillic look-alikes (every salt
    // word's bytes change); canonicalKeys=true hashes each gram's
    // unicode_norm_key, so the disguised salt matches the eval set and
    // is excised — raw tx35 would keep it. The oracle performs NO
    // normalization: it replays tx35's machinery over the ASCII-salted
    // twin corpus, which is exactly what a correct canonicalizer must
    // reduce the disguised corpus to (the tx49 contract); surviving
    // words keep their original ASCII bytes, so clean_fp hashes match.
    // HTML boilerplate strip (tx51): the first transform of every
    // web-scraped corpus. The fixture wraps each document in a
    // deterministic page — head/title, a style block, an h1, the text
    // in a p with entity-encoded tail, a script block, a footer div —
    // and the extractor must recover exactly the visible text: blocks
    // removed whole, tags stripped, entities decoded (&amp; last),
    // whitespace collapsed. The oracle replays the identical
    // RE2-subset pipeline in DuckDB.
    // Script-mix profile (tx52): Unicode-block codepoint census per
    // doc — the multilingual-curation fact language-ID misses
    // (code-switching, transliteration noise, homoglyph stuffing ARE
    // script mixes). Scripts planted by id%4: 1 → Cyrillic swap of
    // a/e/o/c (mixed), 2 → Greek swap of a/e/o/t (mixed), 0 → a-only
    // Cyrillic (mixed), 3 → pure lowered Latin. Exact integer counts,
    // fixed tie priority, both dominant verdicts and the mixed flag
    // fire. Escapes, never glyphs (the tx48 rule).
    // URL canonicalization + registered domain (tx53): the KEY side
    // of web ingest — sourceCap (tx40), heavy hitters (tx43), and
    // contamination ledgers group on "the source", which raw crawl
    // URLs split across case-shifted hosts, default ports, unsorted
    // queries, tracking params, percent-variants, dot-segments and
    // fragments. Messy URLs are planted arithmetically from doc_id
    // (every normalization class fires on a known residue), the
    // native codegen'd expressions canonicalize, and the oracle is
    // the CLOSED-FORM canonical string — the operator must invert
    // exactly the mess the generator applied, end to end. Per-row
    // projection, no shuffle: the 100-TB shape is embarrassingly
    // parallel and whole-stage-codegen'd.
    "tx53_url_canon" -> ((s, d) =>
      documents(s, d).select(col("doc_id"),
          messyUrl(col("doc_id").cast("long")).as("url"))
        .select(col("doc_id"),
          graft.functions.UrlCanon.canonicalUrl(col("url"))
            .as("url_canon"),
          graft.functions.UrlCanon.registeredDomainCol(col("url"))
            .as("domain"))),

    // Leakage-safe split audit (tx55): train/eval assignment keyed by
    // the registered domain (tx53's key) vs keyed by doc id, side by
    // side — the by-id strategy leaks (domains straddle the split:
    // nonzero leaky keys on 21 planted domains across 500+ docs), the
    // by-key strategy is leak-free by construction and the audit
    // PROVES it (n_leaky_keys = 0). md5-percent assignment, 90/10.
    "tx55_split_audit" -> ((s, d) => {
      val keyed = documents(s, d).select(col("doc_id"),
          messyUrl(col("doc_id").cast("long")).as("url"))
        .select(col("doc_id"),
          graft.functions.UrlCanon.registeredDomainCol(col("url"))
            .as("domain"))
      TextAnalysisOps.splitLeakageAudit(keyed, "doc_id", "domain",
        trainPct = 90)
    }),

    // Per-DOMAIN document cap (tx54): tx40's dominant-source
    // down-sampler on the key real crawls actually need — the
    // registered domain extracted from the raw (messy) URL by the
    // tx53 expressions, feeding sourceCap's heap/histogram dispatch
    // unchanged. Cap 10 over ~21 planted domains so every domain
    // genuinely overflows at both gated scales.
    "tx54_domain_cap" -> ((s, d) => {
      val keyed = documents(s, d).select(col("doc_id"),
          messyUrl(col("doc_id").cast("long")).as("url"))
        .select(col("doc_id"),
          graft.functions.UrlCanon.registeredDomainCol(col("url"))
            .as("domain"))
      TextAnalysisOps.sourceCap(keyed, "doc_id", "domain", cap = 10)
    }),

    "tx52_script_mix" -> ((s, d) => {
      val base = lower(col("text"))
      val planted = when(col("doc_id") % 4 === 1,
          translate(base, "aeoc", "\u0430\u0435\u043e\u0441"))
        .when(col("doc_id") % 4 === 2,
          translate(base, "aeot", "\u03b1\u03b5\u03bf\u03c4"))
        .when(col("doc_id") % 4 === 0, translate(base, "a", "\u0430"))
        .otherwise(base)
      TextAnalysisOps.scriptMix(
        documents(s, d).select(col("doc_id"), planted.as("text")),
        "doc_id", "text")
    }),

    "tx51_html_extract" -> ((s, d) => {
      val html = concat(
        lit("<html><head><title>Doc "), col("doc_id"),
        lit("</title><style>body { margin: 0; }</style></head><body><h1>Doc "),
        col("doc_id"), lit("</h1>\n<p>"), col("text"),
        lit(" &amp; tail &lt;"), col("doc_id"),
        lit("&gt;&nbsp;end</p><script>var a = "), col("doc_id"),
        lit(";</script>\t<div class=\"nav\">footer &amp; nav</div></body></html>"))
      TextAnalysisOps.htmlExtract(
        documents(s, d).select(col("doc_id"), html.as("html")),
        "doc_id", "html")
    }),

    // FUSED crawl→training-text pipeline (tx56): the canonical 100 TB
    // use of this engine in ONE lane — WARC container walk (mm32's
    // codec) → response payloads → HTML boilerplate strip (tx51) →
    // language-ID (tx3) + gopher quality rules (tx29) as in-row
    // projections over the extracted text → exact-substring dup marks
    // (dd20's gram machinery, minTokens 6). The extracted text is
    // materialized ONCE (the plan forks there: per-row scalars on one
    // branch, the gram self-join on the other) and released through
    // the lane lease; corrupt WARCs (%13 torn terminator, %17 alien
    // version) contribute no rows, exactly the ingest contract. The
    // oracle replays the whole chain: mm33's extraction CTE feeding
    // tx3's scores, tx29's integer rules, and dd20's first-occurrence
    // interval merge.
    "tx56_warc_pipeline" -> ((s, d) => {
      val ext0 = TextAnalysisOps.htmlExtract(
        graft.operators.MultimodalOps.warcResponseTexts(
          graft.operators.MultimodalOps.synthWarcHtmlAssets(
            documents(s, d), "doc_id", "text")),
        "asset_id", "payload")
        .select(col("asset_id").as("doc_id"), col("extracted").as("text"))
      val ext = graft.Ckpt(ext0,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val lang = TextAnalysisOps.langId(ext, "doc_id", "text")
        .select(col("doc_id"), col("predicted").as("lang"))
      val gopher = TextAnalysisOps.gopherRules(ext)
        .select(col("doc_id"), col("n_words"), col("keep"))
      val sub = graft.operators.DedupOps.exactSubstringStats(
        ext, "doc_id", "text", minTokens = 6)
        .select(col("doc_id"), col("dup_tokens"), col("dup_runs"))
      val out = ext.select(col("doc_id"),
          length(col("text")).cast("int").as("n_extracted"))
        .join(lang, Seq("doc_id"))
        .join(gopher, Seq("doc_id"))
        .join(sub, Seq("doc_id"))
      graft.Leases.swap("tx56_warc_pipeline",
        () => graft.Release(ext))(out)
    }),

    "tx50_decontaminate_evasive" -> ((s, d) => {
      val docs = documents(s, d)
      val phrase = lit("alpha beta gamma delta epsilon")
      val disguised = translate(phrase, "aeoc",
        "\u0430\u0435\u043e\u0441")
      val train = docs.filter(col("source") =!= "src0")
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0,
            concat(col("text"), lit(" "), disguised))
            .otherwise(col("text")).as("text"))
      val evalPlus = docs.filter(col("source") === "src0")
        .select(col("doc_id"), col("text"))
        .unionByName(s.range(1)
          .select(lit(-1L).as("doc_id"), phrase.as("text")))
      TextAnalysisOps.decontaminateSpans(train, evalPlus,
          "doc_id", "text", k = 3, canonicalKeys = true)
        .select(col("doc_id"), col("n_words"), col("n_removed"),
          md5(col("clean_text")).as("clean_fp"))
    }),

    // BPE merge-candidate counts (tokenizer training, one merge
    // iteration): adjacent char pairs weighted by word frequency, top
    // 50 — corpus touched once, expansion runs on the vocab table.
    "tx36_bpe_pairs" -> ((s, d) => {
      TextAnalysisOps.bpePairCounts(documents(s, d), "text", topN = 50)
    }),

    // Iterative BPE merge learning: 3 rounds of count → adopt top
    // pair → rewrite the vocabulary; the merge table is the tokenizer
    // artifact. Corpus scanned once; iterations are vocab-only.
    "tx37_bpe_learn" -> ((s, d) => {
      TextAnalysisOps.bpeLearn(documents(s, d), "text", nMerges = 3)
    }),

    // Cross-source 3-gram resemblance matrix: exact pairwise Jaccard
    // of per-source distinct gram sets — the overlap diagnostic behind
    // mixing/dedup decisions. Raw IEEE quotient, no rounding.
    "tx38_source_overlap" -> ((s, d) => {
      TextAnalysisOps.sourceOverlap(documents(s, d), "source", "text",
        k = 3)
    }),

    // BPE tokenization (the APPLY side of tx37): per-doc token counts
    // under the first 3 learned merges — merges applied on the vocab
    // table, corpus tokenized via one word-keyed join.
    "tx39_bpe_tokenize" -> ((s, d) => {
      TextAnalysisOps.bpeTokenCount(documents(s, d), "doc_id", "text",
        nMerges = 3)
    }),

    // BPE token sequences: the emit side of the apply — the actual
    // in-order token stream under the learned merges, reassembled per
    // doc from a positional word explode + broadcast vocab join.
    "tx44_bpe_sequences" -> ((s, d) => {
      TextAnalysisOps.bpeTokenSequences(documents(s, d), "doc_id",
        "text", nMerges = 3)._1
    }),

    // TF-IDF term weighting: tf × ln(N/df) for every (doc, term) with
    // tf >= 3 — keyword extraction / relevance scoring over the corpus.
    "tx20_tfidf" -> ((s, d) => {
      TextAnalysisOps.tfidf(documents(s, d), "doc_id", "text", minTf = 3)
    }),

    // Unigram LM cross-entropy (CCNet-style quality filter): per-doc
    // -mean log2 p(token) under the corpus' own unigram distribution.
    "tx21_lm_score" -> ((s, d) => {
      TextAnalysisOps.lmScore(documents(s, d), "doc_id", "text")
    }),

    // The SQL surface end-to-end in the driver path: native functions
    // injected into the session and driven from spark.sql — the
    // char_entropy codegen kernel plus a LATERAL VIEW over the shingle
    // generator in one statement (tx18's oracle family, via SQL).
    "tx25_sql_surface" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      documents(s, d).createOrReplaceTempView("documents_v")
      s.sql("""
        SELECT doc_id,
               round(char_entropy(text), 4) AS char_entropy,
               count(*) AS n_shingles
        FROM documents_v
        LATERAL VIEW shingle_gen(text, 3, true) sh AS shingle
        WHERE length(text) > 0
        GROUP BY doc_id, round(char_entropy(text), 4)""")
    }),

    // Interpolated bigram LM cross-entropy (Jelinek-Mercer 0.9/0.1 mix
    // with unigram backoff) — the 2-gram quality filter.
    "tx26_lm_bigram" -> ((s, d) => {
      TextAnalysisOps.lmScoreBigram(documents(s, d), "doc_id", "text")
    }),

    // Bigram PMI collocations over the corpus (phrase mining): adjacent
    // pairs with count >= 20, scored ln(p(ab)/(p(a)p(b))).
    "tx22_pmi" -> ((s, d) => {
      TextAnalysisOps.pmiBigrams(documents(s, d), "text", minCount = 20)
    }),

    // Repetition quality signals: duplicate-word ratio + top-bigram
    // dominance (the Gopher-style repetition filters).
    "tx10_repetition" -> ((s, d) => {
      TextAnalysisOps.repetitionMetrics(documents(s, d), "doc_id", "text")
    }),

    // PII-style scrubbing: emails + long digit runs → placeholder tags,
    // with match counts; fingerprint keeps the compare compact.
    "tx11_redact" -> ((s, d) => {
      TextAnalysisOps.redact(documents(s, d), "doc_id", "text")
        .select(col("doc_id"), col("n_emails"), col("n_long_nums"),
          md5(col("redacted")).as("redacted_fp"))
    }),

    // Top-5 most frequent terms per source: native token generator +
    // the custom heap-based TopKPerKey operator (map-side pruned — at
    // most k rows per source per partition reach the exchange).
    "tx12_top_terms" -> ((s, d) => {
      val toks = documents(s, d).select(col("source"),
        graft.functions.ShingleGen.shingleGen(col("text"), 1,
          distinct = false)).toDF("source", "term")
      val counts = toks.groupBy("source", "term")
        .agg(count(lit(1)).as("n"))
      graft.plans.TopK.perKey(counts, Seq("source"),
        Seq(col("n").desc, col("term").asc), 5)
    }),

    // Greedy sequence packing: documents → fixed-budget context bins by
    // per-source running token count (training-batch prep).
    "tx13_packing" -> ((s, d) => {
      val (out, rel) = TextAnalysisOps.packBinsReleasable(
        documents(s, d), "doc_id", "text", "source", budgetTokens = 512)
      graft.Leases.swap("tx13_packing", rel)(out)
    }),

    // Materialized training sequences: packBins assignments concatenated
    // in id order with an EOS separator — the final "make training
    // examples" step; sequence text pinned by fingerprint.
    "tx23_pack_sequences" -> ((s, d) => {
      val (seq, rel) = TextAnalysisOps.packSequencesReleasable(
        documents(s, d), "doc_id", "text", "source", budgetTokens = 512)
      graft.Leases.swap("tx23_pack_sequences", rel)(
        seq.select(col("source"), col("bin"), col("n_docs"),
          col("seq_tokens"), md5(col("seq_text")).as("seq_fp")))
    }),

    // Quantile-gated curation: keep the top 30% of docs per language
    // by stopword ratio (the "train on the best fraction per language"
    // cut). percent_rank is an exact small-integer quotient; ties
    // broken by doc_id so the kept set is deterministic.
    "tx24_quantile_filter" -> ((s, d) => {
      // percent_rank = (rank-1)/(n-1), with the rank from the two-phase
      // prefix sum (unit weight ≡ row_number; the order has a unique
      // doc_id tie-break so rank ≡ row_number) — NOT a window keyed by
      // lang: the dominant language (English ≈ most of any real corpus)
      // would be ONE WindowExec partition = one task sorting most of
      // the corpus. n per lang is a map-side-combined count, broadcast
      // back; identical IEEE math to percent_rank (double/double).
      val docs = documents(s, d)
      val q = TextAnalysisOps.qualityMetrics(docs, "doc_id", "text")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("lang"), col("doc_id"), col("stopword_ratio"))
        .withColumn("_one", lit(1))
      val (ranked, rel) = TextAnalysisOps.stratumCumSumReleasable(q,
        "lang", Seq(col("stopword_ratio").desc, col("doc_id").asc),
        "_one")
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("_n"))
      graft.Leases.swap("tx24_quantile_filter", rel)(
      ranked.join(broadcast(counts), Seq("lang"))
        .withColumn("pr", when(col("_n") === 1, lit(0.0))
          .otherwise(round((col("cum") - 1).cast("double") /
            (col("_n") - 1).cast("double"), 6)))
        .filter(col("pr") <= 0.3)
        .select(col("lang"), col("doc_id"), col("stopword_ratio"),
          col("pr")))
    }),

    // KMV (k-minimum-values) distinct-count sketch, k=16: because the
    // hash is deterministic md5, this APPROXIMATE algorithm verifies
    // EXACTLY against the oracle — unlike HLL (tx5, rows-only). The
    // k smallest hashes per source come from the heap-based TopKPerKey
    // (map-side pruned); estimate = (k-1)/F(h_k), exact count when a
    // source has fewer than k distinct hashes.
    "tx14_kmv_distinct" -> ((s, d) => {
      val hashed = documents(s, d).select(col("source"),
        conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long")
          .as("h")).distinct()
      val topk = graft.plans.TopK.perKey(hashed, Seq("source"),
        Seq(col("h").asc), 16)
      topk.groupBy("source")
        .agg(count(lit(1)).as("n_kept"), max(col("h")).as("hk"))
        .select(col("source"), col("n_kept"),
          when(col("n_kept") < 16, col("n_kept").cast("double"))
            .otherwise(round(lit(15.0) /
              (col("hk") / lit(1152921504606846976.0)), 2))
            .as("est_distinct"))
    }),

    // End-to-end corpus curation (the canonical training-data pipeline):
    // cheap quality gate → exact dedup → per-language stats. The quality
    // filter is map-side (no shuffle); dedup shuffles on md5(text) — a
    // 32-byte key — so full document bodies never cross the wire; the
    // final agg is a partial-agg over ~10 language keys.
    "tx6_curation" -> ((s, d) => {
      val docs = documents(s, d)
      val keep = TextAnalysisOps.qualityMetrics(docs, "doc_id", "text")
        .filter(col("n_tokens") >= 25 && col("stopword_ratio") > 0)
        .select("doc_id")
      val kept = docs.join(keep, Seq("doc_id"))
      val ids = graft.operators.DedupOps.dedupExact(
        kept.withColumn("_k", md5(col("text"))), Seq("_k"), "doc_id")
        .select("doc_id")
      kept.join(ids, Seq("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("n_chars"), 2).as("avg_chars"))
    }),

    // Unicode-canonical dedup keys (tx48): the corpus is salted with
    // byte-different Unicode twins of each doc's 40-char prefix —
    // NFC "café", NFD "cafe"+combining-acute, upper-case NFC,
    // full-width "ｃａｆｅ", and Cyrillic-homoglyph "саfе" — exactly the
    // variants raw-byte md5 dedup (dd1) structurally splits. The
    // native `unicode_norm_key` expression (NFKC → casefold →
    // homoglyph strip) collapses them; the lane emits each row's
    // canonical key and its twin count (the dd1 composition:
    // groupBy(md5(unicode_norm_key(text)))), plus the raw-byte group
    // count to exhibit the miss the normalization repairs. The oracle
    // never normalizes: it reconstructs the canonical key analytically
    // from the generative rule (the planted deviations are known), so
    // a single mis-normalized codepoint shifts a key and breaks the
    // hash.
    "tx48_unicode_norm" -> ((s, d) => {
      val base = lower(substring(col("text"), 1, 40))
      val suffix = col("doc_id") % 5
      // escape sequences, NEVER literal glyphs: an editor or tool in
      // the chain silently NFC-normalizing the source would turn the
      // NFD case into a no-op and the lane would stop testing it
      val planted = concat(base,
        when(suffix === 0, lit(" cafe"))
          .when(suffix === 1, lit(" CAF\u00c9"))      // NFC, cased
          .when(suffix === 2, lit(" cafe\u0301"))     // NFD
          .when(suffix === 3,                         // full-width
            lit(" \uff43\uff41\uff46\uff45"))
          .otherwise(lit(" \u0441\u0430f\u0435")))    // Cyrillic homoglyphs
      // group sizes via map-side-combined counts joined back, NOT
      // `count(*) OVER (PARTITION BY key)`: the hot key of a dedup
      // fingerprint is by definition the most-duplicated content, and
      // a WindowExec group cannot be split across tasks, while the
      // count join's probe side can (build side is one row per key, so
      // AQE's skew-join split applies cleanly)
      val keyed = documents(s, d)
        .select(col("doc_id"),
          graft.functions.UnicodeNorm.unicodeNormKey(planted)
            .as("norm_key"),
          md5(planted).as("raw_md5"))
      val normCnt = keyed.groupBy("norm_key")
        .agg(count(lit(1)).as("twins"))
      val rawCnt = keyed.groupBy("raw_md5")
        .agg(count(lit(1)).as("raw_twins"))
      keyed.join(normCnt, Seq("norm_key")).join(rawCnt, Seq("raw_md5"))
        .select("doc_id", "norm_key", "twins", "raw_twins")
    }),

    // Normalized MinHash near-dup (tx49) — tx48's expression in the
    // SHINGLE path, at corpus scale: the corpus is salted with a
    // +20000 homoglyph twin of every doc (every a/e/o/c swapped for
    // its Cyrillic look-alike — EVERY word's bytes change, so raw
    // dd2 signatures share nothing and the twin is invisible to
    // byte-level MinHash), then dd2 runs over
    // `unicode_norm_key(text)`. The twins normalize back to the
    // original ASCII text, so every planted pair collides at full
    // signature equality alongside dd2's natural candidates. The
    // oracle performs NO normalization — it replays dd2 over two
    // ASCII copies, which is exactly what a correct canonicalizer
    // must reduce the salted corpus to; one mishandled codepoint
    // anywhere in the multi-byte text desyncs a shingle and breaks
    // the hash.
    "tx49_norm_neardup" -> ((s, d) => {
      val docs = documents(s, d).select("doc_id", "text")
      val twin = docs.select((col("doc_id") + 20000).as("doc_id"),
        translate(col("text"), "aeoc",
          "\u0430\u0435\u043e\u0441").as("text"))
      val corpus = docs.unionByName(twin).withColumn("text",
        graft.functions.UnicodeNorm.unicodeNormKey(col("text")))
      graft.operators.DedupOps.minhashCandidates(corpus,
        "doc_id", "text", shingleK = 3, numPerm = 16, bands = 4)
    })
  )

  private val stop = TextAnalysisOps.stopwords
    .map(w => s"'$w'").mkString(", ")

  /** tx34's fixed query set — terms from the synthetic corpus
    * vocabulary, present at every SF. Shared between the Spark query
    * and the oracle's VALUES list so the two can never drift.
    */
  private val retrievalQuerySet: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("join", "merge", "hash"),
    2 -> Seq("scan", "filter"),
    3 -> Seq("window", "sort", "order"),
    4 -> Seq("vector", "batch"))

  // ts.distinct mirrors bm25Retrieve's per-query term dedup — a
  // repeated term must not double-count on either side
  private val retrievalValuesSql: String = retrievalQuerySet
    .flatMap { case (q, ts) => ts.distinct.map(t => s"($q, '$t')") }
    .mkString(", ")

  val oracles: Map[String, String] = Map(
    "tx40_source_cap" ->
      """SELECT source, doc_id FROM (
           SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(doc_id::VARCHAR) ASC, doc_id ASC) AS rn
           FROM documents) WHERE rn <= 15""",
    // the MG contract is deterministic even though sketch content is
    // not: every item with freq > n/(k+1) MUST be present with an
    // estimate in [exact - n/(k+1), exact] — so the oracle emits the
    // provably-frequent items with both booleans true
    "tx43_heavy_hitters" ->
      """WITH w AS (SELECT CASE WHEN doc_id % 5 = 0 THEN 'hotword'
                            ELSE x END AS item
                    FROM (SELECT doc_id,
                            unnest(string_split(text, ' ')) AS x
                          FROM documents)),
          e AS (SELECT item, count(*) AS exact_count FROM w GROUP BY item),
          t AS (SELECT count(*)::DOUBLE AS n FROM w)
         SELECT item, exact_count, true AS guaranteed_present,
           true AS est_within_bound
         FROM e, t WHERE exact_count > n / 17.0""",
    "tx45_exact_heavy" ->
      """WITH w AS (SELECT CASE WHEN doc_id % 5 = 0 THEN 'hotword'
                            ELSE x END AS item
                    FROM (SELECT doc_id,
                            unnest(string_split(text, ' ')) AS x
                          FROM documents)),
          e AS (SELECT item, count(*) AS exact_count FROM w GROUP BY item),
          t AS (SELECT count(*)::DOUBLE AS n FROM w)
         SELECT item, exact_count
         FROM e, t WHERE exact_count > n / 17.0""",
    "tx46_count_min" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS item
                    FROM documents),
          rr AS (SELECT unnest(range(0, 2)) AS r),
          cells AS (SELECT r,
                      (('0x' || substr(md5('cms' || r || '|' || item),
                        1, 15))::UBIGINT % 8)::INT AS b,
                      count(*) AS n
                    FROM w CROSS JOIN rr GROUP BY 1, 2),
          q AS (SELECT DISTINCT item FROM w
                UNION SELECT 'never_seen_item'),
          pr AS (SELECT q.item, rr.r,
                   (('0x' || substr(md5('cms' || rr.r || '|' || q.item),
                     1, 15))::UBIGINT % 8)::INT AS b
                 FROM q CROSS JOIN rr),
          s2 AS (SELECT pr.item, min(coalesce(cells.n, 0)) AS est
                 FROM pr LEFT JOIN cells
                   ON pr.r = cells.r AND pr.b = cells.b
                 GROUP BY pr.item),
          e AS (SELECT item, count(*) AS exact_count FROM w
                GROUP BY item)
         SELECT s2.item, s2.est,
           coalesce(e.exact_count, 0) AS exact_count,
           s2.est >= coalesce(e.exact_count, 0) AS never_undercounts
         FROM s2 LEFT JOIN e ON s2.item = e.item""",
    "tx42_snapshot_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS h FROM documents
                    WHERE doc_id % 7 <> 0),
          n AS (SELECT doc_id,
                  md5(CASE WHEN doc_id % 11 = 0 THEN text || ' mod'
                           ELSE text END) AS h
                FROM documents WHERE doc_id % 5 <> 0)
         SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.h = n.h THEN 'unchanged'
                ELSE 'changed' END AS status
         FROM o FULL JOIN n ON o.doc_id = n.doc_id""",
    // the oracle is the NAIVE global-window formulation the two-phase
    // implementation is provably equivalent to
    "tx41_token_budget" ->
      s"""WITH q AS (
            SELECT doc_id,
              len(string_split(text, ' '))::BIGINT AS n_tokens,
              round(len(list_filter(string_split(text, ' '),
                                    w -> w IN ($stop)))::DOUBLE /
                    greatest(len(string_split(text, ' ')), 1), 4)
                AS stopword_ratio
            FROM documents),
          r AS (SELECT doc_id, n_tokens, stopword_ratio,
                  sum(n_tokens) OVER (ORDER BY stopword_ratio DESC,
                    doc_id ASC ROWS UNBOUNDED PRECEDING) AS cum
                FROM q)
          SELECT doc_id, n_tokens, stopword_ratio
          FROM r WHERE cum <= 12000""",
    // The HLL estimate itself is engine-specific; the verified surface
    // is the exact count + the accuracy-contract boolean (must be true).
    "tx5_approx_distinct" ->
      """SELECT source, count(DISTINCT md5(text)) AS exact_texts,
           count(*) AS n, true AS hll_within_10pct
         FROM documents GROUP BY source""",
    "tx1_tokens" ->
      """SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_subwords
         FROM documents""",
    "tx2_quality" ->
      s"""SELECT doc_id,
            length(text) AS n_chars,
            len(string_split(text, ' ')) AS n_tokens,
            round(len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE /
                  greatest(length(text), 1), 4) AS punct_ratio,
            round(len(list_filter(string_split(text, ' '),
                                  w -> w IN ($stop)))::DOUBLE /
                  greatest(len(string_split(text, ' ')), 1), 4) AS stopword_ratio,
            round((length(text) - len(string_split(text, ' ')) + 1)::DOUBLE /
                  greatest(len(string_split(text, ' ')), 1), 4) AS avg_word_len
          FROM documents""",
    // Hashing-trick classifier replay: bucket and weight are both md5
    // functions, the logit is an exact integer sum. UBIGINT % is cast
    // to BIGINT BEFORE the -1000 shift (UBIGINT subtraction would
    // underflow), and the outer sum gets the ::BIGINT of the q32
    // dtype lesson (DuckDB sum(BIGINT) -> HUGEINT -> pandas float64).
    // `+ 0` normalizes IEEE -0.0 (ss6 precedent).
    "tx28_classifier" ->
      """WITH base AS (
           SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE string_split_regex(lower(trim(text)), '\s+')
             END AS toks
           FROM documents),
         agg AS (
           SELECT doc_id, len(toks)::INT AS n_tokens,
             coalesce(list_sum(list_transform(toks, t ->
               (('0x' || substr(md5('w_' ||
                    (('0x' || substr(md5('qc_' || t), 1, 8))
                      ::UBIGINT % 256)), 1, 8))
                 ::UBIGINT % 2001)::BIGINT - 1000)), 0)::BIGINT
               AS logit_milli
           FROM base)
         SELECT doc_id, n_tokens, logit_milli,
           logit_milli::DOUBLE / nullif(n_tokens, 0) / 1000.0 AS mean_w,
           logit_milli > 0 AS keep
         FROM agg""",
    // Gopher rules: every verdict an integer comparison, so the
    // booleans are dtype- and value-exact. The /3 ellipsis division is
    // exact (replace removes whole '...' occurrences).
    "tx29_gopher_rules" ->
      s"""WITH w AS (
           SELECT doc_id, text,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE string_split_regex(trim(text), '\\s+')
             END AS words
           FROM documents),
         c AS (
           SELECT doc_id,
             len(words)::INT AS n_words,
             coalesce(list_sum(list_transform(words,
               x -> length(x)::BIGINT)), 0)::BIGINT AS wc,
             (length(text) - length(replace(text, '#', '')))::BIGINT
               AS nh,
             ((length(text) - length(replace(text, '...', ''))) / 3)
               ::BIGINT AS ne,
             len(list_filter(words,
               x -> regexp_matches(x, '[A-Za-z]')))::BIGINT AS na,
             len(list_filter(words,
               x -> lower(x) IN ($stop)))::BIGINT AS ns
           FROM w)
         SELECT doc_id, n_words,
           n_words >= 50 AND n_words <= 100000 AS rule_wc,
           wc >= 3 * n_words AND wc <= 10 * n_words AS rule_mwl,
           10 * (nh + ne) < n_words AS rule_symbol,
           10 * na >= 8 * n_words AS rule_alpha,
           ns >= 2 AS rule_stop,
           (n_words >= 50 AND n_words <= 100000)
             AND (wc >= 3 * n_words AND wc <= 10 * n_words)
             AND (10 * (nh + ne) < n_words)
             AND (10 * na >= 8 * n_words)
             AND ns >= 2 AS keep
         FROM c""",
    "tx3_langid" ->
      """WITH scored AS (
           SELECT doc_id,
             len(list_filter(string_split(text,' '),
                 w -> w IN ('the','and','of','is','with'))) AS score_en,
             len(list_filter(string_split(text,' '),
                 w -> w IN ('el','la','de','que','los'))) AS score_es,
             len(list_filter(string_split(text,' '),
                 w -> w IN ('der','die','das','und','nicht'))) AS score_de,
             len(list_filter(string_split(text,' '),
                 w -> w IN ('le','les','et','est','une'))) AS score_fr
           FROM documents)
         SELECT doc_id, score_en, score_es, score_de, score_fr,
           CASE WHEN score_en >= score_es AND score_en >= score_de AND score_en >= score_fr THEN 'en'
                WHEN score_es >= score_de AND score_es >= score_fr THEN 'es'
                WHEN score_de >= score_fr THEN 'de'
                ELSE 'fr' END AS predicted
         FROM scored""",
    "tx4_ngram_profile" ->
      """WITH s AS (SELECT source, doc_id, string_split(text, ' ') w FROM documents),
         n AS (SELECT source, doc_id,
                 CASE WHEN len(w) >= 3 THEN
                   len(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                      for i in range(1, len(w)-1)]))
                 ELSE 0 END AS n_shingles
               FROM s)
         SELECT source, count(*) AS n_docs,
           sum(n_shingles)::BIGINT AS total_shingles,
           max(n_shingles) AS max_shingles
         FROM n GROUP BY source""",
    "tx7_chunking" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
         c AS (SELECT doc_id, w,
                 greatest(1, floor((len(w) - 32 + 23)::DOUBLE / 24)::INT + 1)
                   AS nc
               FROM s),
         st AS (SELECT doc_id, w,
                  unnest(range(1, (nc - 1) * 24 + 2, 24)) AS st
                FROM c)
         SELECT doc_id, ((st - 1) // 24)::INT AS chunk_id,
           array_to_string(w[st:st+31], ' ') AS chunk_text,
           least(32, len(w) - st + 1)::INT AS chunk_tokens
         FROM st""",
    "tx8_contamination" ->
      """WITH tr AS (SELECT doc_id, string_split(text, ' ') w
                     FROM documents WHERE source <> 'src0'),
         tsh AS (SELECT doc_id,
                   unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                         for i in range(1, len(w)-1)])) AS s
                 FROM tr WHERE len(w) >= 3),
         ev AS (SELECT DISTINCT
                  unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                        for i in range(1, len(w)-1)])) AS s
                FROM (SELECT string_split(text, ' ') w
                      FROM documents WHERE source = 'src0')
                WHERE len(w) >= 3),
         evh AS (SELECT DISTINCT md5(s) AS h FROM ev)
         SELECT doc_id, count(*) AS n_shingles,
           sum(CASE WHEN evh.h IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_contaminated,
           round(sum(CASE WHEN evh.h IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE /
                 count(*), 4) AS contamination_ratio
         FROM tsh LEFT JOIN evh ON md5(tsh.s) = evh.h
         GROUP BY doc_id""",
    "tx15_contamination_bloom" ->
      """WITH tr AS (SELECT doc_id, string_split(text, ' ') w
                     FROM documents WHERE source <> 'src1'),
         tsh AS (SELECT doc_id,
                   unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                         for i in range(1, len(w)-1)])) AS s
                 FROM tr WHERE len(w) >= 3),
         ev AS (SELECT DISTINCT
                  unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                        for i in range(1, len(w)-1)])) AS s
                FROM (SELECT string_split(text, ' ') w
                      FROM documents WHERE source = 'src1')
                WHERE len(w) >= 3),
         evh AS (SELECT DISTINCT md5(s) AS h FROM ev)
         SELECT doc_id, count(*) AS n_shingles,
           sum(CASE WHEN evh.h IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_contaminated,
           round(sum(CASE WHEN evh.h IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE /
                 count(*), 4) AS contamination_ratio
         FROM tsh LEFT JOIN evh ON md5(tsh.s) = evh.h
         GROUP BY doc_id""",
    "tx19_column_profile" ->
      """SELECT 'doc_id' AS "column", count(*) AS n_rows,
           count(*) - count(doc_id) AS n_nulls,
           count(DISTINCT doc_id) AS n_distinct,
           min(doc_id)::VARCHAR AS min_value,
           max(doc_id)::VARCHAR AS max_value
         FROM documents
         UNION ALL
         SELECT 'source', count(*), count(*) - count(source),
           count(DISTINCT source), min(source), max(source)
         FROM documents
         UNION ALL
         SELECT 'lang', count(*), count(*) - count(lang),
           count(DISTINCT lang), min(lang), max(lang)
         FROM documents""",
    "tx18_char_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split_regex(text, '')) AS c
                     FROM documents WHERE length(text) > 0),
         f AS (SELECT doc_id, c, count(*)::DOUBLE AS cnt
               FROM ch GROUP BY doc_id, c),
         t AS (SELECT doc_id, sum(cnt) AS n FROM f GROUP BY doc_id)
         SELECT f.doc_id,
           -- + 0 normalizes IEEE -0.0 (a single-symbol doc gives
           -- -sum(0.0) = -0.0 here; the Spark kernel returns +0.0)
           round(-sum((cnt / n) * ln(cnt / n) / ln(2)) + 0, 4)
             AS char_entropy
         FROM f JOIN t USING (doc_id) GROUP BY f.doc_id""",
    "tx17_mix_budget" ->
      """WITH w AS (SELECT doc_id, source,
                      len(string_split(text, ' ')) AS n_tokens,
                      md5(doc_id::VARCHAR) AS h
                    FROM documents),
         r AS (SELECT source, doc_id, n_tokens,
                 sum(n_tokens) OVER (PARTITION BY source
                   ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS run
               FROM w)
         SELECT source, doc_id, n_tokens FROM r
         WHERE run <= CASE source WHEN 'src0' THEN 3000
                                  WHEN 'src1' THEN 1500
                                  ELSE 2000 END""",
    "tx47_temperature_mix" ->
      """WITH w AS (SELECT doc_id, source,
                      len(string_split(text, ' ')) AS n_tokens,
                      md5(doc_id::VARCHAR) AS h
                    FROM documents),
         tok AS (SELECT source, sum(n_tokens)::BIGINT AS tk
                 FROM w GROUP BY source),
         wq AS (SELECT source,
                  round(sqrt(tk::DOUBLE) * 1000000)::BIGINT AS q
                FROM tok),
         tot AS (SELECT sum(q)::BIGINT AS qs FROM wq),
         bud AS (SELECT source, (6000 * q) // qs AS b FROM wq, tot),
         r AS (SELECT source, doc_id, n_tokens,
                 sum(n_tokens) OVER (PARTITION BY source
                   ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS run
               FROM w)
         SELECT r.source, r.doc_id, r.n_tokens
         FROM r JOIN bud USING (source) WHERE run <= b""",
    "tx16_weighted_sample" ->
      """WITH w AS (SELECT doc_id, source,
                      len(string_split(text, ' ')) AS n_tokens,
                      ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT /
                        4294967296.0 AS u
                    FROM documents),
         r AS (SELECT source, doc_id, n_tokens,
                 row_number() OVER (PARTITION BY source
                   ORDER BY pow(u, 1.0/n_tokens) DESC, doc_id) AS rn
               FROM w WHERE n_tokens > 0)
         SELECT source, doc_id, n_tokens FROM r WHERE rn <= 5""",
    "tx9_sample" ->
      """SELECT doc_id, source FROM documents
         WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 100 <
           CASE WHEN source = 'src0' THEN 80
                WHEN source = 'src1' THEN 50
                WHEN source = 'src2' THEN 10
                ELSE 25 END""",
    "tx27_bm25" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                    FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf
                FROM t GROUP BY doc_id, term),
         dfq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term),
         dl AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS dl
                FROM documents),
         sc AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE AS sumdl
                FROM dl)
         SELECT doc_id, term, tf, df_t,
           round(ln((n - df_t + 0.5) / (df_t + 0.5) + 1.0) *
                 (tf * (1.2 + 1.0)) /
                 (tf + 1.2 * (1.0 - 0.75 +
                              0.75 * dl / (sumdl / n))), 4) AS bm25
         FROM tf
         JOIN dfq USING (term)
         JOIN dl USING (doc_id)
         CROSS JOIN sc
         WHERE tf >= 3""",
    // word/gram positions via generate_subscripts (0-based to match
    // posexplode); overlapping hit windows union through the DISTINCT
    // coverage set; docs with every word removed keep a row via the
    // outer join (md5('') fingerprint)
    "tx35_decontaminate" ->
      """WITH train AS (SELECT doc_id, text FROM documents
                        WHERE source <> 'src0'),
         ev0 AS (SELECT
                  unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in range(1, len(w)-1)]) AS g
                FROM (SELECT string_split(text,' ') AS w FROM documents
                      WHERE source = 'src0')
                WHERE len(w) >= 3),
         ev AS (SELECT DISTINCT md5(g) AS g FROM ev0),
         tww AS (SELECT doc_id, string_split(text,' ') AS w FROM train),
         tw AS (SELECT doc_id, generate_subscripts(w,1) - 1 AS i,
                  unnest(w) AS word FROM tww),
         tg AS (SELECT doc_id, generate_subscripts(g,1) - 1 AS i,
                  unnest(g) AS gram
                FROM (SELECT doc_id,
                        [w[j] || ' ' || w[j+1] || ' ' || w[j+2]
                         for j in range(1, len(w)-1)] AS g
                      FROM tww WHERE len(w) >= 3)),
         hits AS (SELECT DISTINCT tg.doc_id, tg.i
                  FROM tg JOIN ev ON md5(tg.gram) = ev.g),
         cov AS (SELECT DISTINCT doc_id, i + o AS i
                 FROM hits CROSS JOIN (SELECT unnest(range(0,3)) AS o) os),
         kept AS (SELECT tw.doc_id, tw.i, tw.word
                  FROM tw LEFT JOIN cov
                    ON cov.doc_id = tw.doc_id AND cov.i = tw.i
                  WHERE cov.doc_id IS NULL),
         ka AS (SELECT doc_id,
                  string_agg(word, ' ' ORDER BY i) AS clean_text,
                  count(*) AS n_kept
                FROM kept GROUP BY doc_id)
         SELECT t.doc_id,
           len(string_split(t.text,' '))::BIGINT AS n_words,
           (len(string_split(t.text,' ')) - coalesce(ka.n_kept, 0))::BIGINT
             AS n_removed,
           md5(coalesce(ka.clean_text, '')) AS clean_fp
         FROM train t LEFT JOIN ka ON ka.doc_id = t.doc_id""",
    // tx35's machinery verbatim over the ASCII-SALTED twin corpus — no
    // normalization anywhere in the replay (the tx49 contract): the
    // lane's canonicalizer must reduce the homoglyph-disguised corpus
    // to exactly this, and the salt words (all covered by the planted
    // phrase's own grams) excise completely, so surviving words are
    // pure ASCII on both engines and clean_fp hashes agree
    // the block census replayed over the same planted translate —
    // identical literal-range RE2 classes, identical tie CASE
    // tx55: both strategies replayed — md5-hex-prefix percent rule on
    // the closed-form domain and on the doc id
    "tx55_split_audit" ->
      """WITH u AS (SELECT doc_id,
             'site' || (doc_id % 7) ||
               (CASE doc_id % 3 WHEN 0 THEN '.co.uk'
                  WHEN 1 THEN '.com' ELSE '.org' END) AS domain
           FROM documents),
         bk AS (SELECT doc_id, domain,
                  (('0x' || substr(md5(domain), 1, 8))::UBIGINT % 100)
                    < 90 AS tr
                FROM u),
         bi AS (SELECT doc_id, domain,
                  (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT
                    % 100) < 90 AS tr
                FROM u),
         lk AS (SELECT count(*)::BIGINT AS n FROM (
                  SELECT domain FROM bk GROUP BY domain
                  HAVING count(DISTINCT tr) > 1)),
         li AS (SELECT count(*)::BIGINT AS n FROM (
                  SELECT domain FROM bi GROUP BY domain
                  HAVING count(DISTINCT tr) > 1))
         SELECT 'by_key' AS strategy,
           sum(CASE WHEN tr THEN 1 ELSE 0 END)::BIGINT AS n_train,
           sum(CASE WHEN tr THEN 0 ELSE 1 END)::BIGINT AS n_eval,
           (SELECT n FROM lk) AS n_leaky_keys
         FROM bk
         UNION ALL
         SELECT 'by_id',
           sum(CASE WHEN tr THEN 1 ELSE 0 END)::BIGINT,
           sum(CASE WHEN tr THEN 0 ELSE 1 END)::BIGINT,
           (SELECT n FROM li)
         FROM bi""",

    // tx54: the domain closed-form (the tx53 rule) + sourceCap's keep
    // rule replayed — top-10 per domain by (md5(id) asc, id asc)
    "tx54_domain_cap" ->
      """WITH u AS (SELECT doc_id,
             'site' || (doc_id % 7) ||
               (CASE doc_id % 3 WHEN 0 THEN '.co.uk'
                  WHEN 1 THEN '.com' ELSE '.org' END) AS domain
           FROM documents),
         r AS (SELECT doc_id, domain,
                 row_number() OVER (PARTITION BY domain
                   ORDER BY md5(doc_id::VARCHAR) ASC, doc_id ASC) AS rn
               FROM u)
         SELECT domain, doc_id FROM r WHERE rn <= 10""",

    // tx53: the CLOSED-FORM canonical string — the generator's mess
    // (case, default/zero-padded ports, dot-segments, %7E decode,
    // %2F retention, tracking strip, query sort, fragment) inverted
    // arithmetically, never re-canonicalized in SQL
    "tx53_url_canon" ->
      """SELECT doc_id,
           (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END)
           || '://'
           || (CASE doc_id % 3
                 WHEN 0 THEN 'www.site' || (doc_id % 7) || '.co.uk'
                 WHEN 1 THEN 'sub.site' || (doc_id % 7) || '.com'
                 ELSE 'site' || (doc_id % 7) || '.org' END)
           || (CASE WHEN doc_id % 4 = 1 THEN ':8080' ELSE '' END)
           || (CASE doc_id % 5
                 WHEN 0 THEN '/a/c' || (doc_id % 11)
                 WHEN 1 THEN '/~dir/p' || (doc_id % 11)
                 WHEN 2 THEN '/'
                 WHEN 3 THEN '/x//y' || (doc_id % 11) || '/'
                 ELSE '/p' || (doc_id % 11) END)
           || (CASE doc_id % 6
                 WHEN 0 THEN '?a=1&b=2'
                 WHEN 2 THEN '?y=2&z=A'
                 WHEN 4 THEN '?a=%2F&flag'
                 WHEN 5 THEN '?k' || (doc_id % 9) || '=v'
                 ELSE '' END) AS url_canon,
           'site' || (doc_id % 7) ||
             (CASE doc_id % 3 WHEN 0 THEN '.co.uk'
                WHEN 1 THEN '.com' ELSE '.org' END) AS domain
         FROM documents""",

    "tx52_script_mix" ->
      """WITH p AS (SELECT doc_id,
           CASE doc_id % 4
             WHEN 1 THEN translate(lower(text), 'aeoc', '\u0430\u0435\u043e\u0441')
             WHEN 2 THEN translate(lower(text), 'aeot', '\u03b1\u03b5\u03bf\u03c4')
             WHEN 0 THEN translate(lower(text), 'a', '\u0430')
             ELSE lower(text) END AS t
         FROM documents),
         c AS (SELECT doc_id,
             len(regexp_extract_all(t, '[A-Za-z]'))::INT AS n_latin,
             len(regexp_extract_all(t, '[\u0400-\u04ff]'))::INT AS n_cyrillic,
             len(regexp_extract_all(t, '[\u0370-\u03ff]'))::INT AS n_greek,
             len(regexp_extract_all(t, '[0-9]'))::INT AS n_digit
           FROM p)
         SELECT doc_id, n_latin, n_cyrillic, n_greek, n_digit,
           CASE WHEN greatest(n_latin, n_cyrillic, n_greek) = 0 THEN 'none'
                WHEN n_latin = greatest(n_latin, n_cyrillic, n_greek)
                  THEN 'latin'
                WHEN n_cyrillic = greatest(n_latin, n_cyrillic, n_greek)
                  THEN 'cyrillic'
                ELSE 'greek' END AS dominant,
           ((CASE WHEN n_latin > 0 THEN 1 ELSE 0 END) +
            (CASE WHEN n_cyrillic > 0 THEN 1 ELSE 0 END) +
            (CASE WHEN n_greek > 0 THEN 1 ELSE 0 END)) >= 2 AS mixed
         FROM c""",
    // the identical RE2-subset pipeline, stage by stage: block removal,
    // tag strip, entity decode (&amp; last), whitespace collapse
    "tx51_html_extract" ->
      """WITH h AS (SELECT doc_id,
           '<html><head><title>Doc ' || doc_id::VARCHAR
           || '</title><style>body { margin: 0; }</style></head><body><h1>Doc '
           || doc_id::VARCHAR || '</h1>' || chr(10) || '<p>' || text
           || ' &amp; tail &lt;' || doc_id::VARCHAR
           || '&gt;&nbsp;end</p><script>var a = ' || doc_id::VARCHAR
           || ';</script>' || chr(9)
           || '<div class="nav">footer &amp; nav</div></body></html>' AS html
         FROM documents),
         s1 AS (SELECT doc_id, regexp_replace(html,
           '(?s)<script[^>]*>.*?</script>', ' ', 'g') AS t FROM h),
         s2 AS (SELECT doc_id, regexp_replace(t,
           '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM s1),
         s3 AS (SELECT doc_id, regexp_replace(t,
           '<[^>]*>', ' ', 'g') AS t FROM s2),
         s4 AS (SELECT doc_id,
           replace(replace(replace(replace(replace(replace(t,
             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
             '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS t FROM s3),
         s5 AS (SELECT doc_id, trim(regexp_replace(t,
           '[ ' || chr(9) || chr(10) || chr(13) || ']+', ' ', 'g')) AS t
         FROM s4)
         SELECT doc_id, t AS extracted, length(t)::INT AS n_extracted
         FROM s5""",
    // tx56: the full crawl→text chain replayed — mm33's extraction CTE
    // restricted to parseable WARCs feeds tx3's language scores, tx29's
    // integer quality rules, and dd20's first-occurrence interval merge
    // (minTokens 6), one SELECT at the end
    "tx56_warc_pipeline" ->
      s"""WITH h AS (SELECT doc_id,
           '<html><head><title>Doc ' || doc_id::VARCHAR
           || '</title><style>body { margin: 0; }</style></head><body><h1>Doc '
           || doc_id::VARCHAR || '</h1>' || chr(10) || '<p>' || text
           || ' &amp; tail &lt;' || doc_id::VARCHAR
           || '&gt;&nbsp;end</p><script>var a = ' || doc_id::VARCHAR
           || ';</script>' || chr(9)
           || '<div class="nav">footer &amp; nav</div></body></html>' AS html
         FROM documents
         WHERE doc_id % 13 <> 0 AND doc_id % 17 <> 0),
         s1 AS (SELECT doc_id, regexp_replace(html,
           '(?s)<script[^>]*>.*?</script>', ' ', 'g') AS t FROM h),
         s2 AS (SELECT doc_id, regexp_replace(t,
           '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM s1),
         s3 AS (SELECT doc_id, regexp_replace(t,
           '<[^>]*>', ' ', 'g') AS t FROM s2),
         s4 AS (SELECT doc_id,
           replace(replace(replace(replace(replace(replace(t,
             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
             '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS t FROM s3),
         base AS (SELECT doc_id, trim(regexp_replace(t,
           '[ ' || chr(9) || chr(10) || chr(13) || ']+', ' ', 'g')) AS text
         FROM s4),
         lang AS (SELECT doc_id,
             CASE WHEN se >= ss AND se >= sd AND se >= sf THEN 'en'
                  WHEN ss >= sd AND ss >= sf THEN 'es'
                  WHEN sd >= sf THEN 'de'
                  ELSE 'fr' END AS lang
           FROM (SELECT doc_id,
               len(list_filter(string_split(text,' '),
                 w -> w IN ('the','and','of','is','with'))) AS se,
               len(list_filter(string_split(text,' '),
                 w -> w IN ('el','la','de','que','los'))) AS ss,
               len(list_filter(string_split(text,' '),
                 w -> w IN ('der','die','das','und','nicht'))) AS sd,
               len(list_filter(string_split(text,' '),
                 w -> w IN ('le','les','et','est','une'))) AS sf
             FROM base)),
         gw AS (SELECT doc_id, text,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE string_split_regex(trim(text), '\\s+')
             END AS words
           FROM base),
         gc AS (SELECT doc_id,
             len(words)::INT AS n_words,
             coalesce(list_sum(list_transform(words,
               x -> length(x)::BIGINT)), 0)::BIGINT AS wc,
             (length(text) - length(replace(text, '#', '')))::BIGINT AS nh,
             ((length(text) - length(replace(text, '...', ''))) / 3)
               ::BIGINT AS ne,
             len(list_filter(words,
               x -> regexp_matches(x, '[A-Za-z]')))::BIGINT AS na,
             len(list_filter(words,
               x -> lower(x) IN ($stop)))::BIGINT AS ns
           FROM gw),
         gop AS (SELECT doc_id, n_words,
             (n_words >= 50 AND n_words <= 100000)
               AND (wc >= 3 * n_words AND wc <= 10 * n_words)
               AND (10 * (nh + ne) < n_words)
               AND (10 * na >= 8 * n_words)
               AND ns >= 2 AS keep
           FROM gc),
         ww AS (SELECT doc_id, string_split(text, ' ') AS w FROM base),
         g AS (SELECT doc_id, u.p AS p, u.g AS gram FROM (
             SELECT doc_id,
               unnest([{'p': i - 1,
                        'g': array_to_string(w[i:i+5], ' ')}
                       for i in range(1, len(w) - 4)]) AS u
             FROM ww)),
         f AS (SELECT gram, min(doc_id * 1000000 + p) AS fk
               FROM g GROUP BY gram),
         m AS (SELECT doc_id, p FROM g JOIN f USING (gram)
               WHERE doc_id * 1000000 + p <> fk),
         r AS (SELECT doc_id, p,
                 CASE WHEN lag(p) OVER (PARTITION BY doc_id ORDER BY p)
                        IS NULL
                      OR p - lag(p) OVER (PARTITION BY doc_id ORDER BY p)
                        > 6
                      THEN 1 ELSE 0 END AS st
               FROM m),
         rr AS (SELECT doc_id, p,
                  sum(st) OVER (PARTITION BY doc_id ORDER BY p
                                ROWS UNBOUNDED PRECEDING) AS rid
                FROM r),
         runs AS (SELECT doc_id, rid, min(p) AS s, max(p) + 6 AS e
                  FROM rr GROUP BY doc_id, rid),
         st AS (SELECT doc_id, count(*)::BIGINT AS dup_runs,
                  sum(e - s)::BIGINT AS dup_tokens
                FROM runs GROUP BY doc_id)
         SELECT base.doc_id, length(base.text)::INT AS n_extracted,
           lang.lang, gop.n_words, gop.keep,
           coalesce(st.dup_tokens, 0)::BIGINT AS dup_tokens,
           coalesce(st.dup_runs, 0)::BIGINT AS dup_runs
         FROM base
         JOIN lang ON base.doc_id = lang.doc_id
         JOIN gop ON base.doc_id = gop.doc_id
         LEFT JOIN st ON base.doc_id = st.doc_id""",
    "tx50_decontaminate_evasive" ->
      """WITH train AS (SELECT doc_id,
                CASE WHEN doc_id % 3 = 0
                     THEN text || ' alpha beta gamma delta epsilon'
                     ELSE text END AS text
              FROM documents WHERE source <> 'src0'),
         evald AS (SELECT text FROM documents WHERE source = 'src0'
                   UNION ALL SELECT 'alpha beta gamma delta epsilon'),
         ev0 AS (SELECT
                  unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                          for i in range(1, len(w)-1)]) AS g
                FROM (SELECT string_split(text,' ') AS w FROM evald)
                WHERE len(w) >= 3),
         ev AS (SELECT DISTINCT md5(g) AS g FROM ev0),
         tww AS (SELECT doc_id, string_split(text,' ') AS w FROM train),
         tw AS (SELECT doc_id, generate_subscripts(w,1) - 1 AS i,
                  unnest(w) AS word FROM tww),
         tg AS (SELECT doc_id, generate_subscripts(g,1) - 1 AS i,
                  unnest(g) AS gram
                FROM (SELECT doc_id,
                        [w[j] || ' ' || w[j+1] || ' ' || w[j+2]
                         for j in range(1, len(w)-1)] AS g
                      FROM tww WHERE len(w) >= 3)),
         hits AS (SELECT DISTINCT tg.doc_id, tg.i
                  FROM tg JOIN ev ON md5(tg.gram) = ev.g),
         cov AS (SELECT DISTINCT doc_id, i + o AS i
                 FROM hits CROSS JOIN (SELECT unnest(range(0,3)) AS o) os),
         kept AS (SELECT tw.doc_id, tw.i, tw.word
                  FROM tw LEFT JOIN cov
                    ON cov.doc_id = tw.doc_id AND cov.i = tw.i
                  WHERE cov.doc_id IS NULL),
         ka AS (SELECT doc_id,
                  string_agg(word, ' ' ORDER BY i) AS clean_text,
                  count(*) AS n_kept
                FROM kept GROUP BY doc_id)
         SELECT t.doc_id,
           len(string_split(t.text,' '))::BIGINT AS n_words,
           (len(string_split(t.text,' ')) - coalesce(ka.n_kept, 0))::BIGINT
             AS n_removed,
           md5(coalesce(ka.clean_text, '')) AS clean_fp
         FROM train t LEFT JOIN ka ON ka.doc_id = t.doc_id""",

    // pair expansion on the distinct-word table (vocab-sized), corpus
    // read once by the word agg; (n desc, pair asc) is a total order so
    // the LIMIT boundary is deterministic cross-engine
    "tx36_bpe_pairs" ->
      """WITH u AS (SELECT unnest(regexp_extract_all(lower(text),
                      '[a-z]+')) AS w FROM documents),
         words AS (SELECT w, count(*) AS wf FROM u GROUP BY w),
         p AS (SELECT unnest(list_transform(range(1, length(w)),
                        i -> substr(w, i, 2))) AS pair, wf
               FROM words WHERE length(w) >= 2)
         SELECT pair, sum(wf)::BIGINT AS n FROM p GROUP BY pair
         ORDER BY n DESC, pair LIMIT 50""",
    // three unrolled merge iterations: per round, pair counts over the
    // space-separated symbol strings, scalar-subquery top merge
    // ((n desc, pair asc) total order), literal space-bounded replace
    // rewrite — sentinel spaces make non-overlapping left-to-right
    // replace coincide with BPE's leftmost-first merge in both engines
    "tx37_bpe_learn" ->
      """WITH u AS (SELECT unnest(regexp_extract_all(lower(text),
                      '[a-z]+')) AS w FROM documents),
         words AS (SELECT w, count(*) AS wf FROM u GROUP BY w),
         v0 AS (SELECT '  ' || array_to_string(
                  regexp_extract_all(w, '[a-z]'), '  ') || '  ' AS sym, wf
                FROM words),
         p1 AS (SELECT unnest(list_transform(range(1, len(s)),
                  i -> s[i] || ' ' || s[i+1])) AS pair, wf
                FROM (SELECT string_split(trim(sym), '  ') AS s, wf
                      FROM v0) WHERE len(s) >= 2),
         c1 AS (SELECT pair, sum(wf)::BIGINT AS n FROM p1 GROUP BY pair),
         m1 AS (SELECT pair, n, 1 AS rank FROM c1
                ORDER BY n DESC, pair LIMIT 1),
         v1 AS (SELECT replace(sym,
                  ' ' || replace((SELECT pair FROM m1), ' ', '  ') || ' ',
                  ' ' || replace((SELECT pair FROM m1), ' ', '') || ' ')
                  AS sym, wf FROM v0),
         p2 AS (SELECT unnest(list_transform(range(1, len(s)),
                  i -> s[i] || ' ' || s[i+1])) AS pair, wf
                FROM (SELECT string_split(trim(sym), '  ') AS s, wf
                      FROM v1) WHERE len(s) >= 2),
         c2 AS (SELECT pair, sum(wf)::BIGINT AS n FROM p2 GROUP BY pair),
         m2 AS (SELECT pair, n, 2 AS rank FROM c2
                ORDER BY n DESC, pair LIMIT 1),
         v2 AS (SELECT replace(sym,
                  ' ' || replace((SELECT pair FROM m2), ' ', '  ') || ' ',
                  ' ' || replace((SELECT pair FROM m2), ' ', '') || ' ')
                  AS sym, wf FROM v1),
         p3 AS (SELECT unnest(list_transform(range(1, len(s)),
                  i -> s[i] || ' ' || s[i+1])) AS pair, wf
                FROM (SELECT string_split(trim(sym), '  ') AS s, wf
                      FROM v2) WHERE len(s) >= 2),
         c3 AS (SELECT pair, sum(wf)::BIGINT AS n FROM p3 GROUP BY pair),
         m3 AS (SELECT pair, n, 3 AS rank FROM c3
                ORDER BY n DESC, pair LIMIT 1)
         SELECT rank, pair, n FROM (SELECT * FROM m1 UNION ALL
           SELECT * FROM m2 UNION ALL SELECT * FROM m3) ORDER BY rank""",
    // the tx37 merge chain carried per-word (w kept through v0..v3),
    // then one word join back to the doc stream; inner-join semantics
    // (docs with no extractable word absent) mirror the operator
    "tx39_bpe_tokenize" ->
      """WITH u AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),
                      '[a-z]+')) AS w FROM documents),
         words AS (SELECT w, count(*) AS wf FROM u GROUP BY w),
         v0 AS (SELECT w, '  ' || array_to_string(
                  regexp_extract_all(w, '[a-z]'), '  ') || '  ' AS sym, wf
                FROM words),
         p1 AS (SELECT unnest(list_transform(range(1, len(s)),
                  i -> s[i] || ' ' || s[i+1])) AS pair, wf
                FROM (SELECT string_split(trim(sym), '  ') AS s, wf
                      FROM v0) WHERE len(s) >= 2),
         c1 AS (SELECT pair, sum(wf)::BIGINT AS n FROM p1 GROUP BY pair),
         m1 AS (SELECT pair FROM c1 ORDER BY n DESC, pair LIMIT 1),
         v1 AS (SELECT w, replace(sym,
                  ' ' || replace((SELECT pair FROM m1), ' ', '  ') || ' ',
                  ' ' || replace((SELECT pair FROM m1), ' ', '') || ' ')
                  AS sym, wf FROM v0),
         p2 AS (SELECT unnest(list_transform(range(1, len(s)),
                  i -> s[i] || ' ' || s[i+1])) AS pair, wf
                FROM (SELECT string_split(trim(sym), '  ') AS s, wf
                      FROM v1) WHERE len(s) >= 2),
         c2 AS (SELECT pair, sum(wf)::BIGINT AS n FROM p2 GROUP BY pair),
         m2 AS (SELECT pair FROM c2 ORDER BY n DESC, pair LIMIT 1),
         v2 AS (SELECT w, replace(sym,
                  ' ' || replace((SELECT pair FROM m2), ' ', '  ') || ' ',
                  ' ' || replace((SELECT pair FROM m2), ' ', '') || ' ')
                  AS sym, wf FROM v1),
         p3 AS (SELECT unnest(list_transform(range(1, len(s)),
                  i -> s[i] || ' ' || s[i+1])) AS pair, wf
                FROM (SELECT string_split(trim(sym), '  ') AS s, wf
                      FROM v2) WHERE len(s) >= 2),
         c3 AS (SELECT pair, sum(wf)::BIGINT AS n FROM p3 GROUP BY pair),
         m3 AS (SELECT pair FROM c3 ORDER BY n DESC, pair LIMIT 1),
         v3 AS (SELECT w, replace(sym,
                  ' ' || replace((SELECT pair FROM m3), ' ', '  ') || ' ',
                  ' ' || replace((SELECT pair FROM m3), ' ', '') || ' ')
                  AS sym, wf FROM v2),
         sc AS (SELECT w, len(string_split(trim(sym), '  '))::BIGINT
                  AS n_sym FROM v3)
         SELECT doc_id, sum(n_sym)::BIGINT AS n_bpe_tokens,
           count(*)::BIGINT AS n_words
         FROM u JOIN sc USING (w) GROUP BY doc_id""",
    // tx39's merge chain, but emitting the ordered token stream:
    // positional unnest (generate_subscripts zips with unnest, the ss8
    // idiom) + per-word token string + ordered string_agg
    "tx44_bpe_sequences" ->
      """WITH u AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),
                      '[a-z]+')) AS w,
                      generate_subscripts(regexp_extract_all(lower(text),
                        '[a-z]+'), 1) AS pos
                    FROM documents),
         words AS (SELECT w, count(*) AS wf FROM u GROUP BY w),
         v0 AS (SELECT w, '  ' || array_to_string(
                  regexp_extract_all(w, '[a-z]'), '  ') || '  ' AS sym, wf
                FROM words),
         p1 AS (SELECT unnest(list_transform(range(1, len(s)),
                  i -> s[i] || ' ' || s[i+1])) AS pair, wf
                FROM (SELECT string_split(trim(sym), '  ') AS s, wf
                      FROM v0) WHERE len(s) >= 2),
         c1 AS (SELECT pair, sum(wf)::BIGINT AS n FROM p1 GROUP BY pair),
         m1 AS (SELECT pair FROM c1 ORDER BY n DESC, pair LIMIT 1),
         v1 AS (SELECT w, replace(sym,
                  ' ' || replace((SELECT pair FROM m1), ' ', '  ') || ' ',
                  ' ' || replace((SELECT pair FROM m1), ' ', '') || ' ')
                  AS sym, wf FROM v0),
         p2 AS (SELECT unnest(list_transform(range(1, len(s)),
                  i -> s[i] || ' ' || s[i+1])) AS pair, wf
                FROM (SELECT string_split(trim(sym), '  ') AS s, wf
                      FROM v1) WHERE len(s) >= 2),
         c2 AS (SELECT pair, sum(wf)::BIGINT AS n FROM p2 GROUP BY pair),
         m2 AS (SELECT pair FROM c2 ORDER BY n DESC, pair LIMIT 1),
         v2 AS (SELECT w, replace(sym,
                  ' ' || replace((SELECT pair FROM m2), ' ', '  ') || ' ',
                  ' ' || replace((SELECT pair FROM m2), ' ', '') || ' ')
                  AS sym, wf FROM v1),
         p3 AS (SELECT unnest(list_transform(range(1, len(s)),
                  i -> s[i] || ' ' || s[i+1])) AS pair, wf
                FROM (SELECT string_split(trim(sym), '  ') AS s, wf
                      FROM v2) WHERE len(s) >= 2),
         c3 AS (SELECT pair, sum(wf)::BIGINT AS n FROM p3 GROUP BY pair),
         m3 AS (SELECT pair FROM c3 ORDER BY n DESC, pair LIMIT 1),
         v3 AS (SELECT w, replace(sym,
                  ' ' || replace((SELECT pair FROM m3), ' ', '  ') || ' ',
                  ' ' || replace((SELECT pair FROM m3), ' ', '') || ' ')
                  AS sym, wf FROM v2),
         sc AS (SELECT w, replace(trim(sym), '  ', ' ') AS toks,
                  len(string_split(trim(sym), '  '))::BIGINT AS n_sym
                FROM v3)
         SELECT doc_id,
           string_agg(toks, ' ' ORDER BY pos) AS bpe_tokens,
           sum(n_sym)::BIGINT AS n_tokens
         FROM u JOIN sc USING (w) GROUP BY doc_id""",
    // distinct (source, gram-digest) built once — md5 mirrors the
    // operator's no-text-in-shuffles keying, so even a digest collision
    // replays identically; jaccard is a raw IEEE division of exact
    // integers — no round() to hit a decimal tie
    "tx38_source_overlap" ->
      """WITH g0 AS (SELECT source,
                      unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              for i in range(1, len(w)-1)]) AS g
                    FROM (SELECT source, string_split(text, ' ') AS w
                          FROM documents)
                    WHERE len(w) >= 3),
         g AS (SELECT DISTINCT source, md5(g) AS g FROM g0),
         s AS (SELECT source, count(*) AS nv FROM g GROUP BY source),
         i AS (SELECT a.source AS sa, b.source AS sb, count(*) AS inter
               FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
               GROUP BY 1, 2)
         SELECT sa, sb, inter, x.nv AS na, y.nv AS nb,
           inter::DOUBLE / (x.nv + y.nv - inter) AS jaccard
         FROM i JOIN s x ON x.source = i.sa
           JOIN s y ON y.source = i.sb""",
    // tx27's exact arithmetic (no tf floor), per-term score quantized
    // to an integer BEFORE the per-query sum — the aggregate is an
    // exact BIGINT, immune to double addition order; ranking replays
    // the heap operator's (score desc, doc_id asc) contract
    "tx34_bm25_retrieval" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                    FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf
                FROM t GROUP BY doc_id, term),
         dfq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term),
         dl AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS dl
                FROM documents),
         sc AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE AS sumdl
                FROM dl),
         bm AS (SELECT doc_id, term,
                  round(round(ln((n - df_t + 0.5) / (df_t + 0.5) + 1.0) *
                              (tf * (1.2 + 1.0)) /
                              (tf + 1.2 * (1.0 - 0.75 +
                                           0.75 * dl / (sumdl / n))), 4)
                        * 10000)::BIGINT AS sx
                FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id)
                CROSS JOIN sc),
         q(query_id, term) AS (VALUES $retrievalValuesSql),
         pd AS (SELECT query_id, doc_id, sum(sx)::BIGINT AS score_x1e4
                FROM bm JOIN q USING (term) GROUP BY query_id, doc_id)
         SELECT query_id, doc_id, score_x1e4, rk FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY score_x1e4 DESC, doc_id ASC)::INT AS rk FROM pd)
         WHERE rk <= 10""",
    "tx30_vocab_coverage" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS term
                    FROM documents),
         c AS (SELECT term, count(*) AS term_count FROM t GROUP BY term),
         tot AS (SELECT sum(term_count)::DOUBLE AS total FROM c),
         top AS (SELECT term, term_count FROM c
                 ORDER BY term_count DESC, term ASC LIMIT 100)
         SELECT row_number() OVER (ORDER BY term_count DESC, term ASC)
                  AS rank,
           term, term_count,
           round(sum(term_count) OVER (ORDER BY term_count DESC, term ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / total, 4) AS cum_coverage
         FROM top CROSS JOIN tot""",
    "tx31_oov_rate" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                    FROM documents),
         c AS (SELECT term, count(*) AS term_count FROM t GROUP BY term),
         v AS (SELECT term FROM c
               ORDER BY term_count DESC, term ASC LIMIT 100)
         SELECT doc_id, count(*) AS n_tokens,
           sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_oov,
           round(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 4) AS oov_rate
         FROM t LEFT JOIN v ON t.term = v.term
         GROUP BY doc_id""",
    "tx33_dsir" ->
      """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w
                    FROM documents),
         g AS (SELECT doc_id, source, unnest(w) AS g FROM w
               UNION ALL
               SELECT doc_id, source,
                 unnest([w[i] || ' ' || w[i+1]
                         for i in range(1, len(w))]) AS g
               FROM w WHERE len(w) >= 2),
         bk AS (SELECT doc_id, source,
                  ('0x' || substr(md5('dsir_' || g), 1, 8))::UBIGINT
                    % 1024 AS b
                FROM g),
         rawd AS (SELECT b, count(*) AS n_raw FROM bk
                  WHERE source <> 'src0' GROUP BY b),
         tgtd AS (SELECT b, count(*) AS n_tgt FROM bk
                  WHERE source = 'src0' GROUP BY b),
         tr AS (SELECT sum(n_raw)::DOUBLE AS tr FROM rawd),
         tt AS (SELECT sum(n_tgt)::DOUBLE AS tt FROM tgtd),
         ratio AS (SELECT coalesce(rawd.b, tgtd.b) AS b,
             ln((coalesce(n_tgt, 0) + 0.5) / (tt + 0.5 * 1024)) -
             ln((coalesce(n_raw, 0) + 0.5) / (tr + 0.5 * 1024)) AS lr
           FROM rawd FULL JOIN tgtd ON rawd.b = tgtd.b
           CROSS JOIN tr CROSS JOIN tt),
         db AS (SELECT doc_id, b, count(*) AS c FROM bk
                WHERE source <> 'src0' GROUP BY doc_id, b)
         SELECT doc_id, sum(c)::BIGINT AS n_grams,
           round(sum(c * lr), 4) AS log_w
         FROM db JOIN ratio USING (b)
         GROUP BY doc_id""",
    "tx32_shard_manifest" ->
      """WITH s AS (SELECT doc_id,
             len(string_split(text, ' '))::BIGINT AS n_tokens,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT % 16
               AS shard,
             md5(doc_id::VARCHAR) AS h
           FROM documents),
         r AS (SELECT *, row_number() OVER
                 (PARTITION BY shard ORDER BY h ASC, doc_id ASC) AS rk
               FROM s)
         SELECT shard::BIGINT AS shard, count(*) AS n_docs,
           sum(n_tokens)::BIGINT AS n_weight,
           bit_xor(('0x' || substr(md5(doc_id::VARCHAR || ':' ||
                      rk::VARCHAR), 1, 8))::UBIGINT)::BIGINT AS fp
         FROM r GROUP BY shard""",
    "tx20_tfidf" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                    FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf
                FROM t GROUP BY doc_id, term),
         dfq AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term),
         n AS (SELECT count(*)::DOUBLE AS n FROM documents)
         SELECT doc_id, term, tf, df_t,
           round(tf * ln(n / df_t), 4) AS tfidf
         FROM tf JOIN dfq USING (term) CROSS JOIN n
         WHERE tf >= 3""",
    "tx21_lm_score" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                    FROM documents),
         m AS (SELECT term, count(*)::DOUBLE AS cnt FROM t GROUP BY term),
         tot AS (SELECT sum(cnt) AS tt FROM m)
         SELECT doc_id, count(*) AS n_tokens,
           round(-avg(ln(cnt / tt) / ln(2)), 4) AS cross_entropy
         FROM t JOIN m USING (term) CROSS JOIN tot
         GROUP BY doc_id""",
    "tx25_sql_surface" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split_regex(text, '')) AS c
                     FROM documents WHERE length(text) > 0),
         f AS (SELECT doc_id, c, count(*)::DOUBLE AS cnt
               FROM ch GROUP BY doc_id, c),
         t AS (SELECT doc_id, sum(cnt) AS n FROM f GROUP BY doc_id),
         ent AS (SELECT f.doc_id,
                   round(-sum((cnt / n) * ln(cnt / n) / ln(2)) + 0, 4)
                     AS char_entropy
                 FROM f JOIN t USING (doc_id) GROUP BY f.doc_id),
         sh AS (SELECT doc_id,
                  count(DISTINCT s) AS n_shingles FROM (
                    SELECT doc_id,
                      unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                              for i in range(1, len(w)-1)]) AS s
                    FROM (SELECT doc_id, string_split(text, ' ') AS w
                          FROM documents WHERE length(text) > 0)
                    WHERE len(w) >= 3)
                GROUP BY doc_id)
         SELECT ent.doc_id, char_entropy, n_shingles
         FROM ent JOIN sh USING (doc_id)""",
    "tx26_lm_bigram" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
                    FROM documents),
         bg AS (SELECT doc_id,
                  unnest([w[i] || ' ' || w[i+1]
                          for i in range(1, len(w))]) AS bigram
                FROM w WHERE len(w) >= 2),
         bi AS (SELECT bigram, count(*) AS n_ab FROM bg GROUP BY bigram),
         u AS (SELECT unnest(w) AS t FROM w),
         uni AS (SELECT t, count(*) AS n_w FROM u GROUP BY t),
         tot AS (SELECT sum(n_w)::DOUBLE AS tu FROM uni)
         SELECT doc_id, count(*) AS n_bigrams,
           round(-avg(ln(0.9 * (bi.n_ab::DOUBLE / ua.n_w) +
                         0.1 * (ub.n_w / tu)) / ln(2)), 4)
             AS cross_entropy
         FROM bg
         JOIN bi USING (bigram)
         JOIN uni ua ON ua.t = string_split(bigram, ' ')[1]
         JOIN uni ub ON ub.t = string_split(bigram, ' ')[2]
         CROSS JOIN tot
         GROUP BY doc_id""",
    "tx22_pmi" ->
      """WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
         u AS (SELECT unnest(w) AS t FROM w),
         uni AS (SELECT t, count(*) AS n_w FROM u GROUP BY t),
         bg AS (SELECT unnest([w[i] || ' ' || w[i+1]
                               for i in range(1, len(w))]) AS bigram
                FROM w WHERE len(w) >= 2),
         bi AS (SELECT bigram, count(*) AS n_ab FROM bg GROUP BY bigram),
         tu AS (SELECT sum(n_w)::DOUBLE AS tu FROM uni),
         tb AS (SELECT sum(n_ab)::DOUBLE AS tb FROM bi)
         SELECT bigram, n_ab, a.n_w AS n_a, b.n_w AS n_b,
           -- + 0 normalizes IEEE -0.0 (Spark's BigDecimal round never
           -- emits a negative zero)
           round(ln((n_ab / tb) /
                    ((a.n_w / tu) * (b.n_w / tu))), 4) + 0 AS pmi
         FROM bi
         JOIN uni a ON a.t = string_split(bigram, ' ')[1]
         JOIN uni b ON b.t = string_split(bigram, ' ')[2]
         CROSS JOIN tu CROSS JOIN tb
         WHERE n_ab >= 20""",
    "tx10_repetition" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
         base AS (SELECT doc_id, len(w)::INT AS n_words,
                    round(1 - len(list_distinct(w))::DOUBLE / len(w), 4)
                      AS dup_word_ratio
                  FROM s WHERE len(w) >= 2),
         bg AS (SELECT doc_id,
                  unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS b
                FROM s WHERE len(w) >= 2),
         c AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY doc_id, b),
         t AS (SELECT doc_id, max(n) AS top_bigram_n,
                 sum(n)::BIGINT AS n_bigrams
               FROM c GROUP BY doc_id)
         SELECT base.doc_id, n_words, dup_word_ratio, top_bigram_n,
           n_bigrams,
           round(top_bigram_n::DOUBLE / n_bigrams, 4) AS top_bigram_frac
         FROM base JOIN t ON base.doc_id = t.doc_id""",
    "tx11_redact" ->
      """SELECT doc_id,
           len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
           len(regexp_extract_all(text, '[0-9]{3,}')) AS n_long_nums,
           md5(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '[0-9]{3,}', '<NUM>', 'g')) AS redacted_fp
         FROM documents""",
    "tx12_top_terms" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS term
                    FROM documents),
         c AS (SELECT source, term, count(*) AS n
               FROM t GROUP BY source, term)
         SELECT source, term, n, rk FROM (
           SELECT source, term, n,
             row_number() OVER (PARTITION BY source
                                ORDER BY n DESC, term ASC)::INT AS rk
           FROM c)
         WHERE rk <= 5""",
    "tx13_packing" ->
      """WITH t AS (
           SELECT source, doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END::INT
               AS n_tokens
           FROM documents),
         c AS (SELECT source, doc_id, n_tokens,
                 sum(n_tokens) OVER (PARTITION BY source
                                     ORDER BY doc_id)::BIGINT AS cum
               FROM t)
         SELECT source, doc_id, n_tokens, cum,
           ((cum - n_tokens) // 512)::INT AS bin
         FROM c""",
    "tx23_pack_sequences" ->
      """WITH t AS (
           SELECT source, doc_id, text,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END::INT
               AS n_tokens
           FROM documents),
         c AS (SELECT source, doc_id, text, n_tokens,
                 sum(n_tokens) OVER (PARTITION BY source
                                     ORDER BY doc_id)::BIGINT AS cum
               FROM t),
         b AS (SELECT source, doc_id, text, n_tokens,
                 ((cum - n_tokens) // 512)::INT AS bin FROM c)
         SELECT source, bin, count(*) AS n_docs,
           sum(n_tokens)::BIGINT AS seq_tokens,
           md5(string_agg(text, ' <|eod|> ' ORDER BY doc_id)) AS seq_fp
         FROM b GROUP BY source, bin""",
    "tx24_quantile_filter" ->
      s"""WITH q AS (
            SELECT d.lang, d.doc_id,
              round(len(list_filter(string_split(d.text, ' '),
                                    w -> w IN ($stop)))::DOUBLE /
                    greatest(len(string_split(d.text, ' ')), 1), 4)
                AS stopword_ratio
            FROM documents d),
          r AS (SELECT lang, doc_id, stopword_ratio,
                  round(percent_rank() OVER (PARTITION BY lang
                    ORDER BY stopword_ratio DESC, doc_id ASC), 6) AS pr
                FROM q)
          SELECT lang, doc_id, stopword_ratio, pr FROM r
          WHERE pr <= 0.3""",
    "tx14_kmv_distinct" ->
      """WITH h AS (
           SELECT DISTINCT source,
             ('0x' || substr(md5(text), 1, 15))::UBIGINT::BIGINT AS h
           FROM documents),
         r AS (SELECT source, h,
                 row_number() OVER (PARTITION BY source ORDER BY h) AS rk
               FROM h),
         k AS (SELECT source, count(*) AS n_kept, max(h) AS hk
               FROM r WHERE rk <= 16 GROUP BY source)
         SELECT source, n_kept,
           CASE WHEN n_kept < 16 THEN n_kept::DOUBLE
                ELSE round(15.0 / (hk / 1152921504606846976.0), 2)
           END AS est_distinct
         FROM k""",
    "tx6_curation" ->
      s"""WITH q AS (
            SELECT doc_id FROM documents
            WHERE len(string_split(text, ' ')) >= 25
              AND len(list_filter(string_split(text, ' '),
                                  w -> w IN ($stop))) > 0
          ), kept AS (
            SELECT d.* FROM documents d JOIN q USING (doc_id)
          ), ids AS (
            SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)
          )
          SELECT lang, count(*) AS n_docs,
            round(avg(n_chars), 2) AS avg_chars
          FROM kept JOIN ids USING (doc_id)
          GROUP BY lang""",

    // the canonical key reconstructed ANALYTICALLY from the planted
    // rule, never by normalizing: classes {1 NFC-cased, 2 NFD} must
    // land on base || ' caf' || chr(233) (U+00E9, the NFC composition)
    // and classes {0 ascii, 3 full-width, 4 homoglyph} on
    // base || ' cafe' — so a single mis-normalized codepoint on the
    // Spark side shifts a key and breaks the hash; raw-byte groups are
    // exactly (base, class) since every class suffix is byte-distinct
    "tx48_unicode_norm" ->
      """WITH p AS (
           SELECT doc_id,
             lower(substring(text, 1, 40)) AS base,
             doc_id % 5 AS cls
           FROM documents),
         k AS (
           SELECT doc_id, base, cls,
             base || CASE WHEN cls IN (1, 2) THEN ' caf' || chr(233)
                          ELSE ' cafe' END AS norm_key
           FROM p)
         SELECT doc_id, norm_key,
           count(*) OVER (PARTITION BY norm_key) AS twins,
           count(*) OVER (PARTITION BY base, cls) AS raw_twins
         FROM k""",

    // dd2's signature pipeline over TWO ASCII copies of every doc —
    // what the salted homoglyph corpus must reduce to under a correct
    // canonicalizer; no normalization happens here by design
    "tx49_norm_neardup" ->
      """WITH c AS (SELECT doc_id, text FROM documents
                    UNION ALL SELECT doc_id + 20000, text FROM documents),
         s AS (SELECT doc_id, string_split(text, ' ') w FROM c),
         sh AS (SELECT doc_id,
                  unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                        for i in range(1, len(w)-1)])) AS s
                FROM s WHERE len(w) >= 3),
         xh AS (SELECT doc_id,
                  (('0x' || substr(md5(s), 1, 15))::UBIGINT % 2147483647)::BIGINT AS x
                FROM sh),
         sig AS (SELECT doc_id, i,
                   min(((i*1000003 + 12345) * x + i*999983 + 54321) % 2147483647) AS mh
                 FROM xh CROSS JOIN (SELECT unnest(range(0,16)) AS i) perms
                 GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // 4 AS band,
                     md5(string_agg(mh::VARCHAR, '|' ORDER BY i)) AS bh
                   FROM sig GROUP BY doc_id, i // 4)
         SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         FROM bands l JOIN bands r
           ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id"""
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.{BandIndexFixture, DedupOps}

/** Oracle-gated dedup operators on the `documents` corpus. Hash functions
  * are md5-based by design (DedupOps scaladoc) so the DuckDB oracle can
  * replay the exact signature pipeline.
  */
object DedupQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup over a corpus with synthetic duplicates (the corpus
    // itself has none): keep the min doc_id per distinct text. The
    // group key is md5(text), not text — at corpus scale the exchange
    // then carries 16-byte digests instead of documents (the partial
    // agg dedups map-side either way, but every distinct document
    // would still cross the wire whole). Both engines hash the same
    // bytes, so the digest key is result-identical, deterministically.
    "dd1_exact" -> ((s, d) => {
      val docs = documents(s, d).select("doc_id", "text")
      val dup = docs.select((col("doc_id") + 10000).as("doc_id"), col("text"))
      DedupOps.dedupExact(docs.unionByName(dup)
          .withColumn("_k", md5(col("text"))), Seq("_k"), "doc_id")
        .select("doc_id")
    }),

    // MinHash(16 arithmetic perms over one md5 base hash) + LSH(4 bands):
    // candidate duplicate pairs over 3-gram shingles.
    "dd2_minhash_lsh" -> ((s, d) => {
      DedupOps.minhashCandidates(documents(s, d), "doc_id", "text",
        shingleK = 3, numPerm = 16, bands = 4)
    }),

    // Incremental near-dup: band index persisted ONCE per JVM from the
    // standing corpus (source != src0, BandIndexFixture — the index is
    // an artifact like ss7's; Verify's pass or Bench's warmup pays the
    // build), then ONLY the new batch (src0) is banded and joined —
    // with the index side bloom-reduced by the batch's keys. The oracle
    // replays both sides' banding and the cross join.
    // BENCH-SEMANTICS NOTE (r5): the timed lane covers ingest only since
    // the fixture split; pre-r5 BENCH values for dd10 were
    // build-inclusive and are not comparable. The operative driver
    // baseline (BENCH_r05, 51.918 s) was recorded under the fixture
    // semantics — see BASELINE.md "dd10 semantics note".
    "dd10_incremental" -> ((s, d) => {
      val dir = BandIndexFixture.dir(s, d)
      DedupOps.dedupIncremental(
        documents(s, d).filter(col("source") === "src0"),
        dir, "doc_id", "text", shingleK = 3, numPerm = 16, bands = 4,
        immutable = true)
    }),

    // Cross-document span dedup (C4/RefinedWeb-style): 8-word windows,
    // globally-first occurrence survives, documents reassembled from
    // surviving spans. Corpus = documents plus an exact copy of each at
    // doc_id+10000 — every copy's spans dedup away (n_kept = 0).
    "dd11_span_dedup" -> ((s, d) => {
      val docs = documents(s, d).select("doc_id", "text")
      val dup = docs.select((col("doc_id") + 10000).as("doc_id"), col("text"))
      DedupOps.spanDedup(docs.unionByName(dup), "doc_id", "text",
        segWords = 8)
    }),

    // Variable-length exact-substring dedup (dd20, Lee-et-al-style):
    // dd11 covers fixed 8-word windows on fixed boundaries; this
    // catches a duplicated run at ANY offset and length ≥ 6. Plants:
    // a 10-token PREFIX on id%7=0 docs and a 12-token SUFFIX
    // boilerplate on id%5=0 docs — anchor 6-grams find both, and the
    // interval union reconstructs the full variable-length runs
    // (prefix → dup_tokens ≥ 10 from position 0, suffix → ≥ 12 at the
    // tail) in every doc except each plant's global first occurrence.
    "dd20_exact_substring" -> ((s, d) => {
      val planted = documents(s, d).select(col("doc_id"),
        concat(
          when(col("doc_id") % 7 === 0,
            lit("breaking news today market update report stocks " +
              "rally sharply higher ")).otherwise(lit("")),
          col("text"),
          when(col("doc_id") % 5 === 0,
            lit(" the quick brown fox jumps over the lazy dog " +
              "again and again")).otherwise(lit(""))).as("text"))
      DedupOps.exactSubstringStats(planted, "doc_id", "text",
        minTokens = 6)
    }),

    // Incremental exact-substring dedup (dd21): the src0 batch
    // ingested against the STANDING gram bank ([[SubstrBankFixture]]
    // — dd10's artifact discipline on the dd20 axis), generation-
    // ordered keep-first: every batch occurrence of a banked gram is
    // duplicated (batch id%2=0 docs re-carry the standing boilerplate
    // → class-a hits), batch-only grams keep their batch-internal
    // first (id%3=0 docs share a batch-only phrase the bank never saw
    // → class-b marks everywhere but the lowest batch id).
    "dd21_substr_incremental" -> ((s, d) => {
      val bank = graft.operators.SubstrBankFixture.dir(s, d)
      val boiler = graft.operators.SubstrBankFixture.Boilerplate
      val batch = documents(s, d).filter(col("source") === "src0")
        .select(col("doc_id"),
          concat(
            when(col("doc_id") % 3 === 0,
              lit("zeta eta theta iota kappa lambda mu nu "))
              .otherwise(lit("")),
            col("text"),
            when(col("doc_id") % 2 === 0, lit(" " + boiler))
              .otherwise(lit(""))).as("text"))
      DedupOps.exactSubstringStatsIncremental(batch, bank, "doc_id",
        "text", minTokens = 6, immutable = true)
    }),

    // Gram-novelty telemetry (dd22): the src0 batch's share of
    // never-banked 6-grams per doc — the second consumer of the dd21
    // bank (banking is only worth it when many probes amortize it).
    // Raw batch docs, no plants: natural cross-corpus overlap drives
    // the signal and the oracle replays it exactly.
    "dd22_gram_novelty" -> ((s, d) =>
      DedupOps.gramNoveltyReport(
        documents(s, d).filter(col("source") === "src0")
          .select(col("doc_id"), col("text")),
        graft.operators.SubstrBankFixture.dir(s, d), "doc_id", "text",
        minTokens = 6, immutable = true)),

    // Directional containment: corpus + 20-word excerpts of the first
    // 50 docs at doc_id+20000 — every excerpt is fully contained in its
    // source (containment 1.0) while symmetric Jaccard would miss it.
    // Shingle inverted index with a df<=20 posting-list cap.
    "dd12_containment" -> ((s, d) => {
      val docs = documents(s, d).select("doc_id", "text")
      val excerpts = docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 20000).as("doc_id"),
          array_join(slice(split(col("text"), " "), 1, 20), " ").as("text"))
      DedupOps.containmentPairs(docs.unionByName(excerpts), "doc_id",
        "text", k = 3, threshold = 0.8, maxDf = 20)
    }),

    // MinHash estimate vs ground truth per LSH candidate pair: the
    // md5-derived signatures make the ESTIMATES exactly replayable —
    // approximation error as deterministic data, not a tolerance band.
    "dd13_minhash_estimate" -> ((s, d) => {
      DedupOps.minhashEstimatePairs(documents(s, d), "doc_id", "text",
        shingleK = 3, numPerm = 16, bands = 4)
    }),

    // 16-bit SimHash per document from md5 hex-digit signs.
    "dd3_simhash" -> ((s, d) => {
      DedupOps.simhash16(documents(s, d), "doc_id", "text")
    }),

    // SimHash Hamming near-dup pairs with guaranteed recall: 60-bit
    // shingle-feature simhash, 4 x 15-bit bands (pigeonhole: any pair
    // within Hamming distance 3 shares a full band), hamming =
    // bit_count(xor). Corpus salted with exact copies at +10000 —
    // every copy pairs with its source at hamming 0; natural near-dups
    // surface at 1..3.
    "dd15_simhash_pairs" -> ((s, d) => {
      val docs = documents(s, d).select("doc_id", "text")
      val dup = docs.select((col("doc_id") + 10000).as("doc_id"), col("text"))
      DedupOps.simhashHammingPairs(docs.unionByName(dup), "doc_id", "text",
        k = 3, maxHamming = 3, bands = 4)
    }),

    // dd15 at the WIDE geometry (120-bit signature, 8 x 15-bit bands —
    // the production setting past ~100M docs): same pigeonhole
    // guarantee at maxHamming 3, higher precision (noise pairs spread
    // out in the wider Hamming space), oracle-gated like the 60-bit
    // lane so the width parameterization is externally verified, not
    // just property-swept.
    "dd16_simhash_wide" -> ((s, d) => {
      val docs = documents(s, d).select("doc_id", "text")
      val dup = docs.select((col("doc_id") + 10000).as("doc_id"), col("text"))
      DedupOps.simhashHammingPairsW(docs.unionByName(dup), "doc_id", "text",
        k = 3, maxHamming = 3, bands = 8, bits = 120)
    }),

    // Blocked n-gram Jaccard: pairs within a 40-char-prefix block with
    // word-set Jaccard >= 0.5.
    "dd4_jaccard" -> ((s, d) => {
      DedupOps.jaccardPairs(documents(s, d), "doc_id", "text",
        substring(col("text"), 1, 40), 0.5)
    }),

    // MinHash-LSH pairs resolved to duplicate clusters via connected
    // components (GraphX); rep = min doc_id of the component.
    "dd6_clusters" -> ((s, d) => {
      // clustersAuto: the measured-crossover selector is the exercised
      // path (GraphX here — the edge set is far below the threshold);
      // output is variant-invariant, asserted in ExtOpsSpec.
      // Releasable + Leases: park the final-checkpoint handle, free the
      // previous invocation's (GraphQueries.leased rationale).
      val (out, rel) = DedupOps.clustersAutoReleasable(
        DedupOps.minhashCandidates(documents(s, d), "doc_id", "text",
          shingleK = 3, numPerm = 16, bands = 4))
      graft.Leases.swap("dd6_clusters", rel)(out)
    }),

    // Leakage-free split: train/val/test assignment keyed on the
    // near-dup CLUSTER representative (minhash+LSH pairs → CC), so
    // near-copies never straddle a split boundary; docs in no pair are
    // their own representative.
    "dd14_leakage_split" -> ((s, d) => {
      val (out, rel) = DedupOps.leakageFreeSplitReleasable(
        documents(s, d), "doc_id", "text",
        trainPct = 80, valPct = 10, shingleK = 3, numPerm = 16, bands = 4)
      graft.Leases.swap("dd14_leakage_split", rel)(out)
    }),

    // Embedding-cosine near-dup dedup: sign-bucket LSH pairs (4 bits,
    // cosine >= 0.4), greedy keep-smallest-id survivors.
    "dd7_embedding_dedup" -> ((s, d) => {
      DedupOps.embeddingDedup(embeddings(s, d), 0.4, bits = 4)
        .select("vec_id")
    }),

    // End-to-end near-dup removal (the flagship dedup composite):
    // MinHash-LSH candidate pairs → connected components → drop every
    // non-representative member → per-source survivor stats. The corpus
    // is salted with synthetic duplicates (ids +10000) so the pipeline
    // has real work; only doc ids and 32-byte keys ever shuffle.
    "dd9_dedup_e2e" -> ((s, d) => {
      val docs = documents(s, d).select("doc_id", "source", "text", "n_chars")
      val salted = docs.unionByName(
        docs.select((col("doc_id") + 10000).as("doc_id"), col("source"),
          col("text"), col("n_chars")))
      val (members, rel) = DedupOps.clustersReleasable(
        DedupOps.minhashCandidates(salted, "doc_id", "text",
          shingleK = 3, numPerm = 16, bands = 4))
      graft.Leases.swap("dd9_dedup_e2e", rel)(())
      val drops = members.filter(col("member") =!= col("cluster_rep"))
        .select(col("member").as("doc_id"))
      salted.join(drops, Seq("doc_id"), "left_anti")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("n_chars"), 2).as("avg_chars"))
    }),

    // Quality-aware keep policy: one representative per near-dup
    // cluster by (quality desc, id asc) — keep-longest (the
    // C4/MassiveText rule), via a map-side-combinable max_by aggregate
    // rather than a per-cluster window sort. Singletons keep
    // themselves; quality = character length.
    "dd17_keep_best" -> ((s, d) => {
      val (out, rel) = DedupOps.dedupKeepBestReleasable(
        documents(s, d), "doc_id", "text",
        length(col("text")).cast("long"),
        shingleK = 3, numPerm = 16, bands = 4)
      graft.Leases.swap("dd17_keep_best", rel)(out)
    }),

    // Rolling-hash winnowing fingerprint: min Rabin hash over all 8-byte
    // windows (native one-pass O(1)-update expression; the
    // content-defined-chunking primitive).
    "dd8_rolling_fp" -> ((s, d) => {
      documents(s, d).select(col("doc_id"),
        graft.functions.RollingHash.rollingMinHash(col("text"), 8)
          .as("rolling_fp"))
    }),

    // Canonical + min-shingle fingerprints (text-analysis dedup keys).
    "dd5_fingerprint" -> ((s, d) => {
      import graft.operators.TextAnalysisOps
      documents(s, d).select(col("doc_id"),
        TextAnalysisOps.fingerprint(col("text")).as("fp"),
        TextAnalysisOps.minShingleFingerprint(col("text"), 3).as("min_shingle_fp"))
    }),

    // LSH recall evaluation (ss15's harness for the dedup family):
    // exact 3-gram-Jaccard truth for a 10% md5-bucket probe sample vs
    // the candidate set — one row per true pair with its caught flag.
    // The raw corpus is BIMODAL (pairs sit at j<0.1 or j≈0.96, where
    // 16-perm/4-band LSH is certain either way — an eval there
    // verifies nothing, the CMS-8×2 lesson), so the evaluated frame
    // unions each document's FIRST-HALF twin (doc_id+10000000): those
    // pairs land at j≈0.42–0.49, where P(candidate)=1−(1−j⁴)⁴≈0.15
    // and the sketch genuinely misses — measured 20 caught / 75 missed
    // at sf0.01, with the caught set spanning the full 0.43–1.0 range.
    // theta=0.3 admits the mid and high regimes only.
    "dd18_lsh_recall" -> ((s, d) => {
      val docs = documents(s, d).select("doc_id", "text")
      val w = split(col("text"), " ")
      val halves = documents(s, d).select(
        (col("doc_id") + 10000000L).as("doc_id"),
        array_join(slice(w, lit(1), (size(w) / 2).cast("int")), " ")
          .as("text"))
      // maxTruthDf = 10 BINDS at the gated scale (3 grams over the cap
      // at sf0.01 → a few rows carry nonzero a_capped/b_capped
      // certificates; at sf0.1 most grams cap, exercising the heavy
      // regime) — the capped-universe truth path is what the oracle
      // replays, not the unbounded join the cap replaced
      // Releasable + Leases: the staged gram checkpoint is read lazily
      // by the returned frame (GraphQueries.leased rationale)
      val (out, rel) = DedupOps.lshRecallEvalReleasable(
        docs.unionByName(halves), "doc_id", "text",
        shingleK = 3, numPerm = 16, bands = 4, theta = 0.3,
        samplePct = 10, maxTruthDf = 10)
      graft.Leases.swap("dd18_lsh_recall", rel)(out)
    }),

    // The capped eval's bias ledger: every gram the dd18 cap dropped
    // from the truth universe with the pair-mass an uncapped join
    // would have spent on it — tiny, hot-grams-only.
    "dd19_truth_cap" -> ((s, d) => {
      val docs = documents(s, d).select("doc_id", "text")
      val w = split(col("text"), " ")
      val halves = documents(s, d).select(
        (col("doc_id") + 10000000L).as("doc_id"),
        array_join(slice(w, lit(1), (size(w) / 2).cast("int")), " ")
          .as("text"))
      DedupOps.lshTruthCapReport(docs.unionByName(halves), "doc_id",
        "text", shingleK = 3, maxTruthDf = 10)
    })
  )

  private val simhashConcat: String = (1 to 16).map { d1 =>
    s"(CASE WHEN sum(CASE WHEN substr(h,$d1,1) BETWEEN '8' AND 'f' THEN 1 ELSE -1 END) > 0 THEN '1' ELSE '0' END)"
  }.mkString(" || ")


  // per-window polynomial coefficients for the rolling-hash oracle
  // (exact HUGEINT arithmetic, mod at the end — ring-equal to the
  // native expression's rolling mod updates); corpus is ASCII so
  // ord(char) == byte
  private val rollTerms: String = (0 until 8).map { t =>
    s"ord(substr(text, j + $t, 1))::HUGEINT * ${BigInt(257).pow(7 - t)}"
  }.mkString(" + ")

  val oracles: Map[String, String] = Map(
    "dd8_rolling_fp" ->
      s"""SELECT doc_id,
            CASE WHEN length(text) >= 8 THEN
              list_min([($rollTerms) % 2147483647
                        for j in range(1, length(text) - 6)])::BIGINT
            ELSE NULL END AS rolling_fp
          FROM documents""",
    "dd1_exact" ->
      """SELECT min(doc_id) AS doc_id FROM (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 10000, text FROM documents)
         GROUP BY md5(text)""",
    "dd2_minhash_lsh" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
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
           ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id""",
    "dd10_incremental" ->
      """WITH s AS (SELECT doc_id, source, string_split(text, ' ') w
                    FROM documents),
         sh AS (SELECT doc_id, source,
                  unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                        for i in range(1, len(w)-1)])) AS s
                FROM s WHERE len(w) >= 3),
         xh AS (SELECT doc_id, source,
                  (('0x' || substr(md5(s), 1, 15))::UBIGINT % 2147483647)::BIGINT AS x
                FROM sh),
         sig AS (SELECT doc_id, source, i,
                   min(((i*1000003 + 12345) * x + i*999983 + 54321) % 2147483647) AS mh
                 FROM xh CROSS JOIN (SELECT unnest(range(0,16)) AS i) perms
                 GROUP BY doc_id, source, i),
         bands AS (SELECT doc_id, source, i // 4 AS band,
                     md5(string_agg(mh::VARCHAR, '|' ORDER BY i)) AS bh
                   FROM sig GROUP BY doc_id, source, i // 4)
         SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         FROM bands l JOIN bands r ON l.band = r.band AND l.bh = r.bh
           AND l.doc_id <> r.doc_id
         WHERE l.source = 'src0' AND r.source <> 'src0'""",
    "dd11_span_dedup" ->
      """WITH c AS (SELECT doc_id, text FROM documents
                    UNION ALL SELECT doc_id + 10000, text FROM documents),
         w AS (SELECT doc_id, string_split(text, ' ') AS w FROM c),
         seg AS (SELECT doc_id, u.i AS seg_idx, u.s AS seg
                 FROM (SELECT doc_id,
                         unnest([{'i': i,
                                  's': array_to_string(w[i*8+1:(i+1)*8], ' ')}
                                 for i in range(0, ((len(w)+7)//8)::INT)]) AS u
                       FROM w)),
         r AS (SELECT doc_id, seg_idx, seg,
                 row_number() OVER (PARTITION BY seg
                                    ORDER BY doc_id, seg_idx) AS rn
               FROM seg)
         SELECT doc_id, count(*) AS n_segs,
           sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           md5(coalesce(string_agg(CASE WHEN rn = 1 THEN seg END, ' '
                                   ORDER BY seg_idx), '')) AS text_fp
         FROM r GROUP BY doc_id""",
    // dd20: the anchor-gram machinery replayed — same plants, 6-gram
    // anchors at every position, keep-first by (doc_id, p) encoded as
    // doc_id*1000000+p (token positions < 1e6 at every sf), islands
    // merged per doc with the same p <= prev+6 rule
    "dd20_exact_substring" ->
      """WITH c AS (SELECT doc_id,
             (CASE WHEN doc_id % 7 = 0
               THEN 'breaking news today market update report stocks rally sharply higher '
               ELSE '' END)
             || text
             || (CASE WHEN doc_id % 5 = 0
               THEN ' the quick brown fox jumps over the lazy dog again and again'
               ELSE '' END) AS text
           FROM documents),
         w AS (SELECT doc_id, string_split(text, ' ') AS w FROM c),
         g AS (SELECT doc_id, u.p AS p, u.g AS gram FROM (
             SELECT doc_id,
               unnest([{'p': i - 1,
                        'g': array_to_string(w[i:i+5], ' ')}
                       for i in range(1, len(w) - 4)]) AS u
             FROM w)),
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
         SELECT w.doc_id, len(w.w)::BIGINT AS n_tokens,
           coalesce(st.dup_tokens, 0)::BIGINT AS dup_tokens,
           coalesce(st.dup_runs, 0)::BIGINT AS dup_runs
         FROM w LEFT JOIN st ON w.doc_id = st.doc_id""",
    // dd22: novelty = grams absent from the PLANTED standing gram set
    // (the bank carries the fixture's boilerplate plant)
    "dd22_gram_novelty" ->
      """WITH stand AS (SELECT doc_id,
             text || CASE WHEN doc_id % 3 = 0
               THEN ' the quick brown fox jumps over the lazy dog again and again'
               ELSE '' END AS text
           FROM documents WHERE source <> 'src0'),
         sw AS (SELECT string_split(text, ' ') AS w FROM stand),
         sg AS (SELECT DISTINCT u.g AS gram FROM (
             SELECT unnest([{'g': array_to_string(w[i:i+5], ' ')}
                            for i in range(1, len(w) - 4)]) AS u
             FROM sw)),
         bw AS (SELECT doc_id, string_split(text, ' ') AS w
                FROM documents WHERE source = 'src0'),
         bg AS (SELECT doc_id, u.g AS gram FROM (
             SELECT doc_id,
               unnest([{'g': array_to_string(w[i:i+5], ' ')}
                       for i in range(1, len(w) - 4)]) AS u
             FROM bw)),
         nv AS (SELECT doc_id, count(*)::BIGINT AS n_novel FROM bg
                WHERE gram NOT IN (SELECT gram FROM sg)
                GROUP BY doc_id)
         SELECT bw.doc_id,
           greatest(len(bw.w) - 5, 0)::BIGINT AS n_grams,
           coalesce(nv.n_novel, 0)::BIGINT AS n_novel,
           CASE WHEN len(bw.w) - 5 > 0
             THEN coalesce(nv.n_novel, 0)::DOUBLE
               / (len(bw.w) - 5)::DOUBLE
             ELSE NULL END AS novelty
         FROM bw LEFT JOIN nv ON bw.doc_id = nv.doc_id""",

    // dd21: generation-ordered replay — banked-gram existence marks
    // every batch occurrence (class a), batch-only grams replay the
    // dd20 keep-first rule (class b), same island merge
    "dd21_substr_incremental" ->
      """WITH stand AS (SELECT doc_id,
             text || CASE WHEN doc_id % 3 = 0
               THEN ' the quick brown fox jumps over the lazy dog again and again'
               ELSE '' END AS text
           FROM documents WHERE source <> 'src0'),
         sw AS (SELECT string_split(text, ' ') AS w FROM stand),
         sg AS (SELECT DISTINCT u.g AS gram FROM (
             SELECT unnest([{'g': array_to_string(w[i:i+5], ' ')}
                            for i in range(1, len(w) - 4)]) AS u
             FROM sw)),
         bt AS (SELECT doc_id,
             (CASE WHEN doc_id % 3 = 0
               THEN 'zeta eta theta iota kappa lambda mu nu '
               ELSE '' END)
             || text
             || (CASE WHEN doc_id % 2 = 0
               THEN ' the quick brown fox jumps over the lazy dog again and again'
               ELSE '' END) AS text
           FROM documents WHERE source = 'src0'),
         bw AS (SELECT doc_id, string_split(text, ' ') AS w FROM bt),
         bg AS (SELECT doc_id, u.p AS p, u.g AS gram FROM (
             SELECT doc_id,
               unnest([{'p': i - 1,
                        'g': array_to_string(w[i:i+5], ' ')}
                       for i in range(1, len(w) - 4)]) AS u
             FROM bw)),
         hit AS (SELECT doc_id, p FROM bg
                 WHERE gram IN (SELECT gram FROM sg)),
         rest AS (SELECT * FROM bg
                  WHERE gram NOT IN (SELECT gram FROM sg)),
         bfirst AS (SELECT gram, min(doc_id * 1000000 + p) AS fk
                    FROM rest GROUP BY gram),
         bdup AS (SELECT doc_id, p FROM rest JOIN bfirst USING (gram)
                  WHERE doc_id * 1000000 + p <> fk),
         m AS (SELECT doc_id, p FROM hit
               UNION ALL SELECT doc_id, p FROM bdup),
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
         SELECT bw.doc_id, len(bw.w)::BIGINT AS n_tokens,
           coalesce(st.dup_tokens, 0)::BIGINT AS dup_tokens,
           coalesce(st.dup_runs, 0)::BIGINT AS dup_runs
         FROM bw LEFT JOIN st ON bw.doc_id = st.doc_id""",
    "dd13_minhash_estimate" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
         shl AS (SELECT doc_id,
                   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w)-1)]) AS sh
                 FROM s WHERE len(w) >= 3),
         sh AS (SELECT doc_id, unnest(sh) AS s FROM shl),
         xh AS (SELECT doc_id,
                  (('0x' || substr(md5(s), 1, 15))::UBIGINT
                   % 2147483647)::BIGINT AS x
                FROM sh),
         sig AS (SELECT doc_id, i,
                   min(((i*1000003 + 12345) * x + i*999983 + 54321)
                       % 2147483647) AS mh
                 FROM xh CROSS JOIN (SELECT unnest(range(0,16)) AS i) perms
                 GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // 4 AS band,
                     md5(string_agg(mh::VARCHAR, '|' ORDER BY i)) AS bh
                   FROM sig GROUP BY doc_id, i // 4),
         p AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
               FROM bands l JOIN bands r
                 ON l.band = r.band AND l.bh = r.bh
                AND l.doc_id < r.doc_id),
         m AS (SELECT p.a, p.b,
                 sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS nm
               FROM p
               JOIN sig sa ON sa.doc_id = p.a
               JOIN sig sb ON sb.doc_id = p.b AND sb.i = sa.i
               GROUP BY p.a, p.b),
         j AS (SELECT p.a, p.b,
                 len(list_filter(la.sh, x -> list_contains(lb.sh, x)))
                   ::DOUBLE /
                 len(list_distinct(list_concat(la.sh, lb.sh))) AS ex
               FROM p
               JOIN shl la ON la.doc_id = p.a
               JOIN shl lb ON lb.doc_id = p.b)
         SELECT m.a, m.b, round(nm::DOUBLE / 16, 4) AS est_jaccard,
           round(ex, 4) AS exact_jaccard
         FROM m JOIN j ON m.a = j.a AND m.b = j.b""",
    "dd12_containment" ->
      """WITH c AS (SELECT doc_id, text FROM documents
                    UNION ALL
                    SELECT doc_id + 20000,
                      array_to_string(string_split(text, ' ')[1:20], ' ')
                    FROM documents WHERE doc_id < 50),
         w AS (SELECT doc_id, string_split(text, ' ') AS w FROM c),
         sh AS (SELECT doc_id,
                  unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                        for i in range(1, len(w)-1)])) AS s
                FROM w WHERE len(w) >= 3),
         shf AS (SELECT doc_id, s FROM sh
                 WHERE s IN (SELECT s FROM
                               (SELECT s, count(*) AS df FROM sh GROUP BY s)
                             WHERE df <= 20)),
         na AS (SELECT doc_id, count(*) AS n_a FROM shf GROUP BY doc_id),
         p AS (SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS n_shared
               FROM shf l JOIN shf r
                 ON l.s = r.s AND l.doc_id <> r.doc_id
               GROUP BY 1, 2)
         SELECT a, b, n_shared,
           round(n_shared::DOUBLE / n_a, 4) AS containment
         FROM p JOIN na ON na.doc_id = p.a
         WHERE round(n_shared::DOUBLE / n_a, 4) >= 0.8""",
    "dd3_simhash" ->
      s"""WITH toks AS (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS t
            FROM documents),
          h AS (SELECT doc_id, md5(t) AS h FROM toks)
          SELECT doc_id, $simhashConcat AS simhash FROM h GROUP BY doc_id""",
    // the shingle comprehension matches ShingleGen k=3; nibble bit p
    // of md5 via integer ops only; sum CASE -> BIGINT cast (HUGEINT
    // lesson); bands/hamming are pure bit arithmetic, so the whole
    // pipeline replays exactly
    "dd15_simhash_pairs" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL SELECT doc_id + 10000, text FROM documents),
         sw AS (SELECT doc_id, string_split(text,' ') w FROM corpus),
         toks AS (SELECT doc_id,
                    unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                          for i in range(1, len(w)-1)])) AS t
                  FROM sw WHERE len(w) >= 3),
         h AS (SELECT doc_id, md5(t) AS h FROM toks),
         bt AS (SELECT doc_id, p,
                  sum(CASE WHEN ((((('0x' || substr(h, p//4 + 1, 1))::INT)
                                   >> (p%4)) & 1) = 1)
                      THEN 1 ELSE -1 END) AS s
                FROM h CROSS JOIN (SELECT unnest(range(0,60)) AS p) ps
                GROUP BY doc_id, p),
         sig AS (SELECT doc_id,
                   sum(CASE WHEN s > 0 THEN (1::BIGINT << p)
                       ELSE 0::BIGINT END)::BIGINT AS sig
                 FROM bt GROUP BY doc_id),
         bands AS (SELECT doc_id, sig, b, ((sig >> (b*15)) & 32767) AS bv
                   FROM sig CROSS JOIN (SELECT unnest(range(0,4)) AS b) bs),
         pairs AS (SELECT DISTINCT l.doc_id a, r.doc_id b, l.sig sa, r.sig sb
                   FROM bands l JOIN bands r
                     ON l.b = r.b AND l.bv = r.bv AND l.doc_id < r.doc_id)
         SELECT a, b, bit_count(xor(sa, sb))::INT AS hamming
         FROM pairs WHERE bit_count(xor(sa, sb)) <= 3""",
    // the wide dd15: 120 sign sums per doc, the signature held as 8
    // per-band 15-bit values (no single BIGINT packs 120 bits), pair
    // hamming = the sum of per-band XOR popcounts — exactly the
    // operator's statically-unrolled fold
    "dd16_simhash_wide" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL SELECT doc_id + 10000, text FROM documents),
         sw AS (SELECT doc_id, string_split(text,' ') w FROM corpus),
         toks AS (SELECT doc_id,
                    unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                          for i in range(1, len(w)-1)])) AS t
                  FROM sw WHERE len(w) >= 3),
         h AS (SELECT doc_id, md5(t) AS h FROM toks),
         bt AS (SELECT doc_id, p,
                  sum(CASE WHEN ((((('0x' || substr(h, p//4 + 1, 1))::INT)
                                   >> (p%4)) & 1) = 1)
                      THEN 1 ELSE -1 END) AS s
                FROM h CROSS JOIN (SELECT unnest(range(0,120)) AS p) ps
                GROUP BY doc_id, p),
         bsig AS (SELECT doc_id, p // 15 AS b,
                    sum(CASE WHEN s > 0 THEN (1::BIGINT << (p % 15))
                        ELSE 0::BIGINT END)::BIGINT AS bv
                  FROM bt GROUP BY doc_id, p // 15),
         pairs AS (SELECT DISTINCT l.doc_id a, r.doc_id b
                   FROM bsig l JOIN bsig r
                     ON l.b = r.b AND l.bv = r.bv AND l.doc_id < r.doc_id),
         ham AS (SELECT p.a, p.b,
                   sum(bit_count(xor(x.bv, y.bv)))::INT AS hamming
                 FROM pairs p
                 JOIN bsig x ON x.doc_id = p.a
                 JOIN bsig y ON y.doc_id = p.b AND y.b = x.b
                 GROUP BY p.a, p.b)
         SELECT a, b, hamming FROM ham WHERE hamming <= 3""",
    "dd4_jaccard" ->
      """WITH blocked AS (SELECT doc_id, text, substr(text,1,40) blk FROM documents)
         SELECT a, b, jaccard FROM (
           SELECT l.doc_id AS a, r.doc_id AS b,
             round(len(list_intersect(list_distinct(string_split(l.text,' ')),
                                      list_distinct(string_split(r.text,' '))))::DOUBLE /
                   len(list_distinct(string_split(l.text,' ') || string_split(r.text,' '))),
                   4) AS jaccard
           FROM blocked l JOIN blocked r
             ON l.blk = r.blk AND l.doc_id < r.doc_id)
         WHERE jaccard >= 0.5""",
    "dd6_clusters" ->
      """WITH RECURSIVE s AS (SELECT doc_id, string_split(text,' ') w FROM documents),
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
                   FROM sig GROUP BY doc_id, i // 4),
         pairs AS (SELECT DISTINCT l.doc_id a, r.doc_id b
                   FROM bands l JOIN bands r
                     ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id),
         edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
         nodes AS (SELECT DISTINCT a AS n FROM edges),
         reach(node, rep) AS (
           SELECT n, n FROM nodes
           UNION
           SELECT e.b, r.rep FROM reach r JOIN edges e ON e.a = r.node)
         SELECT node AS member, min(rep) AS cluster_rep
         FROM reach GROUP BY node""",
    // dd6's pipeline + a left join back to the full corpus: singleton
    // docs are their own rep; split = md5-bucket of the REP id.
    // dd6's cluster pipeline + quality-argmax keep policy: one row per
    // cluster, the (length desc, id asc)-best member survives.
    "dd17_keep_best" ->
      """WITH RECURSIVE s AS (SELECT doc_id, string_split(text,' ') w FROM documents),
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
                   FROM sig GROUP BY doc_id, i // 4),
         pairs AS (SELECT DISTINCT l.doc_id a, r.doc_id b
                   FROM bands l JOIN bands r
                     ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id),
         edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
         nodes AS (SELECT DISTINCT a AS n FROM edges),
         reach(node, rep) AS (
           SELECT n, n FROM nodes
           UNION
           SELECT e.b, r.rep FROM reach r JOIN edges e ON e.a = r.node),
         cl AS (SELECT node AS member, min(rep) AS cluster_rep
                FROM reach GROUP BY node),
         withrep AS (SELECT d.doc_id,
                       coalesce(cl.cluster_rep, d.doc_id) AS cluster_rep,
                       length(d.text)::BIGINT AS quality
                     FROM documents d LEFT JOIN cl ON cl.member = d.doc_id),
         ranked AS (SELECT doc_id, cluster_rep, quality,
                      count(*) OVER (PARTITION BY cluster_rep) AS n_members,
                      row_number() OVER (PARTITION BY cluster_rep
                        ORDER BY quality DESC, doc_id ASC) AS rn
                    FROM withrep)
         SELECT doc_id, cluster_rep, quality, n_members
         FROM ranked WHERE rn = 1""",
    "dd14_leakage_split" ->
      """WITH RECURSIVE s AS (SELECT doc_id, string_split(text,' ') w FROM documents),
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
                   FROM sig GROUP BY doc_id, i // 4),
         pairs AS (SELECT DISTINCT l.doc_id a, r.doc_id b
                   FROM bands l JOIN bands r
                     ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id),
         edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
         nodes AS (SELECT DISTINCT a AS n FROM edges),
         reach(node, rep) AS (
           SELECT n, n FROM nodes
           UNION
           SELECT e.b, r.rep FROM reach r JOIN edges e ON e.a = r.node),
         cl AS (SELECT node AS member, min(rep) AS cluster_rep
                FROM reach GROUP BY node),
         withrep AS (SELECT d.doc_id,
                       coalesce(cl.cluster_rep, d.doc_id) AS rep
                     FROM documents d LEFT JOIN cl ON cl.member = d.doc_id)
         SELECT doc_id, rep,
           CASE WHEN ('0x' || substr(md5(rep::VARCHAR), 1, 8))::UBIGINT % 100 < 80
                  THEN 'train'
                WHEN ('0x' || substr(md5(rep::VARCHAR), 1, 8))::UBIGINT % 100 < 90
                  THEN 'val'
                ELSE 'test' END AS split
         FROM withrep""",
    "dd7_embedding_dedup" ->
      """WITH b AS (
           SELECT vec_id, embedding,
             (CASE WHEN embedding[1] > 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN embedding[2] > 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN embedding[3] > 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN embedding[4] > 0 THEN '1' ELSE '0' END) AS bkt
           FROM embeddings)
         SELECT vec_id FROM b r
         WHERE NOT EXISTS (
           SELECT 1 FROM b l
           WHERE l.bkt = r.bkt AND l.vec_id < r.vec_id
             AND round(list_cosine_similarity(l.embedding, r.embedding)::DOUBLE, 4) >= 0.4)""",
    "dd9_dedup_e2e" ->
      """WITH RECURSIVE docs2 AS (
           SELECT doc_id, source, text, n_chars FROM documents
           UNION ALL
           SELECT doc_id + 10000, source, text, n_chars FROM documents),
         s AS (SELECT doc_id, string_split(text,' ') w FROM docs2),
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
                   FROM sig GROUP BY doc_id, i // 4),
         pairs AS (SELECT DISTINCT l.doc_id a, r.doc_id b
                   FROM bands l JOIN bands r
                     ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id),
         edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
         nodes AS (SELECT DISTINCT a AS n FROM edges),
         reach(node, rep) AS (
           SELECT n, n FROM nodes
           UNION
           SELECT e.b, r.rep FROM reach r JOIN edges e ON e.a = r.node),
         members AS (SELECT node, min(rep) AS rep FROM reach GROUP BY node),
         drops AS (SELECT node AS doc_id FROM members WHERE node <> rep)
         SELECT source, count(*) AS n_docs,
           round(avg(n_chars), 2) AS avg_chars
         FROM docs2 WHERE doc_id NOT IN (SELECT doc_id FROM drops)
         GROUP BY source""",
    "dd5_fingerprint" ->
      """WITH s AS (SELECT doc_id, text, string_split(text, ' ') w FROM documents)
         SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
           CASE WHEN len(w) >= 3 THEN
             list_min([md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                       for i in range(1, len(w)-1)])
           ELSE NULL END AS min_shingle_fp
         FROM s""",
    // truth = capped-universe 3-gram Jaccard for the md5-bucket probe
    // sample (grams with exact df > 10 excluded from intersections AND
    // size denominators, per-side dropped-gram counts carried as the
    // a_capped/b_capped certificates); cand = dd2's banding replay
    // verbatim; caught = pair present in cand under (least, greatest)
    // orientation
    "dd18_lsh_recall" ->
      """WITH docs2 AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 10000000,
             array_to_string((string_split(text, ' '))[1 : len(string_split(text, ' ')) // 2], ' ')
           FROM documents),
         s0 AS (SELECT doc_id, string_split(text, ' ') w FROM docs2),
         sh AS (SELECT doc_id,
                  unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                        for i in range(1, len(w)-1)])) AS g
                FROM s0 WHERE len(w) >= 3),
         dfr AS (SELECT g, count(*) AS df FROM sh GROUP BY 1),
         shj AS (SELECT sh.doc_id, sh.g, dfr.df FROM sh JOIN dfr USING (g)),
         sz AS (SELECT doc_id,
                  sum(CASE WHEN df <= 10 THEN 1 ELSE 0 END)::BIGINT AS n,
                  sum(CASE WHEN df > 10 THEN 1 ELSE 0 END)::BIGINT AS nc
                FROM shj GROUP BY 1),
         kept AS (SELECT doc_id, g FROM shj WHERE df <= 10),
         pr AS (SELECT doc_id FROM docs2
                WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT
                      % 100 < 10),
         it AS (SELECT p.doc_id AS a, q.doc_id AS b, count(*) AS i
                FROM kept p JOIN kept q ON p.g = q.g AND p.doc_id <> q.doc_id
                WHERE p.doc_id IN (SELECT doc_id FROM pr)
                GROUP BY 1, 2),
         tr AS (SELECT it.a, it.b,
                  round(it.i::DOUBLE / (na.n + nb.n - it.i), 4) AS jaccard,
                  na.nc AS a_capped, nb.nc AS b_capped
                FROM it JOIN sz na ON na.doc_id = it.a
                        JOIN sz nb ON nb.doc_id = it.b),
         xh AS (SELECT doc_id,
                  (('0x' || substr(md5(g), 1, 15))::UBIGINT % 2147483647)::BIGINT AS x
                FROM sh),
         sig AS (SELECT doc_id, i,
                   min(((i*1000003 + 12345) * x + i*999983 + 54321) % 2147483647) AS mh
                 FROM xh CROSS JOIN (SELECT unnest(range(0,16)) AS i) perms
                 GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // 4 AS band,
                     md5(string_agg(mh::VARCHAR, '|' ORDER BY i)) AS bh
                   FROM sig GROUP BY doc_id, i // 4),
         cd AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
                FROM bands l JOIN bands r
                  ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id)
         SELECT t.a, t.b, t.jaccard, (c.a IS NOT NULL) AS caught,
                t.a_capped, t.b_capped
         FROM tr t LEFT JOIN cd c
           ON least(t.a, t.b) = c.a AND greatest(t.a, t.b) = c.b
         WHERE t.jaccard >= 0.3""",

    // the dd18 cap's bias ledger: per capped gram, its exact df and
    // the pair-mass an uncapped truth join would have spent on it
    "dd19_truth_cap" ->
      """WITH docs2 AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 10000000,
             array_to_string((string_split(text, ' '))[1 : len(string_split(text, ' ')) // 2], ' ')
           FROM documents),
         s0 AS (SELECT doc_id, string_split(text, ' ') w FROM docs2),
         sh AS (SELECT doc_id,
                  unnest(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                        for i in range(1, len(w)-1)])) AS g
                FROM s0 WHERE len(w) >= 3)
         SELECT md5(g) AS gram_digest, count(*) AS df,
                count(*) * (count(*) - 1) // 2 AS pair_mass
         FROM sh GROUP BY 1 HAVING count(*) > 10"""
  )
}

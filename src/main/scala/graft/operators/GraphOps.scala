package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Ckpt.CkptOps

/** Iterative graph analytics over an edge DataFrame — the round-9
  * extension family (gr*). The reference has no graph surface; a
  * training-data pipeline does: centrality to weight sources, label
  * propagation to find communities of near-duplicate provenance,
  * cores/triangles to characterize link-farm-like density in a crawl
  * graph.
  *
  * Design choices, all scale-driven:
  *
  *  - DataFrame loops with an eager checkpoint per superseded
  *    iteration (released via [[graft.Release]]; local by default,
  *    reliable when `spark.graft.checkpoint.dir` is set — see
  *    [[graft.Ckpt]]), not GraphX: these lanes run a
  *    FIXED small iteration count where the per-iteration plan is two
  *    shuffles (join on src, aggregate on dst) — the dd6 A/B measured
  *    the DF form ahead of GraphX until ~1e8 edges, and unlike GraphX
  *    it spills instead of dying (PERF.md). Deep-iteration jobs
  *    (convergence PageRank at web scale) would flip to Pregel per
  *    that crossover; the loop body here is deliberately the same
  *    shape so the flip is mechanical.
  *
  *  - PageRank runs in FIXED-POINT integer arithmetic (`SCALE` units
  *    of 1e-12): a floating-point rank sum is association-order-
  *    dependent, so two runs of the same job on the same data can
  *    disagree in the low bits depending on partitioning and merge
  *    order — unacceptable for a reproducibility-gated pipeline (and
  *    for this repo's hash oracle). Integer sums are associative:
  *    ranks are bit-identical under ANY partitioning, AQE decision, or
  *    replay, and DuckDB replays the exact longs. The cost is a
  *    deliberate, deterministic truncation: each node's contribution
  *    is `pr div outdeg` and the damped sum is `(85 * s) div 100`, so
  *    up to outdeg + 1 units (≈1e-12 each) of mass leak per node per
  *    iteration — observability floor, not a correctness concern.
  *
  *  - Dangling nodes (no out-edges) leak their mass rather than
  *    redistribute it: redistribution needs a global scalar per
  *    iteration (a driver round-trip or a cross-join); the leaked
  *    variant is the same ranking in practice and keeps every
  *    iteration a pure two-shuffle plan. Callers who need the
  *    stochastic-matrix form can add the correction as a post-step.
  */
object GraphOps {

  val PrScale: Long = 1000000000000L // 1e12 fixed-point units
  /** Max edge weight [[weightedPagerank]] accepts: pr <= PrScale (1e12)
    * and w <= 1e6 keep pr * w <= 1e18 < 2^63 (ANSI-safe headroom). */
  val MaxEdgeWeight: Long = 1000000L

  /** Symmetrize + dedup a directed edge list: both orientations of
    * every edge, self-loops dropped. One exchange (the distinct).
    */
  def undirected(edges: DataFrame, a: String = "a", b: String = "b")
      : DataFrame = {
    val e = edges.select(col(a).as("a"), col(b).as("b"))
    e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** Mutual-kNN edge set: keep (a → b) only when (b → a) is also
    * present. Unlike a fixed similarity threshold — whose graph
    * density grows with corpus size, degenerating any fixed k-core
    * parameterization — mutuality bounds degree by the kNN k at ANY
    * scale, which is what makes core decomposition over it
    * scale-stable. The result is symmetric by construction.
    */
  def mutualEdges(knn: DataFrame, a: String = "a", b: String = "b")
      : DataFrame = {
    val p = knn.select(col(a).as("a"), col(b).as("b"))
    p.intersect(p.select(col("b").as("a"), col("a").as("b")))
  }

  /** Fixed-point damped PageRank, `iters` synchronous iterations over
    * DIRECTED edges (a → b). Returns (id, pr_fixed, pr) where
    * `pr_fixed` is the exact integer rank in 1e-12 units and `pr` its
    * single-division double view (one IEEE op, no round — the ss13
    * recipe).
    *
    * Per iteration: two shuffles (join contributions on src, aggregate
    * on dst) over an edge table carrying only (a, b) longs — no
    * payload ever rides the exchange. The rank frame is checkpointed
    * each round and the superseded checkpoint released immediately
    * (the clustersDataFrame pattern), so lineage and storage stay
    * O(current iteration).
    */
  def pagerank(edges: DataFrame, iters: Int = 3,
               dampingPct: Int = 85,
               checkpointEvery: Int = 1): DataFrame =
    pagerankReleasable(edges, iters, dampingPct, checkpointEvery)._1

  /** [[pagerank]] plus a release handle for the FINAL rank checkpoint
    * (the returned frame reads it lazily, so it cannot be freed
    * inline — the clustersAutoReleasable pattern). All INTERNAL
    * checkpoints (edges, node/out-degree staging, superseded
    * iterations) are released before returning: once the last
    * iteration materializes, the output depends only on its own
    * checkpoint.
    */
  def pagerankReleasable(edges: DataFrame, iters: Int = 3,
                         dampingPct: Int = 85,
                         checkpointEvery: Int = 1)
      : (DataFrame, () => Unit) =
    // unweighted = every edge at weight 1: sumw degenerates to outdeg
    // and (pr * 1) div outdeg is bit-identical to pr div outdeg, so
    // the shared weighted core replays gr1's oracle exactly
    weightedCore(edges.select(col("a"), col("b"), lit(1L).as("w")),
      iters, dampingPct, checkpointEvery)

  /** Weight-proportional fixed-point PageRank over (a, b, w) edges:
    * node a forwards `pr * w_ab div sumw_a` to b — the similarity-
    * weighted centrality a curation pipeline wants over a kNN graph
    * where edges CARRY a similarity score (a 0.95-cosine neighbor
    * should pull more rank than a 0.2 one). Weights must be POSITIVE
    * integers (quantize a float similarity to units first — e.g.
    * `round(sim * 10000)` — the same fixed-point discipline as the
    * ranks themselves: integer products and truncating divisions are
    * associative and bit-identical under any partitioning, so the
    * oracle replays the exact longs; float weights would reintroduce
    * the merge-order sensitivity the integer encoding exists to kill).
    * Non-positive-weight edges are dropped (they carry no mass — a
    * node with only such out-edges becomes dangling and leaks, the
    * documented convention), and weights above [[MaxEdgeWeight]] fail
    * loudly via an in-column guard so the 2^63 headroom argument is
    * ENFORCED, not assumed. Same two-shuffle iteration plan as
    * [[pagerank]], with `w` riding the (long, long, long) edge table
    * and `sumw` carried on the rank frame instead of a third join.
    */
  def weightedPagerank(edges: DataFrame, iters: Int = 3,
                       dampingPct: Int = 85,
                       checkpointEvery: Int = 1): DataFrame =
    weightedPagerankReleasable(edges, iters, dampingPct, checkpointEvery)._1

  /** [[weightedPagerank]] plus the final-checkpoint release handle
    * ([[pagerankReleasable]] contract). */
  def weightedPagerankReleasable(edges: DataFrame, iters: Int = 3,
                                 dampingPct: Int = 85,
                                 checkpointEvery: Int = 1)
      : (DataFrame, () => Unit) =
    weightedCore(edges.select(col("a"), col("b"),
      col("w").cast("long").as("w")), iters, dampingPct, checkpointEvery)

  private def weightedCore(edges: DataFrame, iters: Int,
                           dampingPct: Int, checkpointEvery: Int)
      : (DataFrame, () => Unit) = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1: $checkpointEvery")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0,100]: $dampingPct")
    val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    // In-column weight-bound guard (the linkPrediction maxDegree
    // idiom): the overflow argument below needs pr * w < 2^63, and with
    // pr bounded by the total mass PrScale (1e12) that holds only for
    // w <= ~9.2e6. Enforce 1e6 (product <= 1e18 < 2^63) so a caller
    // passing raw un-quantized weights fails with THIS message at scan
    // time, not an ANSI overflow five shuffles later. Evaluated once
    // per edge on the already-checkpointed frame — no extra pass.
    // null weights pass THROUGH the guard (a null predicate is
    // not-true, so without the isNull arm they'd hit raise_error with
    // a null-concat message) — the w > 0 filter below then drops them,
    // the pre-guard behavior
    val wRaw = col("w").cast("long")
    val wChecked = when(wRaw.isNull || wRaw <= MaxEdgeWeight, wRaw).otherwise(
      raise_error(concat(
        lit("weightedPagerank: edge weight "), wRaw.cast("string"),
        lit(s" exceeds $MaxEdgeWeight — quantize similarities to at" +
          " most 1e6 units (e.g. round(sim * 10000)) so fixed-point" +
          " products stay under 2^63"))))
    val e = edges.select(col("a").cast("long").as("a"),
      col("b").cast("long").as("b"), wChecked.as("w"))
      .filter(col("w") > 0L)
      .iterCkpt(ser)
    // checkpoint + count fold: one job (Ckpt.counted, r19)
    val (nodes, n) = e.select(col("a").as("id"))
      .unionByName(e.select(col("b").as("id"))).distinct()
      .iterCkptCounted(ser)
    require(n > 0, "pagerank needs a non-empty edge set")
    val sumw = e.groupBy(col("a").as("id"))
      .agg(sum(col("w")).as("sumw"))
      .iterCkpt(ser)
    val init = PrScale / n
    val base = (100L - dampingPct) * init / 100L
    // the rank frame CARRIES the static out-weight through every
    // checkpoint: one long column per node instead of a third shuffle
    // join per iteration. Locally the edge join + checkpoint
    // materialization dominate and the smoke wall is unchanged
    // (20.1 vs 20.4 s at 2M nodes / 10M edges); the join it removes
    // is nodes-sized, which is exactly the side that grows into a
    // real exchange on a cluster. sumw 0 marks dangling nodes,
    // which contribute nothing (their mass leaks — see scaladoc).
    // Overflow headroom: pr ≤ total mass = PrScale (1e12) and the
    // guard above enforces w ≤ MaxEdgeWeight (1e6), so
    // pr * w ≤ 1e18 < 2^63 — a bound, not an assumption.
    var pr = nodes.join(sumw, Seq("id"), "left")
      .select(col("id"), coalesce(col("sumw"), lit(0L)).as("sumw"),
        lit(init).as("pr_fixed"))
      .iterCkpt(ser)
    // nodes/sumw staging is folded into the init checkpoint above —
    // free it now, not at session end
    graft.Release(nodes)
    graft.Release(sumw)
    // `checkpointEvery` trades lineage depth for job count: every=1
    // (the default) materializes each iteration — the long-chain
    // shape, O(1) lineage, superseded rounds released as you go;
    // every=iters folds a SHORT chain into one lazy multi-shuffle job
    // (measured on the PerfCompare pagerank lane: 3 iterations at 5M
    // edges run 17.6 s materialized vs 8.6 s chained — the
    // intermediate materializations were half the wall). Ranks are
    // identical either way: integer arithmetic doesn't care how many
    // jobs compute it.
    var lastCkpt = pr
    for (i <- 1 to iters) {
      // `div`, not `/`: Spark's `/` on longs is a DOUBLE division, and
      // the whole point of the fixed-point encoding is that no IEEE op
      // ever touches a rank until the final display column
      val contrib = pr.filter(col("sumw") > 0L)
        .select(col("id"), col("pr_fixed"), col("sumw"))
        .join(e, col("id") === col("a"))
        .select(col("b"), expr("(pr_fixed * w) div sumw").as("c"))
        .groupBy(col("b").as("id"))
        .agg(sum(col("c")).as("s"))
      val next = pr.select(col("id"), col("sumw"))
        .join(contrib, Seq("id"), "left")
        .withColumn("s", coalesce(col("s"), lit(0L)))
        .select(col("id"), col("sumw"),
          (lit(base) + expr(s"(${dampingPct.toLong} * s) div 100"))
            .as("pr_fixed"))
      if (i % checkpointEvery == 0 || i == iters) {
        val ck = next.iterCkpt(ser)
        // only now is the previous checkpoint safe to free: a LAZY
        // intermediate still reads it until this materialization
        graft.Release(lastCkpt)
        lastCkpt = ck
        pr = ck
      } else {
        pr = next
      }
    }
    graft.Release(e)
    val last = lastCkpt
    val out = last.select(col("id"), col("pr_fixed"),
      (col("pr_fixed").cast("double") / lit(PrScale.toDouble)).as("pr"))
    (out, () => graft.Release(last))
  }

  /** Personalized PageRank: rank mass teleports back to a SEED set
    * instead of uniformly — the seed-relevance expansion a curation
    * pipeline uses to grow a small trusted/curated document set into a
    * ranked neighborhood ("what else does the graph consider close to
    * what we already vetted"). Same fixed-point integer discipline as
    * [[pagerank]]: init and teleport mass are `SCALE div |seeds|` on
    * seed nodes and ZERO elsewhere, so ranks are bit-identical under
    * any partitioning and replay exactly in the oracle. Seeds outside
    * the graph's node set are ignored (they can neither receive nor
    * forward mass).
    */
  def personalizedPagerankReleasable(edges: DataFrame, seeds: DataFrame,
                                     iters: Int = 3, dampingPct: Int = 85,
                                     checkpointEvery: Int = 1)
      : (DataFrame, () => Unit) = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1: $checkpointEvery")
    val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val e = edges.select(col("a").cast("long").as("a"),
      col("b").cast("long").as("b"))
      .iterCkpt(ser)
    val nodes = e.select(col("a").as("id"))
      .unionByName(e.select(col("b").as("id"))).distinct()
    val outdeg = e.groupBy(col("a").as("id"))
      .agg(count(lit(1)).as("outdeg"))
    val seedIds = seeds.select(col(seeds.columns.head).cast("long")
      .as("id")).distinct()
    // checkpoint + count fold: one job (Ckpt.counted, r19)
    val (seedNodes, nSeeds) = nodes.join(seedIds, Seq("id"), "left_semi")
      .iterCkptCounted(ser)
    require(nSeeds > 0, "no seed intersects the graph's node set")
    val init = PrScale / nSeeds
    val base = (100L - dampingPct) * init / 100L
    var pr = nodes.join(outdeg, Seq("id"), "left")
      .join(seedNodes.withColumn("_seed", lit(true)), Seq("id"), "left")
      .select(col("id"), coalesce(col("outdeg"), lit(0L)).as("outdeg"),
        coalesce(col("_seed"), lit(false)).as("is_seed"),
        when(col("_seed"), lit(init)).otherwise(lit(0L)).as("pr_fixed"))
      .iterCkpt(ser)
    graft.Release(seedNodes)
    // checkpointEvery: the weightedCore knob — every=1 materializes
    // each round (O(1) lineage, the long-chain shape); every=iters
    // folds the short chain into ONE lazy multi-shuffle job, halving
    // the driver-round job count the gr6 lane pays (the r17 driver
    // run's worst contended entries were exactly these many-tiny-job
    // iterative lanes). Ranks are identical either way — integer
    // arithmetic doesn't care how many jobs compute it.
    var lastCkpt = pr
    for (i <- 1 to iters) {
      val contrib = pr.filter(col("outdeg") > 0L && col("pr_fixed") > 0L)
        .select(col("id"), expr("pr_fixed div outdeg").as("c"))
        .join(e, col("id") === col("a"))
        .groupBy(col("b").as("id"))
        .agg(sum(col("c")).as("s"))
      val next = pr.select(col("id"), col("outdeg"), col("is_seed"))
        .join(contrib, Seq("id"), "left")
        .withColumn("s", coalesce(col("s"), lit(0L)))
        .select(col("id"), col("outdeg"), col("is_seed"),
          (when(col("is_seed"), lit(base)).otherwise(lit(0L)) +
            expr(s"(${dampingPct.toLong} * s) div 100")).as("pr_fixed"))
      if (i % checkpointEvery == 0 || i == iters) {
        val ck = next.iterCkpt(ser)
        // only now is the previous checkpoint safe to free: a LAZY
        // intermediate still reads it until this materialization
        graft.Release(lastCkpt)
        lastCkpt = ck
        pr = ck
      } else {
        pr = next
      }
    }
    graft.Release(e)
    val last = lastCkpt
    val out = last.select(col("id"), col("pr_fixed"),
      (col("pr_fixed").cast("double") / lit(PrScale.toDouble)).as("pr"))
    (out, () => graft.Release(last))
  }

  def personalizedPagerank(edges: DataFrame, seeds: DataFrame,
                           iters: Int = 3,
                           dampingPct: Int = 85): DataFrame =
    personalizedPagerankReleasable(edges, seeds, iters, dampingPct)._1

  /** Synchronous label propagation, `iters` rounds over UNDIRECTED
    * edges: every node adopts its neighbors' most frequent label,
    * ties to the smallest label (fully deterministic — asynchronous
    * LPA's arrival-order sensitivity is exactly what a reproducible
    * pipeline can't have). Labels start as node ids. Isolated nodes
    * don't appear (the node set is the edge endpoints). Known
    * trade-off of the synchronous schedule: near-bipartite structures
    * can oscillate between two labelings instead of converging
    * (GraphSpec demonstrates it) — the fixed iteration count keeps
    * even that case deterministic, and dense communities still
    * collapse in a round or two.
    *
    * The per-round top-1 runs on the (node, label) COUNT table —
    * vocabulary-sized, never the raw neighbor stream — via the same
    * (count desc, label asc) window the ev17 lane pins.
    */
  def labelPropagation(edges: DataFrame, iters: Int = 3): DataFrame =
    labelPropagationReleasable(edges, iters)._1

  /** [[labelPropagation]] plus a release handle for the final label
    * checkpoint; internal checkpoints are released before return. */
  def labelPropagationReleasable(edges: DataFrame, iters: Int = 3)
      : (DataFrame, () => Unit) = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val e = undirected(edges).iterCkpt(ser)
    var lbl = e.select(col("a").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .iterCkpt(ser)
    for (_ <- 1 to iters) {
      val counts = e.join(lbl.withColumnRenamed("id", "b"), "b")
        .groupBy(col("a").as("id"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id"))
        .orderBy(col("cnt").desc, col("lbl").asc)
      val next = counts
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(col("id"), col("lbl"))
        .iterCkpt(ser)
      graft.Release(lbl)
      lbl = next
    }
    graft.Release(e)
    val last = lbl
    (last, () => graft.Release(last))
  }

  /** k-core: peel nodes of degree < k from the UNDIRECTED graph for up
    * to `maxRounds` rounds (early-stop when a round removes nothing —
    * output-invariant, since further peels would also be no-ops).
    * Returns the surviving node set. The paired oracle unrolls exactly
    * `maxRounds` peels, which equals this whenever the peel converges
    * within the bound AND when it doesn't (both sides have then done
    * exactly `maxRounds` rounds) — GraphSpec asserts convergence at
    * test scale so the cap isn't silently load-bearing.
    *
    * Each round is one aggregate + one semi-join per side over (a, b)
    * longs; survivors are checkpointed and the superseded frame
    * released.
    */
  def kcore(edges: DataFrame, k: Int, maxRounds: Int = 8): DataFrame =
    kcoreReleasable(edges, k, maxRounds)._1

  /** [[kcore]] plus a release handle for the final survivor
    * checkpoint; internal checkpoints are released before return. */
  def kcoreReleasable(edges: DataFrame, k: Int, maxRounds: Int = 8)
      : (DataFrame, () => Unit) = {
    require(k >= 1, s"k must be >= 1: $k")
    val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val e = undirected(edges).iterCkpt(ser)
    // checkpoint + early-stop count fold to ONE job per round
    // (Ckpt.counted — r19, guide §2 driver-round latency)
    var (alive, aliveN) = e.select(col("a").as("id")).distinct()
      .iterCkptCounted(ser)
    var round = 0
    var stable = false
    while (round < maxRounds && !stable) {
      val (next, nextN) = e
        .join(alive.withColumnRenamed("id", "b"), "b")
        .join(alive.withColumnRenamed("id", "a"), "a")
        .groupBy(col("a").as("id"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select("id")
        .iterCkptCounted(ser)
      stable = nextN == aliveN
      graft.Release(alive)
      alive = next
      aliveN = nextN
      round += 1
    }
    graft.Release(e)
    val last = alive
    (last, () => graft.Release(last))
  }

  /** Multi-source BFS hop distances over the undirected graph —
    * unweighted single/multi-source shortest paths, the reachability
    * primitive (blast radius of a contaminated source, provenance
    * neighborhoods, "how far is every doc from the seed set").
    * Frontier expansion: hop h joins the CURRENT frontier to the edge
    * list (one equi join — shuffle keyed by node id), anti-joins the
    * already-settled set (BFS settles a node at its FIRST reach, which
    * in unweighted graphs is its minimum hop count — no re-relaxation,
    * unlike weighted Dijkstra), and stops EARLY when a frontier
    * empties (the kcore discipline; `maxHops` is the runaway cap, not
    * the expected round count). Each round's frames are
    * localCheckpointed and the superseded generation released — state
    * is O(settled + frontier), never the lineage of h joins.
    * Output: (id, dist) for every node within `maxHops` of a seed;
    * unreachable nodes are ABSENT, not infinity — filter or outer-join
    * downstream, don't invent a sentinel.
    */
  def bfsDistances(edges: DataFrame, seeds: DataFrame,
                   maxHops: Int): DataFrame =
    bfsDistancesReleasable(edges, seeds, maxHops)._1

  /** [[bfsDistances]] plus a release handle for the final settled
    * checkpoint; internal checkpoints are released before return. */
  def bfsDistancesReleasable(edges: DataFrame, seeds: DataFrame,
                             maxHops: Int,
                             broadcastFrontierMax: Long = 1000000L)
      : (DataFrame, () => Unit) = {
    require(maxHops >= 0, s"maxHops must be >= 0: $maxHops")
    val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val e = undirected(edges).iterCkpt(ser)
    // UNION-OF-CHECKPOINTS accumulation (the reachFromSeedsTagged
    // pattern): each hop checkpoints ONLY its newly-reached (id, dist)
    // frontier, and the settled set is the lazy union of the per-hop
    // parts — the previous shape re-materialized the ENTIRE settled
    // set per round (a second checkpoint job copying all prior hops'
    // rows again), which is both a driver-round job the gr11 lane
    // pays per hop and O(settled) redundant storage writes per round
    // at cluster scale. One checkpoint + one count job per hop now.
    val parts = scala.collection.mutable.Buffer[DataFrame]()
    // checkpoint + early-stop count fold to ONE job per hop
    // (Ckpt.counted — r19, guide §2 driver-round latency)
    var (frontier, frontierN) = seeds.select(col("id")).distinct()
      .withColumn("dist", lit(0)).iterCkptCounted(ser)
    parts += frontier
    var settledIds = frontier.select("id"): DataFrame
    // the frontier size is already KNOWN each round (the early-stop
    // count), so the expansion join dispatches on it for free: a small
    // frontier broadcasts — the edge list is scanned map-side with NO
    // exchange, the common regime since frontiers start at |seeds| and
    // drain toward 0 — and only a genuinely wide wavefront pays the
    // shuffle join (broadcasting it would OOM the executors). The
    // geocodeAuto dispatch discipline; measured 92.5 s → (see PERF.md
    // bfs) on a 25-round 1M-node lattice where every frontier is 1000
    // rows.
    var hop = 0
    while (hop < maxHops && frontierN > 0) {
      hop += 1
      val f = frontier.select(col("id").as("a"))
      val (reached, n) = e
        .join(if (frontierN <= broadcastFrontierMax) broadcast(f) else f,
          "a")
        .select(col("b").as("id")).distinct()
        .join(settledIds, Seq("id"), "left_anti")
        .withColumn("dist", lit(hop))
        .iterCkptCounted(ser)
      frontierN = n
      if (frontierN == 0) {
        graft.Release(reached)
      } else {
        parts += reached
        settledIds = settledIds.unionByName(reached.select("id"))
        frontier = reached
      }
    }
    graft.Release(e)
    // Release on a union frame only frees LogicalRDD LEAVES it can see
    // eagerly — return an explicit all-parts closure (the reachFrom/
    // SCC discipline) so no generation leaks past the handle.
    val allParts = parts.toVector
    (allParts.reduce(_ unionByName _), () => allParts.foreach(graft.Release(_)))
  }

  /** Directed multi-source reachability: the settled id set reachable
    * FROM `seeds` (seeds included), plus the release handle for the
    * per-hop frontier checkpoints. One region tag (0) over
    * [[reachFromSeedsTagged]] — a single frontier loop to maintain
    * (review r17), same loud undrained-frontier `require`.
    */
  private def reachFromSeeds(e: DataFrame, seeds: DataFrame,
                             maxHops: Int,
                             broadcastFrontierMax: Long = 1000000L)
      : (DataFrame, () => Unit) = {
    val (tagged, rel) = reachFromSeedsTagged(e,
      seeds.select(col("id")).withColumn("reg", lit(0L)),
      maxHops, broadcastFrontierMax)
    (tagged.select("id"), rel)
  }

  /** REGION-TAGGED directed multi-source reachability — the multi-pivot
    * FB-trim workhorse: seeds are (id, reg) pairs over an edge frame
    * whose edges are already intra-region (weak-component seeding or
    * the FB cross-class drop guarantee this), so a wavefront can never
    * cross regions and the settled set carries each id's region along
    * for free. Same frontier loop, union-of-checkpoints accumulation,
    * frontier-size broadcast dispatch, and loud undrained-frontier
    * `require` as [[reachFromSeeds]].
    */
  private def reachFromSeedsTagged(e: DataFrame, seeds: DataFrame,
                                   maxHops: Int,
                                   broadcastFrontierMax: Long = 1000000L)
      : (DataFrame, () => Unit) = {
    val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val frontiers = scala.collection.mutable.Buffer[DataFrame]()
    // checkpoint + early-stop count fold to ONE job per hop
    // (Ckpt.counted — r19, guide §2 driver-round latency)
    var (frontier, frontierN) = seeds.select(
      col("id").cast("long").as("id"),
      col("reg").cast("long").as("reg")).distinct().iterCkptCounted(ser)
    frontiers += frontier
    var seen = frontier: DataFrame
    var hop = 0
    while (frontierN > 0) {
      hop += 1
      require(hop <= maxHops,
        s"reachFromSeedsTagged: frontier not drained after $maxHops hops" +
          " — raise maxHops (a truncated reach would silently split SCCs)")
      val f = frontier.withColumnRenamed("id", "a")
      val (reached, n) = e
        .join(if (frontierN <= broadcastFrontierMax) broadcast(f) else f,
          "a")
        .select(col("b").as("id"), col("reg")).distinct()
        .join(seen.select("id"), Seq("id"), "left_anti")
        .iterCkptCounted(ser)
      frontierN = n
      if (frontierN == 0) graft.Release(reached)
      else {
        frontiers += reached
        seen = seen.unionByName(reached)
        frontier = reached
      }
    }
    (seen, () => frontiers.foreach(graft.Release(_)))
  }

  /** Driver-round telemetry for the last SCC run (PERF.md bookkeeping):
    * the number of multi-pivot rounds the decomposition took. */
  @volatile private[graft] var lastSccPivotRounds: Int = -1

  // dev-only phase tracer (GRAFT_SCC_TRACE=1): wall time per SCC phase,
  // for the r19 driver-round audit; zero cost when unset
  private val sccTrace = sys.env.get("GRAFT_SCC_TRACE").contains("1")
  @inline private def traced[A](name: String)(body: => A): A =
    if (!sccTrace) body
    else {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(
        f"[scc-trace] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

  /** Strongly connected components of a DIRECTED edge frame — the
    * web-graph dedup workhorse (mirror rings, link farms, mutually-
    * citing template families are SCCs; mere co-linking is not).
    * Output: (id, scc) for every edge endpoint, `scc` = the MIN id in
    * the component (deterministic, engine-independent).
    *
    * Algorithm: FB-Trim (forward-backward reachability with trimming,
    * the standard distributed SCC decomposition — Slota et al. 2014,
    * Orzan's coloring family), driven as a DataFrame loop:
    *
    *  1. TRIM, repeatedly: a node with no in-edge or no out-edge in
    *     the REMAINING subgraph can sit in no cycle — it is a
    *     singleton SCC. One anti-join peels the whole class per
    *     round, so bow-tie tendrils (the BULK of a web graph: IN/OUT
    *     pages, dead ends) drain in a few rounds at any scale,
    *     without ever paying a reachability pass.
    *  2. PIVOT, one per REGION per round (parallel FB): regions seed
    *     as the weak components of the trimmed core and refine by the
    *     FB theorem (F\SCC / B\SCC / remainder) after each round;
    *     forward-reach ∩ backward-reach from each region's min id IS
    *     that pivot's SCC ([[reachFromSeedsTagged]] both ways on the
    *     trimmed subgraph; the frontier-size dispatch broadcasts
    *     small wavefronts). Assign, subtract, re-trim.
    *
    * Scale shape: every step is an equi/anti join or a distinct on id
    * — no windows, no collects except the single-scalar pivot min.
    * Superseded generations are localCheckpointed and released (the
    * kcore discipline), so state is O(remaining + assigned). Rounds:
    * trim rounds are bounded by the longest tendril CHAIN, pivot
    * rounds by the DEPTH of the FB recursion (disconnected families
    * all resolve in round 1 off the weak-component seeding; a bow-tie
    * graph needs one round for the giant plus the refinement tail) —
    * both guarded by loud `require`s, never silent truncation. A
    * condensation that is one long path of big SCCs inside one weak
    * component is the documented worst case (one pivot per round),
    * the same trade every published FB-trim makes.
    */
  def stronglyConnectedComponents(edges: DataFrame, maxPivotRounds: Int,
                                  maxHops: Int,
                                  maxTrimRounds: Int = 64): DataFrame =
    stronglyConnectedComponentsReleasable(edges, maxPivotRounds, maxHops,
      maxTrimRounds)._1

  /** [[stronglyConnectedComponents]] plus a release handle for the
    * final assigned checkpoint. */
  def stronglyConnectedComponentsReleasable(edges: DataFrame,
      maxPivotRounds: Int, maxHops: Int, maxTrimRounds: Int = 64)
      : (DataFrame, () => Unit) = {
    val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val rawE = edges.select(col("a").cast("long").as("a"),
      col("b").cast("long").as("b"))
    // self-loops are cycle-irrelevant for MULTI-node SCCs (a is always
    // in scc(a)), so the working edge set drops them to keep the trim
    // rule exact — but the NODE set must come from the raw endpoints:
    // a page whose only links are self-links (common in web graphs) is
    // still a valid singleton SCC member of the output contract
    var e = rawE.filter(col("a") =!= col("b")).distinct()
      .iterCkpt(ser)
    // checkpoint + count fold: one job (Ckpt.counted, r19)
    var (nodes, remN) = rawE.select(col("a").as("id"))
      .unionByName(rawE.select(col("b").as("id"))).distinct()
      .iterCkptCounted(ser)
    // assigned components accumulate as a BUFFER of checkpointed
    // parts unioned lazily at the end — re-checkpointing the growing
    // union per round is the same O(n·rounds) rewrite reachFrom
    // avoids; each part is written once and released through the
    // handle
    val parts = scala.collection.mutable.Buffer[DataFrame]()
    // MULTI-PIVOT rounds (r16 verdict item 4): one pivot per remaining
    // REGION per round, not one per round globally — the standard
    // parallel FB-trim. Regions start as the weak components of the
    // post-trim core (one distributed CC pass, so every disconnected
    // family resolves its pivot in round 1 instead of queueing), and
    // refine by the FB theorem after each round: every SCC not
    // containing its region's pivot lies entirely within F\SCC, B\SCC,
    // or the untouched remainder, so those three classes become the
    // next round's regions (relabeled by min id — labels stay plain
    // longs at any depth) and cross-class edges are dropped. Rounds
    // now scale with the DEPTH of the FB recursion, not the COUNT of
    // non-trivial components; a condensation that is one long path of
    // big SCCs inside one weak component remains the documented
    // one-pivot-per-round worst case.
    var pivots = 0
    var regNodes: DataFrame = null // (id, reg); null until first pivot
    while (remN > 0) {
      // trim to fixpoint — 3 driver jobs per peeling round and ONE for
      // the fixpoint check, down from 5/2 (r18 verdict item 2, guide §2
      // driver-round latency): the singles checkpoint and its count
      // fold into one job (Ckpt.counted), and the remaining-node count
      // is ARITHMETIC (remN - nSingles — the peel partitions nodes
      // exactly), never a re-count job. The node/edge subtract
      // checkpoints stay one job each (each must materialize before its
      // predecessor is released — the O(current-round) state
      // discipline).
      var trimming = true
      var tr = 0
      while (trimming && remN > 0) {
        tr += 1
        require(tr <= maxTrimRounds,
          s"SCC trim did not drain in $maxTrimRounds rounds — tendril " +
            "chains deeper than the cap; raise maxTrimRounds")
        traced(s"trim round $tr") {
        val core = e.select(col("a").as("id")).distinct()
          .join(e.select(col("b").as("id")).distinct(), Seq("id"))
        val (singles, nSingles) = nodes.join(core, Seq("id"), "left_anti")
          .withColumn("scc", col("id")).iterCkptCounted(ser)
        if (nSingles == 0) { trimming = false; graft.Release(singles) }
        else {
          parts += singles
          val ids = singles.select("id")
          // independent materializations off the same parents —
          // overlap them (guide §2.6); release the parents only after
          // BOTH successors are materialized
          val e2F = scala.concurrent.Future(e
            .join(ids.withColumnRenamed("id", "a"), Seq("a"), "left_anti")
            .join(ids.withColumnRenamed("id", "b"), Seq("b"), "left_anti")
            .iterCkpt(ser))(scala.concurrent.ExecutionContext.global)
          val n2 = nodes.join(ids, Seq("id"), "left_anti")
            .iterCkpt(ser)
          val e2 = scala.concurrent.Await.result(e2F,
            scala.concurrent.duration.Duration.Inf)
          graft.Release(nodes); graft.Release(e)
          nodes = n2; e = e2
          remN = remN - nSingles
        }
        }
      }
      if (remN > 0) {
        pivots += 1
        require(pivots <= maxPivotRounds,
          s"SCC pivot rounds exceeded $maxPivotRounds — the condensation " +
            "has deeper FB recursion than the cap; raise maxPivotRounds")
        if (regNodes == null) {
          // seed: one region per weak component of the trimmed core
          val (cc, relCc) = traced("cc seeding")(
            DedupOps.clustersAutoReleasable(e))
          regNodes = traced("regNodes ckpt")(nodes.join(
            cc.select(col("member").as("id"), col("cluster_rep").as("reg")),
            Seq("id")).iterCkpt(ser))
          relCc()
        } else {
          // trim since last round may have removed region members
          val rn = regNodes.join(nodes, Seq("id")).iterCkpt(ser)
          graft.Release(regNodes); regNodes = rn
        }
        // pivot = min id per region: a 2-column aggregate, no collect.
        // pid IS its SCC's min (pid ∈ its SCC ⊆ its region, and pid is
        // the region min), preserving the output contract.
        val pvts = traced("pivot agg")(regNodes.groupBy(col("reg"))
          .agg(min(col("id")).as("pid")).iterCkpt(ser))
        val seeds = pvts.select(col("pid").as("id"), col("reg"))
        // the two reaches are INDEPENDENT BFS loops over the same
        // materialized edge checkpoint — overlap them on two driver
        // threads (guide §2.6) so the wall cost is max(fwd, bwd), not
        // the sum: each loop is a chain of tiny driver-synchronous
        // frontier jobs whose tasks nowhere near fill the executors,
        // and the results are deterministic regardless of interleaving
        // (disjoint checkpoints, no shared mutable state).
        val bwdF = scala.concurrent.Future(traced("bwd reach")(
          reachFromSeedsTagged(
            e.select(col("b").as("a"), col("a").as("b")), seeds, maxHops)))(
          scala.concurrent.ExecutionContext.global)
        val (fwd, relF) = traced("fwd reach")(
          reachFromSeedsTagged(e, seeds, maxHops))
        val (bwd, relB) = scala.concurrent.Await.result(bwdF,
          scala.concurrent.duration.Duration.Inf)
        val scc = traced("scc ckpt")(fwd.join(bwd.select("id"), Seq("id"))
          .join(pvts, Seq("reg"))
          .select(col("id"), col("pid").as("scc"))
          .iterCkpt(ser))
        parts += scc
        // FB refinement of the remaining nodes; relabel by min id so
        // region labels never grow past a long
        val assigned = scc.select("id")
        val fOnly = fwd.join(assigned, Seq("id"), "left_anti")
          .select(col("id"), col("reg")).withColumn("k", lit(1))
        val bOnly = bwd.join(assigned, Seq("id"), "left_anti")
          .select(col("id"), col("reg")).withColumn("k", lit(2))
        val rest = regNodes
          .join(fwd.select("id"), Seq("id"), "left_anti")
          .join(bwd.select("id"), Seq("id"), "left_anti")
          .select(col("id"), col("reg")).withColumn("k", lit(3))
        val classed = fOnly.unionByName(bOnly).unionByName(rest)
        val relabel = classed.groupBy(col("reg"), col("k"))
          .agg(min(col("id")).as("nreg"))
        val regNext = classed.join(relabel, Seq("reg", "k"))
          .select(col("id"), col("nreg").as("reg")).iterCkpt(ser)
        relF(); relB(); graft.Release(pvts)
        // subtract assigned nodes; rebuild edges INTRA-REGION only
        // (regNext covers exactly the unassigned nodes, so the join
        // also drops assigned endpoints — no separate anti join)
        // checkpoint + count fold: one job (Ckpt.counted, r19);
        // node subtract and edge rebuild are independent — overlap
        // (guide §2.6), release parents only after both materialize
        val e2F = scala.concurrent.Future(traced("pivot edge rebuild")(e
          .join(regNext.select(col("id").as("a"), col("reg").as("rega")),
            Seq("a"))
          .join(regNext.select(col("id").as("b"), col("reg").as("regb")),
            Seq("b"))
          .filter(col("rega") === col("regb"))
          .select(col("a"), col("b")).iterCkpt(ser)))(
          scala.concurrent.ExecutionContext.global)
        val (n2, n2N) = traced("pivot subtract")(
          nodes.join(assigned, Seq("id"), "left_anti")
          .iterCkptCounted(ser))
        val e2 = scala.concurrent.Await.result(e2F,
          scala.concurrent.duration.Duration.Inf)
        graft.Release(nodes); graft.Release(e); graft.Release(regNodes)
        nodes = n2; e = e2; regNodes = regNext
        remN = n2N
      }
    }
    lastSccPivotRounds = pivots
    if (regNodes != null) graft.Release(regNodes)
    graft.Release(nodes); graft.Release(e)
    if (parts.isEmpty)
      (edges.sparkSession.range(0)
        .select(col("id"), col("id").as("scc")), () => ()) // edgeless
    else {
      val kept = parts.toSeq
      (kept.reduce(_ unionByName _), () => kept.foreach(graft.Release(_)))
    }
  }

  /** Condensation (SCC quotient) edges: the distinct component-level
    * DAG a web-graph analysis works on once SCCs collapse — which
    * mirror families FEED which (crawl frontier ordering, dedup
    * provenance, bow-tie IN/OUT classification all read this graph,
    * which is orders of magnitude smaller than the page graph). Two
    * broadcast-able-or-shuffle equi joins of the edge list against the
    * assignment (high-cardinality id key — no skew), same-component
    * edges dropped, one distinct on the (scc_a, scc_b) pairs.
    */
  def condensationEdges(edges: DataFrame, scc: DataFrame): DataFrame = {
    val e = edges.select(col("a").cast("long").as("a"),
      col("b").cast("long").as("b"))
    e.join(scc.select(col("id").as("a"), col("scc").as("scc_a")), Seq("a"))
      .join(scc.select(col("id").as("b"), col("scc").as("scc_b")),
        Seq("b"))
      .filter(col("scc_a") =!= col("scc_b"))
      .select(col("scc_a"), col("scc_b")).distinct()
  }

  /** Bow-tie classification (Broder et al. 2000, "Graph structure in
    * the web") over a DIRECTED graph with a standing SCC assignment:
    * the CORE is the largest component (ties to the smallest
    * component id — deterministic), IN is everything that reaches the
    * core without being in it, OUT everything the core reaches,
    * OTHER the rest (tendrils off IN/OUT, tubes, disconnected
    * regions). This is the map a crawl scheduler orders fetches by
    * and a dedup pipeline uses to bound mirror blast radius — the
    * condensation's coarsest useful summary.
    *
    * Output: (id, cls ∈ {core,in,out,other}) for every assigned node.
    * With exact (drained) reachability a non-core node can never be
    * in BOTH reach sets — a core→x→core path would put x in the core
    * component — so the in/out branches are disjoint by construction;
    * [[reachFromSeeds]]'s loud drain `require` guards the truncation
    * case that could fake it.
    *
    * Scale shape: core selection is a map-side-combined size agg into
    * a 1-row TakeOrdered (the pivot-min collect discipline); the two
    * reach passes are [[reachFromSeeds]] (frontier-size broadcast
    * dispatch, union-of-checkpoints settled set); classification is
    * two left joins on id. The result is eagerly checkpointed so the
    * reach frontiers release before return.
    */
  def bowtieClassify(edges: DataFrame, scc: DataFrame,
                     maxHops: Int): DataFrame =
    bowtieClassifyReleasable(edges, scc, maxHops)._1

  /** [[bowtieClassify]] plus the release handle for the result
    * checkpoint. */
  def bowtieClassifyReleasable(edges: DataFrame, scc: DataFrame,
      maxHops: Int): (DataFrame, () => Unit) = {
    val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val e = edges.select(col("a").cast("long").as("a"),
        col("b").cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .iterCkpt(ser)
    val top = scc.groupBy(col("scc")).agg(count(lit(1)).as("_n"))
      .orderBy(col("_n").desc, col("scc").asc).limit(1).collect()
    require(top.nonEmpty, "bowtieClassify: empty SCC assignment")
    val coreId = top(0).getLong(0)
    val coreNodes = scc.filter(col("scc") === coreId)
      .select(col("id")).iterCkpt(ser)
    // independent BFS loops over the same materialized edge checkpoint
    // — overlap on two driver threads (guide §2.6, the SCC pivot
    // discipline): wall cost max(fwd, bwd), deterministic results
    val bwdF = scala.concurrent.Future(reachFromSeeds(
      e.select(col("b").as("a"), col("a").as("b")), coreNodes, maxHops))(
      scala.concurrent.ExecutionContext.global)
    val (fwd, relF) = reachFromSeeds(e, coreNodes, maxHops)
    val (bwd, relB) = scala.concurrent.Await.result(bwdF,
      scala.concurrent.duration.Duration.Inf)
    val cls = scc.select(col("id"), (col("scc") === coreId).as("_c"))
      .join(fwd.select(col("id"), lit(true).as("_f")), Seq("id"), "left")
      .join(bwd.select(col("id"), lit(true).as("_b")), Seq("id"), "left")
      .select(col("id"),
        when(col("_c"), "core")
          .when(col("_b").isNotNull, "in")
          .when(col("_f").isNotNull, "out")
          .otherwise("other").as("cls"))
      .iterCkpt(ser)
    relF(); relB()
    graft.Release(e); graft.Release(coreNodes)
    (cls, () => graft.Release(cls))
  }

  /** Per-node triangle counts over the UNDIRECTED graph. Edges are
    * canonically oriented low → high id so each triangle is enumerated
    * exactly once ((a,b),(b,c),(a,c) with a<b<c), then each corner
    * credited via a three-way unpivot. Id order is kept HERE so the
    * gr4 oracle is a literal replay; on hub-heavy graphs use
    * [[triangleCountsDegreeOrdered]] — same triangle set (GraphSpec
    * property-tests the equality), but the enumeration join's fan-out
    * is bounded by the lower-DEGREE endpoint instead of whichever
    * endpoint got the low id.
    */
  def triangleCounts(edges: DataFrame): DataFrame =
    triangleCountsReleasable(edges)._1

  /** [[triangleCounts]] plus a release handle for the canonical-edge
    * checkpoint, which the returned plan reads three times lazily and
    * therefore cannot be freed inline. */
  def triangleCountsReleasable(edges: DataFrame)
      : (DataFrame, () => Unit) = {
    val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val ce = undirected(edges).filter(col("a") < col("b"))
      .iterCkpt(ser)
    val tri = ce.as("e1")
      .join(ce.as("e2"), col("e2.a") === col("e1.b"))
      .join(ce.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val out = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tri"))
    (out, () => graft.Release(ce))
  }

  /** Local clustering coefficient per node: c(v) = 2·tri(v) /
    * (deg(v)·(deg(v)−1)) over the undirected graph — how close each
    * node's neighborhood is to a clique, the per-node refinement of
    * gr4's triangle counts. tri and deg are exact integers (rides
    * [[triangleCountsReleasable]] + one degree aggregate over the same
    * symmetrized edge frame); the coefficient is the repo-standard ONE
    * IEEE division (exact-int numerator 2·tri and denominator
    * deg·(deg−1), so the quotient is bit-identical in any engine).
    * Degree-0/1 nodes report 0.0 (no wedge exists), not null — absence
    * of structure is data. Same scale envelope as the triangle count
    * it composes: use the degree-ordered orientation's guidance for
    * hub-heavy graphs.
    */
  def clusteringCoefficientReleasable(edges: DataFrame)
      : (DataFrame, () => Unit) = {
    val (tri, rel) = triangleCountsReleasable(edges)
    val deg = undirected(edges).groupBy(col("a").as("id"))
      .agg(count(lit(1)).as("deg"))
    val out = deg.join(tri, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        col("deg"))
      .withColumn("coeff",
        when(col("deg") >= 2,
          (col("n_tri") * 2.0) / (col("deg") * (col("deg") - 1)))
          .otherwise(lit(0.0)))
    (out, rel)
  }

  def clusteringCoefficient(edges: DataFrame): DataFrame =
    clusteringCoefficientReleasable(edges)._1

  /** [[triangleCounts]] with DEGREE-ORDERED canonical orientation —
    * the scale-safe form. Orienting u → v iff (deg(u), u) < (deg(v),
    * v) is a total order over nodes, so each triangle is still
    * enumerated exactly once (its corners sort x < y < z and the three
    * edges all point up); the wedge join `e1.b = e2.a` now fans out
    * only through a node's HIGHER-degree neighbors, so any node's
    * oriented out-degree is O(√E) regardless of its raw degree (the
    * classic arboricity bound) — a 10M-degree hub contributes ~nothing
    * instead of 10M² wedges. Under id order the same hub keeps its
    * full fan-out whenever it happens to hold a low id, which is the
    * measured blowup (ScaleSmoke `tri`: hub-heavy graph, id-ordered
    * wedge count ~d²/2 vs degree-ordered ~0). Costs two extra
    * node-keyed joins to attach degrees — noise next to the wedge join
    * it bounds.
    */
  def triangleCountsDegreeOrdered(edges: DataFrame): DataFrame =
    triangleCountsDegreeOrderedReleasable(edges)._1

  /** [[triangleCountsDegreeOrdered]] plus the canonical-edge release
    * handle ([[triangleCountsReleasable]] contract). */
  def triangleCountsDegreeOrderedReleasable(edges: DataFrame)
      : (DataFrame, () => Unit) = {
    val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val und = undirected(edges).iterCkpt(ser)
    val deg = und.groupBy(col("a").as("_n")).agg(count(lit(1)).as("_d"))
    val ce = und
      .join(deg.select(col("_n").as("a"), col("_d").as("_da")), Seq("a"))
      .join(deg.select(col("_n").as("b"), col("_d").as("_db")), Seq("b"))
      .filter(col("_da") < col("_db") ||
        (col("_da") === col("_db") && col("a") < col("b")))
      .select("a", "b")
      .iterCkpt(ser)
    graft.Release(und)
    val tri = ce.as("e1")
      .join(ce.as("e2"), col("e2.a") === col("e1.b"))
      .join(ce.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"),
        col("e2.b").as("z"))
    val out = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tri"))
    (out, () => graft.Release(ce))
  }

  /** Newman modularity of a community assignment over the UNDIRECTED
    * graph — the quality score for [[labelPropagation]]'s output (did
    * LPA find real structure, or noise?). Q = Σ_c [e_c/m −
    * (d_c/2m)²]; everything here stays in the directed-double-count
    * convention so it is INTEGER until the final display column:
    * per community, `dsum` = Σ degrees (= directed rows whose source
    * is in c), `inside2` = 2·e_c (directed rows with both ends in c),
    * and the exact numerator `contrib` = 2m·inside2 − dsum² — Q equals
    * Σ contrib / (2m)², and `q_share` is each community's term as ONE
    * IEEE division of exact longs (the ss13 recipe: bit-identical in
    * any engine). Integer sums are associative, so the whole report is
    * partition-invariant and oracle-replayable — a float-accumulated
    * modularity would not be.
    *
    * Unlabeled endpoints drop their edges (inner join) — with labels
    * derived from the same edge set, coverage is total. Two shuffles:
    * the label attach (node-keyed) and the per-community aggregate.
    * Overflow bound: dsum² needs dsum < 3·10⁹ per community — beyond
    * that (a single community holding 3B+ edge-endpoints), rescale
    * first. The one-row total rides a broadcast cross join, not a
    * driver action.
    */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e = undirected(edges)
    val la = labels.select(col("id").as("a"), col("lbl").as("la"))
    val lb = labels.select(col("id").as("b"), col("lbl").as("lb"))
    val tagged = e.join(la, Seq("a")).join(lb, Seq("b"))
    val tot = tagged.agg(count(lit(1)).as("two_m"))
    val contrib = col("two_m") * col("inside2") - col("dsum") * col("dsum")
    tagged.groupBy(col("la").as("lbl"))
      .agg(count(lit(1)).as("dsum"),
        count(when(col("la") === col("lb"), lit(1))).as("inside2"))
      .crossJoin(broadcast(tot))
      .select(col("lbl"), col("dsum"), col("inside2"),
        contrib.as("contrib"),
        (contrib.cast("double") /
          (col("two_m") * col("two_m")).cast("double")).as("q_share"))
  }

  /** Degree histogram of the UNDIRECTED graph: (degree, n_nodes). */
  def degreeHistogram(edges: DataFrame): DataFrame =
    undirected(edges)
      .groupBy(col("a").as("id"))
      .agg(count(lit(1)).as("deg"))
      .groupBy("deg")
      .agg(count(lit(1)).as("n_nodes"))

  /** Link prediction over the UNDIRECTED graph: for every NON-adjacent
    * pair (u < v) sharing at least `minCommon` common neighbors, the
    * three classic structural scores — `cn` (common-neighbor count),
    * `pa` (preferential attachment, du·dv) and `jaccard`
    * (cn / (du + dv − cn)) — the "which near-duplicate/provenance link
    * did the kNN build miss" query over a document graph. Scores
    * needing a float SUM (Adamic–Adar's Σ 1/log deg) are deliberately
    * absent: a merge-order-dependent accumulation can't be
    * reproducibility-gated (the PageRank rationale); cn and pa are
    * exact integers and jaccard is ONE IEEE division of exact longs
    * (the ss13 recipe), so the whole report replays bit-identically.
    *
    * Scale shape — the dd12/tx38 posting-list pattern, not a
    * neighborhood self-join: candidate pairs form MAP-SIDE from each
    * wedge center's sorted neighbor list (posexplode + slice → u < v
    * by construction), so the only exchanges are the degree attach,
    * the per-center list aggregate, and the (u, v) count — wedge
    * fan-out is d²/2 per center, bounded by `maxDegree` with the
    * in-column raise_error guard (a bare assertion projection would be
    * pruned unevaluated). Both endpoint degrees RIDE the neighbor
    * structs from the edge-side join, so no post-count degree join
    * exists — (u → du) is functionally dependent, grouping on it is
    * free. On a degree-bounded graph (mutual-kNN: deg ≤ k) every term
    * is O(k²·nodes). The final anti join against the edge set keeps
    * only MISSING links — one orientation suffices since u < v and
    * the edge set is symmetric.
    */
  def linkPrediction(edges: DataFrame, minCommon: Long = 1L,
                     maxDegree: Int = 256): DataFrame = {
    val e = undirected(edges)
    val deg = e.groupBy(col("a").as("b")).agg(count(lit(1)).as("db"))
    val ed = e.join(deg, Seq("b"))
    val ns = sort_array(collect_list(struct(col("b"), col("db"))))
    val guarded = when(size(ns) <= maxDegree, ns).otherwise(raise_error(
      concat(lit("linkPrediction: a node has degree "),
        size(ns).cast("string"),
        lit(s", over maxDegree=$maxDegree — wedge expansion is d^2 per" +
          " center; bound the graph (mutual-kNN) or raise maxDegree" +
          " deliberately"))))
    val pairs = ed.groupBy(col("a"))
      .agg(guarded.as("ns"))
      .select(posexplode(col("ns")).as(Seq("i", "x")), col("ns"))
      .select(col("x"), explode(
        slice(col("ns"), col("i") + 2, size(col("ns")))).as("y"))
      .groupBy(col("x.b").as("u"), col("y.b").as("v"),
        col("x.db").as("du"), col("y.db").as("dv"))
      .agg(count(lit(1)).as("cn"))
    pairs.filter(col("cn") >= minCommon)
      .join(e.select(col("a").as("u"), col("b").as("v")),
        Seq("u", "v"), "left_anti")
      .select(col("u"), col("v"), col("cn"), col("du"), col("dv"),
        (col("du") * col("dv")).as("pa"),
        (col("cn").cast("double") /
          (col("du") + col("dv") - col("cn")).cast("double")).as("jaccard"))
  }
}

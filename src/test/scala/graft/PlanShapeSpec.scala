package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan contracts for the scale-critical queries: the plan
  * SHAPES (broadcasts, exchange reuse, native operators, pushed
  * filters) are what carry to a 1000-executor cluster, so they are
  * pinned here against optimizer-visible regressions — a silent fall
  * back to a sort-merge join or a re-computed exchange would pass every
  * value-level oracle while costing an order of magnitude at scale.
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def finalPlan(name: String)
      : org.apache.spark.sql.execution.SparkPlan = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // executes, so AQE final plans are materialized
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def planOf(name: String): String = finalPlan(name).toString

  test("q2 star join broadcasts the dimension side") {
    assert(planOf("q2_region_revenue").contains("BroadcastHashJoin"))
  }

  test("q15 top-k runs on the native heap operator, not a window sort") {
    val p = planOf("q15_topk_native")
    assert(p.contains("TopKPerKey") || p.contains("LocalTopK"))
    assert(!p.contains("row_number"))
  }

  test("ss1 brute-force ANN ranks on the bounded heap, not a window sort") {
    // the scored corpus × queries fan-out must be consumed map-side by
    // TopKPerKey (≤ k rows per query survive per task) — a row_number
    // window would sort and shuffle every scored row
    val p = planOf("ss1_topk_bruteforce")
    assert(p.contains("TopKPerKey") || p.contains("LocalTopK"))
    assert(!p.contains("row_number"))
  }

  test("ss24/ss25 quantized top-k rank on the bounded heap over codegen'd literal codebooks") {
    // the SQ8 codebook and the sign-pack masks must ride the quantize
    // expression as literals (no join, no broadcast variable), and the
    // per-query ranking is the heap — a row_number window would sort
    // every scored row
    for (lane <- Seq("ss24_sq8_topk", "ss25_binary_hamming")) {
      val p = planOf(lane)
      assert(p.contains("TopKPerKey") || p.contains("LocalTopK"),
        s"$lane: ${p.take(2000)}")
      assert(!p.contains("row_number"), s"$lane: ${p.take(2000)}")
      assert(!p.contains("Window"), s"$lane: ${p.take(2000)}")
    }
  }

  test("ss23 filtered ANN joins on the filter attribute, heap-selects, no cross product") {
    // the label predicate must be the JOIN key (prunes before any
    // distance computes), not a post-filter of a label-blind cross
    // join; selection on the bounded heap
    val p = planOf("ss23_filtered_ann")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(3000))
    assert(p.contains("TopKPerKey") || p.contains("LocalTopK"))
    assert(!p.contains("row_number"))
  }

  test("tx30 vocab top-N is a bounded TakeOrderedAndProject, not a full sort") {
    // each task keeps N rows and the driver merges — the vocabulary is
    // never globally sorted; the rank window that follows runs on ≤ N
    // rows so its sort is a constant
    assert(planOf("tx30_vocab_coverage").contains("TakeOrderedAndProject"))
  }

  test("tx31 OOV join broadcasts the vocabulary side") {
    assert(planOf("tx31_oov_rate").contains("BroadcastHashJoin"))
  }

  test("dd2 LSH self-join reuses one exchange for both sides") {
    assert(planOf("dd2_minhash_lsh").contains("ReusedExchange"))
  }

  test("tx34 retrieval ranks on the heap operator with a broadcast query set") {
    // the query-term join must broadcast (queries ≪ corpus always) and
    // the per-query ranking must be the bounded heap, not a window sort
    val p = planOf("tx34_bm25_retrieval")
    assert(p.contains("TopKPerKey") || p.contains("LocalTopK"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("row_number"))
  }

  test("tx35 decontamination joins eval grams by broadcast, coverage by ints") {
    // eval-benchmark gram sets are dimension-shaped (≪ corpus) — the
    // hit semi-join and the coverage anti-join must both broadcast;
    // a shuffled train-gram join would move the corpus text per probe
    val p = planOf("tx35_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("ss15 recall eval ranks both sides on heaps, never a window sort") {
    val p = planOf("ss15_recall")
    assert(p.contains("TopKPerKey") || p.contains("LocalTopK"), p.take(2000))
    assert(!p.contains("row_number"))
  }

  test("dd15 simhash band self-join reuses the signature exchange") {
    // both band-join sides derive from one fused-signature scan (the
    // SimhashSigExpr map — no aggregation since r7) — the banded
    // exchange must be computed once and read twice, and nothing past
    // the signature projection may carry text or shingles (band-value
    // longs and ids only)
    val p = planOf("dd15_simhash_pairs")
    assert(p.contains("ReusedExchange"), p.take(2000))
    // a broadcast build would re-execute the signature pipeline (the
    // minhash self-join lesson, measured 2x on this lane)
    assert(!p.contains("BroadcastHashJoin"), p.take(2000))
    // the width-parameterized geometry (dd16) must keep the identical
    // shape: one reused banded exchange, no broadcast rebuild
    val w = planOf("dd16_simhash_wide")
    assert(w.contains("ReusedExchange"), w.take(2000))
    assert(!w.contains("BroadcastHashJoin"), w.take(2000))
  }

  test("cd2 year filter is the fused native predicate, not regex machinery") {
    val p = planOf("cd2_interval_filter")
    assert(p.contains("year_in_range"))
    assert(!p.contains("regexp_extract"))
  }

  test("tx15 contamination probes the bloom filter before the exact join") {
    assert(planOf("tx15_contamination_bloom").contains("might_contain"))
  }

  test("tx20 tfidf joins the term dimension by broadcast, scalar by BNLJ") {
    val p = planOf("tx20_tfidf")
    assert(p.contains("BroadcastHashJoin"))
    // the 1-row doc count crosses as a broadcast nested-loop, never a
    // shuffled join
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("ss9 kmeans re-assignment broadcasts the centroid table each round") {
    val p = planOf("ss9_kmeans")
    // two Lloyd rounds → two broadcast joins against k-row centroid
    // tables; the corpus itself must never shuffle by content
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("dd11 span dedup shuffles at most thrice, only the argmin exchange carrying span text") {
    // argmin groupBy(seg) + winner reassembly groupBy(id) + the
    // near-unique id join of the row-local totals frame; the old
    // two-shuffle window form shipped the full segment stream through
    // BOTH its exchanges and parked hot spans in one task
    val plan = finalPlan("dd11_span_dedup")
    def exchangesIn(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val here = p match {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => 1
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          exchangesIn(q.plan)
        case _ => 0
      }
      here + p.children.map(exchangesIn).sum
    }
    assert(exchangesIn(plan) <= 3, plan.toString)
  }

  test("tx36 bpe: bounded top-N, and no shuffle carries document text") {
    // the scale contract of bpePairCounts: the corpus crosses one
    // word-keyed aggregation; the pair expansion and its agg run on the
    // vocabulary-sized word table, and the merge list never globally
    // sorts (TakeOrderedAndProject, not Sort+Limit over an exchange).
    val plan = finalPlan("tx36_bpe_pairs")
    assert(plan.toString.contains("TakeOrderedAndProject"), plan.toString)
    def shuffleOutputs(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[Seq[String]] = {
      val here = p match {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
          Seq(s.output.map(_.name))
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          shuffleOutputs(q.plan)
        case _ => Nil
      }
      here ++ p.children.flatMap(shuffleOutputs)
    }
    val bad = shuffleOutputs(plan).filter(_.contains("text"))
    assert(bad.isEmpty, s"text-carrying exchange outputs: $bad")
  }

  test("tx38 overlap: pairs form map-side off one reused distinct — no gram join") {
    // the (source, gram) distinct is computed once (sizes and the
    // posting-list pair chain both come off a reused exchange), pairs
    // expand in-row from per-gram source sets, and the only joins are
    // the broadcast size lookups — a vocab×vocab shuffle join on the
    // gram key would regress the dd12-style map-side pair formation
    val plan = finalPlan("tx38_source_overlap")
    val s = plan.toString
    assert(s.contains("ReusedExchange"), s)
    assert(!s.contains("SortMergeJoin") && !s.contains("ShuffledHashJoin"), s)
  }

  test("tx38/tx35: gram-key exchanges carry md5 digests, never gram text") {
    // the no-text-in-shuffles discipline extended to the overlap and
    // decontamination lanes: the raw shingle column (_gt) must be
    // digested to md5 BEFORE any exchange, so shuffles carry fixed
    // 32-byte keys instead of unbounded gram strings (the 5 M-doc
    // probe put ~70 M gram strings through tx38's distinct pre-fix).
    // tx35's words/clean-text pass is the one place text legitimately
    // crosses — the gram columns are the pinned surface.
    def shuffleOutputs(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[Seq[String]] = {
      val here = p match {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
          Seq(s.output.map(_.name))
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          shuffleOutputs(q.plan)
        case _ => Nil
      }
      here ++ p.children.flatMap(shuffleOutputs)
    }
    for (lane <- Seq("tx38_source_overlap", "tx35_decontaminate",
        "tx8_contamination", "tx15_contamination_bloom")) {
      val bad = shuffleOutputs(finalPlan(lane))
        .filter(cols => cols.contains("_gt") || cols.contains("_st") ||
          cols.contains("text"))
      assert(bad.isEmpty, s"$lane gram-text exchange outputs: $bad")
    }
  }

  test("tx39 tokenize: the vocabulary joins the word stream by broadcast") {
    // the tokenizer model is executor-resident by definition; a
    // shuffled join here would exchange the corpus-sized word stream
    val plan = finalPlan("tx39_bpe_tokenize")
    val s = plan.toString
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("SortMergeJoin") && !s.contains("ShuffledHashJoin"), s)
  }

  test("tx33 dsir: shuffles carry buckets and counts, never text or grams") {
    // the scale contract of dsirLogWeights: the bucket hash is computed
    // map-side, so every exchange carries (id, bucket, count)-shaped
    // rows; raw text / gram strings crossing an exchange would make the
    // shuffle corpus-sized at 100 TB. The ratio table reaches the
    // per-doc agg as a broadcast, never a shuffled join.
    val plan = finalPlan("tx33_dsir")
    def shuffleOutputs(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[Seq[String]] = {
      val here = p match {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
          Seq(s.output.map(_.name))
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          shuffleOutputs(q.plan)
        case _ => Nil
      }
      here ++ p.children.flatMap(shuffleOutputs)
    }
    val outs = shuffleOutputs(plan)
    assert(outs.nonEmpty, plan.toString)
    val bad = outs.filter(_.exists(n => n == "text" || n.startsWith("_g")))
    assert(bad.isEmpty, s"text-carrying exchange outputs: $bad")
    assert(plan.toString.contains("BroadcastHashJoin"), plan.toString)
  }

  test("dd12 containment: pairs form map-side — no join on the shingle key") {
    // the fused shape's contract: after the single posting-build
    // exchange, the only join left in the pair path is the final
    // broadcast of the per-doc denominator — a reappearing posting
    // self-join would re-exchange the index
    val plan = finalPlan("dd12_containment")
    def joinsIn(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = {
      val here = p match {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
          Seq(j.getClass.getSimpleName)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          joinsIn(q.plan)
        case _ => Nil
      }
      here ++ p.children.flatMap(joinsIn)
    }
    val joins = joinsIn(plan)
    assert(joins.size == 1, s"expected only the denominator join: $joins")
    assert(joins.head.startsWith("Broadcast"), joins.toString)
    // the posting-build exchange (tokenize + partial bounded-collect)
    // is computed ONCE and reused by the denominator branch — the
    // corpus is tokenized exactly one time
    val s = plan.toString
    assert(s.contains("ReusedExchange"), s)
    assert("shingle_generate".r.findAllIn(s).size == 1, s)
  }

  test("dd13 estimate path is fully native — no interpreted lambdas, reused sides") {
    // the corpus pipeline runs exactly twice: the fused band generator
    // (candidate pairs) and the shingle_array+minhash_sig side
    // projection, which is broadcast ONCE and reused by both id joins.
    // No interpreted lambda ever touches the corpus — the only HOF left
    // is the per-PAIR zip_with over 16-element signatures (candidate
    // pairs, not documents)
    val plan = finalPlan("dd13_minhash_estimate")
    val s = plan.toString
    assert(s.contains("minhash_sig(shingle_array("), s)
    assert(!s.contains("array_join(slice("), s) // the HOF shingle build
    assert("minhash_text_bands".r.findAllIn(s).size == 1, s)
    assert("ReusedExchange".r.findAllIn(s).size == 2, s)
  }

  test("ss8 quantization is the native kernel — no interpreted transform") {
    // the posexplode's inferred filter re-evaluates the generator
    // child; with the native struct kernel those re-evaluations are
    // static calls, and no HOF lambda may reappear anywhere in the plan
    val s = planOf("ss8_quantize")
    assert(s.contains("quantize_int8"), s)
    assert(!s.contains("lambdafunction"), s)
  }

  test("ss13 projection is the native JL kernel — one fold, no zip_with") {
    // the declarative form is kOut interpreted aggregate(zip_with(...))
    // folds per row (the catalog's second-heaviest query); the kernel
    // must appear exactly once and no HOF lambda may survive upstream
    // of the posexplode (the tiny 16-element `proj` transform is
    // pruned out of ss13's plan entirely)
    val s = planOf("ss13_random_projection")
    assert(s.contains("jl_project"), s)
    assert(!s.contains("zip_with"), s)
    assert(!s.contains("aggregate(") || !s.contains("lambdafunction"), s)
  }

  test("dd11 segmentation is the scalar array kernel under builtin posexplode") {
    val s = planOf("dd11_span_dedup")
    assert(s.contains("segment_array"), s)
    assert(!s.contains("lambdafunction"), s)
  }

  test("ss13 / tx28 / tx29 run map-side — zero exchanges in the final plan") {
    // projection, classifier inference, and rule filtering are pure
    // per-row passes; an exchange appearing here would mean a 100-TB
    // shuffle smuggled into what must be a single scan
    def exchangesIn(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val here = p match {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => 1
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          exchangesIn(q.plan)
        case _ => 0
      }
      here + p.children.map(exchangesIn).sum
    }
    for (q <- Seq("ss13_random_projection", "tx28_classifier",
        "tx29_gopher_rules")) {
      val plan = finalPlan(q)
      assert(exchangesIn(plan) == 0, s"$q shuffles: $plan")
    }
  }

  test("q1 scan prunes to the referenced columns") {
    // inspect the scan's actual output schema (explain strings truncate
    // ReadSchema at spark.sql.maxMetadataStringLength, and asserting on
    // a column the fixture doesn't even have would be vacuous)
    // AQE's final plan bottoms out in QueryStageExec nodes; the scans
    // live inside the stages' plans, so recurse through them
    def scansIn(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
      val here = p match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scansIn(q.plan)
        case _ => Nil
      }
      here ++ p.children.flatMap(scansIn)
    }
    val scans = scansIn(finalPlan("q1_agg"))
    assert(scans.nonEmpty)
    val read = scans.flatMap(_.schema.fieldNames).toSet
    // q1 touches exactly these five of lineitem's 11 columns
    assert(read == Set("l_returnflag", "l_linestatus", "l_quantity",
      "l_extendedprice", "l_discount"),
      s"scan reads $read")
  }

  test("q35 ORC scan keeps partition pruning, pushdown, and column pruning across the format swap") {
    def scansIn(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
      val here = p match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scansIn(q.plan)
        case _ => Nil
      }
      here ++ p.children.flatMap(scansIn)
    }
    val scans = scansIn(finalPlan("q35_orc_roundtrip"))
    assert(scans.nonEmpty, "no file scan in the q35 plan")
    val sc = scans.head
    assert(sc.relation.fileFormat.toString.toLowerCase.contains("orc"),
      s"expected an ORC scan, got ${sc.relation.fileFormat}")
    assert(sc.partitionFilters.exists(_.toString.contains("src3")),
      s"partition pruning lost: ${sc.partitionFilters}")
    assert(sc.metadata("PushedFilters")
        .contains("GreaterThanOrEqual(n_chars,100)"),
      s"predicate pushdown lost: ${sc.metadata("PushedFilters")}")
    assert(sc.requiredSchema.fieldNames.toSet ==
        Set("doc_id", "lang", "n_chars"),
      s"column pruning lost: ${sc.requiredSchema.fieldNames.toSet}")
  }

  test("entry parse is the codegen kernel, not a Scala UDF boundary") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // RDD-backed, NOT a LocalRelation: Seq.toDF would let
    // ConvertToLocalRelation fold the whole projection at plan time
    // (executed plan = LocalTableScan), hiding the shape under test.
    val lines = spark.createDataset(spark.sparkContext.parallelize(Seq(
      "Smith John, carpenter, 123 Broadway",
      "Brown Wm., grocer, 7 Bowery, h 19 Pearl st",
      "45 Broadway, Smith John", ",,,", "", null,
      "O'Brien Patk, lab, r 99 Mott",
      "Delmonico & Sons, restaurant, 2 William st"), 2))
      .toDF("text")
    val viaKernel = lines.select(
      graft.parse.EntryParser.parseEntry(col("text")).as("p"))
    val viaUdf = lines.select(
      graft.parse.EntryParser.parseUdf(col("text")).as("p"))
    // value parity with the reflective UDF path, struct-deep
    assert(viaKernel.select(to_json(col("p"))).collect().toSeq ==
      viaUdf.select(to_json(col("p"))).collect().toSeq)
    // the flagship projection must stay inside whole-stage codegen:
    // parse_entry present, no ScalaUDF / BatchEvalPython boundary
    val plan = viaKernel.queryExecution.executedPlan.toString
    assert(plan.contains("parse_entry"), plan)
    // match the concrete operator names, not the bare substring "UDF",
    // so an unrelated operator name containing it can't spuriously fail
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      plan)
  }

  test("tx40 per-source cap runs on the bounded heap, not a window sort") {
    // the dominant source is the skew case by definition — a row_number
    // window would sort the largest source's full row set in one task;
    // the heap keeps ≤ cap rows per source per task before the exchange
    val p = planOf("tx40_source_cap")
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("row_number") && !p.contains("Window ["), p)
  }

  test("dd17 keep-best reduces clusters with a combinable aggregate, not a window") {
    // max_by over (quality, -id) has a map-side partial; dup clusters
    // are the skew case, so per-cluster sorting is the shape to forbid
    val p = planOf("dd17_keep_best")
    assert(!p.contains("Window ["), p)
    assert(!p.contains("row_number"), p)
  }

  test("ss16 knn graph ranks bucket fan-out on the heap off one reused bucketing") {
    // |bucket|² scored pairs must be consumed map-side (LocalTopK)
    // BEFORE the key exchange — a row_number window would shuffle and
    // sort every scored pair. The self-join may legitimately be a
    // broadcast at this SF (the build side is a cheap projection over
    // the base scan, unlike dd15's expensive derived pipeline); in the
    // shuffle regime the two sides share one exchange.
    val p = planOf("ss16_knn_graph")
    assert(p.contains("LocalTopK") && p.contains("TopKPerKey"), p)
    assert(!p.contains("row_number"), p)
    assert(p.contains("ReusedExchange") || p.contains("BroadcastHashJoin"), p)
  }

  test("ss17 multi-probe dedups by emit-once predicate, not a distinct exchange") {
    // the union's second branch carries the no-earlier-probe-match
    // conjunction instead of a candidate distinct: no HashAggregate-
    // based dedup between the joins and the heap, no row_number
    val p = planOf("ss17_knn_multiprobe")
    assert(p.contains("Union"), p)
    assert(p.contains("LocalTopK") && p.contains("TopKPerKey"), p)
    assert(!p.contains("row_number"), p)
    // the branch predicate is visible as a join condition / filter on
    // the probe-0 bucket inequality
    assert(p.contains("NOT (_la0"), p)
  }

  test("tx42 snapshot diff: the full-outer join consumes digests, not text") {
    // both sides project to (id, 16-byte md5) BEFORE the join — the
    // exchange output schema must not contain the text column
    // asserted on the optimized logical plan (robust to AQE stage
    // wrapping): both join inputs carry (id, digest), never the text
    val df = SparkEntry.queries("tx42_snapshot_diff")(spark, sf)
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty)
    joins.foreach { j =>
      j.children.foreach { c =>
        assert(!c.output.exists(_.name == "text"),
          s"text reached a join input: ${c.output.map(_.name)}")
      }
    }
  }

  test("tx45 exact heavy hitters: candidates join back by broadcast") {
    val p = planOf("tx45_exact_heavy")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window ["), p)
  }

  test("tx44 sequences: vocab joins the word stream by broadcast, no window") {
    val p = planOf("tx44_bpe_sequences")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("row_number") && !p.contains("Window ["), p)
  }

  test("tx41 token-budget sorts only the boundary tie group") {
    // exactly one Window node, and it consumes the ratio == r* filter —
    // the corpus-sized keep/drop branches are map-side filters
    val p = planOf("tx41_token_budget")
    assert("Window \\[".r.findAllIn(p).length == 1, p)
    assert(p.contains("Union"), p)
  }

  test("gr4 triangles: equi-joins only — no cartesian, no BNLJ") {
    // the two-hop enumeration must stay a pair of hash/sort-merge
    // equi-joins on (b) and (a, b); a nested-loop fallback would be
    // |E|^2 at any real edge count
    val p = planOf("gr4_triangles")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("gr5 degree histogram aggregates partially map-side (two-level)") {
    // both groupBys must partial-aggregate: the exchange carries one
    // (node, count) row per node, then one (degree, count) per degree
    val p = planOf("gr5_degree_hist")
    assert("partial_count".r.findAllIn(p).length >= 2, p)
  }

  test("q34 bloom semi join probes might_contain ahead of the exact join") {
    // the bloom pre-filter must sit on the probe scan side (codegen
    // might_contain on the serialized filter) and the residual exact
    // join must be a semi join — at scale the exchange then carries
    // only ~(selectivity + fpp) of the fact rows
    val p = planOf("q34_bloom_join")
    assert(p.contains("might_contain"), p.take(3000))
    assert(p.contains("LeftSemi"), p.take(3000))
  }

  test("sp1 radius join is an equi join on grid cells, never a cross product") {
    val p = planOf("sp1_radius_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(3000))
    assert(p.contains("_cx") && p.contains("_cy"), p.take(3000))
  }

  test("sp3 contains join is an equi join on covered cells, never a cross product") {
    val p = planOf("sp3_contains_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(3000))
  }

  test("sp6 polygon join is an equi join on covered cells, never a cross product") {
    // bbox cover join prunes; the ray-cast HOF decides at the match
    // site — the notch candidates must never force a nested loop
    val p = planOf("sp6_polygon_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(3000))
    assert(p.contains("_cx") && p.contains("_cy"), p.take(3000))
  }

  test("sp7 incremental radius join prunes directories, bloom-reduces rows, equi join on cells") {
    // only the batch computes coordinates; the corpus reads back from
    // the parquet index with the probe tiles as PARTITION filters
    // (directory-level — possible because the directory key preserves
    // locality), might_contain row-level ahead of the join, and the
    // probe meets it in an ordinary equi join on (_cx, _cy)
    val p = planOf("sp7_radius_incremental")
    assert(p.contains("might_contain"), p.take(3000))
    assert("PartitionFilters: \\[[^\\]]*_bkt".r.findFirstIn(p).isDefined,
      p.take(3000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(3000))
  }

  test("sp4 great-circle join is an equi join on 3-D ECEF cells, never a cross product") {
    val p = planOf("sp4_greatcircle")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(3000))
    assert(p.contains("_cx") && p.contains("_cy") && p.contains("_cz"),
      p.take(3000))
  }

  test("sp5 spherical knn selects on the bounded heap, no global sort, no cross product") {
    val p = planOf("sp5_greatcircle_knn")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p.take(3000))
    assert(p.contains("TopKPerKey"), p.take(3000))
    // selection must not plan a global rank window (Sort over all candidates)
    assert(!p.contains("Window"), p.take(3000))
  }

  test("mm12-mm18 perceptual/containment pair joins are equi joins on fingerprints, never cross products") {
    for (lane <- Seq("mm12_ahash_pairs", "mm13_audio_neardup",
        "mm14_video_neardup", "mm16_frame_containment",
        "mm17_audio_containment", "mm18_binary_cdc",
        "mm20_crossmodal_dedup")) {
      val p = planOf(lane)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoop"), s"$lane: ${p.take(3000)}")
    }
  }

  test("mm pair lanes cap buckets map-side: bounded_collect_list postings, no WindowExec") {
    // the degenerate-fingerprint bucket (flat frames, silence, zero
    // chunks) must NEVER land whole in one task — the cap has to be a
    // partial-aggregating posting build (BoundedCollect, O(cap) buffer
    // per partial), not count(*) OVER (PARTITION BY fingerprint),
    // which WindowExec would colocate before the filter can drop it
    for (lane <- Seq("mm12_ahash_pairs", "mm13_audio_neardup",
        "mm14_video_neardup", "mm16_frame_containment",
        "mm17_audio_containment", "mm18_binary_cdc",
        "mm20_crossmodal_dedup")) {
      val p = planOf(lane)
      assert(!p.contains("Window"), s"$lane plans a window cap: ${p.take(3000)}")
      assert(p.contains("bounded_collect_list"),
        s"$lane lost the posting-list cap: ${p.take(3000)}")
    }
  }

  test("mm28 tombstone mask is a broadcast anti-join over the bloom-reduced index scan") {
    // the ss22 delete discipline on the posting index: the mask never
    // shuffles the index side (tombstone id-lists are small by
    // premise), and it composes with the bloom + cap machinery the
    // append-only lanes pin
    val p = planOf("mm28_index_delete")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      p.take(3000))
    assert(p.contains("might_contain"), p.take(3000))
    assert(p.contains("bounded_collect_list"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("mm21/mm22/mm23 incremental containment scans the persisted index bloom-reduced, only the batch decodes") {
    for (lane <- Seq("mm21_frame_index", "mm22_segment_index",
        "mm23_chunk_index")) {
      val p = planOf(lane)
      // the corpus side must be a parquet read of the banked postings
      // (never a re-decode of corpus clips) with the batch's bloom
      // probed ahead of the exact join
      assert(p.contains("might_contain"), s"$lane: ${p.take(3000)}")
      assert("Scan parquet".r.findAllIn(p).nonEmpty, s"$lane: ${p.take(3000)}")
      // the same map-side cap discipline as the rebuild lanes
      assert(!p.contains("Window"), s"$lane: ${p.take(3000)}")
      assert(p.contains("bounded_collect_list"), s"$lane: ${p.take(3000)}")
      // batch membership filters ride broadcast marker joins, never a
      // nested loop over the OR predicate
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoop"), s"$lane: ${p.take(3000)}")
    }
  }

  test("ss22 tombstone mask is a broadcast anti-join; probed-cell pruning survives deletes") {
    val p = planOf("ss22_ivf_delete")
    // the delete mask must never shuffle the cells scan — tombstone
    // id-lists are small by premise and ride a broadcast anti-join
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
    // the probed-cells IN still prunes partitions at file listing
    assert(p.contains("PartitionFilters: [_cell"), p.take(3000))
  }

  test("ev21 nearest as-of is joinless: one union-sort exchange, no candidate pairs") {
    val p = planOf("ev21_asof_nearest")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
      !p.contains("ShuffledHashJoin"), p.take(3000))
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
  }

  test("ev20 interval coalesce shuffles once: groupBy reuses the window partitioning") {
    // span detection sorts on (user) in one window exchange; the
    // span-level groupBy keys extend the partition key so Catalyst
    // must not plan a second shuffle
    val p = planOf("ev20_interval_coalesce")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
  }

  test("dd11 span dedup selects first occurrences map-side: no WindowExec") {
    // the hot key of span dedup is the boilerplate span the operator
    // exists to excise — a row_number window partitioned by span text
    // would park that span's whole group in ONE task's external sort;
    // the argmin (min(struct(id, seg_idx)) per seg) arrives at its
    // reducer pre-combined and the join-back key (seg, id, seg_idx)
    // is near-unique, so no skewed colocation anywhere
    val p = planOf("dd11_span_dedup")
    assert(!p.contains("Window"), p.take(3000))
  }

  test("tx13/tx23/tx24/tx32: prefix-sum lanes read the materialized pid-stamped checkpoint; windows only per (_pid, stratum) or reduced") {
    // the dominant stratum (web ≈ 80% of real mixtures) splits across
    // range boundaries; the pid-stamped frame is an EAGER checkpoint
    // (a LogicalRDD leaf) so the subtotal branch and the local branch
    // read the SAME stored partition ids — spark_partition_id() is
    // stage-nondeterministic, and two independently materialized
    // branches can stamp different structures over the same rows
    // (caught by the packskew smoke: wrong bins, dropped rows). Every
    // window must be keyed by _pid (bounded by one range partition)
    // or run above an Aggregate (the P×strata offsets frame).
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    for (lane <- Seq("tx13_packing", "tx23_pack_sequences",
        "tx32_shard_manifest", "tx24_quantile_filter")) {
      val plan = SparkEntry.queries(lane)(spark, sf)
        .queryExecution.optimizedPlan
      assert(plan.collectLeaves().exists(
        _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]),
        s"$lane lost the prefix-sum checkpoint leaf:\n${plan.toString.take(2000)}")
      val bad = plan.collect {
        case w: LWindow
          if !w.partitionSpec.flatMap(_.references.map(_.name))
            .contains("_pid") &&
            !w.child.exists(_.isInstanceOf[Aggregate]) => w
      }
      assert(bad.isEmpty,
        s"$lane windows outside the two-phase discipline: $bad")
      graft.Leases.release(lane)
    }
  }

  test("prefix-sum and scc lanes keep storage flat across invocations (Leases swap)") {
    // the gr-lane storage-flat contract extended to the r15
    // Releasable-backed lanes: invocation N frees invocation N-1's
    // checkpoint via Leases.swap, so repeated bench passes hold O(1)
    // checkpoints per lane
    val sc = spark.sparkContext
    def ids: Set[Int] = sc.getPersistentRDDs.keySet.toSet
    for (lane <- Seq("tx13_packing", "tx23_pack_sequences",
        "tx24_quantile_filter", "tx32_shard_manifest", "gr12_scc",
        "gr13_scc_collapse", "gr14_condensation")) {
      val base = ids
      def run(): Int = {
        SparkEntry.queries(lane)(spark, sf).collect()
        (ids -- base).size
      }
      // the count per invocation is algorithm-dependent (gr12's result
      // is a union of per-round checkpointed parts) but must be
      // CONSTANT across invocations — accumulation is the leak
      val s1 = run(); val s2 = run(); val s3 = run()
      assert(s1 == s2 && s2 == s3 && s1 <= 6,
        s"$lane accumulates checkpoints across invocations: $s1 -> $s2 -> $s3")
      graft.Leases.release(lane)
      assert((ids -- base).isEmpty, s"$lane: Leases.release left storage")
    }
  }

  test("no lane windows over raw rows on a content/stratum/fingerprint key (skew-class sweep)") {
    // the structural pin for the bug class charged in r13 (mm pair
    // caps) and r14 (dd11 spans, tx13/tx23 packing): a WindowExec
    // group can NEVER be split across tasks, so a window partitioned
    // by a low-cardinality or content-hot key over corpus-scale rows
    // is one task sorting the hot group at any cluster size. Every
    // logical Window in every lane plan must be keyed by an
    // allowlisted high-cardinality key, include the range-partition
    // id (_pid — the two-phase prefix-sum form, bounded by one range
    // partition), or run over a REDUCED frame (an Aggregate or
    // bounded-heap TopKPerKey below it). Documented exceptions only.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    // `_pid` is the two-phase prefix-sum form: group size is bounded
    // by one range partition BY CONSTRUCTION (checkpoint-pinned
    // elsewhere in this suite), so it is structural, not probed.
    // Every other allowlisted NAME is a claim, and the r15 verdict's
    // watch item 2 is exactly that a claim by name is forgeable — a
    // content column aliased to `id` would sail through. So any window
    // admitted by name is now also PROBED: evaluate the window's child
    // frame and require the hottest partition key to be splittable
    // (max group ≤ max(256, rows/50) — entity-keyed groups stay
    // CONSTANT as the corpus grows, measured ~90 rows/user at every
    // sf, while the dd11/tx13 bug class plants 30%+ of ALL rows on
    // one value and fails both arms at every sf). A content column
    // aliased to an allowlisted name fails no matter what it's called.
    val highCardNames = Set("user_id", "o_custkey", "doc_id", "id")
    val exceptions = Map(
      // compaction planning consumes a FILE MANIFEST (one row per
      // file): metadata-scale input by construction, not corpus rows
      "q33_compaction_plan" -> "file-manifest input",
      // the r8 two-phase budget form: the only global window runs on
      // the map-side-filtered boundary bucket (~1/256 of one source,
      // PERF.md-measured); the bulk keep/drop never reaches a window
      "tx41_token_budget" -> "boundary-bucket slice")
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      if (exceptions.contains(name)) Nil
      else {
        val plan = SparkEntry.queries(name)(spark, sf)
          .queryExecution.optimizedPlan
        plan.collect {
          case w: LWindow =>
            val keys = w.partitionSpec.flatMap(_.references.map(_.name))
            val reduced = w.child.exists(n => n.isInstanceOf[Aggregate] ||
              n.getClass.getSimpleName == "TopKPerKey")
            if (reduced || keys.contains("_pid")) None
            else if (keys.exists(highCardNames)) {
              import org.apache.spark.sql.functions.{count, lit, max}
              val childDf = org.apache.spark.sql.graft.ColumnBridge
                .ofRows(spark, w.child)
              val keyCols = w.partitionSpec.map(
                org.apache.spark.sql.graft.ColumnBridge.column)
              val Array(maxGroup, n) = childDf.groupBy(keyCols: _*)
                .agg(count(lit(1)).as("g"))
                .agg(max(org.apache.spark.sql.functions.col("g")),
                  org.apache.spark.sql.functions.sum(
                    org.apache.spark.sql.functions.col("g")))
                .head().toSeq.map(_.asInstanceOf[Long]).toArray
              if (maxGroup <= math.max(256L, n / 50)) None
              else Some(s"$name windows on [${keys.mkString(",")}] " +
                s"whose hottest group holds $maxGroup of $n rows — " +
                "allowlisted NAME but not actually splittable")
            }
            else Some(s"$name windows on [${keys.mkString(",")}] over raw rows")
        }.flatten
      }
    }
    graft.Leases.releaseAll() // constructing leased lanes parks handles
    assert(offenders.isEmpty, offenders.mkString("; "))
  }

  test("gr1 pagerank final frame reads the iteration checkpoint, not lineage") {
    // each iteration localCheckpoints; the returned frame must be a
    // checkpoint read plus projection — re-deriving iterations through
    // lineage would re-run every join on every downstream action
    val df = SparkEntry.queries("gr1_pagerank")(spark, sf)
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.nonEmpty && leaves.forall(
      _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]),
      df.queryExecution.optimizedPlan.toString)
    graft.Leases.release("gr1_pagerank")
  }

  test("tx56 fused pipeline materializes the extraction exactly once; every branch reads the checkpoint") {
    // the fused crawl→text lane's contract: the WARC walk + HTML
    // extract run ONCE (one checkpoint at the plan fork), and the
    // langid/gopher/substring branches all read that LogicalRDD — a
    // lineage leak here would re-run the container walk once per
    // consumer on every action
    val df = SparkEntry.queries("tx56_warc_pipeline")(spark, sf)
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.nonEmpty, "no leaves")
    assert(leaves.forall(
      _.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]),
      s"non-checkpoint leaf (extraction lineage leaked into a branch):\n" +
        df.queryExecution.optimizedPlan.toString)
    // all leaves are the SAME checkpoint (one materialization, n reads)
    val rdds = leaves.map(
      _.asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd.id)
      .toSet
    assert(rdds.size == 1,
      s"expected one shared extraction checkpoint, got rdd ids $rdds")
    graft.Leases.release("tx56_warc_pipeline")
  }
}

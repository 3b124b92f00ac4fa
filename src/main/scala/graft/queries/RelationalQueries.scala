package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Relational query surface: scans, filters, aggregation, joins (broadcast /
  * semi / anti), window ranking, set ops, sort + limit.
  *
  * The reference pipeline is a map-only dataflow (SURVEY.md §2.9: no sorts,
  * limits, joins beyond one lookup, or set ops in
  * `/root/reference/city-directories.js`), so these queries exercise the
  * capabilities Spark supplies natively, on the driver's TPC-H-ish tables —
  * the oracle-checkable half of the engine's relational surface.
  *
  * Scale notes (100 TB):
  *  - every aggregate is a partial (map-side) agg before the shuffle — Spark's
  *    HashAggregate does this automatically for all these shapes;
  *  - dimension joins (`customer`, `nation`, `region`, filtered order keys)
  *    are explicitly `broadcast()` so the big fact side never shuffles;
  *  - rank-per-group uses a single window shuffle on the partition key, no
  *    self-join;
  *  - doubles aggregated across partitions are rounded in BOTH engines so the
  *    hash compare is stable under summation order.
  */
object RelationalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full-scan aggregation with map-side combine (TPC-H Q1 shape).
    "q1_agg" -> ((s, d) => {
      lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("n"))
    }),

    // Star-join: big fact (orders) against broadcast dims.
    "q2_region_revenue" -> ((s, d) => {
      val o = orders(s, d)
      val c = customer(s, d).select("c_custkey", "c_nationkey")
      val n = nation(s, d)
      val r = region(s, d)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name")
        .agg(round(sum("o_totalprice"), 2).as("revenue"),
             count(lit(1)).as("n_orders"))
    }),

    // Global top-k: sort + limit (Spark TakeOrderedAndProject — no full sort).
    "q3_topk_orders" -> ((s, d) => {
      orders(s, d)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("price").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // Per-group top-k: the rank-limited selection dispatches to the
    // bounded per-key heap (TopKPerKey emits the rank), NOT
    // row_number() OVER (PARTITION BY segment) — c_mktsegment has 5
    // values, so the window form is 5 tasks each sorting 1/5 of the
    // orders table at any scale, while the heap keeps ≤ k rows per key
    // per task before the exchange. Same rows, same rk (the order has
    // a unique o_orderkey tie-break).
    "q4_window_rank" -> ((s, d) => {
      val o = orders(s, d)
      val c = customer(s, d).select("c_custkey", "c_mktsegment")
      val joined = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      graft.plans.TopK.perKey(joined, Seq("c_mktsegment"),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
        .select(col("c_mktsegment"), col("rk"), col("o_orderkey"),
                round(col("o_totalprice"), 2).as("price"))
    }),

    // Anti join: customers with no pending ('P') order (NOT EXISTS).
    "q5_anti_join" -> ((s, d) => {
      val p = orders(s, d).filter(col("o_orderstatus") === "P")
      customer(s, d)
        .join(p, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey")
    }),

    // Semi join: customers with at least one 'F'-status order (EXISTS).
    "q6_semi_join" -> ((s, d) => {
      val f = orders(s, d).filter(col("o_orderstatus") === "F")
      customer(s, d)
        .join(f, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey")
    }),

    // Date-function aggregation per year.
    "q7_year_agg" -> ((s, d) => {
      orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("n"),
             round(sum("o_totalprice"), 2).as("total"))
    }),

    // GROUP BY ... HAVING.
    "q8_having" -> ((s, d) => {
      orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
             round(sum("o_totalprice"), 2).as("spend"))
        .filter(col("n_orders") >= 15)
    }),

    // Exact distinct counting per group (two-phase distinct agg).
    "q9_count_distinct" -> ((s, d) => {
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_suppkey")).as("n_supps"))
    }),

    // Set ops over derived key sets.
    "q10_intersect" -> ((s, d) => {
      val o = orders(s, d)
      val y95 = o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
      val y96 = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
      y95.intersect(y96).withColumnRenamed("o_custkey", "custkey")
    }),

    "q11_except" -> ((s, d) => {
      val o = orders(s, d)
      val y95 = o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
      val y96 = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
      y95.except(y96).withColumnRenamed("o_custkey", "custkey")
    }),

    // Salted two-phase aggregation (skew path) — must equal the plain
    // GROUP BY, which is exactly what the oracle runs.
    "q12_salted_agg" -> ((s, d) => {
      graft.operators.SkewOps
        .saltedSumCount(orders(s, d).select("o_custkey", "o_totalprice"),
          Seq("o_custkey"), "o_totalprice", salts = 16)
        .select(col("o_custkey"), round(col("total"), 2).as("total"),
          col("n"))
    }),

    // Running aggregate window (rows frame) per customer.
    "q13_running" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      orders(s, d).select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("running"))
    }),

    // Window-function breadth in ONE pass: ntile / percent_rank /
    // cume_dist / lag / lead share a single window spec, so Catalyst
    // plans ONE exchange + ONE sort for all five (check WindowExec in
    // the plan) — the rank ratios are exact small-integer quotients,
    // replayable bit-for-bit.
    "q29_window_suite" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      orders(s, d).select(col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cdist"),
        lag(col("o_orderkey"), 1).over(w).as("prev_key"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"))
    }),

    // The SAME top-3-per-segment as q4, through the custom TopKPerKey
    // physical operator (graft.plans) instead of a window sort — the
    // identical oracle proves rank equivalence, map-side heaps replace
    // the sort-everything shuffle.
    "q15_topk_native" -> ((s, d) => {
      val o = orders(s, d)
      val c = customer(s, d).select("c_custkey", "c_mktsegment")
      val joined = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      graft.plans.TopK.perKey(joined, Seq("c_mktsegment"),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
        .select(col("c_mktsegment"), col("rk"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"))
    }),

    // Date/time function breadth (SURVEY §2.10): trunc, extract, date
    // arithmetic, day differences.
    "q16_date_funcs" -> ((s, d) => {
      orders(s, d).select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        month(col("o_orderdate")).as("mon"),
        dayofweek(col("o_orderdate")).as("dow"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
        datediff(lit(java.sql.Date.valueOf("1998-12-31")),
          col("o_orderdate").cast("date")).as("days_to_eoy"))
    }),

    // Ordered-set aggregates: exact interpolated quantiles (DuckDB
    // quantile_cont semantics). Scale-safe here because Spark's exact
    // Percentile agg keeps a (value → count) map as partial state and
    // l_quantity has ~50 distinct values — the shuffle carries counts,
    // not row buffers. For high-cardinality columns at 100 TB the scale
    // path is approx_percentile (t-digest sketch, see tx5).
    "q17_percentiles" -> ((s, d) => {
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 2).as("p25"),
          round(expr("percentile(l_quantity, 0.5)"), 2).as("p50"),
          round(expr("percentile(l_quantity, 0.75)"), 2).as("p75"),
          round(expr("percentile(l_quantity, 0.9)"), 2).as("p90"),
          count(lit(1)).as("n"))
    }),

    // CUBE: totals over every (year, status) subset combination.
    "q19_cube" -> ((s, d) => {
      orders(s, d)
        .cube(year(col("o_orderdate")).as("yr"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
    }),

    // Arbitrary GROUPING SETS (not the cube/rollup lattice) with
    // grouping_id disambiguating which columns are aggregated away —
    // completes the group-by family next to q14 rollup and q19 cube.
    "q22_grouping_sets" -> ((s, d) => {
      val o = orders(s, d)
        .select(year(col("o_orderdate")).as("yr"), col("o_orderstatus"),
          col("o_totalprice"))
      o.groupingSets(
          Seq(Seq(col("yr"), col("o_orderstatus")), Seq(col("o_orderstatus")),
            Seq()),
          col("yr"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"),
          grouping_id().as("gid"))
    }),

    // Upsert/merge without a table format: synthetic updates (every
    // 10th customer re-segmented, balance bumped) win on key collision,
    // the rest of the dimension survives via one anti join.
    "q26_upsert" -> ((s, d) => {
      val cust = customer(s, d)
      val updates = cust.filter(col("c_custkey") % 10 === 0)
        .withColumn("c_acctbal", round(col("c_acctbal") + 100.0, 2))
        .withColumn("c_mktsegment", lit("UPSERTED"))
      graft.operators.TransformOps.upsert(cust, updates, Seq("c_custkey"))
        .select(col("c_custkey"), round(col("c_acctbal"), 2).as("bal"),
          col("c_mktsegment"))
    }),

    // Equi-width histogram of l_extendedprice (10 bins, bounds from the
    // data): scalar min/max broadcast into a one-pass binning agg.
    "q27_histogram" -> ((s, d) => {
      graft.operators.TransformOps.histogram(lineitem(s, d),
        "l_extendedprice", nBins = 10)
    }),

    // File-level zonemap skipping: lineitem range-laid-out on
    // l_shipdate into bounded files, a min/max manifest built per file,
    // and a year's slice answered by reading ONLY overlapping files
    // (predicate re-applied after the read — skipping prunes files, the
    // filter trims survivors). Oracle = the plain full-scan SQL: data
    // skipping must be invisible in results.
    // Small-file compaction planning: the manifest here is synthesized
    // from documents (part = source, file = doc_id, bytes = n_chars) so
    // the oracle can replay the binning exactly; CompactionSpec runs
    // the same planner over a REAL written parquet directory's
    // fileManifest. target=520 sits inside the n_chars range at every
    // sf, so keeps (oversized + singleton-bin) and rewrites both fire.
    "q33_compaction_plan" -> ((s, d) => {
      val manifest = documents(s, d).select(
        col("source").as("part"), col("doc_id").as("file"),
        col("n_chars").as("bytes"))
      graft.sources.Compaction.compactionPlan(manifest, 520L)
    }),

    // Bloom-pruned semi join: the build side (parts with p_size >= 48,
    // ~6% of the dimension) is collapsed to ONE bit array via the
    // distributed BloomFilterAggregate, probe rows are pre-filtered by
    // the codegen might_contain BEFORE the exact semi join, so at scale
    // only ~(selectivity + fpp) of the fact exchange survives. Blooms
    // have no false negatives and the exact join removes false
    // positives, so the oracle is the PLAIN semi-join SQL — the
    // reduction must be invisible in results.
    "q34_bloom_join" -> ((s, d) => {
      val dim = part(s, d).filter(col("p_size") >= 48)
        .select(col("p_partkey").as("l_partkey"))
      val li = lineitem(s, d)
        .select("l_partkey", "l_returnflag", "l_quantity")
      graft.operators.BloomJoin.bloomSemiJoin(li, dim, "l_partkey", 256L)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
    }),

    // Columnar-format interchange (q35): the managed partitioned sink
    // at format = orc (Spark's second built-in columnar format), read
    // back through the same file source — partition pruning on the
    // directory layout and predicate/column pushdown must survive the
    // format swap (plan-pinned), and the roundtrip must be lossless
    // (the oracle reads the ORIGINAL parquet table).
    "q35_orc_roundtrip" -> ((s, d) => {
      // sanitized path, not hashCode: abs(Int.MinValue) stays negative
      // and two dataset paths can collide on hashCode
      val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft-orc-${d.replaceAll("[^A-Za-z0-9._-]", "_")}").toString
      graft.sources.Compaction.writePartitioned(
        documents(s, d).select("doc_id", "lang", "n_chars", "source"),
        dir, Seq("source"), clusterBy = Seq("doc_id"), format = "orc")
      s.read.orc(dir)
        .filter(col("source") === "src3" && col("n_chars") >= 100)
        .select("doc_id", "lang", "n_chars")
    }),

    // CSV interchange (q36): the lingua-franca text format, gated on
    // the part that actually breaks pipelines — QUOTING. Every row
    // carries a field with an embedded delimiter, quote AND newline;
    // the lane writes partitioned CSV with header and reads it back
    // with an explicit schema (production never infers) under
    // multiLine. Scale note: multiLine CSV files are NON-SPLITTABLE
    // (a reader cannot seek into a quoted newline), so the writer caps
    // maxRecordsPerFile — read parallelism survives as file count, the
    // same trade gzip text makes. Partition pruning on the directory
    // key still applies (source=src3 reads one branch). The oracle
    // rebuilds the adversarial field from parquet: a quoting bug on
    // either side shifts the hash.
    "q36_csv_roundtrip" -> ((s, d) => {
      val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft-csv-${d.replaceAll("[^A-Za-z0-9._-]", "_")}").toString
      val tricky = concat(lit("v,\""), col("lang"), lit("\"\n"),
        col("source"), lit(","), col("doc_id"))
      documents(s, d)
        .select(col("doc_id"), col("n_chars"), tricky.as("tricky"),
          col("source"))
        .repartition(col("source"))
        .write.mode("overwrite").option("header", "true")
        .option("maxRecordsPerFile", 2000L)
        .partitionBy("source").csv(dir)
      s.read.option("header", "true").option("multiLine", "true")
        .schema("doc_id BIGINT, n_chars BIGINT, tricky STRING, source STRING")
        .csv(dir)
        .filter(col("source") === "src3")
        .select("doc_id", "n_chars", "tricky")
    }),

    // Parquet schema evolution (q37): a long-lived dataset's writers
    // gain a column mid-stream — the v1 files (doc_id, n_chars) and
    // the appended v2 files (+ lang) coexist in one directory, and the
    // read MUST set mergeSchema: the default samples ONE footer, so
    // whether `lang` exists at all would depend on which file wins —
    // the classic silent-column-loss bug. Merged rows surface v1's
    // missing column as real nulls IN BAND (the null group aggregates
    // like any other). Scale note: mergeSchema reads every footer at
    // planning — fine as an explicit migration-window setting, wrong
    // as a permanent default; production promotes the merged schema
    // into an explicit read schema once the migration completes.
    "q37_schema_evolution" -> ((s, d) => {
      val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft-evo-${d.replaceAll("[^A-Za-z0-9._-]", "_")}").toString
      val docs = documents(s, d)
      docs.filter(col("doc_id") % 2 === 0)
        .select("doc_id", "n_chars")
        .write.mode("overwrite").parquet(dir)
      docs.filter(col("doc_id") % 2 =!= 0)
        .select("doc_id", "n_chars", "lang")
        .write.mode("append").parquet(dir)
      s.read.option("mergeSchema", "true").parquet(dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
    }),

    // Consumes the BANKED zone-mapped layout + manifest
    // ([[ZonemapFixture]]): a sort-clustered table layout and its
    // file-stats manifest are ARTIFACTS a pipeline writes once and
    // many queries skip-scan against (exactly Delta/Iceberg file
    // stats) — rebuilding the layout inside every invocation timed the
    // writer, not the data skipping this lane exists to exercise (the
    // IvfFixture/KnnEdgesFixture discipline; build stays golden-gated
    // in CompactionSpec and its wall time lands in the bench prelude).
    "q28_zonemap" -> ((s, d) => {
      val fx = ZonemapFixture.dir(s, d)
      val manifest = graft.Tables.immutablePath(s, s"$fx/manifest")
      val lo = lit("1997-01-01").cast("timestamp")
      val hi = lit("1997-12-31").cast("timestamp")
      graft.sources.Compaction.zonemapPrunedRead(s, manifest,
          "l_shipdate", lo, hi)
        .filter(col("l_shipdate").between(lo, hi))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("total"))
    }),

    // Null-semantics surface: null-safe equality (<=>) join plus the
    // coalesce/nullif family — null keys MATCH under <=> (one group)
    // where plain equality drops them, the classic silent-row-loss
    // trap. Both sides derive nullable keys via nullif. seg_total sums
    // as decimal(18,2) — exact and order-independent (inputs are
    // semantically 2-decimal prices, so the per-row double→decimal
    // cast is exact in both engines). Oracle gotcha: DuckDB sum(INT)
    // returns HUGEINT, which pandas coerces to float64 while Spark's
    // sum(int) is int64 — equal values, different dtype, hash fail —
    // so the oracle casts n_null_rows back to ::BIGINT.
    "q32_null_safe_join" -> ((s, d) => {
      val c = customer(s, d).select(col("c_custkey"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"))
      val o = orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(nullif(col("c_mktsegment"), lit("BUILDING")).as("seg2"),
          col("o_totalprice"))
        .groupBy(col("seg2"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("seg_total"))
      c.join(o, col("seg") <=> col("seg2"))
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n_customers"),
          max(col("seg_total")).as("seg_total"),
          sum(col("seg").isNull.cast("int")).as("n_null_rows"))
    }),

    // Correlated scalar subquery through the SQL front end: customers
    // above their own nation's average balance. Catalyst DECORRELATES
    // this into an aggregate + join (RewriteCorrelatedScalarSubquery)
    // — the classic optimizer transform, exercised as SQL, not
    // hand-lowered.
    "q31_correlated_subquery" -> ((s, d) => {
      customer(s, d).createOrReplaceTempView("customer_v")
      s.sql("""
        SELECT c_nationkey, count(*) AS n_above,
               round(min(c_acctbal), 2) AS min_above
        FROM customer_v c
        WHERE c_acctbal > (SELECT round(avg(c2.c_acctbal), 2)
                           FROM customer_v c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        GROUP BY c_nationkey""")
    }),

    // Salted skew join: lineitem ⋈ orders on the order key with the
    // big side salted and the small side replicated ×8 — the explicit
    // skew-spread for heavy keys known before plan time. The oracle is
    // the PLAIN join: salting must be invisible in results.
    "q30_salted_join" -> ((s, d) => {
      val joined = graft.operators.SkewOps.saltedJoin(
        lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice")),
        orders(s, d).select(col("o_orderkey").as("l_orderkey"),
          col("o_orderstatus")),
        Seq("l_orderkey"), salts = 8)
      joined.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("total"))
    }),

    // Blocked fuzzy join on edit distance, DICTIONARY-FIRST: distinct
    // names are extracted (with their row multiplicity), the quadratic
    // comparison runs on the small dictionary inside last-token blocks,
    // and pair weights multiply back the multiplicities — comparing raw
    // rows would square every duplicated name (the classic fuzzy-join
    // mistake at scale). levenshtein is an exact integer metric both
    // engines compute identically.
    "q25_fuzzy_join" -> ((s, d) => {
      val names = part(s, d).groupBy(col("p_name"))
        .agg(count(lit(1)).as("_m"))
        .withColumn("_blk", element_at(split(col("p_name"), " "), -1))
      val l = names.select(col("p_name").as("na"), col("_m").as("ma"),
        col("_blk"))
      val r = names.select(col("p_name").as("nb"), col("_m").as("mb"),
        col("_blk"))
      l.join(r, Seq("_blk")).filter(col("na") < col("nb"))
        .withColumn("dist", levenshtein(col("na"), col("nb")))
        .filter(col("dist") <= 4)
        .groupBy("dist")
        .agg(count(lit(1)).as("n_name_pairs"),
          sum(col("ma") * col("mb")).as("n_row_pairs"))
    }),

    // Approximate percentiles (GK sketch — the mergeable scale path
    // next to q17's exact counts-map): at maximum accuracy the sketch
    // degenerates to exact discrete percentiles, which DuckDB's
    // quantile_disc replays — so the approximate OPERATOR gets an
    // EXACT oracle.
    // Output is one scalar column per requested percentile (not a
    // top-level array — the driver's oracle checker can only sort/hash
    // scalar cells).
    "q24_approx_percentile" -> ((s, d) => {
      orders(s, d)
        .groupBy("o_orderpriority")
        .agg(percentile_approx(col("o_totalprice"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(Int.MaxValue))
          .as("_p"))
        .select(col("o_orderpriority"),
          element_at(col("_p"), 1).as("p50"),
          element_at(col("_p"), 2).as("p90"),
          element_at(col("_p"), 3).as("p99"))
    }),

    // Morton z-order codes over (year, custkey) — the clustering key
    // behind Compaction.writeZOrdered; the oracle replays the exact
    // 62-term bit interleave.
    "q23_zorder" -> ((s, d) => {
      orders(s, d).select(col("o_orderkey"),
        graft.functions.Morton.morton(
          year(col("o_orderdate")), col("o_custkey").cast("int")).as("z"))
    }),

    // Bag semantics: EXCEPT ALL keeps duplicate multiplicity (the
    // distinct variant is q11).
    "q20_except_all" -> ((s, d) => {
      val o = orders(s, d).select(col("o_orderpriority").as("p"))
      o.exceptAll(o.filter(col("p").startsWith("1")))
    }),

    // Unpivot/melt: wide per-year status columns back to long form.
    "q21_unpivot" -> ((s, d) => {
      orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(round(sum("o_totalprice"), 2))
        .unpivot(Array(col("yr")), Array(col("F"), col("O"), col("P")),
          "status", "total")
        .filter(col("total").isNotNull)
    }),

    // Pivot: status columns per year (explicit value list keeps the
    // schema static — no extra pass to discover pivot values).
    "q18_pivot" -> ((s, d) => {
      orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(round(sum("o_totalprice"), 2))
    }),

    // Hierarchical totals: ROLLUP(year, status).
    "q14_rollup" -> ((s, d) => {
      orders(s, d)
        .rollup(year(col("o_orderdate")).as("yr"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_price,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS n
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q2_region_revenue" ->
      """SELECT r_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name""",
    "q3_topk_orders" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price
         FROM orders ORDER BY price DESC, o_orderkey ASC LIMIT 10""",
    "q4_window_rank" ->
      """SELECT c_mktsegment, rk, o_orderkey, price FROM (
           SELECT c_mktsegment,
                  row_number() OVER (PARTITION BY c_mktsegment
                                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk,
                  o_orderkey, round(o_totalprice, 2) AS price
           FROM orders JOIN customer ON o_custkey = c_custkey)
         WHERE rk <= 3""",
    "q5_anti_join" ->
      """SELECT c_custkey FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""",
    "q6_semi_join" ->
      """SELECT c_custkey FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""",
    "q7_year_agg" ->
      """SELECT year(o_orderdate) AS yr, count(*) AS n,
                round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY yr""",
    "q8_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
                round(sum(o_totalprice), 2) AS spend
         FROM orders GROUP BY o_custkey HAVING count(*) >= 15""",
    "q9_count_distinct" ->
      """SELECT l_returnflag,
                count(DISTINCT l_partkey) AS n_parts,
                count(DISTINCT l_suppkey) AS n_supps
         FROM lineitem GROUP BY l_returnflag""",
    "q10_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
         INTERSECT
         SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996""",
    "q11_except" ->
      """SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
         EXCEPT
         SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996""",
    "q12_salted_agg" ->
      """SELECT o_custkey, round(sum(o_totalprice), 2) AS total,
                count(*) AS n
         FROM orders GROUP BY o_custkey""",
    "q13_running" ->
      """SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS UNBOUNDED PRECEDING), 2) AS running
         FROM orders""",
    "q15_topk_native" ->
      """SELECT c_mktsegment, rk, o_orderkey, price FROM (
           SELECT c_mktsegment,
                  row_number() OVER (PARTITION BY c_mktsegment
                                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk,
                  o_orderkey, round(o_totalprice, 2) AS price
           FROM orders JOIN customer ON o_custkey = c_custkey)
         WHERE rk <= 3""",
    "q16_date_funcs" ->
      """SELECT o_orderkey,
           date_trunc('month', o_orderdate)::DATE AS month_start,
           month(o_orderdate) AS mon,
           dayofweek(o_orderdate) + 1 AS dow,
           (o_orderdate::DATE + INTERVAL 30 DAY)::DATE AS due_date,
           datediff('day', o_orderdate::DATE, DATE '1998-12-31') AS days_to_eoy
         FROM orders""",
    "q17_percentiles" ->
      """SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 2) AS p25,
           round(quantile_cont(l_quantity, 0.5), 2) AS p50,
           round(quantile_cont(l_quantity, 0.75), 2) AS p75,
           round(quantile_cont(l_quantity, 0.9), 2) AS p90,
           count(*) AS n
         FROM lineitem GROUP BY l_returnflag""",
    "q19_cube" ->
      """SELECT year(o_orderdate) AS yr, o_orderstatus, count(*) AS n
         FROM orders GROUP BY CUBE (yr, o_orderstatus)""",
    "q26_upsert" ->
      """WITH u AS (SELECT c_custkey, round(c_acctbal + 100.0, 2) AS bal,
                      'UPSERTED' AS c_mktsegment
                    FROM customer WHERE c_custkey % 10 = 0)
         SELECT c_custkey, bal, c_mktsegment FROM u
         UNION ALL
         SELECT c_custkey, round(c_acctbal, 2), c_mktsegment
         FROM customer
         WHERE c_custkey NOT IN (SELECT c_custkey FROM u)""",
    "q32_null_safe_join" ->
      """WITH c AS (SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg
                    FROM customer),
         o AS (SELECT nullif(c_mktsegment, 'BUILDING') AS seg2,
                 sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS seg_total
               FROM orders JOIN customer ON o_custkey = c_custkey
               GROUP BY 1)
         SELECT seg, count(*) AS n_customers,
           max(seg_total) AS seg_total,
           sum((seg IS NULL)::INT)::BIGINT AS n_null_rows
         FROM c JOIN o ON seg IS NOT DISTINCT FROM seg2
         GROUP BY seg""",
    "q31_correlated_subquery" ->
      """SELECT c_nationkey, count(*) AS n_above,
           round(min(c_acctbal), 2) AS min_above
         FROM customer c
         WHERE c_acctbal > (SELECT round(avg(c2.c_acctbal), 2)
                            FROM customer c2
                            WHERE c2.c_nationkey = c.c_nationkey)
         GROUP BY c_nationkey""",
    "q30_salted_join" ->
      """SELECT o_orderstatus, count(*) AS n,
           round(sum(l_extendedprice), 2) AS total
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderstatus""",
    "q29_window_suite" ->
      """SELECT o_custkey, o_orderkey,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cdist,
           lag(o_orderkey, 1) OVER w AS prev_key,
           lead(o_orderkey, 1) OVER w AS next_key
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC)""",
    "q27_histogram" ->
      """WITH mm AS (SELECT min(l_extendedprice)::DOUBLE AS mn,
                       max(l_extendedprice)::DOUBLE AS mx
                     FROM lineitem)
         SELECT (CASE WHEN mx = mn THEN 0
                 ELSE least(floor((l_extendedprice::DOUBLE - mn) * 10 /
                                  (mx - mn)), 9) END)::INT AS bin,
           count(*) AS n,
           round(min(l_extendedprice::DOUBLE), 4) AS lo,
           round(max(l_extendedprice::DOUBLE), 4) AS hi
         FROM lineitem CROSS JOIN mm
         WHERE l_extendedprice IS NOT NULL
         GROUP BY 1""",
    "q28_zonemap" ->
      """SELECT count(*) AS n, round(sum(l_extendedprice), 2) AS total
         FROM lineitem
         WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01'
                              AND TIMESTAMP '1997-12-31'""",
    "q33_compaction_plan" ->
      """WITH m AS (SELECT source AS part, doc_id AS file,
                      n_chars AS bytes FROM documents),
         binned AS (
           SELECT part, file, bytes,
             ((sum(bytes) OVER (PARTITION BY part ORDER BY file
                ROWS UNBOUNDED PRECEDING) - bytes)::BIGINT // 520)::BIGINT
               AS bin
           FROM m WHERE bytes < 520),
         sized AS (SELECT part, bin, count(*) AS nf
                   FROM binned GROUP BY 1, 2)
         SELECT b.part, b.file, b.bytes,
           (CASE WHEN s.nf = 1 THEN -1 ELSE b.bin END)::BIGINT AS bin,
           CASE WHEN s.nf = 1 THEN 'keep' ELSE 'rewrite' END AS action
         FROM binned b JOIN sized s ON b.part = s.part AND b.bin = s.bin
         UNION ALL
         SELECT part, file, bytes, -1::BIGINT AS bin, 'keep' AS action
         FROM m WHERE bytes >= 520""",
    "q34_bloom_join" ->
      """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
         FROM lineitem
         WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 48)
         GROUP BY 1""",
    // losslessness is the assertion: the oracle reads the ORIGINAL
    // parquet table, the lane reads its own ORC rewrite
    "q35_orc_roundtrip" ->
      """SELECT doc_id, lang, n_chars FROM documents
         WHERE source = 'src3' AND n_chars >= 100""",
    // the merged view replayed from the unsplit table: even ids lose
    // lang (the v1 files never had it), odd ids keep theirs
    "q37_schema_evolution" ->
      """SELECT CASE WHEN doc_id % 2 = 0 THEN NULL ELSE lang END AS lang,
           count(*) AS n, sum(n_chars)::BIGINT AS sum_chars
         FROM documents
         GROUP BY 1""",
    // the adversarial field rebuilt from parquet — the CSV writer and
    // reader must round-trip the embedded delimiter/quote/newline
    // exactly or the hash shifts
    "q36_csv_roundtrip" ->
      """SELECT doc_id, n_chars,
           'v,"' || lang || '"' || chr(10) || source || ','
             || doc_id::VARCHAR AS tricky
         FROM documents WHERE source = 'src3'""",
    "q25_fuzzy_join" ->
      """WITH n AS (SELECT p_name, count(*) AS m,
                      string_split(p_name, ' ')[-1] AS blk
                    FROM part GROUP BY p_name)
         SELECT levenshtein(l.p_name, r.p_name) AS dist,
           count(*) AS n_name_pairs,
           sum(l.m * r.m)::BIGINT AS n_row_pairs
         FROM n l JOIN n r ON l.blk = r.blk AND l.p_name < r.p_name
         WHERE levenshtein(l.p_name, r.p_name) <= 4
         GROUP BY dist""",
    "q24_approx_percentile" ->
      """SELECT o_orderpriority,
           quantile_disc(o_totalprice, 0.5) AS p50,
           quantile_disc(o_totalprice, 0.9) AS p90,
           quantile_disc(o_totalprice, 0.99) AS p99
         FROM orders GROUP BY o_orderpriority""",
    "q23_zorder" ->
      s"""SELECT o_orderkey,
         ${graft.functions.Morton.sqlFor("year(o_orderdate)", "o_custkey::INT")}
           AS z FROM orders""",
    "q22_grouping_sets" ->
      """SELECT year(o_orderdate) AS yr, o_orderstatus, count(*) AS n,
           round(sum(o_totalprice), 2) AS total,
           grouping(yr, o_orderstatus) AS gid
         FROM orders
         GROUP BY GROUPING SETS ((yr, o_orderstatus), (o_orderstatus), ())""",
    "q20_except_all" ->
      """SELECT o_orderpriority AS p FROM orders
         EXCEPT ALL
         SELECT o_orderpriority AS p FROM orders WHERE o_orderpriority LIKE '1%'""",
    "q21_unpivot" ->
      """WITH w AS (
           SELECT year(o_orderdate) AS yr,
             round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS f,
             round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS o,
             round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS p
           FROM orders GROUP BY yr)
         SELECT yr, status, total FROM (
           SELECT yr, 'F' AS status, f AS total FROM w
           UNION ALL SELECT yr, 'O', o FROM w
           UNION ALL SELECT yr, 'P', p FROM w)
         WHERE total IS NOT NULL""",
    "q18_pivot" ->
      """SELECT year(o_orderdate) AS yr,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS "F",
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS "O",
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS "P"
         FROM orders GROUP BY yr""",
    "q14_rollup" ->
      """SELECT year(o_orderdate) AS yr, o_orderstatus,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY ROLLUP (yr, o_orderstatus)"""
  )
}

/** Build-once-per-session holder for q28's zone-mapped lineitem layout
  * and its file-stats manifest — [[graft.operators.IvfFixture]]'s
  * reasoning on the storage-layout axis. A sort-clustered table layout
  * plus its zonemap manifest is an ARTIFACT (the file-level min/max
  * stats a Delta/Iceberg metadata layer persists): a pipeline writes it
  * once per compaction cycle and MANY queries skip-scan against it.
  * Re-writing the 8-file range-partitioned copy of lineitem inside
  * every q28 invocation timed the writer, not the pruned read the lane
  * gates. The BUILD stays golden-gated (CompactionSpec: manifest covers
  * every file, pruned read row-identical) and its wall time is visible
  * in the bench's `prelude_sec`. Marker-gated like every persisted
  * fixture; per-JVM memoization rebuilds from current table state in
  * each new Verify/Bench process.
  */
object ZonemapFixture {

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def dir(s: SparkSession, d: String): String =
    graft.operators.IvfFixture.checkMarker(
      built.computeIfAbsent(s"zonemap:$d", _ => {
        val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
          s"graft-zonemap-fx-${d.replaceAll("[^A-Za-z0-9._-]", "_")}")
          .toString
        graft.operators.IvfFixture.buildWithMarker(dir) {
          val data = java.nio.file.Paths.get(dir, "data").toString
          lineitem(s, d)
            .select("l_orderkey", "l_quantity", "l_extendedprice",
              "l_shipdate")
            .repartitionByRange(8, col("l_shipdate"))
            .sortWithinPartitions("l_shipdate")
            .write.mode("overwrite").option("maxRecordsPerFile", 4000L)
            .parquet(data)
          graft.sources.Compaction.zonemapBuild(s, data, Seq("l_shipdate"))
            .write.mode("overwrite")
            .parquet(java.nio.file.Paths.get(dir, "manifest").toString)
        }
      }))
}

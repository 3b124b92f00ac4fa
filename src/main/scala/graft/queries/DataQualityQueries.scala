package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.DataQualityOps
import graft.operators.DataQualityOps._

/** Data-quality lanes (dq*): a declarative constraint suite compiled
  * to one aggregate pass, and a per-slice quality report. Thresholds
  * are chosen so the gated corpus exercises BOTH branches of `passed`
  * (min/max bounds and the language-subset ratio fail; the rest pass)
  * — a report that can only say "true" verifies nothing.
  */
object DataQualityQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq1_constraints" -> ((s, d) =>
      DataQualityOps.suite(documents(s, d), Seq(
        rowCountMin(1),
        completeness("text", 1.0),
        distinctness("doc_id", 1.0),
        matchRatio("lang", "^[a-z]{2}$", 1.0),
        inSetRatio("lang", Seq("en", "de", "fr"), 0.9), // fails: ~0.70
        minOf("n_chars", 50.0),                         // fails: 48/44
        maxOf("n_chars", 520.0),                        // fails: 553/577
        predicateRatio("text_len_consistent",
          length(col("text")) === col("n_chars"), 1.0),
        predicateRatio("en_share", col("lang") === "en", 0.35, 0.5)
      ))),

    "dq2_slice_quality" -> ((s, d) =>
      DataQualityOps.sliceReport(documents(s, d), "source",
        "text", "n_chars", minRows = 20L, minLen = 55L)),

    // Row-level quarantine: dq1 reports SUITE metrics; a real ingest
    // also needs the failing ROWS routed in-band with their violation
    // names. The gated surface is the quarantine frame's per-check
    // counts plus the partition totals (keep + quarantine = input,
    // asserted in DataQualitySpec). All three checks fire at both
    // gated scales (148/2/20 rows at sf0.01) and most rows pass —
    // both branches of the split are exercised.
    "dq3_quarantine" -> ((s, d) => {
      val split = DataQualityOps.quarantineSplit(documents(s, d), Seq(
        rowInSet("lang", Seq("en", "de", "fr")),
        rowMin("n_chars", 50L),
        rowMax("n_chars", 520L)))
      val perCheck = split.quarantine
        .select(explode(col("violations")).as("check_name"))
        .groupBy("check_name").agg(count(lit(1)).as("n_rows"))
      perCheck
        .unionByName(split.quarantine.agg(count(lit(1)).as("n_rows"))
          .select(lit("_rows_quarantined").as("check_name"), col("n_rows")))
        .unionByName(split.keep.agg(count(lit(1)).as("n_rows"))
          .select(lit("_rows_kept").as("check_name"), col("n_rows")))
    }),

    // Cross-snapshot profile drift, on the tx42 snapshot derivation
    // (old = ids not divisible by 7; new = ids not divisible by 5,
    // every 11th text modified) plus nulled lang on every 13th id so
    // the null-rate test has something to catch. At 5% permille-
    // threshold the gated corpus drifts on doc_id/text (cardinality +
    // range), lang (nulls + range) and leaves n_chars/source range-only
    // or clean — every verdict column fires both ways.
    "dq5_profile_drift" -> ((s, d) => {
      val docs = documents(s, d)
      val oldSnap = docs.filter(col("doc_id") % 7 =!= 0)
      val newSnap = docs.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text", when(col("doc_id") % 11 === 0,
          concat(col("text"), lit(" mod"))).otherwise(col("text")))
        .withColumn("lang", when(col("doc_id") % 13 === 0,
          lit(null).cast("string")).otherwise(col("lang")))
      DataQualityOps.profileDrift(oldSnap, newSnap,
        Seq("doc_id", "text", "lang", "source", "n_chars"),
        maxPermille = 50L)
    }),

    // Robust per-slice outlier fences: |n_chars − median| > k·MAD per
    // language, exact discrete percentiles so the whole report is
    // integer arithmetic (no mean/σ for the outliers to drag). k=2 on
    // the gated corpus flags the length tails in every language slice
    // (~2–4% of rows) — both branches of is_outlier are exercised.
    "dq4_robust_outliers" -> ((s, d) =>
      DataQualityOps.robustOutliers(documents(s, d), "lang", "n_chars",
          k = 2L)
        .select("doc_id", "lang", "n_chars", "med", "mad", "is_outlier")),

    // True uniqueness vs distinctness, per column in one melted pass:
    // doc_id is a perfect key (1.0/1.0), lang/source are categorical
    // (~0 uniqueness), n_chars sits between — all regimes fire.
    "dq7_uniqueness" -> ((s, d) =>
      DataQualityOps.uniquenessReport(documents(s, d),
        Seq("doc_id", "lang", "source", "n_chars"))),

    // Referential integrity across the star schema: two consistent FK
    // relations (orders→customer, lineitem→orders — zero orphans,
    // passed=true) plus events checked against a REDUCED customer
    // snapshot (c_custkey % 3 <> 0, the late-arriving-dimension
    // scenario) so the orphan branch genuinely fires (~1/3 of events
    // at every sf). One broadcast-marker pass per relation; counts are
    // exact integers.
    "dq6_referential_integrity" -> ((s, d) =>
      DataQualityOps.referentialIntegrity(Seq(
        FkRelation("orders.custkey->customer",
          orders(s, d), "o_custkey", customer(s, d), "c_custkey"),
        FkRelation("lineitem.orderkey->orders",
          lineitem(s, d), "l_orderkey", orders(s, d), "o_orderkey"),
        FkRelation("events.user->customer_snapshot",
          events(s, d), "user_id",
          customer(s, d).filter(col("c_custkey") % 3 =!= 0),
          "c_custkey")))),

    // Media ingest health (dq8): the dq1 one-pass constraint suite
    // pointed at REAL decode outputs — per-modality decode rates, dim
    // bounds from the decoded headers, and a conjunctive all-modalities
    // gate whose threshold deliberately FAILS (the corrupt rules
    // compound to ~0.75, the report must be able to say so). One join
    // of the three kernel outputs, one aggregate pass; the oracle never
    // parses bytes — it replays the rates and bounds from the fixtures'
    // corrupt rules and generative dims.
    "dq8_media_health" -> ((s, d) => {
      import graft.operators.MultimodalOps
      val docs = documents(s, d)
      val img = MultimodalOps.decodeImageFeatures(
        MultimodalOps.synthBmpAssets(docs, "doc_id"))
        .select(col("asset_id"), col("decoded").as("img_ok"),
          col("img_w"))
      val aud = MultimodalOps.decodeAudioFeatures(
        MultimodalOps.synthWavAssets(docs, "doc_id"))
        .select(col("asset_id"), col("decoded").as("aud_ok"),
          col("n_samples"))
      val vid = MultimodalOps.sampleVideoFrames(
        MultimodalOps.synthY4mAssets(docs, "doc_id"), stride = 2)
        .groupBy("asset_id")
        .agg(max(col("decoded")).as("vid_ok"),
          max(col("n_frames")).as("n_frames"))
      DataQualityOps.suite(
        img.join(aud, Seq("asset_id")).join(vid, Seq("asset_id")),
        Seq(
          rowCountMin(1),
          predicateRatio("img_decode_rate", col("img_ok"), 0.9),
          predicateRatio("aud_decode_rate", col("aud_ok"), 0.9),
          predicateRatio("vid_decode_rate", col("vid_ok"), 0.85),
          predicateRatio("all_modalities",
            col("img_ok") && col("aud_ok") && col("vid_ok"),
            0.8),                              // fails: ~0.75
          minOf("img_w", 4.0),
          maxOf("img_w", 8.0),
          minOf("n_samples", 50.0),
          maxOf("n_samples", 81.0),
          maxOf("n_frames", 7.0)))
    }),

    // Persisted-index integrity (dq9): mm21's gate covers the index
    // CONTENT only through capped, batch-intersecting buckets — this
    // lane audits the whole artifact row-for-row: total postings must
    // equal the corpus' distinct (asset, fingerprint) set (an append
    // that double-writes inflates n_rows past n_distinct; one that
    // drops rows deflates both against the analytic replay), no null
    // keys may have been written, and the asset count pins that both
    // index halves (built %5 in 1..3, appended %5=4) landed. Four
    // exact integers off one aggregate pass over the parquet read.
    "dq9_index_integrity" -> ((s, d) =>
      indexIntegrity(s, graft.operators.FrameIndexFixture.dir(s, d),
        "fhash")),

    // dq9's whole-artifact audit on the other two posting indexes —
    // one generic integrity aggregate, three gated artifacts
    "dq10_segment_index_integrity" -> ((s, d) =>
      indexIntegrity(s, graft.operators.SegmentIndexFixture.dir(s, d),
        "skey")),

    "dq11_chunk_index_integrity" -> ((s, d) =>
      indexIntegrity(s, graft.operators.ChunkIndexFixture.dir(s, d),
        "chunk_key")),

    // Tombstone-state audit (dq13): dq9's whole-artifact discipline
    // extended to the MERGE-ON-READ state mm28 introduced — ghost
    // rows (postings of tombstoned assets still on disk) are
    // legitimate between vacuums but must be exactly the tombstoned
    // assets' postings, and the tombstone table itself must census
    // against the deletion rule; n_ghost_rows is the number an
    // operator watches to schedule postingIndexVacuum.
    "dq13_tombstone_audit" -> ((s, d) =>
      tombstoneAudit(s, graft.operators.FrameDeleteIndexFixture.dir(s, d),
        "fhash")),

    // k-anonymity census (dq14): quasi-identifier = (nation, market
    // segment, account-balance century) over the customer dimension —
    // a combination shared by < 5 rows re-identifies its members. The
    // bucket count scales the group census into the violating regime
    // at every sf (≈2.8k combinations vs 1.5k/15k customers), so both
    // the violating and the safe mass are non-trivial.
    "dq14_kanonymity" -> ((s, d) =>
      DataQualityOps.kAnonymity(
        customer(s, d).withColumn("bal_c",
          floor(col("c_acctbal") / 100).cast("long")),
        Seq("c_nationkey", "c_mktsegment", "bal_c"), k = 5L)),

    // End-to-end record-level provenance audit (dq15): source →
    // transform → shard placement ≡ manifest claim, the lineage loop
    // tx32's manifests and the mm28/ss22 takedown discipline leave
    // open. The lane builds the chain in-lane (kept = ≥5 tokens and
    // id%3≠1; tombstones = id%17; placements = shardAssign 16) and
    // then CORRUPTS the placements so every violation class fires
    // nonzero: %97 placements dropped (lost), ghosts at id+700000 for
    // %89 (never in source), tombstoned-but-even ids shipped anyway
    // (takedown leaks), transform-dropped %3=1∧%79=0 ids shipped
    // (unplanned), %101 placements doubled (dups); the manifest keeps
    // the UNcorrupted claims, so drift counts the shifted shards.
    "dq15_provenance" -> ((s, d) => {
      import graft.operators.TextAnalysisOps.shardAssign
      val docs = documents(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens"))
      val kept = docs.filter(col("n_tokens") >= 5 &&
        col("doc_id") % 3 =!= 1)
      val tombs = docs.filter(col("doc_id") % 17 === 0)
        .select("doc_id")
      val truePlace = kept.join(tombs, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), shardAssign(col("doc_id"), 16).as("shard"))
      val manifest = truePlace.groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"))
      val corrupted = truePlace
        .filter(col("doc_id") % 97 =!= 0)
        .unionByName(docs.filter(col("doc_id") % 89 === 0)
          .select((col("doc_id") + 700000).as("doc_id"),
            shardAssign(col("doc_id") + 700000, 16).as("shard")))
        .unionByName(kept.join(tombs, Seq("doc_id"), "left_semi")
          .filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"),
            shardAssign(col("doc_id"), 16).as("shard")))
        .unionByName(docs
          .filter(col("doc_id") % 3 === 1 && col("doc_id") % 79 === 0)
          .select(col("doc_id"),
            shardAssign(col("doc_id"), 16).as("shard")))
        .unionByName(truePlace.filter(col("doc_id") % 101 === 0))
      DataQualityOps.provenanceAudit(docs, kept, tombs, corrupted,
        manifest, "doc_id")
    }),

    // Functional-dependency violation report (dq12): schema-rule
    // discovery over column PAIRS — dq7's uniqueness can't express
    // "does source determine language". Three candidate rules on the
    // gated corpus: source → lang is VIOLATED (every source carries
    // several languages), lang → its first letter HOLDS by
    // construction, doc_id → source holds with one group per row —
    // both verdicts and all counters fire.
    "dq12_fd_report" -> ((s, d) => {
      val docs = documents(s, d)
        .withColumn("lang_family", substring(col("lang"), 1, 1))
      DataQualityOps.fdReport(docs, Seq(
        "source" -> "lang", "lang" -> "lang_family", "doc_id" -> "source"))
    })
  )

  /** One aggregate pass over a posting-index read: total postings,
    * distinct postings (an append that double-writes splits these),
    * null keys (must be zero — builders filter them), distinct assets
    * (pins that every index half landed). */
  private def indexIntegrity(s: SparkSession, dir: String,
                             keyCol: String): DataFrame =
    graft.Tables.immutablePath(s, dir)
      .select(col("asset_id"), col(keyCol))
      .agg(
        count(lit(1)).as("n_rows"),
        count_distinct(struct(col("asset_id"), col(keyCol)))
          .as("n_distinct"),
        coalesce(sum(when(col(keyCol).isNull, 1L).otherwise(0L)),
          lit(0L)).as("n_null_keys"),
        count_distinct(col("asset_id")).as("n_assets"))

  /** One aggregate pass over a tombstoned posting index: row/asset
    * totals, ghost rows (tombstoned assets' postings still on disk —
    * the pre-vacuum merge-on-read state), dead assets present in the
    * index, and the tombstone census. The tombstone table is the
    * `_tombstones` subdir (hidden from the hive discovery of the main
    * read by its underscore name). */
  private def tombstoneAudit(s: SparkSession, dir: String,
                             keyCol: String): DataFrame = {
    val idx = graft.Tables.immutablePath(s, dir)
      .select(col("asset_id"), col(keyCol))
    val dead = graft.Tables.immutablePath(s, s"$dir/_tombstones")
      .select(col("asset_id")).distinct()
    idx.join(broadcast(dead.withColumn("_dead", lit(true))),
        Seq("asset_id"), "left")
      .agg(
        count(lit(1)).as("n_rows"),
        count_distinct(col("asset_id")).as("n_assets"),
        coalesce(sum(when(col("_dead").isNotNull, 1L).otherwise(0L)),
          lit(0L)).as("n_ghost_rows"),
        count_distinct(when(col("_dead").isNotNull, col("asset_id")))
          .as("n_dead_assets"))
      .crossJoin(broadcast(dead.agg(count(lit(1)).as("n_tombstones"))))
      .select(col("n_rows"), col("n_assets"), col("n_ghost_rows"),
        col("n_dead_assets"), col("n_tombstones"))
  }

  /** One profile row per column over snapshot CTE `src`, tagged
    * old/new — the DuckDB twin of columnProfile's single-agg sweep. */
  private def profileSql(src: String, tag: String,
                         cols: Seq[String]): String =
    cols.map(c =>
      s"""SELECT '$c' AS "column", count(*) AS rows_$tag,
            count(*) - count($c) AS nulls_$tag,
            count(DISTINCT $c) AS dist_$tag,
            min($c)::VARCHAR AS min_$tag, max($c)::VARCHAR AS max_$tag
          FROM $src""").mkString(" UNION ALL ")

  val oracles: Map[String, String] = Map(
    "dq5_profile_drift" -> {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      s"""WITH o AS (SELECT * FROM documents WHERE doc_id % 7 <> 0),
         n AS (SELECT doc_id,
                 CASE WHEN doc_id % 11 = 0 THEN text || ' mod'
                      ELSE text END AS text,
                 CASE WHEN doc_id % 13 = 0 THEN NULL
                      ELSE lang END AS lang,
                 source, n_chars
               FROM documents WHERE doc_id % 5 <> 0),
         po AS (${profileSql("o", "old", cols)}),
         pn AS (${profileSql("n", "new", cols)})
         SELECT po.*, pn.rows_new, pn.nulls_new, pn.dist_new,
           pn.min_new, pn.max_new,
           abs(pn.nulls_new * po.rows_old - po.nulls_old * pn.rows_new)
             * 1000 > 50 * po.rows_old * pn.rows_new AS null_rate_drift,
           abs(pn.dist_new - po.dist_old) * 1000
             > 50 * po.dist_old AS distinct_drift,
           (pn.min_new IS DISTINCT FROM po.min_old) OR
             (pn.max_new IS DISTINCT FROM po.max_old) AS range_drift,
           (abs(pn.nulls_new * po.rows_old - po.nulls_old * pn.rows_new)
              * 1000 > 50 * po.rows_old * pn.rows_new) OR
             (abs(pn.dist_new - po.dist_old) * 1000 > 50 * po.dist_old) OR
             (pn.min_new IS DISTINCT FROM po.min_old) OR
             (pn.max_new IS DISTINCT FROM po.max_old) AS drifted
         FROM po JOIN pn USING ("column")"""
    },
    "dq1_constraints" ->
      """WITH m AS (SELECT
           count(*)::DOUBLE AS size,
           count(text)::DOUBLE / count(*) AS comp_text,
           count(DISTINCT doc_id)::DOUBLE / count(*) AS uniq_id,
           count(CASE WHEN regexp_matches(lang, '^[a-z]{2}$') THEN 1 END)
             ::DOUBLE / count(*) AS pat_lang,
           count(CASE WHEN lang IN ('en','de','fr') THEN 1 END)
             ::DOUBLE / count(*) AS set_lang,
           min(n_chars)::DOUBLE AS min_chars,
           max(n_chars)::DOUBLE AS max_chars,
           count(CASE WHEN length(text) = n_chars THEN 1 END)
             ::DOUBLE / count(*) AS len_ok,
           count(CASE WHEN lang = 'en' THEN 1 END)
             ::DOUBLE / count(*) AS en_share
         FROM documents)
         SELECT 'size' AS name, size AS metric,
           size >= 1.0 AS passed FROM m
         UNION ALL SELECT 'completeness(text)', comp_text,
           comp_text >= 1.0 AND comp_text <= 1.0 FROM m
         UNION ALL SELECT 'distinctness(doc_id)', uniq_id,
           uniq_id >= 1.0 AND uniq_id <= 1.0 FROM m
         UNION ALL SELECT 'pattern(lang)', pat_lang,
           pat_lang >= 1.0 AND pat_lang <= 1.0 FROM m
         UNION ALL SELECT 'in_set(lang)', set_lang,
           set_lang >= 0.9 AND set_lang <= 1.0 FROM m
         UNION ALL SELECT 'min(n_chars)', min_chars,
           min_chars >= 50.0 FROM m
         UNION ALL SELECT 'max(n_chars)', max_chars,
           max_chars <= 520.0 FROM m
         UNION ALL SELECT 'text_len_consistent', len_ok,
           len_ok >= 1.0 AND len_ok <= 1.0 FROM m
         UNION ALL SELECT 'en_share', en_share,
           en_share >= 0.35 AND en_share <= 0.5 FROM m""",
    "dq2_slice_quality" ->
      """SELECT source, count(*) AS n,
           count(text)::DOUBLE / count(*) AS completeness,
           min(n_chars) AS min_len, max(n_chars) AS max_len,
           sum(n_chars)::DOUBLE / count(*) AS avg_len,
           count(*) >= 20 AND min(n_chars) >= 55 AS passed
         FROM documents GROUP BY source""",
    // NULL predicate = violation (fail closed), hence the coalesce on
    // every check — matches tagViolations' semantics exactly.
    "dq3_quarantine" ->
      """WITH v AS (SELECT
           NOT coalesce(lang IN ('en','de','fr'), FALSE) AS v_set,
           NOT coalesce(n_chars >= 50, FALSE) AS v_min,
           NOT coalesce(n_chars <= 520, FALSE) AS v_max
         FROM documents)
         SELECT 'in_set(lang)' AS check_name, count(*) AS n_rows
           FROM v WHERE v_set
         UNION ALL SELECT 'min(n_chars)', count(*) FROM v WHERE v_min
         UNION ALL SELECT 'max(n_chars)', count(*) FROM v WHERE v_max
         UNION ALL SELECT '_rows_quarantined', count(*)
           FROM v WHERE v_set OR v_min OR v_max
         UNION ALL SELECT '_rows_kept', count(*)
           FROM v WHERE NOT (v_set OR v_min OR v_max)""",
    "dq4_robust_outliers" ->
      """WITH med AS (
           SELECT lang, quantile_disc(n_chars, 0.5)::BIGINT AS med
           FROM documents GROUP BY lang),
         dev AS (
           SELECT d.doc_id, d.lang, d.n_chars, m.med,
             abs(d.n_chars - m.med) AS adev
           FROM documents d JOIN med m USING (lang)),
         mad AS (
           SELECT lang, quantile_disc(adev, 0.5)::BIGINT AS mad
           FROM dev GROUP BY lang)
         SELECT dev.doc_id, dev.lang, dev.n_chars, dev.med, mad.mad,
           dev.adev > 2 * mad.mad AS is_outlier
         FROM dev JOIN mad USING (lang)""",
    "dq7_uniqueness" ->
      """WITH m AS (
           SELECT 'doc_id' AS "column", doc_id::VARCHAR AS v FROM documents
           UNION ALL
           SELECT 'lang', lang FROM documents
           UNION ALL
           SELECT 'source', source FROM documents
           UNION ALL
           SELECT 'n_chars', n_chars::VARCHAR FROM documents),
         pv AS (SELECT "column", v, count(*) AS cnt FROM m
                WHERE v IS NOT NULL GROUP BY 1, 2)
         SELECT "column", sum(cnt)::BIGINT AS n_nonnull,
           count(*)::BIGINT AS n_distinct,
           sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)::BIGINT AS n_unique,
           sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END)::DOUBLE
             / sum(cnt) AS uniqueness,
           count(*)::DOUBLE / sum(cnt) AS distinctness
         FROM pv GROUP BY 1""",
    "dq6_referential_integrity" ->
      """SELECT 'orders.custkey->customer' AS relation,
           count(*) AS n_rows,
           count(*) FILTER (WHERE o_custkey IS NOT NULL
             AND o_custkey NOT IN (SELECT c_custkey FROM customer
                                   WHERE c_custkey IS NOT NULL))
             AS n_orphans,
           n_orphans = 0 AS passed
         FROM orders
         UNION ALL
         SELECT 'lineitem.orderkey->orders', count(*),
           count(*) FILTER (WHERE l_orderkey IS NOT NULL
             AND l_orderkey NOT IN (SELECT o_orderkey FROM orders
                                    WHERE o_orderkey IS NOT NULL)),
           count(*) FILTER (WHERE l_orderkey IS NOT NULL
             AND l_orderkey NOT IN (SELECT o_orderkey FROM orders
                                    WHERE o_orderkey IS NOT NULL)) = 0
         FROM lineitem
         UNION ALL
         SELECT 'events.user->customer_snapshot', count(*),
           count(*) FILTER (WHERE user_id IS NOT NULL
             AND user_id NOT IN (SELECT c_custkey FROM customer
                                 WHERE c_custkey % 3 <> 0)),
           count(*) FILTER (WHERE user_id IS NOT NULL
             AND user_id NOT IN (SELECT c_custkey FROM customer
                                 WHERE c_custkey % 3 <> 0)) = 0
         FROM events""",

    // decode rates and dim bounds replayed from the fixtures' corrupt
    // rules (img torn at id%13=0, aud at id%11=0, vid at id%9=0) and
    // generative dims — never from bytes; the dq1 UNION ALL shape
    "dq8_media_health" ->
      """WITH m AS (SELECT
           count(*)::DOUBLE AS size,
           count(CASE WHEN doc_id % 13 <> 0 THEN 1 END)::DOUBLE
             / count(*) AS img_rate,
           count(CASE WHEN doc_id % 11 <> 0 THEN 1 END)::DOUBLE
             / count(*) AS aud_rate,
           count(CASE WHEN doc_id % 9 <> 0 THEN 1 END)::DOUBLE
             / count(*) AS vid_rate,
           count(CASE WHEN doc_id % 13 <> 0 AND doc_id % 11 <> 0
                       AND doc_id % 9 <> 0 THEN 1 END)::DOUBLE
             / count(*) AS all_rate,
           min(CASE WHEN doc_id % 13 <> 0
                    THEN 4 + doc_id % 5 END)::DOUBLE AS min_w,
           max(CASE WHEN doc_id % 13 <> 0
                    THEN 4 + doc_id % 5 END)::DOUBLE AS max_w,
           min(CASE WHEN doc_id % 11 <> 0
                    THEN 50 + doc_id % 32 END)::DOUBLE AS min_n,
           max(CASE WHEN doc_id % 11 <> 0
                    THEN 50 + doc_id % 32 END)::DOUBLE AS max_n,
           max(CASE WHEN doc_id % 9 <> 0
                    THEN 3 + doc_id % 5 END)::DOUBLE AS max_f
         FROM documents)
         SELECT 'size' AS name, size AS metric, size >= 1.0 AS passed
         FROM m
         UNION ALL SELECT 'img_decode_rate', img_rate,
           img_rate >= 0.9 AND img_rate <= 1.0 FROM m
         UNION ALL SELECT 'aud_decode_rate', aud_rate,
           aud_rate >= 0.9 AND aud_rate <= 1.0 FROM m
         UNION ALL SELECT 'vid_decode_rate', vid_rate,
           vid_rate >= 0.85 AND vid_rate <= 1.0 FROM m
         UNION ALL SELECT 'all_modalities', all_rate,
           all_rate >= 0.8 AND all_rate <= 1.0 FROM m
         UNION ALL SELECT 'min(img_w)', min_w, min_w >= 4.0 FROM m
         UNION ALL SELECT 'max(img_w)', max_w, max_w <= 8.0 FROM m
         UNION ALL SELECT 'min(n_samples)', min_n, min_n >= 50.0 FROM m
         UNION ALL SELECT 'max(n_samples)', max_n, max_n <= 81.0 FROM m
         UNION ALL SELECT 'max(n_frames)', max_f, max_f <= 7.0 FROM m""",

    // the whole index artifact replayed analytically: the distinct
    // (id, fhash) set of the %5 != 0 corpus IS what build+append must
    // have written — any dropped, doubled, or mis-keyed posting moves
    // one of the four integers
    "dq9_index_integrity" ->
      s"""WITH ${MultimodalQueries.frameCappedCte},
idx AS (SELECT id, fhash FROM fh WHERE id % 5 <> 0)
SELECT count(*)::BIGINT AS n_rows,
  count(DISTINCT (id, fhash))::BIGINT AS n_distinct,
  0::BIGINT AS n_null_keys,
  count(DISTINCT id)::BIGINT AS n_assets
FROM idx""",

    // dq15: the chain, the plants, and all six checks replayed
    // row-wise — shard = md5-hex-prefix mod 16, the tx32 replay rule
    "dq15_provenance" ->
      """WITH docs AS (SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens FROM documents),
         kept AS (SELECT doc_id FROM docs
                  WHERE n_tokens >= 5 AND doc_id % 3 <> 1),
         tombs AS (SELECT doc_id FROM docs WHERE doc_id % 17 = 0),
         tp AS (SELECT doc_id,
                  (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT
                   % 16)::BIGINT AS shard
                FROM kept
                WHERE doc_id NOT IN (SELECT doc_id FROM tombs)),
         manifest AS (SELECT shard, count(*)::BIGINT AS claimed
                      FROM tp GROUP BY shard),
         corrupted AS (
           SELECT doc_id, shard FROM tp WHERE doc_id % 97 <> 0
           UNION ALL
           SELECT doc_id + 700000,
             (('0x' || substr(md5((doc_id + 700000)::VARCHAR), 1, 8))
              ::UBIGINT % 16)::BIGINT
           FROM docs WHERE doc_id % 89 = 0
           UNION ALL
           SELECT k.doc_id,
             (('0x' || substr(md5(k.doc_id::VARCHAR), 1, 8))::UBIGINT
              % 16)::BIGINT
           FROM kept k JOIN tombs t USING (doc_id)
           WHERE k.doc_id % 2 = 0
           UNION ALL
           SELECT doc_id,
             (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT
              % 16)::BIGINT
           FROM docs WHERE doc_id % 3 = 1 AND doc_id % 79 = 0
           UNION ALL
           SELECT doc_id, shard FROM tp WHERE doc_id % 101 = 0),
         actual AS (SELECT shard, count(*)::BIGINT AS act
                    FROM corrupted GROUP BY shard)
         SELECT 'ghost_placements' AS check_name, count(*)::BIGINT AS n_bad
         FROM corrupted c
         WHERE NOT EXISTS (SELECT 1 FROM docs s WHERE s.doc_id = c.doc_id)
         UNION ALL
         SELECT 'tombstone_leaks', count(*)::BIGINT
         FROM corrupted c JOIN tombs t ON c.doc_id = t.doc_id
         UNION ALL
         SELECT 'unplanned_placements', count(*)::BIGINT
         FROM corrupted c
         WHERE EXISTS (SELECT 1 FROM docs s WHERE s.doc_id = c.doc_id)
           AND NOT EXISTS (SELECT 1 FROM kept k WHERE k.doc_id = c.doc_id)
         UNION ALL
         SELECT 'lost_records', count(*)::BIGINT
         FROM kept k
         WHERE NOT EXISTS (SELECT 1 FROM tombs t WHERE t.doc_id = k.doc_id)
           AND NOT EXISTS (SELECT 1 FROM corrupted c
                           WHERE c.doc_id = k.doc_id)
         UNION ALL
         SELECT 'duplicate_placement_ids', count(*)::BIGINT
         FROM (SELECT doc_id FROM corrupted
               GROUP BY doc_id HAVING count(*) > 1)
         UNION ALL
         SELECT 'manifest_drift_shards', count(*)::BIGINT
         FROM (SELECT coalesce(m.claimed, 0) AS claimed,
                 coalesce(a.act, 0) AS act
               FROM manifest m FULL OUTER JOIN actual a
                 ON m.shard = a.shard)
         WHERE claimed <> act""",

    "dq14_kanonymity" ->
      """WITH g AS (
           SELECT c_nationkey, c_mktsegment,
             floor(c_acctbal / 100)::BIGINT AS bal_c,
             count(*) AS n
           FROM customer GROUP BY 1, 2, 3)
         SELECT 5::BIGINT AS k,
           count(*)::BIGINT AS n_groups,
           count(CASE WHEN n < 5 THEN 1 END)::BIGINT AS violating_groups,
           coalesce(sum(CASE WHEN n < 5 THEN n END), 0)::BIGINT
             AS rows_at_risk,
           min(n)::BIGINT AS min_group,
           max(n)::BIGINT AS max_group,
           count(CASE WHEN n < 5 THEN 1 END) = 0 AS anonymous
         FROM g""",

    // the fixture's deletion rule (%7 = 1 banked assets) replayed over
    // the analytic posting set: ghosts = those assets' postings
    "dq13_tombstone_audit" ->
      s"""WITH ${MultimodalQueries.frameCappedCte},
idx AS (SELECT id, fhash FROM fh WHERE id % 5 <> 0)
SELECT count(*)::BIGINT AS n_rows,
  count(DISTINCT id)::BIGINT AS n_assets,
  sum(CASE WHEN id % 7 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_ghost_rows,
  count(DISTINCT CASE WHEN id % 7 = 1 THEN id END)::BIGINT
    AS n_dead_assets,
  (SELECT count(*) FROM documents
   WHERE doc_id % 7 = 1 AND doc_id % 5 <> 0)::BIGINT AS n_tombstones
FROM idx""",

    // mm17's analytic segment-key set, restricted to the corpus fifths
    "dq10_segment_index_integrity" ->
      s"""WITH ${MultimodalQueries.segmentCappedCte},
idx AS (SELECT id, skey FROM sk WHERE id % 5 <> 0)
SELECT count(*)::BIGINT AS n_rows,
  count(DISTINCT (id, skey))::BIGINT AS n_distinct,
  0::BIGINT AS n_null_keys,
  count(DISTINCT id)::BIGINT AS n_assets
FROM idx""",

    // mm18's recursive chunker replay, same restriction
    "dq11_chunk_index_integrity" ->
      s"""WITH RECURSIVE ${MultimodalQueries.cdcCappedCte},
idx AS (SELECT id, ckey FROM sk WHERE id % 5 <> 0)
SELECT count(*)::BIGINT AS n_rows,
  count(DISTINCT (id, ckey))::BIGINT AS n_distinct,
  0::BIGINT AS n_null_keys,
  count(DISTINCT id)::BIGINT AS n_assets
FROM idx""",

    // each rule replayed as its own grouped scan; HUGEINT sums cast
    // back to BIGINT (the q32 dtype rule)
    "dq12_fd_report" -> {
      def one(det: String, dep: String) =
        s"""SELECT '$det' AS determinant, '$dep' AS dependent,
             count(*)::BIGINT AS n_groups,
             count(CASE WHEN _n_dep > 1 THEN 1 END)::BIGINT
               AS violating_groups,
             sum(CASE WHEN _n_dep > 1 THEN _n_rows ELSE 0 END)::BIGINT
               AS violating_rows,
             max(_n_dep)::BIGINT AS max_distinct_dep,
             count(CASE WHEN _n_dep > 1 THEN 1 END) = 0 AS holds
           FROM (SELECT $det, count(DISTINCT $dep) AS _n_dep,
                   count(*) AS _n_rows
                 FROM d GROUP BY $det)"""
      s"""WITH d AS (SELECT doc_id, source, lang,
             substr(lang, 1, 1) AS lang_family FROM documents)
         ${one("source", "lang")}
         UNION ALL ${one("lang", "lang_family")}
         UNION ALL ${one("doc_id", "source")}"""
    }
  )
}

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
        "text", "n_chars", minRows = 20L, minLen = 55L))
  )

  val oracles: Map[String, String] = Map(
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
         FROM documents GROUP BY source"""
  )
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language identification, fingerprinting. All
  * row-local `functions._` compositions — codegen'd, shuffle-free, scale
  * linearly with the corpus.
  */
object TextAnalysisOps {

  /** Whitespace token count (empty/null-safe). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count: word-piece regex split (letters / digits /
    * single punctuation marks), an upper-bound proxy for tokenizer cost.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "of", "to", "in", "is", "on", "for")

  /** Quality metrics: length, token count, punctuation ratio, stopword
    * ratio, mean word length — the classic cheap quality filters.
    */
  def qualityMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val w = split(t, " ")
    val nTok = size(w)
    val stopArr = array(stopwords.map(lit): _*)
    df.select(col(idCol),
      length(t).as("n_chars"),
      nTok.as("n_tokens"),
      round(size(regexp_extract_all(t, lit("[.,;:!?]"), lit(0)))
        .cast("double") / greatest(length(t), lit(1)), 4).as("punct_ratio"),
      round(size(filter(w, x => array_contains(stopArr, x))).cast("double") /
        greatest(nTok, lit(1)), 4).as("stopword_ratio"),
      round((length(t) - nTok + 1).cast("double") /
        greatest(nTok, lit(1)), 4).as("avg_word_len"))
  }

  /** Marker words per language for the n-gram-heuristic language id.
    * (CJK detection would use a codepoint-range regex — the test corpus
    * is Latin-script, so marker words carry the heuristic.)
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "de" -> Seq("der", "die", "das", "und", "nicht"),
    "fr" -> Seq("le", "les", "et", "est", "une"))

  /** Language-ID heuristic: count marker-word hits per language over the
    * word array; deterministic precedence (en > es > de > fr) on ties.
    */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = split(col(textCol), " ")
    val scored = langMarkers.foldLeft(df.select(col(idCol), w.as("_w"))) {
      case (acc, (lang, markers)) =>
        val arr = array(markers.map(lit): _*)
        acc.withColumn(s"score_$lang",
          size(filter(col("_w"), x => array_contains(arr, x))))
    }
    val Seq(en, es, de, fr) =
      langMarkers.map { case (l, _) => col(s"score_$l") }
    scored.select(col(idCol),
      en.as("score_en"), es.as("score_es"),
      de.as("score_de"), fr.as("score_fr"),
      when(en >= es && en >= de && en >= fr, "en")
        .when(es >= de && es >= fr, "es")
        .when(de >= fr, "de")
        .otherwise("fr").as("predicted"))
  }

  /** Canonical document fingerprint: md5 of the lowercased,
    * whitespace-collapsed text — the exact-dup key that survives
    * whitespace/case noise.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Winnowing-style robust fingerprint: minimum md5 over the document's
    * word k-shingles — stable under local edits anywhere outside the
    * minimal shingle. Row-local.
    */
  def minShingleFingerprint(text: Column, k: Int = 3): Column =
    array_min(transform(DedupOps.shingles(text, k), s => md5(s)))
}

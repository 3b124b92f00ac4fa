package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Ckpt.CkptOps

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
    * minimal shingle. Row-local; fused native kernel (one digest per
    * shingle over byte ranges of the text, no shingle array, no
    * interpreted lambdas — `functions.MinShingleMd5Expr`).
    */
  def minShingleFingerprint(text: Column, k: Int = 3): Column =
    graft.functions.ShingleGen.minShingleMd5(text, k)

  /** Sliding-window token chunking (LLM training prep): split each
    * document into chunks of `chunkSize` tokens every `stride` tokens
    * (overlap = chunkSize - stride). EVERY token lands in at least one
    * chunk: the number of windows is ceil((n - size)/stride) + 1, so the
    * final window is emitted (shorter than `chunkSize` when the length
    * isn't stride-aligned) rather than silently dropping the tail.
    * Pure narrow plan: one row-local sequence of window starts, one
    * posexplode — no shuffle, scales linearly, and chunk ids are
    * deterministic (0-based window index).
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkSize: Int, stride: Int): DataFrame = {
    val w = split(col(textCol), " ")
    val nChunks = greatest(lit(1),
      floor((size(w) - chunkSize + stride - 1).cast("double") / stride)
        .cast("int") + 1)
    val starts = sequence(lit(1), (nChunks - 1) * stride + 1, lit(stride))
    df.select(col(idCol), w.as("_w"),
        posexplode(starts).as(Seq("chunk_id", "_st")))
      .select(col(idCol), col("chunk_id"),
        array_join(slice(col("_w"), col("_st"), lit(chunkSize)), " ")
          .as("chunk_text"),
        least(lit(chunkSize), size(col("_w")) - col("_st") + 1)
          .as("chunk_tokens"))
  }

  /** Train/eval contamination check: for each training document, how
    * many of its distinct word k-shingles appear anywhere in the eval
    * corpus. The join key is the shingle's fixed 16-byte md5 digest —
    * neither the join exchange nor the eval-distinct carries shingle
    * text (the tx33/dd15 discipline; the oracle digests identically,
    * so collision behavior replays exactly); the eval side is reduced
    * to its DISTINCT digest set first, so the join's build side is the
    * eval vocabulary, not the eval corpus. Two keyed shuffles total
    * (eval-distinct, join+regroup) — never a cross product.
    */
  def contamination(train: DataFrame, eval_ : DataFrame, idCol: String,
                    textCol: String, k: Int = 3): DataFrame = {
    // native shingle generator: no HOF lambdas, no inferred pre-Generate
    // filter re-evaluating the shingle array (see ShingleGenerate)
    val trainSh = train.select(col(idCol),
        graft.functions.ShingleGen.shingleGen(col(textCol), k,
          distinct = true)).toDF(idCol, "_st")
      .select(col(idCol), unhex(md5(col("_st"))).as("_s"))
    val evalSh = eval_.select(
        graft.functions.ShingleGen.shingleGen(col(textCol), k,
          distinct = true)).toDF("_st")
      .select(unhex(md5(col("_st"))).as("_s"))
      .distinct().withColumn("_hit", lit(1))
    trainSh.join(evalSh, Seq("_s"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("_hit"), lit(0))).cast("long").as("n_contaminated"))
      .withColumn("contamination_ratio",
        round(col("n_contaminated").cast("double") / col("n_shingles"), 4))
  }

  /** Contamination REMOVAL (the action [[contamination]] only
    * measures): excise from every training document each word covered
    * by any k-gram that also occurs in the eval corpus, and reassemble
    * the survivors in order — the standard eval-decontamination surgery
    * applied before training, at span granularity (dropping whole docs
    * over one boilerplate overlap wastes data; keeping flagged docs
    * leaks the eval set).
    *
    * Overlapping hit windows union naturally: covered = the distinct
    * (doc, word-index) set under any hit gram's [i, i+k-1] range.
    *
    * Scale shape: eval grams are one distinct set (bloom/broadcast-able
    * like [[contaminationBloom]]'s), digested to fixed 16-byte md5 keys
    * before the distinct so the semi-join build side and its exchange
    * carry digests, never gram text (the oracle computes the identical
    * md5 — collision behavior replays exactly); the hit join carries
    * (id, gram start) only, coverage expansion is a narrow k-row
    * explode, and the anti join + reassembly key on (id, index) ints —
    * the corpus text crosses the wire once, as words, with no pair
    * formation anywhere.
    */
  def decontaminateSpans(train: DataFrame, eval_ : DataFrame,
                         idCol: String, textCol: String,
                         k: Int = 3,
                         canonicalKeys: Boolean = false): DataFrame = {
    // canonicalKeys: hash each gram's unicode_norm_key instead of its
    // raw bytes — contamination hidden behind homoglyph swaps / NFD /
    // full-width forms (the tx48 classes) matches the eval set anyway
    // (tx50). Words are excised but the TEXT is never rewritten: the
    // surviving words keep their original bytes. ASCII-lowercase grams
    // take the expression's identity fast path, so the flag costs
    // nothing on clean corpora.
    val gkey = (c: Column) =>
      if (canonicalKeys)
        unhex(md5(graft.functions.UnicodeNorm.unicodeNormKey(c)))
      else unhex(md5(c))
    val words = train.select(col(idCol),
      posexplode(split(col(textCol), " "))).toDF(idCol, "_i", "_w")
    val grams = train.select(col(idCol),
        posexplode(graft.functions.ShingleGen.shingleArray(
          col(textCol), k, distinct = false))).toDF(idCol, "_i", "_gt")
      .select(col(idCol), col("_i"), gkey(col("_gt")).as("_g"))
    val evalG = eval_.select(
        graft.functions.ShingleGen.shingleGen(col(textCol), k,
          distinct = true)).toDF("_gt")
      .select(gkey(col("_gt")).as("_g")).distinct()
    val hits = grams.join(evalG, Seq("_g"), "left_semi")
    val covered = hits.select(col(idCol),
      explode(sequence(col("_i"), col("_i") + lit(k - 1)))).toDF(idCol, "_i")
      .distinct()
    val kept = words.join(covered, Seq(idCol, "_i"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("_n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("_i"), col("_w")))),
          s => s.getField("_w")), " ").as("clean_text"))
    train.select(col(idCol),
        size(split(col(textCol), " ")).cast("long").as("n_words"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_words"),
        (col("n_words") - coalesce(col("_n_kept"), lit(0L))).as("n_removed"))
  }

  /** [[contamination]] with a Bloom pre-filter on the training shingles
    * — IDENTICAL results (no false negatives; false positives die in the
    * exact join), different shuffle economics: the plain form exchanges
    * EVERY training shingle into the join, this form exchanges only the
    * bloom survivors (~contaminated + fpp of them). The per-doc totals
    * come from a separate pure map-side count — two narrow passes over
    * the training text instead of one full-corpus shuffle, which is the
    * winning trade once the corpus dwarfs the eval vocabulary. Use when
    * the eval shingle set is too large to broadcast but its bit array
    * (~1.2 MB per million shingles at 3% fpp) is not.
    */
  def contaminationBloom(train: DataFrame, eval_ : DataFrame,
                         idCol: String, textCol: String, k: Int = 3,
                         expectedShingles: Long = 1L << 22,
                         fpp: Double = 0.03): DataFrame = {
    // digest keys like [[contamination]]: the bloom is built and probed
    // over 16-byte digests, and the bloom-survivor exchange into the
    // exact join carries digests, never shingle text
    val trainSh = train.select(col(idCol),
        graft.functions.ShingleGen.shingleGen(col(textCol), k,
          distinct = true)).toDF(idCol, "_st")
      .select(col(idCol), unhex(md5(col("_st"))).as("_s"))
    // cache the eval vocabulary: it is consumed twice (bloom build,
    // then exact-join build side) and the shingling + distinct shuffle
    // should not run twice. persist (not checkpoint): the bloom build's
    // eager collect fills the cache as a side effect — no extra job.
    val evalSh = eval_.select(
        graft.functions.ShingleGen.shingleGen(col(textCol), k,
          distinct = true)).toDF("_st")
      .select(unhex(md5(col("_st"))).as("_s")).distinct().persist()
    val bloom = BloomJoin.buildBloom(evalSh, col("_s"), expectedShingles, fpp)
    // pass 1: per-doc totals — partial-agg'd map side, only (id, count)
    // partials shuffle
    val totals = trainSh.groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"))
    // pass 2: only bloom survivors reach the exact semi join
    val contaminated = trainSh
      .filter(BloomJoin.mightContain(bloom, col("_s")))
      .join(evalSh, Seq("_s"), "left_semi")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_contaminated"))
    totals.join(contaminated, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("contamination_ratio",
        round(col("n_contaminated").cast("double") / col("n_shingles"), 4))
  }

  /** Repetition quality signals (the Gopher-style filters): per-doc
    * duplicate-word ratio (1 - distinct/total) and the fraction of all
    * bigrams taken by the single most frequent bigram. Docs with < 2
    * words are excluded (no bigram exists).
    *
    * Entirely ROW-LOCAL — zero shuffles: a document's bigram histogram
    * is bounded by the document, so the top-bigram count is computed in
    * place as the longest equal-run of the doc's SORTED bigram array
    * (one `aggregate` fold), never exploded. The previous shape
    * (bigram generator → groupBy(doc, bigram) → groupBy(doc)) shuffled
    * ~2× corpus bytes twice; measured at sf0.1 under the hash-all
    * bench action it was the single most expensive query in the
    * catalog (4.1 s), and at 100 TB those two exchanges ARE the job.
    */
  def repetitionMetrics(df: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    // one kernel eval per row (projection first, filter on the struct
    // field), all four statistics from a single tokenization
    df.select(col(idCol),
        graft.functions.RepetitionStats.repetitionStats(col(textCol))
          .as("_r"))
      .filter(col("_r.n_words") >= 2)
      .select(col(idCol),
        col("_r.n_words").as("n_words"),
        round(lit(1) - col("_r.n_distinct_words").cast("double") /
          col("_r.n_words"), 4).as("dup_word_ratio"),
        col("_r.top_bigram_n").as("top_bigram_n"),
        col("_r.n_bigrams").as("n_bigrams"))
      .withColumn("top_bigram_frac",
        round(col("top_bigram_n").cast("double") / col("n_bigrams"), 4))
  }

  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val longNumPattern = "[0-9]{3,}"

  /** PII-style scrubbing: replace email addresses and 3+-digit runs with
    * placeholder tags, reporting match counts. Pure row-local regex —
    * codegen'd, shuffle-free; the patterns stay inside the
    * RE2-compatible subset so external engines replay them exactly.
    */
  def redact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
      size(regexp_extract_all(t, lit(emailPattern), lit(0))).as("n_emails"),
      size(regexp_extract_all(t, lit(longNumPattern), lit(0))).as("n_long_nums"),
      regexp_replace(regexp_replace(t, emailPattern, "<EMAIL>"),
        longNumPattern, "<NUM>").as("redacted"))
  }

  /** Script-mix profile — the multilingual-curation fact language-ID
    * alone misses: a doc can be confidently "ru" yet 40% Latin
    * (code-switching, spam keyword stuffing, transliteration noise),
    * and homoglyph-salted spam is EXACTLY a script mix. Counts
    * codepoints per Unicode block (Basic Latin letters, Cyrillic
    * U+0400–U+04FF, Greek U+0370–U+03FF, ASCII digits), names the
    * dominant script with a fixed latin→cyrillic→greek tie priority,
    * and flags multi-script docs. Pure row-local regex over codepoint
    * ranges — codegen'd, shuffle-free; the classes are literal-range
    * RE2-compatible so external engines count the identical
    * codepoints. All outputs exact integers/strings.
    */
  def scriptMix(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val t = col(textCol)
    def cnt(cls: String) =
      size(regexp_extract_all(t, lit(cls), lit(0)))
    val latin = cnt("[A-Za-z]")
    // escape sequences, NEVER literal glyphs (the tx48 rule): a tool
    // silently NFD-normalizing the source would decompose U+0400 and
    // quietly change the class
    val cyr = cnt("[\u0400-\u04ff]")
    val greek = cnt("[\u0370-\u03ff]")
    df.select(col(idCol),
        latin.as("n_latin"), cyr.as("n_cyrillic"), greek.as("n_greek"),
        cnt("[0-9]").as("n_digit"))
      .withColumn("_g", greatest(col("n_latin"), col("n_cyrillic"),
        col("n_greek")))
      .withColumn("dominant",
        when(col("_g") === 0, lit("none"))
          .when(col("n_latin") === col("_g"), lit("latin"))
          .when(col("n_cyrillic") === col("_g"), lit("cyrillic"))
          .otherwise(lit("greek")))
      .withColumn("mixed",
        (when(col("n_latin") > 0, 1).otherwise(0) +
          when(col("n_cyrillic") > 0, 1).otherwise(0) +
          when(col("n_greek") > 0, 1).otherwise(0)) >= 2)
      .drop("_g")
  }

  /** HTML → text extraction (boilerplate strip) — the first transform
    * of every web-scraped corpus: remove script/style blocks whole,
    * strip the remaining tags, decode the common character entities,
    * collapse whitespace. Pure row-local regex + literal replaces —
    * codegen'd, shuffle-free, O(len) per row; the patterns stay inside
    * the RE2-compatible subset ((?s) + lazy quantifiers, explicit
    * whitespace class — Java's \\s includes \\x0B, RE2's does not) so
    * external engines replay them exactly. Entity decode runs `&amp;`
    * LAST, so a literal "&amp;lt;" decodes to "&lt;" and not "<" — the
    * standard single-pass rule.
    */
  def htmlExtract(df: DataFrame, idCol: String, htmlCol: String)
      : DataFrame = {
    val noScript = regexp_replace(col(htmlCol),
      "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        replace(c, lit(from), lit(to))
      }
    val text = trim(regexp_replace(decoded, "[ \\t\\n\\r]+", " "))
    // two-stage select: length() must reference the ATTRIBUTE so the
    // regex chain is evaluated once per row, not once per consumer
    // (the CollapseProject lesson — codegen subexpression elimination
    // would usually rescue the single-projection form, but the
    // interpreted path would not)
    df.select(col(idCol), text.as("extracted"))
      .select(col(idCol), col("extracted"),
        length(col("extracted")).as("n_extracted"))
  }

  /** Exact per-stratum running sum WITHOUT a per-stratum window — the
    * classic two-phase distributed prefix sum. A training mixture's
    * dominant stratum (web ≈ 80% of real corpora) makes
    * `sum(x) OVER (PARTITION BY stratum ORDER BY id)` one WindowExec
    * partition = one task sorting and scanning most of the corpus.
    * Instead: (1) range-partition on (stratum, orderCols…) — the
    * dominant stratum SPLITS across range boundaries, so every partition is
    * ~corpus/P regardless of the mixture; (2) a local running sum per
    * (partition, stratum) — each window group is bounded by one range
    * partition's slice, never a whole stratum; (3) per-(partition,
    * stratum) subtotals (map-side-combined agg, P×strata rows — no ids,
    * no text) cascaded into cross-partition offsets by a ≤P×strata-row
    * window, broadcast-joined back; cum = offset + local. With
    * `sumCol = lit(1)` the cum IS the per-stratum rank (row_number
    * under the same total order). Exact for ANY boundary placement
    * (partitions are ordered ranges of the global (stratum,
    * orderCols…) order), so the result is deterministic even though
    * range sampling is not part of the contract. The pid-stamped
    * frame is materialized once (see the Releasable body on why that
    * is load-bearing), so the input is shuffled exactly once and both
    * branches read the same stored bytes.
    *
    * CONTRACT: `base` must carry ONLY columns referenced by
    * `strataCol`/`orderCols`/`sumCol` — the pid-stamped frame is
    * MATERIALIZED (eager localCheckpoint), so every extra payload
    * column is stored byte-for-byte; join payloads back on the
    * near-unique (stratum, order) key afterward instead (see
    * shardManifest / packSequences). The release handle frees the
    * checkpoint — lane callers park it in [[graft.Leases]].
    */
  private[graft] def stratumCumSum(base: DataFrame, strataCol: String,
      orderCols: Seq[Column], sumCol: String): DataFrame =
    stratumCumSumReleasable(base, strataCol, orderCols, sumCol)._1

  private[graft] def stratumCumSumReleasable(base: DataFrame,
      strataCol: String, orderCols: Seq[Column], sumCol: String)
      : (DataFrame, () => Unit) = {
    import org.apache.spark.sql.expressions.Window
    // The pid-stamped frame is EAGERLY MATERIALIZED, and that is a
    // CORRECTNESS requirement, not a cache: spark_partition_id() is
    // nondeterministic BY STAGE — the subtotal branch and the local
    // branch are separate subtrees, and whenever the planner does not
    // physically share one exchange between them (AQE re-reads a
    // stage coalesced/local differently per consumer; a recomputed
    // exchange re-evaluates the projection), the two branches stamp
    // DIFFERENT _pid structures over the same logical rows — offsets
    // keyed to one partitioning, applied to another (caught by the
    // packskew ScaleSmoke at 64 partitions/5M rows: bins of 64 docs
    // where the closed form says 32, dropped rows from the inner
    // offset join). Freezing the stamped rows into checkpoint blocks
    // makes every consumer read the SAME bytes. The explicit
    // partition count keeps AQE from coalescing the range exchange
    // underneath the stamp (REPARTITION_BY_NUM is exempt by
    // contract).
    val parted = base
      .repartitionByRange(
        base.sparkSession.sessionState.conf.numShufflePartitions,
        (col(strataCol) +: orderCols): _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val localW = Window.partitionBy(col("_pid"), col(strataCol))
      .orderBy(orderCols: _*)
    val local = parted.withColumn("_lcum",
      sum(col(sumCol)).over(localW))
    val subtotals = parted.groupBy(col("_pid"), col(strataCol))
      .agg(sum(col(sumCol)).as("_psum"))
      .select(col("_pid").as("_opid"), col(strataCol).as("_ostr"),
        col("_psum"))
    val offW = Window.partitionBy(col("_ostr")).orderBy(col("_opid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = subtotals
      .withColumn("_off", coalesce(sum(col("_psum")).over(offW), lit(0L)))
      .drop("_psum")
    val out = local.join(broadcast(offsets),
        col("_pid") === col("_opid") && col(strataCol) === col("_ostr"))
      .withColumn("cum", col("_off") + col("_lcum"))
      .drop("_pid", "_lcum", "_opid", "_ostr", "_off")
    (out, () => graft.Release(parted))
  }

  /** Greedy sequence packing (training-batch prep): assign documents to
    * fixed-budget context bins by cumulative token count, walking each
    * stratum in deterministic id order. The running sum is the
    * two-phase distributed prefix sum ([[stratumCumSum]]) — a dominant
    * stratum never lands in one task. Bin b of stratum s holds the
    * consecutive docs whose preceding cumulative tokens fall in
    * [b·budget, (b+1)·budget).
    */
  def packBins(df: DataFrame, idCol: String, textCol: String,
               strataCol: String, budgetTokens: Int): DataFrame =
    packBinsReleasable(df, idCol, textCol, strataCol, budgetTokens)._1

  /** [[packBins]] plus the release handle for the prefix-sum
    * checkpoint (lane callers park it in [[graft.Leases]]). */
  def packBinsReleasable(df: DataFrame, idCol: String, textCol: String,
      strataCol: String, budgetTokens: Int): (DataFrame, () => Unit) = {
    val base = df.select(col(strataCol), col(idCol),
      tokenCount(col(textCol)).as("n_tokens"))
    val (cum, rel) =
      stratumCumSumReleasable(base, strataCol, Seq(col(idCol)), "n_tokens")
    (cum.withColumn("bin",
        floor((col("cum") - col("n_tokens")) / budgetTokens).cast("int"))
      .select(col(strataCol), col(idCol), col("n_tokens"), col("cum"),
        col("bin")), rel)
  }

  /** Materialize [[packBins]] assignments into actual training
    * sequences: concatenate each bin's documents in id order with an
    * end-of-document separator — the final "make training examples"
    * step after bin assignment. One keyed agg on (stratum, bin); the
    * sort is per-group inside `array_sort`, not a global order. The
    * sequence text is fingerprinted (md5) in the oracle-facing queries;
    * here the full text is returned for downstream writers.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    strataCol: String, budgetTokens: Int,
                    eos: String = "<|eod|>"): DataFrame =
    packSequencesReleasable(df, idCol, textCol, strataCol, budgetTokens,
      eos)._1

  /** [[packSequences]] plus the release handle for the prefix-sum
    * checkpoint. */
  def packSequencesReleasable(df: DataFrame, idCol: String,
      textCol: String, strataCol: String, budgetTokens: Int,
      eos: String = "<|eod|>"): (DataFrame, () => Unit) = {
    // bin assignment runs NARROW (stratum, id, n_tokens — no text)
    // through the two-phase prefix sum, then the text joins back on the
    // near-unique (stratum, id) key. The corpus text moves twice (join
    // hash + bin groupBy) — the same count as the old windowed form —
    // but never through a per-stratum sort: the earlier inline-window
    // shape threaded the full document text through
    // `PARTITION BY stratum`, which parks a dominant stratum (web ≈ 80%
    // of real mixtures) in ONE task's external sort, text included.
    val (binsAll, rel) =
      packBinsReleasable(df, idCol, textCol, strataCol, budgetTokens)
    val bins = binsAll
      .select(col(strataCol).as("_bstr"), col(idCol).as("_bid"),
        col("n_tokens"), col("bin"))
    (df.select(col(strataCol), col(idCol), col(textCol))
      .join(bins, col(strataCol) === col("_bstr") &&
        col(idCol) === col("_bid"))
      .groupBy(col(strataCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("seq_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col(idCol), col(textCol)))),
          s => s.getField(textCol)), s" $eos ").as("seq_text")), rel)
  }

  /** Per-source document cap — the dominant-domain down-sampler
    * (C4/RefinedWeb keep at most N pages per registered domain so a
    * handful of mega-sites cannot swamp the mixture). Selection is a
    * deterministic pseudo-random rank — md5 of the id, then the id as
    * tie-break — so the kept subset is a pure function of the data:
    * reproducible across runs, engines, and partitionings, and unbiased
    * w.r.t. document order in the source.
    *
    * Scale shape — TWO regimes, auto-dispatched on `cap`:
    *
    * Small caps (≤ `maxHeapCap`): a bounded per-key heap
    * ([[graft.plans.TopKPerKey]]), NOT a `row_number` window — the
    * window form sorts every source's full document set, and the
    * dominant source is by definition the skew case (one domain with
    * 10⁸ pages would sort 10⁸ rows in one task to keep N). The heap is
    * map-side pruned: each task retains at most `cap` rows per source
    * before the exchange, so the shuffle carries ≤ cap·tasks rows per
    * source regardless of the source's true size.
    *
    * Large caps: the heap's per-task state is min(task rows, cap)
    * DESERIALIZED row copies per key — unspillable, and with cap at or
    * above per-task per-key volume it silently retains ~the whole task
    * input (measured: cap=100 k at local[32]/8 g OOMed the 3 M-doc
    * smoke that local[8] survived — heap state scales with
    * concurrency). So beyond `maxHeapCap` the cap switches to a
    * PER-KEY HISTOGRAM CUTOFF (the [[tokenBudgetSelect]] two-phase
    * pattern generalized per key): bucket the md5 rank by its first
    * byte, aggregate (source, bucket) counts — a map-side-combined agg
    * whose output is 256 rows per source, no ids, no payloads — find
    * each source's boundary bucket with a ≤256-row window, then keep
    * low buckets with a MAP-SIDE filter (zero shuffle for them, and
    * for every under-cap source) and rank only the boundary bucket —
    * 1/256 of an overflowing source — in a spillable sort. Same total
    * order (md5 asc, id asc), bit-identical keep set, asserted equal
    * across the dispatch in the property suite.
    */
  val SourceCapHeapMax: Int = 1024

  def sourceCap(docs: DataFrame, idCol: String, srcCol: String,
                cap: Int, maxHeapCap: Int = SourceCapHeapMax): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    if (cap <= maxHeapCap) {
      val keyed = docs.select(col(srcCol), col(idCol),
        md5(col(idCol).cast("string")).as("_r"))
      graft.plans.TopK.perKey(keyed, Seq(srcCol),
          Seq(col("_r").asc, col(idCol).asc), cap)
        .select(col(srcCol), col(idCol))
    } else sourceCapHistogram(docs, idCol, srcCol, cap)
  }

  /** Large-cap path of [[sourceCap]]: per-key histogram cutoff. */
  private[operators] def sourceCapHistogram(docs: DataFrame, idCol: String,
                                            srcCol: String, cap: Int)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = docs.select(col(srcCol), col(idCol),
      md5(col(idCol).cast("string")).as("_r"))
      .withColumn("_b", conv(substring(col("_r"), 1, 2), 16, 10).cast("int"))
    // (source, bucket) counts: map-side combined, 256 rows/source out
    val hist = ranked.groupBy(srcCol, "_b").agg(count(lit(1)).as("_c"))
    // per-source boundary: first bucket whose cumulative count crosses
    // the cap (≤256-row window per source), and the quota left for it
    val wb = Window.partitionBy(srcCol).orderBy(col("_b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bounds = hist.withColumn("_cum", sum("_c").over(wb))
      .filter(col("_cum") > cap)
      .groupBy(srcCol).agg(
        min_by(struct(col("_b"), col("_cum"), col("_c")), col("_b"))
          .as("_bd"))
      .select(col(srcCol), col("_bd._b").as("_bstar"),
        (lit(cap) - (col("_bd._cum") - col("_bd._c"))).as("_quota"))
    // null-safe join: a null source is a key like any other to the heap
    // path, so the boundary lookup must match it too
    val joined = ranked.join(bounds.withColumnRenamed(srcCol, "_src2"),
      col(srcCol) <=> col("_src2"), "left").drop("_src2")
    // under-cap sources (no boundary row) and low buckets: map-side keep
    val low = joined.filter(col("_bstar").isNull || col("_b") < col("_bstar"))
      .select(col(srcCol), col(idCol))
    // boundary bucket only — 1/256 of an overflowing source — pays the
    // exact per-source rank, in a spillable sort
    val wr = Window.partitionBy(srcCol)
      .orderBy(col("_r").asc, col(idCol).asc)
    val boundary = joined.filter(col("_b") === col("_bstar"))
      .withColumn("_rn", row_number().over(wr))
      .filter(col("_rn") <= col("_quota"))
      .select(col(srcCol), col(idCol))
    low.unionByName(boundary)
  }

  /** Token-budget corpus selection: order the corpus by
    * (quality desc, id asc) and keep documents while the INCLUSIVE
    * running token total stays within `budget` — "the best N tokens",
    * the curation primitive behind fixed-budget pretraining mixes.
    * Quality = [[qualityMetrics]]' stopword_ratio (4-dp rounded, so the
    * grouping key below is a small finite set).
    *
    * Scale shape: the textbook formulation is one global window cumsum —
    * which moves the ENTIRE corpus into a single sort partition.
    * Instead, the classic two-phase distributed prefix-sum
    * (histogram-and-cutoff): (1) one map-side scan aggregates token
    * totals PER DISTINCT QUALITY VALUE (≤ 10⁴ groups for a 4-dp ratio —
    * driver-sized by construction); (2) the driver prefix-sums the
    * sorted histogram to find the boundary quality r*: every doc with
    * quality > r* is kept by a map-side filter (no shuffle, no sort),
    * docs below r* are dropped the same way, and only the r* TIE GROUP
    * — one quality value's worth of rows — pays an ordered cumsum for
    * the exact cut. The TEXT is scanned exactly once: the narrow
    * (id, tokens, quality) projection — a few % of corpus width — is
    * persisted serialized-spillable, and both the histogram and the
    * keep filters read it (measured at 5 M docs: re-scoring the text
    * for the second pass cost more than the naive window itself —
    * 7.6 s vs 6.0 s — because the higher-order stopword filter is the
    * dominant term; scoring once flips it). Nothing corpus-sized is
    * ever sorted or shuffled. Deterministic: the order is total, the
    * histogram exact.
    */
  def tokenBudgetSelect(docs: DataFrame, idCol: String, textCol: String,
                        budget: Long): DataFrame =
    tokenBudgetSelectReleasable(docs, idCol, textCol, budget)._1

  /** [[tokenBudgetSelect]] plus the release handle for the persisted
    * score projection (the result reads it lazily — invoke the handle
    * after consuming the result; the plain form retains it for the
    * session).
    */
  def tokenBudgetSelectReleasable(docs: DataFrame, idCol: String,
                                  textCol: String, budget: Long)
      : (DataFrame, () => Unit) = {
    import org.apache.spark.sql.expressions.Window
    val scored = qualityMetrics(docs, idCol, textCol)
      .select(col(idCol), col("n_tokens").cast("long").as("n_tokens"),
        col("stopword_ratio"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val release = () => graft.Release(scored)
    val hist = scored.groupBy("stopword_ratio")
      .agg(sum("n_tokens").as("s")).collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy(-_._1)
    var cum = 0L
    var i = 0
    while (i < hist.length && cum + hist(i)._2 <= budget) {
      cum += hist(i)._2; i += 1
    }
    if (i >= hist.length) (scored, release) // whole corpus fits
    else {
      val rStar = hist(i)._1
      val above = scored.filter(col("stopword_ratio") > rStar)
      val remaining = budget - cum
      // only the boundary tie group is sorted — one quality value's
      // rows, not the corpus (the no-partition window is deliberate
      // and bounded)
      val w = Window.orderBy(col(idCol).asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val boundary = scored.filter(col("stopword_ratio") === rStar)
        .withColumn("_cum", sum("n_tokens").over(w))
        .filter(col("_cum") <= remaining)
        .drop("_cum")
      (above.unionByName(boundary), release)
    }
  }

  /** Corpus snapshot diff — the dataset-versioning primitive: classify
    * every document id across two snapshots as added / removed /
    * changed / unchanged by content digest. What a training-data
    * pipeline runs before re-tokenizing: the changed+added set is the
    * incremental work list, the removed set the tombstones.
    *
    * Scale shape: both sides are reduced to (id, 16-byte md5) BEFORE
    * the full-outer join, so the exchange carries digests, never text
    * (the tx33/dd15 discipline); the join is id-keyed — AQE picks
    * broadcast for a small snapshot, shuffled keyed join otherwise.
    * Comparing digests instead of text also makes "changed" a pure
    * equality test, robust to any text width.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    // presence is carried EXPLICITLY, not inferred from the digest:
    // md5(null) is null, so a null-text document would otherwise read
    // as absent and misclassify as added/removed; the digest compare is
    // null-safe for the same reason (two null texts = unchanged)
    val o = oldDf.select(col(idCol), unhex(md5(col(textCol))).as("_ho"),
      lit(true).as("_po"))
    val n = newDf.select(col(idCol), unhex(md5(col(textCol))).as("_hn"),
      lit(true).as("_pn"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("_po").isNull, lit("added"))
          .when(col("_pn").isNull, lit("removed"))
          .when(col("_ho") <=> col("_hn"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select(col(idCol), col("status"))
  }

  /** Deterministic stratified hash sampling: keep a row iff the first 8
    * hex digits of md5(id) land below the stratum's percentage. No RNG,
    * no seed state — the sample is a pure function of the id, so it is
    * reproducible across runs, engines, and cluster topologies, and
    * membership is decidable per-row (map-side filter, no shuffle, no
    * sort, pushdown-friendly). `rates` maps stratum value → keep-%;
    * strata not listed keep `defaultPct`%.
    */
  def stratifiedHashSample(df: DataFrame, idCol: String, strataCol: String,
                           rates: Map[String, Int],
                           defaultPct: Int): DataFrame = {
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long") % 100
    val rateExpr = rates.foldLeft(lit(defaultPct): Column) {
      case (acc, (stratum, pct)) =>
        when(col(strataCol) === stratum, lit(pct)).otherwise(acc)
    }
    df.filter(bucket < rateExpr)
  }

  /** Deterministic corpus mixing: keep each stratum's rows, visited in
    * md5-hash order (a reproducible shuffle — no RNG state, identical
    * on retry and across engines), until the stratum's weight budget is
    * exhausted; first row over the line is cut. This is the
    * training-mix primitive ("N tokens of web, M of code") as a single
    * running-sum window per stratum. One shuffle on the stratum key;
    * mixes are usually over many sources/shards, so the key cardinality
    * carries the parallelism — for a pathological two-source mix, split
    * the budget over synthetic sub-strata first and union.
    */
  def mixToBudget(df: DataFrame, idCol: String, strataCol: String,
                  weightCol: String, budgets: Map[String, Long],
                  defaultBudget: Long): DataFrame = {
    // Per-key histogram cutoff (the sourceCap large-cap machinery with
    // weights): the original per-stratum window cumsum sorted every
    // stratum's FULL doc set — the dominant stratum is the skew case,
    // exactly the regime per-stratum token budgets exist for. Here the
    // (stratum, rank-first-byte) weight histogram — ≤ 256 rows per
    // stratum, no ids — finds each stratum's boundary bucket; docs in
    // low buckets and every under-budget stratum keep MAP-SIDE, and
    // only the boundary bucket (1/256 of an over-budget stratum) pays
    // the ordered cumsum. The keep set is bit-identical to the window
    // form (the hex rank's leading byte is its lexicographic major
    // order), which remains the oracle's formulation.
    import org.apache.spark.sql.expressions.Window
    val budget = budgets.foldLeft(lit(defaultBudget): Column) {
      case (acc, (s, b)) => when(col(strataCol) === s, lit(b)).otherwise(acc)
    }
    val withB = df
      .withColumn("_h", md5(col(idCol).cast("string")))
      .withColumn("_b", conv(substring(col("_h"), 1, 2), 16, 10)
        .cast("int"))
    val hist = withB.groupBy(col(strataCol), col("_b"))
      .agg(sum(col(weightCol).cast("long")).as("_s"))
    val wb = Window.partitionBy(col(strataCol)).orderBy(col("_b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bounds = hist.withColumn("_cum", sum("_s").over(wb))
      .withColumn("_budget", budget)
      .filter(col("_cum") > col("_budget"))
      .groupBy(col(strataCol)).agg(
        min_by(struct(col("_b"), col("_cum"), col("_s")), col("_b"))
          .as("_bd"),
        min(col("_budget")).as("_budget"))
      .select(col(strataCol).as("_k2"), col("_bd._b").as("_bstar"),
        (col("_budget") - (col("_bd._cum") - col("_bd._s")))
          .as("_quota"))
    val joined = withB.join(bounds, col(strataCol) <=> col("_k2"),
      "left").drop("_k2")
    val low = joined
      .filter(col("_bstar").isNull || col("_b") < col("_bstar"))
    val wr = Window.partitionBy(col(strataCol))
      .orderBy(col("_h").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = joined.filter(col("_b") === col("_bstar"))
      .withColumn("_run", sum(col(weightCol).cast("long")).over(wr))
      .filter(col("_run") <= col("_quota"))
      .drop("_run")
    low.unionByName(boundary).drop("_h", "_b", "_bstar", "_quota")
  }

  /** [[mixToBudget]] with DATA-DERIVED budgets: `budgetDf` is a
    * (strataCol, _budget) frame instead of a driver-side literal map —
    * the form a computed mix (e.g. [[temperatureMix]]) needs, where
    * budgets fall out of an aggregate over the corpus itself and never
    * touch the driver. Identical keep semantics and histogram-cutoff
    * plan; the budget attach is a broadcast join onto the ≤ 256-row-
    * per-stratum histogram (strata-sized — tiny by construction), not
    * onto the corpus. Strata ABSENT from `budgetDf` are unbudgeted and
    * keep everything (the under-budget path), matching `mixToBudget`'s
    * behavior for strata under their line.
    */
  def mixToBudgetDf(df: DataFrame, idCol: String, strataCol: String,
                    weightCol: String, budgetDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withB = df
      .withColumn("_h", md5(col(idCol).cast("string")))
      .withColumn("_b", conv(substring(col("_h"), 1, 2), 16, 10)
        .cast("int"))
    val hist = withB.groupBy(col(strataCol), col("_b"))
      .agg(sum(col(weightCol).cast("long")).as("_s"))
      .join(broadcast(budgetDf.select(col(strataCol),
        col("_budget").cast("long").as("_budget"))), Seq(strataCol))
    val wb = Window.partitionBy(col(strataCol)).orderBy(col("_b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bounds = hist.withColumn("_cum", sum("_s").over(wb))
      .filter(col("_cum") > col("_budget"))
      .groupBy(col(strataCol)).agg(
        min_by(struct(col("_b"), col("_cum"), col("_s")), col("_b"))
          .as("_bd"),
        min(col("_budget")).as("_budget"))
      .select(col(strataCol).as("_k2"), col("_bd._b").as("_bstar"),
        (col("_budget") - (col("_bd._cum") - col("_bd._s")))
          .as("_quota"))
    val joined = withB.join(bounds, col(strataCol) <=> col("_k2"),
      "left").drop("_k2")
    val low = joined
      .filter(col("_bstar").isNull || col("_b") < col("_bstar"))
    val wr = Window.partitionBy(col(strataCol))
      .orderBy(col("_h").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = joined.filter(col("_b") === col("_bstar"))
      .withColumn("_run", sum(col(weightCol).cast("long")).over(wr))
      .filter(col("_run") <= col("_quota"))
      .drop("_run")
    low.unionByName(boundary).drop("_h", "_b", "_bstar", "_quota")
  }

  /** Temperature-scaled source mixing (the multilingual-pretraining
    * mix rule): each stratum's TOKEN budget is proportional to
    * `tokens^α`, α = `alphaPct`/100 — α = 1 reproduces natural
    * proportions, α = 0 splits the budget uniformly, and the classic
    * α = 0.5 (the default) up-weights small sources at the expense of
    * dominant ones. Budgets are derived IN-PLAN from one strata-sized
    * aggregate (corpus scanned once for totals, once for the mix;
    * nothing collects to the driver) and applied via
    * [[mixToBudgetDf]]'s histogram cutoff, so the dominant stratum —
    * the very thing temperature mixing exists to tame — never pays a
    * full sort.
    *
    * Determinism: weights are quantized to integer 1e-6 units
    * immediately after the ONE float op (`tokens^α`), so the share
    * arithmetic `total·w div Σw` is exact-integer and
    * partition-invariant. At α = 0.5 that float op is `sqrt`,
    * correctly rounded in IEEE 754 and thus bit-identical across
    * engines — the oracle-safe setting. Other α go through `pow`,
    * which libms round differently in the last ulp; same-engine runs
    * are still deterministic, but cross-engine replay of a
    * quantization TIE is not guaranteed — gate such lanes at α = 0.5
    * or verify the tie margin. Overflow bound: totalBudget · wq must
    * stay under 2⁶³ (wq ≈ 10⁶·tokens^α — at α = 0.5 that allows
    * budgets past 10¹² tokens against exabyte strata).
    */
  def temperatureMix(df: DataFrame, idCol: String, strataCol: String,
                     weightCol: String, totalBudget: Long,
                     alphaPct: Int = 50): DataFrame = {
    require(totalBudget > 0, s"totalBudget must be positive: $totalBudget")
    require(alphaPct >= 0 && alphaPct <= 100,
      s"alphaPct must be in [0,100]: $alphaPct")
    val toks = df.groupBy(col(strataCol))
      .agg(sum(col(weightCol).cast("long")).as("_tok"))
    val scaled =
      if (alphaPct == 50) sqrt(col("_tok").cast("double"))
      else pow(col("_tok").cast("double"), lit(alphaPct / 100.0))
    val wq = toks.withColumn("_wq",
      round(scaled * 1000000d).cast("long"))
    val tot = wq.agg(sum(col("_wq")).as("_wsum"))
    val budgets = wq.crossJoin(broadcast(tot))
      .select(col(strataCol),
        expr(s"($totalBudget * _wq) div _wsum").as("_budget"))
    mixToBudgetDf(df, idCol, strataCol, weightCol, budgets)
  }

  /** TF-IDF term weighting: per-(doc, term) frequency × log inverse
    * document frequency, the classic relevance/keyword-extraction
    * score. `minTf` keeps the output to terms that matter in a doc.
    *
    * Scale shape: one (doc, term) partial agg (tokens combine map-side,
    * so the exchange carries counts, not token streams), one tiny term
    * agg derived FROM the first (no second pass over the text), a join
    * back on the term key (vocabulary-sized build side — broadcast-able
    * until the vocab outgrows memory, then a plain shuffle join on a
    * Zipf-skewed key that AQE splits), and the corpus doc count crossed
    * in as a broadcast scalar — no driver-side collect.
    */
  def tfidf(df: DataFrame, idCol: String, textCol: String,
            minTf: Int): DataFrame = {
    val toks = df.select(col(idCol),
      graft.functions.ShingleGen.shingleGen(col(textCol), 1,
        distinct = false)).toDF(idCol, "term")
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df_t"))
    val n = df.agg(count(lit(1)).cast("double").as("_n"))
    tf.join(dfT, Seq("term"))
      .crossJoin(broadcast(n))
      .filter(col("tf") >= minTf)
      .select(col(idCol), col("term"), col("tf"), col("df_t"),
        round(col("tf") * log(col("_n") / col("df_t")), 4).as("tfidf"))
  }

  /** BM25 term scoring (the Lucene/Okapi ranking function): per
    * (doc, term), `idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` with
    * the Robertson–Spärck-Jones smoothed idf
    * `ln((N−df+0.5)/(df+0.5)+1)`. Every input is an integer corpus
    * statistic (tf, df, dl, N, Σdl), so the score is a deterministic
    * double on any engine — no summation-order fuzz anywhere.
    *
    * Scale shape: same as [[tfidf]] — one (doc, term) partial agg, the
    * df table derived FROM it, doc lengths from a map-side projection,
    * corpus scalars broadcast; one term-keyed join back.
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           k1: Double = 1.2, b: Double = 0.75, minTf: Int = 1): DataFrame = {
    val toks = df.select(col(idCol),
      graft.functions.ShingleGen.shingleGen(col(textCol), 1,
        distinct = false)).toDF(idCol, "term")
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df_t"))
    val dl = df.select(col(idCol),
      size(split(col(textCol), " ")).cast("long").as("dl"))
    val scalars = dl.agg(count(lit(1)).cast("double").as("_n"),
      sum(col("dl")).cast("double").as("_sumdl"))
    tf.join(dfT, Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(scalars))
      .filter(col("tf") >= minTf)
      .select(col(idCol), col("term"), col("tf"), col("df_t"),
        // constants combined as COLUMN arithmetic (lit(k1) + lit(1)),
        // not Scala arithmetic: both engines then round the same
        // intermediate doubles the same way
        round(
          log((col("_n") - col("df_t") + 0.5) / (col("df_t") + 0.5) + 1.0) *
            (col("tf") * (lit(k1) + lit(1.0))) /
            (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
              lit(b) * col("dl") / (col("_sumdl") / col("_n")))), 4)
          .as("bm25"))
  }

  /** BM25 top-k retrieval: rank the corpus for a fixed set of
    * multi-term queries — the eval-retrieval / hard-negative-mining
    * primitive over [[bm25]]. Per (query, doc) the score is the sum of
    * the doc's BM25 weights over the query's terms; ranking keeps the
    * top `k` docs per query on the bounded-heap TopKPerKey operator.
    *
    * Per-term scores are integer-quantized (× 10⁴, half-up) BEFORE the
    * sum so the aggregate is an exact integer — a double sum's value
    * would depend on task-level addition order and never replay
    * bit-identically (`score_x1e4`; consumers divide by 10⁴).
    *
    * Scale shape: the query set is a literal broadcast (queries ≪
    * corpus always); the (doc, term) score table joins it map-side,
    * one partial agg keyed (query, doc), and the heap keeps ≤ k rows
    * per query per task — the scored fan-out never reaches an exchange
    * unranked.
    */
  def bm25Retrieve(df: DataFrame, idCol: String, textCol: String,
                   queryTerms: Seq[(Int, Seq[String])], k: Int,
                   k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val q = queryTerms
      .flatMap { case (qid, ts) => ts.distinct.map(t => (qid, t)) }
      .toDF("query_id", "term")
    val scored = bm25(df, idCol, textCol, k1, b, minTf = 1)
      .select(col(idCol), col("term"),
        round(col("bm25") * 10000).cast("long").as("_sx"))
    val perDoc = scored.join(broadcast(q), Seq("term"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("_sx")).as("score_x1e4"))
    graft.plans.TopK.perKey(perDoc, Seq("query_id"),
      Seq(col("score_x1e4").desc, col(idCol).asc), k)
  }

  /** Unigram language-model scoring (the CCNet-style perplexity quality
    * filter, with the LM trained on the corpus itself): per-doc
    * cross-entropy -mean log2 p(token) under the corpus unigram
    * distribution. High = surprising/rare vocabulary, low = boilerplate.
    *
    * Scale shape: the model IS a DataFrame (term → count), built by one
    * partial agg; scoring joins tokens to the model on the term key
    * (broadcast while the vocab fits, shuffle join beyond) and partial-
    * aggregates the per-doc mean — the corpus text crosses the wire
    * once, as tokens. Every corpus token has count ≥ 1 by construction,
    * so no smoothing branch is needed.
    */
  def lmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      graft.functions.ShingleGen.shingleGen(col(textCol), 1,
        distinct = false)).toDF(idCol, "term")
    val model = toks.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("_cnt"))
    val total = model.agg(sum(col("_cnt")).as("_tt"))
    toks.join(model, Seq("term"))
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(-avg(log(col("_cnt") / col("_tt")) / log(lit(2.0))), 4)
          .as("cross_entropy"))
  }

  /** Interpolated bigram LM scoring — [[lmScore]]'s 2-gram upgrade
    * (much closer to the CCNet perplexity filter): per-doc
    * cross-entropy under p(b|a) = λ·n(ab)/n(a) + (1−λ)·n(b)/T, the
    * Jelinek-Mercer mix of the corpus bigram model with its unigram
    * backoff. Both weights are explicit parameters so their DOUBLE
    * literals match an external replay exactly (computing 1−λ at
    * runtime would yield a different double than the SQL literal).
    *
    * Scale shape: two corpus-wide partial aggs (bigram + unigram
    * models), then the bigram stream joins the models on their keys
    * (vocabulary-sized build sides — broadcast-able until the vocab
    * outgrows memory) and partial-aggregates the per-doc mean; the
    * corpus crosses the wire once, at bigram granularity.
    */
  def lmScoreBigram(df: DataFrame, idCol: String, textCol: String,
                    lambdaBi: Double = 0.9,
                    lambdaUni: Double = 0.1): DataFrame = {
    val bg = df.select(col(idCol),
      graft.functions.ShingleGen.shingleGen(col(textCol), 2,
        distinct = false)).toDF(idCol, "bigram")
    val bi = bg.groupBy(col("bigram")).agg(count(lit(1)).as("n_ab"))
    val uni = df.select(graft.functions.ShingleGen
        .shingleGen(col(textCol), 1, distinct = false)).toDF("t")
      .groupBy(col("t")).agg(count(lit(1)).as("n_w"))
    val tu = uni.agg(sum(col("n_w")).cast("double").as("_tu"))
    bg.join(bi, Seq("bigram"))
      .withColumn("_a", split(col("bigram"), " ").getItem(0))
      .withColumn("_b", split(col("bigram"), " ").getItem(1))
      .join(uni.select(col("t").as("_a"), col("n_w").as("n_a")), Seq("_a"))
      .join(uni.select(col("t").as("_b"), col("n_w").as("n_b")), Seq("_b"))
      .crossJoin(broadcast(tu))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(-avg(log(
          lit(lambdaBi) * (col("n_ab").cast("double") / col("n_a")) +
            lit(lambdaUni) * (col("n_b") / col("_tu"))) / log(lit(2.0))), 4)
          .as("cross_entropy"))
  }

  /** Bigram PMI collocations: pointwise mutual information
    * ln(p(ab) / (p(a)·p(b))) over adjacent word pairs, the standard
    * phrase-mining signal ("new york" scores high, "of the" near zero).
    * `minCount` drops unstable rare pairs.
    *
    * Scale shape: two corpus-wide partial aggs (bigrams, unigrams —
    * both combine map-side so exchanges carry counts), then the
    * surviving frequent bigrams join the unigram table twice on its
    * key; after the `minCount` cut the bigram side is tiny, so both
    * joins broadcast the far smaller filtered side at scale. Totals are
    * broadcast scalars derived from the aggregates, not extra passes.
    */
  def pmiBigrams(df: DataFrame, textCol: String, minCount: Int): DataFrame = {
    val uni = df.select(graft.functions.ShingleGen
        .shingleGen(col(textCol), 1, distinct = false)).toDF("w")
      .groupBy(col("w")).agg(count(lit(1)).as("n_w"))
    val biAll = df.select(graft.functions.ShingleGen
        .shingleGen(col(textCol), 2, distinct = false)).toDF("bigram")
      .groupBy(col("bigram")).agg(count(lit(1)).as("n_ab"))
    val totU = uni.agg(sum(col("n_w")).cast("double").as("_tu"))
    val totB = biAll.agg(sum(col("n_ab")).cast("double").as("_tb"))
    val parts = biAll.filter(col("n_ab") >= minCount)
      .withColumn("a", split(col("bigram"), " ").getItem(0))
      .withColumn("b", split(col("bigram"), " ").getItem(1))
    parts
      .join(uni.select(col("w").as("a"), col("n_w").as("n_a")), Seq("a"))
      .join(uni.select(col("w").as("b"), col("n_w").as("n_b")), Seq("b"))
      .crossJoin(broadcast(totU))
      .crossJoin(broadcast(totB))
      .select(col("bigram"), col("n_ab"), col("n_a"), col("n_b"),
        round(log((col("n_ab") / col("_tb")) /
          ((col("n_a") / col("_tu")) * (col("n_b") / col("_tu")))), 4)
          .as("pmi"))
  }

  /** Efraimidis–Spirakis weighted sampling WITHOUT replacement: the
    * top-k rows per stratum by priority u^(1/w) are a weighted sample —
    * heavier rows draw larger priorities in expectation, and unlike
    * Bernoulli thresholding the sample size is exactly k. `u` is the
    * md5-derived uniform (same as [[stratifiedHashSample]]), so the
    * draw is a pure function of the id — reproducible across engines
    * and retries, no RNG state. Selection runs on the TopKPerKey heap
    * operator: each partition forwards at most k rows per stratum, no
    * full sort, no global shuffle of losers. Rows with weight <= 0 are
    * excluded (E-S is undefined for them).
    */
  def weightedSample(df: DataFrame, idCol: String, strataCol: String,
                     weightCol: String, k: Int): DataFrame = {
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    val base = df.filter(col(weightCol) > 0)
      .withColumn("_pri", pow(u, lit(1.0) / col(weightCol).cast("double")))
    graft.plans.TopK.perKey(base, Seq(strataCol),
      Seq(col("_pri").desc, col(idCol).asc), k)
      .drop("_pri", "rk")
  }

  /** Hashed-linear classifier inference — the fasttext/CCNet-shaped
    * quality-filter pass every large text pipeline runs: tokens →
    * hashing-trick bucket (md5 mod `dim`, no vocabulary to ship) →
    * per-bucket weight → document score as the MEAN token weight.
    * Weights here are a deterministic md5 function of the bucket — the
    * stand-in for a trained model's weight vector; a real model drops
    * in as a `dim`-element literal/broadcast array without changing the
    * plan shape.
    *
    * Weights are integer MILLI-units and the document logit is their
    * exact integer sum (`logit_milli`) — order-free, so the surface
    * replays bit-exactly cross-engine; `mean_w = logit_milli / n_tokens
    * / 1000` adds only IEEE-identical divisions. The sigmoid is left to
    * the consumer: it is monotone in `mean_w`, so `keep = logit > 0`
    * (score > 0.5) needs no transcendental whose last ULP is libm's.
    *
    * Scale shape: pure map-side — no shuffle, no UDF, no vocabulary
    * broadcast; cost is two md5 per token.
    */
  def hashedClassifierScore(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", dim: Int = 256,
      seed: String = "qc"): DataFrame = {
    val toks = when(length(trim(col(textCol))) === 0,
        array().cast("array<string>"))
      .otherwise(split(lower(trim(col(textCol))), "\\s+"))
    def bucket(t: Column): Column =
      conv(substring(md5(concat(lit(seed + "_"), t)), 1, 8), 16, 10)
        .cast("long") % dim
    def weight(t: Column): Column =
      conv(substring(md5(concat(lit("w_"), bucket(t).cast("string"))),
        1, 8), 16, 10).cast("long") % 2001 - 1000
    df.select(col(idCol), size(toks).as("n_tokens"),
        aggregate(transform(toks, t => weight(t)), lit(0L),
          (acc, v) => acc + v).as("logit_milli"))
      // NO round() on the mean: two IEEE divisions on exact integer
      // inputs replay bit-identically on any engine, while round-to-6
      // hits decimal ties (e.g. 4060/64/1000 = .0634375) that Spark's
      // BigDecimal half-up and a binary-double round resolve in
      // OPPOSITE directions — surfaced at sf0.1, the ss13 lesson
      .withColumn("mean_w",
        try_divide(col("logit_milli").cast("double"),
          col("n_tokens").cast("double")) / lit(1000.0))
      .withColumn("keep", col("logit_milli") > 0)
  }

  /** Gopher quality rules (Rae et al. 2021, §A1.1): the standard
    * heuristic document filter — word count in [50, 100k], mean word
    * length in [3, 10], symbol-to-word ratio (# and "...") < 0.1, ≥ 80%
    * of words contain a letter, ≥ 2 stopwords. Every rule is an INTEGER
    * comparison (ratios cross-multiplied), so the verdicts replay
    * exactly on any engine — no float thresholds. Map-side, per-doc.
    */
  def gopherRules(df: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    gopherAnnotated(df, idCol, textCol, keepInput = false)

  /** Pipeline form of [[gopherRules]]: the rows of `df` that pass all
    * five rules, original columns intact. The verdict is computed
    * IN-ROW next to the data — no id join back to the corpus — so the
    * gate adds zero exchanges; at corpus scale the quality filter
    * belongs before the first shuffle, not in a metric join after it.
    * (Input columns must not collide with the metric names `n_words`,
    * `rule_*`, `keep`, or the staged `_`-prefixed intermediates.)
    */
  def gopherFilter(df: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    gopherAnnotated(df, idCol, textCol, keepInput = true)
      .filter(col("keep"))
      .select(df.columns.map(col).toIndexedSeq: _*)

  private def gopherAnnotated(df: DataFrame, idCol: String,
                              textCol: String,
                              keepInput: Boolean): DataFrame = {
    val t = col(textCol)
    val passCols =
      if (keepInput) df.columns.toSeq.map(col) else Seq(col(idCol))
    val words = when(length(trim(t)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(t), "\\s+"))
    val stopArr = array(stopwords.map(lit): _*)
    val staged = df.select(passCols ++ Seq(
      size(words).as("n_words"),
      aggregate(transform(words, w => length(w).cast("long")), lit(0L),
        (acc, v) => acc + v).as("_word_chars"),
      (length(t) - length(replace(t, lit("#"), lit("")))).cast("long")
        .as("_n_hash"),
      ((length(t) - length(replace(t, lit("..."), lit(""))))
        .cast("double") / lit(3)).cast("long").as("_n_ellipsis"),
      size(filter(words, w => w.rlike("[A-Za-z]"))).as("_n_alpha"),
      size(filter(words, w => array_contains(stopArr, lower(w))))
        .as("_n_stop")): _*)
    staged.select(passCols ++ Seq(col("n_words"),
      (col("n_words") >= 50 && col("n_words") <= 100000).as("rule_wc"),
      (col("_word_chars") >= lit(3L) * col("n_words") &&
        col("_word_chars") <= lit(10L) * col("n_words")).as("rule_mwl"),
      (lit(10L) * (col("_n_hash") + col("_n_ellipsis")) < col("n_words"))
        .as("rule_symbol"),
      (lit(10L) * col("_n_alpha") >= lit(8L) * col("n_words"))
        .as("rule_alpha"),
      (col("_n_stop") >= 2).as("rule_stop")): _*)
      .withColumn("keep", col("rule_wc") && col("rule_mwl") &&
        col("rule_symbol") && col("rule_alpha") && col("rule_stop"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score each RAW
    * document by how much more likely its hashed n-gram features are
    * under the TARGET corpus' bucket distribution than under the raw
    * corpus' own —
    * `log w(doc) = Σ_b c_doc[b]·(ln p̂_tgt[b] − ln p̂_raw[b])`, with
    * add-α smoothed bucket probabilities over md5-hashed unigrams +
    * bigrams. High `log_w` = looks like the target; feed the weights to
    * [[weightedSample]] for the resampling step.
    *
    * Scale shape: two generator passes over each corpus (unigrams,
    * bigrams — row-local, no shuffle), bucket histograms keyed on ≤
    * `buckets` values (map-side combined, exchanges carry counts), the
    * per-bucket log-ratio table broadcast (≤ `buckets` rows), and one
    * doc-keyed agg whose exchange carries (doc, bucket) counts — never
    * text. Totals derive FROM the histograms as broadcast scalars.
    *
    * Determinism: buckets and counts are md5-exact integers; `ln` of
    * rational doubles is correctly rounded in any engine; the per-doc
    * weighted sum is rounded to 4 decimals (the tx21/tx26/tx27
    * precision contract for order-free replay).
    */
  def dsirLogWeights(raw: DataFrame, target: DataFrame, idCol: String,
                     textCol: String, buckets: Int = 1024,
                     alpha: Double = 0.5,
                     seed: String = "dsir"): DataFrame = {
    // ONE fused generator pass per corpus scan: unigrams and bigrams
    // emitted together, each already reduced to its md5 bucket over a
    // byte range of the text — the two-pass union shape scanned the
    // corpus twice and materialized every gram string only to hash it
    // (declarative-parity of the bucket values pinned in ExtOpsSpec;
    // the DuckDB oracle replays the same md5 chain unchanged).
    def grams(df: DataFrame): DataFrame =
      df.select(col(idCol), graft.functions.ShingleGen
        .gramBuckets(col(textCol), Seq(1, 2), buckets, seed + "_"))
        .toDF(idCol, "_b")
    val rawGrams = grams(raw)
    val rawDist = rawGrams.groupBy(col("_b"))
      .agg(count(lit(1)).as("n_raw"))
    val tgtDist = grams(target).groupBy(col("_b"))
      .agg(count(lit(1)).as("n_tgt"))
    val rawTot = rawDist.agg(sum(col("n_raw")).cast("double").as("_tr"))
    val tgtTot = tgtDist.agg(sum(col("n_tgt")).cast("double").as("_tt"))
    val ratio = rawDist.join(tgtDist, Seq("_b"), "full")
      .na.fill(0L, Seq("n_raw", "n_tgt"))
      .crossJoin(broadcast(rawTot)).crossJoin(broadcast(tgtTot))
      .select(col("_b"),
        (log((col("n_tgt") + lit(alpha)) /
             (col("_tt") + lit(alpha * buckets))) -
         log((col("n_raw") + lit(alpha)) /
             (col("_tr") + lit(alpha * buckets)))).as("_lr"))
    rawGrams.groupBy(col(idCol), col("_b"))
      .agg(count(lit(1)).as("_c"))
      .join(broadcast(ratio), Seq("_b"))
      .groupBy(col(idCol))
      .agg(sum(col("_c")).as("n_grams"),
        round(sum(col("_c").cast("double") * col("_lr")), 4).as("log_w"))
  }

  /** Top-`vocabSize` whitespace-token vocabulary with the cumulative
    * corpus-coverage curve — the pre-tokenizer sizing sweep ("how many
    * corpus tokens does an N-entry vocab cover?"). Ties broken by term
    * text, so the table is deterministic on any engine.
    *
    * Scale shape: ONE (term, count) keyed agg (tokens combine map-side —
    * the exchange carries the vocabulary, not the token stream), then a
    * bounded global top-N (`TakeOrderedAndProject`: each task keeps N
    * rows, the driver merges heaps — the full vocabulary is never
    * sorted). The rank/cumulative window that follows runs on ≤ N rows,
    * so its single-partition sort is a constant, not a corpus scan.
    */
  def vocabCoverage(df: DataFrame, textCol: String,
                    vocabSize: Int): DataFrame = {
    val toks = df.select(graft.functions.ShingleGen
      .shingleGen(col(textCol), 1, distinct = false)).toDF("term")
    val counts = toks.groupBy(col("term"))
      .agg(count(lit(1)).as("term_count"))
    // total token count derived FROM the counts agg — no second pass
    val total = counts.agg(sum(col("term_count")).cast("double").as("_total"))
    val top = counts
      .orderBy(col("term_count").desc, col("term").asc).limit(vocabSize)
    // partitionBy(lit) is semantically the unpartitioned window (every
    // row shares the constant key) but keeps WindowExec from logging
    // "No Partition Defined" — which would read as a scale bug when the
    // input here is ≤ vocabSize rows by construction (post-limit).
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      .orderBy(col("term_count").desc, col("term").asc)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(ord))
      .withColumn("cum_coverage", round(
        sum(col("term_count")).over(
          ord.rowsBetween(Long.MinValue, 0)) / col("_total"), 4))
      .select(col("rank"), col("term"), col("term_count"),
        col("cum_coverage"))
  }

  /** Per-document out-of-vocabulary rate against the corpus' own
    * top-`vocabSize` vocabulary (see [[vocabCoverage]]) — the "how much
    * of each doc would an N-entry tokenizer UNK out" gate. Documents
    * with no tokens drop out (no rate exists).
    *
    * Scale shape: the vocabulary is ≤ `vocabSize` rows and broadcast;
    * the doc side is one token explode feeding a doc-keyed agg with
    * map-side partials. No shuffle touches token text except the
    * vocabulary-sized (term, count) agg inside vocabCoverage.
    */
  def oovRate(df: DataFrame, idCol: String, textCol: String,
              vocabSize: Int): DataFrame = {
    val vocab = vocabCoverage(df, textCol, vocabSize)
      .select(col("term"), lit(1).as("_in"))
    val toks = df.select(col(idCol), graft.functions.ShingleGen
      .shingleGen(col(textCol), 1, distinct = false)).toDF(idCol, "term")
    toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_in").isNull, 1).otherwise(0)).cast("long")
          .as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 4))
  }

  /** Deterministic shard assignment for training-data export:
    * `md5(id)` first 8 hex digits mod `nShards` — a pure function of
    * the id, identical on any engine, any retry, any partitioning.
    */
  def shardAssign(id: Column, nShards: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % nShards

  /** Train/eval split audit (tx55) — the leakage check a training
    * pipeline runs before trusting a split: a split keyed by DOCUMENT
    * id puts near-identical pages of one site on both sides
    * (contamination by construction), while a split keyed by the
    * GROUP (registered domain, source) is leakage-free because the
    * assignment is a pure function of the key. Both strategies are
    * evaluated side by side: deterministic md5-percent assignment
    * (`md5(x) % 100 < trainPct`, the shardAssign rule), per-strategy
    * train/eval row counts, and the count of LEAKY KEYS — group keys
    * with rows on both sides (zero for the by-key strategy by
    * construction; the audit proves it rather than assumes it).
    *
    * Scale shape: two map-side-combined aggregations (one per
    * strategy) plus a key-grouped distinct-count for leaks; no
    * windows, no collects, output is two rows.
    */
  def splitLeakageAudit(df: DataFrame, idCol: String, keyCol: String,
                        trainPct: Int): DataFrame = {
    require(trainPct > 0 && trainPct < 100,
      s"trainPct must be in (0,100): $trainPct")
    def pct(c: Column): Column =
      conv(substring(md5(c.cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    def audit(assigned: DataFrame, name: String): DataFrame = {
      val counts = assigned.agg(
        sum(when(col("_train"), 1L).otherwise(0L)).as("n_train"),
        sum(when(!col("_train"), 1L).otherwise(0L)).as("n_eval"))
      val leaky = assigned.groupBy(col(keyCol))
        .agg(countDistinct(col("_train")).as("_sides"))
        .filter(col("_sides") > 1)
        .agg(count(lit(1)).cast("long").as("n_leaky_keys"))
      counts.crossJoin(leaky)
        .select(lit(name).as("strategy"), col("n_train"),
          col("n_eval"), col("n_leaky_keys"))
    }
    val base = df.select(col(idCol), col(keyCol))
    audit(base.withColumn("_train", pct(col(keyCol)) < trainPct),
        "by_key")
      .unionByName(
        audit(base.withColumn("_train", pct(col(idCol)) < trainPct),
          "by_id"))
  }

  /** Per-shard export manifest for the deterministic global shuffle:
    * every doc lands in `shard = md5(id) % nShards`, ordered within the
    * shard by its md5 (the reproducible shuffle order — no RNG state),
    * and each shard reports docs, total weight, and an order-sensitive
    * fingerprint (XOR of position-salted id hashes: commutative across
    * tasks, yet any reorder, drop, or duplicate changes it). The
    * manifest is what a training job checks before trusting a shard set
    * — and what [[graft.sources.Compaction.writeHashSharded]] lays down.
    *
    * Scale shape: the within-shard rank comes from the two-phase
    * distributed prefix sum ([[stratumCumSum]] with a unit weight —
    * cum ≡ row_number under the same (md5, id) total order), NOT a
    * `row_number` window partitioned by the shard id: nShards is
    * small by construction (16–1024), so a shard window parks
    * corpus/nShards rows in ONE task's sort, while the range-
    * partitioned form splits every shard across boundaries. Then a
    * map-side-combined agg to `nShards` rows. Fingerprint terms are
    * < 2^32, so the XOR stays in long range by construction.
    */
  def shardManifest(df: DataFrame, idCol: String, weightCol: String,
                    nShards: Int): DataFrame =
    shardManifestReleasable(df, idCol, weightCol, nShards)._1

  /** [[shardManifest]] plus the release handle for the prefix-sum
    * checkpoint. */
  def shardManifestReleasable(df: DataFrame, idCol: String,
      weightCol: String, nShards: Int): (DataFrame, () => Unit) = {
    val assigned = df.select(col(idCol), col(weightCol))
      .withColumn("shard", shardAssign(col(idCol), nShards))
    // docs/weight need no rank — a plain map-side-combined agg; only
    // the order-sensitive fingerprint rides the rank pipeline, kept
    // MINIMAL-COLUMN (id, shard, _h, _one: exactly the columns the
    // prefix sum references) so the materialized pid-stamped frame
    // stores nothing it does not need — the stratumCumSum contract
    val totals = assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(weightCol).cast("long")).as("n_weight"))
    val base = assigned.select(col(idCol), col("shard"))
      .withColumn("_h", md5(col(idCol).cast("string")))
      .withColumn("_one", lit(1))
    val (cum, rel) = stratumCumSumReleasable(base, "shard",
      Seq(col("_h").asc, col(idCol).asc), "_one")
    val fps = cum
      .withColumn("_fpt", conv(substring(md5(concat(
        col(idCol).cast("string"), lit(":"), col("cum").cast("string"))),
        1, 8), 16, 10).cast("long"))
      .groupBy(col("shard"))
      .agg(expr("bit_xor(_fpt)").as("fp"))
    (totals.join(fps, Seq("shard"))
      .select(col("shard"), col("n_docs"), col("n_weight"), col("fp")),
      rel)
  }

  /** BPE merge-candidate counting — the inner loop of byte-pair-encoding
    * tokenizer training (Sennrich et al. 2016): count adjacent
    * character pairs across the corpus, weighted by word frequency; the
    * top pair is the next merge. One iteration is enough to gate
    * (later iterations only rewrite the vocabulary table and re-run the
    * same shape).
    *
    * Scale shape — the decision that makes tokenizer training feasible
    * on a 100-TB corpus: the corpus is touched EXACTLY ONCE, by the
    * word-frequency aggregation (map-side-combined, keys are single
    * lowercase words). Everything downstream — character splitting,
    * pair expansion, pair aggregation — runs on the DISTINCT-WORD table,
    * which is vocabulary-sized (Heaps' law: sublinear in corpus size),
    * not corpus-sized. The result is bounded to `topN` rows via the
    * sort-limit (TakeOrderedAndProject — no global sort materializes),
    * totally ordered by (count desc, pair asc) so the merge list is
    * deterministic across engines and topologies.
    */
  def bpePairCounts(df: DataFrame, textCol: String,
                    topN: Int): DataFrame = {
    val words = df.select(
        explode(regexp_extract_all(lower(col(textCol)),
          lit("[a-z]+"), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wf"))
    words.filter(length(col("w")) >= 2)
      .select(explode(transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"),
        col("wf"))
      .groupBy("pair").agg(sum("wf").as("n"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(topN)
  }

  /** Cross-source n-gram resemblance matrix: for every pair of values
    * of `groupCol` (corpus slices, crawl snapshots, dataset versions),
    * the exact Jaccard of their distinct word-k-gram sets — the corpus
    * diagnostic behind mixing and dedup decisions ("how much of slice A
    * already lives in slice B"). Pairs sharing no gram are absent
    * (inner-join semantics).
    *
    * Scale shape: the distinct (source, gram) table is
    * vocabulary-scaled, not corpus-scaled, and pairs form MAP-SIDE from
    * per-gram posting lists (the dd12 containment pattern), never via a
    * vocab×vocab join: one grouped collect builds each gram's sorted
    * source set (bounded by S, the source cardinality — a diagnostic
    * runs at S in the tens, not thousands; `maxSources` makes the
    * bound ENFORCED — a gram shared by more sources fails the job with
    * a raise_error inside the plan rather than silently exploding S²
    * megarows per gram), and the S²-bounded pair expansion is an
    * in-row slice explode. The gram stream comes off the native
    * zero-copy Generator, not the HOF array chain, and is digested to
    * a fixed 16-byte md5 BEFORE the distinct — the gram-key exchanges
    * carry digests, never gram text (the tx33/dd15 no-text-in-shuffles
    * discipline; the oracle computes the identical md5, so even a
    * collision replays bit-identically). Measured
    * at sf0.1 on gram-saturated data (every gram in ~all 20 sources —
    * the worst case): self-join + HOF chain 2.29 s → posting-list
    * pairs + native generator 0.91 s. The
    * quotient is a raw IEEE division of exact integers — replays
    * bit-identically in any engine, no rounding step to disagree on.
    */
  def sourceOverlap(df: DataFrame, groupCol: String, textCol: String,
                    k: Int, maxSources: Int = 128): DataFrame = {
    // native zero-copy shingle Generator, not the HOF array chain —
    // the gram stream is the lane's volume term (PERF.md ~7× lesson);
    // the digest is projected before the distinct so its exchange
    // carries fixed 16-BYTE BINARY keys, not unbounded gram strings
    // (unhex, not the 32-char hex form — hex doubled the key bytes and
    // measurably lost to raw short grams on the 5 M-doc probe; the
    // oracle groups on the hex digest, a bijection of these bytes, so
    // collision behavior still replays exactly)
    val grams = df.select(col(groupCol).as("src"),
        graft.functions.ShingleGen.shingleGen(col(textCol), k,
          distinct = true).as("_gt"))
      .select(col("src"), unhex(md5(col("_gt"))).as("g"))
      .distinct()
    val sizes = grams.groupBy("src").agg(count(lit(1)).as("nv"))
    // sorted source set per gram → (i, j>i) pairs in-row: sa < sb by
    // construction (sort_array and the string `<` are both binary).
    // The guard lives INSIDE the consumed column (a bare assert_true
    // projection would be pruned away unevaluated).
    val ss = sort_array(collect_set(col("src")))
    val guarded = when(size(ss) <= maxSources, ss).otherwise(raise_error(
      concat(lit("sourceOverlap: a gram is shared by "),
        size(ss).cast("string"),
        lit(s" sources, over maxSources=$maxSources — the in-row pair" +
          " expansion is S^2 per gram; raise maxSources deliberately" +
          " or pre-filter boilerplate grams"))))
    val inter = grams.groupBy("g")
      .agg(guarded.as("ss"))
      .select(posexplode(col("ss")).as(Seq("i", "sa")), col("ss"))
      .select(col("sa"), explode(
        slice(col("ss"), col("i") + 2, size(col("ss")))).as("sb"))
      .groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("src").as("sa"), col("nv").as("na")), "sa")
      .join(sizes.select(col("src").as("sb"), col("nv").as("nb")), "sb")
      .select(col("sa"), col("sb"), col("inter"), col("na"), col("nb"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter"))).as("jaccard"))
  }

  /** Iterative BPE merge learning (Sennrich et al. 2016): `nMerges`
    * rounds of count-adjacent-symbol-pairs → adopt the most frequent
    * pair as a merge → rewrite the vocabulary. Returns the learned
    * merge table (rank, pair, n) — the actual tokenizer-training
    * artifact ([[bpePairCounts]] is one round of the counting step).
    *
    * Scale shape — why this trains a tokenizer on a 100-TB corpus:
    * the corpus is scanned EXACTLY ONCE (the word-frequency agg); the
    * merge loop then runs on the vocabulary alone. By default that
    * loop is DRIVER-LOCAL over the collected word-frequency table
    * (see [[bpeMaxLocalVocab]] and the hybrid rationale on
    * `bpeTrain`) — a real tokenizer's 30k–50k merges finish in
    * seconds instead of hours of per-merge job scheduling. Beyond the
    * vocab threshold the distributed fallback iterates on the
    * symbolized vocabulary table (checkpointed serialized-spillable,
    * the superseded round unpersisted — the clustersDataFrame
    * discipline) with ONE row per iteration of driver traffic (the
    * k-means-centroid idiom). Fewer than `nMerges` rows come back
    * when the merge space exhausts first.
    *
    * Determinism: the merge choice is totally ordered (n desc, pair
    * asc), and the rewrite is literal non-overlapping left-to-right
    * `replace` on a DOUBLE-space-separated symbol string
    * ("␣␣s1␣␣s2␣␣…"): the pattern "␣a␣␣b␣" consumes one space of each
    * two-space boundary and the replacement "␣ab␣" restores it, so the
    * leftover half-boundary stays available to the adjacent match —
    * consecutive runs merge exactly like BPE's zero-width-boundary
    * leftmost-first scan ("aaaa" → [aa][aa], not [aa][a][a], the bug a
    * single-space sentinel has: its shared separator is consumed by the
    * previous match; caught by the PropertySpec model sweep). Literal
    * replace needs no regex lookbehind, so the identical semantics hold
    * in any engine and the whole trajectory replays exactly.
    */
  def bpeLearn(df: DataFrame, textCol: String, nMerges: Int,
               maxLocalVocab: Long = bpeMaxLocalVocab): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (vocab, merges) = bpeTrain(df, textCol, nMerges, maxLocalVocab)
    val out = merges.toDF("rank", "pair", "n")
    graft.Release(vocab)
    out
  }

  /** Vocabulary-size ceiling for the driver-local BPE merge loop (the
    * `geocodeAuto` guardrail pattern): at or below it the word-frequency
    * table is collected once and merges run in-memory; above it the
    * distributed vocab-table loop takes over. 2 M distinct words ≈
    * 100–200 MB of driver heap — well past any natural-language corpus'
    * [a-z]+ vocabulary (Heaps' law puts 100 TB of English near 10⁶·5).
    */
  val bpeMaxLocalVocab: Long = 2000000L

  /** The shared BPE training loop: returns the FINAL symbolized
    * vocabulary (w, sym, wf) and the adopted merge list (fewer than
    * `nMerges` rows when the merge space exhausts first — every word
    * reduced to one symbol). [[bpeLearn]] publishes the merges;
    * [[bpeTokenCount]] joins the vocabulary back to the corpus.
    *
    * HYBRID execution — the iteration-count economics: the corpus is
    * always scanned exactly once (the word-frequency agg). What varies
    * is where the merge loop runs. The distributed form schedules one
    * vocabulary-sized Spark job per merge (~0.2 s of pure coordination
    * each); real tokenizers take 30k–50k merges, which would be hours
    * of scheduling on a problem that fits one machine. So when the
    * vocabulary is at most `maxLocalVocab` rows (checked by collecting
    * `limit(max+1)` — one job, no separate count), the merge loop runs
    * driver-local over the collected table with incremental pair
    * counts and a lazy max-heap (the HF-tokenizers shape: each merge
    * touches only the words containing the adopted pair). Beyond the
    * threshold, the distributed vocab-only loop is the fallback.
    * Both paths implement the identical semantics — leftmost-first
    * non-overlapping merge, (n desc, pair asc) adoption order — and
    * are asserted equal in ExtOpsSpec; the local loop is also exactly
    * the PropertySpec list-rewrite model.
    *
    * The local path's vocab DataFrame is a plain driver-side local
    * relation — nothing cached, `unpersist` a no-op. Only the
    * distributed fallback returns a checkpointed vocab the caller must
    * release.
    */
  private def bpeTrain(df: DataFrame, textCol: String, nMerges: Int,
                       maxLocalVocab: Long = bpeMaxLocalVocab)
      : (DataFrame, Seq[(Int, String, Long)]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val wordsAgg = df.select(
        explode(regexp_extract_all(lower(col(textCol)),
          lit("[a-z]+"), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wf"))
    if (maxLocalVocab <= 0) bpeTrainDistributed(wordsAgg, nMerges)
    else {
      // "Corpus scanned EXACTLY ONCE" holds on BOTH branches: the
      // word-frequency table is checkpointed (vocabulary-sized,
      // serialized-spillable) BEFORE the limit-probe, so a fallback to
      // the distributed loop re-reads the checkpoint — not the corpus,
      // which is precisely the large-vocab case where a second scan
      // would hurt most. The checkpoint is released as soon as it is
      // superseded: by the probe's collected array on the local path,
      // by the distributed loop's own first vocab checkpoint otherwise.
      val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
      val words = wordsAgg.iterCkpt(ser)
      val probeCap = math.min(maxLocalVocab, Int.MaxValue - 2L).toInt
      val probe = words.limit(probeCap + 1).as[(String, Long)].collect()
      if (probe.length <= probeCap) {
        graft.Release(words)
        val (vocab, merges) = bpeTrainLocal(probe, nMerges)
        (vocab.toSeq.toDF("w", "sym", "wf"), merges)
      } else {
        // bpeTrainDistributed runs eagerly to the fixed point and its
        // returned vocab is its OWN materialized checkpoint, so the
        // input checkpoint is dead weight once it returns.
        val out = bpeTrainDistributed(words, nMerges)
        graft.Release(words)
        out
      }
    }
  }

  /** Driver-local BPE merge loop over the collected word-frequency
    * table. Incremental: pair counts and a pair→containing-words index
    * are built once; each adopted merge rewrites only the words that
    * contain the pair and applies count deltas, with a lazy-deletion
    * max-heap ((n, pair) entries re-pushed on every change, stale tops
    * discarded at pop) giving O(log P) adoption. Stops early when no
    * pair remains. Returns the final vocabulary in the same
    * sentinel-space encoding the distributed loop uses
    * ("␣␣s1␣␣s2␣␣…") plus the merge list.
    */
  private[operators] def bpeTrainLocal(
      words: Array[(String, Long)], nMerges: Int)
      : (Array[(String, String, Long)], Seq[(Int, String, Long)]) = {
    import scala.collection.mutable
    val syms: Array[Array[String]] =
      words.map(_._1.map(_.toString).toArray)
    val wf: Array[Long] = words.map(_._2)
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.BitSet]
    // max-heap: highest count first, ties broken by SMALLEST "a b"
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](
      new Ordering[(Long, String, String)] {
        def compare(x: (Long, String, String),
                    y: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(x._1, y._1)
          if (c != 0) c
          else {
            val p = (y._2 + " " + y._3).compareTo(x._2 + " " + x._3)
            p
          }
        }
      })
    def bump(i: Int, a: String, b: String, delta: Long): Unit = {
      val k = (a, b)
      val n = pairCount.getOrElse(k, 0L) + delta
      pairCount(k) = n
      if (delta > 0)
        pairWords.getOrElseUpdate(k, mutable.BitSet.empty) += i
      if (n > 0) heap.enqueue((n, a, b))
    }
    var i = 0
    while (i < syms.length) {
      val s = syms(i)
      var j = 0
      while (j + 1 < s.length) { bump(i, s(j), s(j + 1), wf(i)); j += 1 }
      i += 1
    }
    val merges = Seq.newBuilder[(Int, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      var top: (Long, String, String) = null
      while (top == null && heap.nonEmpty) {
        val cand = heap.dequeue()
        if (cand._1 > 0 &&
            pairCount.getOrElse((cand._2, cand._3), 0L) == cand._1)
          top = cand
      }
      if (top == null) exhausted = true
      else {
        val (n, a, b) = top
        merges += ((rank, a + " " + b, n))
        val merged = a + b
        // snapshot: the membership index is add-only (lazily stale),
        // so re-verify containment during the rewrite
        val affected = pairWords.getOrElse((a, b), mutable.BitSet.empty)
          .toArray
        for (w <- affected) {
          val s = syms(w)
          var has = false
          var j = 0
          while (!has && j + 1 < s.length) {
            has = s(j) == a && s(j + 1) == b; j += 1
          }
          if (has) {
            // retract the old adjacencies, apply the leftmost-first
            // non-overlapping merge, add the new ones
            j = 0
            while (j + 1 < s.length) { bump(w, s(j), s(j + 1), -wf(w)); j += 1 }
            val out = Array.newBuilder[String]
            j = 0
            while (j < s.length) {
              if (j + 1 < s.length && s(j) == a && s(j + 1) == b) {
                out += merged; j += 2
              } else { out += s(j); j += 1 }
            }
            val ns = out.result()
            syms(w) = ns
            j = 0
            while (j + 1 < ns.length) { bump(w, ns(j), ns(j + 1), wf(w)); j += 1 }
          }
        }
        rank += 1
      }
    }
    val vocab = Array.tabulate(words.length) { k =>
      (words(k)._1, syms(k).mkString("  ", "  ", "  "), wf(k))
    }
    (vocab, merges.result())
  }

  /** Distributed fallback merge loop: one vocabulary-sized Spark job
    * per merge (sentinel-space literal replace — see [[bpeLearn]]),
    * serialized-spillable checkpoints with the superseded round
    * unpersisted, 1 row per round to the driver. Breaks out early
    * (returning the merges adopted so far) when the merge space
    * exhausts — the empty-top edge a fixed `collect()(0)` would throw
    * on.
    */
  private def bpeTrainDistributed(words: DataFrame, nMerges: Int)
      : (DataFrame, Seq[(Int, String, Long)]) = {
    val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    var vocab = words
      .select(col("w"), concat(lit("  "), concat_ws("  ",
          regexp_extract_all(col("w"), lit("[a-z]"), lit(0))), lit("  "))
        .as("sym"), col("wf"))
      .iterCkpt(ser)
    val merges = Seq.newBuilder[(Int, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      val s = split(trim(col("sym")), " +")
      val top = vocab.filter(size(s) >= 2)
        .select(explode(transform(sequence(lit(1), size(s) - 1),
            i => concat(element_at(s, i), lit(" "), element_at(s, i + 1))))
          .as("pair"), col("wf"))
        .groupBy("pair").agg(sum("wf").as("n"))
        .orderBy(col("n").desc, col("pair").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        merges += ((rank, pair, top(0).getLong(1)))
        val next = vocab.select(col("w"),
            replace(col("sym"), lit(" " + pair.replace(" ", "  ") + " "),
              lit(" " + pair.replace(" ", "") + " ")).as("sym"),
            col("wf"))
          .iterCkpt(ser)
        graft.Release(vocab)
        vocab = next
        rank += 1
      }
    }
    (vocab, merges.result())
  }

  /** BPE tokenization — the APPLY side of [[bpeLearn]] (count → learn →
    * apply completes the tokenizer loop): per-doc BPE token counts
    * under the first `nMerges` learned merges. Docs with no extractable
    * word are absent (inner-join semantics).
    *
    * Scale shape: merges are learned and applied entirely on the
    * vocabulary table (the [[bpeLearn]] economics); tokenizing the
    * corpus is then ONE scan joined to the vocabulary-sized
    * (word → symbol-count) table on the word key, and a doc-keyed
    * map-side-combined agg. The vocab side is explicitly BROADCAST: a
    * tokenizer's vocabulary is executor-resident by definition (every
    * real tokenizer worker holds the merge table), and without the
    * hint a vocab just over the autoBroadcast threshold silently
    * shuffles the corpus-sized word stream instead (measured at 10 M
    * docs / 240 M word occurrences, 8 g: 38.4 s shuffled → 28.5 s
    * broadcast; the residual is the word explode + doc agg, which is
    * the irreducible tokenization work). For a freak vocabulary beyond
    * executor memory, drop the hint and let AQE plan the keyed join.
    * The corpus never re-tokenizes per merge.
    */
  def bpeTokenCount(df: DataFrame, idCol: String, textCol: String,
                    nMerges: Int,
                    maxLocalVocab: Long = bpeMaxLocalVocab): DataFrame =
    bpeTokenizer(df, idCol, textCol, nMerges, maxLocalVocab)._1

  /** [[bpeTokenCount]] plus the tokenizer-model release handle. On the
    * default driver-local training path the vocabulary is a plain
    * local relation — nothing is cached and the handle is a no-op. On
    * the distributed fallback the returned plan reads the checkpointed
    * vocabulary lazily (it IS the tokenizer model; localCheckpoint
    * blocks are unrecoverable once dropped, so an eager unpersist here
    * would race the caller's execution) — call the handle after the
    * tokenization pass completes to release it, rather than leaking
    * one cached vocab table per invocation for the session.
    */
  /** The frozen tokenizer model as a driver-side map: word → BPE
    * symbol count under the first `nMerges` learned merges.
    * Vocabulary-sized by definition (every real tokenizer worker
    * holds the merge table), so collecting it is the deployment
    * artifact, not a scale hazard; the training checkpoint (taken on
    * the distributed fallback path only) is released before
    * returning. This is the model hand-off
    * [[graft.streaming.StreamingOps.bpeTokenizeStream]] serves from.
    */
  def bpeSymCountMap(corpus: DataFrame, textCol: String, nMerges: Int,
                     maxLocalVocab: Long = bpeMaxLocalVocab)
      : Map[String, Long] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (vocab, _) = bpeTrain(corpus, textCol, nMerges, maxLocalVocab)
    val m = vocab.select(col("w"),
        size(split(trim(col("sym")), "  ")).cast("long"))
      .as[(String, Long)].collect().toMap
    graft.Release(vocab)
    m
  }

  /** Per-document BPE token SEQUENCES — the emit side of the apply
    * (bpeTokenCount verifies the arithmetic; this produces the actual
    * token stream a trainer consumes). Output: (id, bpe_tokens
    * space-joined in word order, n_tokens).
    *
    * Scale shape: merges are applied on the VOCABULARY table as in
    * [[bpeTokenizer]]; the corpus pays one positional word explode, a
    * broadcast join to the vocab-sized (word → token-string) table,
    * and ONE doc-keyed reassembly agg — the dd11/tx35 in-order
    * reassembly idiom (collect (pos, toks), sort in-row, join) — so
    * the only corpus-sized exchange carries (id, pos, word tokens),
    * and the corpus is never re-scanned per merge.
    */
  def bpeTokenSequences(df: DataFrame, idCol: String, textCol: String,
                        nMerges: Int,
                        maxLocalVocab: Long = bpeMaxLocalVocab)
      : (DataFrame, () => Unit) = {
    val (vocab, _) = bpeTrain(df, textCol, nMerges, maxLocalVocab)
    val wordToks = vocab.select(col("w"),
      replace(trim(col("sym")), lit("  "), lit(" ")).as("toks"),
      size(split(trim(col("sym")), "  ")).cast("long").as("n_sym"))
    val seqs = df.select(col(idCol),
        posexplode(regexp_extract_all(lower(col(textCol)),
          lit("[a-z]+"), lit(0))).as(Seq("pos", "w")))
      .join(broadcast(wordToks), Seq("w"))
      .groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("toks")))),
          x => x.getField("toks")), " ").as("bpe_tokens"),
        sum("n_sym").as("n_tokens"))
    (seqs, () => graft.Release(vocab))
  }

  def bpeTokenizer(df: DataFrame, idCol: String, textCol: String,
                   nMerges: Int,
                   maxLocalVocab: Long = bpeMaxLocalVocab)
      : (DataFrame, () => Unit) = {
    val (vocab, _) = bpeTrain(df, textCol, nMerges, maxLocalVocab)
    val symCount = vocab.select(col("w"),
      size(split(trim(col("sym")), "  ")).cast("long").as("n_sym"))
    val counts = df.select(col(idCol),
        explode(regexp_extract_all(lower(col(textCol)),
          lit("[a-z]+"), lit(0))).as("w"))
      .join(broadcast(symCount), Seq("w"))
      .groupBy(col(idCol))
      .agg(sum("n_sym").as("n_bpe_tokens"),
        count(lit(1)).as("n_words"))
    (counts, () => graft.Release(vocab))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization for DEDUP KEYS (tx48): NFKC normalize →
  * lower-case (Locale.ROOT) → strip a documented homoglyph table to
  * ASCII. Real corpora carry the same text in NFC and NFD (macOS
  * filenames, copy-paste chains), full-width compatibility forms (CJK
  * pipelines), and Cyrillic/Greek homoglyph spoofs — all byte-different,
  * so `md5(text)` dedup (dd1) and shingle grams structurally miss them.
  * This expression makes the canonical key explicit: hash
  * `unicode_norm_key(text)` instead of `text`.
  *
  * Order matters and is pinned by spec: NFKC first (folds full-width
  * Ａ → A and composes e +  ́ → é), THEN lower-case (Ａ→A→a; Cyrillic
  * А→а), THEN the homoglyph map (so it only needs lower-case entries).
  * The table enumerates the major single-codepoint confusable classes
  * of the public Unicode confusables data (Cyrillic + Greek +
  * Armenian + Latin letterlike, r14) — the full file is data, not a
  * rule, and this sandbox has no egress to fetch it; a production
  * deployment regenerates the table from `confusables.txt` behind the
  * same expression.
  *
  * Determinism: `java.text.Normalizer` implements Unicode normalization
  * exactly (stable across JVMs for a given Unicode version), Locale.ROOT
  * lower-casing avoids the Turkish-i trap, and the homoglyph map is
  * static — the same bytes key identically on every executor.
  *
  * Composition with dd1 (exact dedup): `groupBy(md5(unicode_norm_key
  * (text)))` — the tx48 lane demonstrates exactly this, and the planted
  * NFC/NFD/full-width/homoglyph twins collapse into one group where
  * raw-byte md5 keeps them apart.
  */
case class UnicodeNormKeyExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"unicode_norm_key expects string, got ${other.simpleString}")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    UnicodeNorm.key(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.key($c)")

  override protected def withNewChildInternal(c: Expression): UnicodeNormKeyExpr =
    copy(child = c)

  override def prettyName: String = "unicode_norm_key"
}

object UnicodeNorm {

  /** Lower-case homoglyphs → ASCII, applied AFTER casefold so capitals
    * fold into these entries. Grown in r14 from the original 12-entry
    * Cyrillic core to the major single-codepoint confusable classes of
    * the public Unicode confusables data (Cyrillic, Greek, Armenian,
    * and the Latin letterlike strays) — every entry is a lower-case
    * letter whose standard glyph renders indistinguishably from (or as
    * the canonical spoof of) an ASCII letter. Entries NFKC already
    * folds (full-width forms, ℓ on some Unicode versions) are harmless
    * here: the map only sees what survives normalization. Still
    * enumerated rather than generated — the sandbox has no egress to
    * fetch confusables.txt — and the swap seam is unchanged: a
    * production deployment regenerates this table from the data file
    * behind the same expression.
    */
  private val confusables: Map[Char, Char] = Map(
    // Cyrillic
    'а' -> 'a', // а
    'е' -> 'e', // е
    'о' -> 'o', // о
    'р' -> 'p', // р
    'с' -> 'c', // с
    'у' -> 'y', // у
    'х' -> 'x', // х
    'і' -> 'i', // і
    'ј' -> 'j', // ј
    'һ' -> 'h', // һ
    'ѕ' -> 's', // ѕ
    'ԁ' -> 'd', // ԁ Komi de
    'ԛ' -> 'q', // ԛ qa
    'ԝ' -> 'w', // ԝ we
    'ѵ' -> 'v', // ѵ izhitsa
    'ӏ' -> 'l', // ӏ palochka
    // Greek
    'ο' -> 'o', // ο omicron
    'ν' -> 'v', // ν nu
    'ρ' -> 'p', // ρ rho
    'ς' -> 'c', // ς final sigma — the NFKC image of lunate ϲ (U+03F2),
                // which is the c-shaped glyph; entries must be the
                // POST-NFKC codepoint or they never match
    'υ' -> 'u', // υ upsilon
    'ω' -> 'w', // ω omega
    'γ' -> 'y', // γ gamma
    'κ' -> 'k', // κ kappa
    'ι' -> 'i', // ι iota
    // Armenian
    'օ' -> 'o', // օ oh
    'ս' -> 'u', // ս seh
    'հ' -> 'h', // հ ho
    'ո' -> 'n', // ո vo
    // Latin letterlike strays
    'ı' -> 'i', // ı dotless i
    'ȷ' -> 'j', // ȷ dotless j
    'ℓ' -> 'l') // ℓ script l (when NFKC leaves it)

  def key(s: UTF8String): UTF8String = {
    val raw = s.toString
    // fast path: ASCII lower-case text (the overwhelmingly common row)
    // needs no normalizer pass and no allocation beyond the check
    var i = 0
    var asciiLower = true
    while (asciiLower && i < raw.length) {
      val c = raw.charAt(i)
      if (c >= 128 || (c >= 'A' && c <= 'Z')) asciiLower = false
      i += 1
    }
    if (asciiLower) return s
    val nfkc = java.text.Normalizer.normalize(raw,
      java.text.Normalizer.Form.NFKC)
    val folded = nfkc.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(folded.length)
    var j = 0
    while (j < folded.length) {
      val c = folded.charAt(j)
      sb.append(if (c < 128) c else confusables.getOrElse(c, c))
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def unicodeNormKey(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(UnicodeNormKeyExpr(ColumnBridge.expression(c)))
  }
}

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
  * The table is deliberately small and enumerated — the common
  * Cyrillic/Greek lower-case homoglyphs — because the full Unicode
  * confusables table is a data file, not a rule; a production
  * deployment swaps in the full table behind the same expression.
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

  /** Lower-case homoglyphs → ASCII. Cyrillic letters whose standard
    * glyph is indistinguishable from a Latin letter in common fonts,
    * plus the Greek omicron; applied AFTER casefold so capitals fold
    * into these entries. Kept table-small on purpose (scaladoc above).
    */
  private val confusables: Map[Char, Char] = Map(
    'а' -> 'a', // Cyrillic а
    'е' -> 'e', // Cyrillic е
    'о' -> 'o', // Cyrillic о
    'р' -> 'p', // Cyrillic р
    'с' -> 'c', // Cyrillic с
    'у' -> 'y', // Cyrillic у
    'х' -> 'x', // Cyrillic х
    'і' -> 'i', // Cyrillic і
    'ј' -> 'j', // Cyrillic ј
    'һ' -> 'h', // Cyrillic һ
    'ѕ' -> 's', // Cyrillic ѕ
    'ο' -> 'o') // Greek ο

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

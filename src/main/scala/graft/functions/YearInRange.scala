package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused year-union containment predicate: parse the reference's year
  * string ("1850" or "1850/51") ONCE and test
  * `yearMin >= lo && yearMax <= hi` — semantically identical to
  * `CityDirOps.yearInterval(yearNorm(y).yearMin, yearNorm(y).yearMax,
  * lo, hi)` (spec-asserted on random inputs).
  *
  * Why it exists: the declarative form substitutes the yearNorm
  * expression (split + regexp_extract + casts) into the Filter condition
  * once per struct-field reference, so the regex machinery runs 2-3×
  * per row in the hot predicate. This expression does one JVM pass over
  * the string — JS parseInt semantics (skip leading whitespace, read
  * digits, junk → no match), split-volume `+1` rule — and is the shape
  * year filters take at the scan boundary at scale. Null/unparseable
  * years are simply not in range (the filter semantics of a null
  * predicate).
  */
case class YearInRangeExpr(child: Expression, lo: Int, hi: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"year_in_range expects string, got ${other.simpleString}")
    }

  override def dataType: DataType = BooleanType
  // null year → null predicate → dropped by Filter, same as the
  // declarative null-AND semantics
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    YearInRange.contains(a.asInstanceOf[UTF8String], lo, hi)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.YearInRange.contains($c, $lo, $hi)")

  override protected def withNewChildInternal(c: Expression): YearInRangeExpr =
    copy(child = c)

  override def prettyName: String = "year_in_range"
}

object YearInRange {

  /** One-pass parse + containment; JS parseInt semantics on the part
    * before any '/', `+1` max rule for split volumes.
    */
  def contains(s: UTF8String, lo: Int, hi: Int): Boolean = {
    val bytes = s.getBytes
    val len = bytes.length
    var i = 0
    // leading whitespace — Java \s is [ \t\n\x0B\f\r], and yearNorm's
    // regexp_extract("^\\s*(\\d+)") skips all five, so the fused
    // predicate must too (form feeds are plausible OCR noise here)
    while (i < len && (bytes(i) == ' ' || bytes(i) == '\t' ||
      bytes(i) == '\n' || bytes(i) == 0x0B || bytes(i) == '\f' ||
      bytes(i) == '\r')) i += 1
    var sawDigit = false
    // leading zeros carry no magnitude; skipping them lets
    // "0000001850" parse to 1850 exactly as the int cast does
    while (i < len && bytes(i) == '0') { i += 1; sawDigit = true }
    var y = 0L
    var digits = 0
    while (i < len && bytes(i) >= '0' && bytes(i) <= '9') {
      y = y * 10 + (bytes(i) - '0')
      digits += 1
      // > 10 significant digits can't fit an int; the declarative form
      // would raise under ANSI — out-of-range is the usable semantics
      if (digits > 10) return false
      i += 1
    }
    if (!sawDigit && digits == 0) return false // no leading digits → parseInt NaN
    if (y > Int.MaxValue) return false // int overflow, as above
    // split-volume marker anywhere after the digits
    var split = false
    var j = i
    while (j < len && !split) { if (bytes(j) == '/') split = true; j += 1 }
    val yMin = y
    val yMax = if (split) y + 1 else y
    yMin >= lo && yMax <= hi
  }

  /** Column-API form; bounds are optional like
    * `CityDirOps.yearInterval`.
    */
  def yearInRange(year: Column, lo: Option[Int], hi: Option[Int]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(YearInRangeExpr(ColumnBridge.expression(year),
      lo.getOrElse(Int.MinValue), hi.getOrElse(Int.MaxValue)))
  }
}

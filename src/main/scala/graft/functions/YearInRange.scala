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

/** Fused year-union NORMALIZATION: one parse per row producing the
  * whole `struct(yearMin, yearMax)` — the struct-producing sibling of
  * [[YearInRangeExpr]], for consumers that keep both bounds rather than
  * filter on them. The declarative `CityDirOps.yearNormDeclarative`
  * substitutes its regex tree into the projection once per referenced
  * struct field, so reading both bounds runs the regex machinery twice;
  * this runs the byte-level parse once. Null/unparseable → null struct
  * (spec-asserted equal to the declarative form on random inputs).
  */
case class YearNormExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"year_norm expects string, got ${other.simpleString}")
    }

  override def dataType: DataType = new StructType()
    .add("yearMin", IntegerType, nullable = true)
    .add("yearMax", IntegerType, nullable = true)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    YearInRange.norm(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.YearInRange.norm($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(c: Expression): YearNormExpr =
    copy(child = c)

  override def prettyName: String = "year_norm"
}

object YearInRange {

  /** One-pass parse: JS parseInt semantics on the part before any '/',
    * split-volume flag. Returns -1 for no-parse (junk, overflow), else
    * `(year << 1) | splitFlag`.
    */
  def parse(s: UTF8String): Long = {
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
      if (digits > 10) return -1L
      i += 1
    }
    if (!sawDigit && digits == 0) return -1L // no leading digits → parseInt NaN
    if (y > Int.MaxValue) return -1L // int overflow, as above
    // split-volume marker anywhere after the digits
    var split = false
    var j = i
    while (j < len && !split) { if (bytes(j) == '/') split = true; j += 1 }
    (y << 1) | (if (split) 1L else 0L)
  }

  /** One-pass parse + containment. */
  def contains(s: UTF8String, lo: Int, hi: Int): Boolean = {
    val p = parse(s)
    if (p < 0) return false
    val yMin = p >> 1
    val yMax = yMin + (p & 1L)
    yMin >= lo && yMax <= hi
  }

  /** Struct kernel for [[YearNormExpr]]; null for no-parse. */
  def norm(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val p = parse(s)
    if (p < 0) return null
    val yMin = (p >> 1).toInt
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](yMin, yMin + (p & 1L).toInt))
  }

  /** Column-API form; bounds are optional like
    * `CityDirOps.yearInterval`.
    */
  def yearInRange(year: Column, lo: Option[Int], hi: Option[Int]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(YearInRangeExpr(ColumnBridge.expression(year),
      lo.getOrElse(Int.MinValue), hi.getOrElse(Int.MaxValue)))
  }

  /** Column-API form of the fused struct normalization. */
  def yearNorm(year: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(YearNormExpr(ColumnBridge.expression(year)))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Morton (Z-order) interleave of two 32-bit ints into one long:
  * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Sorting by
  * the code places rows close in BOTH dimensions close in the file
  * order, so parquet row-group min/max stats prune two-column range
  * predicates — the data-layout play behind `OPTIMIZE ZORDER BY`.
  * The LOW 31 BITS of each input are interleaved (the long's top two
  * bits stay clear, which keeps the code replayable on engines whose
  * left-shift faults at bit 63); the mapping is collision-free for
  * non-negative keys, and a negative key contributes its low 31 bits.
  */
case class MortonExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"morton expects (int, int), got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    Morton.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Morton.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): MortonExpr = copy(left = l, right = r)

  override def prettyName: String = "morton"
}

object Morton {

  /** Spread the low 31 bits of `v` to even bit positions (the standard
    * magic-number bit dilation).
    */
  def spread(v: Int): Long = {
    var x = v.toLong & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(a: Int, b: Int): Long = spread(a) | (spread(b) << 1)

  def morton(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(MortonExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** The same interleave as portable SQL (an unrolled 62-term OR over
    * bit tests) — lets any engine replay the code exactly; used by the
    * DuckDB oracle.
    */
  def sqlFor(a: String, b: String): String = {
    val terms =
      (0 until 31).map(i =>
        s"((($a::BIGINT >> $i) & 1) << ${2 * i})") ++
      (0 until 31).map(i =>
        s"((($b::BIGINT >> $i) & 1) << ${2 * i + 1})")
    terms.mkString("(", " | ", ")")
  }
}

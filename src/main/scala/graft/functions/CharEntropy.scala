package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy of a string's code-point distribution, in bits —
  * the classic text-quality signal (binary junk and boilerplate sit at
  * the extremes; natural language in a band). One JVM pass over the
  * string: an ASCII count array plus a spill map for the long tail.
  *
  * The declarative formulation is an explode-per-character (rows ×
  * chars fan-out) plus two keyed aggregations — a shuffle whose volume
  * is the corpus' character count. This expression keeps the whole
  * computation row-local and inside whole-stage codegen (static call,
  * same pattern as [[YearInRangeExpr]]). Each term is `-p·ln(p)/ln 2`,
  * mirroring the oracle SQL operation-for-operation so cross-engine
  * values agree to rounding. Empty string → 0.0; null → null.
  */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"char_entropy expects string, got ${other.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    CharEntropy.entropy(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropy.entropy($c)")

  override protected def withNewChildInternal(c: Expression): CharEntropyExpr =
    copy(child = c)

  override def prettyName: String = "char_entropy"
}

object CharEntropy {

  def entropy(s: UTF8String): Double = {
    val str = s.toString
    val len = str.length
    if (len == 0) return 0.0
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Integer, Integer] = null
    var i = 0
    var n = 0L
    while (i < len) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Integer]
        val cur = other.get(cp)
        other.put(cp, if (cur == null) 1 else cur + 1)
      }
    }
    val ln2 = Math.log(2.0)
    var acc = 0.0
    var j = 0
    while (j < 128) {
      if (ascii(j) > 0) {
        val p = ascii(j).toDouble / n
        acc -= p * Math.log(p) / ln2
      }
      j += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val p = it.next().toDouble / n
        acc -= p * Math.log(p) / ln2
      }
    }
    acc
  }

  def charEntropy(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(CharEntropyExpr(ColumnBridge.expression(c)))
  }
}

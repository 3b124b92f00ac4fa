package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Symmetric int8 quantization of a float32 embedding in ONE row-local
  * pass: `struct(qscale: double, q8: array<tinyint>)` with
  * `qscale = max(|x|)/127` and `q8[i] = round_half_up(x[i]/qscale)`.
  *
  * The declarative formulation (`array_max(transform(abs))` feeding two
  * more `transform` lambdas) evaluates interpreted, and its consumers
  * make that fatal at scale: `posexplode(q8)` triggers
  * `InferFiltersFromGenerate`, whose inferred pre-Generate Filter
  * re-evaluates the ENTIRE quantization tree twice more per row
  * (`size(...) > 0 AND isnotnull(...)`) — measured ~0.9 s for 2 000
  * rows at sf0.1, i.e. ~5 interpreted passes over every vector (the
  * same pathology PERF.md documents for the LSH pipeline). This kernel
  * is one static call inside whole-stage codegen, so the inferred
  * filter costs one tight float loop instead.
  *
  * Value semantics replicate the declarative form bit-for-bit (pinned
  * in ExtOpsSpec):
  *  - max|x| is computed in FLOAT (as `array_max` over `abs(float)`
  *    does, null elements skipped, NaN greatest) and only then widened
  *    to double for the /127 divide;
  *  - rounding is Spark `round(double, 0)`: NaN/Inf pass through, else
  *    `java.math.BigDecimal.valueOf(v).setScale(0, HALF_UP)` — shared
  *    away-from-zero halves, exactly DuckDB's `round()`, so the ss8
  *    oracle replay stays hash-exact;
  *  - the byte cast is Spark's non-ANSI double→tinyint (`d.toByte`);
  *  - zero vector → qscale 0.0 and ALL-ZERO codes (even at null
  *    slots — the declarative zero branch ignores the element);
  *  - empty / all-null vector → null qscale, codes of the same shape;
  *    null vector → null struct.
  */
case class QuantizeInt8Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"quantize_int8 expects array<float>, got ${other.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("qscale", DoubleType, nullable = true),
    StructField("q8", ArrayType(ByteType, containsNull = true),
      nullable = true)))

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    QuantizeInt8.quantize(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QuantizeInt8.quantize($c)")

  override protected def withNewChildInternal(c: Expression): QuantizeInt8Expr =
    copy(child = c)

  override def prettyName: String = "quantize_int8"
}

object QuantizeInt8 {

  /** Kernel for [[QuantizeInt8Expr]]. See the expression doc for the
    * exact semantics contract.
    */
  def quantize(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    // float max of |x|, null slots skipped, NaN greatest — array_max's
    // ordering on floats
    var max = 0.0f
    var seen = false
    var hasNaN = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = Math.abs(arr.getFloat(i))
        if (java.lang.Float.isNaN(v)) hasNaN = true
        else if (!seen || v > max) max = v
        seen = true
      }
      i += 1
    }
    val out = new Array[Any](n)
    if (!seen) {
      // empty or all-null input: null qscale; elements stay null
      // (x/null is null) — matches the declarative otherwise-branch
      return new GenericInternalRow(
        Array[Any](null, new GenericArrayData(out)))
    }
    val s = if (hasNaN) Double.NaN else max.toDouble / 127.0
    if (s == 0.0) {
      // zero vector: the declarative zero branch maps EVERY slot to 0,
      // null elements included (the lambda never reads x)
      var j = 0
      while (j < n) { out(j) = 0.toByte; j += 1 }
      return new GenericInternalRow(
        Array[Any](0.0, new GenericArrayData(out)))
    }
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val v = arr.getFloat(j).toDouble / s
        // Spark round(double, 0): NaN/Inf pass through, else HALF_UP on
        // BigDecimal.valueOf (shortest decimal string of the double)
        val r =
          if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) v
          else JBigDecimal.valueOf(v).setScale(0, RoundingMode.HALF_UP)
            .doubleValue()
        out(j) = r.toByte // Spark non-ANSI double→tinyint
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](s, new GenericArrayData(out)))
  }

  /** Column-API form: `struct(qscale, q8)` from a float32 vector. */
  def quantizeInt8(vec: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(QuantizeInt8Expr(ColumnBridge.expression(vec)))
  }
}

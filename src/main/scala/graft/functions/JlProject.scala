package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Johnson–Lindenstrauss ±1 random projection of a float32 vector in
  * ONE row-local pass: `array<long>` of `kOut` micro-unit sums,
  * `out[j] = Σ_i round_half_up(x_i * signs(j,i) * 1e6)`.
  *
  * The declarative formulation (`SimilarityOps.randomProjectDeclarative`)
  * builds `kOut` separate `aggregate(zip_with(...))` folds — 16 × 64
  * interpreted lambda steps per row, each allocating a zipped
  * intermediate array, measured as the second-heaviest query in the
  * catalog (ss13, 2.4 s at sf0.1). This kernel exploits that HALF_UP
  * rounding commutes with IEEE negation (`valueOf(-d) = -valueOf(d)`,
  * away-from-zero halves are sign-symmetric), so each element is
  * rounded ONCE (`dIn` BigDecimal ops) and the `kOut` sums are pure
  * long adds over `±r_i` — and the whole thing is a single static call
  * inside whole-stage codegen.
  *
  * Value semantics replicate the declarative form bit-for-bit on every
  * finite, in-range input (pinned in ExtOpsSpec):
  *  - the addend is Spark `round(x_d * sgn * 1e6, 0).cast(long)`,
  *    rounded ONCE per element as described above;
  *  - a null element poisons every fold (each output dim consumes all
  *    inputs) → ALL `kOut` slots null;
  *  - a vector whose length ≠ `dIn` is null-padded by `zip_with` on
  *    one side or the other → same all-null result;
  *  - a NULL vector yields `zip_with → null`, `aggregate(null) → null`
  *    per fold, then `array(...)` of nulls — a NON-null array of
  *    `kOut` nulls, which is why this expression is `nullable = false`
  *    and handles the null child itself rather than via nullSafeEval.
  *
  * ONE deliberate divergence: under ANSI (the Spark 4 default this
  * library runs with) the declarative `cast(long)` ABORTS THE JOB on a
  * NaN/Inf element or a micro magnitude ≥ 2^63 (|x| ≳ 9.2e12 — far
  * outside any real embedding). The kernel degrades those rows to the
  * malformed-input contract instead — all `kOut` slots null, surfaced
  * not thrown — the same "null, never an ANSI error" stance as
  * `SimilarityOps.cosine` on zero-norm vectors. (Long-SUM overflow,
  * reachable only through such magnitudes, likewise cannot occur on
  * inputs the kernel accepts.)
  *
  * `signs` is the flattened row-major `kOut × dIn` ±1 matrix, shipped
  * as a codegen reference object (1 KiB for 16×64) — plan-embedded,
  * no broadcast, no per-row hashing.
  */
case class JlProjectExpr(child: Expression, signs: Array[Byte], kOut: Int)
    extends UnaryExpression {
  require(kOut >= 1 && signs.length % kOut == 0,
    "signs must be a flat kOut x dIn matrix")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"jl_project expects array<float>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  // null input maps to an array of null elements, never a null array
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    JlProject.project(child.eval(input).asInstanceOf[ArrayData], signs, kOut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("jlSigns", signs, "byte[]")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.JlProject.project(
          ${c.isNull} ? null : ${c.value}, $signsRef, $kOut);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): JlProjectExpr =
    copy(child = c)

  override def prettyName: String = "jl_project"
}

object JlProject {

  /** Kernel for [[JlProjectExpr]]. See the expression doc for the exact
    * semantics contract.
    */
  def project(arr: ArrayData, signs: Array[Byte], kOut: Int): ArrayData = {
    val out = new Array[Any](kOut) // all-null default
    val dIn = signs.length / kOut
    if (arr == null || arr.numElements() != dIn)
      return new GenericArrayData(out)
    // round each element once; HALF_UP commutes with negation, so the
    // per-(j,i) addend is just ±r(i)
    val r = new Array[Long](dIn)
    var i = 0
    while (i < dIn) {
      if (arr.isNullAt(i)) return new GenericArrayData(out)
      val d = arr.getFloat(i).toDouble * 1e6
      // NaN/Inf, or a rounded magnitude >= 2^63: the declarative cast
      // would throw under ANSI — degrade to the all-null contract
      if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
        return new GenericArrayData(out)
      val rd = JBigDecimal.valueOf(d).setScale(0, RoundingMode.HALF_UP)
        .doubleValue()
      if (rd >= 9.223372036854775808e18 || rd <= -9.223372036854775808e18)
        return new GenericArrayData(out)
      r(i) = rd.toLong
      i += 1
    }
    var j = 0
    while (j < kOut) {
      var acc = 0L
      val base = j * dIn
      var k = 0
      while (k < dIn) {
        acc += (if (signs(base + k) > 0) r(k) else -r(k))
        k += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API form: `array<long>` micro-unit projection of a float32
    * vector against a flat row-major `kOut x dIn` ±1 sign matrix.
    */
  def jlProject(vec: Column, signs: Array[Byte], kOut: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      JlProjectExpr(ColumnBridge.expression(vec), signs, kOut))
  }
}

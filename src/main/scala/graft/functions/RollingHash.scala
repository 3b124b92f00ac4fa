package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Rabin-style rolling-hash winnowing fingerprint: the minimum of the
  * polynomial hash `sum(byte[j+t] · B^(w-1-t)) mod M` over every
  * `window`-byte window of the text — the content-defined-chunking /
  * local-fingerprinting primitive (think rsync/CDC boundaries, MOSS
  * winnowing). Stable under edits anywhere outside the minimal window,
  * like [[graft.operators.TextAnalysisOps.minShingleFingerprint]] but
  * byte-windowed (layout-robust) instead of word-shingled, and O(1) per
  * step instead of a digest per window.
  *
  * The native expression keeps the O(n) one-pass rolling update
  * (h' = (h·B + b_in − b_out·B^w) mod M); because mod-M arithmetic is a
  * ring homomorphism the result equals the per-window polynomial
  * evaluated exactly, which is what the SQL oracle computes (HUGEINT
  * arithmetic, mod at the end) — hash-identical across engines for
  * ASCII/byte-equal text. Null when the text has fewer than `window`
  * bytes.
  */
case class RollingMinHashExpr(child: Expression, window: Int)
    extends UnaryExpression {
  require(window >= 1 && window <= 64, "window must be in [1, 64]")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_min_hash expects string, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    RollingHash.minHash(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val rh = ctx.freshName("rh")
      s"""
      java.lang.Long $rh = graft.functions.RollingHash.minHash($c, $window);
      ${ev.isNull} = ($rh == null);
      if (!${ev.isNull}) ${ev.value} = $rh.longValue();
    """
    })

  override protected def withNewChildInternal(c: Expression): RollingMinHashExpr =
    copy(child = c)

  override def prettyName: String = "rolling_min_hash"
}

object RollingHash {
  val B: Long = 257L
  val M: Long = 2147483647L // 2^31 - 1

  /** Boxed so codegen can branch on null (text shorter than window). */
  def minHash(text: org.apache.spark.unsafe.types.UTF8String,
              window: Int): java.lang.Long = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < window) return null
    var bw = 1L // B^window mod M
    var t = 0
    while (t < window) { bw = bw * B % M; t += 1 }
    var h = 0L
    var i = 0
    while (i < window) { h = (h * B + (bytes(i) & 0xffL)) % M; i += 1 }
    var min = h
    while (i < n) {
      h = (h * B + (bytes(i) & 0xffL) -
        (bytes(i - window) & 0xffL) * bw % M) % M
      if (h < 0) h += M
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Column-API form. */
  def rollingMinHash(text: Column, window: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(RollingMinHashExpr(
      ColumnBridge.expression(text), window))
  }
}

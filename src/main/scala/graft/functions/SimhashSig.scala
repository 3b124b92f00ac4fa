package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused SimHash signature: RAW TEXT → distinct word k-shingles → md5
  * per shingle → per-bit sign sums → band-packed signature, in one
  * tight JVM pass per row (the [[MinhashTextBandsGenerate]] recipe
  * applied to SimHash).
  *
  * Why: the declarative form (shingle Generator explode → 60–120
  * separate `sum()` aggregate expressions → packing projection) ships
  * every document's per-bit partial sums through a doc-keyed
  * aggregation exchange — but a document's shingle set is ROW-LOCAL,
  * so the whole signature is computable where the text already is.
  * This expression deletes the signature exchange from the plan
  * entirely and replaces 60–120 `conv(substring(md5hex))`-derived
  * aggregate updates per shingle row with integer bit ops on the raw
  * 16-byte digest.
  *
  * Bit-identical to the staged pipeline by construction: shingles are
  * the `split(text, " ", -1)` byte ranges (the ShingleGen contract),
  * dedup is UTF8String equality (the `distinct = true` generator
  * semantics), bit p's sign is bit p%4 of md5 HEX NIBBLE p/4 (hex char
  * i = high nibble of digest byte i/2 for even i, low for odd), ties
  * (sum == 0) pack as 0, and band b holds bits [b·w, (b+1)·w) at
  * weight 2^j — the exact construction the dd15/dd16 DuckDB oracles
  * replay from `md5` hex. Equality with the declarative form is
  * asserted by the existing MessageDigest model sweeps (ExtOpsSpec,
  * PropertySpec), which are implementation-independent.
  *
  * Null for fewer than k words — callers filter nulls to reproduce the
  * non-outer-explode "doc absent" semantics.
  */
case class SimhashSigExpr(child: Expression, k: Int, bits: Int, bands: Int)
    extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")
  require(bits >= 1 && bits <= 128, s"bits must be in [1,128], got $bits")
  require(bits % bands == 0, s"bands must divide bits, got $bits/$bands")
  require(bits / bands <= 60, "band width must be <= 60 bits")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_sig expects string, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // < k words → null

  override def nullSafeEval(t: Any): Any =
    SimhashSig.compute(t.asInstanceOf[UTF8String], k, bits, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.SimhashSig.compute($c, $k, $bits, $bands);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(c: Expression): SimhashSigExpr =
    copy(child = c)

  override def prettyName: String = "simhash_sig"
}

object SimhashSig {

  /** One-pass band-packed SimHash signature; null for < k words. */
  def compute(t: UTF8String, k: Int, bits: Int, bands: Int): ArrayData = {
    val bytes = t.getBytes
    val starts = ShingleGen.wordStarts(bytes)
    val nWords = starts.length
    if (nWords < k) return null
    val len = bytes.length
    val sums = new Array[Int](bits)
    val seen = new java.util.HashSet[UTF8String]()
    val md = ShingleGen.digest()
    var i = 0
    while (i <= nWords - k) {
      val from = starts(i)
      val to = if (i + k - 1 == nWords - 1) len else starts(i + k) - 1
      val s = UTF8String.fromBytes(bytes, from, to - from)
      if (seen.add(s)) {
        md.reset()
        md.update(bytes, from, to - from)
        val digest = md.digest()
        var p = 0
        while (p < bits) {
          val nibIdx = p >> 2
          val byteV = digest(nibIdx >> 1) & 0xff
          val nib = if ((nibIdx & 1) == 0) (byteV >>> 4) & 0xf
                    else byteV & 0xf
          sums(p) += (((nib >>> (p & 3)) & 1) << 1) - 1
          p += 1
        }
      }
      i += 1
    }
    val w = bits / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var j = 0
      while (j < w) {
        if (sums(b * w + j) > 0) out(b) |= (1L << j)
        j += 1
      }
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API form; yields `array<bigint>` of band values. */
  def simhashSigNative(text: Column, k: Int, bits: Int,
                       bands: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(SimhashSigExpr(
      ColumnBridge.expression(text), k, bits, bands))
  }
}

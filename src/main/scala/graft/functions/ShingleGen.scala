package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Generator emitting one row per word k-shingle of a text column —
  * the native twin of `explode(DedupOps.shingles(text, k))` /
  * `explode(DedupOps.words(text))` (k = 1).
  *
  * Why not the declarative explode: the shingle array is built by
  * higher-order `transform` lambdas that only evaluate interpreted, and
  * `InferFiltersFromGenerate` + predicate pushdown re-evaluate that
  * whole expression twice more in a pre-Generate interpreted Filter. A
  * custom Generator does one JVM pass: word boundaries are byte offsets
  * (`split(" ", -1)` semantics — empty tokens kept; an ASCII space never
  * occurs inside a UTF-8 multibyte sequence), each shingle is a
  * zero-copy byte-range view of the text, and `distinct` dedups with an
  * open hash set when the explode's source would have been
  * `array_distinct`'d. Texts with fewer than k words emit nothing.
  */
case class ShingleGenerate(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression with Generator with CodegenFallback {
  require(k >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_generate expects string, got ${other.simpleString}")
    }

  override def elementSchema: StructType = new StructType()
    .add("shingle", StringType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) return Nil
    val bytes = t.asInstanceOf[UTF8String].getBytes
    val len = bytes.length
    var nWords = 1
    var p = 0
    while (p < len) { if (bytes(p) == ' ') nWords += 1; p += 1 }
    if (nWords < k) return Nil
    val starts = new Array[Int](nWords)
    var w = 1
    p = 0
    while (p < len) {
      if (bytes(p) == ' ') { starts(w) = p + 1; w += 1 }
      p += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](nWords - k + 1)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    var i = 0
    while (i <= nWords - k) {
      val from = starts(i)
      val to = if (i + k - 1 == nWords - 1) len else starts(i + k) - 1
      val s = UTF8String.fromBytes(bytes, from, to - from)
      if (seen == null || seen.add(s)) out += InternalRow(s)
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): ShingleGenerate =
    copy(child = c)

  override def prettyName: String = "shingle_generate"
}

object ShingleGen {
  /** Column-API form; yields a `shingle` output column. */
  def shingleGen(text: Column, k: Int, distinct: Boolean): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(ShingleGenerate(
      ColumnBridge.expression(text), k, distinct))
  }
}

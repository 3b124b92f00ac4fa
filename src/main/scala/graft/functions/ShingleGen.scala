package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
    val starts = ShingleGen.wordStarts(bytes)
    val nWords = starts.length
    if (nWords < k) return Nil
    val len = bytes.length
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

/** The NON-OVERLAPPING `segWords`-word segments of a text column as an
  * array — the segmentation step of
  * [[graft.operators.DedupOps.spanDedup]], consumed through a builtin
  * `posexplode` (`seg_idx` = the 0-based position). The last segment
  * keeps the remainder words (ceil division), a text with fewer than
  * `segWords` words is one short segment — `split(" ", -1)` semantics
  * throughout, so an empty string is ONE empty segment — and null text
  * yields an EMPTY array (the explode then drops the row, like the
  * declarative form it replaces; parity-pinned in ExtOpsSpec).
  *
  * Why a scalar array kernel + builtin posexplode, and not the
  * declarative `transform(sequence, array_join(slice))` or a custom
  * Generator: the declarative lambdas evaluate interpreted, and
  * `InferFiltersFromGenerate`'s pre-Generate Filter re-evaluates the
  * whole tree twice more per row; a custom Generator dodges the
  * inferred filter but is `CodegenFallback`, and losing whole-stage
  * codegen around the Generate measured SLOWER than the declarative
  * form on short documents (1 M × 24-word probe). This shape keeps the
  * builtin posexplode's codegen Generate AND makes the inferred
  * filter's re-evaluations cheap one-pass static calls — fastest on
  * both probe shapes. Each segment is a zero-copy byte-range view:
  * consecutive words rejoined with " " are byte-identical to the
  * original text span.
  */
case class SegmentArrayExpr(child: Expression, segWords: Int)
    extends UnaryExpression {
  require(segWords >= 1, "segment size must be >= 1")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"segment_array expects string, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    ShingleGen.segments(
      child.eval(input).asInstanceOf[UTF8String], segWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.ShingleGen.segments(
          ${c.isNull} ? null : ${c.value}, $segWords);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): SegmentArrayExpr =
    copy(child = c)

  override def prettyName: String = "segment_array"
}

/** Scalar twin of [[ShingleGenerate]]: the shingle ARRAY of a text
  * column in one JVM pass — drop-in for `DedupOps.shingles(text, k)`
  * (distinct = true) where a consumer needs the array per row rather
  * than exploded rows (signature inputs, set intersections, counts).
  * Matches the declarative form on every edge: null text and texts
  * with fewer than k words yield an EMPTY array (never null), empty
  * tokens are kept, first-occurrence order is preserved under
  * `distinct`. Codegen is one static call, so the surrounding
  * projection stays inside whole-stage codegen.
  */
case class ShingleArrayExpr(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_array expects string, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    ShingleGen.compute(child.eval(input).asInstanceOf[UTF8String], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        graft.functions.ShingleGen.compute(
          ${c.isNull} ? null : ${c.value}, $k, $distinct);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): ShingleArrayExpr =
    copy(child = c)

  override def prettyName: String = "shingle_array"
}

/** Winnowing-style robust fingerprint, fused: the MINIMUM md5 (as hex)
  * over a document's word k-shingles, one digest per shingle computed
  * over byte ranges of the original text, compared as raw digest bytes
  * (fixed-length lowercase hex is order-isomorphic to unsigned byte
  * order) and hexified once at the end. Drop-in for
  * `array_min(transform(DedupOps.shingles(text, k), md5))` — null for
  * null text or fewer than k words (an empty array has no minimum);
  * duplicate shingles can't change a min, so dedup is skipped.
  */
case class MinShingleMd5Expr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"min_shingle_md5 expects string, got ${other.simpleString}")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(t: Any): Any =
    ShingleGen.minMd5(t.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ShingleGen.minMd5($c, $k);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(c: Expression): MinShingleMd5Expr =
    copy(child = c)

  override def prettyName: String = "min_shingle_md5"
}

/** Generator emitting the DSIR feature-bucket id of every word k-gram
  * of a text column for ALL gram sizes in `ks`, in ONE pass over the
  * text. Fuses what was `shingle_generate(k=1) UNION
  * shingle_generate(k=2)` followed by a per-row
  * `conv(substring(md5(concat(seed, gram)), 1, 8), 16, 10) % buckets`
  * projection: the md5 runs incrementally over the seed prefix plus the
  * gram's BYTE RANGE of the original text (zero gram-string
  * allocation), and the bucket is the digest's first 4 bytes read as an
  * unsigned int mod `buckets` — bit-identical to the declarative chain
  * (hex-substring/conv parity pinned in ExtOpsSpec), so the DuckDB
  * oracle replays unchanged. Halves the corpus scans of the two-pass
  * union shape and keeps raw text out of everything downstream of the
  * Generate. Per the standing Generator lesson (PERF.md): the per-row
  * kernel here is one md5 per gram — expensive enough that losing
  * whole-stage codegen at the Generate boundary is a clear win.
  */
case class GramBucketsGenerate(child: Expression, ks: Seq[Int],
    buckets: Int, seedPrefix: String)
    extends UnaryExpression with Generator with CodegenFallback {
  require(ks.nonEmpty && ks.forall(_ >= 1), "gram sizes must be >= 1")
  require(buckets >= 1, "buckets must be >= 1")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gram_buckets expects string, got ${other.simpleString}")
    }

  @transient private lazy val seedBytes =
    seedPrefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def elementSchema: StructType = new StructType()
    .add("_b", LongType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) return Nil
    val bytes = t.asInstanceOf[UTF8String].getBytes
    val starts = ShingleGen.wordStarts(bytes)
    val nWords = starts.length
    val len = bytes.length
    val md = ShingleGen.digest()
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    ks.foreach { k =>
      var i = 0
      while (i <= nWords - k) {
        val from = starts(i)
        val to = if (i + k - 1 == nWords - 1) len else starts(i + k) - 1
        md.reset()
        md.update(seedBytes)
        md.update(bytes, from, to - from)
        val d = md.digest()
        // first 8 hex chars of the digest = first 4 bytes, read as an
        // UNSIGNED int (conv(..., 16, 10) semantics), then mod
        val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        out += InternalRow(v % buckets)
        i += 1
      }
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): GramBucketsGenerate =
    copy(child = c)

  override def prettyName: String = "gram_buckets"
}

object ShingleGen {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Thread-local MD5 instance for gram-granularity kernels. */
  private[functions] def digest(): java.security.MessageDigest = mdLocal.get()

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Word-start byte offsets under `split(text, " ", -1)` semantics
    * (empty tokens kept; a word runs to the byte before the next start,
    * the last to end-of-bytes). Result length = word count.
    */
  private[functions] def wordStarts(bytes: Array[Byte]): Array[Int] = {
    val len = bytes.length
    var nWords = 1
    var p = 0
    while (p < len) { if (bytes(p) == ' ') nWords += 1; p += 1 }
    val starts = new Array[Int](nWords)
    var w = 1
    p = 0
    while (p < len) {
      if (bytes(p) == ' ') { starts(w) = p + 1; w += 1 }
      p += 1
    }
    starts
  }

  /** Kernel for [[ShingleArrayExpr]]; also the JVM-side shingle builder
    * for any caller holding a raw UTF8String. Null-safe: null input →
    * empty array (the declarative form's CASE semantics).
    */
  def compute(t: UTF8String, k: Int, distinct: Boolean): ArrayData = {
    if (t == null) return new GenericArrayData(Array.empty[Any])
    val bytes = t.getBytes
    val starts = wordStarts(bytes)
    val nWords = starts.length
    if (nWords < k) return new GenericArrayData(Array.empty[Any])
    val len = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](nWords - k + 1)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    var i = 0
    while (i <= nWords - k) {
      val from = starts(i)
      val to = if (i + k - 1 == nWords - 1) len else starts(i + k) - 1
      val s = UTF8String.fromBytes(bytes, from, to - from)
      if (seen == null || seen.add(s)) out += s
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Kernel for [[MinShingleMd5Expr]]: min md5 digest over the k-shingle
    * byte ranges, hexified once. Null for fewer than k words.
    */
  def minMd5(t: UTF8String, k: Int): UTF8String = {
    val bytes = t.getBytes
    val starts = wordStarts(bytes)
    val nWords = starts.length
    if (nWords < k) return null
    val len = bytes.length
    val md = mdLocal.get()
    var best: Array[Byte] = null
    var i = 0
    while (i <= nWords - k) {
      val from = starts(i)
      val to = if (i + k - 1 == nWords - 1) len else starts(i + k) - 1
      md.reset()
      md.update(bytes, from, to - from)
      val digest = md.digest()
      if (best == null || unsignedLess(digest, best)) best = digest
      i += 1
    }
    val hex = new Array[Byte](32)
    var b = 0
    while (b < 16) {
      hex(2 * b) = hexDigits((best(b) >> 4) & 0xf).toByte
      hex(2 * b + 1) = hexDigits(best(b) & 0xf).toByte
      b += 1
    }
    UTF8String.fromBytes(hex)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    false
  }

  /** Column-API form; yields a `shingle` output column. */
  def shingleGen(text: Column, k: Int, distinct: Boolean): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(ShingleGenerate(
      ColumnBridge.expression(text), k, distinct))
  }

  /** Column-API form of the scalar shingle array (distinct by default —
    * the `DedupOps.shingles` contract).
    */
  def shingleArray(text: Column, k: Int, distinct: Boolean = true): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(ShingleArrayExpr(
      ColumnBridge.expression(text), k, distinct))
  }

  /** Kernel for [[SegmentArrayExpr]]. Null → empty array. */
  def segments(t: UTF8String, segWords: Int): ArrayData = {
    if (t == null) return new GenericArrayData(Array.empty[Any])
    val bytes = t.getBytes
    val starts = wordStarts(bytes)
    val nWords = starts.length
    val len = bytes.length
    val nSeg = (nWords + segWords - 1) / segWords
    val out = new Array[Any](nSeg)
    var i = 0
    while (i < nSeg) {
      val from = starts(i * segWords)
      val lastWord = math.min((i + 1) * segWords, nWords) - 1
      val to = if (lastWord == nWords - 1) len else starts(lastWord + 1) - 1
      out(i) = UTF8String.fromBytes(bytes, from, to - from)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API form of the fused gram→bucket generator; yields a `_b`
    * long output column, one row per gram per size in `ks`.
    */
  def gramBuckets(text: Column, ks: Seq[Int], buckets: Int,
                  seedPrefix: String): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(GramBucketsGenerate(
      ColumnBridge.expression(text), ks, buckets, seedPrefix))
  }

  /** Column-API form of the non-overlapping segment array. */
  def segmentArray(text: Column, segWords: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(SegmentArrayExpr(
      ColumnBridge.expression(text), segWords))
  }

  /** Column-API form of the fused min-shingle-md5 fingerprint. */
  def minShingleMd5(text: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(MinShingleMd5Expr(
      ColumnBridge.expression(text), k))
  }
}

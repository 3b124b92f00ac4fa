package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression for the MinHash signature over an
  * `array<string>` shingle column — the fused form of
  * `DedupOps.shingleHashes` + `DedupOps.minhashSignature`.
  *
  * The HOF formulation walks the shingle array 1 + numPerm times with an
  * interpreted lambda per element (md5/conv, then one `transform` per
  * permutation), allocating an intermediate array per stage. This
  * expression makes ONE pass: per shingle, md5 its UTF-8 bytes, take the
  * top 60 bits (= the 15-hex-char prefix) mod p, and fold it into all
  * numPerm running minima — zero intermediate arrays, one digest per
  * shingle.
  *
  * Bit-identical by construction to the staged pipeline
  * (`sig[i] = min over shingles of ((a_i·x + b_i) mod p)`,
  * `x = conv(substr(md5(s),1,15),16,10) mod p`), so the DuckDB oracle
  * replay is unchanged. Codegen emits a single static call — the
  * surrounding projection stays inside whole-stage codegen.
  */
case class MinhashSigExpr(child: Expression, numPerm: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty shingle set → null

  override def nullSafeEval(a: Any): Any =
    MinhashSig.compute(a.asInstanceOf[ArrayData], numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinhashSig.compute($c, $numPerm);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(c: Expression): MinhashSigExpr =
    copy(child = c)

  override def prettyName: String = "minhash_sig"
}

/** Fused signature + LSH band hashing: `array<string>` of `bands` md5
  * hex digests, band b hashing `"sig[b*r] | … | sig[b*r+r-1]"`
  * (r = numPerm/bands) — exactly
  * `DedupOps.lshBandHashes(minhashSignature(...))` without materializing
  * the signature array or running 4 interpreted `transform` lambdas per
  * row. Null for an empty shingle set, so the caller's guard is a plain
  * null check instead of re-evaluating the shingle expression.
  */
case class MinhashBandsExpr(child: Expression, numPerm: Int, bands: Int)
    extends UnaryExpression {
  require(numPerm % bands == 0, "numPerm must divide into bands")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_bands expects array<string>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    MinhashSig.computeBands(a.asInstanceOf[ArrayData], numPerm, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinhashSig.computeBands($c, $numPerm, $bands);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(c: Expression): MinhashBandsExpr =
    copy(child = c)

  override def prettyName: String = "minhash_bands"
}

/** Generator form of [[MinhashBandsExpr]]: emits one `(pos, bh)` row per
  * band directly — the whole signature pipeline runs exactly once per
  * input row inside GenerateExec.
  *
  * Why a custom Generator instead of `posexplode(minhash_bands(...))`:
  * Catalyst's `InferFiltersFromGenerate` + predicate pushdown rewrite
  * that shape into a pre-Generate Filter whose condition re-evaluates
  * the (expensive, HOF-bearing, non-codegen) band expression 2× per
  * input row — measured at 10×+ the projection's own cost. The rule
  * pattern-matches only the built-in explode generators, so a custom
  * Generator keeps the plan clean: no inferred filter, no recompute.
  * Empty/null shingle sets emit zero rows (the non-outer explode
  * semantics the pipeline wants).
  */
case class MinhashBandsGenerate(child: Expression, numPerm: Int, bands: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(numPerm % bands == 0, "numPerm must divide into bands")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_bands_generate expects array<string>, got ${other.simpleString}")
    }

  override def elementSchema: StructType = new StructType()
    .add("pos", IntegerType, nullable = false)
    .add("bh", StringType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() == 0) return Nil
    val bhs = MinhashSig.computeBands(arr, numPerm, bands)
    (0 until bands).map(b => InternalRow(b, bhs.getUTF8String(b)))
  }

  override protected def withNewChildInternal(c: Expression): MinhashBandsGenerate =
    copy(child = c)

  override def prettyName: String = "minhash_bands_generate"
}

/** Whole-pipeline generator: RAW TEXT → word k-shingles → minhash
  * signature → LSH band hashes → one `(pos, bh)` row per band, all in
  * one tight JVM pass with zero intermediate allocation.
  *
  * Two facts make this exact w.r.t. the declarative pipeline
  * (`shingles(text,k)` → `shingleHashes` → `minhashSignature` →
  * `lshBandHashes`):
  *  - `split(text, " ", -1)` keeps empty tokens, so
  *    `array_join(slice(words, i, k), " ")` is byte-identical to the
  *    substring of `text` from the start of word i to the end of word
  *    i+k-1 — each shingle's md5 runs directly over that byte range of
  *    the original UTF-8 text, no shingle string is ever built;
  *  - `array_distinct` before the min-fold cannot change any minimum
  *    (duplicates never affect a min), so dedup is skipped outright.
  * The ASCII space byte never occurs inside a UTF-8 multibyte sequence,
  * so byte-level splitting is codepoint-safe. Bit-identity with the
  * staged HOF pipeline is asserted by spec on the test corpus.
  */
case class MinhashTextBandsGenerate(child: Expression, k: Int, numPerm: Int,
                                    bands: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(numPerm % bands == 0, "numPerm must divide into bands")
  require(k >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_text_bands expects string, got ${other.simpleString}")
    }

  override def elementSchema: StructType = new StructType()
    .add("pos", IntegerType, nullable = false)
    .add("bh", StringType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input)
    if (t == null) return Nil
    val bhs = MinhashSig.computeTextBands(
      t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      k, numPerm, bands)
    if (bhs == null) Nil
    else (0 until bands).map(b => InternalRow(b, bhs(b)))
  }

  override protected def withNewChildInternal(c: Expression): MinhashTextBandsGenerate =
    copy(child = c)

  override def prettyName: String = "minhash_text_bands"
}

object MinhashSig {
  val P: Long = 2147483647L

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Running minima over the NON-NULL elements; null when none exist —
    * matching the staged pipeline, where a null shingle hashes to null
    * and `array_min` skips nulls (the SQL-registered form can legally
    * receive arrays with null elements).
    */
  private def mins(arr: ArrayData, numPerm: Int): Array[Long] = {
    val n = arr.numElements()
    val out = Array.fill(numPerm)(Long.MaxValue)
    val md = mdLocal.get()
    var seen = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        seen = true
        md.reset()
        val digest = md.digest(arr.getUTF8String(j).getBytes)
        // top 60 bits = the 15-hex-char prefix: bytes 0..6 + high nibble
        // of byte 7 — exactly conv(substr(md5(s),1,15),16,10)
        var x = 0L
        var b = 0
        while (b < 7) { x = (x << 8) | (digest(b) & 0xffL); b += 1 }
        x = ((x << 4) | ((digest(7) & 0xf0L) >>> 4)) % P
        var i = 0
        while (i < numPerm) {
          val h = ((i * 1000003L + 12345L) * x + i * 999983L + 54321L) % P
          if (h < out(i)) out(i) = h
          i += 1
        }
      }
      j += 1
    }
    if (seen) out else null
  }

  /** One-pass signature; called from both interpreted eval and codegen.
    * Returns null when no non-null shingle exists (no minimum exists).
    */
  def compute(arr: ArrayData, numPerm: Int): ArrayData = {
    val m = mins(arr, numPerm)
    if (m == null) null else new GenericArrayData(m)
  }

  /** Fold one reduced shingle hash into all running minima. */
  private def fold(x: Long, out: Array[Long], numPerm: Int): Unit = {
    var i = 0
    while (i < numPerm) {
      val h = ((i * 1000003L + 12345L) * x + i * 999983L + 54321L) % P
      if (h < out(i)) out(i) = h
      i += 1
    }
  }

  /** Band md5 hex strings from a completed signature. */
  private def bandHexes(sig: Array[Long], numPerm: Int,
                        bands: Int): Array[org.apache.spark.unsafe.types.UTF8String] = {
    val r = numPerm / bands
    val md = mdLocal.get()
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](bands)
    val sb = new java.lang.StringBuilder(r * 12)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var i = b * r
      while (i < (b + 1) * r) {
        if (i > b * r) sb.append('|')
        sb.append(sig(i))
        i += 1
      }
      md.reset()
      val digest = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var k = 0
      while (k < 16) {
        hex(2 * k) = hexDigits((digest(k) & 0xf0) >>> 4)
        hex(2 * k + 1) = hexDigits(digest(k) & 0x0f)
        k += 1
      }
      out(b) = org.apache.spark.unsafe.types.UTF8String.fromString(
        new String(hex))
      b += 1
    }
    out
  }

  /** Signature + band md5s in one pass (see [[MinhashBandsExpr]]). */
  def computeBands(arr: ArrayData, numPerm: Int, bands: Int): ArrayData = {
    val m = mins(arr, numPerm)
    if (m == null) null
    else new GenericArrayData(
      bandHexes(m, numPerm, bands).asInstanceOf[Array[Any]])
  }

  /** Raw text → k-shingle minhash band hashes, no intermediate arrays
    * (see [[MinhashTextBandsGenerate]]). Null when the text has fewer
    * than k words.
    */
  def computeTextBands(text: org.apache.spark.unsafe.types.UTF8String,
                       k: Int, numPerm: Int,
                       bands: Int): Array[org.apache.spark.unsafe.types.UTF8String] = {
    val bytes = text.getBytes
    val len = bytes.length
    // word start offsets under split(" ", -1) semantics: empties kept
    var nWords = 1
    var p = 0
    while (p < len) { if (bytes(p) == ' ') nWords += 1; p += 1 }
    if (nWords < k) return null
    val starts = new Array[Int](nWords)
    var w = 1
    starts(0) = 0
    p = 0
    while (p < len) {
      if (bytes(p) == ' ') { starts(w) = p + 1; w += 1 }
      p += 1
    }
    val sig = Array.fill(numPerm)(Long.MaxValue)
    val md = mdLocal.get()
    var i = 0
    while (i <= nWords - k) {
      val from = starts(i)
      val to = if (i + k - 1 == nWords - 1) len else starts(i + k) - 1
      md.reset()
      md.update(bytes, from, to - from)
      val digest = md.digest()
      var x = 0L
      var b = 0
      while (b < 7) { x = (x << 8) | (digest(b) & 0xffL); b += 1 }
      x = ((x << 4) | ((digest(7) & 0xf0L) >>> 4)) % P
      fold(x, sig, numPerm)
      i += 1
    }
    bandHexes(sig, numPerm, bands)
  }

  /** Column-API form. */
  def minhashSigNative(shingles: Column, numPerm: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(MinhashSigExpr(
      ColumnBridge.expression(shingles), numPerm))
  }

  /** Column-API form of the fused signature+bands expression. */
  def minhashBandsNative(shingles: Column, numPerm: Int,
                         bands: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(MinhashBandsExpr(
      ColumnBridge.expression(shingles), numPerm, bands))
  }

  /** Column-API form of the generator (use in `select` beside the id
    * column; yields `pos` and `bh` output columns).
    */
  def minhashBandsGen(shingles: Column, numPerm: Int, bands: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(MinhashBandsGenerate(
      ColumnBridge.expression(shingles), numPerm, bands))
  }

  /** Column-API form of the whole-pipeline text generator. */
  def minhashTextBandsGen(text: Column, k: Int, numPerm: Int,
                          bands: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(MinhashTextBandsGenerate(
      ColumnBridge.expression(text), k, numPerm, bands))
  }
}

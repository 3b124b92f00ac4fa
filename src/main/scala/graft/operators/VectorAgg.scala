package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise mean buffer: per-dimension double sums + row count.
  * Mutable on purpose — Spark holds Aggregator buffers as live objects
  * between `reduce` calls (serializing only across the exchange), so
  * in-place accumulation avoids a per-row copy of the dim-length array.
  */
final case class VecMeanBuf(var sums: Array[Double], var n: Long)

/** Element-wise mean over an `array<float>` column — the per-group
  * centroid primitive (IVF cell centroids, per-label embedding means).
  *
  * A typed Aggregator instead of posexplode + per-dimension groupBy: the
  * explode formulation fans every vector into `dim` rows and shuffles
  * them all (dim × rows exchange volume, then a second shuffle to
  * re-collect); this buffer holds one double[dim] per group per
  * partition, so only (groups × partitions) buffers cross the wire and
  * the map-side combine does the heavy summing. Null and EMPTY vectors
  * are skipped (an empty array is a failed embedding, not a 0-dim
  * centroid — the replaced posexplode formulation likewise contributed
  * zero rows for them); on a (malformed) mixed-dimensionality group the
  * buffer with more accumulated rows wins a merge, which keeps malformed
  * minorities from crashing the job but is encounter-order-dependent on
  * a tie — the contract assumes a homogeneous corpus.
  */
object VectorMeanAgg extends Aggregator[Seq[Float], VecMeanBuf, Seq[Double]] {

  override def zero: VecMeanBuf = VecMeanBuf(Array.emptyDoubleArray, 0L)

  override def reduce(b: VecMeanBuf, v: Seq[Float]): VecMeanBuf =
    if (v == null || v.isEmpty || (b.n > 0 && v.length != b.sums.length)) b
    else if (b.n == 0) {
      val s = new Array[Double](v.length)
      var i = 0
      while (i < s.length) { s(i) = v(i); i += 1 }
      b.sums = s; b.n = 1L; b
    } else {
      val s = b.sums
      var i = 0
      while (i < s.length) { s(i) += v(i); i += 1 }
      b.n += 1; b
    }

  override def merge(a: VecMeanBuf, b: VecMeanBuf): VecMeanBuf =
    if (a.n == 0) b
    else if (b.n == 0) a
    else if (a.sums.length != b.sums.length) { if (b.n > a.n) b else a }
    else {
      val s = a.sums
      var i = 0
      while (i < s.length) { s(i) += b.sums(i); i += 1 }
      a.n += b.n; a
    }

  override def finish(b: VecMeanBuf): Seq[Double] =
    if (b.n == 0) null
    else {
      val n = b.n
      b.sums.map(_ / n).toIndexedSeq
    }

  override def bufferEncoder: Encoder[VecMeanBuf] = Encoders.product[VecMeanBuf]

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()

  /** Untyped-agg form for `groupBy(...).agg(...)`. */
  lazy val asUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(VectorMeanAgg)

  def vecMean(c: Column): Column = asUdaf(c)
}

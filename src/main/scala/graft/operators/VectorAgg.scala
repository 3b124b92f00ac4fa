package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise mean buffer: per-dimension double sums + row count. */
final case class VecMeanBuf(sums: Seq[Double], n: Long)

/** Element-wise mean over an `array<float>` column — the per-group
  * centroid primitive (IVF cell centroids, per-label embedding means).
  *
  * A typed Aggregator instead of posexplode + per-dimension groupBy: the
  * explode formulation fans every vector into `dim` rows and shuffles
  * them all (dim × rows exchange volume, then a second shuffle to
  * re-collect); this buffer holds one double[dim] per group per
  * partition, so only (groups × partitions) buffers cross the wire and
  * the map-side combine does the heavy summing. Null vectors are
  * skipped; on a (malformed) mixed-dimensionality group, rows not
  * matching the buffer's first-seen dimensionality are skipped, which
  * is encounter-order-dependent — the contract assumes a homogeneous
  * corpus, the skip just keeps malformed rows from crashing the job.
  */
object VectorMeanAgg extends Aggregator[Seq[Float], VecMeanBuf, Seq[Double]] {

  override def zero: VecMeanBuf = VecMeanBuf(Vector.empty, 0L)

  override def reduce(b: VecMeanBuf, v: Seq[Float]): VecMeanBuf =
    if (v == null || (b.n > 0 && v.length != b.sums.length)) b
    else if (b.n == 0) VecMeanBuf(v.map(_.toDouble), 1L)
    else {
      val s = b.sums.toArray
      var i = 0
      while (i < s.length) { s(i) += v(i); i += 1 }
      VecMeanBuf(s.toIndexedSeq, b.n + 1)
    }

  override def merge(a: VecMeanBuf, b: VecMeanBuf): VecMeanBuf =
    if (a.n == 0) b
    else if (b.n == 0 || a.sums.length != b.sums.length) a
    else {
      val s = a.sums.toArray
      var i = 0
      while (i < s.length) { s(i) += b.sums(i); i += 1 }
      VecMeanBuf(s.toIndexedSeq, a.n + b.n)
    }

  override def finish(b: VecMeanBuf): Seq[Double] =
    if (b.n == 0) null else b.sums.map(_ / b.n)

  override def bufferEncoder: Encoder[VecMeanBuf] = Encoders.product[VecMeanBuf]

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()

  /** Untyped-agg form for `groupBy(...).agg(...)`. */
  lazy val asUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(VectorMeanAgg)

  def vecMean(c: Column): Column = asUdaf(c)
}

package graft.operators

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator
import graft.model.Geometry

/** Cross-row MultiPoint aggregation — the scale-out form of the
  * reference's `makeMultiPoint` (city-directories.js:325-336, SURVEY.md
  * O-35): when one entity's geometries live on DIFFERENT rows (a person
  * seen across pages/volumes/years), they must be gathered by a grouped
  * aggregation, not a within-row fold.
  *
  * A typed `Aggregator[IN, BUF, OUT]` (SURVEY.md §7 "custom Catalyst":
  * the `Aggregator` rung): merge-combinable buffers give map-side
  * partial aggregation — each partition reduces its geometries locally
  * and only the per-entity coordinate buffers cross the shuffle, never
  * raw rows. Null/absent geometries are skipped (0 found → null result,
  * 1 → the Point unchanged, n → a MultiPoint of all coordinates —
  * exactly the reference's three-way rule).
  *
  * Use: `ds.groupByKey(_.personId).agg(MultiPointAgg.toColumn)` or via
  * `agg(MultiPointAgg.asColumn("geom"))` on a typed Dataset[Geometry].
  */
/** Aggregation buffer: (geometry count, type of the sole geometry so
  * far, coordinates) — the count and type are carried so a single input
  * geometry is returned UNCHANGED (a one-coordinate MultiPoint stays a
  * MultiPoint), exactly the reference's three-way rule.
  */
final case class MultiPointBuf(n: Long, soleType: Option[String],
                               coords: Seq[Seq[Double]])

object MultiPointAgg
    extends Aggregator[Option[Geometry], MultiPointBuf, Option[Geometry]] {
  type Buf = MultiPointBuf
  private def Buf(n: Long, soleType: Option[String],
                  coords: Seq[Seq[Double]]): MultiPointBuf =
    MultiPointBuf(n, soleType, coords)

  override def zero: Buf = Buf(0L, None, Vector.empty)

  override def reduce(buf: Buf, g: Option[Geometry]): Buf = g match {
    case Some(geo) if geo.coordinates != null =>
      Buf(buf.n + 1,
        if (buf.n == 0) Some(geo.`type`) else None,
        buf.coords ++ geo.coordinates)
    case _ => buf
  }

  override def merge(a: Buf, b: Buf): Buf =
    Buf(a.n + b.n,
      if (a.n == 0) b.soleType else if (b.n == 0) a.soleType else None,
      a.coords ++ b.coords)

  override def finish(buf: Buf): Option[Geometry] = buf.n match {
    case 0 => None
    case 1 => Some(Geometry(buf.soleType.getOrElse("Point"), buf.coords))
    case _ => Some(Geometry("MultiPoint", buf.coords))
  }

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]

  override def outputEncoder: Encoder[Option[Geometry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Option[Geometry]]()

  def asColumn: TypedColumn[Option[Geometry], Option[Geometry]] = toColumn
}

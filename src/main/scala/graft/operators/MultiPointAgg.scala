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
object MultiPointAgg
    extends Aggregator[Option[Geometry], Seq[Seq[Double]], Option[Geometry]] {

  override def zero: Seq[Seq[Double]] = Vector.empty

  override def reduce(buf: Seq[Seq[Double]],
                      g: Option[Geometry]): Seq[Seq[Double]] = g match {
    case Some(geo) if geo.coordinates != null => buf ++ geo.coordinates
    case _ => buf
  }

  override def merge(a: Seq[Seq[Double]], b: Seq[Seq[Double]]): Seq[Seq[Double]] =
    a ++ b

  override def finish(buf: Seq[Seq[Double]]): Option[Geometry] = buf.length match {
    case 0 => None
    case 1 => Some(Geometry("Point", buf))
    case _ => Some(Geometry("MultiPoint", buf))
  }

  override def bufferEncoder: Encoder[Seq[Seq[Double]]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Seq[Double]]]()

  override def outputEncoder: Encoder[Option[Geometry]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Option[Geometry]]()

  def asColumn: TypedColumn[Option[Geometry], Option[Geometry]] = toColumn
}

package graft

import graft.geocode.Geocoder
import graft.model.{DirectoryMeta, GeoAddress, LineRecord}
import graft.operators.{CityDirOps, TransformOps}
import graft.parse.EntryParser
import graft.sources.{Hocr, HocrArchive}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The four reference steps (`module.exports.steps`,
  * city-directories.js:455-460) as Spark jobs. The reference checkpoints
  * every step through NDJSON files; here steps are `DataFrame =>
  * DataFrame` and fuse into one narrow pipeline when chained — checkpoints
  * become optional `write`s instead of mandatory boundaries.
  *
  * The whole reference dataflow is map-only (SURVEY.md §4: zero wide
  * dependencies); this implementation preserves that: parse/geocode/
  * transform produce NO shuffle — the only exchanges are the optional
  * sink `partitionBy` and the `geocodeViaJoin` variant's re-collect.
  */
object CityDirectories {

  /** `parse` step (city-directories.js:170-259): manifest → year filter →
    * availability filter (join in the source) → archive scan with pushed
    * page-range filter → column detection → line explode → dot-collapse →
    * entry parse.
    */
  def parse(spark: SparkSession, manifest: Dataset[DirectoryMeta],
            archiveDir: String, minYear: Option[Int] = None,
            maxYear: Option[Int] = None,
            standaloneStreets: Set[String] =
              EntryParser.defaultStandaloneStreets): DataFrame = {
    import spark.implicits._
    // year-interval CONTAINMENT filter before any archive is opened —
    // the reference's manual pushdown (city-directories.js:191-196)
    val inRange = manifest.filter(
      CityDirOps.yearInterval(col("yearMin"), col("yearMax"), minYear, maxYear))
    val pages = HocrArchive.readPages(spark, archiveDir, inRange)
    // column detect (O-29) + in-column filter (O-27) + line explode (O-30)
    // as one typed flatMap: per-page work, no state across pages
    val lines: Dataset[LineRecord] = pages.flatMap { p =>
      Hocr.detectPage(p.hocr, p.columnCount).toSeq.flatten
        .filter(_.columnIndex.isDefined)
        .map(l => LineRecord(p.uuid, p.yearMin, p.yearMax, p.imageId,
          p.pageUuid, p.pageNum, l.bbox, l.text))
    }
    lines.toDF()
      .withColumn("text", CityDirOps.collapseDots(col("text"))) // O-17
      .withColumn("parsed",
        EntryParser.parseEntry(col("text"), standaloneStreets)) // O-32(b)
  }

  /** `geocode` step (city-directories.js:272-323): broadcast-lookup every
    * parsed location, misses in-band.
    */
  def geocode(spark: SparkSession, lines: DataFrame,
              dim: Dataset[GeoAddress]): DataFrame =
    Geocoder.geocode(lines, Geocoder.buildIndex(spark, dim))

  /** `transform` step (city-directories.js:338-451): tagged union of
    * object/relation/log records.
    */
  def transform(geocoded: DataFrame): DataFrame =
    TransformOps.taggedUnion(geocoded)

  /** Union sink (SURVEY.md O-9): the reference writes records one at a
    * time through a single writer (`.series()`, city-directories.js:449);
    * here one partition-parallel NDJSON write, partitioned by record kind.
    */
  def writeUnion(df: DataFrame, path: String): Unit =
    df.withColumn("geometry", geometryJson(col("geometry")))
      .write.mode("overwrite").partitionBy("type").json(path)

  /** Normalized geometry → exact GeoJSON text: Point coordinates unwrap
    * back to a flat pair (see model.Geometry).
    */
  def geometryJson(g: Column): Column =
    when(g.isNull, lit(null).cast("string"))
      .when(g.getField("type") === "Point",
        to_json(struct(
          g.getField("type").as("type"),
          element_at(g.getField("coordinates"), 1).as("coordinates"))))
      .otherwise(to_json(g))
}

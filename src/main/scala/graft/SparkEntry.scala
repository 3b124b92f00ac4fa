package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory: one named DataFrame query per
  * implemented operator from SURVEY.md §2 plus the large-scale-pipeline
  * extension operators (dedup / similarity / text analysis / events /
  * multimodal). `oracleSql` carries the DuckDB-equivalent SQL for each
  * oracle-expressible query; names and output column names match exactly.
  */
object SparkEntry {

  private val catalogs: Seq[(Map[String, (SparkSession, String) => DataFrame],
                             Map[String, String])] = Seq(
    (_root_.graft.queries.RelationalQueries.queries,
     _root_.graft.queries.RelationalQueries.oracles),
    (_root_.graft.queries.CityDirQueries.queries,
     _root_.graft.queries.CityDirQueries.oracles),
    (_root_.graft.queries.DedupQueries.queries,
     _root_.graft.queries.DedupQueries.oracles),
    (_root_.graft.queries.SimilarityQueries.queries,
     _root_.graft.queries.SimilarityQueries.oracles),
    (_root_.graft.queries.TextQueries.queries,
     _root_.graft.queries.TextQueries.oracles),
    (_root_.graft.queries.EventQueries.queries,
     _root_.graft.queries.EventQueries.oracles),
    (_root_.graft.queries.MultimodalQueries.queries,
     _root_.graft.queries.MultimodalQueries.oracles),
    (_root_.graft.queries.StreamParityQueries.queries,
     _root_.graft.queries.StreamParityQueries.oracles),
    (_root_.graft.queries.GraphQueries.queries,
     _root_.graft.queries.GraphQueries.oracles),
    (_root_.graft.queries.DataQualityQueries.queries,
     _root_.graft.queries.DataQualityQueries.oracles),
    (_root_.graft.queries.SpatialQueries.queries,
     _root_.graft.queries.SpatialQueries.oracles)
  )

  /** Flagship: the full city-directory pipeline end-to-end on the
    * deterministic synthetic corpus — archive scan (pushed page filter) →
    * column detect → line explode → dot collapse → entry parse → geocode
    * broadcast lookup → tagged-union transform. Driver smoke-checks
    * rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    import java.nio.file.{Files, Paths}
    val dir = "/tmp/graft-entry-fixture"
    fixtures.CityDirFixture.ensure(dir)
    import spark.implicits._
    val manifest = sources.Manifest.load(spark,
      Files.readString(Paths.get(dir, "manifest.html")))
    val dim = spark.createDataset(fixtures.CityDirFixture.dimension)
    // the parser's standalone-street whitelist comes from the SAME
    // dimension the geocoder uses — corpus street names are the rule
    // parser's substitute for the CRF's lexical training data (r5
    // verdict item 5); on this fixture dimension the derived set equals
    // the hand-curated default, so goldens are unchanged by design
    val lines = CityDirectories.parse(spark, manifest, dir,
      standaloneStreets = parse.EntryParser.standaloneStreetsFrom(dim))
    val geocoded = CityDirectories.geocode(spark, lines, dim)
    CityDirectories.transform(geocoded)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogs.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalogs.map(_._2).reduce(_ ++ _)
}

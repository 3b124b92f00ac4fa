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
     _root_.graft.queries.RelationalQueries.oracles)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogs.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalogs.map(_._2).reduce(_ ++ _)
}

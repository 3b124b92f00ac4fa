package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver's test tables (TESTDATA.md).
  *
  * All queries take an `sfDir` like `/root/testdata/sf0.01`; the same table
  * names are what the DuckDB oracle sees (`FROM lineitem` etc.), so every
  * query reads through here to keep the two sides aligned.
  *
  * Scale note: `spark.read.parquet` gives Catalyst a pruned, pushdown-capable
  * scan (check `PushedFilters`/`ReadSchema` in explain output). At 100 TB these
  * would be partitioned/bucketed external tables; nothing in the query layer
  * assumes single-file inputs.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

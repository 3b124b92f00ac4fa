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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    * default: read it as a raw ns long (legacy conf) and convert to a µs
    * timestamp at the source boundary (integer `div` — a double division
    * would lose precision above 2^53 ns).
    *
    * KNOWN SIDE EFFECT: the legacy conf is session-wide, so any later
    * TIMESTAMP(NANOS) parquet read in the same session also gets raw
    * longs. Acceptable here (the ns-typed events table is the only such
    * input and every consumer goes through this loader, converting at
    * the boundary); a production deployment would set the conf at
    * session build instead of inside a loader.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

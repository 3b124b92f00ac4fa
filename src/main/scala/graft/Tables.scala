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

  /** Resolved-relation memo, keyed (session → path). `spark.read.parquet`
    * re-resolves the datasource on EVERY call — directory listing +
    * footer schema inference + relation construction, measured ~95 ms
    * warm on this box — and the catalog's 268 lanes each re-read the
    * same nine immutable test tables per bench pass (~35 s/pass of pure
    * re-resolution). A production deployment resolves a table once into
    * a catalog and every query references it; this memo is that
    * behavior for path tables. It caches the ANALYZED PLAN FRAGMENT
    * (file index + schema), never data or results: every action still
    * scans parquet. Self-joins of a memoized frame are safe — Catalyst's
    * DeduplicateRelations re-instances attribute ids when the same
    * LogicalRelation appears twice in one plan (verified: full 268-lane
    * oracle gate green on top of this memo). The test tables are
    * immutable for the life of a process, so there is no staleness
    * channel. Mutable fixture dirs (index append/delete/vacuum lanes)
    * do NOT go through here by design.
    *
    * Lifecycle (advisor r18): the session keys are weak, but the cached
    * DataFrames strongly reference their session, so the value chain
    * alone would pin every entry forever — the map is therefore also
    * CLEARED on `SparkListenerApplicationEnd`, which is when a stopped
    * session's context (classic Spark: one live context per JVM) goes
    * away. A child session discarded WITHOUT stopping its context stays
    * cached until that context ends — bounded by the host's session
    * churn per context, not "collectable" as the earlier doc claimed.
    */
  private val relCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())

  // one clear-on-end hook per context; the listener captures nothing
  // session-scoped, so it cannot itself pin a session
  private val endHooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    immutablePath(spark, s"$sfDir/$name.parquet")

  /** Plan-memoized read of an IMMUTABLE parquet path. For the test
    * tables ([[table]]) and for fixture ARTIFACTS that are marker-built
    * once per process and never rewritten afterwards (banked kNN edges,
    * SCC assignment, posting indexes, the zonemap manifest). Callers
    * whose dirs CAN be rewritten in-process must keep using
    * `spark.read.parquet` directly.
    */
  def immutablePath(spark: SparkSession, path: String): DataFrame =
    relCache
      .computeIfAbsent(spark, s => {
        val sc = s.sparkContext
        if (endHooked.add(sc.applicationId)) {
          sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
            override def onApplicationEnd(
                e: org.apache.spark.scheduler.SparkListenerApplicationEnd)
                : Unit = {
              relCache.clear()
              endHooked.remove(sc.applicationId)
            }
          })
        }
        new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
      })
      .computeIfAbsent(path, spark.read.parquet(_))

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** Normalize the `ts` column to an instant-typed TIMESTAMP regardless
    * of how the parquet writer encoded it. The driver has shipped two
    * generations of `events.parquet`:
    *
    *  - TIMESTAMP(NANOS): Spark 4 refuses it by default; with the
    *    legacy `nanosAsLong` conf it surfaces as a raw ns long —
    *    convert via integer `div` (a double division would lose
    *    precision above 2^53 ns);
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): surfaces as
    *    TIMESTAMP_NTZ — cast to TIMESTAMP, which under the UTC session
    *    timezone this project pins is the identical instant DuckDB's
    *    `epoch(ts)` computes on the same file.
    *
    * Dispatch on the OBSERVED dtype, not the generation, so both shapes
    * (and an already-instant ts) read correctly.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** KNOWN SIDE EFFECT: the legacy conf is session-wide, so any later
    * TIMESTAMP(NANOS) parquet read in the same session also gets raw
    * longs. Acceptable here (the ns-typed events table is the only such
    * input and every consumer goes through this loader, converting at
    * the boundary); a production deployment would set the conf at
    * session build instead of inside a loader.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // normalizeEventTs's NTZ->TIMESTAMP cast is instant-preserving only
    // under a UTC session zone. Every entrypoint builder pins it, but
    // enforce the precondition here too so a future entrypoint (or a
    // non-UTC host) can't silently shift instants. The takeover is
    // session-wide (it changes timestamp formatting for ALL subsequent
    // queries, not just this read), so a caller that deliberately set a
    // non-UTC zone gets a loud warning rather than a silent flip.
    val zone = s.conf.get("spark.sql.session.timeZone")
    if (zone != "UTC") {
      System.err.println(
        s"[graft] Tables.events: overriding session timeZone '$zone' -> " +
          "'UTC' (required for instant-preserving NTZ->TIMESTAMP cast; " +
          "this affects the whole session)")
      s.conf.set("spark.sql.session.timeZone", "UTC")
    }
    normalizeEventTs(table(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

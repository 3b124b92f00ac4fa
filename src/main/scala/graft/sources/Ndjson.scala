package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** NDJSON source with in-band corruption quarantine — the reference's
  * errors-are-data posture (dead-letter downloads
  * `city-directories.js:93-94`, log records `:401-404`) applied at the
  * scan: a malformed line must neither kill the job (FAILFAST) nor
  * silently vanish (DROPMALFORMED); it lands in a quarantine frame the
  * pipeline can count, alert on, and replay after a parser fix.
  */
object Ndjson {

  /** A quarantined scan: the two halves plus `release()`, which
    * unpersists the shared cached scan once both halves have been
    * consumed — without it, each drop processed in a long session
    * would pin its full parsed dataset in executor storage.
    */
  final case class QuarantinedScan(good: DataFrame, quarantine: DataFrame,
                                   release: () => Unit)

  /** One PERMISSIVE scan split two ways. Good rows carry the caller's
    * schema; quarantine rows carry the raw offending line. The scan is
    * cached because Spark refuses to filter on the internal
    * corrupt-record column straight off a file scan (the documented
    * `_corrupt_record` limitation) — and because both halves are
    * consumed anyway, one materialization serves both. Call
    * `release()` when done.
    */
  def readWithQuarantine(spark: SparkSession, path: String,
                         schema: StructType): QuarantinedScan = {
    val raw = spark.read
      .schema(schema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache()
    val good = raw.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val quarantine = raw.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    QuarantinedScan(good, quarantine, () => { raw.unpersist(); () })
  }
}

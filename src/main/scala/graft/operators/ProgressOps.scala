package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Observability for long pipelines (SURVEY.md O-21/O-36): the reference
  * keeps driver-side running counters and per-year percentages as
  * progress logs (`city-directories.js:185-222,287-290`). The Spark-
  * native equivalents:
  *
  *  - `Observation` metrics ride the existing job (zero extra passes,
  *    zero shuffles — the Spark analog of the reference's in-stream
  *    counters and of accumulators, but race-free and tied to an action);
  *  - `perYearCounts` is the batch form of the per-year denominator the
  *    reference derives from `endPage - startPage`.
  *
  * Observability only — never part of query semantics.
  */
object ProgressOps {

  /** Attach row/page counters to a pipeline stage; read them after the
    * next action via `observation.get`.
    */
  def observed(df: DataFrame, name: String): (DataFrame, Observation) = {
    val obs = Observation(name)
    val metrics = Seq(
      count(lit(1)).as("rows")) ++
      (if (df.columns.contains("yearMin") && df.columns.contains("yearMax"))
         Seq(approx_count_distinct(col("yearMin")).as("years"),
             min(col("yearMin")).as("min_year"),
             max(col("yearMax")).as("max_year"))
       else Nil)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Per-year line counts (the reference's `countsPerYear`). */
  def perYearCounts(lines: DataFrame): DataFrame =
    lines.groupBy("yearMin").agg(count(lit(1)).as("n_lines"))
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys.
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting remains the tool when one grouping key dominates (the classic
  * power-law user_id / null-key case) and a single reducer would
  * otherwise own the whole key. The pattern: spread each key over
  * `salts` sub-keys, partially aggregate, then combine — two keyed
  * shuffles, each bounded by rows/salts per reducer instead of the full
  * heavy key.
  */
object SkewOps {

  /** Salted two-phase sum/count per key. Results are EXACTLY the plain
    * groupBy's (sums are associative; the salt only re-buckets rows —
    * q12_salted_agg pins this against the unsalted SQL oracle).
    * The salt is a hash of the whole row, not a random number, so the
    * plan stays deterministic and retry-safe.
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     salts: Int = 16): DataFrame = {
    val keys = keyCols.map(col)
    val salted = df.withColumn("_salt",
      pmod(hash(struct(df.columns.map(col): _*)), lit(salts)))
    salted
      .groupBy(keys :+ col("_salt"): _*)
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(keys: _*)
      .agg(sum(col("_psum")).as("total"), sum(col("_pcnt")).as("n"))
  }

  /** Salted equi-join for a skewed BIG side when the small side is too
    * large to broadcast: each big row takes a deterministic salt, the
    * small side is replicated once per salt (`explode(sequence)`), and
    * the join key becomes (key, salt) — a heavy-hitter key now spreads
    * over `salts` reducers instead of melting one. Results are EXACTLY
    * the plain inner join's (each big row meets exactly the one small
    * replica bearing its salt). Cost: small side × salts exchange
    * volume — the explicit form of what AQE skew-split does at
    * runtime, for when the skew is known ahead of plan time.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCols: Seq[String],
                 salts: Int = 16): DataFrame = {
    val b = big.withColumn("_salt",
      pmod(hash(struct(big.columns.map(col): _*)), lit(salts)))
    val sm = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(sm, keyCols :+ "_salt").drop("_salt")
  }
}

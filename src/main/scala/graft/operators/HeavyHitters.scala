package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` — the
  * frequent-item primitive for streams too wide to aggregate exactly
  * (hot n-grams, hot keys, hot domains at 100 TB: a full
  * `groupBy(item)` shuffles every distinct item; the sketch crosses
  * the exchange as ONE ≤ k-entry map per partition).
  *
  * Guarantees (Misra–Gries 1982; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): after summarizing n items with
  * capacity k, (1) every item with true frequency > n/(k+1) is present
  * in the sketch — no false negatives above the threshold; (2) each
  * reported estimate undercounts by at most n/(k+1) and never
  * overcounts. Both survive arbitrary merge trees, so map-side partial
  * aggregation is safe — which partition saw which rows changes WHICH
  * sub-threshold items appear, but never violates (1) or (2). The
  * verified surface is therefore the CONTRACT, not the sketch content
  * (the tx5 HLL precedent): oracles check presence + bound booleans
  * for provably-frequent items, not map equality.
  *
  * The decrement-all step is the textbook O(k) form — k is tens-to-
  * thousands by design (a sketch the size of the answer); for
  * adversarial mostly-unique streams with large k, the offset +
  * lazy-eviction representation trades it to amortized O(1), noted
  * here as the optimization seam.
  */
final case class MGBuf(counts: Map[String, Long])

class MisraGries(k: Int)
    extends Aggregator[String, MGBuf, Map[String, Long]] {
  require(k > 0, s"sketch capacity must be positive: $k")

  override def zero: MGBuf = MGBuf(Map.empty)

  override def reduce(b: MGBuf, item: String): MGBuf = {
    if (item == null) b
    else {
      val c = b.counts
      c.get(item) match {
        case Some(n) => MGBuf(c.updated(item, n + 1))
        case None if c.size < k => MGBuf(c.updated(item, 1L))
        case None =>
          // full and unseen: decrement every counter, drop zeros (the
          // arriving item's own +1 cancels against the decrement)
          MGBuf(c.collect { case (w, n) if n > 1 => w -> (n - 1) })
      }
    }
  }

  override def merge(a: MGBuf, b: MGBuf): MGBuf = {
    val sum = b.counts.foldLeft(a.counts) { case (acc, (w, n)) =>
      acc.updated(w, acc.getOrElse(w, 0L) + n)
    }
    if (sum.size <= k) MGBuf(sum)
    else {
      // subtract the (k+1)-th largest count from all, keep positives —
      // the mergeable-summaries rule that preserves both guarantees
      val m = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      MGBuf(sum.collect { case (w, n) if n > m => w -> (n - m) })
    }
  }

  override def finish(buf: MGBuf): Map[String, Long] = buf.counts

  override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object HeavyHitters {

  /** Sketch the item column into (item, est) rows — one global
    * aggregation whose partials are ≤ k-entry maps (ObjectHashAggregate
    * keeps the buffer as an object; only the map crosses the shuffle).
    */
  def heavyHitters(df: DataFrame, itemCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(itemCol).cast("string")).as[String]
      .select(new MisraGries(k).toColumn.name("sketch"))
      .select(explode(col("sketch")))
      .toDF("item", "est")
  }

  /** EXACT heavy hitters by sketch-then-verify — the production
    * two-pass pattern: pass 1 sketches candidates (≤ k items), pass 2
    * exact-counts ONLY rows matching a candidate (broadcast ≤ k-row
    * dimension — the post-filter agg shuffles at most k·tasks tiny
    * rows, never the full distinct-item space) and keeps items whose
    * exact count clears the n/(k+1) threshold.
    *
    * The output is DETERMINISTIC even though the sketch is not: the MG
    * guarantee makes any valid sketch's candidate set a superset of
    * the truly-frequent items, and the exact filter removes whatever
    * sub-threshold noise that particular merge order let in — so every
    * run returns exactly the items with true frequency > n/(k+1), with
    * EXACT counts. Cost: two scans of `items` instead of one
    * full-distinct aggregation; cache upstream if the input is an
    * expensive derivation.
    */
  /** Count-Min sketch build: a (depth × width) counter grid where item
    * occurrences add 1 at (r, md5(r ‖ item) mod width) for every row r
    * — the frequency-estimation complement to Misra–Gries (MG answers
    * "which items are frequent", CMS answers "about how often is THIS
    * item" for any item, including ones MG evicted). Unlike the MG
    * sketch, the grid content is a pure function of the data — md5
    * buckets, order-free integer sums — so the whole sketch replays
    * bit-exactly cross-engine and the oracle hash-matches the GRID,
    * not just a contract.
    *
    * Scale shape: one map-side-combined aggregation whose exchange
    * carries at most depth × width counter rows per task — corpus
    * size and distinct-item count never reach the wire. Estimates
    * ([[cmsEstimate]]) never undercount; overcount is bounded by
    * collisions (≤ 2n/width with probability 1 − 2^−depth, the
    * classic bound).
    */
  def countMinSketch(df: DataFrame, itemCol: String, width: Int,
                     depth: Int): DataFrame = {
    require(width > 0 && depth > 0, s"bad CMS shape: $width x $depth")
    val item = col(itemCol).cast("string")
    val cells = array((0 until depth).map { r =>
      struct(lit(r).as("r"),
        (conv(substring(md5(concat(lit(s"cms$r|"), item)), 1, 15), 16, 10)
          .cast("long") % width).cast("int").as("b"))
    }: _*)
    df.filter(item.isNotNull)
      .select(explode(cells).as("_c"))
      .groupBy(col("_c.r").as("r"), col("_c.b").as("b"))
      .agg(count(lit(1)).as("n"))
  }

  /** Point estimates off a [[countMinSketch]]: per queried item, the
    * MIN over rows of its bucket's counter. The probe join is
    * (depth × width)-bounded on the sketch side — broadcast-able by
    * construction.
    */
  def cmsEstimate(sketch: DataFrame, queries: DataFrame,
                  itemCol: String, width: Int, depth: Int): DataFrame = {
    val item = col(itemCol).cast("string")
    val probes = queries.select(item.as("item")).distinct()
      .select(col("item"), explode(array((0 until depth).map { r =>
        struct(lit(r).as("r"),
          (conv(substring(md5(concat(lit(s"cms$r|"), col("item"))), 1, 15),
            16, 10).cast("long") % width).cast("int").as("b"))
      }: _*)).as("_c"))
      .select(col("item"), col("_c.r").as("r"), col("_c.b").as("b"))
    probes.join(broadcast(sketch), Seq("r", "b"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
  }

  def exactHeavyHitters(df: DataFrame, itemCol: String, k: Int)
      : DataFrame = {
    val items = df.select(col(itemCol).cast("string").as("item"))
    val cands = heavyHitters(items, "item", k).select("item")
    val tot = items.agg(count(lit(1)).cast("double").as("n"))
    items.join(broadcast(cands), Seq("item"))
      .groupBy("item").agg(count(lit(1)).as("exact_count"))
      // one-row scalar side: hint it so the plan is pinned to BNLJ-
      // broadcast regardless of stats, like every other scalar cross
      // join in the repo
      .crossJoin(broadcast(tot))
      .filter(col("exact_count") > col("n") / (k + 1))
      .select("item", "exact_count")
  }
}

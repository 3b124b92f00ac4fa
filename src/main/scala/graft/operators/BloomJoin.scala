package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join reduction — the join-size killer for the
  * cases Catalyst's own runtime filter injection
  * (`spark.sql.optimizer.runtime.bloomFilter.*`) declines: build sides
  * produced by custom Generators, keys derived mid-pipeline, or
  * stream-static shapes.
  *
  * The sketch is built DISTRIBUTED with Catalyst's own
  * `BloomFilterAggregate` (a `TypedImperativeAggregate`: each partition
  * fills a local filter, only the OR-merged bit arrays cross the wire),
  * so the driver collects one bit array — never the keys. The probe is
  * `BloomFilterMightContain` on a binary literal: codegen'd, the filter
  * deserialized once per task, membership tested via the same xxhash64
  * the builder used.
  *
  * Because a Bloom filter has NO false negatives, pre-filtering the
  * probe side of a semi/inner join never changes the result — false
  * positives are eliminated by the exact join that follows. The win is
  * exchange volume: only ~(matching + fpp) of probe rows reach the
  * shuffle. At 100 TB this is the difference between shuffling the
  * corpus and shuffling the survivors.
  */
object BloomJoin {

  /** Aggregate `key` values of `df` into a serialized Bloom filter
    * sized for `expectedItems` at `fpp`. Returns null when `df` is
    * empty (no filter can be built; treat as "nothing matches").
    *
    * `BloomFilterAggregate` silently clamps its sizing to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` / `.maxNumBits`
    * (defaults 4M items / 64M bits) — a saturated filter would stay
    * CORRECT but degrade to might-contain-everything, quietly voiding
    * the reduction. The requested sizing is raised into those confs for
    * the build (restored after), so the filter is actually as big as
    * asked.
    */
  def buildBloom(df: DataFrame, key: Column, expectedItems: Long,
                 fpp: Double = 0.03): Array[Byte] = {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      ColumnBridge.eagerExpression(xxhash64(key)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val conf = df.sparkSession.conf
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val (oldItems, oldBits) = (conf.get(itemsKey), conf.get(bitsKey))
    val row =
      try {
        conf.set(itemsKey, math.max(oldItems.toLong, expectedItems))
        conf.set(bitsKey, math.max(oldBits.toLong, numBits))
        df.select(ColumnBridge.column(agg)).head()
      } finally {
        conf.set(itemsKey, oldItems)
        conf.set(bitsKey, oldBits)
      }
    if (row.isNullAt(0)) null else row.getAs[Array[Byte]](0)
  }

  /** Codegen probe: may `key` be in the set the filter was built over?
    * True can be wrong (bounded by fpp); false never is. A null filter
    * (empty build side) yields constant false.
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    if (bloom == null) lit(false)
    else ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      ColumnBridge.eagerExpression(xxhash64(key))))

  /** `left` rows whose `key` appears in `right` — exactly a left-semi
    * join, with the probe side bloom-reduced first. `expectedItems`
    * sizes the filter (overestimate is safe, it only costs bits).
    */
  def bloomSemiJoin(left: DataFrame, right: DataFrame, key: String,
                    expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val bloom = buildBloom(right, col(key), expectedItems, fpp)
    left.filter(mightContain(bloom, col(key)))
      .join(right, Seq(key), "left_semi")
  }
}

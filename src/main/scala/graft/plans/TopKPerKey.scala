package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Top-k-per-key as a first-class operator (SURVEY.md §7 "custom (c)":
  * whole-operator semantics Spark's built-ins can only approximate).
  *
  * The built-in formulation — `row_number().over(Window.partitionBy(key)
  * .orderBy(...))` then `filter(rank <= k)` — shuffles EVERY row and
  * fully sorts every key group before discarding all but k rows. At
  * 100 TB that sort-everything-keep-k is the dominant cost.
  *
  * This operator plans as two physical nodes:
  *
  *   TopKPerKeyExec            (final: per-key heap, emits rank)
  *     +- [Exchange on keys]   (inserted by requiredChildDistribution)
  *        +- LocalTopKExec     (map-side: bounded heap per key per
  *                              input partition — at most k rows per
  *                              key cross the wire)
  *
  * Map-side pruning bounds shuffle volume by (#keys × k × #partitions)
  * instead of the input size, and nothing is ever fully sorted — both
  * sides keep bounded heaps (O(n log k) comparisons, O(k) memory per
  * key). Rank semantics are exactly `row_number` under the given
  * ordering, so the same DuckDB oracle verifies both formulations.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                      rankAttr: AttributeReference, child: LogicalPlan)
    extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

/** Shared per-partition bounded-heap logic. */
private[plans] object TopKHeaps {

  /** Keep the k FIRST rows per key under `order` from `it`. Returns the
    * kept rows per key, each key's rows sorted ascending by `order`.
    */
  def topKPerKey(it: Iterator[InternalRow], keys: Seq[Expression],
                 order: Seq[SortOrder], k: Int, input: Seq[Attribute])
      : Iterator[(UnsafeRow, Array[InternalRow])] = {
    val keyProj = UnsafeProjection.create(keys, input)
    val ordering = new org.apache.spark.sql.catalyst.expressions.codegen
      .LazilyGeneratedOrdering(order, input)
    // max-heap of the kept set: head = worst kept row, evicted first
    val heaps = new java.util.LinkedHashMap[UnsafeRow,
      java.util.PriorityQueue[InternalRow]]()
    it.foreach { row =>
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[InternalRow](k + 1,
          ordering.reversed())
        heaps.put(key.copy(), heap)
      }
      if (heap.size() < k) heap.add(row.copy())
      else if (ordering.compare(row, heap.peek()) < 0) {
        heap.poll(); heap.add(row.copy())
      }
    }
    import scala.jdk.CollectionConverters._
    heaps.entrySet().iterator().asScala.map { e =>
      val arr = e.getValue.toArray(Array.empty[InternalRow])
      java.util.Arrays.sort(arr, ordering)
      (e.getKey, arr)
    }
  }
}

/** Map-side prune: at most k rows per key leave each input partition.
  * Emits plain child rows (no rank — ranks are only final after the
  * shuffle).
  */
case class LocalTopKExec(keys: Seq[Expression], order: Seq[SortOrder],
                         k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, os, kk, attrs) = (keys, order, k, child.output)
    child.execute().mapPartitions { it =>
      TopKHeaps.topKPerKey(it, ks, os, kk, attrs).flatMap(_._2)
    }
  }
  override protected def withNewChildInternal(c: SparkPlan): LocalTopKExec =
    copy(child = c)
}

/** Final per-key top-k with rank emission; requires co-clustering on the
  * keys (Spark inserts the exchange).
  */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, rankAttr: AttributeReference,
                          child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, os, kk, attrs, out) = (keys, order, k, child.output, output)
    child.execute().mapPartitions { it =>
      val proj = UnsafeProjection.create(out, out)
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      TopKHeaps.topKPerKey(it, ks, os, kk, attrs).flatMap {
        case (_, rows) =>
          rows.iterator.zipWithIndex.map { case (row, i) =>
            rankRow.setInt(0, i + 1)
            proj(joined(row, rankRow))
          }
      }
    }
  }
  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}

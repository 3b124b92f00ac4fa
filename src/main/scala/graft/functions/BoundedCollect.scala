package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType}

/** `collect_list` with a HARD buffer cap: accumulation stops at `cap`
  * elements — per partial buffer and across merges — so one hot group
  * can never materialize an unbounded array in executor memory.
  *
  * The motivating shape is a capped inverted index
  * ([[graft.operators.DedupOps.containmentPairs]]): group postings by
  * term, DROP terms with document frequency above a cap. Built-in
  * `collect_list(...)` + `filter(size(...) <= cap)` computes the right
  * answer but buffers the ENTIRE posting list first — a boilerplate
  * shingle appearing in 10M documents is exactly the group that
  * explodes, at exactly the moment the filter was going to discard it.
  * With the cap at `maxDf + 1`, an over-frequent group's buffer stops
  * growing at `maxDf + 1` (just enough for the size filter to see
  * "too big"), and memory is O(cap) per group regardless of skew.
  *
  * DETERMINISM contract: which elements survive a truncated buffer
  * depends on partition encounter order — so either filter truncated
  * groups out (`size(c) <= cap - 1`, the inverted-index use) or treat
  * the result as a uniform-ish sample (reservoir-without-replacement
  * shapes want a real reservoir instead). Untruncated groups collect
  * every non-null element, exactly like `collect_list` (which is
  * itself unordered across partitions).
  *
  * Catalyst shape: a [[TypedImperativeAggregate]] (the same machinery
  * as Spark's own Collect) — partial-aggregates map-side, serializes
  * the buffer as one UnsafeRow array field, works for any element
  * type, usable from `groupBy(...).agg(...)`.
  */
case class BoundedCollectList(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]]
  with UnaryLike[Expression] {

  require(cap > 0, s"bounded_collect_list cap must be positive, got $cap")

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty[Any]

  override def update(buf: mutable.ArrayBuffer[Any],
                      input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (buf.length < cap) {
      val v = child.eval(input)
      // copy: complex values returned by eval may be mutable row views
      if (v != null) buf += InternalRow.copyValue(v)
    }
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[Any],
                     other: mutable.ArrayBuffer[Any])
      : mutable.ArrayBuffer[Any] = {
    val room = cap - buf.length
    if (room >= other.length) buf ++= other
    else if (room > 0) buf ++= other.take(room)
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.toArray)

  @transient private lazy val serProjection =
    UnsafeProjection.create(
      Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(buf: mutable.ArrayBuffer[Any]): Array[Byte] =
    serProjection(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val buf = mutable.ArrayBuffer.empty[Any]
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType, (_, v) => buf += v)
    buf
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, false)

  override def withNewMutableAggBufferOffset(n: Int): BoundedCollectList =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BoundedCollectList =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): BoundedCollectList =
    copy(child = c)
  override def prettyName: String = "bounded_collect_list"
}

object BoundedCollect {

  /** Column-API form: `groupBy(k).agg(boundedCollectList(col, cap))`. */
  def boundedCollectList(c: Column, cap: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      BoundedCollectList(ColumnBridge.expression(c), cap)
        .toAggregateExpression())
  }
}

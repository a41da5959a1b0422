package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect

/** `collect_list` with a hard per-group element cap — the aggregation
  * half of the LSH hot-bucket guard (Dedup.hotBucketGuard).
  *
  * Why not count-prepass + join: bounding a pathological group used to
  * take a second aggregation over the banded frame plus a semi-join,
  * roughly doubling the candidate stage's cost to defend against a
  * bucket that almost never exists. This aggregate restores the
  * ORIGINAL single-shuffle shape while keeping the two guarantees the
  * guard exists for: the aggregation buffer stops growing at `limit`
  * elements (one degenerate bucket cannot OOM an executor — partial
  * buffers on the map side are capped too, and capped partials merge
  * to a capped result), and the caller drops over-limit groups before
  * any pair expansion, so pair mass stays bounded by construction.
  *
  * Semantics: a group with more than `limit` input values collects an
  * arbitrary `limit`-subset — callers must treat an at-limit result as
  * "overflowed", never as the group's contents. The guard does this by
  * collecting with `limit = cap + 1` and testing `size(out) > cap`:
  * overflow detection by LENGTH, so no separate exact `count`
  * aggregate rides the hot aggregation. Groups at or under the limit
  * collect exactly their values (order arbitrary, like collect_list).
  * Runs in ObjectHashAggregate exactly like collect_list — same
  * execution path, same cost. */
final case class BoundedCollectList(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.ArrayBuffer[Any]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(limit > 0, s"limit must be > 0, got $limit")

  override lazy val bufferElementType: org.apache.spark.sql.types.DataType =
    child.dataType
  override def convertToBufferElement(value: Any): Any =
    InternalRow.copyValue(value)
  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override def update(buffer: mutable.ArrayBuffer[Any],
      input: InternalRow): mutable.ArrayBuffer[Any] =
    if (buffer.length >= limit) buffer else super.update(buffer, input)

  override def merge(buffer: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val room = limit - buffer.length
    if (room <= 0) buffer
    else if (other.length <= room) buffer ++= other
    else buffer ++= other.take(room)
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buffer.toArray)

  override def prettyName: String = "bounded_collect_list"

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : org.apache.spark.sql.catalyst.expressions.aggregate.ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : org.apache.spark.sql.catalyst.expressions.aggregate.ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : BoundedCollectList = copy(child = newChild)
}

object BoundedCollect {
  /** Column form: `boundedCollectList(col, limit)`. */
  def boundedCollectList(c: Column, limit: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      BoundedCollectList(org.apache.spark.sql.GraftBridge.expression(c), limit)
        .toAggregateExpression())
}

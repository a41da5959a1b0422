package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, TernaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Per-group bounded top-k by `(score DESC, id ASC)`, emitted as the
  * winning ids (best-first array) — the aggregation form of a rank
  * window filtered to `rk <= k`.
  *
  * Why not `row_number().over(Window.partitionBy(g))`: a rank window
  * funnels EVERY row of a group into one task and sorts it before the
  * `rk <= k` filter throws all but k rows away. When the group is
  * corpus-sized (the ANN recall evals' brute ground truth: one group
  * per query over a billion-vector scan), that single-task sort is the
  * whole job's wall clock. This aggregate keeps a size-k heap instead:
  * partial (map-side) heaps never exceed k entries, capped partials
  * merge to a capped result, and the shuffle carries at most
  * `k × partitions` pairs per group — the same plan shape as
  * TakeOrderedAndProject but usable per-GROUP inside one shared scan.
  *
  * Determinism: the retained set is the true top-k under the TOTAL
  * order `(score DESC, id ASC)` (ids are unique), so the result is
  * independent of input and merge order — callers must rank on a
  * ROUNDED score (the registry's cross-engine rule) exactly as they
  * would under the window form. Null score or id rows are skipped,
  * matching a rank window's treatment of rows the ordering cannot
  * place. Runs in ObjectHashAggregate like collect_list. */
final case class BoundedTopKIds(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with BinaryLike[Expression] {

  require(k > 0, s"k must be > 0, got $k")

  override def left: Expression = score
  override def right: Expression = id

  // analysis-time validation (constructor-time is impossible: Column
  // arguments arrive as lazily-converted ColumnNodeExpression wrappers
  // whose pre-analysis dataType reads NullType)
  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (DOUBLE score, BIGINT id), got " +
          s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_top_k_ids"

  /** Heap order: the MAX element is the WORST retained pair (lowest
    * score, then highest id), i.e. the eviction candidate at the head. */
  private object WorstFirst extends Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](WorstFirst)

  private def insert(buf: mutable.PriorityQueue[(Double, Long)],
      pair: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(pair)
    else if (WorstFirst.compare(pair, buf.head) < 0) {
      buf.dequeue()
      buf.enqueue(pair)
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      insert(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)])
      : mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // sorted ascending under WorstFirst = least-worse first = best-first
    val sorted = buf.toArray.sorted(WorstFirst)
    new GenericArrayData(sorted.map(_._2))
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) {
      buf.enqueue((bb.getDouble(), bb.getLong()))
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKIds =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKIds =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BoundedTopKIds =
    copy(score = newLeft, id = newRight)
}

/** [[BoundedTopKIds]] with a carried payload: per-group bounded top-k
  * by `(score DESC, id ASC)` emitted as `array<struct<id, payload>>`
  * (best-first). The payload rides the heap but never participates in
  * the ordering — the device that lets a SECOND ranking run inside the
  * ≤k-element result array (e.g. the IVF-PQ recall eval selects
  * top-refine by ADC distance while carrying each candidate's exact
  * cosine, then re-ranks the array by it), keeping two-stage selection
  * inside one bounded aggregation instead of a join back to the corpus.
  * Same determinism and null-skip rules as [[BoundedTopKIds]]; a null
  * payload on a retained row is kept as a null struct field. */
final case class BoundedTopKPairs(
    score: Expression,
    id: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long, Any)]]
  with TernaryLike[Expression] {

  require(k > 0, s"k must be > 0, got $k")

  override def first: Expression = score
  override def second: Expression = id
  override def third: Expression = payload
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", DoubleType, nullable = true))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_top_k_pairs"

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType &&
      payload.dataType == DoubleType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (DOUBLE score, BIGINT id, DOUBLE payload), got " +
          s"(${score.dataType.simpleString}, ${id.dataType.simpleString}, " +
          s"${payload.dataType.simpleString})")
    }

  private object WorstFirst extends Ordering[(Double, Long, Any)] {
    override def compare(a: (Double, Long, Any), b: (Double, Long, Any)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long, Any)] =
    mutable.PriorityQueue.empty[(Double, Long, Any)](WorstFirst)

  private def insert(buf: mutable.PriorityQueue[(Double, Long, Any)],
      e: (Double, Long, Any)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (WorstFirst.compare(e, buf.head) < 0) {
      buf.dequeue()
      buf.enqueue(e)
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long, Any)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long, Any)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      insert(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long], payload.eval(input)))
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long, Any)],
      other: mutable.PriorityQueue[(Double, Long, Any)])
      : mutable.PriorityQueue[(Double, Long, Any)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long, Any)]): Any = {
    val sorted = buf.toArray.sorted(WorstFirst)
    new GenericArrayData(sorted.map { case (_, i, p) =>
      InternalRow(i, p)
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long, Any)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 25)
    bb.putInt(buf.size)
    buf.foreach { case (s, i, p) =>
      bb.putDouble(s); bb.putLong(i)
      if (p == null) bb.put(0: Byte)
      else { bb.put(1: Byte); bb.putDouble(p.asInstanceOf[Double]) }
    }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long, Any)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) {
      val s = bb.getDouble(); val i = bb.getLong()
      val p: Any = if (bb.get() == (1: Byte)) bb.getDouble() else null
      buf.enqueue((s, i, p))
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BoundedTopKPairs =
    copy(score = newFirst, id = newSecond, payload = newThird)
}

object BoundedTopK {
  /** Column form: ids of the group's top `k` rows by
    * `(score DESC, id ASC)`, best-first. */
  def topKIds(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      BoundedTopKIds(
        org.apache.spark.sql.GraftBridge.expression(score),
        org.apache.spark.sql.GraftBridge.expression(id),
        k).toAggregateExpression())

  /** Column form: `array<struct<id, payload>>` of the group's top `k`
    * rows by `(score DESC, id ASC)`, best-first, payload carried. */
  def topKPairs(score: Column, id: Column, payload: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      BoundedTopKPairs(
        org.apache.spark.sql.GraftBridge.expression(score),
        org.apache.spark.sql.GraftBridge.expression(id),
        org.apache.spark.sql.GraftBridge.expression(payload),
        k).toAggregateExpression())
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point lookup into a serialized Count-Min sketch built by Spark's
  * `count_min_sketch(col, eps, confidence, seed)` aggregate — the read
  * half the built-in surface is missing (the aggregate returns opaque
  * bytes; nothing in `functions._` can probe them).
  *
  * `cms_probe(sketch, item)` returns the estimated count of `item`,
  * with the CMS guarantee: never below the true count, and within
  * eps * totalCount above it with the sketch's confidence. The
  * aggregate ingests strings as their UTF-8 bytes, so the probe hashes
  * the same representation (estimateCount on byte[] — a probe with a
  * Java String would hash differently and read garbage cells).
  *
  * Scale shape: the sketch is a fixed-width mergeable state (the
  * aggregate's partial states combine by cell-wise add), so heavy-hitter
  * estimation over a 100 TB stream is one map-side-combined aggregation
  * producing a KB-sized array, broadcast to whoever probes it. Probes
  * deserialize once per distinct sketch per partition (ref-cached), not
  * once per row.
  *
  * Off the hot path by design (probe tables are key-sized), so
  * CodegenFallback instead of a doGenCode — the interpreter overhead is
  * paid per probed key, not per corpus row.
  */
case class CmsProbe(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_probe requires (binary sketch, string item), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_probe"

  // same serialized sketch bytes arrive for every probe row (one agg
  // output, usually broadcast), but each row's UnsafeRow.getBinary is a
  // FRESH copy — reference equality never hits, so the cache key is the
  // content. Arrays.equals on a hit is a linear memcmp (~KBs-MBs), still
  // orders of magnitude cheaper than re-deserializing the sketch's cell
  // matrix per row; a miss (different sketch) pays one deserialize.
  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: CountMinSketch = _

  override protected def nullSafeEval(sk: Any, item: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    if (cachedBytes == null || !java.util.Arrays.equals(bytes, cachedBytes)) {
      cachedSketch = CountMinSketch.readFrom(bytes)
      cachedBytes = bytes
    }
    cachedSketch.estimateCount(item.asInstanceOf[UTF8String].getBytes)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsProbe =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd membership probe against a DRIVER-BUILT Bloom filter
  * (`DataFrameStatFunctions.bloomFilter`) — the read half of that
  * surface, which otherwise forces a scalar UDF per probe. Unlike
  * [[CmsProbe]] this sits on the HOT path (it pre-filters a fact table
  * row-by-row before a join), so it carries a real `doGenCode`: the
  * filter object rides the codegen references array
  * (`ctx.addReferenceObj`, the same device Spark's own runtime
  * bloom-join filter uses) and each row pays one inlined
  * `mightContainLong`/`mightContainBinary` call inside whole-stage
  * codegen — no UDF boxing, no Row round-trip.
  *
  * String probes hash the UTF-8 bytes directly (`mightContainBinary`),
  * which is bit-identical to `putString`'s ingestion; long/int probes
  * take the widened long. */
case class BloomMightContain(bloom: org.apache.spark.util.sketch.BloomFilter,
    child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | org.apache.spark.sql.types.IntegerType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a long/int/string probe, got ${other.sql}")
  }
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType => bloom.mightContainLong(v.asInstanceOf[Long])
    case org.apache.spark.sql.types.IntegerType =>
      bloom.mightContainLong(v.asInstanceOf[Int].toLong)
    case StringType =>
      bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case LongType =>
        s"${ev.value} = $bf.mightContainLong($c);"
      case org.apache.spark.sql.types.IntegerType =>
        s"${ev.value} = $bf.mightContainLong((long) $c);"
      case StringType =>
        s"${ev.value} = $bf.mightContainBinary($c.getBytes());"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** Column-level entry points for the sketch probes. */
object sketch {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def cmsProbe(sk: Column, item: Column): Column =
    column(CmsProbe(expression(sk), expression(item)))

  def bloomMightContain(bf: org.apache.spark.util.sketch.BloomFilter,
      probe: Column): Column =
    column(BloomMightContain(bf, expression(probe)))
}

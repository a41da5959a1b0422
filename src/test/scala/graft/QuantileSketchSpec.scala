package graft

import org.apache.spark.sql.functions._

import graft.functions.QuantileSketch
import graft.functions.QuantileSketch.{Digest, QuantileAgg}

/** Pins the contracts q101 relies on: bounded rank error regardless of
  * arrival/merge order, two-level mergeability (the store-per-day,
  * merge-later use case), bounded digest size, and read edge cases.
  */
class QuantileSketchSpec extends SparkSpec {

  private def digestOf(xs: Seq[Double]): Digest = {
    val agg = new QuantileAgg(0.5)
    xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
  }

  /** rank of value v in xs = |{x <= v}| */
  private def rankErr(xs: Seq[Double], d: Digest, q: Double): Double = {
    val est = QuantileSketch.quantile(d, q)
    val rank = xs.count(_ <= est).toDouble
    math.abs(rank - q * xs.size) / xs.size
  }

  private val rnd = new scala.util.Random(42)
  // lognormal-ish skewed data: the hard case for value-error contracts,
  // handled fine by a rank contract
  private val data: Seq[Double] = Seq.fill(20000)(math.exp(rnd.nextGaussian() * 2))

  test("out-of-range quantiles are rejected, never mislabeled min/max") {
    intercept[IllegalArgumentException](
      graft.functions.QuantileSketch.tdigestQuantile(1.5))
    intercept[IllegalArgumentException](
      graft.functions.QuantileSketch.tdigestQuantile(-0.1))
  }

  test("single-pass rank error stays under 2% on skewed data") {
    val d = digestOf(data)
    for (q <- Seq(0.05, 0.25, 0.5, 0.75, 0.95, 0.99))
      assert(rankErr(data, d, q) <= 0.02, s"q=$q")
  }

  test("two-level merge (per-chunk digests merged later) keeps rank error under 3%") {
    val agg = new QuantileAgg(0.5)
    val merged = data.grouped(1000).map(digestOf).reduce(agg.merge)
    for (q <- Seq(0.05, 0.5, 0.95))
      assert(rankErr(data, merged, q) <= 0.03, s"q=$q")
  }

  test("merge order does not break the bound (reversed and interleaved)") {
    val agg = new QuantileAgg(0.5)
    val chunks = data.grouped(1000).map(digestOf).toSeq
    val fwd = chunks.reduce(agg.merge)
    val rev = chunks.reverse.reduce(agg.merge)
    for (d <- Seq(fwd, rev); q <- Seq(0.1, 0.5, 0.9))
      assert(rankErr(data, d, q) <= 0.03)
  }

  test("digest size stays bounded no matter how much data goes in") {
    val d = digestOf(data)
    assert(d.means.length <= 400) // 2 * MaxCentroids (compress threshold)
    val agg = new QuantileAgg(0.5)
    val merged = data.grouped(500).map(digestOf).reduce(agg.merge)
    assert(merged.means.length <= 400)
  }

  test("read edge cases: empty digest is NaN, constant data returns the constant") {
    assert(QuantileSketch.quantile(Digest(Array.empty, Array.empty), 0.5).isNaN)
    val const = digestOf(Seq.fill(5000)(7.5))
    for (q <- Seq(0.0, 0.5, 1.0))
      assert(QuantileSketch.quantile(const, q) === 7.5)
  }

  test("null rows are skipped like percentile_approx; an all-null group yields null") {
    import spark.implicits._
    val df = Seq[(Long, Option[Double])](
      (1L, Some(1.0)), (1L, None), (1L, Some(3.0)),
      (2L, None), (2L, None))
      .toDF("g", "x")
    val got = df.groupBy("g")
      .agg(graft.functions.QuantileSketch.tdigestQuantile(0.5)(col("x")).as("med"))
      .orderBy("g").collect()
    assert(got(0).getDouble(1) == 2.0) // nulls skipped, median of {1, 3}
    assert(got(1).isNullAt(1))         // all-null group → null, not a crash
  }

  test("as a grouped udaf the estimate lands within 3% rank error per group") {
    import spark.implicits._
    val df = data.zipWithIndex
      .map { case (x, i) => (s"g${i % 3}", x) }
      .toDF("g", "x")
      .repartition(4)
    val est = df.groupBy("g")
      .agg(QuantileSketch.tdigestQuantile(0.5)(col("x")).as("e50"))
    val checked = df.join(est, "g")
      .groupBy("g")
      .agg(count(lit(1)).as("n"),
        count(when(col("x") <= col("e50"), 1)).as("r50"))
      .select(col("g"),
        (abs(col("r50") - col("n") * 0.5) <= col("n") * 0.03 + 1).as("ok"))
      .collect()
    assert(checked.length === 3)
    assert(checked.forall(_.getBoolean(1)))
  }
}

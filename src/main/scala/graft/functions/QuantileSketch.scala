package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A mergeable quantile sketch (simplified merging t-digest): bounded
  * centroid set (mean, weight), compressed by greedy adjacent merging
  * under a uniform per-centroid weight cap of total/maxCentroids — rank
  * error is O(1/maxCentroids) regardless of data size or arrival order
  * at the partial-aggregate level.
  *
  * This is the scale substitute for exact per-group percentiles (q56):
  * partials are fixed-size and merge map-side, so the aggregate is one
  * narrow pass — no per-group sort, no whole-group materialization.
  * Spark ships the same idea as `percentile_approx` (q76); this module
  * is the library's own sketch so pipelines can carry, store, and merge
  * digests across jobs (e.g. per-day sketches merged into a 90-day
  * quantile without touching raw data again).
  *
  * Perf note: an Aggregator with an array buffer pays an encoder
  * round-trip per input row (see SimHashAggregator) — fine for grouped
  * aggregation at millions of rows, not for a per-row hot path.
  */
object QuantileSketch {

  final case class Digest(means: Array[Double], weights: Array[Double])

  private val MaxCentroids = 200
  // buffer can grow to 2× before a compress pass amortizes the sort
  private val CompressAt = 2 * MaxCentroids

  private[functions] def compress(means: Array[Double], weights: Array[Double]): Digest = {
    if (means.length <= MaxCentroids) return Digest(means, weights)
    val order = means.indices.sortBy(i => means(i))
    val total = weights.sum
    val cap = total / MaxCentroids
    val outM = Array.newBuilder[Double]
    val outW = Array.newBuilder[Double]
    var curM = means(order.head)
    var curW = weights(order.head)
    order.tail.foreach { i =>
      val (m, w) = (means(i), weights(i))
      if (curW + w <= cap) { // weighted mean of the merged centroid
        curM = (curM * curW + m * w) / (curW + w)
        curW += w
      } else {
        outM += curM; outW += curW
        curM = m; curW = w
      }
    }
    outM += curM; outW += curW
    Digest(outM.result(), outW.result())
  }

  private def add(d: Digest, m: Double, w: Double): Digest = {
    val nm = d.means :+ m
    val nw = d.weights :+ w
    if (nm.length >= CompressAt) compress(nm, nw) else Digest(nm, nw)
  }

  /** Quantile estimate: linear interpolation on the cumulative-weight
    * midpoints of the sorted centroids (the standard t-digest read). */
  def quantile(d: Digest, q: Double): Double = {
    if (d.means.isEmpty) return Double.NaN
    val order = d.means.indices.sortBy(i => d.means(i))
    val ms = order.map(i => d.means(i)).toArray
    val ws = order.map(i => d.weights(i)).toArray
    val total = ws.sum
    val target = q * total
    var cum = 0.0
    var i = 0
    while (i < ms.length) {
      val mid = cum + ws(i) / 2
      if (target <= mid) {
        if (i == 0) return ms(0)
        val prevMid = cum - ws(i - 1) / 2
        val f = (target - prevMid) / (mid - prevMid)
        return ms(i - 1) + f * (ms(i) - ms(i - 1))
      }
      cum += ws(i)
      i += 1
    }
    ms.last
  }

  /** Aggregator producing the q-quantile estimate of a double column.
    * Boxed input so NULL rows are SKIPPED like percentile_approx (a
    * primitive Double encoder would fail the whole job on the first
    * null with AssertNotNull); an all-null/empty group finishes to
    * null, again matching the built-in. */
  final class QuantileAgg(q: Double)
      extends Aggregator[java.lang.Double, Digest, java.lang.Double] {
    // out-of-range q would silently return the group min/max labeled
    // as a quantile; reject like percentile/percentile_approx do
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0, 1], got $q")
    def zero: Digest = Digest(Array.empty, Array.empty)
    def reduce(b: Digest, x: java.lang.Double): Digest =
      if (x == null) b else add(b, x.doubleValue(), 1.0)
    def merge(a: Digest, b: Digest): Digest =
      compress(a.means ++ b.means, a.weights ++ b.weights)
    def finish(b: Digest): java.lang.Double =
      if (b.means.isEmpty) null else java.lang.Double.valueOf(quantile(b, q))
    def bufferEncoder: Encoder[Digest] = Encoders.product[Digest]
    def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  /** Column function: `tdigestQuantile(0.5)` usable in agg(...). */
  def tdigestQuantile(q: Double): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new QuantileAgg(q))
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time joins Spark has no built-in operator for: as-of
  * (latest-preceding-row lookup, kdb/DuckDB `ASOF JOIN` semantics) and
  * interval (range-predicate) joins. Both avoid the naive
  * equi-join-then-filter shape, which materializes |left| × |right-rows-
  * per-key| intermediates before pruning — the thing that explodes on
  * skewed keys at scale.
  */
object TemporalJoin {

  /** As-of join: for every left row, attach `rightCols` from the single
    * right row with the greatest `rightTime <= leftTime` for the same
    * `key` (inclusive, DuckDB `ASOF JOIN ... ON l.t >= r.t` semantics);
    * null-extended when no right row precedes (left outer).
    *
    * Implementation is the union-tag pattern, not a join: tag each side,
    * union, and let every left row pick up the latest preceding right
    * attributes with `last(_, ignoreNulls)` over a running
    * (time, side)-ordered window per key. One shuffle of each side by
    * `key` — no per-key cross product, no row explosion on hot keys, and
    * AQE never needs to rescue a skewed build side. Sorting right rows
    * before left rows at equal timestamps makes the join inclusive.
    *
    * Determinism: callers must ensure at most one right row per
    * (key, rightTime) — pre-aggregate otherwise (equal-time right rows
    * tie in the window order and `last` would pick arbitrarily).
    *
    * The right attributes travel as ONE struct, and `last(_,
    * ignoreNulls)` picks the latest preceding right ROW whole — a
    * per-column `last` would instead backfill a NULL attribute of the
    * matched row from an OLDER right row, splicing together a row that
    * never existed (nullable right columns made that silent).
    *
    * Column contract: left keeps all its columns; `rightCols` must not
    * collide with them (alias on the way in); `__t`/`__side`/`__r` are
    * reserved working names.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightCols.intersect(leftCols).isEmpty,
      s"rightCols ${rightCols.intersect(leftCols).mkString(",")} collide with left side")
    val reserved = Seq("__t", "__side", "__r")
    val clash = reserved.filter(n => leftCols.contains(n) || rightCols.contains(n))
    require(clash.isEmpty, // withColumn would silently REPLACE them
      s"column(s) ${clash.mkString(",")} collide with asOf's working columns — rename them first")
    val rType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col("__t"), col("__side")) ++
        leftCols.filterNot(_ == key).map(col) :+
        lit(null).cast(rType).as("__r"): _*)
    val r = right
      // rows that can NEVER match under the documented semantics:
      // `l.t >= r.t` is false for a NULL right time, and the equality
      // key never matches NULL. Unfiltered, the window's nulls-first
      // ordering would treat a NULL right time as "-infinity" (matching
      // everything after it), and partitionBy would pair NULL keys with
      // each other — both silent wrong attributions clean oracle data
      // never exercises. A NULL LEFT time/key needs no guard: it sorts
      // before every (filtered) right row and null-extends correctly.
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col("__t"), col("__side")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).as(c)) :+
        struct(rightCols.map(col): _*).as("__r"): _*)
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(Seq(col(key)) ++ leftCols.filterNot(_ == key).map(col) ++
        Seq(col("__side"),
          last(col("__r"), ignoreNulls = true).over(w).as("__r")): _*)
      .filter(col("__side") === 1)
      // getField on the null struct (no preceding right row) is null —
      // the left-outer null extension falls out per column
      .select(Seq(col(key)) ++ leftCols.filterNot(_ == key).map(col) ++
        rightCols.map(c => col("__r").getField(c).as(c)): _*)
  }

  /** Interval join: all (left, right) pairs with the same `key` whose
    * times satisfy `leftTime + lower <= rightTime < leftTime + upper`
    * (lower inclusive, upper exclusive; offsets in microseconds, e.g.
    * lower = -15min, upper = 0 for "right events in the 15 minutes
    * before left").
    *
    * Implementation is the bucketized range join: both sides bucket
    * their event time by the window width; a left row can only match
    * right rows in the buckets its window overlaps (at most 2 when
    * `upper - lower` equals the bucket width), so the join is an
    * equi-join on (key, bucket) with the exact range predicate applied
    * after. Cost is |left| × 2 join rows against per-bucket right
    * groups, not a per-key cross product — the standard way interval
    * joins survive 100 TB (Spark only plans a broadcast range join by
    * itself; a shuffle range join degenerates to per-key
    * nested-loops).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      lowerMicros: Long, upperMicros: Long): DataFrame = {
    require(upperMicros > lowerMicros, "empty interval")
    // only the using-key may be shared: any other shared name would come
    // out of the join as an ambiguous duplicate column
    val shared = left.columns.intersect(right.columns).filterNot(_ == key)
    require(shared.isEmpty, s"rename colliding columns before joining: ${shared.mkString(",")}")
    val reserved = Seq("__lt", "__rt", "__bucket")
    val clash = reserved.filter(n =>
      left.columns.contains(n) || right.columns.contains(n))
    require(clash.isEmpty, // withColumn would silently REPLACE them
      s"column(s) ${clash.mkString(",")} collide with intervalJoin's working columns — rename them first")
    val width = upperMicros - lowerMicros
    // integral floor-division via SQL `div`, never `/`: Divide runs in
    // DOUBLE, and beyond 2^53 µs (far-future sentinel timestamps) the
    // two sides' buckets would round independently and could disagree
    // by one at a boundary — silently dropping a true match before the
    // exact range filter ever sees it. pmod keeps the remainder
    // non-negative, so `div`'s truncation equals mathematical floor for
    // negative times too, all in 64-bit integer arithmetic.
    def bucketExpr(t: String): String =
      s"(($t) - pmod(($t), ${width}L)) div ${width}L"
    val l = left
      .withColumn("__lt", unix_micros(col(leftTime)))
      .withColumn("__bucket", explode(expr(
        s"sequence(${bucketExpr(s"__lt + (${lowerMicros}L)")}, " +
          s"${bucketExpr(s"__lt + (${upperMicros}L)")})")))
    val r = right
      .withColumn("__rt", unix_micros(col(rightTime)))
      .withColumn("__bucket", expr(bucketExpr("__rt")))
    l.join(r, Seq(key, "__bucket"))
      .filter(col("__rt") >= col("__lt") + lit(lowerMicros) &&
        col("__rt") < col("__lt") + lit(upperMicros))
      .drop("__bucket", "__lt", "__rt")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: the two standard answers to "this join
  * shuffles too much at scale".
  *
  *  - Bucketing: pre-shuffle once at write time; every later equi-join or
  *    aggregation on the bucket key reads co-located buckets and skips
  *    its Exchange entirely. The right tool for stable join keys
  *    (customer_id, doc fingerprint) touched by many downstream queries.
  *  - Salting: when one key is pathologically hot (power-law user_ids,
  *    null-heavy keys), explode the dimension side over a small salt
  *    domain and scatter the fact side across it — the hot key's rows
  *    spread over `salts` tasks instead of one straggler.
  */
object Layout {

  /** Write `df` as a bucketed+sorted parquet table. Joins and
    * aggregations between tables bucketed the same way on the same key
    * execute without a shuffle (verified by LayoutSpec). */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Salted equi-join for skewed keys: the (small) `dim` side is
    * replicated `salts`× and the skewed side scatters uniformly across
    * the salt domain. Row-level salt assignment uses a hash of the whole
    * skewed row's key plus a per-row ordinal, so equal keys spread.
    * Result is exactly the plain `skewed ⋈ dim` join. */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // dim-side-preserving joins would duplicate unmatched dim rows once
    // per salt (the dim side is exploded `salts`×) — reject them; no
    // "cross" either (Dataset.join rejects Cross with USING columns, and
    // a cross join with equi-using keys is just inner)
    val supported = Set("inner", "left", "leftouter", "leftsemi", "leftanti")
    require(supported.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports fact-side-preserving join types only, got '$joinType' " +
        "(right/full outer would emit one row per salt for unmatched dim keys)")
    val saltedFact = skewed.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative integer columns: bit i of `a` lands at position 2i,
    * bit i of `b` at 2i+1. Points close in BOTH dimensions are close in
    * z, which is what makes min/max stats tight on both columns at once. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Z-order clustered write: range-partition + sort by the interleaved
    * key so every output file covers a compact z-range — its parquet
    * min/max stats are then tight on BOTH dimensions, and a predicate on
    * either column touches a fraction of the files (a 1-D sort gives
    * that for one column and nothing for the other). Spark itself only
    * prunes row groups from these stats; a table format with file-level
    * stats (Delta/Iceberg) would also skip whole files — the layout is
    * what creates the skippability either way (verified by LayoutSpec:
    * a y-range predicate touches every x-sorted file but a minority of
    * z-ordered ones). */
  def zorderWrite(df: DataFrame, dir: String, colA: String, colB: String,
      numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)

  /** Per-file column statistics of whatever the frame scans — the
    * file-skipping audit for a layout: one row per input file with row
    * count and per-column min/max/null-count. This is the check that a
    * clustered write (zorderWrite, a sorted ingest, hive partitioning)
    * actually produced tight, skippable stats — run it after a layout
    * change, not on every query. One shuffle on the file name; stats are
    * partial-aggregated map-side, so cost is a single scan regardless of
    * file count. */
  def statsSummary(df: DataFrame, cols: Seq[String]): DataFrame = {
    val perCol = cols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
        (count(lit(1)) - count(col(c))).as(s"nulls_$c"))
    }
    // group on the raw path and take the basename AFTER the aggregate:
    // the regexp then runs once per file instead of once per row
    df.groupBy(input_file_name().as("__path"))
      .agg(count(lit(1)).as("n_rows"), perCol: _*)
      .withColumn("file", regexp_extract(col("__path"), "([^/]+)$", 1))
      .drop("__path")
      .select(col("file") +: (col("n_rows") +:
        cols.flatMap(c => Seq(col(s"min_$c"), col(s"max_$c"), col(s"nulls_$c")))): _*)
  }

  /** Files a `lo <= c <= hi` range predicate can SKIP, judged from a
    * statsSummary frame: everything whose [min_c, max_c] misses the
    * range entirely, plus all-null files (their min/max are NULL, the
    * three-valued range test says UNKNOWN — but no row of them can
    * match, and real engines skip them on the null-count stat). The
    * returned fraction of the file population is the layout's skipping
    * effectiveness for that predicate — the number a 100 TB table lives
    * or dies by. */
  def pruneableFiles(stats: DataFrame, c: String, lo: Column, hi: Column): DataFrame =
    stats.filter(col(s"max_$c") < lo || col(s"min_$c") > hi ||
      col(s"nulls_$c") === col("n_rows"))
}

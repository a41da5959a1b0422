package graft

import org.apache.spark.sql.functions._

import graft.plans.MaterializedViews
import graft.plans.MaterializedViews.MvDef

/** The MV rewrite rule: covered aggregates are served from the
  * pre-aggregated table (plan scans the MV, results identical to the
  * direct aggregate); anything the view can't answer exactly is left
  * alone.
  */
class MaterializedViewSpec extends SparkSpec {

  private def scanPaths(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("covered query is served from the MV and matches the direct aggregate") {
    val baseDir = java.nio.file.Files.createTempDirectory("graft-mv-base").toString
    val mvDir = java.nio.file.Files.createTempDirectory("graft-mv-view").toString

    // base fact: (day, event_type, value-cents) derived from real events
    Tables.events(spark, sf("sf0.001"))
      .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .write.mode("overwrite").parquet(baseDir)
    // the view: per (day, event_type) count + sum
    spark.read.parquet(baseDir)
      .groupBy("day", "event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
      .write.mode("overwrite").parquet(mvDir)
    spark.read.parquet(mvDir).createOrReplaceTempView("mv_daily")

    try {
      MaterializedViews.register(spark, Seq(MvDef(
        basePathMarker = baseDir,
        mvTable = "mv_daily",
        groupCols = Set("day", "event_type"),
        sums = Map("cents" -> "sum_cents"),
        countCol = "n")))

      // coarser grouping than the view → must re-aggregate the MV
      val q = spark.read.parquet(baseDir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), sum("cents").as("total_cents"))
      val plan = scanPaths(q)
      assert(plan.contains(mvDir), s"expected MV scan:\n$plan")
      assert(!plan.contains(baseDir), s"base must not be scanned:\n$plan")

      MaterializedViews.clear(spark)
      val direct = spark.read.parquet(baseDir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), sum("cents").as("total_cents"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      MaterializedViews.register(spark, Seq(MvDef(
        baseDir, "mv_daily", Set("day", "event_type"),
        Map("cents" -> "sum_cents"), "n")))
      val served = q.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(served === direct)

      // grouping at exactly the view's grain also serves
      val fine = spark.read.parquet(baseDir)
        .groupBy("day", "event_type").agg(sum("cents").as("s"))
      assert(scanPaths(fine).contains(mvDir))

      // NOT covered: a filter between scan and aggregate → untouched
      val filtered = spark.read.parquet(baseDir)
        .filter(col("event_type") === "click")
        .groupBy("day").agg(sum("cents").as("s"))
      assert(!scanPaths(filtered).contains(mvDir), scanPaths(filtered))

      // NOT covered: an aggregate the view lacks (no min registered) →
      // untouched
      val minq = spark.read.parquet(baseDir)
        .groupBy("day").agg(min("cents").as("m"))
      assert(!scanPaths(minq).contains(mvDir), scanPaths(minq))

      // NOT covered: a different base table → untouched
      val other = Tables.lineitem(spark, sf("sf0.001"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      assert(!scanPaths(other).contains(mvDir))
    } finally MaterializedViews.clear(spark)
  }

  test("registered min/max re-aggregate from the MV (min of mins)") {
    val baseDir = java.nio.file.Files.createTempDirectory("graft-mv-mm").toString
    val mvDir = java.nio.file.Files.createTempDirectory("graft-mv-mmv").toString
    Tables.events(spark, sf("sf0.001"))
      .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"),
        col("value").cast("long").as("v"))
      .write.mode("overwrite").parquet(baseDir)
    spark.read.parquet(baseDir)
      .groupBy("day", "event_type")
      .agg(count(lit(1)).as("n"), min("v").as("min_v"), max("v").as("max_v"))
      .write.mode("overwrite").parquet(mvDir)
    spark.read.parquet(mvDir).createOrReplaceTempView("mv_mm")
    try {
      val direct = spark.read.parquet(baseDir)
        .groupBy("event_type").agg(min("v").as("lo"), max("v").as("hi"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      MaterializedViews.register(spark, Seq(MvDef(
        baseDir, "mv_mm", Set("day", "event_type"), Map.empty, "n",
        mins = Map("v" -> "min_v"), maxs = Map("v" -> "max_v"))))
      // coarser grouping than the view → min of per-group mins
      val served = spark.read.parquet(baseDir)
        .groupBy("event_type").agg(min("v").as("lo"), max("v").as("hi"))
      assert(scanPaths(served).contains(mvDir), scanPaths(served))
      assert(!scanPaths(served).contains(baseDir))
      assert(served.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet === direct)
      // mixing in an unregistered aggregate keeps the whole query on base
      val mixed = spark.read.parquet(baseDir)
        .groupBy("event_type").agg(min("v").as("lo"), avg("v").as("a"))
      assert(!scanPaths(mixed).contains(mvDir), scanPaths(mixed))
    } finally MaterializedViews.clear(spark)
  }

  test("count(NULL) is never rewritten; global count over empty base stays 0") {
    val baseDir = java.nio.file.Files.createTempDirectory("graft-mv-null").toString
    val mvDir = java.nio.file.Files.createTempDirectory("graft-mv-nullv").toString
    // empty base table (schema only) + its (empty) MV
    Tables.events(spark, sf("sf0.001"))
      .select(col("event_type"), col("value").cast("long").as("v"))
      .limit(0)
      .write.mode("overwrite").parquet(baseDir)
    spark.read.parquet(baseDir)
      .groupBy("event_type").agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .write.mode("overwrite").parquet(mvDir)
    spark.read.parquet(mvDir).createOrReplaceTempView("mv_empty")
    try {
      MaterializedViews.register(spark, Seq(MvDef(
        baseDir, "mv_empty", Set("event_type"), Map("v" -> "sum_v"), "n")))

      // count(NULL-literal) is always 0, NOT the row count: the rule
      // must leave it alone (rewriting to SUM(n) would return rows)
      val cn = spark.read.parquet(baseDir).groupBy("event_type")
        .agg(count(lit(null)).as("c"))
      assert(!scanPaths(cn).contains(mvDir), scanPaths(cn))

      // global count(*) over the empty base: SUM over the empty MV is
      // NULL — the rewrite must coalesce back to count semantics (0)
      val global = spark.read.parquet(baseDir).agg(count(lit(1)).as("c"))
      assert(global.head().getLong(0) == 0L,
        s"global count over empty base: ${global.head()}")
    } finally MaterializedViews.clear(spark)
  }

  test("decimal sums re-cast to the original aggregate type") {
    val baseDir = java.nio.file.Files.createTempDirectory("graft-mv-dec").toString
    val mvDir = java.nio.file.Files.createTempDirectory("graft-mv-decv").toString
    Tables.lineitem(spark, sf("sf0.001"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"))
      .write.mode("overwrite").parquet(baseDir)
    spark.read.parquet(baseDir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum("price").as("sum_price"))
      .write.mode("overwrite").parquet(mvDir)
    spark.read.parquet(mvDir).createOrReplaceTempView("mv_price")
    try {
      val direct = spark.read.parquet(baseDir)
        .groupBy("l_returnflag").agg(sum("price").as("s"))
      val expectType = direct.schema("s").dataType
      val expect = direct.collect()
        .map(r => (r.getString(0), r.getDecimal(1))).toSet

      MaterializedViews.register(spark, Seq(MvDef(
        baseDir, "mv_price", Set("l_returnflag", "l_linestatus"),
        Map("price" -> "sum_price"), "n")))
      val served = spark.read.parquet(baseDir)
        .groupBy("l_returnflag").agg(sum("price").as("s"))
      assert(scanPaths(served).contains(mvDir))
      assert(served.schema("s").dataType == expectType,
        s"${served.schema("s").dataType} != $expectType")
      assert(served.collect().map(r => (r.getString(0), r.getDecimal(1))).toSet
        === expect)
    } finally MaterializedViews.clear(spark)
  }

  test("a misregistered MV (missing column) declines the rewrite instead of failing the query") {
    val baseDir = java.nio.file.Files.createTempDirectory("graft-mv-bad-base").toString
    val mvDir = java.nio.file.Files.createTempDirectory("graft-mv-bad-view").toString
    Tables.events(spark, sf("sf0.001"))
      .select(col("event_type"), col("value").cast("long").as("v"))
      .write.mode("overwrite").parquet(baseDir)
    spark.read.parquet(baseDir).groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .write.mode("overwrite").parquet(mvDir)
    spark.read.parquet(mvDir).createOrReplaceTempView("mv_bad")
    try {
      // the registration names a sum column the MV table does NOT have
      // (typo / schema drift) — "correctness never depends on the rule
      // firing" must include misregistration: the query runs from the
      // base table, it does not throw out of the optimizer
      MaterializedViews.register(spark, Seq(MvDef(
        basePathMarker = baseDir,
        mvTable = "mv_bad",
        groupCols = Set("event_type"),
        sums = Map("v" -> "sum_v_typo"),
        countCol = "n")))
      val q = spark.read.parquet(baseDir)
        .groupBy("event_type").agg(sum("v").as("total"))
      val direct = Tables.events(spark, sf("sf0.001"))
        .select(col("event_type"), col("value").cast("long").as("v"))
        .groupBy("event_type").agg(sum("v").as("total"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSet == direct)
      assert(scanPaths(q).contains(baseDir)) // served from base, not broken
      // a CASE-mismatched but real column still rewrites (Spark resolves
      // case-insensitively by default; the MV lookup must match)
      MaterializedViews.clear(spark)
      MaterializedViews.register(spark, Seq(MvDef(
        basePathMarker = baseDir,
        mvTable = "mv_bad",
        groupCols = Set("event_type"),
        sums = Map("v" -> "SUM_V"),
        countCol = "N")))
      val q2 = spark.read.parquet(baseDir)
        .groupBy("event_type").agg(sum("v").as("total"))
      assert(scanPaths(q2).contains(mvDir), scanPaths(q2))
      assert(q2.collect().map(r => (r.getString(0), r.getLong(1))).toSet == direct)
    } finally MaterializedViews.clear(spark)
  }
}

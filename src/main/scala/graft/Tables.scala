package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's synthetic tables (see TESTDATA.md).
  *
  * All queries take a scale-factor directory so the same code runs at
  * sf0.001 (smoke), sf0.01 (DuckDB-oracle correctness) and sf0.1+ (bench).
  * At cluster scale these would be real catalog tables; the loaders keep a
  * single chokepoint where options (schema, partition discovery) live.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts has shipped as either parquet TIMESTAMP(NANOS) — which
    * Spark's reader rejects ([PARQUET_TYPE_ILLEGAL]) — or TIMESTAMP(MICROS)
    * without a UTC flag (read as TIMESTAMP_NTZ). Normalize both to session
    * TimestampType: nanos are read raw (legacy conf) and converted with
    * integer division — (ts / 1000) via double would lose precision above
    * 2^53 and corrupt microseconds; NTZ micros cast 1:1 because the
    * session timezone is pinned to UTC (GraftSession.recommendedConf).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = readParquet(spark, s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Parquet schemas per path, inferred once per JVM: a bare
    * `spark.read.parquet(path)` runs a footer-reading Spark JOB to infer
    * the schema on EVERY call, so each of the registry's queries paid
    * one (or several, for multi-table queries) driver-job round-trips
    * of pure metadata before any data moved. These are the immutable
    * driver-provided tables — at deployment they'd be catalog tables
    * whose schema IS cached metadata — so infer once and pass the
    * schema explicitly afterwards. Data is NOT cached: every read
    * still scans the parquet. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  private def readParquet(spark: SparkSession, path: String): DataFrame = {
    val cached = schemaCache.get(path)
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val df = spark.read.parquet(path)
      schemaCache.put(path, df.schema)
      df
    }
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, sfDir)
      case n        => readParquet(spark, s"$sfDir/$n.parquet")
    }

  /** Key-hash spread for the CPU-bound text/vector kernels, sized by the
    * scan's own statistics instead of a fixed core-count fan-out. The
    * synthetic corpus arrives as ONE small file (one input split), so
    * some spread keeps the kernels off a single core — but a
    * defaultParallelism-way hash of a few-MB corpus costs more in
    * per-task shuffle machinery (map×reduce file creates, the shuffle
    * commit lock, per-block fetch bookkeeping — stack-sampled as a top
    * cost of the whole query sweep) than the spread saves. One partition
    * per MiB of input, floored at 2 and capped at defaultParallelism:
    * at cluster scale bytes/1MiB vastly exceeds the cap, so the width
    * stays exactly the old defaultParallelism there; only the small-scan
    * regime (where the machinery dominated the kernel) gets narrower.
    * The floor is 2, not 1, so the plan NEVER contains a
    * SinglePartition exchange — the fleet lint's single-partition-funnel
    * ban stays enforceable with no allowlist hole.
    * Usage: `Tables.documents(s, d).transform(Tables.spread("doc_id"))`. */
  def spread(key: String)(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = (bytes / (1L << 20) + 1).min(sc.defaultParallelism)
      .max(2).toInt
    df.repartition(parts, col(key))
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

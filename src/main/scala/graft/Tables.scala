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
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, sfDir)
      case n        => spark.read.parquet(s"$sfDir/$n.parquet")
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

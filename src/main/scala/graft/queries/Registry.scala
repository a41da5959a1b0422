package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (when SQL-expressible)
  * an equivalent DuckDB oracle. Determinism rules every entry follows so the
  * driver's hash-compare is stable across engines:
  *
  *  - money/decimal aggregates go through DecimalType (exact) and are cast
  *    to double only at the end — never order-dependent double summation;
  *  - DuckDB `sum(bigint)` returns HUGEINT, so oracles cast back to bigint
  *    to keep the output schema identical to Spark's long;
  *  - timestamps are never emitted raw (Spark truncates the ns source to
  *    µs); they are formatted to strings at second/day granularity;
  *  - every result carries a total ORDER BY ending in a unique key, and
  *    window/rank orders always end in a unique tie-breaker.
  */
final case class Q(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def all: Seq[Q] =
    RelationalQueries.all ++ TextQueries.all ++ SimilarityQueries.all ++
      DedupQueries.all ++ MultimodalQueries.all ++ TemporalQueries.all ++
      ScaleQueries.all ++ AnalyticsQueries.all ++ CdcQueries.all ++
      QualityQueries.all ++ IngestQueries.all

  // toMap keeps the LAST entry per key: a name collision between two
  // registry files would silently drop a query from the driver's run
  // list. Refuse loudly at first access instead.
  private lazy val checked: Seq[Q] = {
    val dup = all.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }
    require(dup.isEmpty,
      s"duplicate registry query name(s): ${dup.toSeq.sorted.mkString(", ")}")
    all
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    checked.map(q => q.name -> q.spark).toMap

  def oracleSql: Map[String, String] =
    checked.flatMap(q => q.oracle.map(q.name -> _)).toMap
}

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
}

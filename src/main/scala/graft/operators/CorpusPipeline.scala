package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation over a document corpus, composed
  * from the operator library — the shape of a pretraining data pipeline:
  *
  *   quality filter → exact dedup → MinHash-LSH near-dedup → annotate
  *
  * Each stage is `DataFrame => DataFrame` and independently usable; the
  * composition documents stage ordering (cheap narrow filters first,
  * exact dedup before the costlier LSH pass so signatures are computed
  * on survivors only) and returns per-stage counts for audit.
  *
  * Scale shape: stages 1-2 shuffle once on a 16-byte digest; stage 3 is
  * the LSH pipeline (narrow signatures + candidate-bounded verification);
  * stage 4 is map-only. Nothing here is quadratic in the corpus.
  */
object CorpusPipeline {

  final case class Report(
      input: Long, afterQuality: Long, afterExact: Long, afterNearDup: Long)

  /** Quality gate: token count and stopword-free-ratio bounds — cheap,
    * narrow, runs first so later stages never see junk. */
  def qualityFilter(docs: DataFrame, text: String,
      minTokens: Int = 10, maxTokens: Int = 100000): DataFrame = {
    val toks = split(col(text), " ")
    docs.filter(size(toks).between(minTokens, maxTokens))
  }

  /** Near-dedup keep-first policy: cluster the verified near-dup pairs
    * transitively (connected components) and keep each cluster's lowest
    * id — a chain a~b~c keeps only a, even when a and c never collide
    * directly. */
  def dropNearDuplicates(docs: DataFrame, id: String, text: String,
      threshold: Double = 0.5): DataFrame = {
    val pairs = Dedup.minHashLshPairs(docs, id, text, threshold = threshold)
    val losers = Dedup.duplicateClusters(pairs)
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as(id))
    docs.join(losers, Seq(id), "left_anti")
  }

  /** Seeded stratified sample: per-stratum fractions (e.g. rebalance
    * languages or sources in a training mix). `sampleBy` is a narrow
    * per-row Bernoulli draw — no shuffle, deterministic for a fixed
    * seed and partitioning, and at 100 TB the only affordable way to
    * downsample: nothing is counted or sorted first. Strata absent from
    * `fractions` are dropped (fraction 0), matching training-mix specs
    * where unlisted sources are excluded. */
  def stratifiedSample(docs: DataFrame, stratum: String,
      fractions: Map[String, Double], seed: Long): DataFrame =
    docs.stat.sampleBy(stratum, fractions, seed)

  /** Full curation pass; returns the surviving corpus + stage counts.
    * Intermediate stages are persisted while the audit counts run (each
    * count would otherwise re-execute everything upstream, re-running
    * the LSH dedup ~3×); the returned frame stays cached — callers
    * materialize it once and may `unpersist()` after. */
  def curate(docs: DataFrame, id: String, text: String,
      minTokens: Int = 10, maxTokens: Int = 100000,
      nearDupThreshold: Double = 0.5): (DataFrame, Report) = {
    val q = qualityFilter(docs, text, minTokens = minTokens, maxTokens = maxTokens)
    val exact = Dedup.dropExactDuplicates(q, id, text).persist()
    val near = dropNearDuplicates(exact, id, text, nearDupThreshold)
    val annotated = near
      .withColumn("fingerprint", md5(col(text)))
      .withColumn("n_tokens", size(split(col(text), " ")))
      .persist()
    // input + after-quality in ONE scan (the quality predicate re-counted
    // as a conditional aggregate) — two separate counts would tokenize
    // the whole corpus twice
    val toks = split(col(text), " ")
    val inQ = docs.agg(
      count(lit(1)).as("n"),
      count(when(size(toks).between(minTokens, maxTokens), 1)).as("nq")).head()
    val report = Report(inQ.getLong(0), inQ.getLong(1),
      exact.count(), annotated.count())
    exact.unpersist()
    (annotated, report)
  }
}

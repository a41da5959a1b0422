package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.CorpusPipeline

/** The LLM-corpus counterpart of [[Pipeline.runWithReport]]: the
  * reference's flow discipline (named stages, bounded retry, a per-run
  * report — what its `@prefect.task`/`@prefect.flow` decorations buy,
  * pipelines/pipeline.py:64-131) applied to the training-data path:
  *
  *   raw JSON docs → curation → epoch mix → tokenizer-ready shards
  *
  * This closes the S6 (raw JSON zone) → S9 (partitioned parquet sink)
  * sink chain end to end at LLM scale: the terminal artifact is the
  * shard store + manifest a training run certifies before reading
  * ([[CorpusPipeline.writeTokenShards]]).
  *
  * Stage contracts — each is a [[Flow]] task with counters, each is
  * idempotent (overwrite sinks), so Flow retries and whole-run reruns
  * converge:
  *  - `ingest_documents`: schema-PINNED json read (no inference scan
  *    over the raw zone) with corrupt-line accounting — malformed rows
  *    are counted and dropped, never silently nulled into the corpus.
  *  - `curate`: [[CorpusPipeline.curate]]; the funnel counts (input →
  *    quality → exact → near-dup survivors) land in the report, so a
  *    run that "succeeds" by curating everything away is a visible
  *    regression, not log noise.
  *  - `export_token_shards`: [[CorpusPipeline.writeTokenShards]] — ONE
  *    shuffle keyed on shard for the whole export; shard/sequence/token
  *    counts come from the manifest of the files JUST WRITTEN.
  */
object CorpusFlow {

  /** Run the corpus flow; returns the shard manifest (re-read from the
    * written store — it certifies what is on disk) and the Flow whose
    * report carries per-stage attempts/seconds/counters. */
  def runWithReport(spark: SparkSession, inputDir: String,
      epochs: Map[String, Double], numShards: Int, seqLen: Int,
      outDir: String, minTokens: Int = 10, maxTokens: Int = 100000,
      nearDupThreshold: Double = 0.5, retries: Int = 2,
      backoffMs: Long = 500, boundedManifest: Boolean = false): (DataFrame, Flow) = {
    val flow = new Flow(retries, backoffMs)

    val docs = flow.task("ingest_documents") {
      val df = spark.read
        .schema("doc_id LONG, source STRING, text STRING, _corrupt STRING")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(inputDir)
      // corrupt lines and null-key rows are ingest FAILURES with a
      // count, not silent nulls that crash curation later (the S2
      // degrade discipline applied to the document zone)
      val bad = df.filter(col("_corrupt").isNotNull ||
        col("doc_id").isNull || col("text").isNull)
      flow.count("corrupt_or_null_lines", bad.count())
      // persist the GOOD frame — it is what curate and the export scan
      // repeatedly; the docs_read count doubles as the cache fill, so
      // the raw JSON zone is parsed twice total (bad count + this),
      // never once per downstream action
      val good = df.filter(col("_corrupt").isNull &&
        col("doc_id").isNotNull && col("text").isNotNull)
        .select("doc_id", "source", "text")
        .persist()
      flow.count("docs_read", good.count())
      good
    }

    val curated = flow.task("curate") {
      val (out, report) = CorpusPipeline.curate(docs, "doc_id", "text",
        minTokens = minTokens, maxTokens = maxTokens,
        nearDupThreshold = nearDupThreshold)
      flow.count("docs_in", report.input)
      flow.count("after_quality", report.afterQuality)
      flow.count("after_exact_dedup", report.afterExact)
      flow.count("survivors", report.afterNearDup)
      out
    }

    val manifest = flow.task("export_token_shards") {
      // boundedManifest: the >executor-shard deployment dial — the
      // manifest job never buffers a shard's keys (shard_fp_pos only)
      val m = CorpusPipeline.writeTokenShards(curated, "doc_id", "source",
        "text", epochs, numShards = numShards, seqLen = seqLen,
        outDir = outDir, boundedOnly = boundedManifest)
      val tot = m.agg(count(lit(1)).as("shards"),
        coalesce(sum("n_docs"), lit(0L)).as("docs"),
        coalesce(sum("n_tokens"), lit(0L)).as("tokens"),
        coalesce(sum("n_seqs"), lit(0L)).as("seqs")).head()
      flow.count("shards", tot.getLong(0))
      flow.count("mixed_docs", tot.getLong(1))
      flow.count("tokens", tot.getLong(2))
      flow.count("sequences", tot.getLong(3))
      m
    }

    // the export is on disk and the manifest re-reads from it — the
    // cached ingest frame (and curate's internal persist) are done
    docs.unpersist()
    curated.unpersist()
    (manifest, flow)
  }
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.{CorpusPipeline, Dedup}

/** Scale-technique queries: each entry demonstrates a pattern that only
  * matters at cluster scale (deterministic sampling, skew-safe two-stage
  * aggregation, mergeable sketches, subtotal cubes, spine fills) or a
  * curation op a pretraining pipeline needs (chunk-level dedup, benchmark
  * decontamination, redaction, entropy scoring). All are exact-oracled
  * except the sketch entries, which pin an error bound (the q46 pattern:
  * engines' sketches differ, the bound is the cross-engine contract).
  */
object ScaleQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dbl(c: Column): Column = c.cast("double")

  /** Deterministic hash sampling — the 100 TB way to take a reproducible
    * ~5% sample: a pure predicate on md5(key) ("first hex byte < 0x0d",
    * 13/256 ≈ 5.1%). No count, no sort, no RNG state; the same rows are
    * selected on any engine, any partitioning, any run — which is what
    * makes sampled pipelines debuggable and their results re-joinable.
    * Contrast `TABLESAMPLE`/`rand()`: partitioning-dependent. */
  val q71 = Q(
    "q71_hash_sample",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(substring(md5(concat_ws(":", col("l_orderkey"), col("l_linenumber"))), 1, 2) < "0d")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), dbl(sum(dec(col("l_quantity")))).as("sum_qty"))
        .orderBy("l_returnflag"),
    Some("""
      SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      WHERE substr(md5(l_orderkey || ':' || l_linenumber), 1, 2) < '0d'
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** CUBE subtotals (GROUPING SETS family) — every (flag, status) combo
    * plus both one-dimension rollups plus the grand total in ONE pass:
    * Spark expands the grouping sets before the hash aggregate, so the
    * fact table is scanned once, not 4×. Labels use COALESCE('ALL')
    * because both grouping columns are non-null in the data. */
  val q72 = Q(
    "q72_cube_subtotals",
    (s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dbl(sum(dec(col("l_quantity")))).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("sum_qty"))
        .orderBy("returnflag", "linestatus"),
    Some("""
      SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             COALESCE(l_linestatus, 'ALL') AS linestatus,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus"""))

  /** Edit distance (fuzzy matching) — levenshtein against a fixed probe
    * over each document's prefix. Both engines implement unit-cost
    * Levenshtein, so the distances are exactly comparable. The per-row
    * kernel is codegen'd (no UDF); at scale this is a narrow map. */
  val q73 = Q(
    "q73_edit_distance",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          levenshtein(substring(col("text"), 1, 20), lit("table value part hash"))
            .cast("long").as("dist"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             CAST(levenshtein(substr(text, 1, 20), 'table value part hash') AS BIGINT) AS dist
      FROM documents ORDER BY doc_id"""))

  /** Skew-safe two-stage aggregation: salt the group key with
    * pmod(hash(rowkey), 32), partially aggregate (key, salt), then
    * re-aggregate by key. A single hot key (l_returnflag has 3 values
    * over 600k+ rows — maximal skew) is spread over 32 reducers instead
    * of melting one. The oracle is the PLAIN single-stage group-by:
    * decimal partials make the rewrite algebraically exact, which is the
    * point — salting must never change results. (Spark's AQE skew join
    * handles join skew; aggregation skew is handled by this rewrite or
    * by partial aggregation — shown explicitly here as the portable
    * pattern.) */
  val q74 = Q(
    "q74_salted_agg",
    (s, d) => {
      val partial = Tables.lineitem(s, d)
        .withColumn("__salt", pmod(hash(col("l_orderkey")), lit(32)))
        .groupBy("l_returnflag", "__salt")
        .agg(sum(dec(col("l_extendedprice"))).as("rev_partial"),
          count(lit(1)).as("n_partial"))
      partial.groupBy("l_returnflag")
        .agg(sum("n_partial").as("n"), dbl(sum(col("rev_partial"))).as("revenue"))
        .orderBy("l_returnflag")
    },
    Some("""
      SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Date-spine zero-fill: generate the full calendar between min and
    * max order date with sequence() and left-join the daily aggregate,
    * so days with no orders appear as explicit zeros (time-series
    * completeness — cumulative/moving windows silently skip missing days
    * otherwise). The spine is ~days rows — trivially broadcast; the fact
    * table is aggregated before the join so nothing wide moves. */
  val q75 = Q(
    "q75_date_spine",
    (s, d) => {
      val o = Tables.orders(s, d)
        .select(to_date(col("o_orderdate")).as("day"), col("o_totalprice"))
      val spine = o.agg(min("day").as("lo"), max("day").as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      val daily = o.groupBy("day")
        .agg(count(lit(1)).as("n_orders"), dbl(sum(dec(col("o_totalprice")))).as("revenue"))
      spine.join(daily, Seq("day"), "left")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("revenue"), lit(0.0)).as("revenue"))
        .orderBy("day")
    },
    Some("""
      WITH o AS (SELECT CAST(o_orderdate AS DATE) AS day, o_totalprice FROM orders),
      b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM o),
      spine AS (SELECT CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM b),
      daily AS (SELECT day, COUNT(*) AS n_orders,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
                FROM o GROUP BY day)
      SELECT strftime(s.day, '%Y-%m-%d') AS day,
             CAST(COALESCE(d.n_orders, 0) AS BIGINT) AS n_orders,
             COALESCE(d.revenue, 0.0) AS revenue
      FROM spine s LEFT JOIN daily d ON s.day = d.day ORDER BY day"""))

  /** Approximate percentile (mergeable quantile sketch) — the scale
    * substitute for q56's exact sort-based percentile: percentile_approx
    * builds a bounded-size sketch that merges map-side, one narrow pass,
    * no per-group sort. Like q46 (HLL), the sketch itself is
    * engine-specific, so the cross-engine contract is the bound: the
    * estimate must land within 1% of the exact median, and the oracle
    * asserts the same bound trivially. A failing bound breaks the hash
    * compare on the boolean. */
  val q76 = Q(
    "q76_approx_median",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          expr("percentile(o_totalprice, 0.5)").as("__exact"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("__ap"))
        .select(col("o_orderpriority"), col("n"),
          round(col("__exact"), 4).as("p50_exact"),
          (abs(col("__ap") - col("__exact")) / col("__exact") <= 0.01).as("within_1pct"))
        .orderBy("o_orderpriority"),
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n,
             ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50_exact,
             TRUE AS within_1pct
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** The library's OWN mergeable quantile sketch (functions.QuantileSketch,
    * a simplified merging t-digest exposed as a typed Aggregator): per-group
    * p50/p95 estimates checked against a RANK contract — the count of rows at
    * or below each estimate must sit within 3% of the target rank. Rank (not
    * value) error is what the sketch bounds, so the contract transfers to any
    * distribution. Exact percentiles ride along as the cross-engine values;
    * the estimates themselves are not emitted (sketch merge order is
    * scheduling-dependent, so their low bits are not reproducible — the
    * contract booleans are). Unlike q76's built-in percentile_approx, this
    * digest is a first-class column value pipelines can store per-day and
    * re-merge across jobs without touching raw data again. */
  val q101 = Q(
    "q101_tdigest_quantile",
    (s, d) => {
      val td50 = graft.functions.QuantileSketch.tdigestQuantile(0.5)
      val td95 = graft.functions.QuantileSketch.tdigestQuantile(0.95)
      val o = Tables.orders(s, d)
      val est = o.groupBy("o_orderpriority")
        .agg(td50(col("o_totalprice")).as("e50"), td95(col("o_totalprice")).as("e95"))
      o.join(broadcast(est), Seq("o_orderpriority"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50_exact"),
          round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95_exact"),
          count(when(col("o_totalprice") <= col("e50"), 1)).as("__r50"),
          count(when(col("o_totalprice") <= col("e95"), 1)).as("__r95"))
        .select(col("o_orderpriority"), col("n"), col("p50_exact"), col("p95_exact"),
          (abs(col("__r50") - col("n") * 0.5) <= col("n") * 0.03 + 1).as("p50_rank_ok"),
          (abs(col("__r95") - col("n") * 0.95) <= col("n") * 0.03 + 1).as("p95_rank_ok"))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
             ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50_exact,
             ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95_exact,
             TRUE AS p50_rank_ok, TRUE AS p95_rank_ok
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Chunk-level exact dedup (paragraph dedup at token granularity):
    * split each document into 10-token chunks, dedup chunks globally
    * with a keep-first policy (rank by (doc_id, chunk_idx) within each
    * chunk hash), report per-document survival. This is the
    * sub-document dedup pass pretraining pipelines run AFTER whole-doc
    * dedup — boilerplate headers/footers repeat across documents that
    * are not near-duplicates of each other. Shuffle key is the 16-byte
    * chunk hash; nothing quadratic. */
  val q77 = Q(
    "q77_chunk_dedup",
    (s, d) =>
      Dedup.chunkKeepFirst(Tables.documents(s, d), "doc_id", "text", chunkTokens = 10)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          count(when(col("kept"), 1)).as("n_kept"))
        .orderBy("doc_id"),
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      ch AS (SELECT doc_id, i AS chunk_idx, array_to_string(toks[i*10+1:i*10+10], ' ') AS chunk
             FROM t, LATERAL (SELECT UNNEST(range(0, ((len(toks)-1) // 10) + 1)) AS i) g),
      r AS (SELECT doc_id, chunk_idx,
                   ROW_NUMBER() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, chunk_idx) AS rn
            FROM ch)
      SELECT doc_id, COUNT(*) AS n_chunks, COUNT(CASE WHEN rn = 1 THEN 1 END) AS n_kept
      FROM r GROUP BY doc_id ORDER BY doc_id"""))

  /** Benchmark decontamination: flag training documents sharing any
    * 8-gram with a held-out benchmark set (here: doc_id % 50 == 0 as
    * the stand-in benchmark). The canonical eval-contamination check
    * (GPT-3 appendix C / PaLM style: n-gram collision against eval
    * sets). Scale shape: the benchmark gram set is tiny relative to the
    * corpus → distinct it and let Spark broadcast the join; the corpus
    * side is a narrow explode → semi-match, never a cross product. */
  val q78 = Q(
    "q78_decontaminate",
    (s, d) => {
      val docs = Tables.documents(s, d)
      CorpusPipeline.decontaminate(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0),
          "doc_id", "text", n = 8)
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
                 WHERE len(string_split(text, ' ')) >= 8),
      g AS (SELECT doc_id, md5(array_to_string(toks[i+1:i+8], ' ')) AS g
            FROM t, LATERAL (SELECT UNNEST(range(0, len(toks) - 7)) AS i) u),
      bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 50 = 0),
      train AS (SELECT DISTINCT doc_id, g FROM g WHERE doc_id % 50 <> 0),
      sh AS (SELECT doc_id, COUNT(*) AS n_shared FROM train JOIN bench USING (g) GROUP BY doc_id)
      SELECT td.doc_id, CAST(COALESCE(sh.n_shared, 0) AS BIGINT) AS n_shared,
             COALESCE(sh.n_shared, 0) > 0 AS contaminated
      FROM (SELECT DISTINCT doc_id FROM train) td LEFT JOIN sh USING (doc_id)
      ORDER BY doc_id"""))

  /** Bloom-prefiltered decontamination (CorpusPipeline.decontaminateBloom)
    * — the scale path of q78 for when the benchmark gram set outgrows a
    * cheap broadcast: a driver-built Bloom sketch over the bench grams
    * prunes the corpus gram stream map-side (codegen'd probe), the exact
    * confirm join removes the sketch's false positives, and the result
    * is byte-identical to the exact path — which is exactly what the
    * oracle checks: the SQL below is the EXACT semantics, blind to the
    * bloom. Different gram width and bench split than q78 so the two
    * queries don't share rows. */
  val q153 = Q(
    "q153_decontaminate_bloom",
    (s, d) => {
      val docs = Tables.documents(s, d)
      CorpusPipeline.decontaminateBloom(
          docs.filter(col("doc_id") % 40 =!= 0),
          docs.filter(col("doc_id") % 40 === 0),
          "doc_id", "text", n = 6, expectedGrams = 200000L)
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
                 WHERE len(string_split(text, ' ')) >= 6),
      g AS (SELECT doc_id, md5(array_to_string(toks[i+1:i+6], ' ')) AS g
            FROM t, LATERAL (SELECT UNNEST(range(0, len(toks) - 5)) AS i) u),
      bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 40 = 0),
      train AS (SELECT DISTINCT doc_id, g FROM g WHERE doc_id % 40 <> 0),
      sh AS (SELECT doc_id, COUNT(*) AS n_shared FROM train JOIN bench USING (g) GROUP BY doc_id)
      SELECT td.doc_id, CAST(COALESCE(sh.n_shared, 0) AS BIGINT) AS n_shared,
             COALESCE(sh.n_shared, 0) > 0 AS contaminated
      FROM (SELECT DISTINCT doc_id FROM train) td LEFT JOIN sh USING (doc_id)
      ORDER BY doc_id"""))

  /** Deterministic export-shard manifest (CorpusPipeline.shardManifest):
    * content-hash sharding (first 32 bits of md5(text) mod 16) plus an
    * order-sensitive per-shard fingerprint over (doc fingerprint, id) in
    * canonical order — the reproducibility contract of a training-data
    * export. The oracle recomputes the same hash arithmetic via DuckDB's
    * '0x' cast and the same canonical ordering via an ordered
    * string_agg; a single reordered or dropped document flips shard_fp.
    * DuckDB's SUM(BIGINT) widens to int128, so the token total is cast
    * back to BIGINT for schema parity. */
  val q154 = Q(
    "q154_shard_manifest",
    (s, d) =>
      CorpusPipeline
        .shardManifest(Tables.documents(s, d), "doc_id", "text", numShards = 16)
        .orderBy("shard"),
    Some("""
      WITH d AS (SELECT doc_id, md5(text) AS fp,
                        len(string_split(text, ' ')) AS tok,
                        ('0x' || substr(md5(text), 1, 8))::BIGINT % 16 AS shard
                 FROM documents)
      SELECT shard, COUNT(*) AS n_docs,
             CAST(SUM(tok) AS BIGINT) AS n_tokens,
             md5(string_agg(fp || '#' || doc_id, ',' ORDER BY fp, doc_id)) AS shard_fp
      FROM d GROUP BY shard ORDER BY shard"""))

  /** Shard novelty curve (CorpusPipeline.shardNovelty): split the
    * corpus into 10 contiguous id-range shards (ingestion-batch
    * stand-ins) and report, per shard, the fraction of its distinct
    * 4-grams first seen there — the dedup-ROI decay curve that tells a
    * pipeline when another crawl snapshot stops buying new data. All
    * counts are exact integers over md5 gram hashes; the only float is
    * one final division. */
  val q183 = Q(
    "q183_shard_novelty",
    (s, d) => CorpusPipeline.shardNovelty(
      Tables.documents(s, d), "doc_id", "text", numShards = 10, n = 4),
    Some("""
      WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents),
      d AS (SELECT LEAST(9, CAST(FLOOR(doc_id * 10 / (mx + 1.0)) AS BIGINT)) AS shard,
                   doc_id, text
            FROM documents, mx),
      tl AS (SELECT shard, string_split(text, ' ') AS toks FROM d),
      g AS (SELECT DISTINCT shard,
                   md5(concat_ws(' ', toks[i], toks[i + 1], toks[i + 2], toks[i + 3])) AS g
            FROM (SELECT shard, toks FROM tl WHERE len(toks) >= 4) tf,
                 LATERAL (SELECT UNNEST(range(1, len(toks) - 2)) AS i) r),
      ps AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_grams FROM g GROUP BY shard),
      fs AS (SELECT g, MIN(shard) AS shard FROM g GROUP BY g),
      nw AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_new FROM fs GROUP BY shard),
      dc AS (SELECT shard, COUNT(*) AS n_docs FROM d GROUP BY shard)
      SELECT dc.shard, dc.n_docs,
             COALESCE(ps.n_grams, 0) AS n_grams,
             COALESCE(nw.n_new, 0) AS n_new,
             COALESCE(ROUND(COALESCE(nw.n_new, 0) /
               CAST(NULLIF(COALESCE(ps.n_grams, 0), 0) AS DOUBLE), 4), 0.0)
               AS novelty_rate
      FROM dc LEFT JOIN ps USING (shard) LEFT JOIN nw USING (shard)
      ORDER BY dc.shard"""))

  /** Sketch-path shard novelty (CorpusPipeline.shardNoveltySketch):
    * per-shard HLL gram sketches + prefix-union growth instead of exact
    * first-seen tracking — the checkpointable KB-sized state an ingest
    * stream keeps. The q164 contract: exact columns + a sketch-error
    * bound flag; the oracle asserts the bound trivially, so any drift
    * breaks the hash compare. */
  val q188 = Q(
    "q188_shard_novelty_sketch",
    (s, d) => CorpusPipeline.shardNoveltySketch(
      Tables.documents(s, d), "doc_id", "text", numShards = 10, n = 4),
    Some("""
      WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents),
      d AS (SELECT LEAST(9, CAST(FLOOR(doc_id * 10 / (mx + 1.0)) AS BIGINT)) AS shard,
                   doc_id, text
            FROM documents, mx),
      tl AS (SELECT shard, string_split(text, ' ') AS toks FROM d),
      g AS (SELECT DISTINCT shard,
                   md5(concat_ws(' ', toks[i], toks[i + 1], toks[i + 2], toks[i + 3])) AS g
            FROM (SELECT shard, toks FROM tl WHERE len(toks) >= 4) tf,
                 LATERAL (SELECT UNNEST(range(1, len(toks) - 2)) AS i) r),
      ps AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_grams FROM g GROUP BY shard),
      fs AS (SELECT g, MIN(shard) AS shard FROM g GROUP BY g),
      nw AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_new FROM fs GROUP BY shard),
      dc AS (SELECT DISTINCT shard FROM d)
      SELECT dc.shard,
             COALESCE(ps.n_grams, 0) AS n_grams,
             COALESCE(nw.n_new, 0) AS n_new,
             COALESCE(ROUND(COALESCE(nw.n_new, 0) /
               CAST(NULLIF(COALESCE(ps.n_grams, 0), 0) AS DOUBLE), 4), 0.0)
               AS novelty_rate,
             TRUE AS within_bound
      FROM dc LEFT JOIN ps USING (shard) LEFT JOIN nw USING (shard)
      ORDER BY dc.shard"""))

  /** Regex redaction (PII-masking shape): replace every digit run in the
    * event props JSON with a placeholder and fingerprint the result —
    * the masking pass anonymization pipelines run before sharing data.
    * Grouped by masked fingerprint to prove the mask is global (one
    * surviving shape) and count total redactions. Narrow map + tiny
    * aggregate; the regex kernel is codegen'd in both engines. */
  val q79 = Q(
    "q79_redact_props",
    (s, d) =>
      Tables.events(s, d)
        .select(
          md5(regexp_replace(col("props"), "[0-9]+", "<NUM>")).as("masked_fp"),
          expr("size(regexp_extract_all(props, '[0-9]+', 0))").cast("long").as("nm"))
        .groupBy("masked_fp")
        .agg(count(lit(1)).as("n_events"), sum("nm").as("n_masked_total"))
        .orderBy("masked_fp"),
    Some("""
      SELECT md5(regexp_replace(props, '[0-9]+', '<NUM>', 'g')) AS masked_fp,
             COUNT(*) AS n_events,
             CAST(SUM(len(regexp_extract_all(props, '[0-9]+'))) AS BIGINT) AS n_masked_total
      FROM events GROUP BY masked_fp ORDER BY masked_fp"""))

  /** Token-distribution entropy per document — a quality signal (low
    * entropy = repetitive/templated text; complements q54's bigram
    * repetition ratio). Computed as log2(n) - Σ c·log2(c) / n from one
    * grouped aggregate, so no per-document sort; 4dp rounding absorbs
    * last-ulp summation-order differences between engines. */
  val q80 = Q(
    "q80_token_entropy",
    (s, d) => {
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      tf.groupBy("doc_id")
        .agg(round(
          log2(sum("c").cast("double")) -
            sum(col("c") * log2(col("c"))) / sum("c"), 4).as("entropy"))
        .orderBy("doc_id")
    },
    Some("""
      WITH tf AS (SELECT doc_id, tok, COUNT(*) AS c
                  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
                  GROUP BY doc_id, tok)
      SELECT doc_id,
             ROUND(log2(CAST(SUM(c) AS DOUBLE)) - SUM(c * log2(CAST(c AS DOUBLE))) / SUM(c), 4) AS entropy
      FROM tf GROUP BY doc_id ORDER BY doc_id"""))

  /** Document packing: assign documents to fixed token-budget bins
    * (2048 tokens) per source — the sequence-packing prep step before
    * training (documents stream into contexts in a stable order; the
    * bin index is the cumulative token count div the budget). The
    * running sum partitions by source, so each partition's window is
    * local — no global sort; bins then aggregate in one pass. */
  val q90 = Q(
    "q90_pack_bins",
    (s, d) =>
      CorpusPipeline.packBins(Tables.documents(s, d),
          stratum = "source", orderCol = "doc_id", text = "text",
          budgetTokens = 2048)
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"))
        .orderBy("source", "bin"),
    Some("""
      WITH d AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens FROM documents),
      c AS (SELECT doc_id, source, n_tokens,
                   SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM d)
      SELECT source, CAST((cum - 1) // 2048 AS BIGINT) AS bin,
             COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
      FROM c GROUP BY source, bin ORDER BY source, bin"""))

  /** Unigram surprisal (perplexity-proxy quality score): average
    * -log2 P(token) per document under the corpus unigram model — the
    * cheap stand-in for KenLM-style LM filtering. The vocabulary (31
    * terms here; bounded in any real corpus after frequency cutoff) is
    * broadcast to the token stream, and the corpus-total scalar rides a
    * 1-row broadcast — the fact-side token explosion never shuffles for
    * enrichment. */
  val q91 = Q(
    "q91_unigram_surprisal",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val freq = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      val total = toks.agg(count(lit(1)).as("total"))
      toks.join(broadcast(freq), Seq("tok"))
        .crossJoin(broadcast(total))
        .groupBy("doc_id")
        .agg(round(avg(-log2(col("c").cast("double") / col("total"))), 4)
          .as("avg_surprisal"))
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
      f AS (SELECT tok, COUNT(*) AS c FROM t GROUP BY tok),
      n AS (SELECT COUNT(*) AS total FROM t)
      SELECT t.doc_id, ROUND(AVG(-log2(CAST(f.c AS DOUBLE) / n.total)), 4) AS avg_surprisal
      FROM t JOIN f USING (tok), n GROUP BY t.doc_id ORDER BY t.doc_id"""))

  /** Training-mix reweighting: per-source resampling weights that move
    * the corpus from its observed token share to a uniform target mix
    * (weight = target_frac / actual_frac) — the arithmetic behind
    * "balance the sources in the next epoch". Two tiny aggregates and a
    * 1-row broadcast; the corpus itself is touched once to count
    * tokens. */
  val q92 = Q(
    "q92_mix_weights",
    (s, d) => {
      val perSource = Tables.documents(s, d)
        .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
        .groupBy("source").agg(sum("n").as("tokens"))
      val totals = perSource.agg(sum("tokens").as("total"), count(lit(1)).as("k"))
      perSource.crossJoin(broadcast(totals))
        .select(col("source"), col("tokens"),
          round(col("tokens").cast("double") / col("total"), 4).as("actual_frac"),
          round((lit(1.0) / col("k")) / (col("tokens").cast("double") / col("total")), 4)
            .as("weight"))
        .orderBy("source")
    },
    Some("""
      WITH s AS (SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
                 FROM documents GROUP BY source),
      t AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total, COUNT(*) AS k FROM s)
      SELECT source, tokens,
             ROUND(CAST(tokens AS DOUBLE) / total, 4) AS actual_frac,
             ROUND((1.0 / k) / (CAST(tokens AS DOUBLE) / total), 4) AS weight
      FROM s, t ORDER BY source"""))

  /** Per-source quality funnel: how many documents survive each
    * progressive filter stage (length → type-token ratio → mean word
    * length), as ONE conditional-aggregate scan — the curation
    * dashboard query, costing one pass regardless of stage count.
    * Every predicate is integer cross-multiplied (10·distinct ≥ 3·n
    * instead of distinct/n ≥ 0.3), so there is no float-boundary risk
    * in the cross-engine compare. */
  val q100 = Q(
    "q100_quality_funnel",
    (s, d) => {
      val toks = split(col("text"), " ")
      Tables.documents(s, d)
        .select(col("source"),
          size(toks).as("n"),
          size(array_distinct(toks)).as("nd"),
          (length(col("text")) - (size(toks) - 1)).as("chars"))
        .withColumn("p1", col("n") >= 20 && col("n") <= 100000)
        .withColumn("p2", col("p1") && col("nd") * 10 >= col("n") * 3)
        .withColumn("p3", col("p2") &&
          col("chars") >= col("n") * 3 && col("chars") <= col("n") * 12)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("p1"), 1)).as("pass_len"),
          count(when(col("p2"), 1)).as("pass_ttr"),
          count(when(col("p3"), 1)).as("pass_all"))
        .orderBy("source")
    },
    Some("""
      WITH t AS (
        SELECT source, len(string_split(text, ' ')) AS n,
               len(list_distinct(string_split(text, ' '))) AS nd,
               length(text) - (len(string_split(text, ' ')) - 1) AS chars
        FROM documents)
      SELECT source, COUNT(*) AS n_docs,
             CAST(count_if(n >= 20 AND n <= 100000) AS BIGINT) AS pass_len,
             CAST(count_if(n >= 20 AND n <= 100000 AND 10*nd >= 3*n) AS BIGINT) AS pass_ttr,
             CAST(count_if(n >= 20 AND n <= 100000 AND 10*nd >= 3*n
                           AND chars >= 3*n AND chars <= 12*n) AS BIGINT) AS pass_all
      FROM t GROUP BY source ORDER BY source"""))

  /** File-level stats audit (operators.Layout.statsSummary): one row per
    * scanned parquet file with row count and per-column min/max/nulls —
    * the skipping-effectiveness check run after any layout change. The
    * test tables are single-file so the oracle pins the stat VALUES (and
    * the basename contract); LayoutSpec drives the real multi-file case
    * against a z-ordered write and asserts actual pruning fractions. */
  val q102 = Q(
    "q102_file_stats",
    (s, d) =>
      graft.operators.Layout
        .statsSummary(Tables.lineitem(s, d), Seq("l_orderkey", "l_quantity"))
        .select(col("file"), col("n_rows"),
          col("min_l_orderkey"), col("max_l_orderkey"), col("nulls_l_orderkey"),
          round(col("min_l_quantity"), 4).as("min_l_quantity"),
          round(col("max_l_quantity"), 4).as("max_l_quantity"),
          col("nulls_l_quantity"))
        .orderBy("file"),
    Some("""
      SELECT 'lineitem.parquet' AS file, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(MIN(l_orderkey) AS BIGINT) AS min_l_orderkey,
             CAST(MAX(l_orderkey) AS BIGINT) AS max_l_orderkey,
             CAST(COUNT(*) - COUNT(l_orderkey) AS BIGINT) AS nulls_l_orderkey,
             ROUND(MIN(l_quantity), 4) AS min_l_quantity,
             ROUND(MAX(l_quantity), 4) AS max_l_quantity,
             CAST(COUNT(*) - COUNT(l_quantity) AS BIGINT) AS nulls_l_quantity
      FROM lineitem"""))

  /** Deterministic weighted sampling (A-Res reservoir keys with a
    * hash-derived uniform): each document draws u from the first 8 md5
    * hex digits of its id and scores u^(1/w) with w = token count —
    * heavier docs win more often, and the SAME sample comes out on any
    * engine, any partitioning, any run, because there is no RNG state.
    * The 100 TB sampling rule: top-k by score is one TakeOrdered pass,
    * no count/sort/shuffle of the corpus. Scores round to 6 dp before
    * ranking (pow differs in the last ulp across libm implementations);
    * doc_id breaks ties totally. */
  val q103 = Q(
    "q103_weighted_sample",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("w"),
          ((conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long").cast("double") + 0.5) / 4294967296.0).as("__u"))
        .filter(col("w") > 0)
        .withColumn("skey", round(pow(col("__u"), lit(1.0) / col("w")), 6))
        .select("doc_id", "w", "skey")
        .orderBy(col("skey").desc, col("doc_id"))
        .limit(20),
    Some("""
      WITH u AS (
        SELECT doc_id, len(string_split(text, ' ')) AS w,
               (CAST(list_reduce(list_prepend(0::HUGEINT, list_transform(range(1, 9),
                  c -> instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), c, 1)) - 1)),
                  (acc, dd) -> acc * 16 + dd) AS DOUBLE) + 0.5) / 4294967296.0 AS uu
        FROM documents),
      k AS (SELECT doc_id, CAST(w AS BIGINT) AS w, ROUND(POW(uu, 1.0 / w), 6) AS skey
            FROM u WHERE w > 0)
      SELECT doc_id, w, skey FROM k ORDER BY skey DESC, doc_id LIMIT 20"""))

  /** Salted equi-join (operators.Layout.saltedJoin): the skew-safe join —
    * the dim side replicates across the salt domain, every fact row
    * scatters uniformly, and no single reducer owns a hot key's whole
    * partition. Result is EXACTLY the plain join (the oracle), which is
    * the point: salting is a physical rewrite, not a semantic one. q74
    * is the aggregation analog. */
  val q108 = Q(
    "q108_salted_join",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_suppkey").as("s_suppkey"), col("l_extendedprice"))
      val sup = Tables.supplier(s, d).select("s_suppkey", "s_name")
      graft.operators.Layout.saltedJoin(li, sup, "s_suppkey", salts = 8)
        .groupBy("s_name")
        .agg(count(lit(1)).as("n"),
          dbl(sum(dec(col("l_extendedprice")))).as("sum_price"))
        .orderBy("s_name")
    },
    Some("""
      SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_name ORDER BY s_name"""))

  /** Deterministic stratified sampling — the training-mix rebalance:
    * per-stratum keep rates as pure md5-prefix predicates (en keeps
    * ~25%, every other language ~75%, evening out an English-heavy
    * corpus). Like q71/q103 there is no RNG state: the same documents
    * survive on any engine, partitioning, or run, so downstream joins
    * against the sample stay stable. Contrast sampleBy: seeded Bernoulli
    * over partition order — not reproducible across engines. */
  val q111 = Q(
    "q111_stratified_hash_sample",
    (s, d) =>
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"),
          count(when(substring(md5(col("doc_id").cast("string")), 1, 2) <
            when(col("lang") === "en", "40").otherwise("c0"), 1)).as("n_kept"))
        .orderBy("lang"),
    Some("""
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(COUNT(*) FILTER (WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
               CASE WHEN lang = 'en' THEN '40' ELSE 'c0' END) AS BIGINT) AS n_kept
      FROM documents GROUP BY lang ORDER BY lang"""))

  /** Time-series gap repair over a date spine: daily purchase totals with
    * a simulated outage (every day-of-month divisible by 3 dropped),
    * rebuilt by linear interpolation between the nearest observed
    * neighbors, forward-fill past the last observation. The q75 spine
    * join plus IGNORE NULLS window lookups — the standard feature-store /
    * metrics backfill op. The interpolation divides identical decimal-
    * exact doubles in both engines, so the 4 dp round is stable. Global
    * 30-row window: single-partition by design at daily granularity. */
  val q112 = Q(
    "q112_gap_interpolate",
    (s, d) => {
      val ev = Tables.events(s, d).filter(col("event_type") === "purchase")
      val obs = ev
        .filter(dayofmonth(col("ts")) % 3 =!= 0)
        .groupBy(date_trunc("day", col("ts")).as("d"))
        .agg(dbl(sum(dec(col("value")))).as("v"))
      val spine = ev
        .agg(date_trunc("day", min(col("ts"))).as("lo"),
          date_trunc("day", max(col("ts"))).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 day"))).as("d"))
      val before = Window.orderBy("dn").rowsBetween(Window.unboundedPreceding, -1)
      val after = Window.orderBy("dn").rowsBetween(1, Window.unboundedFollowing)
      spine.join(obs, Seq("d"), "left")
        .withColumn("dn", datediff(col("d"), to_date(lit("1970-01-01"))))
        .withColumn("pdn",
          last(when(col("v").isNotNull, col("dn")), ignoreNulls = true).over(before))
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(before))
        .withColumn("ndn",
          first(when(col("v").isNotNull, col("dn")), ignoreNulls = true).over(after))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(after))
        .select(
          date_format(col("d"), "yyyy-MM-dd").as("day"),
          round(
            when(col("v").isNotNull, col("v"))
              .when(col("pv").isNotNull && col("nv").isNotNull,
                col("pv") + (col("nv") - col("pv")) *
                  (col("dn") - col("pdn")).cast("double") /
                  (col("ndn") - col("pdn")).cast("double"))
              .when(col("pv").isNotNull, col("pv"))
              .otherwise(col("nv")), 4).as("filled"),
          when(col("v").isNotNull, "obs")
            .when(col("pv").isNotNull && col("nv").isNotNull, "interp")
            .when(col("pv").isNotNull, "ffill")
            .otherwise("bfill").as("src"))
        .orderBy("day")
    },
    Some("""
      WITH obs AS (
        SELECT date_trunc('day', ts) AS d,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        FROM events WHERE event_type = 'purchase'
          AND day(CAST(ts AS DATE)) % 3 <> 0
        GROUP BY 1),
      bounds AS (SELECT date_trunc('day', MIN(ts)) AS lo, date_trunc('day', MAX(ts)) AS hi
                 FROM events WHERE event_type = 'purchase'),
      spine AS (SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS d FROM bounds),
      j AS (SELECT s.d, o.v, date_diff('day', DATE '1970-01-01', CAST(s.d AS DATE)) AS dn
            FROM spine s LEFT JOIN obs o USING (d)),
      w AS (SELECT d, dn, v,
              LAST_VALUE(CASE WHEN v IS NOT NULL THEN dn END IGNORE NULLS)
                OVER (ORDER BY dn ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pdn,
              LAST_VALUE(v IGNORE NULLS)
                OVER (ORDER BY dn ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
              FIRST_VALUE(CASE WHEN v IS NOT NULL THEN dn END IGNORE NULLS)
                OVER (ORDER BY dn ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS ndn,
              FIRST_VALUE(v IGNORE NULLS)
                OVER (ORDER BY dn ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv
            FROM j)
      SELECT strftime(d, '%Y-%m-%d') AS day,
             ROUND(CASE WHEN v IS NOT NULL THEN v
                        WHEN pv IS NOT NULL AND nv IS NOT NULL
                          THEN pv + (nv - pv) * (dn - pdn) / (ndn - pdn)
                        WHEN pv IS NOT NULL THEN pv ELSE nv END, 4) AS filled,
             CASE WHEN v IS NOT NULL THEN 'obs'
                  WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
                  WHEN pv IS NOT NULL THEN 'ffill' ELSE 'bfill' END AS src
      FROM w ORDER BY day"""))

  /** Bloom-pruned dimension join (operators.Layout.bloomPrunedJoin):
    * a driver-built Bloom filter over the (sparse) dim keys pre-filters
    * the fact side map-side before the exact join, so only ~matching
    * rows reach the exchange — the reusable-runtime-filter pattern for
    * repeated joins against one dimension. The oracle is the PLAIN
    * join: the physical rewrite must be semantically invisible (false
    * positives die in the exact join). */
  val q137 = Q(
    "q137_bloom_join",
    (s, d) => {
      val fact = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"))
      val dim = Tables.orders(s, d)
        .filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.operators.Layout
        .bloomPrunedJoin(fact, dim, "l_orderkey", expectedItems = 100000)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          dbl(sum(dec(col("l_extendedprice")))).as("sum_price"))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderkey % 100 = 0
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Count-Min-sketch heavy hitters over the corpus token stream —
    * the streaming-safe frequency estimator (mergeable fixed-width
    * state) next to q46's HLL and q101's t-digest. The sketch is built
    * by Spark's `count_min_sketch` aggregate (eps 1e-4, confidence
    * 0.999, seed 42 — deterministic cells for a fixed seed); the top-20
    * exact tokens are then probed through [[graft.functions.CmsProbe]]
    * and checked against the CMS contract: estimates never undercount,
    * and overcount by at most eps * stream length. Engines' sketches
    * differ, so the bound is the cross-engine contract (q46 pattern);
    * the exact counts anchor the hash compare. */
  val q143 = Q(
    "q143_cms_heavy_hitters",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val sk = toks.agg(
        expr("count_min_sketch(tok, CAST(0.0001 AS DOUBLE), CAST(0.999 AS DOUBLE), 42)").as("sk"),
        count(lit(1)).as("n_stream"))
      val top = toks.groupBy("tok").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("tok"))
        .limit(20)
      top.crossJoin(broadcast(sk))
        .withColumn("est", graft.functions.sketch.cmsProbe(col("sk"), col("tok")))
        .select(col("tok"), col("n_exact"),
          (col("est") >= col("n_exact")).as("no_undercount"),
          (col("est") <= col("n_exact") + ceil(col("n_stream") * 0.0001)).as("within_eps"))
        .orderBy(col("n_exact").desc, col("tok"))
    },
    Some("""
      WITH toks AS (SELECT UNNEST(string_split(lower(text), ' ')) AS tok FROM documents),
      t AS (SELECT tok, COUNT(*) AS n_exact FROM toks WHERE tok <> '' GROUP BY tok)
      SELECT tok, n_exact, TRUE AS no_undercount, TRUE AS within_eps
      FROM t ORDER BY n_exact DESC, tok LIMIT 20"""))

  /** GPT-style sequence packing (CorpusPipeline.packSequences): the
    * corpus concatenates into one token stream (doc_id order) and
    * chunks into 2048-token training sequences, documents spanning
    * boundaries — the packing step proper, where q90 is the
    * keep-docs-whole binning prep. The Spark side is a distributed
    * exclusive prefix sum (range partition → per-partition totals →
    * driver fold → per-partition window + broadcast offsets); the
    * oracle replays it as the global window Spark must never run. */
  val q202 = Q(
    "q202_pack_sequences",
    (s, d) =>
      CorpusPipeline.packSequences(Tables.documents(s, d),
          orderCol = "doc_id", text = "text", seqLen = 2048)
        .select("doc_id", "n_tokens", "first_seq", "last_seq", "n_seqs",
          "seq_offset")
        .orderBy("doc_id"),
    Some("""
      WITH d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                 FROM documents),
      c AS (SELECT doc_id, n_tokens,
                   SUM(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS s
            FROM d)
      SELECT doc_id, n_tokens,
             CAST(s // 2048 AS BIGINT) AS first_seq,
             CAST((s + n_tokens - 1) // 2048 AS BIGINT) AS last_seq,
             CAST((s + n_tokens - 1) // 2048 - s // 2048 + 1 AS BIGINT) AS n_seqs,
             CAST(s % 2048 AS BIGINT) AS seq_offset
      FROM c ORDER BY doc_id"""))

  /** Epoch-mix materialization (CorpusPipeline.materializeMix): per-
    * source epoch factors expand the corpus into the literal training
    * stream — floor(e) full copies per doc plus a deterministic
    * md5-fraction extra for frac(e), unlisted sources dropped, and an
    * order_key = md5(id:copy) whose sort IS the reproducible training
    * shuffle. Exactly the q92 mix arithmetic made physical. */
  val q203 = Q(
    "q203_materialize_mix",
    (s, d) =>
      CorpusPipeline.materializeMix(Tables.documents(s, d),
          id = "doc_id", stratum = "source",
          epochs = Map("src0" -> 2.5, "src3" -> 0.25, "src7" -> 1.0,
            "src9" -> 0.0, "src12" -> 0.5, "src17" -> 3.0))
        .select("source", "doc_id", "copy", "order_key")
        .orderBy("order_key", "doc_id", "copy"),
    Some("""
      WITH e(source, e) AS (VALUES ('src0', 2.5), ('src3', 0.25), ('src7', 1.0),
                                   ('src9', 0.0), ('src12', 0.5), ('src17', 3.0)),
      d AS (SELECT doc_id, dd.source, e.e,
                   (CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE) + 0.5)
                     / 4294967296.0 AS u
            FROM documents dd JOIN e USING (source)),
      c AS (SELECT doc_id, source,
                   CAST(FLOOR(e) AS BIGINT)
                     + CASE WHEN u < e - FLOOR(e) THEN 1 ELSE 0 END AS n
            FROM d)
      SELECT source, doc_id, CAST(g.copy AS BIGINT) AS copy,
             md5(CAST(doc_id AS VARCHAR) || ':' || CAST(g.copy AS VARCHAR)) AS order_key
      FROM c, LATERAL (SELECT UNNEST(range(0, n)) AS copy) g
      ORDER BY order_key, doc_id, copy"""))

  /** Tokenizer-ready shard export, manifest face
    * (CorpusPipeline.tokenShardStream + tokenShardManifest): the
    * q203 mix assigned to 8 shards by order_key hash and packed into
    * 1024-token sequences PER SHARD, summarized as the manifest a
    * training run verifies — counts plus BOTH order-sensitive
    * fingerprints of each shard's training order: the md5 concat and
    * the bounded-state position-weighted checksum (shard_fp_pos, the
    * one to trust when a shard may exceed an executor). The oracle
    * replays mix → shard → per-shard pack in SQL, fingerprints with an
    * ordered string_agg (≡ Spark's sorted-array concat, since the
    * stream order IS the order_key order) and folds the same
    * md5₃₂·pos sum mod 2⁶¹−1. */
  val q204 = Q(
    "q204_token_shard_manifest",
    (s, d) =>
      CorpusPipeline.tokenShardManifest(
        CorpusPipeline.tokenShardStream(Tables.documents(s, d),
          id = "doc_id", stratum = "source", text = "text",
          epochs = Map("src0" -> 2.5, "src3" -> 0.25, "src7" -> 1.0,
            "src9" -> 0.0, "src12" -> 0.5, "src17" -> 3.0),
          numShards = 8, seqLen = 1024),
        seqLen = 1024)
        .orderBy("shard"),
    Some("""
      WITH e(source, e) AS (VALUES ('src0', 2.5), ('src3', 0.25), ('src7', 1.0),
                                   ('src9', 0.0), ('src12', 0.5), ('src17', 3.0)),
      d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, e.e,
                   (CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE) + 0.5)
                     / 4294967296.0 AS u
            FROM documents dd JOIN e USING (source)),
      c AS (SELECT doc_id, n_tokens,
                   CAST(FLOOR(e) AS BIGINT)
                     + CASE WHEN u < e - FLOOR(e) THEN 1 ELSE 0 END AS n
            FROM d),
      m AS (SELECT doc_id, n_tokens,
                   md5(CAST(doc_id AS VARCHAR) || ':' || CAST(g.copy AS VARCHAR)) AS order_key
            FROM c, LATERAL (SELECT UNNEST(range(0, n)) AS copy) g),
      sh AS (SELECT CAST(CAST('0x' || substr(order_key, 1, 8) AS BIGINT) % 8 AS BIGINT) AS shard,
                    order_key, n_tokens FROM m),
      w AS (SELECT shard, order_key, n_tokens,
                   ROW_NUMBER() OVER (PARTITION BY shard ORDER BY order_key) AS pos
            FROM sh)
      SELECT shard, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             CAST((SUM(n_tokens) + 1023) // 1024 AS BIGINT) AS n_seqs,
             md5(string_agg(order_key, '' ORDER BY order_key)) AS shard_fp,
             CAST(SUM((CAST('0x' || substr(md5(order_key), 1, 8) AS BIGINT) % 2147483647)
                      * (pos % 2147483647)) % 2305843009213693951 AS BIGINT) AS shard_fp_pos
      FROM w GROUP BY shard ORDER BY shard"""))

  /** Shard-export stream face: the per-(doc, copy) span columns of
    * [[q204]]'s stream — every row's shard, training position and
    * sequence span, hash-compared end to end (the manifest pins the
    * aggregate; this pins every individual packing decision). */
  val q205 = Q(
    "q205_token_shard_spans",
    (s, d) =>
      CorpusPipeline.tokenShardStream(Tables.documents(s, d),
          id = "doc_id", stratum = "source", text = "text",
          epochs = Map("src0" -> 2.5, "src3" -> 0.25, "src7" -> 1.0,
            "src9" -> 0.0, "src12" -> 0.5, "src17" -> 3.0),
          numShards = 8, seqLen = 1024)
        .select("shard", "order_key", "doc_id", "copy", "n_tokens",
          "first_seq", "last_seq", "n_seqs", "seq_offset")
        .orderBy("shard", "order_key"),
    Some("""
      WITH e(source, e) AS (VALUES ('src0', 2.5), ('src3', 0.25), ('src7', 1.0),
                                   ('src9', 0.0), ('src12', 0.5), ('src17', 3.0)),
      d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, e.e,
                   (CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE) + 0.5)
                     / 4294967296.0 AS u
            FROM documents dd JOIN e USING (source)),
      c AS (SELECT doc_id, n_tokens,
                   CAST(FLOOR(e) AS BIGINT)
                     + CASE WHEN u < e - FLOOR(e) THEN 1 ELSE 0 END AS n
            FROM d),
      m AS (SELECT doc_id, n_tokens, CAST(g.copy AS BIGINT) AS copy,
                   md5(CAST(doc_id AS VARCHAR) || ':' || CAST(g.copy AS VARCHAR)) AS order_key
            FROM c, LATERAL (SELECT UNNEST(range(0, n)) AS copy) g),
      sh AS (SELECT CAST(CAST('0x' || substr(order_key, 1, 8) AS BIGINT) % 8 AS BIGINT) AS shard,
                    order_key, doc_id, copy, n_tokens FROM m),
      w AS (SELECT shard, order_key, doc_id, copy, n_tokens,
                   SUM(n_tokens) OVER (PARTITION BY shard ORDER BY order_key
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS st
            FROM sh)
      SELECT shard, order_key, doc_id, copy, n_tokens,
             CAST(st // 1024 AS BIGINT) AS first_seq,
             CAST((st + n_tokens - 1) // 1024 AS BIGINT) AS last_seq,
             CAST((st + n_tokens - 1) // 1024 - st // 1024 + 1 AS BIGINT) AS n_seqs,
             CAST(st % 1024 AS BIGINT) AS seq_offset
      FROM w ORDER BY shard, order_key"""))

  def all: Seq[Q] = Seq(q71, q72, q73, q74, q75, q76, q77, q78, q79, q80,
    q90, q91, q92, q100, q101, q102, q103, q108, q111, q112, q137, q143,
    q153, q154, q183, q188, q202, q203, q204, q205)
}

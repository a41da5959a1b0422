package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Near-duplicate detection over `documents` — the training-data-pipeline
  * dedup family: MinHash+LSH, SimHash, exact n-gram Jaccard.
  *
  * Engine-parity design: every pseudo-random hash derives from md5 over an
  * explicit string (identical hex in Spark and DuckDB); derived integers use
  * mod-2^64 arithmetic that DuckDB mirrors with HUGEINT, emitted as
  * fixed-width strings so MIN/equality agree across engines; and all scores
  * are exact-integer ratios divided once in double — so the DuckDB oracle
  * can mirror the *entire* pipeline, not just a summary.
  *
  * Scale notes (100 TB):
  *  - The MinHash pipeline is linear in corpus size until the band-bucket
  *    self-join, which only explodes where buckets collide — i.e. on the
  *    near-duplicate mass itself. Shuffle keys are fixed-width hex
  *    signatures, never raw text.
  *  - Verification joins only candidate pairs back to their shingle sets
  *    (a semi-join-shaped plan), so the quadratic stage touches
  *    |candidates|, not |corpus|².
  *  - SimHash is one linear pass ending in a 16-hex signature per doc —
  *    grouping/partitioning then operates on 8-byte keys.
  *  - The exact Jaccard join (q38) is the honest baseline: it blows up on
  *    common shingles and is kept only as the ground-truth reference for
  *    the LSH path.
  */
object DedupQueries {

  /** word n-gram shingles of `toks` joined by single spaces. */
  private def shingleExpr(n: Int): Column =
    expr(s"transform(sequence(0, size(toks) - $n), i -> array_join(slice(toks, i + 1, $n), ' '))")

  /** (doc_id, sh) distinct word-n-gram shingle pairs, shingles collapsed
    * to 64-bit md5 halves so the all-pairs join shuffles 8-byte keys —
    * counts (and so Jaccard) are unchanged modulo md5 collisions, which
    * the oracle hash-compare would surface. */
  private def shingles(s: SparkSession, d: String, n: Int): DataFrame =
    Tables.documents(s, d)
      // spread the corpus BEFORE the CPU-bound explode+md5: a small
      // single-split parquet otherwise runs the whole shingling on one
      // core (harmless at real scale, where the scan has many splits)
      .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(shingleExpr(n)).as("__sh"))
      .select(col("doc_id"),
        graft.functions.TextHashAggregators.md5Half(col("__sh")).as("sh"))
      .distinct()

  private val ShingleN = 4 // shingle width for the MinHash pipeline
  private val K = 16       // minhash functions
  private val Bands = 4    // LSH bands of K/Bands rows each

  /** The MinHash+LSH candidate/verification CTE chain (everything up to
    * per-pair intersection counts) over the relation `src(doc_id, text)`,
    * shared by q36 (verified pairs), q51 (transitive clusters) and q55
    * (curation, where it runs on quality/exact-dedup survivors). No
    * leading WITH: q51/q55 need `WITH RECURSIVE`. */
  private def nearDupCtes(src: String): String = s"""
      t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM $src),
      tf AS (SELECT doc_id, toks FROM t WHERE len(toks) >= $ShingleN),
      sh AS (SELECT DISTINCT doc_id, array_to_string(toks[i+1:i+$ShingleN], ' ') AS sh
             FROM tf, LATERAL (SELECT UNNEST(range(0, len(toks) - ${ShingleN - 1})) AS i) g),
      hx AS (SELECT doc_id, md5(sh) AS h FROM sh),
      ab AS (SELECT doc_id,
                    list_reduce(list_prepend(0::HUGEINT, list_transform(range(1, 17),
                      j -> instr('0123456789abcdef', substr(h, j, 1)) - 1)),
                      (acc, d) -> acc * 16 + d) AS a,
                    list_reduce(list_prepend(0::HUGEINT, list_transform(range(17, 33),
                      j -> instr('0123456789abcdef', substr(h, j, 1)) - 1)),
                      (acc, d) -> acc * 16 + d) AS b
             FROM hx),
      minh AS (SELECT doc_id, i,
                      MIN((a + i * b) % 18446744073709551616) AS minv
               FROM ab, (SELECT UNNEST(range(0, $K)) AS i) ii
               GROUP BY doc_id, i),
      bands AS (SELECT doc_id, i // ${K / Bands} AS band,
                       string_agg(lpad(CAST(minv AS VARCHAR), 20, '0'), '|' ORDER BY i) AS sig
                FROM minh GROUP BY doc_id, i // ${K / Bands}),
      cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
               FROM bands a JOIN bands b
                 ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      inter AS (SELECT c.da, c.db, COUNT(*) AS inter
                FROM cand c
                JOIN sh x ON x.doc_id = c.da
                JOIN sh y ON y.doc_id = c.db AND y.sh = x.sh
                GROUP BY c.da, c.db)"""

  /** MinHash + LSH near-dup pairs, verified with exact Jaccard >= 0.5.
    *
    * shingle -> one md5 -> K double-hashed minhashes ((a + i*b) mod 2^64
    * over the digest halves, emitted as 20-digit zero-padded unsigned
    * decimal so string MIN == unsigned numeric MIN in both engines) ->
    * 4 bands of 4 -> band-signature self-join for candidates -> exact
    * Jaccard verification. Pairs whose banded signatures never collide
    * are (by LSH design) not reported, even if their true Jaccard passes
    * the threshold.
    */
  val q36 = Q(
    "q36_minhash_lsh_pairs",
    (s, d) => {
      // repartition: the synthetic corpus is one small parquet file (one
      // input split); the signature UDF is CPU-bound, so spread it across
      // cores — at real scale the scan already has that many splits
      val docs = Tables.documents(s, d)
        .transform(Tables.spread("doc_id"))
      graft.operators.Dedup
        .minHashLshPairs(docs, "doc_id", "text",
          n = ShingleN, k = K, bands = Bands, threshold = 0.5)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""
      WITH ${nearDupCtes("documents")}
      SELECT i.da AS doc_a, i.db AS doc_b,
             ROUND(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 4) AS jaccard
      FROM inter i
      JOIN sizes sa ON i.da = sa.doc_id
      JOIN sizes sb ON i.db = sb.doc_id
      WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5
      ORDER BY doc_a, doc_b"""))

  /** Transitive near-duplicate clusters over the q36 pair graph: every
    * doc in a verified pair labeled with the smallest doc_id reachable
    * through pairs (the cluster representative a keep-one-per-cluster
    * dedup pass would retain). Spark side: iterative min-label
    * propagation (operators.Dedup.duplicateClusters); oracle side: a
    * recursive-CTE transitive closure over the same verified pairs. */
  val q51 = Q(
    "q51_dup_clusters",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .transform(Tables.spread("doc_id"))
      val pairs = graft.operators.Dedup
        .minHashLshPairs(docs, "doc_id", "text",
          n = ShingleN, k = K, bands = Bands, threshold = 0.5)
        .select("id_a", "id_b")
      graft.operators.Dedup.duplicateClusters(pairs)
        .select(col("id").as("doc_id"), col("cluster"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH RECURSIVE ${nearDupCtes("documents")},
      verified AS (SELECT i.da, i.db
                   FROM inter i
                   JOIN sizes sa ON i.da = sa.doc_id
                   JOIN sizes sb ON i.db = sb.doc_id
                   WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5),
      edges AS (SELECT da AS a, db AS b FROM verified
                UNION SELECT db, da FROM verified),
      reach AS (SELECT a, b FROM edges
                UNION
                SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
      SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster
      FROM reach GROUP BY a ORDER BY doc_id"""))

  /** Full corpus-curation pass (operators.CorpusPipeline.curate): quality
    * gate (10..100000 tokens) → keep-first exact dedup → transitive
    * MinHash-LSH near-dedup (clusters keep their lowest id) → annotate
    * survivors with content fingerprint + token count. The oracle mirrors
    * every stage, with the LSH chain running on the quality/exact
    * survivors exactly as the pipeline composes it. */
  val q55 = Q(
    "q55_curate",
    (s, d) => {
      // no outer repartition here (unlike q36): the exact-dedup window
      // inside curate already shuffles the corpus across cores before
      // the CPU-bound LSH stage, and an extra exchange would be re-paid
      // by every audit count
      val docs = Tables.documents(s, d)
      // survivors-only face: the discarded Report's three counting jobs
      // (one a full corpus re-tokenize) are never run
      val out = graft.operators.CorpusPipeline
        .curateDocs(docs, "doc_id", "text", minTokens = 10, nearDupThreshold = 0.5)
      val res = out
        .select(col("doc_id"), col("fingerprint"),
          col("n_tokens").cast("long").as("n_tokens"))
        .orderBy("doc_id")
        .localCheckpoint(true) // materialize before freeing the pipeline's blocks
      graft.operators.Dedup.freeLocalCheckpoint(out)
      res
    },
    Some(s"""
      WITH RECURSIVE q AS (SELECT doc_id, text FROM documents
                           WHERE len(string_split(text, ' ')) BETWEEN 10 AND 100000),
      ex AS (SELECT doc_id, text FROM (
               SELECT doc_id, text, MIN(doc_id) OVER (PARTITION BY text) AS keeper
               FROM q) WHERE doc_id = keeper),
      ${nearDupCtes("ex")},
      verified AS (SELECT i.da, i.db
                   FROM inter i
                   JOIN sizes sa ON i.da = sa.doc_id
                   JOIN sizes sb ON i.db = sb.doc_id
                   WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5),
      edges AS (SELECT da AS a, db AS b FROM verified
                UNION SELECT db, da FROM verified),
      reach AS (SELECT a, b FROM edges
                UNION
                SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      losers AS (SELECT a AS doc_id FROM reach GROUP BY a
                 HAVING LEAST(a, MIN(b)) <> a)
      SELECT e.doc_id, md5(e.text) AS fingerprint,
             CAST(len(string_split(e.text, ' ')) AS BIGINT) AS n_tokens
      FROM ex e
      WHERE e.doc_id NOT IN (SELECT doc_id FROM losers)
      ORDER BY doc_id"""))

  /** 64-bit SimHash per document as a 16-hex-char signature.
    *
    * Per distinct token: md5 -> 16 hex digits -> 4 bits each. Signature
    * digit p = for each bit b, sign of sum over tokens of (+1 if bit set
    * else -1); ties (sum == 0) resolve to 0. All-integer math.
    */
  val q37 = Q(
    "q37_simhash",
    (s, d) =>
      graft.operators.Dedup
        .simHashSignatures(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
    Some("""
      WITH t AS (SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS toks
                 FROM documents),
      tk AS (SELECT doc_id, md5(tok) AS h
             FROM t, LATERAL (SELECT UNNEST(toks) AS tok) u),
      pos AS (SELECT doc_id,
                     instr('0123456789abcdef', substr(h, i, 1)) - 1 AS digit,
                     i AS p
              FROM tk, (SELECT UNNEST(range(1, 17)) AS i) ii),
      sums AS (SELECT doc_id, p,
                      SUM(CASE WHEN digit % 2 = 1 THEN 1 ELSE -1 END) AS s0,
                      SUM(CASE WHEN (digit // 2) % 2 = 1 THEN 1 ELSE -1 END) AS s1,
                      SUM(CASE WHEN (digit // 4) % 2 = 1 THEN 1 ELSE -1 END) AS s2,
                      SUM(CASE WHEN (digit // 8) % 2 = 1 THEN 1 ELSE -1 END) AS s3
               FROM pos GROUP BY doc_id, p),
      dg AS (SELECT doc_id, p,
                    substr('0123456789abcdef',
                      (CASE WHEN s0 > 0 THEN 1 ELSE 0 END) +
                      2 * (CASE WHEN s1 > 0 THEN 1 ELSE 0 END) +
                      4 * (CASE WHEN s2 > 0 THEN 1 ELSE 0 END) +
                      8 * (CASE WHEN s3 > 0 THEN 1 ELSE 0 END) + 1, 1) AS c
             FROM sums)
      SELECT doc_id, string_agg(c, '' ORDER BY p) AS simhash
      FROM dg GROUP BY doc_id ORDER BY doc_id"""))

  /** Exact word-5-gram Jaccard similarity join (>= 0.3) — the ground-truth
    * all-pairs baseline that the LSH path approximates. */
  val q38 = Q(
    "q38_ngram_jaccard",
    (s, d) => {
      // three consumers (two join sides + sizes): materialize once so
      // AQE's independent subtrees don't each re-shingle the corpus
      val sh = shingles(s, d, 5).localCheckpoint(true)
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.select(col("doc_id").as("da"), col("sh"))
        .join(sh.select(col("doc_id").as("db"), col("sh")), "sh")
        .filter(col("da") < col("db"))
        .groupBy("da", "db")
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), "da")
        .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), "db")
        .withColumn("jacc",
          col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
        .filter(col("jacc") >= 0.3)
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          round(col("jacc"), 4).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      tf AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 5),
      sh AS (SELECT DISTINCT doc_id, array_to_string(toks[i+1:i+5], ' ') AS sh
             FROM tf, LATERAL (SELECT UNNEST(range(0, len(toks) - 4)) AS i) g),
      sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      inter AS (SELECT x.doc_id AS da, y.doc_id AS db, COUNT(*) AS inter
                FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
                GROUP BY 1, 2)
      SELECT i.da AS doc_a, i.db AS doc_b,
             ROUND(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 4) AS jaccard
      FROM inter i
      JOIN sizes sa ON i.da = sa.doc_id
      JOIN sizes sb ON i.db = sb.doc_id
      WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.3
      ORDER BY doc_a, doc_b"""))

  /** Winnowing document fingerprints (the MOSS scheme): hash every
    * 4-gram shingle, slide a window of 5 consecutive shingle hashes,
    * keep each window's minimum — a document's fingerprint set is the
    * distinct selected hashes. Guarantees any shared run of
    * window+shingle-1 tokens between two documents shares a
    * fingerprint, at ~1/window the storage of the full shingle set.
    * Output: per-doc fingerprint count + the lexicographic first
    * fingerprint (stable summary of the set).
    */
  val q45 = Q(
    "q45_winnowing",
    (s, d) =>
      graft.operators.Dedup
        .winnowingFingerprints(Tables.documents(s, d), "doc_id", "text",
          n = ShingleN, window = 5)
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_fps"),
          min(col("fp")).as("first_fp"))
        .orderBy("doc_id"),
    Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      tf AS (SELECT doc_id, toks FROM t WHERE len(toks) >= $ShingleN),
      sh AS (SELECT doc_id, i AS pos,
                    md5(array_to_string(toks[i+1:i+$ShingleN], ' ')) AS h
             FROM tf, LATERAL (SELECT UNNEST(range(0, len(toks) - ${ShingleN - 1})) AS i) g),
      wm AS (SELECT doc_id, pos,
                    MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS wmin,
                    COUNT(*) OVER (PARTITION BY doc_id) AS nsh
             FROM sh)
      SELECT doc_id,
             COUNT(DISTINCT wmin) AS n_fps,
             MIN(wmin) AS first_fp
      FROM wm WHERE pos >= 4 OR (nsh < 5 AND pos = nsh - 1)
      GROUP BY doc_id ORDER BY doc_id"""))

  /** Containment detection via winnowing fingerprints: documents sharing
    * selected hashes — catches partial copies (a paragraph lifted into a
    * larger doc) that whole-document Jaccard dilutes away. The join key
    * is a 32-hex fingerprint, and each doc contributes ~1/window of its
    * shingles, so the pair join touches a fraction of what the exact
    * shingle join (q38) does. */
  val q47 = Q(
    "q47_winnow_containment",
    (s, d) => {
      // one (fp → doc list) groupBy with in-bucket pair expansion
      // replaces the fp self-join: the fingerprint frame is referenced
      // ONCE (no materialization needed), each shared fp contributes
      // one count to each of its bucket's i<j pairs, and the quadratic
      // mass stays bounded by fp-collision bucket size — the same
      // shape Dedup.minHashLshPairs uses for LSH buckets
      graft.operators.Dedup
        .winnowingFingerprints(Tables.documents(s, d), "doc_id", "text",
          n = ShingleN, window = 5)
        .groupBy("fp")
        .agg(collect_list(col("doc_id")).as("__ids"))
        .filter(size(col("__ids")) > 1)
        .select(explode(graft.operators.Dedup
          .bucketPairs("__ids", "doc_a", "doc_b")).as("__p"))
        .select(col("__p.doc_a").as("doc_a"), col("__p.doc_b").as("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("shared_fps"))
        .filter(col("shared_fps") >= 3)
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      tf AS (SELECT doc_id, toks FROM t WHERE len(toks) >= $ShingleN),
      sh AS (SELECT doc_id, i AS pos,
                    md5(array_to_string(toks[i+1:i+$ShingleN], ' ')) AS h
             FROM tf, LATERAL (SELECT UNNEST(range(0, len(toks) - ${ShingleN - 1})) AS i) g),
      wm AS (SELECT doc_id, pos,
                    MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS wmin,
                    COUNT(*) OVER (PARTITION BY doc_id) AS nsh
             FROM sh),
      fps AS (SELECT DISTINCT doc_id, wmin AS fp
              FROM wm WHERE pos >= 4 OR (nsh < 5 AND pos = nsh - 1))
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared_fps
      FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING COUNT(*) >= 3
      ORDER BY doc_a, doc_b"""))

  /** Cluster-representative selection — the step after q51's transitive
    * clustering that an actual dedup pipeline runs: keep ONE document
    * per duplicate cluster, chosen by a quality criterion (longest
    * n_chars, ties to the lowest doc_id). The winner is picked by
    * max_by over a packed integer key (n_chars·10^7 + inverted id), so
    * the arg-max is deterministic on both engines; the oracle ranks
    * with a window over the same recursive-CTE clusters. */
  val q134 = Q(
    "q134_cluster_reps",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .transform(Tables.spread("doc_id"))
      val pairs = graft.operators.Dedup
        .minHashLshPairs(docs, "doc_id", "text",
          n = ShingleN, k = K, bands = Bands, threshold = 0.5)
        .select("id_a", "id_b")
      val clusters = graft.operators.Dedup.duplicateClusters(pairs)
        .select(col("id").as("doc_id"), col("cluster"))
      clusters
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .groupBy("cluster")
        .agg(
          max_by(col("doc_id"),
            col("n_chars") * 10000000L + (lit(9999999L) - col("doc_id"))).as("rep_doc"),
          count(lit(1)).as("cluster_size"),
          max("n_chars").as("rep_chars"))
        .orderBy("cluster")
    },
    Some(s"""
      WITH RECURSIVE ${nearDupCtes("documents")},
      verified AS (SELECT i.da, i.db
                   FROM inter i
                   JOIN sizes sa ON i.da = sa.doc_id
                   JOIN sizes sb ON i.db = sb.doc_id
                   WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5),
      edges AS (SELECT da AS a, db AS b FROM verified
                UNION SELECT db, da FROM verified),
      reach AS (SELECT a, b FROM edges
                UNION
                SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      members AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster
                  FROM reach GROUP BY a),
      ranked AS (SELECT m.cluster, m.doc_id, d.n_chars,
                        ROW_NUMBER() OVER (PARTITION BY m.cluster
                          ORDER BY d.n_chars DESC, m.doc_id) AS rn
                 FROM members m JOIN documents d ON d.doc_id = m.doc_id)
      SELECT cluster,
             MIN(CASE WHEN rn = 1 THEN doc_id END) AS rep_doc,
             CAST(COUNT(*) AS BIGINT) AS cluster_size,
             CAST(MAX(n_chars) AS BIGINT) AS rep_chars
      FROM ranked GROUP BY cluster ORDER BY cluster"""))

  /** Near-dup pair rate BY SOURCE pair — the curation-analytics view a
    * data team actually reads: which source combinations generate the
    * duplicate mass (mirror sites, cross-posted content). Reuses the
    * verified q36 pair graph, joins doc metadata onto both endpoints,
    * normalizes the source pair alphabetically, and counts. The join is
    * pair-bounded (collision-sized), never corpus². */
  val q145 = Q(
    "q145_neardup_by_source",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .transform(Tables.spread("doc_id"))
      val pairs = graft.operators.Dedup
        .minHashLshPairs(docs, "doc_id", "text",
          n = ShingleN, k = K, bands = Bands, threshold = 0.5)
      val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("id_a"), col("source").as("__sa")), "id_a")
        .join(src.select(col("doc_id").as("id_b"), col("source").as("__sb")), "id_b")
        .groupBy(least(col("__sa"), col("__sb")).as("source_x"),
          greatest(col("__sa"), col("__sb")).as("source_y"))
        .agg(count(lit(1)).as("n_pairs"),
          round(avg("jaccard"), 4).as("avg_jaccard"))
        .orderBy("source_x", "source_y")
    },
    Some(s"""
      WITH ${nearDupCtes("documents")},
      verified AS (SELECT i.da, i.db,
                          CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) AS jaccard
                   FROM inter i
                   JOIN sizes sa ON i.da = sa.doc_id
                   JOIN sizes sb ON i.db = sb.doc_id
                   WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5)
      SELECT LEAST(da_s.source, db_s.source) AS source_x,
             GREATEST(da_s.source, db_s.source) AS source_y,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             ROUND(AVG(v.jaccard), 4) AS avg_jaccard
      FROM verified v
      JOIN documents da_s ON da_s.doc_id = v.da
      JOIN documents db_s ON db_s.doc_id = v.db
      GROUP BY 1, 2 ORDER BY source_x, source_y"""))

  /** Paragraph-level near-dedup: split documents into 20-token chunks,
    * run the SAME MinHash+LSH pipeline over chunks (chunk id =
    * doc_id·10^9 + chunk_idx — 10^9 bounds docs at 20B tokens before a
    * collision, vs ~2M for a 100k multiplier), keep cross-document
    * chunk pairs ≥ 0.7,
    * and report per document pair the count of near-dup chunks and the
    * strongest match. Catches partial-copy/boilerplate overlap that
    * whole-document Jaccard dilutes below its threshold — the
    * sub-document analog of q36, and the fuzzy counterpart of q77's
    * exact chunk dedup. The oracle mirrors the ENTIRE chunk+LSH chain
    * (nearDupCtes over the chunk relation), so candidate recall is
    * engine-identical by construction. */
  val q146 = Q(
    "q146_chunk_neardup",
    (s, d) => {
      val c = 20 // chunk width in tokens
      val chunks = Tables.documents(s, d)
        .transform(Tables.spread("doc_id"))
        .select(col("doc_id"), split(col("text"), " ").as("__toks"))
        .select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, (size(__toks) - 1) div $c), i -> array_join(slice(__toks, i * $c + 1, $c), ' '))")))
        .select((col("doc_id") * 1000000000L + col("pos")).as("cid"),
          col("col").as("text"))
      val pairs = graft.operators.Dedup
        .minHashLshPairs(chunks, "cid", "text",
          n = ShingleN, k = K, bands = Bands, threshold = 0.7)
        .withColumn("doc_a", floor(col("id_a") / 1000000000L).cast("long"))
        .withColumn("doc_b", floor(col("id_b") / 1000000000L).cast("long"))
        .filter(col("doc_a") =!= col("doc_b"))
      pairs.groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("n_chunk_pairs"),
          round(max("jaccard"), 4).as("max_jaccard"))
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""
      WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS toks0 FROM documents),
      chunks AS (SELECT doc_id * 1000000000 + i AS doc_id,
                        array_to_string(toks0[i*20+1:i*20+20], ' ') AS text
                 FROM t0, LATERAL (SELECT UNNEST(range(0, ((len(toks0)-1) // 20) + 1)) AS i) g),
      ${nearDupCtes("chunks")},
      verified AS (SELECT i.da, i.db,
                          CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) AS jaccard
                   FROM inter i
                   JOIN sizes sa ON i.da = sa.doc_id
                   JOIN sizes sb ON i.db = sb.doc_id
                   WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.7)
      SELECT da // 1000000000 AS doc_a, db // 1000000000 AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS n_chunk_pairs,
             ROUND(MAX(jaccard), 4) AS max_jaccard
      FROM verified
      WHERE da // 1000000000 <> db // 1000000000
      GROUP BY 1, 2 ORDER BY doc_a, doc_b"""))

  /** Exact shared-substring spans (suffix-array-style ESD, reformulated
    * as gram-hash buckets + gaps-and-islands — Dedup.exactSubstringSpans):
    * document pairs sharing a verbatim run of ≥ 12 tokens, with the
    * number of maximal shared spans and the longest one. The oracle
    * mirrors the whole chain: k-gram positions, cross-doc matches on the
    * gram, islands on the (pair, pos_a - pos_b) diagonal via the
    * pos-minus-row_number trick, span length = run + k - 1. Both engines
    * join grams on md5 (Spark folds it to 8-byte halves; counts agree
    * modulo collisions, which the hash-compare would surface). */
  val q151 = Q(
    "q151_exact_substring_spans",
    (s, d) =>
      graft.operators.Dedup
        .exactSubstringSpans(Tables.documents(s, d), "doc_id", "text",
          k = 8, minSpanTokens = 12)
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("n_spans"),
          max("span_tokens").as("max_span"))
        .orderBy("doc_a", "doc_b"),
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      tf AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 8),
      g AS (SELECT doc_id, i AS pos, md5(array_to_string(toks[i+1:i+8], ' ')) AS h
            FROM tf, LATERAL (SELECT UNNEST(range(0, len(toks) - 7)) AS i) gg),
      m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb
            FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id),
      isl AS (SELECT doc_a, doc_b, pa - pb AS diag, pa,
                     pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, pa - pb
                                             ORDER BY pa) AS grp
              FROM m),
      spans AS (SELECT doc_a, doc_b, COUNT(*) + 7 AS span_tokens
                FROM isl GROUP BY doc_a, doc_b, diag, grp)
      SELECT doc_a, doc_b,
             CAST(COUNT(*) AS BIGINT) AS n_spans,
             CAST(MAX(span_tokens) AS BIGINT) AS max_span
      FROM spans WHERE span_tokens >= 12
      GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b"""))

  /** The removal step of exact-substring dedup (Dedup.stripSharedSpans):
    * every shared ≥12-token span masked out of the LATER document of its
    * pair, keep-first at token granularity. Output per document: md5 of
    * the cleaned text (so the compare stays fixed-width) and tokens
    * removed. The oracle rebuilds the cleaned text by anti-joining token
    * positions against the same span-derived position mask. */
  val q152 = Q(
    "q152_substring_strip",
    (s, d) =>
      graft.operators.Dedup
        .stripSharedSpans(Tables.documents(s, d), "doc_id", "text",
          k = 8, minSpanTokens = 12)
        .select(col("doc_id"), md5(col("clean_text")).as("clean_fp"),
          col("n_removed"))
        .orderBy("doc_id"),
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      tf AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 8),
      g AS (SELECT doc_id, i AS pos, md5(array_to_string(toks[i+1:i+8], ' ')) AS h
            FROM tf, LATERAL (SELECT UNNEST(range(0, len(toks) - 7)) AS i) gg),
      m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb
            FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id),
      isl AS (SELECT doc_a, doc_b, pa - pb AS diag, pa, pb,
                     pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, pa - pb
                                             ORDER BY pa) AS grp
              FROM m),
      sp AS (SELECT doc_b, MIN(pb) AS start_b, COUNT(*) + 7 AS span_tokens
             FROM isl GROUP BY doc_a, doc_b, diag, grp),
      mask AS (SELECT DISTINCT doc_b AS doc_id, start_b + j AS pos
               FROM sp, LATERAL (SELECT UNNEST(range(0, span_tokens)) AS j) u
               WHERE span_tokens >= 12),
      toksu AS (SELECT doc_id, i AS pos, toks[i+1] AS tok
                FROM t, LATERAL (SELECT UNNEST(range(0, len(toks))) AS i) u),
      kept AS (SELECT tu.doc_id,
                      string_agg(tu.tok, ' ' ORDER BY tu.pos) AS clean_text,
                      COUNT(*) AS n_kept
               FROM toksu tu
               WHERE NOT EXISTS (SELECT 1 FROM mask mm
                                 WHERE mm.doc_id = tu.doc_id AND mm.pos = tu.pos)
               GROUP BY tu.doc_id)
      SELECT t.doc_id,
             md5(COALESCE(k.clean_text, '')) AS clean_fp,
             CAST(len(t.toks) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed
      FROM t LEFT JOIN kept k ON k.doc_id = t.doc_id
      ORDER BY t.doc_id"""))

  /** Fuzzy decontamination (operators.CorpusPipeline.decontaminateFuzzy):
    * train docs (doc_id % 10 <> 0) that are NEAR-duplicates of a bench
    * doc (% 10 = 0) — MinHash+LSH cross-frame candidates, exact-Jaccard
    * verified ≥ 0.5. The oracle replays the q36 hash chain over the
    * whole corpus (train ∪ bench IS `documents`) and keeps only pairs
    * straddling the split: within-bucket collision is symmetric, so the
    * cross-frame operator's candidate set equals the full chain's
    * candidates ∩ cross pairs — engine-identical, like q36/q146. */
  val q163 = Q(
    "q163_decontaminate_fuzzy",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .transform(Tables.spread("doc_id"))
      graft.operators.CorpusPipeline.decontaminateFuzzy(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", n = ShingleN, k = K, bands = Bands, threshold = 0.5)
        .orderBy("doc_id")
    },
    Some(s"""
      WITH ${nearDupCtes("documents")},
      x AS (SELECT i.da, i.db,
                   CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) AS j
            FROM inter i
            JOIN sizes sa ON i.da = sa.doc_id
            JOIN sizes sb ON i.db = sb.doc_id
            WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5
              AND ((i.da % 10 = 0) <> (i.db % 10 = 0))),
      hits AS (SELECT CASE WHEN da % 10 <> 0 THEN da ELSE db END AS doc_id,
                      CAST(COUNT(*) AS BIGINT) AS n_hits, MAX(j) AS mx
               FROM x GROUP BY 1),
      base AS (SELECT doc_id FROM documents
               WHERE doc_id % 10 <> 0
                 AND len(string_split(text, ' ')) >= $ShingleN)
      SELECT b.doc_id, COALESCE(h.n_hits, 0) AS n_hits,
             ROUND(COALESCE(h.mx, 0.0), 4) AS max_jaccard,
             COALESCE(h.n_hits, 0) > 0 AS contaminated
      FROM base b LEFT JOIN hits h ON b.doc_id = h.doc_id
      ORDER BY b.doc_id"""))

  /** Dedup-threshold tuning curve: the verified-Jaccard HISTOGRAM over
    * every LSH candidate pair (threshold 0 keeps them all), binned at
    * 0.05 with a cumulative pairs-at-or-above column — the one-pass
    * answer to "what does 0.5 vs 0.7 cost me?" before committing a
    * corpus-wide dedup threshold. Bin = floor(jaccard·20): an exact
    * integer ratio through identical IEEE ops in both engines. The
    * cumulative window runs over ≤ 21 bin rows. */
  val q166 = Q(
    "q166_jaccard_histogram",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
        .transform(Tables.spread("doc_id"))
      graft.operators.Dedup
        .minHashLshPairs(docs, "doc_id", "text",
          n = ShingleN, k = K, bands = Bands, threshold = 0.0)
        .select(floor(col("jaccard") * 20).cast("int").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n_pairs"))
        .withColumn("n_at_or_above",
          sum("n_pairs").over(Window.orderBy(col("bin").desc)))
        .select(round(col("bin") / 20.0, 2).as("bin_lo"),
          col("n_pairs"), col("n_at_or_above"))
        .orderBy("bin_lo")
    },
    Some(s"""
      WITH ${nearDupCtes("documents")},
      j AS (SELECT CAST(FLOOR(20 * CAST(i.inter AS DOUBLE)
                              / (sa.n + sb.n - i.inter)) AS INTEGER) AS bin
            FROM inter i
            JOIN sizes sa ON i.da = sa.doc_id
            JOIN sizes sb ON i.db = sb.doc_id),
      h AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM j GROUP BY bin)
      SELECT ROUND(bin / 20.0, 2) AS bin_lo, n_pairs,
             CAST(SUM(n_pairs) OVER (ORDER BY bin DESC) AS BIGINT) AS n_at_or_above
      FROM h ORDER BY bin_lo"""))

  /** Dup-graph shape QA: triangle count and transitivity over the
    * verified near-dup pair graph — cliques (transitive duplicate
    * groups) versus chains (A≈B≈C but A≉C, where keep-one-per-cluster
    * quietly drops non-duplicates). Wedges = Σ C(deg,2); transitivity =
    * 3·triangles / wedges. The pair graph is collision-bounded (tiny
    * next to the corpus), so the triangle join is pair-scale work:
    * edges ordered a<b, joined e1.b=e2.a, closed against the edge set.
    * All-integer output except the final ratio. */
  val q168 = Q(
    "q168_dup_triangles",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .transform(Tables.spread("doc_id"))
      val e = graft.operators.Dedup
        .minHashLshPairs(docs, "doc_id", "text",
          n = ShingleN, k = K, bands = Bands, threshold = 0.5)
        .select(col("id_a").as("a"), col("id_b").as("b")) // already a < b
      val tri = e.as("e1")
        .join(e.as("e2"), col("e1.b") === col("e2.a"))
        .join(e.as("e3"),
          col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
        .agg(count(lit(1)).as("triangles"))
      val wedges = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
        .agg(sum(col("deg") * (col("deg") - 1) / 2).as("wedges"),
          count(lit(1)).as("n_vertices"))
      e.agg(count(lit(1)).as("n_edges")).crossJoin(tri).crossJoin(wedges)
        .select(col("n_edges"), col("n_vertices"), col("triangles"),
          col("wedges").cast("long").as("wedges"),
          round(when(col("wedges") > 0,
            lit(3.0) * col("triangles") / col("wedges")).otherwise(lit(0.0)), 4)
            .as("transitivity"))
    },
    Some(s"""
      WITH ${nearDupCtes("documents")},
      e AS (SELECT i.da AS a, i.db AS b
            FROM inter i
            JOIN sizes sa ON i.da = sa.doc_id
            JOIN sizes sb ON i.db = sb.doc_id
            WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5),
      tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS triangles
              FROM e e1 JOIN e e2 ON e1.b = e2.a
                        JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b),
      w AS (SELECT CAST(SUM(deg * (deg - 1) / 2) AS BIGINT) AS wedges,
                   CAST(COUNT(*) AS BIGINT) AS n_vertices
            FROM (SELECT v, COUNT(*) AS deg FROM (
                    SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) u
                  GROUP BY v) dg),
      ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e)
      SELECT ne.n_edges, w.n_vertices, tri.triangles, w.wedges,
             ROUND(CASE WHEN w.wedges > 0
                        THEN 3.0 * tri.triangles / w.wedges ELSE 0.0 END, 4)
               AS transitivity
      FROM ne, tri, w"""))

  /** The incremental append path under the ORACLE (it was spec-only):
    * even doc_ids play the stored index, odd ids the newly ingested
    * batch; `incrementalLshPairs` must report exactly the full-corpus
    * pairs that touch a new doc (new↔old ∪ new↔new — old↔old pairs were
    * reported by "earlier batches"). Bucket keys are deterministic per
    * doc, so the incremental candidate set equals the full chain's
    * candidates minus old↔old — the oracle is the q36 chain filtered to
    * pairs with an odd endpoint. This is the 100 TB ingest path:
    * batch-proportional cost, oracle-verified output. */
  val q170 = Q(
    "q170_incremental_append",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .transform(Tables.spread("doc_id"))
      val oldIndex = graft.operators.Dedup.indexDocs(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        n = ShingleN, k = K)
      graft.operators.Dedup.incrementalLshPairs(
          oldIndex, docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
          n = ShingleN, k = K, bands = Bands, threshold = 0.5)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""
      WITH ${nearDupCtes("documents")}
      SELECT i.da AS doc_a, i.db AS doc_b,
             ROUND(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 4) AS jaccard
      FROM inter i
      JOIN sizes sa ON i.da = sa.doc_id
      JOIN sizes sb ON i.db = sb.doc_id
      WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5
        AND (i.da % 2 = 1 OR i.db % 2 = 1)
      ORDER BY doc_a, doc_b"""))

  /** Train/test split-leakage audit: assign every document to a split by
    * CONTENT hash (`CorpusPipeline.assignShards`, shard < 8 of 10 →
    * train — the deterministic-splitter device of q71/q154), then count
    * verified near-dup pairs (the q36 chain, jaccard ≥ 0.5) whose
    * endpoints land in DIFFERENT splits — eval leakage via
    * near-duplicates, the audit a corpus split must pass before held-out
    * loss means anything. (Content hashing guarantees EXACT duplicates
    * can never straddle the split; near-dups can, which is exactly what
    * this measures.) Output: pair counts per split pair, including the
    * leaking train↔test row. Scale shape: the pair frame is
    * collision-bounded (LSH); the split column is one narrow hash; the
    * metadata joins are q145's. */
  val q179 = Q(
    "q179_split_leakage",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .transform(Tables.spread("doc_id"))
      val pairs = graft.operators.Dedup
        .minHashLshPairs(docs, "doc_id", "text",
          n = ShingleN, k = K, bands = Bands, threshold = 0.5)
      val split = graft.operators.CorpusPipeline
        .assignShards(docs, "text", 10)
        .select(col("doc_id"),
          when(col("shard") < 8, lit("train")).otherwise(lit("test")).as("split"))
      pairs
        .join(split.select(col("doc_id").as("id_a"), col("split").as("__sa")), "id_a")
        .join(split.select(col("doc_id").as("id_b"), col("split").as("__sb")), "id_b")
        .groupBy(least(col("__sa"), col("__sb")).as("split_x"),
          greatest(col("__sa"), col("__sb")).as("split_y"))
        .agg(count(lit(1)).as("n_pairs"),
          round(max("jaccard"), 4).as("max_jaccard"))
        .orderBy("split_x", "split_y")
    },
    Some(s"""
      WITH ${nearDupCtes("documents")},
      verified AS (SELECT i.da, i.db,
                          CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) AS jaccard
                   FROM inter i
                   JOIN sizes sa ON i.da = sa.doc_id
                   JOIN sizes sb ON i.db = sb.doc_id
                   WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5),
      sp AS (SELECT doc_id,
                    CASE WHEN ('0x' || substr(md5(text), 1, 8))::BIGINT % 10 < 8
                         THEN 'train' ELSE 'test' END AS split
             FROM documents)
      SELECT LEAST(a.split, b.split) AS split_x,
             GREATEST(a.split, b.split) AS split_y,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             ROUND(MAX(v.jaccard), 4) AS max_jaccard
      FROM verified v
      JOIN sp a ON a.doc_id = v.da
      JOIN sp b ON b.doc_id = v.db
      GROUP BY 1, 2 ORDER BY split_x, split_y"""))

  /** Split-leakage REPAIR — q179's audit closed into a fix: any TRAIN
    * document near-duplicating a TEST document (the q36 verified-pair
    * chain across the content-hash split) is purged from train, the
    * standard decontamination direction (eval stays pristine, training
    * mass pays). Output: per split, docs before, docs dropped, docs
    * after — the before/after accounting a split build logs. Scale
    * shape: the leaked-id set is pair-bounded (LSH collisions), the
    * purge is one semi-join — nothing quadratic, nothing collected. */
  val q180 = Q(
    "q180_split_repair",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .transform(Tables.spread("doc_id"))
      val pairs = graft.operators.Dedup
        .minHashLshPairs(docs, "doc_id", "text",
          n = ShingleN, k = K, bands = Bands, threshold = 0.5)
      val split = graft.operators.CorpusPipeline
        .assignShards(docs, "text", 10)
        .select(col("doc_id"),
          when(col("shard") < 8, lit("train")).otherwise(lit("test")).as("split"))
      val tagged = pairs
        .join(split.select(col("doc_id").as("id_a"), col("split").as("__sa")), "id_a")
        .join(split.select(col("doc_id").as("id_b"), col("split").as("__sb")), "id_b")
      // train-side endpoints of cross-split pairs, either orientation
      val leaked = tagged.filter(col("__sa") === "train" && col("__sb") === "test")
        .select(col("id_a").as("doc_id"))
        .union(tagged.filter(col("__sa") === "test" && col("__sb") === "train")
          .select(col("id_b").as("doc_id")))
        .distinct()
      split
        .join(leaked.withColumn("__leak", lit(true)), Seq("doc_id"), "left")
        .groupBy("split")
        .agg(count(lit(1)).as("n_before"),
          count(when(col("__leak"), 1)).as("n_dropped"),
          count(when(col("__leak").isNull, 1)).as("n_after"))
        .orderBy("split")
    },
    Some(s"""
      WITH ${nearDupCtes("documents")},
      verified AS (SELECT i.da, i.db
                   FROM inter i
                   JOIN sizes sa ON i.da = sa.doc_id
                   JOIN sizes sb ON i.db = sb.doc_id
                   WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5),
      sp AS (SELECT doc_id,
                    CASE WHEN ('0x' || substr(md5(text), 1, 8))::BIGINT % 10 < 8
                         THEN 'train' ELSE 'test' END AS split
             FROM documents),
      leaked AS (
        SELECT DISTINCT x.doc_id FROM (
          SELECT v.da AS doc_id, a.split AS sa, b.split AS sb
          FROM verified v JOIN sp a ON a.doc_id = v.da JOIN sp b ON b.doc_id = v.db
          UNION ALL
          SELECT v.db AS doc_id, b.split AS sa, a.split AS sb
          FROM verified v JOIN sp a ON a.doc_id = v.da JOIN sp b ON b.doc_id = v.db) x
        WHERE x.sa = 'train' AND x.sb = 'test')
      SELECT s.split, COUNT(*) AS n_before,
             COUNT(CASE WHEN l.doc_id IS NOT NULL THEN 1 END) AS n_dropped,
             COUNT(CASE WHEN l.doc_id IS NULL THEN 1 END) AS n_after
      FROM sp s LEFT JOIN leaked l ON l.doc_id = s.doc_id
      GROUP BY s.split ORDER BY s.split"""))

  /** Leak-proof split assignment (CorpusPipeline.leakProofSplits) — the
    * q179/q180 arc closed at the source: split by the near-dup CLUSTER
    * representative's content hash, so near-duplicates cannot straddle
    * the split by construction. The output's n_cross_pairs column is
    * the computed (not assumed) proof: the q36 verified pairs joined
    * against the assignment must yield zero cross-split rows, and the
    * oracle recomputes the same count through the recursive-closure
    * chain. */
  val q187 = Q(
    "q187_cluster_splits",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .transform(Tables.spread("doc_id"))
      val pairs = graft.operators.Dedup
        .minHashLshPairs(docs, "doc_id", "text",
          n = ShingleN, k = K, bands = Bands, threshold = 0.5)
      graft.operators.CorpusPipeline.leakProofSplits(
        docs, "doc_id", "text", pairs, numShards = 10, trainShards = 8)
    },
    Some(s"""
      WITH RECURSIVE ${nearDupCtes("documents")},
      verified AS (SELECT i.da, i.db
                   FROM inter i
                   JOIN sizes sa ON i.da = sa.doc_id
                   JOIN sizes sb ON i.db = sb.doc_id
                   WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5),
      edges AS (SELECT da AS a, db AS b FROM verified
                UNION SELECT db, da FROM verified),
      reach AS (SELECT a, b FROM edges
                UNION
                SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      cl AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster
             FROM reach GROUP BY a),
      roots AS (SELECT d.doc_id, COALESCE(cl.cluster, d.doc_id) AS root
                FROM documents d LEFT JOIN cl USING (doc_id)),
      rh AS (SELECT doc_id AS root,
                    ('0x' || substr(md5(text), 1, 8))::BIGINT % 10 AS h
             FROM documents),
      sp AS (SELECT r.doc_id, r.root,
                    CASE WHEN rh.h < 8 THEN 'train' ELSE 'test' END AS split
             FROM roots r JOIN rh ON r.root = rh.root),
      x AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cross
            FROM verified v
            JOIN sp a ON a.doc_id = v.da
            JOIN sp b ON b.doc_id = v.db
            WHERE a.split <> b.split)
      SELECT sp.split, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT sp.root) AS BIGINT) AS n_roots,
             x.n_cross AS n_cross_pairs
      FROM sp, x GROUP BY sp.split, x.n_cross ORDER BY sp.split"""))

  /** Per-document curation ledger (CorpusPipeline.curationLedger): the
    * q55 pipeline's audit trail at row grain — every input document
    * labeled with the stage that dropped it (quality / exact /
    * near_dup, with the keeper or cluster representative as the
    * reference) or kept. The oracle replays the q55 stage chain plus
    * the q51 recursive closure and tabulates the same ledger; the
    * per-stage counts reconcile with curate's Report by construction. */
  val q191 = Q(
    "q191_curation_ledger",
    (s, d) => graft.operators.CorpusPipeline.curationLedger(
      Tables.documents(s, d), "doc_id", "text",
      minTokens = 10, maxTokens = 100000, nearDupThreshold = 0.5),
    Some(s"""
      WITH RECURSIVE q AS (SELECT doc_id, text FROM documents
                           WHERE len(string_split(text, ' ')) BETWEEN 10 AND 100000),
      keyed AS (SELECT doc_id, text,
                       MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
                FROM q),
      ex AS (SELECT doc_id, text FROM keyed WHERE doc_id = keeper),
      ${nearDupCtes("ex")},
      verified AS (SELECT i.da, i.db
                   FROM inter i
                   JOIN sizes sa ON i.da = sa.doc_id
                   JOIN sizes sb ON i.db = sb.doc_id
                   WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5),
      edges AS (SELECT da AS a, db AS b FROM verified
                UNION SELECT db, da FROM verified),
      reach AS (SELECT a, b FROM edges
                UNION
                SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      cl AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster
             FROM reach GROUP BY a),
      qd AS (SELECT doc_id, 'quality' AS stage, CAST(-1 AS BIGINT) AS ref_id
             FROM documents
             WHERE len(string_split(text, ' ')) NOT BETWEEN 10 AND 100000),
      ed AS (SELECT doc_id, 'exact' AS stage, keeper AS ref_id
             FROM keyed WHERE doc_id <> keeper),
      nd AS (SELECT doc_id, 'near_dup' AS stage, cluster AS ref_id
             FROM cl WHERE doc_id <> cluster),
      kp AS (SELECT e.doc_id, 'kept' AS stage, e.doc_id AS ref_id
             FROM ex e
             LEFT JOIN (SELECT doc_id FROM cl WHERE doc_id <> cluster) l
               USING (doc_id)
             WHERE l.doc_id IS NULL)
      SELECT doc_id, stage, ref_id FROM (
        SELECT * FROM qd UNION ALL SELECT * FROM ed
        UNION ALL SELECT * FROM nd UNION ALL SELECT * FROM kp) u
      ORDER BY doc_id"""))

  /** Incremental curation under the oracle (the q170 device lifted to
    * the WHOLE pipeline): the lower half of the corpus (by id) plays
    * the already-ingested state (CorpusPipeline.curateStateBuild), the
    * upper half plays the newly arriving batch, and
    * CorpusPipeline.curateIncremental must return EXACTLY the full
    * recompute's survivors restricted to the batch — the oracle runs
    * the q55 chain over the full corpus and filters to batch ids. This
    * is the 100 TB ingestion path proven equivalent, not assumed:
    * batch-proportional cost, full-recompute semantics. */
  val q192 = Q(
    "q192_incremental_curate",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .transform(Tables.spread("doc_id"))
      val mx = docs.agg(max("doc_id")).head().getLong(0)
      val cut = (mx + 1) / 2
      val (fps, idx) = graft.operators.CorpusPipeline.curateStateBuild(
        docs.filter(col("doc_id") < cut), "doc_id", "text")
      val (surv, _, _) = graft.operators.CorpusPipeline.curateIncremental(
        fps, idx, docs.filter(col("doc_id") >= cut), "doc_id", "text",
        minTokens = 10, maxTokens = 100000, nearDupThreshold = 0.5)
      surv.select(col("doc_id"), col("fingerprint"),
        col("n_tokens").cast("long").as("n_tokens"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH RECURSIVE q AS (SELECT doc_id, text FROM documents
                           WHERE len(string_split(text, ' ')) BETWEEN 10 AND 100000),
      ex AS (SELECT doc_id, text FROM (
               SELECT doc_id, text, MIN(doc_id) OVER (PARTITION BY text) AS keeper
               FROM q) WHERE doc_id = keeper),
      ${nearDupCtes("ex")},
      verified AS (SELECT i.da, i.db
                   FROM inter i
                   JOIN sizes sa ON i.da = sa.doc_id
                   JOIN sizes sb ON i.db = sb.doc_id
                   WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5),
      edges AS (SELECT da AS a, db AS b FROM verified
                UNION SELECT db, da FROM verified),
      reach AS (SELECT a, b FROM edges
                UNION
                SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      losers AS (SELECT a AS doc_id FROM reach GROUP BY a
                 HAVING LEAST(a, MIN(b)) <> a),
      cut AS (SELECT (MAX(doc_id) + 1) // 2 AS c FROM documents)
      SELECT e.doc_id, md5(e.text) AS fingerprint,
             CAST(len(string_split(e.text, ' ')) AS BIGINT) AS n_tokens
      FROM ex e, cut
      WHERE e.doc_id NOT IN (SELECT doc_id FROM losers)
        AND e.doc_id >= cut.c
      ORDER BY doc_id"""))

  /** Per-source curation funnel: the q191 ledger rolled up to (source ×
    * stage) — which sources lose mass at which stage, the per-source
    * data-card view of the curation pass (a source bleeding at
    * `near_dup` is a mirror; one bleeding at `quality` is a format
    * problem). One conditional aggregate over the ledger joined to the
    * sources column; retention = kept/total, 4 dp. */
  val q193 = Q(
    "q193_source_funnel",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .transform(Tables.spread("doc_id"))
      graft.operators.CorpusPipeline
        .curationLedger(docs, "doc_id", "text",
          minTokens = 10, maxTokens = 100000, nearDupThreshold = 0.5,
          // the rollup's groupBy destroys row order; the funnel sorts
          // its own (source-keyed) output below
          sorted = false)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("stage") === "quality", 1)).as("n_quality"),
          count(when(col("stage") === "exact", 1)).as("n_exact"),
          count(when(col("stage") === "near_dup", 1)).as("n_near_dup"),
          count(when(col("stage") === "kept", 1)).as("n_kept"))
        .withColumn("retention",
          round(col("n_kept") / col("n_docs").cast("double"), 4))
        .orderBy("source")
    },
    Some(s"""
      WITH RECURSIVE q AS (SELECT doc_id, text FROM documents
                           WHERE len(string_split(text, ' ')) BETWEEN 10 AND 100000),
      keyed AS (SELECT doc_id, text,
                       MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
                FROM q),
      ex AS (SELECT doc_id, text FROM keyed WHERE doc_id = keeper),
      ${nearDupCtes("ex")},
      verified AS (SELECT i.da, i.db
                   FROM inter i
                   JOIN sizes sa ON i.da = sa.doc_id
                   JOIN sizes sb ON i.db = sb.doc_id
                   WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5),
      edges AS (SELECT da AS a, db AS b FROM verified
                UNION SELECT db, da FROM verified),
      reach AS (SELECT a, b FROM edges
                UNION
                SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      cl AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster
             FROM reach GROUP BY a),
      ledger AS (
        SELECT doc_id, 'quality' AS stage FROM documents
        WHERE len(string_split(text, ' ')) NOT BETWEEN 10 AND 100000
        UNION ALL
        SELECT doc_id, 'exact' FROM keyed WHERE doc_id <> keeper
        UNION ALL
        SELECT doc_id, 'near_dup' FROM cl WHERE doc_id <> cluster
        UNION ALL
        SELECT e.doc_id, 'kept' FROM ex e
        LEFT JOIN (SELECT doc_id FROM cl WHERE doc_id <> cluster) l
          USING (doc_id)
        WHERE l.doc_id IS NULL)
      SELECT d.source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(CASE WHEN stage = 'quality' THEN 1 END) AS BIGINT) AS n_quality,
             CAST(COUNT(CASE WHEN stage = 'exact' THEN 1 END) AS BIGINT) AS n_exact,
             CAST(COUNT(CASE WHEN stage = 'near_dup' THEN 1 END) AS BIGINT) AS n_near_dup,
             CAST(COUNT(CASE WHEN stage = 'kept' THEN 1 END) AS BIGINT) AS n_kept,
             ROUND(COUNT(CASE WHEN stage = 'kept' THEN 1 END)
                   / CAST(COUNT(*) AS DOUBLE), 4) AS retention
      FROM ledger le JOIN documents d USING (doc_id)
      GROUP BY d.source ORDER BY d.source"""))

  /** The hashed-vector-entries CTE chain shared by q194/q195: token →
    * md5 bucket+sign → signed-tf per (doc, bucket), zero entries
    * dropped. One definition so the two oracles cannot drift. */
  private def hashedEntriesCtes(src: String): String = s"""
      ht AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM $src),
      he AS (SELECT doc_id,
                    ('0x' || substr(md5(tok), 1, 8))::BIGINT % 64 AS bucket,
                    CASE WHEN ('0x' || substr(md5(tok), 9, 1))::BIGINT % 2 = 1
                         THEN 1 ELSE -1 END AS sign
             FROM ht),
      hb AS (SELECT doc_id, bucket, CAST(SUM(sign) AS BIGINT) AS v
             FROM he GROUP BY doc_id, bucket HAVING SUM(sign) <> 0)"""

  /** Hashing-trick document vectors (Dedup.hashedDocVectors): the
    * feature-hashing vectorizer that puts text into vector space —
    * md5-derived bucket + sign per token, signed-tf coordinates.
    * All-integer vectors; the dense vector is fingerprinted rather
    * than emitted (list render differs between engines). */
  val q194 = Q(
    "q194_hashed_doc_vectors",
    (s, d) => graft.operators.Dedup.hashedDocVectors(
      Tables.documents(s, d), "doc_id", "text", dims = 64)
      .orderBy("doc_id"),
    Some(s"""
      WITH ${hashedEntriesCtes("documents")},
      g AS (SELECT d.doc_id, i.i, COALESCE(hb.v, 0) AS v
            FROM (SELECT DISTINCT doc_id FROM documents) d
            CROSS JOIN (SELECT UNNEST(range(0, 64)) AS i) i
            LEFT JOIN hb ON hb.doc_id = d.doc_id AND hb.bucket = i.i)
      SELECT doc_id,
             CAST(COUNT(CASE WHEN v <> 0 THEN 1 END) AS BIGINT) AS nnz,
             ROUND(sqrt(SUM(CAST(v AS DOUBLE) * v)), 4) AS l2,
             md5(string_agg(CAST(v AS VARCHAR), ',' ORDER BY i)) AS vec_fp
      FROM g GROUP BY doc_id ORDER BY doc_id"""))

  /** Lexical-vs-semantic audit (Dedup.lexicalSemanticAudit): hashed-
    * vector cosine for every MinHash-verified near-dup pair — does the
    * cheap lexical signal proxy vector-space similarity, pair by pair.
    * Pair-bounded: the sparse dot joins entries only for pair members. */
  val q195 = Q(
    "q195_lexical_semantic_audit",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .transform(Tables.spread("doc_id"))
      graft.operators.Dedup.lexicalSemanticAudit(
        docs, "doc_id", "text", dims = 64, threshold = 0.5)
    },
    Some(s"""
      WITH ${nearDupCtes("documents")},
      verified AS (SELECT i.da AS id_a, i.db AS id_b,
                          ROUND(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 4) AS jaccard
                   FROM inter i
                   JOIN sizes sa ON i.da = sa.doc_id
                   JOIN sizes sb ON i.db = sb.doc_id
                   WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5),
      ${hashedEntriesCtes("documents").replaceFirst("^\\s+", "")},
      dd AS (SELECT v.id_a, v.id_b, SUM(ba.v * xb.v) AS dot
             FROM verified v
             JOIN hb ba ON ba.doc_id = v.id_a
             JOIN hb xb ON xb.doc_id = v.id_b AND xb.bucket = ba.bucket
             GROUP BY v.id_a, v.id_b),
      nn AS (SELECT doc_id, sqrt(SUM(CAST(v AS DOUBLE) * v)) AS nrm
             FROM hb GROUP BY doc_id)
      SELECT v.id_a, v.id_b, v.jaccard,
             CASE WHEN na.nrm IS NULL OR nb.nrm IS NULL THEN 0.0
                  ELSE ROUND(COALESCE(dd.dot, 0) / (na.nrm * nb.nrm), 4)
             END AS cosine
      FROM verified v
      LEFT JOIN dd ON dd.id_a = v.id_a AND dd.id_b = v.id_b
      LEFT JOIN nn na ON na.doc_id = v.id_a
      LEFT JOIN nn nb ON nb.doc_id = v.id_b
      ORDER BY v.id_a, v.id_b"""))

  /** Text-to-text retrieval (Dedup.hashedTopK): cosine top-10 documents
    * for doc 0 over the hashed vectors — embedding-free corpus search.
    * Query entries broadcast, candidates bucket-joined (sparse — only
    * docs sharing a non-zero bucket score), TakeOrdered k-row reduce on
    * rounded cosine with the id tie-break. */
  val q196 = Q(
    "q196_hashed_topk",
    (s, d) => graft.operators.Dedup.hashedTopK(
      Tables.documents(s, d), "doc_id", "text", queryId = 0L, k = 10),
    Some(s"""
      WITH ${hashedEntriesCtes("documents")},
      nn AS (SELECT doc_id, sqrt(SUM(CAST(v AS DOUBLE) * v)) AS nrm
             FROM hb GROUP BY doc_id),
      qe AS (SELECT bucket, v AS qv FROM hb WHERE doc_id = 0),
      qn AS (SELECT nrm AS qn FROM nn WHERE doc_id = 0),
      dd AS (SELECT hb.doc_id, SUM(hb.v * qe.qv) AS dot
             FROM hb JOIN qe USING (bucket)
             WHERE hb.doc_id <> 0
             GROUP BY hb.doc_id)
      SELECT dd.doc_id,
             ROUND(dd.dot / (nn.nrm * qn.qn), 4) AS cosine
      FROM dd JOIN nn ON nn.doc_id = dd.doc_id, qn
      ORDER BY cosine DESC, dd.doc_id LIMIT 10"""))

  /** TF-IDF-weighted hashed retrieval (Dedup.hashedTfidfTopK): the IDF
    * upgrade of q196 — corpus-wide boilerplate stops dominating and
    * rare distinctive overlap ranks first. IDF is exact integer-ratio
    * log2; float bucket sums ride the rounded-cosine ranking device. */
  val q197 = Q(
    "q197_tfidf_hashed_topk",
    (s, d) => graft.operators.Dedup.hashedTfidfTopK(
      Tables.documents(s, d), "doc_id", "text", queryId = 0L, k = 10),
    Some("""
      WITH t AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
      nd AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM documents),
      tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t GROUP BY doc_id, tok),
      dfq AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY tok),
      e AS (SELECT tf.doc_id,
                   ('0x' || substr(md5(tf.tok), 1, 8))::BIGINT % 64 AS bucket,
                   (CASE WHEN ('0x' || substr(md5(tf.tok), 9, 1))::BIGINT % 2 = 1
                         THEN 1.0 ELSE -1.0 END)
                     * tf.tf
                     * log2((nd.nd + 1) / CAST(dfq.df + 1 AS DOUBLE)) AS w
            FROM tf JOIN dfq USING (tok), nd),
      b AS (SELECT doc_id, bucket, SUM(w) AS v FROM e GROUP BY doc_id, bucket
            HAVING SUM(w) <> 0),
      nn AS (SELECT doc_id, sqrt(SUM(v * v)) AS nrm FROM b GROUP BY doc_id),
      qe AS (SELECT bucket, v AS qv FROM b WHERE doc_id = 0),
      qn AS (SELECT nrm AS qn FROM nn WHERE doc_id = 0),
      dd AS (SELECT b.doc_id, SUM(b.v * qe.qv) AS dot
             FROM b JOIN qe USING (bucket)
             WHERE b.doc_id <> 0
             GROUP BY b.doc_id)
      SELECT dd.doc_id,
             ROUND(dd.dot / (nn.nrm * qn.qn), 4) AS cosine
      FROM dd JOIN nn ON nn.doc_id = dd.doc_id, qn
      ORDER BY cosine DESC, dd.doc_id LIMIT 10"""))

  /** Okapi BM25 top-10 for one query document over exact terms — the
    * Lucene-style lexical retriever next to q197's hashed TF-IDF
    * cosine: same sparse candidate shape (query-term postings only),
    * but length-normalized tf saturation and the non-negative idf.
    * Ranking compares on the rounded score with the id tie-break. */
  val q201 = Q(
    "q201_bm25_topk",
    (s, d) => graft.operators.Dedup.bm25TopK(
      Tables.documents(s, d), "doc_id", "text", queryId = 0L, k = 10),
    Some("""
      WITH t AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
      tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t GROUP BY doc_id, tok),
      dl AS (SELECT doc_id, COUNT(*) AS dl FROM t GROUP BY doc_id),
      st AS (SELECT avg(dl) AS avgdl, COUNT(*) AS n FROM dl),
      dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
      q AS (SELECT DISTINCT tok FROM t WHERE doc_id = 0),
      sc AS (SELECT tf.doc_id,
               SUM(ln(1.0 + (st.n - dfq.df + 0.5) / (dfq.df + 0.5)) *
                   (tf.tf * (1.2 + 1.0)) /
                   (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl))) AS raw
             FROM tf JOIN q USING (tok) JOIN dfq USING (tok)
                  JOIN dl USING (doc_id), st
             WHERE tf.doc_id <> 0
             GROUP BY tf.doc_id)
      SELECT CAST(doc_id AS BIGINT) AS doc_id, ROUND(raw, 4) AS score
      FROM sc ORDER BY score DESC, doc_id LIMIT 10"""))

  /** Curation-ledger compaction (CorpusPipeline.compactLedger): the
    * ledger is append-only — a re-audit (here: the quality bar raised
    * from 10 to 40 tokens) appends superseding decision rows under a
    * higher batch id — and compaction folds the history to the
    * latest-per-doc view. The Spark side builds the real two-batch
    * history (batch 0 = the q191 ledger; batch 1 = exactly the rows
    * the re-audit changed) and compacts it; the oracle computes the
    * stricter one-shot ledger directly, which the compacted view must
    * equal row for row — keep-latest proven against an independent
    * recompute, not against the compactor's own input. */
  val q208 = Q(
    "q208_ledger_compaction",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .transform(Tables.spread("doc_id"))
      val cp = graft.operators.CorpusPipeline
      // sorted = false: the corrections join and compactLedger's window
      // destroy row order immediately; the final orderBy below is the
      // output contract's sort
      val b0 = cp.curationLedger(docs, "doc_id", "text",
          minTokens = 10, maxTokens = 100000, nearDupThreshold = 0.5,
          sorted = false)
        .withColumn("batch", lit(0L))
      val reaudit = cp.curationLedger(docs, "doc_id", "text",
        minTokens = 40, maxTokens = 100000, nearDupThreshold = 0.5,
        sorted = false)
      val corrections = reaudit.alias("n").join(b0.alias("o"), Seq("doc_id"))
        .filter(col("n.stage") =!= col("o.stage") ||
          col("n.ref_id") =!= col("o.ref_id"))
        .select(col("doc_id"), col("n.stage").as("stage"),
          col("n.ref_id").as("ref_id"))
        .withColumn("batch", lit(1L))
      cp.compactLedger(b0.unionByName(corrections), "doc_id", "batch")
        .select("doc_id", "stage", "ref_id")
        .orderBy("doc_id")
    },
    Some(s"""
      WITH RECURSIVE q AS (SELECT doc_id, text FROM documents
                           WHERE len(string_split(text, ' ')) BETWEEN 40 AND 100000),
      keyed AS (SELECT doc_id, text,
                       MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
                FROM q),
      ex AS (SELECT doc_id, text FROM keyed WHERE doc_id = keeper),
      ${nearDupCtes("ex")},
      verified AS (SELECT i.da, i.db
                   FROM inter i
                   JOIN sizes sa ON i.da = sa.doc_id
                   JOIN sizes sb ON i.db = sb.doc_id
                   WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5),
      edges AS (SELECT da AS a, db AS b FROM verified
                UNION SELECT db, da FROM verified),
      reach AS (SELECT a, b FROM edges
                UNION
                SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      cl AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster
             FROM reach GROUP BY a),
      qd AS (SELECT doc_id, 'quality' AS stage, CAST(-1 AS BIGINT) AS ref_id
             FROM documents
             WHERE len(string_split(text, ' ')) NOT BETWEEN 40 AND 100000),
      ed AS (SELECT doc_id, 'exact' AS stage, keeper AS ref_id
             FROM keyed WHERE doc_id <> keeper),
      nd AS (SELECT doc_id, 'near_dup' AS stage, cluster AS ref_id
             FROM cl WHERE doc_id <> cluster),
      kp AS (SELECT e.doc_id, 'kept' AS stage, e.doc_id AS ref_id
             FROM ex e
             LEFT JOIN (SELECT doc_id FROM cl WHERE doc_id <> cluster) l
               USING (doc_id)
             WHERE l.doc_id IS NULL)
      SELECT doc_id, stage, ref_id FROM (
        SELECT * FROM qd UNION ALL SELECT * FROM ed
        UNION ALL SELECT * FROM nd UNION ALL SELECT * FROM kp) u
      ORDER BY doc_id"""))

  /** The DURABLE LSH index lifecycle cross-engine
    * (`Dedup.{lshBuildIndex,lshIndexAppend}` — round 12): build the
    * stored signature index on the even half, append the odd half
    * (banding parameters read from the store's own stamp, batch
    * anti-join-guarded), then read back the store's durable PAIR LEDGER
    * (`<table>__pairs` — seeded at build, grown pair-durably by every
    * append). The ledger must equal a full recompute over the whole
    * corpus — q36's exact chain — so the oracle IS q36's SQL: green
    * here pins build + append ≡ full, through the on-disk ledger,
    * cross-engine. */
  val q215 = Q(
    "q215_lsh_stored_append",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .transform(Tables.spread("doc_id"))
      val db = "graft_q215"
      val loc = java.nio.file.Files.createTempDirectory("graft-q215")
      s.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$loc'")
      s.sql(s"DROP TABLE IF EXISTS $db.lsh")
      s.sql(s"DROP TABLE IF EXISTS $db.lsh__pairs")
      s.sql(s"DROP TABLE IF EXISTS $db.lsh__bands")
      graft.operators.Dedup.lshBuildIndex(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        s"$db.lsh", n = ShingleN, k = K, bands = Bands)
      // the append's durable effects are eager (three table writes run
      // inside the call) and the returned pairs frame is checkpointed —
      // counting it would only add a driver job to the measured wall
      val _ = graft.operators.Dedup.lshIndexAppend(
        s, s"$db.lsh", docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", threshold = 0.5)
      s.table(graft.operators.Dedup.lshPairsTableName(s"$db.lsh"))
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""
      WITH ${nearDupCtes("documents")}
      SELECT i.da AS doc_a, i.db AS doc_b,
             ROUND(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 4) AS jaccard
      FROM inter i
      JOIN sizes sa ON i.da = sa.doc_id
      JOIN sizes sb ON i.db = sb.doc_id
      WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5
      ORDER BY doc_a, doc_b"""))

  /** Each q219 call appends a DISTINCT batch, so Bench's measured runs
    * do real append work — a verbatim replay would be dropped by the
    * store's replay guard and measure a no-op. Call 0 (Verify's only
    * call, Bench's warmup) appends the ORIGINAL odd half — the
    * lifecycle edge the oracle sees. Calls ≥ 1 append a
    * serving-cadence batch of NEW content: a tenth of the odd half,
    * ids offset by call-number × 10⁹ and every token salted with the
    * call number (the Stress replication device), because steady-state
    * ingest is dominated by fresh documents — an unsalted replay would
    * make every measured doc a jaccard-1.0 twin of a stored one and
    * time a pathological all-duplicates batch instead (the dup-heavy
    * face is exactly what q215 times). Salted pairs never enter the
    * returned frame: every id involved is ≥ 10⁹. */
  private val q219AppendCalls = new java.util.concurrent.atomic.AtomicLong(0L)
  private val Q219IdSpan = 1000000000L

  /** The RECURRING face of the q215 lifecycle, measured alone: q215
    * deliberately times store build + append in one body (it pins the
    * whole durable edge), so its bench number is dominated by the
    * one-off build. Here the even-half store is a build-once-per-JVM
    * fixture ([[Fixtures.once]] — Bench's warmup call pays it), and
    * the measured body is only what a deployment re-runs: one
    * shard-sized [[graft.operators.Dedup.lshIndexAppend]] (signature
    * pass + file-pruned replay guard + bucket-pruned `__bands`
    * collision read + twin-carried verification + two bucketed
    * appends). Later calls append id-shifted copies of the same texts,
    * so their pairs involve only ids ≥ 10⁹ and the returned frame —
    * the ledger restricted to original ids — is call-stable: after
    * call 0 it equals a full recompute over the whole corpus, which is
    * exactly q215's oracle. */
  val q219 = Q(
    "q219_lsh_append_only",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .transform(Tables.spread("doc_id"))
      val db = Fixtures.once(s, "graft_q219", d) { db =>
        graft.operators.Dedup.lshBuildIndex(
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
          s"$db.lsh", n = ShingleN, k = K, bands = Bands)
      }
      val callNo = q219AppendCalls.getAndIncrement()
      // a serving batch arrives as its own small frame, not smeared
      // over the corpus's 32 partitions — without the coalesce every
      // append-path job schedules 32 tasks for a 250-doc batch and the
      // measured wall is pure per-task overhead
      val batch =
        if (callNo == 0L) docs.filter(col("doc_id") % 2 === 1)
        else docs.filter(col("doc_id") % 20 === 1) // a tenth of the odds
          .withColumn("doc_id", col("doc_id") + lit(callNo * Q219IdSpan))
          .withColumn("text", array_join(transform(split(col("text"), " "),
            t => concat(t, lit("~"), lit(callNo))), " "))
          .coalesce(4)
      // eager durable effects; the returned checkpointed frame needs
      // no extra action (see q215)
      val _ = graft.operators.Dedup.lshIndexAppend(
        s, s"$db.lsh", batch, "doc_id", "text", threshold = 0.5)
      s.table(graft.operators.Dedup.lshPairsTableName(s"$db.lsh"))
        .filter(col("id_a") < Q219IdSpan && col("id_b") < Q219IdSpan)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
          round(col("jaccard"), 4).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },
    Some(s"""
      WITH ${nearDupCtes("documents")}
      SELECT i.da AS doc_a, i.db AS doc_b,
             ROUND(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 4) AS jaccard
      FROM inter i
      JOIN sizes sa ON i.da = sa.doc_id
      JOIN sizes sb ON i.db = sb.doc_id
      WHERE CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) >= 0.5
      ORDER BY doc_a, doc_b"""))

  def all: Seq[Q] = Seq(q36, q37, q38, q45, q47, q51, q55, q134, q145, q146,
    q151, q152, q163, q166, q168, q170, q179, q180, q187, q191, q192, q193,
    q194, q195, q196, q197, q201, q208, q215, q219)
}

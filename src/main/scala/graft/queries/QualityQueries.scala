package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.QualityModels

/** Corpus quality-model queries (operators.QualityModels): statistical
  * filters a pretraining pipeline fits on the corpus and scores the
  * corpus with — bigram-LM surprisal (the KenLM-perplexity stand-in),
  * DSIR importance log-ratios, tokenizer OOV rates, temperature mixing,
  * and the cross-source n-gram overlap matrix. All exact-oracled: the
  * models are ratios of integer counts, so DuckDB replays the identical
  * arithmetic and only the final rounded float is compared.
  */
object QualityQueries {

  /** Add-1-smoothed bigram surprisal per document, self-scored on the
    * corpus — low = boilerplate, high = word salad; the LM-filter
    * signal CCNet-style pipelines cut on. */
  val q156 = Q(
    "q156_bigram_surprisal",
    (s, d) => QualityModels.bigramSurprisal(
      Tables.documents(s, d), "doc_id", "text", k = 1.0),
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      uni AS (SELECT UNNEST(toks) AS w FROM t),
      vs AS (SELECT COUNT(DISTINCT w) AS v FROM uni),
      bi AS (SELECT doc_id, toks[i] AS p, toks[i + 1] AS w
             FROM (SELECT doc_id, toks FROM t WHERE len(toks) >= 2) tf,
                  LATERAL (SELECT UNNEST(range(1, len(toks))) AS i) g),
      bcnt AS (SELECT p, w, COUNT(*) AS cb FROM bi GROUP BY p, w),
      ctx AS (SELECT p, SUM(cb) AS cp FROM bcnt GROUP BY p)
      SELECT bi.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             ROUND(AVG(-log2((bcnt.cb + 1.0) / (ctx.cp + 1.0 * vs.v))), 4) AS surprisal
      FROM bi JOIN bcnt USING (p, w) JOIN ctx USING (p), vs
      GROUP BY bi.doc_id ORDER BY bi.doc_id"""))

  /** DSIR importance log-ratio against the English slice as the target
    * domain: positive = distributionally English-like; the resampling
    * score that upweights target-domain-looking documents. */
  val q157 = Q(
    "q157_dsir_weights",
    (s, d) => QualityModels.dsirLogRatio(
      Tables.documents(s, d), "doc_id", "text", col("lang") === "en"),
    Some("""
      WITH t AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
      tt AS (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents WHERE lang = 'en'),
      ac AS (SELECT tok, COUNT(*) AS ca FROM t GROUP BY tok),
      tc AS (SELECT tok, COUNT(*) AS ct FROM tt GROUP BY tok),
      m AS (SELECT ac.tok AS tok, ac.ca AS ca, COALESCE(tc.ct, 0) AS ct
            FROM ac LEFT JOIN tc ON ac.tok = tc.tok),
      tot AS (SELECT (SELECT COUNT(*) FROM t) AS na,
                     (SELECT COUNT(DISTINCT tok) FROM t) AS v,
                     (SELECT COUNT(*) FROM tt) AS nt)
      SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
             ROUND(AVG(log2(((m.ct + 1) / CAST(tot.nt + tot.v AS DOUBLE)) /
                            ((m.ca + 1) / CAST(tot.na + tot.v AS DOUBLE)))), 4) AS log_ratio
      FROM t JOIN m ON t.tok = m.tok, tot
      GROUP BY t.doc_id ORDER BY t.doc_id"""))

  /** Top-20 frequency-ranked vocabulary + per-document OOV rate — the
    * UNK rate a fixed tokenizer would pay per document. */
  val q158 = Q(
    "q158_vocab_oov",
    (s, d) => QualityModels.vocabOovRate(
      Tables.documents(s, d), "doc_id", "text", vocabSize = 20),
    Some("""
      WITH t AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
      cnt AS (SELECT tok, COUNT(*) AS c FROM t GROUP BY tok),
      vocab AS (SELECT tok FROM (
                  SELECT tok, ROW_NUMBER() OVER (ORDER BY c DESC, tok ASC) AS rk
                  FROM cnt) r WHERE rk <= 20)
      SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
             CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
             ROUND(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                   / CAST(COUNT(*) AS DOUBLE), 4) AS oov_rate
      FROM t LEFT JOIN vocab v ON t.tok = v.tok
      GROUP BY t.doc_id ORDER BY t.doc_id"""))

  /** Temperature mixing at alpha = 0.3 (the multilingual-sampling
    * default family): per-source resampling weights that upsample the
    * tail sources without flattening the head. */
  val q159 = Q(
    "q159_temperature_mix",
    (s, d) => QualityModels.temperatureMix(
      Tables.documents(s, d), "source", "text", alpha = 0.3),
    Some("""
      WITH s AS (SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
                 FROM documents GROUP BY source),
      t AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total FROM s),
      f AS (SELECT source, tokens, CAST(tokens AS DOUBLE) / total AS p FROM s, t),
      z AS (SELECT SUM(POW(p, 0.3)) AS z FROM f)
      SELECT source, tokens, ROUND(p, 4) AS actual_frac,
             ROUND(POW(p, 0.3) / z, 4) AS temp_frac,
             ROUND(POW(p, 0.3) / z / p, 4) AS weight
      FROM f, z ORDER BY source"""))

  /** Exact 4-gram Jaccard overlap between every source pair — the
    * mirror/re-crawl detector run before dedup. */
  val q160 = Q(
    "q160_source_overlap",
    (s, d) => QualityModels.sourceOverlap(
      Tables.documents(s, d), "source", "text", n = 4),
    Some("""
      WITH t AS (SELECT source AS src, string_split(text, ' ') AS toks FROM documents),
      g AS (SELECT DISTINCT src,
                   concat_ws(' ', toks[i], toks[i + 1], toks[i + 2], toks[i + 3]) AS gram
            FROM (SELECT src, toks FROM t WHERE len(toks) >= 4) tf,
                 LATERAL (SELECT UNNEST(range(1, len(toks) - 2)) AS i) r),
      sz AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS sz FROM g GROUP BY src),
      i AS (SELECT a.src AS source_a, b.src AS source_b, CAST(COUNT(*) AS BIGINT) AS inter
            FROM g a JOIN g b ON a.gram = b.gram AND a.src < b.src
            GROUP BY a.src, b.src),
      p AS (SELECT a.src AS source_a, b.src AS source_b, a.sz AS sza, b.sz AS szb
            FROM sz a, sz b WHERE a.src < b.src)
      SELECT p.source_a, p.source_b,
             COALESCE(i.inter, 0) AS inter,
             p.sza + p.szb - COALESCE(i.inter, 0) AS uni,
             ROUND(COALESCE(i.inter, 0)
                   / CAST(p.sza + p.szb - COALESCE(i.inter, 0) AS DOUBLE), 4) AS jaccard
      FROM p LEFT JOIN i ON p.source_a = i.source_a AND p.source_b = i.source_b
      ORDER BY p.source_a, p.source_b"""))

  /** Corpus data card: the per-(source, lang) profile plus ROLLUP
    * subtotals (per-source and grand-total rows) in ONE pass — docs,
    * token mass, doc-length min/max/mean. The report every dataset
    * release ships; ROLLUP expands the grouping sets before the hash
    * aggregate, so the corpus is scanned once, not three times. Mean is
    * an exact-integer sum divided once at the end (no float
    * accumulation), so the cross-engine hash is stable. */
  val q161 = Q(
    "q161_corpus_profile",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("source"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n"))
        .rollup("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n").as("tokens"),
          min("n").as("min_toks"),
          max("n").as("max_toks"))
        .select(
          coalesce(col("source"), lit("ALL")).as("source"),
          coalesce(col("lang"), lit("ALL")).as("lang"),
          col("n_docs"), col("tokens"), col("min_toks"), col("max_toks"),
          round(col("tokens").cast("double") / col("n_docs"), 2).as("avg_toks"))
        .orderBy("source", "lang"),
    Some("""
      WITH t AS (SELECT source, lang,
                        CAST(len(string_split(text, ' ')) AS BIGINT) AS n
                 FROM documents)
      SELECT COALESCE(source, 'ALL') AS source,
             COALESCE(lang, 'ALL') AS lang,
             COUNT(*) AS n_docs,
             CAST(SUM(n) AS BIGINT) AS tokens,
             MIN(n) AS min_toks,
             MAX(n) AS max_toks,
             ROUND(CAST(SUM(n) AS DOUBLE) / COUNT(*), 2) AS avg_toks
      FROM t GROUP BY ROLLUP(source, lang)
      ORDER BY source, lang"""))

  /** Per-label embedding coherence — ‖mean normalized vector‖², the
    * closed-form estimate of the expected pairwise cosine within the
    * group (1 = all vectors identical, → 0 = isotropic): the embedding
    * data-card metric that flags a collapsed or over-duplicated slice
    * WITHOUT any pairwise work. One narrow component explode + a
    * (label, pos) aggregate — linear in n·d where all-pairs would be
    * n²·d; the per-vector norm is computed once (codegen VecNorm,
    * sequential accumulation — engine-identical), cross-vector float
    * averaging is the only order-dependent step, and the final 4-dp
    * round absorbs its 1e-15 noise (the q91 device). */
  val q162 = Q(
    "q162_embed_coherence",
    (s, d) => {
      import graft.functions.vec
      val e = Tables.embeddings(s, d)
        .withColumn("nrm", vec.norm(col("embedding")))
        .filter(col("nrm") > 0)
      val comps = e.select(col("label"), col("nrm"),
          posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(avg(col("x") / col("nrm")).as("m"))
      comps.groupBy("label")
        .agg(round(sum(col("m") * col("m")), 4).as("coherence"))
        .join(e.groupBy("label").agg(count(lit(1)).as("n_vectors")), Seq("label"))
        .select(col("label").cast("long").as("label"),
          col("n_vectors"), col("coherence"))
        .orderBy("label")
    },
    Some("""
      WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
      f AS (SELECT label, x, sqrt(list_dot_product(x, x)) AS nrm FROM e),
      g AS (SELECT label, x, nrm FROM f WHERE nrm > 0),
      c AS (SELECT label, i AS pos, AVG(x[i] / nrm) AS m
            FROM g, LATERAL (SELECT UNNEST(range(1, len(x) + 1)) AS i) r
            GROUP BY label, i),
      n AS (SELECT label, COUNT(*) AS n_vectors FROM g GROUP BY label)
      SELECT CAST(c.label AS BIGINT) AS label, n.n_vectors,
             ROUND(SUM(c.m * c.m), 4) AS coherence
      FROM c JOIN n ON c.label = n.label
      GROUP BY c.label, n.n_vectors ORDER BY label"""))

  /** Sketch-path source overlap (QualityModels.sourceOverlapSketch):
    * per-source HLL gram sketches + pairwise union estimates instead of
    * the gram self-join. Engines' sketches differ, so the cross-engine
    * contract is the error bound (the q46 pattern): the query emits the
    * EXACT pair stats alongside whether the sketch Jaccard landed
    * within 0.05 absolute, and the oracle asserts the bound trivially —
    * any pair drifting out of bound breaks the hash compare. */
  val q164 = Q(
    "q164_source_overlap_sketch",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val est = QualityModels.sourceOverlapSketch(docs, "source", "text", n = 4)
        .select(col("source_a"), col("source_b"), col("jaccard_est"))
      QualityModels.sourceOverlap(docs, "source", "text", n = 4)
        .join(est, Seq("source_a", "source_b"))
        .select(col("source_a"), col("source_b"), col("inter"), col("uni"),
          col("jaccard"),
          (abs(col("jaccard_est") - col("jaccard")) <= 0.05).as("within_05"))
        .orderBy("source_a", "source_b")
    },
    Some("""
      WITH t AS (SELECT source AS src, string_split(text, ' ') AS toks FROM documents),
      g AS (SELECT DISTINCT src,
                   concat_ws(' ', toks[i], toks[i + 1], toks[i + 2], toks[i + 3]) AS gram
            FROM (SELECT src, toks FROM t WHERE len(toks) >= 4) tf,
                 LATERAL (SELECT UNNEST(range(1, len(toks) - 2)) AS i) r),
      sz AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS sz FROM g GROUP BY src),
      i AS (SELECT a.src AS source_a, b.src AS source_b, CAST(COUNT(*) AS BIGINT) AS inter
            FROM g a JOIN g b ON a.gram = b.gram AND a.src < b.src
            GROUP BY a.src, b.src),
      p AS (SELECT a.src AS source_a, b.src AS source_b, a.sz AS sza, b.sz AS szb
            FROM sz a, sz b WHERE a.src < b.src)
      SELECT p.source_a, p.source_b,
             COALESCE(i.inter, 0) AS inter,
             p.sza + p.szb - COALESCE(i.inter, 0) AS uni,
             ROUND(COALESCE(i.inter, 0)
                   / CAST(p.sza + p.szb - COALESCE(i.inter, 0) AS DOUBLE), 4) AS jaccard,
             TRUE AS within_05
      FROM p LEFT JOIN i ON p.source_a = i.source_a AND p.source_b = i.source_b
      ORDER BY p.source_a, p.source_b"""))

  /** One unrolled round of the BPE training loop (SQL mirror of
    * QualityModels.bpeMerges): count adjacent pairs over `r${r-1}`,
    * adopt the top pair as `m$r`, rewrite into `r$r`. The rewrite
    * LEFT-joins the (0-or-1 row) merge frame so a pair-less round
    * passes the corpus through unchanged instead of cross-joining it
    * empty — q165 reads only the m tables either way, but q177 reads
    * the final corpus state, which must survive early adoption stop
    * exactly as the Scala loop's does. */
  private def bpeRoundSql(r: Int): String = s"""
      p$r AS (SELECT toks[i] AS w1, toks[i + 1] AS w2, COUNT(*) AS n
              FROM (SELECT string_split(s, '␟') AS toks FROM r${r - 1}) t,
                   LATERAL (SELECT UNNEST(range(1, len(toks))) AS i) g
              GROUP BY 1, 2),
      m$r AS (SELECT $r AS step, w1, w2, CAST(n AS BIGINT) AS n
              FROM p$r ORDER BY n DESC, w1, w2 LIMIT 1),
      r$r AS (SELECT doc_id,
                     CASE WHEN m.w1 IS NULL THEN t.s ELSE
                       substr(replace('␟' || t.s || '␟',
                                      '␟' || m.w1 || '␟' || m.w2 || '␟',
                                      '␟' || m.w1 || '␝' || m.w2 || '␟'),
                              2,
                              length(replace('␟' || t.s || '␟',
                                             '␟' || m.w1 || '␟' || m.w2 || '␟',
                                             '␟' || m.w1 || '␝' || m.w2 || '␟')) - 2)
                     END AS s
              FROM r${r - 1} t LEFT JOIN m$r m ON TRUE)"""

  /** BPE merge-table training, 3 rounds (QualityModels.bpeMerges): the
    * tokenizer-fit loop — count pairs, adopt the top pair, rewrite,
    * repeat — with every round unrolled in the oracle (the q136
    * unrolled-Lloyd device). Counts are exact integers and the rewrite
    * is a literal left-to-right replace with identical semantics in
    * both engines, so the learned merge table hash-matches. */
  val q165 = Q(
    "q165_bpe_merges",
    // spread: each training round is one corpus-wide count job; the
    // one-file corpus otherwise runs every round on a single task
    (s, d) => graft.operators.QualityModels.bpeMerges(
      Tables.documents(s, d).transform(Tables.spread("doc_id")),
      "doc_id", "text", rounds = 3),
    Some(s"""
      WITH r0 AS (SELECT doc_id, replace(text, ' ', '␟') AS s FROM documents),
      ${bpeRoundSql(1)},
      ${bpeRoundSql(2)},
      ${bpeRoundSql(3)}
      SELECT step, w1, w2, n FROM (
        SELECT * FROM m1 UNION ALL SELECT * FROM m2 UNION ALL SELECT * FROM m3) u
      ORDER BY step"""))

  /** The learn→apply tokenizer loop closed: train the 3-round merge
    * table (q165) on the corpus, then APPLY it back with
    * QualityModels.bpeApply — per doc, the piece count after merging,
    * how many pieces are merged tokens, and a fingerprint of the
    * rewritten string. The oracle replays the same three unrolled
    * rounds and reads the final rewritten state `r3` directly, which
    * is exactly what folding the merge table over the original corpus
    * produces (each training round's rewrite IS the apply step for
    * that merge). Apply itself is one narrow scan — the learned
    * tokenizer rides along as literals. */
  val q177 = Q(
    "q177_bpe_apply",
    (s, d) => {
      val docs = Tables.documents(s, d).transform(Tables.spread("doc_id"))
      val merges = graft.operators.QualityModels
        .bpeMerges(docs, "doc_id", "text", rounds = 3)
        .orderBy("step").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      graft.operators.QualityModels.bpeApply(docs, "doc_id", "text", merges)
        .orderBy("doc_id")
    },
    Some(s"""
      WITH r0 AS (SELECT doc_id, replace(text, ' ', '␟') AS s FROM documents),
      ${bpeRoundSql(1)},
      ${bpeRoundSql(2)},
      ${bpeRoundSql(3)}
      SELECT doc_id,
             CAST(len(string_split(s, '␟')) AS BIGINT) AS n_pieces,
             CAST(len(list_filter(string_split(s, '␟'),
                                  p -> contains(p, '␝'))) AS BIGINT) AS n_merged,
             md5(s) AS bpe_fp
      FROM r3 ORDER BY doc_id"""))

  /** Robust per-source length-outlier detection: median + MAD (median
    * absolute deviation) of token counts, and the count of docs beyond
    * 3 MADs — the outlier rule that survives the heavy tails that wreck
    * mean/stddev fences. Integer lengths make every median a multiple
    * of 0.5 (exactly representable), so the 3-MAD comparison is crisp
    * cross-engine (Spark `percentile` and DuckDB `quantile_cont` both
    * linear-interpolate, the q56 equivalence). Two aggregate passes +
    * one sources-sized broadcast — no corpus sort. */
  val q167 = Q(
    "q167_length_outliers",
    (s, d) => {
      val lens = Tables.documents(s, d)
        .select(col("source"), size(split(col("text"), " ")).cast("long").as("len"))
      val med = lens.groupBy("source")
        .agg(expr("percentile(len, 0.5)").as("med"))
      val dev = lens.join(broadcast(med), Seq("source"))
        .withColumn("adev", abs(col("len") - col("med")))
      val mad = dev.groupBy("source")
        .agg(expr("percentile(adev, 0.5)").as("mad"))
      dev.join(broadcast(mad), Seq("source"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(first("med"), 2).as("median_toks"),
          round(first("mad"), 2).as("mad"),
          sum(when(col("adev") > lit(3) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy("source")
    },
    Some("""
      WITH l AS (SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS len
                 FROM documents),
      m AS (SELECT source, quantile_cont(len, 0.5) AS med FROM l GROUP BY source),
      d AS (SELECT l.source, l.len, ABS(l.len - m.med) AS adev
            FROM l JOIN m ON l.source = m.source),
      md AS (SELECT source, quantile_cont(adev, 0.5) AS mad FROM d GROUP BY source)
      SELECT d.source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             ROUND(ANY_VALUE(m.med), 2) AS median_toks,
             ROUND(ANY_VALUE(md.mad), 2) AS mad,
             CAST(SUM(CASE WHEN d.adev > 3 * md.mad THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers
      FROM d JOIN m ON d.source = m.source
             JOIN md ON d.source = md.source
      GROUP BY d.source ORDER BY d.source"""))

  /** Interpolated Kneser-Ney bigram cross-entropy + CCNet-style
    * head/middle/tail terciles (QualityModels.knBigramEntropy) — the
    * real-LM perplexity filter: absolute-discounted bigram
    * probabilities with continuation-count backoff, per-doc mean
    * -log2 P, bucketed at the exact entropy terciles. All counts are
    * integers and the discount is a fixed literal, so DuckDB replays
    * identical arithmetic; entropy is rounded before the tercile
    * split (the q167 percentile equivalence). */
  val q181 = Q(
    "q181_kn_bigram_lm",
    (s, d) => QualityModels.knBigramEntropy(
      Tables.documents(s, d).transform(Tables.spread("doc_id")),
      "doc_id", "text", discount = 0.75),
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      bi AS (SELECT doc_id, toks[i] AS p, toks[i + 1] AS w
             FROM (SELECT doc_id, toks FROM t WHERE len(toks) >= 2) tf,
                  LATERAL (SELECT UNNEST(range(1, len(toks))) AS i) g),
      bcnt AS (SELECT p, w, COUNT(*) AS cb FROM bi GROUP BY p, w),
      ctx AS (SELECT p, SUM(cb) AS cp, COUNT(*) AS n1p FROM bcnt GROUP BY p),
      cont AS (SELECT w, COUNT(*) AS n1w FROM bcnt GROUP BY w),
      ty AS (SELECT COUNT(*) AS nbb FROM bcnt),
      sc AS (SELECT bi.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                    ROUND(AVG(-log2(
                      (bcnt.cb - 0.75) / ctx.cp +
                      0.75 * ctx.n1p / ctx.cp *
                        (CAST(cont.n1w AS DOUBLE) / ty.nbb))), 4) AS kn_entropy
             FROM bi JOIN bcnt USING (p, w) JOIN ctx USING (p)
                  JOIN cont USING (w), ty
             GROUP BY bi.doc_id),
      b AS (SELECT quantile_cont(kn_entropy, 0.3333) AS b1,
                   quantile_cont(kn_entropy, 0.6667) AS b2 FROM sc)
      SELECT doc_id, n_bigrams, kn_entropy,
             CASE WHEN kn_entropy <= b1 THEN 'head'
                  WHEN kn_entropy <= b2 THEN 'middle'
                  ELSE 'tail' END AS bucket
      FROM sc, b ORDER BY doc_id"""))

  /** PPMI count-based word vectors + top-20 cosine-similar word pairs
    * (QualityModels.ppmiTopPairs): symmetric ±2 co-occurrence, positive
    * PMI sparse vectors, cosine via the context-key self-join. Ranking
    * is by ROUNDED cosine with a lexical pair tie-break — the
    * cross-engine top-k determinism device. The default hot-context cap
    * (context dims with > 1000 positive partners leave the vectors
    * before norms and the join) is mirrored in the oracle's `cd`/`pf`
    * CTEs, so both engines fit the same capped model. */
  val q182 = Q(
    "q182_ppmi_word_sim",
    (s, d) => QualityModels.ppmiTopPairs(
      Tables.documents(s, d).transform(Tables.spread("doc_id")),
      "text", window = 2, topK = 20),
    Some("""
      WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
      fw AS (SELECT toks[i] AS a, toks[i + k] AS c
             FROM (SELECT toks FROM t WHERE len(toks) >= 2) tf,
                  LATERAL (SELECT UNNEST(range(1, len(toks))) AS i) ii,
                  LATERAL (SELECT UNNEST(range(1, 3)) AS k) kk
             WHERE i + k <= len(toks)),
      pairs AS (SELECT a, c FROM fw UNION ALL SELECT c AS a, a AS c FROM fw),
      cc AS (SELECT a, c, COUNT(*) AS nac FROM pairs GROUP BY a, c),
      mg AS (SELECT a, SUM(nac) AS na FROM cc GROUP BY a),
      tt AS (SELECT SUM(nac) AS ntot FROM cc),
      pv AS (SELECT cc.a, cc.c,
                    log2((CAST(cc.nac AS DOUBLE) * tt.ntot) /
                         (CAST(mg.na AS DOUBLE) * mc.na)) AS v
             FROM cc JOIN mg ON cc.a = mg.a JOIN mg mc ON cc.c = mc.a, tt),
      pq AS (SELECT a, c, v FROM pv WHERE v > 0),
      cd AS (SELECT c FROM pq GROUP BY c HAVING COUNT(*) <= 1000),
      pf AS (SELECT pq.a, pq.c, pq.v FROM pq JOIN cd USING (c)),
      nr AS (SELECT a, sqrt(SUM(v * v)) AS nrm FROM pf GROUP BY a),
      sm AS (SELECT p1.a AS w1, p2.a AS w2, CAST(COUNT(*) AS BIGINT) AS n_ctx,
                    SUM(p1.v * p2.v) AS dot
             FROM pf p1 JOIN pf p2 ON p1.c = p2.c AND p1.a < p2.a
             GROUP BY p1.a, p2.a)
      SELECT sm.w1, sm.w2, sm.n_ctx,
             ROUND(sm.dot / (n1.nrm * n2.nrm), 4) AS cosine
      FROM sm JOIN nr n1 ON sm.w1 = n1.a JOIN nr n2 ON sm.w2 = n2.a
      ORDER BY cosine DESC, sm.w1, sm.w2 LIMIT 20"""))

  /** Per-source tokenizer stats with the learned merge table applied:
    * word count, piece count after the 3-round BPE table, merged-piece
    * count, and the compression ratio pieces/words — the per-source
    * fertility report that tells a pipeline which sources the tokenizer
    * serves well. Replays the q165/q177 unrolled training rounds in the
    * oracle and reads the final corpus state joined back to source. */
  val q186 = Q(
    "q186_tokenizer_stats",
    (s, d) => {
      val docs = Tables.documents(s, d).transform(Tables.spread("doc_id"))
      val merges = QualityModels
        .bpeMerges(docs, "doc_id", "text", rounds = 3)
        .orderBy("step").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val applied = QualityModels.bpeApply(docs, "doc_id", "text", merges)
      docs.select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_words"))
        .join(applied, Seq("doc_id"))
        .groupBy("source")
        .agg(sum("n_words").as("n_words"),
          sum("n_pieces").as("n_pieces"),
          sum("n_merged").as("n_merged"))
        .select(col("source"), col("n_words"), col("n_pieces"), col("n_merged"),
          round(col("n_pieces") / col("n_words").cast("double"), 4)
            .as("compression"))
        .orderBy("source")
    },
    Some(s"""
      WITH r0 AS (SELECT doc_id, replace(text, ' ', '␟') AS s FROM documents),
      ${bpeRoundSql(1)},
      ${bpeRoundSql(2)},
      ${bpeRoundSql(3)}
      SELECT d.source,
             CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS n_words,
             CAST(SUM(len(string_split(r3.s, '␟'))) AS BIGINT) AS n_pieces,
             CAST(SUM(len(list_filter(string_split(r3.s, '␟'),
                                      p -> contains(p, '␝')))) AS BIGINT) AS n_merged,
             ROUND(SUM(len(string_split(r3.s, '␟'))) /
                   CAST(SUM(len(string_split(d.text, ' '))) AS DOUBLE), 4)
               AS compression
      FROM r3 JOIN documents d USING (doc_id)
      GROUP BY d.source ORDER BY d.source"""))

  /** Token-budget water-filling at 60% of corpus mass
    * (QualityModels.budgetWaterfill): the cap level t* with
    * Σ min(tokens, t*) <= budget, allocated per source — the sampling
    * plan that maximizes the minimum source share under a budget.
    * Closed-form over the sources-sized frame; all-integer arithmetic,
    * exact cross-engine. */
  val q189 = Q(
    "q189_token_budget_fill",
    (s, d) => QualityModels.budgetWaterfill(
      Tables.documents(s, d), "source", "text", budgetFrac = 0.6),
    Some("""
      WITH s AS (SELECT source,
                        CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
                 FROM documents GROUP BY source),
      b AS (SELECT CAST(FLOOR(0.6 * SUM(tokens)) AS BIGINT) AS budget,
                   COUNT(*) AS n FROM s),
      r AS (SELECT source, tokens,
                   ROW_NUMBER() OVER (ORDER BY tokens, source) AS k,
                   COALESCE(SUM(tokens) OVER (ORDER BY tokens, source
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix,
                   COALESCE(LAG(tokens) OVER (ORDER BY tokens, source), 0) AS prev_t
            FROM s),
      t AS (SELECT CAST(MAX(cand) AS BIGINT) AS threshold FROM (
              SELECT CAST(FLOOR((b.budget - r.prefix) / (b.n - r.k + 1)) AS BIGINT) AS cand,
                     r.prev_t
              FROM r, b) c
            WHERE cand >= prev_t)
      SELECT s.source, s.tokens,
             LEAST(s.tokens, t.threshold) AS alloc,
             s.tokens > t.threshold AS capped,
             t.threshold
      FROM s, t ORDER BY s.source"""))

  /** Classifier-based quality filter (fastText-style): logistic
    * regression fit by 3 full-batch gradient steps on (ln chars,
    * ln tokens) with the is-English label as the target proxy, then
    * every document scored and the keep decision taken on the rounded
    * score. The oracle unrolls the 3 training rounds as CTE layers —
    * the same replayed-iteration device as the k-means/BPE oracles. */
  val q200 = Q(
    "q200_logreg_quality",
    (s, d) => {
      val docs = Tables.documents(s, d)
      QualityModels.logregQualityScores(docs, "doc_id",
        col("lang") === "en", "n_chars", "text", rounds = 3, lr = 1.0)
        .orderBy("doc_id")
    },
    Some("""
      WITH f AS (SELECT doc_id,
                   CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
                   ln(1.0 + CAST(n_chars AS DOUBLE)) AS f1,
                   ln(1.0 + CAST(len(string_split(text, ' ')) AS DOUBLE)) AS f2
                 FROM documents),
      u0 AS (SELECT 0.0 AS a, 0.0 AS b, 0.0 AS c),
      r1 AS (SELECT avg(y - 1/(1+exp(-(a + b*f1 + c*f2)))) AS g0,
                    avg((y - 1/(1+exp(-(a + b*f1 + c*f2)))) * f1) AS g1,
                    avg((y - 1/(1+exp(-(a + b*f1 + c*f2)))) * f2) AS g2,
                    any_value(a) AS a, any_value(b) AS b, any_value(c) AS c
             FROM f, u0),
      u1 AS (SELECT a + 1.0*g0 AS a, b + 1.0*g1 AS b, c + 1.0*g2 AS c FROM r1),
      r2 AS (SELECT avg(y - 1/(1+exp(-(a + b*f1 + c*f2)))) AS g0,
                    avg((y - 1/(1+exp(-(a + b*f1 + c*f2)))) * f1) AS g1,
                    avg((y - 1/(1+exp(-(a + b*f1 + c*f2)))) * f2) AS g2,
                    any_value(a) AS a, any_value(b) AS b, any_value(c) AS c
             FROM f, u1),
      u2 AS (SELECT a + 1.0*g0 AS a, b + 1.0*g1 AS b, c + 1.0*g2 AS c FROM r2),
      r3 AS (SELECT avg(y - 1/(1+exp(-(a + b*f1 + c*f2)))) AS g0,
                    avg((y - 1/(1+exp(-(a + b*f1 + c*f2)))) * f1) AS g1,
                    avg((y - 1/(1+exp(-(a + b*f1 + c*f2)))) * f2) AS g2,
                    any_value(a) AS a, any_value(b) AS b, any_value(c) AS c
             FROM f, u2),
      u3 AS (SELECT a + 1.0*g0 AS a, b + 1.0*g1 AS b, c + 1.0*g2 AS c FROM r3)
      SELECT CAST(f.doc_id AS BIGINT) AS doc_id,
             ROUND(1/(1+exp(-(a + b*f1 + c*f2))), 4) AS score,
             ROUND(1/(1+exp(-(a + b*f1 + c*f2))), 4) >= 0.5 AS keep
      FROM f, u3 ORDER BY doc_id"""))

  def all: Seq[Q] = Seq(q156, q157, q158, q159, q160, q161, q162, q164, q165,
    q167, q177, q181, q182, q186, q189, q200)
}

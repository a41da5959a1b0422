package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-pipeline operators over the `documents` table: token statistics,
  * quality scoring, exact deduplication, fingerprinting (the
  * training-data-pipeline extensions; SURVEY.md §7 north-star list).
  *
  * Scale notes: everything here is embarrassingly parallel per document
  * except the dedup group-bys, which shuffle on text/hash — at 100 TB the
  * group key would be the 128-bit fingerprint (fixed width) rather than
  * the raw text; q_dedup_* below group by md5 for that reason.
  */
object TextQueries {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")
  private val stopList  = stopwords.map(w => s"'$w'").mkString(", ")

  /** Token counting — whitespace tokenization. Documents are single-space
    * word bags, so a literal-space split is semantics-identical in both
    * engines. */
  val q28 = Q(
    "q28_token_count",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          length(col("text")).cast("long").as("len_chars"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS len_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents ORDER BY doc_id"""))

  /** Quality scoring: stopword ratio + vocabulary diversity. Ratios are
    * double divisions of exact integers — deterministic. */
  val q29 = Q(
    "q29_doc_quality",
    (s, d) => {
      val toks = split(lower(col("text")), " ")
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          size(filter(toks, t => t.isin(stopwords: _*))).cast("long").as("n_stop"),
          size(array_distinct(toks)).cast("long").as("n_uniq"))
        .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
        .withColumn("uniq_ratio", col("n_uniq").cast("double") / col("n_tokens"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(toks, x -> x IN ($stopList))) AS BIGINT) AS n_stop,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
             CAST(len(list_filter(toks, x -> x IN ($stopList))) AS DOUBLE) / len(toks) AS stop_ratio,
             CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio
      FROM t ORDER BY doc_id"""))

  /** Corpus profile per language label (group-by over doc metadata). */
  val q30 = Q(
    "q30_lang_profile",
    (s, d) =>
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))
        .orderBy("lang"),
    Some("""
      SELECT lang, COUNT(*) AS n_docs, COUNT(DISTINCT source) AS n_sources,
             MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
             CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_chars
      FROM documents GROUP BY lang ORDER BY lang"""))

  /** Exact-duplicate groups: hash-groupBy dedup (the md5 is the group
    * fingerprint that would replace the raw text as shuffle key at
    * scale). */
  val q31 = Q(
    "q31_exact_dup_groups",
    (s, d) =>
      graft.operators.Dedup
        .exactDuplicateGroups(Tables.documents(s, d), "doc_id", "text")
        .orderBy("fingerprint"),
    Some("""
      SELECT md5(text) AS fingerprint, COUNT(*) AS copies, MIN(doc_id) AS keeper
      FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1
      ORDER BY fingerprint"""))

  /** Exact dedup, keep-first policy: rows that would be dropped. The
    * window keys on md5(text) — 16-byte shuffle/sort keys, not whole
    * documents (see Dedup.dropExactDuplicates). */
  val q32 = Q(
    "q32_dedup_drops",
    (s, d) => {
      val w = Window.partitionBy(md5(col("text")))
      Tables.documents(s, d)
        .withColumn("keeper", min(col("doc_id")).over(w))
        .filter(col("doc_id") =!= col("keeper"))
        .select("doc_id", "keeper")
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id, keeper FROM (
        SELECT doc_id, MIN(doc_id) OVER (PARTITION BY text) AS keeper
        FROM documents) t
      WHERE doc_id <> keeper ORDER BY doc_id"""))

  /** Document fingerprinting: md5 over whitespace-normalized lowercase
    * text (DuckDB regexp_replace needs the 'g' flag for global). */
  val q33 = Q(
    "q33_fingerprint",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      FROM documents ORDER BY doc_id"""))

  /** Language identification via corpus-trained token profiles (n-gram
    * heuristic classifier, trained and applied in one relational plan):
    *
    *  1. per-(lang, token) counts vs per-token totals → distinctiveness
    *     ratio; top-20 marker tokens per language (ties → token asc);
    *  2. each document scores one point per token occurrence that is a
    *     marker of a language; predicted = argmax score (ties → lang asc);
    *  3. output is the confusion matrix (true lang × predicted).
    *
    * All scoring is integer counting; the only double (the marker ratio)
    * is a single division of identical integers in both engines. At
    * 100 TB the profile build is a two-pass aggregate over fixed-width
    * keys, the markers table is tiny and broadcast, and scoring is
    * map-side — no quadratic stage anywhere.
    */
  val q41 = Q(
    "q41_lang_id",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          explode(split(lower(col("text")), " ")).as("tok"))
      val byLang = toks.groupBy("lang", "tok").agg(count(lit(1)).as("c_lt"))
      // c_t = Σ_lang c_lt: derive the global counts from the (lang, tok)
      // aggregate instead of re-shuffling the full token stream — one
      // corpus-wide aggregation replaced by a vocab-sized re-agg
      val byTok = byLang.groupBy("tok").agg(sum("c_lt").as("c_t"))
      val wm = Window.partitionBy("lang").orderBy(desc("ratio"), asc("tok"))
      // ≤ 20 rows per language — broadcast so doc scoring stays map-side
      val markers = broadcast(byLang.join(byTok, "tok")
        .withColumn("ratio", col("c_lt").cast("double") / col("c_t"))
        .withColumn("rk", row_number().over(wm))
        .filter(col("rk") <= 20)
        .select(col("lang").as("marker_lang"), col("tok")))
      val wd = Window.partitionBy("doc_id").orderBy(desc("score"), asc("marker_lang"))
      toks.join(markers, "tok")
        .groupBy("doc_id", "lang", "marker_lang")
        .agg(count(lit(1)).as("score"))
        .withColumn("rk", row_number().over(wd))
        .filter(col("rk") === 1)
        .groupBy(col("lang"), col("marker_lang").as("predicted"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "predicted")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, lang, tok
        FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS ts FROM documents) t,
             LATERAL (SELECT UNNEST(ts) AS tok) u),
      by_lang AS (SELECT lang, tok, COUNT(*) AS c_lt FROM toks GROUP BY 1, 2),
      by_tok  AS (SELECT tok, COUNT(*) AS c_t FROM toks GROUP BY 1),
      markers AS (
        SELECT lang AS marker_lang, tok FROM (
          SELECT l.lang, l.tok,
                 ROW_NUMBER() OVER (
                   PARTITION BY l.lang
                   ORDER BY CAST(l.c_lt AS DOUBLE) / t.c_t DESC, l.tok) AS rk
          FROM by_lang l JOIN by_tok t ON l.tok = t.tok) x
        WHERE rk <= 20),
      scores AS (
        SELECT t.doc_id, t.lang, m.marker_lang, COUNT(*) AS score
        FROM toks t JOIN markers m ON t.tok = m.tok
        GROUP BY 1, 2, 3),
      pred AS (
        SELECT doc_id, lang, marker_lang FROM (
          SELECT doc_id, lang, marker_lang,
                 ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, marker_lang) AS rk
          FROM scores) x
        WHERE rk = 1)
      SELECT lang, marker_lang AS predicted, COUNT(*) AS n_docs
      FROM pred GROUP BY 1, 2 ORDER BY lang, predicted"""))

  /** BPE-ish piece tokenization: regex alternation over letter runs,
    * digit runs, and single other symbols — the shape of a byte-pair
    * pre-tokenizer's first split. Same pattern semantics in Java regex
    * and RE2 (plain character classes, no lookaround). */
  val q43 = Q(
    "q43_bpe_pieces",
    (s, d) => {
      val pieces = regexp_extract_all(
        col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(pieces).cast("long").as("n_pieces"),
          size(array_distinct(pieces)).cast("long").as("n_uniq_pieces"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_pieces,
             CAST(len(list_distinct(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS n_uniq_pieces
      FROM documents ORDER BY doc_id"""))

  /** Polynomial rolling hash over the token stream (Rabin-Karp shape):
    * h = (h*31 + len(tok)*131 + ascii(first char)) mod 1e9+7, folded
    * left-to-right — order-sensitive, so permuted documents hash apart
    * while byte-identical ones collide. All-integer math in both
    * engines; h < 2^30 keeps every intermediate far from overflow. */
  val q44 = Q(
    "q44_rolling_hash",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          expr("""aggregate(
                    transform(split(text, ' '),
                              t -> CAST(length(t) AS BIGINT) * 131 + ascii(t)),
                    CAST(0 AS BIGINT),
                    (a, b) -> (a * 31 + b) % 1000000007)""").as("rh"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(text, ' '),
                                t -> CAST(length(t) AS BIGINT) * 131 + ascii(t))),
               (a, b) -> (a * 31 + b) % 1000000007) AS rh
      FROM documents ORDER BY doc_id"""))

  /** Text canonicalization for fuzzy-exact dedup: lowercase, mask digit
    * runs, strip punctuation, collapse whitespace — then fingerprint the
    * canonical form. Docs whose canonical md5 collides are
    * format-variant duplicates that byte-exact dedup (q31) misses.
    * Regex replace is global in Spark by default; the oracle passes 'g'.
    */
  val q52 = Q(
    "q52_canonical_fp",
    (s, d) => {
      val canon = trim(regexp_replace(regexp_replace(regexp_replace(
        lower(col("text")), "[0-9]+", "0"), "[^a-z0-9 ]", " "), " +", " "))
      Tables.documents(s, d)
        .select(col("doc_id"), canon.as("canon"))
        .select(col("doc_id"), md5(col("canon")).as("canon_fp"),
          size(split(col("canon"), " ")).cast("long").as("n_canon_tokens"))
        .orderBy("doc_id")
    },
    Some("""
      WITH c AS (SELECT doc_id,
                        trim(regexp_replace(regexp_replace(regexp_replace(
                          lower(text), '[0-9]+', '0', 'g'),
                          '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS canon
                 FROM documents)
      SELECT doc_id, md5(canon) AS canon_fp,
             CAST(len(string_split(canon, ' ')) AS BIGINT) AS n_canon_tokens
      FROM c ORDER BY doc_id"""))

  /** TF-IDF top terms: the 3 highest-scoring terms per document, score =
    * tf * ln(N / df). Scores are rounded to 4dp BEFORE ranking (ln may
    * differ in the last ulp across engines) and ties break on the term
    * itself, so the top-3 set is deterministic. */
  val q53 = Q(
    "q53_tfidf_top_terms",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("term"))
      val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.select(count(lit(1)).as("n_docs"))
      val scored = tf.join(df, "term").crossJoin(broadcast(n))
        .withColumn("score",
          round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("term"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank").cast("long").as("rank"),
          col("term"), col("score"))
        .orderBy("doc_id", "rank")
    },
    Some("""
      WITH toks AS (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS term
                    FROM documents),
      tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT COUNT(*) AS n_docs FROM documents),
      scored AS (SELECT tf.doc_id, tf.term,
                        ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS score
                 FROM tf JOIN df USING (term), n),
      ranked AS (SELECT doc_id, term, score,
                        ROW_NUMBER() OVER (PARTITION BY doc_id
                          ORDER BY score DESC, term) AS rank
                 FROM scored)
      SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, score
      FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank"""))

  /** Repetition ratio (a Gopher-style quality signal): the fraction of a
    * document's word bigrams that are repeats of an earlier bigram.
    * Exact-integer ratio — deterministic across engines. */
  val q54 = Q(
    "q54_repetition_ratio",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"),
          expr("transform(sequence(0, size(toks) - 2), i -> array_join(slice(toks, i + 1, 2), ' '))")
            .as("bigrams"))
        .select(col("doc_id"),
          size(col("bigrams")).cast("long").as("n_bigrams"),
          size(array_distinct(col("bigrams"))).cast("long").as("n_distinct"))
        .withColumn("rep_ratio",
          round(lit(1.0) - col("n_distinct").cast("double") / col("n_bigrams"), 4))
        .orderBy("doc_id"),
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      b AS (SELECT doc_id,
                   list_transform(range(0, len(toks) - 1),
                     i -> array_to_string(toks[i+1:i+2], ' ')) AS bigrams
            FROM t WHERE len(toks) >= 2)
      SELECT doc_id, CAST(len(bigrams) AS BIGINT) AS n_bigrams,
             CAST(len(list_distinct(bigrams)) AS BIGINT) AS n_distinct,
             ROUND(1.0 - CAST(len(list_distinct(bigrams)) AS DOUBLE) / len(bigrams), 4) AS rep_ratio
      FROM b ORDER BY doc_id"""))

  /** PMI (pointwise mutual information) collocations over the corpus —
    * the classic phrase-mining signal. All counts are exact integers;
    * the only float step is one ln over a ratio whose operands are
    * built with the SAME left-to-right multiplication order on both
    * engines (products stay inside the exactly-representable double
    * range at these scales), so the 4 dp round is stable. Selection
    * and ordering rank on the integer count, never the float score. */
  val q132 = Q(
    "q132_pmi_bigrams",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(split(col("text"), " ").as("toks"))
      val uni = toks.select(explode(col("toks")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      val bi = toks.filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i + 1] AS w2))")).as("b"))
        .select(col("b.w1"), col("b.w2"))
      val bcnt = bi.groupBy("w1", "w2").agg(count(lit(1)).as("n"))
      val totals = broadcast(
        uni.agg(sum("c").as("nu")).crossJoin(bi.agg(count(lit(1)).as("nb"))))
      bcnt
        .join(broadcast(uni.select(col("w").as("w1"), col("c").as("cx"))), "w1")
        .join(broadcast(uni.select(col("w").as("w2"), col("c").as("cy"))), "w2")
        .crossJoin(totals)
        .filter(col("n") >= 5)
        .select(col("w1"), col("w2"), col("n"),
          round(log(col("n").cast("double") * col("nu") * col("nu") /
            (col("nb").cast("double") * col("cx") * col("cy"))), 4).as("pmi"))
        .orderBy(col("n").desc, col("w1"), col("w2"))
        .limit(50)
    },
    Some("""
      WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
      tf AS (SELECT toks FROM t WHERE len(toks) >= 2),
      uni AS (SELECT UNNEST(toks) AS w FROM t),
      ucnt AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
      bi AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
             FROM tf, LATERAL (SELECT UNNEST(range(1, len(toks))) AS i) g),
      bcnt AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n FROM bi GROUP BY w1, w2),
      tot AS (SELECT (SELECT COUNT(*) FROM uni) AS nu,
                     (SELECT COUNT(*) FROM bi) AS nb)
      SELECT w1, w2, n,
             ROUND(LN(CAST(n AS DOUBLE) * nu * nu /
                      (CAST(nb AS DOUBLE) * cx.c * cy.c)), 4) AS pmi
      FROM bcnt JOIN ucnt cx ON cx.w = bcnt.w1
                JOIN ucnt cy ON cy.w = bcnt.w2, tot
      WHERE n >= 5
      ORDER BY n DESC, w1, w2 LIMIT 50"""))

  /** Unicode NFC canonicalization (graft.functions.UnicodeNormalize — a
    * codegen'd Catalyst expression; DuckDB's nfc_normalize is the
    * oracle). The corpus is ASCII, so each text gets a suffix of
    * DECOMPOSED accents (combining marks, written as \\u escapes so both
    * engines receive identical codepoints); NFC must compose them —
    * len_nfc < len_raw — and the md5 of the composed form must agree
    * byte-for-byte across engines. Canonicalizing before hashing is what
    * makes dedup robust to visually-identical-but-differently-encoded
    * text. */
  val q135 = Q(
    "q135_unicode_nfc",
    (s, d) => {
      val decomposed = concat(col("text"), lit(" café élève"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          length(decomposed).cast("long").as("len_raw"),
          length(graft.functions.textnorm.nfc(decomposed)).cast("long").as("len_nfc"),
          md5(graft.functions.textnorm.nfc(decomposed)).as("fp"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(length(decomposed) AS BIGINT) AS len_raw,
             CAST(length(nfc_normalize(decomposed)) AS BIGINT) AS len_nfc,
             md5(nfc_normalize(decomposed)) AS fp
      FROM (SELECT doc_id, text || ' café élève' AS decomposed
            FROM documents) t
      ORDER BY doc_id"""))

  /** Zipf-law fit over the corpus vocabulary: regression slope of
    * ln(freq) on ln(rank) for the top-1000 tokens — the standard
    * sanity check that a corpus has natural-language token statistics
    * (clean text ≈ -1; templated/synthetic text drifts off). The rank
    * window is global but VOCABULARY-sized (the corpus was already
    * reduced by the frequency aggregate), so the single-partition sort
    * is bounded at any corpus scale. Rank ties break on the token so
    * both engines fit the same 1000 points; the slope is one distributed
    * float fold, rounded to 4dp at the edge. */
  val q144 = Q(
    "q144_zipf_slope",
    (s, d) => {
      val freq = Tables.documents(s, d)
        .select(explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("tok").agg(count(lit(1)).as("n"))
      freq
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("n").desc, col("tok"))))
        .filter(col("rank") <= 1000)
        .agg(count(lit(1)).as("n_points"),
          round(regr_slope(log(col("n")), log(col("rank"))), 4).as("zipf_slope"))
    },
    Some("""
      WITH toks AS (SELECT UNNEST(string_split(lower(text), ' ')) AS tok FROM documents),
      f AS (SELECT tok, COUNT(*) AS n FROM toks WHERE tok <> '' GROUP BY tok),
      r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rank FROM f
            QUALIFY rank <= 1000)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
             ROUND(regr_slope(ln(n), ln(rank)), 4) AS zipf_slope
      FROM r"""))

  /** Vocabulary-coverage curve: the smallest frequency-ranked vocabulary
    * covering 50/75/90/95/99% of token mass — the sizing question every
    * tokenizer build answers first. Scale shape: the global window runs
    * over the AGGREGATED vocab frame (distinct tokens, ≪ corpus; Heaps'
    * law keeps it sublinear), never the token stream; the corpus-sized
    * stage is the partial-aggregated groupBy(tok). At extreme vocab
    * cardinality the rank window would move to a partitioned prefix-sum,
    * but the frame it sorts is bounded by vocabulary, not data volume. */
  val q173 = Q(
    "q173_vocab_coverage",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("tok"))
      val freq = Tables.documents(s, d)
        .select(explode(split(lower(col("text")), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      freq
        .withColumn("rank", row_number().over(w))
        .withColumn("cum", sum("cnt").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total", sum("cnt").over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("rank"), col("cum"), col("total"),
          explode(array(Seq(0.5, 0.75, 0.9, 0.95, 0.99).map(lit): _*)).as("threshold"))
        .filter(col("cum").cast("double") >= col("threshold") * col("total"))
        .groupBy("threshold")
        .agg(min(col("rank")).cast("long").as("vocab_size"),
          min(col("cum")).as("covered_tokens"),
          max(col("total")).as("total_tokens"))
        .orderBy("threshold")
    },
    Some("""
      WITH toks AS (SELECT UNNEST(string_split(lower(text), ' ')) AS tok FROM documents),
      f AS (SELECT tok, COUNT(*) AS cnt FROM toks WHERE tok <> '' GROUP BY tok),
      r AS (SELECT cnt, tok,
                   ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rank,
                   SUM(cnt) OVER (ORDER BY cnt DESC, tok
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                   SUM(cnt) OVER () AS total
            FROM f),
      t AS (SELECT CAST(UNNEST([0.5, 0.75, 0.9, 0.95, 0.99]) AS DOUBLE) AS threshold)
      SELECT threshold, CAST(MIN(rank) AS BIGINT) AS vocab_size,
             CAST(MIN(cum) AS BIGINT) AS covered_tokens,
             CAST(MAX(total) AS BIGINT) AS total_tokens
      FROM r, t WHERE CAST(cum AS DOUBLE) >= threshold * total
      GROUP BY threshold ORDER BY threshold"""))

  /** Per-source document caps (domain balancing): rank docs within each
    * source by lexical diversity and cap the source at its 10 best — the
    * "no domain dominates the mixture" pass pretraining corpora apply
    * after dedup. One hash-partitioned window per source; nothing global. */
  val q174 = Q(
    "q174_source_caps",
    (s, d) => {
      val toks = split(lower(col("text")), " ")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("uniq_ratio").desc, col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"),
          (size(array_distinct(toks)).cast("double") / size(toks)).as("uniq_ratio"))
        .withColumn("rk", row_number().over(w))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("rk") <= 10, 1)).as("n_kept"),
          sum(when(col("rk") <= 10, col("n_chars"))).as("kept_chars"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy("source")
    },
    Some("""
      WITH scored AS (
        SELECT doc_id, source, n_chars,
               CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE)
                 / len(string_split(lower(text), ' ')) AS uniq_ratio
        FROM documents),
      r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                         ORDER BY uniq_ratio DESC, doc_id) AS rk
            FROM scored)
      SELECT source, COUNT(*) AS n_docs,
             COUNT(CASE WHEN rk <= 10 THEN 1 END) AS n_kept,
             CAST(SUM(CASE WHEN rk <= 10 THEN n_chars END) AS BIGINT) AS kept_chars,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM r GROUP BY source ORDER BY source"""))

  /** Retrieval chunking: overlapping 50-token windows at stride 25 with
    * offsets and a chunk fingerprint — the doc→chunk explode feeding a RAG
    * embedding pipeline (vs q77's disjoint chunks, which feed dedup).
    * Start grid: multiples of 25 below max(n-25, 1), so the last window
    * always reaches the document tail and short docs emit exactly one
    * chunk. Fully narrow — no shuffle; the fan-out is bounded by n/25
    * chunks per doc. */
  val q175 = Q(
    "q175_rag_chunks",
    (s, d) =>
      graft.operators.CorpusPipeline
        .ragChunks(Tables.documents(s, d), "doc_id", "text",
          chunkTokens = 50, stride = 25)
        .orderBy("doc_id", "chunk_idx"),
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
                        len(string_split(text, ' ')) AS n
                 FROM documents)
      SELECT doc_id,
             CAST(start // 25 AS BIGINT) AS chunk_idx,
             CAST(start AS BIGINT) AS start_tok,
             CAST(least(50, n - start) AS BIGINT) AS chunk_tokens,
             md5(array_to_string(toks[start + 1 : start + 50], ' ')) AS chunk_fp
      FROM t, LATERAL (SELECT UNNEST(range(0, greatest(n - 25, 1), 25)) AS start) u
      ORDER BY doc_id, chunk_idx"""))

  /** Within-source boilerplate detection: 8-grams shared by ≥2 distinct
    * documents of the same source are template text (headers, footers,
    * injected nav) — the C4-style repetition pass, adapted to word-bag
    * docs at n-gram granularity. Scale shape: the shuffle key is
    * (source, md5(gram)) — fixed width, never the raw n-gram string —
    * and the per-doc DISTINCT is applied before the corpus-wide count so
    * in-doc repetition can't inflate document frequency. */
  val q176 = Q(
    "q176_boilerplate_grams",
    (s, d) =>
      graft.operators.CorpusPipeline
        .boilerplateGrams(
          Tables.documents(s, d).transform(Tables.spread("doc_id")),
          "doc_id", "source", "text", n = 8, minDocs = 2)
        .groupBy("source")
        .agg(count(lit(1)).as("n_boiler_grams"), max("n_docs").as("max_doc_freq"))
        .orderBy("source"),
    Some("""
      WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
                 WHERE len(string_split(text, ' ')) >= 8),
      g AS (SELECT DISTINCT doc_id, source,
                   md5(array_to_string(toks[i + 1 : i + 8], ' ')) AS gram_h
            FROM t, LATERAL (SELECT UNNEST(range(0, len(toks) - 7)) AS i) u),
      b AS (SELECT source, gram_h, COUNT(*) AS n_docs
            FROM g GROUP BY 1, 2 HAVING COUNT(*) >= 2)
      SELECT source, COUNT(*) AS n_boiler_grams, CAST(MAX(n_docs) AS BIGINT) AS max_doc_freq
      FROM b GROUP BY source ORDER BY source"""))

  def all: Seq[Q] =
    Seq(q28, q29, q30, q31, q32, q33, q41, q43, q44, q52, q53, q54, q132, q135,
      q144, q173, q174, q175, q176)
}

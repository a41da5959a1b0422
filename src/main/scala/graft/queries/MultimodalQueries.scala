package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Oracle-able slice of the multimodal plumbing (graft.operators
  * .Multimodal): documents wrapped as opaque binary payloads + typed
  * metadata, with byte-level features computed natively. The decoder
  * stages (stubbed codec) are exercised by MultimodalSpec; this query
  * pins the binary column handling itself — encode, octet length, digest,
  * binary substring — against DuckDB on the same bytes.
  */
object MultimodalQueries {

  val q42 = Q(
    "q42_multimodal_bytes",
    (s, d) => {
      val media = Multimodal.fromDocuments(Tables.documents(s, d))
      media.select(
        col("media_id"),
        col("meta.fmt").as("fmt"),
        col("meta.n_bytes").as("n_bytes"),
        md5(col("content")).as("digest"),
        // head bytes of the first 8 CHARACTERS: decode → slice → encode.
        // Slicing the binary directly would count BYTES and split a
        // multi-byte codepoint the moment the corpus stops being pure
        // ASCII, while the oracle's substr(text, ...) counts characters.
        lower(hex(encode(
          substring(decode(col("content"), "UTF-8"), 1, 8), "UTF-8"))).as("head_hex"))
        .orderBy("media_id")
    },
    Some("""
      SELECT doc_id AS media_id, 'txt' AS fmt,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             md5(text) AS digest,
             lower(hex(encode(substr(text, 1, 8)))) AS head_hex
      FROM documents ORDER BY media_id"""))

  /** Media near-dup by frame-set Jaccard (Multimodal.nearDupMedia over
    * the documents-as-binary table): the video-dedup shape — fixed
    * 64-byte "frames", md5-of-hex fingerprints (byte-lossless hex
    * detour because DuckDB's md5 is VARCHAR-only; the oracle slices the
    * hex STRING at 128-char stride, which is exactly the byte-aligned
    * frame's hex since DuckDB 1.0 can't slice blobs). Exact set Jaccard.
    * Near-dup documents share long byte prefixes, so their frame sets
    * overlap — the planted pairs surface here just like in q36. */
  val q142 = Q(
    "q142_media_neardup",
    (s, d) => {
      val media = Multimodal.fromDocuments(Tables.documents(s, d))
        .transform(Tables.spread("media_id"))
      Multimodal.nearDupMedia(media, frameBytes = 64, stride = 1, threshold = 0.3)
        .select(col("media_a"), col("media_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("media_a", "media_b")
    },
    Some("""
      WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS h FROM documents),
      fr AS (SELECT media_id,
                    md5(substr(h, i * 128 + 1, 128)) AS fp
             FROM m, LATERAL (SELECT UNNEST(range(0,
                    CAST(ceil(length(h) / 128.0) AS INT))) AS i) g
             WHERE length(h) > 0),
      fps AS (SELECT DISTINCT media_id, fp FROM fr),
      sizes AS (SELECT media_id, COUNT(*) AS n FROM fps GROUP BY 1),
      inter AS (SELECT a.media_id AS media_a, b.media_id AS media_b, COUNT(*) AS i
                FROM fps a JOIN fps b ON a.fp = b.fp AND a.media_id < b.media_id
                GROUP BY 1, 2)
      SELECT media_a, media_b,
             ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jaccard
      FROM inter JOIN sizes sa ON media_a = sa.media_id
                 JOIN sizes sb ON media_b = sb.media_id
      WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.3
      ORDER BY media_a, media_b"""))

  /** Media ANN: embed every media item (16-dim hex-digit histogram of
    * its sampled frames, integer-exact pooling — the stub for a frame
    * encoder), broadcast the query item's vector, rank by cosine — the
    * full media → embedding → similarity-search composition, with the
    * same map-only + k-row-reduce plan as q34. Counts are exact
    * integers on both engines, so only the final cosine needs the 4dp
    * round. */
  val q147 = Q(
    "q147_media_embed_ann",
    (s, d) => {
      import graft.functions.vec
      val media = Multimodal.fromDocuments(Tables.documents(s, d))
        .transform(Tables.spread("media_id"))
      val emb = Multimodal.hexHistogramEmbedding(media, frameBytes = 64, stride = 4)
        .withColumn("vd", expr("transform(v, x -> CAST(x AS DOUBLE))"))
        .filter(vec.norm(col("vd")) > 0)
      val q = emb.filter(col("media_id") === 0)
        .select(col("vd").as("qv"))
      emb.filter(col("media_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("media_id"),
          round(vec.cosine(col("vd"), col("qv")), 4).as("sim"))
        .orderBy(col("sim").desc, col("media_id"))
        .limit(5)
    },
    Some("""
      WITH m AS (SELECT doc_id AS media_id, hex(encode(text)) AS h FROM documents),
      fr AS (SELECT media_id, substr(h, i * 128 + 1, 128) AS fh
             FROM m, LATERAL (SELECT UNNEST(range(0,
                    CAST(ceil(length(h) / 128.0) AS INT))) AS i) g
             WHERE length(h) > 0 AND i % 4 = 0),
      digits AS (SELECT UNNEST(range(0, 16)) AS j,
                        UNNEST(string_split('0,1,2,3,4,5,6,7,8,9,A,B,C,D,E,F', ',')) AS dch),
      cnt AS (SELECT media_id, j,
                     SUM(length(fh) - length(replace(fh, dch, ''))) AS c
              FROM fr, digits GROUP BY 1, 2),
      emb AS (SELECT media_id, list(CAST(c AS DOUBLE) ORDER BY j) AS v
              FROM cnt GROUP BY 1
              HAVING list_sum(list_transform(list(CAST(c AS DOUBLE) ORDER BY j), x -> x * x)) > 0),
      q AS (SELECT v AS qv FROM emb WHERE media_id = 0)
      SELECT e.media_id, ROUND(list_cosine_similarity(e.v, q.qv), 4) AS sim
      FROM emb e, q
      WHERE e.media_id <> 0
      ORDER BY sim DESC, media_id
      LIMIT 5"""))

  def all: Seq[Q] = Seq(q42, q142, q147)
}

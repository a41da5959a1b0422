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

  def all: Seq[Q] = Seq(q42)
}

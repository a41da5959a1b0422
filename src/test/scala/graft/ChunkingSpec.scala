package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusPipeline

/** Contracts for the RAG chunker and the boilerplate-gram detector that
  * the DuckDB oracles (q175/q176) cannot express: full-coverage of the
  * start grid for EVERY document length, and the per-doc-distinct rule
  * that keeps in-doc repetition from counting as boilerplate.
  */
class ChunkingSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def doc(n: Int): (Long, String) =
    (n.toLong, (0 until n).map(i => s"t$i").mkString(" "))

  test("ragChunks covers every token for every doc length; last window reaches the tail") {
    val docs = (1 to 120).map(doc).toDF("doc_id", "text")
    val chunks = CorpusPipeline.ragChunks(docs, "doc_id", "text", 50, 25)
      .collect().groupBy(_.getLong(0))
    (1 to 120).foreach { n =>
      val ch = chunks(n.toLong).map(r =>
        (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
      // chunk_idx dense from 0, starts on the stride grid
      assert(ch.map(_._1).toSeq == ch.indices.map(_.toLong).toSeq, s"n=$n")
      ch.foreach { case (idx, start, len) =>
        assert(start == idx * 25 && len > 0 && len <= 50, s"n=$n $ch")
      }
      // union of [start, start+len) covers [0, n) with no gap
      val covered = ch.flatMap { case (_, s, l) => s until (s + l) }.toSet
      assert(covered == (0L until n.toLong).toSet, s"n=$n coverage hole")
      // the final window ends exactly at the tail
      assert(ch.map { case (_, s, l) => s + l }.max == n.toLong, s"n=$n tail")
      // short docs emit exactly one chunk
      if (n <= 25) assert(ch.length == 1, s"n=$n")
    }
  }

  test("ragChunks holds the same coverage contract for a non-default size/stride") {
    val docs = (1 to 40).map(doc).toDF("doc_id", "text")
    val chunks = CorpusPipeline.ragChunks(docs, "doc_id", "text", 8, 3)
      .collect().groupBy(_.getLong(0))
    (1 to 40).foreach { n =>
      val ch = chunks(n.toLong).map(r => (r.getLong(2), r.getLong(3)))
      val covered = ch.flatMap { case (s, l) => s until (s + l) }.toSet
      assert(covered == (0L until n.toLong).toSet, s"n=$n coverage hole")
      assert(ch.map { case (s, l) => s + l }.max == n.toLong, s"n=$n tail")
    }
  }

  test("ragChunks fingerprint is the md5 of the space-joined window") {
    val docs = Seq(doc(60)).toDF("doc_id", "text")
    val fp = CorpusPipeline.ragChunks(docs, "doc_id", "text", 50, 25)
      .filter(col("chunk_idx") === 1).select("chunk_fp").as[String].head()
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest((25 until 60).map(i => s"t$i").mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(fp == expected)
  }

  test("boilerplateGrams flags cross-doc templates only — in-doc repetition never counts") {
    val template = (0 until 8).map(i => s"tpl$i").mkString(" ")
    val rows = Seq(
      // srcA: three docs share the template at different positions
      (1L, "srcA", s"$template a1 a2 a3"),
      (2L, "srcA", s"b1 b2 $template b3"),
      (3L, "srcA", s"c1 c2 c3 c4 $template"),
      // srcB: unique docs, no shared 8-gram
      (4L, "srcB", (0 until 12).map(i => s"u$i").mkString(" ")),
      (5L, "srcB", (0 until 12).map(i => s"v$i").mkString(" ")),
      // srcC: ONE doc repeating the template twice — per-doc distinct
      // means document frequency stays 1, below minDocs
      (6L, "srcC", s"$template x1 $template"),
      (7L, "srcC", (0 until 12).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val grams = CorpusPipeline
      .boilerplateGrams(rows, "doc_id", "source", "text", n = 8, minDocs = 2)
      .collect()
    assert(grams.nonEmpty)
    assert(grams.forall(_.getString(0) == "srcA"), grams.mkString(","))
    // the template 8-gram itself is in all three srcA docs
    assert(grams.exists(_.getLong(2) == 3L), grams.mkString(","))
  }
}

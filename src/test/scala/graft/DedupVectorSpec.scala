package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupVectorSpec extends AnyFunSuite with SparkSpec {

  test("hashedDocVectors: bag-of-words invariance, content determinism, nnz/l2 sanity") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "beta alpha alpha gamma"), // permutation of 1 → same vector
      (3L, "alpha beta gamma alpha"), // identical text → same vector
      (4L, "delta epsilon zeta")).toDF("doc_id", "text")
    val out = Dedup.hashedDocVectors(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getString(3)))).toMap
    assert(out(1L) == out(2L)) // word order can't matter
    assert(out(1L) == out(3L)) // content-deterministic
    assert(out(1L) != out(4L))
    // nnz bounded by distinct tokens; l2^2 is an integer by
    // construction (up to the 4-dp rounding of l2 itself)
    assert(out(1L)._1 <= 3)
    val l2sq = out(1L)._2 * out(1L)._2
    assert(math.abs(l2sq - math.round(l2sq)) < 5e-3)
  }

  test("hashedDocVectors: every input document emits exactly one row") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val n = docs.count()
    val out = Dedup.hashedDocVectors(docs, "doc_id", "text")
    assert(out.count() == n)
    assert(out.select("doc_id").distinct().count() == n)
  }

  test("lexicalSemanticAudit: one row per verified pair, near-dups are vector-close") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text", threshold = 0.5)
    val audit = Dedup.lexicalSemanticAudit(docs, "doc_id", "text").collect()
    assert(audit.length == pairs.count())
    audit.foreach { r =>
      val (j, c) = (r.getDouble(2), r.getDouble(3))
      assert(j >= 0.5 && j <= 1.0)
      assert(c >= -1.0001 && c <= 1.0001)
      // a >=0.5-jaccard pair shares most of its token mass: the hashed
      // vectors must agree far above chance
      assert(c > 0.3, s"pair ${r.getLong(0)}-${r.getLong(1)}: jaccard $j cosine $c")
    }
  }
}

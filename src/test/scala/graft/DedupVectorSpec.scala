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

  test("lexicalSemanticAudit: a cancelling (zero-vector) pair member reports cosine 0.0, not a dropped edge") {
    import spark.implicits._
    // find two tokens landing in the SAME bucket with OPPOSITE signs so
    // a doc of balanced repetitions hashes to the all-zero vector
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def bucket(t: String): Long = java.lang.Long.parseLong(md5hex(t).take(8), 16) % 64
    def sign(t: String): Int =
      if (Integer.parseInt(md5hex(t).substring(8, 9), 16) % 2 == 1) 1 else -1
    val cands = (0 until 2000).map(i => s"w$i")
    val pairOpt = (for {
      a <- cands.iterator
      b <- cands.iterator
      if a < b && bucket(a) == bucket(b) && sign(a) == -sign(b)
    } yield (a, b)).buffered.headOption
    assert(pairOpt.isDefined, "no cancelling token pair in 2000 candidates")
    val (t1, t2) = pairOpt.get
    val d1 = Seq.fill(10)(s"$t1 $t2").mkString(" ")      // zero vector
    val d2 = Seq.fill(12)(s"$t1 $t2").mkString(" ")      // near-dup, zero too
    val docs = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val audit = Dedup.lexicalSemanticAudit(docs, "doc_id", "text").collect()
    assert(audit.length == 1, "the verified pair must not be dropped")
    assert(audit.head.getDouble(3) == 0.0)
    // and the vectorizer itself still emits the docs (all-zero rows)
    val vecs = Dedup.hashedDocVectors(docs, "doc_id", "text").collect()
    assert(vecs.length == 2 && vecs.forall(_.getLong(1) == 0L))
  }

  test("hashedTopK: a near-duplicate of the query ranks first; self never returned") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (0L, base),
      (1L, base + " extra"),                         // near-dup of 0
      (2L, (100 to 130).map(i => s"w$i").mkString(" ")),
      (3L, (200 to 230).map(i => s"x$i").mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.hashedTopK(docs, "doc_id", "text", queryId = 0L, k = 3)
      .collect()
    assert(out.nonEmpty && out.head.getLong(0) == 1L)
    assert(out.head.getDouble(1) > 0.9)
    assert(!out.map(_.getLong(0)).contains(0L))
    // ranking is non-increasing
    val sims = out.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("hashedTfidfTopK: rare distinctive overlap outranks shared boilerplate") {
    import spark.implicits._
    // every doc is drowned in the same boilerplate; the query shares a
    // RARE token only with doc 1. Plain hashed cosine ranks by raw
    // overlap (boilerplate-dominated, ~uniform); the IDF weighting must
    // put doc 1 first.
    val boiler = (1 to 20).map(_ => "the of and").mkString(" ")
    val docs = Seq(
      (0L, s"$boiler zebra"),
      (1L, s"$boiler zebra"),      // shares the rare token
      (2L, s"$boiler quartz"),
      (3L, s"$boiler basalt")).toDF("doc_id", "text")
    val out = Dedup.hashedTfidfTopK(docs, "doc_id", "text", queryId = 0L, k = 3)
      .collect()
    // corpus-wide tokens (df = N) carry zero IDF weight and are
    // filtered from the entries, so docs sharing ONLY boilerplate with
    // the query have no scoring bucket at all — the one returned doc
    // is the rare-token match
    assert(out.map(_.getLong(0)).toSeq == Seq(1L), out.mkString(","))
    assert(out.head.getDouble(1) > 0.9)
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

  test("bm25TopK: idf downweights boilerplate, length normalization penalizes padding") {
    import spark.implicits._
    val boiler = (1 to 10).map(_ => "the of and").mkString(" ")
    val pad = (1 to 200).map(_ => "filler").mkString(" ")
    val docs = Seq(
      (0L, s"$boiler zebra quartz"),     // query: rare terms zebra+quartz
      (1L, s"$boiler zebra quartz"),     // both rare terms, short
      (2L, s"$boiler zebra quartz $pad"),// both rare terms, padded long
      (3L, s"$boiler zebra"),            // one rare term
      (4L, s"$boiler basalt")            // boilerplate only
    ).toDF("doc_id", "text")
    val out = Dedup.bm25TopK(docs, "doc_id", "text", queryId = 0L, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(!out.exists(_._1 == 0L), "query doc excluded")
    val rank = out.map(_._1)
    val score = out.toMap
    // exact twin first; the padded twin drops below it (same term
    // matches, heavy length penalty — here even below the short
    // single-term doc, which is BM25's defining trade); boilerplate-only
    // doc still scores (idf > 0 under the +1 variant) but last
    assert(rank.head == 1L, out.mkString(","))
    assert(score(2L) < score(1L), out.mkString(","))
    assert(rank.last == 4L, out.mkString(","))
    assert(out.forall(_._2 > 0.0))
  }
}

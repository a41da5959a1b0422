package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftExtensions

class GraftExtensionsSpec extends AnyFunSuite with SparkSpec {

  test("vec_dot / vec_norm usable from SQL after registration") {
    GraftExtensions.register(spark)
    Tables.embeddings(spark, sf("sf0.001")).createOrReplaceTempView("emb")
    val r = spark.sql(
      """SELECT vec_id,
        |       vec_dot(embedding, embedding) AS d,
        |       vec_norm(embedding) AS n
        |FROM emb ORDER BY vec_id LIMIT 5""".stripMargin).collect()
    assert(r.length == 5)
    r.foreach { row =>
      val (d, n) = (row.getDouble(1), row.getDouble(2))
      assert(math.abs(math.sqrt(d) - n) < 1e-9)
    }
  }

  test("SQL minhash/simhash_tokens agree with the scalar kernels") {
    import graft.functions.TextHashAggregators
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT minhash(array('a b c d', 'b c d e', 'c d e f'), 4) AS mh,
        |       simhash_tokens(array('alpha', 'beta', 'alpha')) AS sh""".stripMargin)
      .collect().head
    assert(row.getSeq[String](0) ==
      TextHashAggregators.minhashSignature(Seq("a b c d", "b c d e", "c d e f"), 4))
    assert(row.getString(1) ==
      TextHashAggregators.simhashSignature(Seq("alpha", "beta", "alpha")))
    // null elements: the Seq reference variants must SKIP them, exactly
    // like the ArrayData kernels they are the parity baseline for — a
    // null-bearing array used to NPE here while the SQL path worked
    val sqlNull = spark.sql(
      """SELECT minhash(array('a b c d', NULL, 'b c d e'), 4) AS mh,
        |       simhash_tokens(array('alpha', NULL, 'beta')) AS sh""".stripMargin)
      .collect().head
    assert(sqlNull.getSeq[String](0) ==
      TextHashAggregators.minhashSignature(Seq("a b c d", null, "b c d e"), 4))
    assert(sqlNull.getSeq[String](0) ==
      TextHashAggregators.minhashSignature(Seq("a b c d", "b c d e"), 4))
    assert(sqlNull.getString(1) ==
      TextHashAggregators.simhashSignature(Seq("alpha", null, "beta")))
  }

  test("nfc/nfkc normalization: composes combining marks, fixed point, null-safe") {
    GraftExtensions.register(spark)
    // "cafe" + combining acute; NFKC input adds a compatibility ligature ﬁ (U+FB01)
    val r = spark.sql(
      "SELECT nfc_normalize('café') AS c, " +
        "length(nfc_normalize('café')) AS lc, " +
        "nfkc_normalize('ﬁle café') AS k, " +
        "nfc_normalize(CAST(NULL AS STRING)) AS nl").collect().head
    assert(r.getString(0) == "café")
    assert(r.getInt(1) == 4) // 5 codepoints composed to 4
    assert(r.getString(2) == "file café") // ligature expanded + composed
    assert(r.isNullAt(3))
    // fixed point: normalizing twice changes nothing
    val twice = spark.sql(
      "SELECT nfc_normalize(nfc_normalize('é')) = nfc_normalize('é')")
      .collect().head.getBoolean(0)
    assert(twice)
  }

  test("registration is idempotent and arity is enforced") {
    GraftExtensions.register(spark)
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT vec_norm(embedding, embedding) FROM emb").collect()
    }
    assert(e.getMessage.toLowerCase.contains("1 argument") ||
      e.getMessage.toLowerCase.contains("vec_norm"))
  }
}

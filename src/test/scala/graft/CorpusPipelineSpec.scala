package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusPipeline

class CorpusPipelineSpec extends AnyFunSuite with SparkSpec {

  test("curate: quality -> exact dedup -> near dedup, with audit counts") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base),                     // keeper
      (2L, base),                     // exact dup of 1 → dropped at exact
      (3L, base + " extra"),          // near dup of 1 → dropped at LSH
      (4L, "too short"),              // dropped at quality
      (5L, (100 to 140).map(i => s"w$i").mkString(" "))) // distinct survivor
      .toDF("doc_id", "text")

    val (out, report) = CorpusPipeline.curate(docs, "doc_id", "text",
      minTokens = 10, nearDupThreshold = 0.5)

    assert(report.input == 5)
    assert(report.afterQuality == 4)
    assert(report.afterExact == 3)
    assert(report.afterNearDup == 2)
    val survivors = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 5L))
    // annotations present
    assert(out.columns.contains("fingerprint") && out.columns.contains("n_tokens"))
    assert(out.filter(col("doc_id") === 1L).head().getAs[Int]("n_tokens") == 30)
  }

  test("curate on the real corpus drops exactly the planted near-duplicates") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val (_, report) = CorpusPipeline.curate(docs, "doc_id", "text")
    // sf0.01 plants NEAR-duplicates (25 high-jaccard pairs) but no
    // byte-exact ones: exact dedup is a no-op, LSH dedup drops the
    // pairwise losers
    assert(report.afterExact == report.afterQuality)
    val losers = graft.operators.Dedup
      .minHashLshPairs(docs, "doc_id", "text")
      .select("id_b").distinct().count()
    assert(losers > 0)
    assert(report.afterNearDup == report.afterExact - losers)
  }
}

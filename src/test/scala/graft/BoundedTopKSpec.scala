package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BoundedTopK.topKIds

class BoundedTopKSpec extends AnyFunSuite with SparkSpec {

  private def frame = {
    import spark.implicits._
    // two groups; scores engineered with ties at the k-boundary
    Seq(
      ("g1", 0.9, 10L), ("g1", 0.9, 3L), ("g1", 0.8, 7L),
      ("g1", 0.7, 1L), ("g1", 0.7, 2L),
      ("g2", 0.1, 5L), ("g2", 0.5, 6L)
    ).toDF("g", "score", "id")
  }

  test("top-k matches the rank-window form, ties broken by ascending id") {
    val got = frame.groupBy("g")
      .agg(topKIds(col("score"), col("id"), 3).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    // g1 order under (score DESC, id ASC): (0.9,3),(0.9,10),(0.8,7),...
    assert(got("g1") == List(3L, 10L, 7L))
    assert(got("g2") == List(6L, 5L)) // group smaller than k: all of it
  }

  test("result is partition-order independent (heap merge path)") {
    import spark.implicits._
    val big = (0L until 5000L).map(i => ((i % 7).toDouble, i)).toDF("score", "id")
    val one = big.coalesce(1)
      .agg(topKIds(col("score"), col("id"), 25)).collect().head.getSeq[Long](0)
    val many = big.repartition(16)
      .agg(topKIds(col("score"), col("id"), 25)).collect().head.getSeq[Long](0)
    assert(one == many)
    // the true top-25: all score-6 ids ascending (714 of them, first 25)
    assert(one.toList == (0L until 5000L).filter(_ % 7 == 6).take(25).toList)
  }

  test("null scores are skipped — the conditional-dial device") {
    import spark.implicits._
    val df = Seq((0.9, 1L), (0.8, 2L), (0.7, 3L)).toDF("score", "id")
    val got = df
      .agg(topKIds(when(col("id") =!= 2L, col("score")), col("id"), 3))
      .collect().head.getSeq[Long](0)
    assert(got.toList == List(1L, 3L))
  }

  test("topKPairs carries the payload without it joining the ordering") {
    import spark.implicits._
    import graft.functions.BoundedTopK.topKPairs
    // payload deliberately anti-correlated with score: ordering must
    // follow score alone (the two-stage-selection device)
    val df = Seq((0.9, 1L, 0.1), (0.5, 2L, 0.9), (0.7, 3L, 0.5))
      .toDF("score", "id", "p")
    val got = df.repartition(4)
      .agg(topKPairs(col("score"), col("id"), col("p"), 2))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(got == List((1L, 0.1), (3L, 0.5)))
  }

  test("wrong input types refuse at analysis, not silently") {
    import spark.implicits._
    val df = Seq((1, "x")).toDF("score", "id")
    val err = intercept[Exception] {
      df.agg(topKIds(col("score"), col("id"), 2)).collect()
    }
    assert(err.getMessage.contains("bounded_top_k_ids") ||
      err.getMessage.toLowerCase.contains("data type"), err.getMessage)
  }
}

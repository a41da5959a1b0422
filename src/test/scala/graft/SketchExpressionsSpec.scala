package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.sketch

class SketchExpressionsSpec extends AnyFunSuite with SparkSpec {

  private def tokenFrame = {
    import spark.implicits._
    // skewed token stream: "a" x 100, "b" x 10, "c" x 1
    (Seq.fill(100)("a") ++ Seq.fill(10)("b") ++ Seq("c")).toDF("tok")
  }

  test("cms_probe never undercounts and respects the eps bound") {
    val sk = tokenFrame.agg(
      expr("count_min_sketch(tok, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)").as("sk"))
    val est = tokenFrame.distinct()
      .crossJoin(sk)
      .select(col("tok"), sketch.cmsProbe(col("sk"), col("tok")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Map("a" -> 100L, "b" -> 10L, "c" -> 1L)
    exact.foreach { case (t, n) =>
      assert(est(t) >= n, s"undercount for $t")
      // eps 0.001 over a 111-item stream: bound rounds to +1
      assert(est(t) <= n + 1, s"overcount beyond eps*N for $t")
    }
  }

  test("probe matches a sketch built distributed (merge path)") {
    // 8 partitions force partial sketches + merge; cells add exactly,
    // so the merged estimate equals the single-partition one
    val one = tokenFrame.coalesce(1).agg(
      expr("count_min_sketch(tok, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)").as("sk"))
    val many = tokenFrame.repartition(8).agg(
      expr("count_min_sketch(tok, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)").as("sk"))
    def probe(df: org.apache.spark.sql.DataFrame): Long =
      df.select(sketch.cmsProbe(col("sk"), lit("a"))).collect().head.getLong(0)
    assert(probe(one) == probe(many))
  }

  test("cms_probe null propagation and SQL registration") {
    graft.plans.GraftExtensions.register(spark)
    val sk = tokenFrame.agg(
      expr("count_min_sketch(tok, CAST(0.01 AS DOUBLE), CAST(0.9 AS DOUBLE), 7)").as("sk"))
    sk.createOrReplaceTempView("__sk")
    val viaSql = spark.sql("SELECT cms_probe(sk, 'a') AS e FROM __sk")
      .collect().head.getLong(0)
    assert(viaSql >= 100L)
    val nullItem = sk.select(sketch.cmsProbe(col("sk"), lit(null).cast("string")))
      .collect().head
    assert(nullItem.isNullAt(0))
  }
}

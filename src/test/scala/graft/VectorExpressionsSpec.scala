package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.vec

class VectorExpressionsSpec extends AnyFunSuite with SparkSpec {

  private def floatVecs = {
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("a", ArrayType(FloatType)),
      StructField("b", ArrayType(FloatType))))
    spark.createDataFrame(
      java.util.List.of(
        Row(1, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
        Row(2, Seq(0.0f, 0.0f), Seq(0.0f, 0.0f)),
        Row(3, null, Seq(1.0f)),
        Row(4, Seq(1.5f, -2.5f), Seq(-1.0f, 2.0f))),
      schema)
  }

  test("vec_dot computes double dot product over float arrays") {
    val out = floatVecs.select(col("id"), vec.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out(1) == 1.0 * 4 + 2.0 * 5 + 3.0 * 6)
    assert(out(2) == 0.0)
    assert(out(3) == null) // null input → null
    assert(out(4) == 1.5 * -1.0 + -2.5 * 2.0)
  }

  test("vec_norm matches sqrt of sum of squares") {
    val out = floatVecs.filter(col("a").isNotNull)
      .select(col("id"), vec.norm(col("a")).as("n"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1) - math.sqrt(1 + 4 + 9)) < 1e-12)
    assert(out(2) == 0.0)
  }

  test("expressions agree with the higher-order-function fold (real data)") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val asD = transform(col("embedding"), x => x.cast("double"))
    val foldDot = aggregate(
      zip_with(asD, asD, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val rows = e.select(
      vec.dot(col("embedding"), col("embedding")).as("fast"),
      foldDot.as("slow")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("dimension mismatch folds over the shorter prefix") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType)), StructField("b", ArrayType(DoubleType))))
    val df = spark.createDataFrame(
      java.util.List.of(Row(Seq(2.0, 3.0, 9.0), Seq(10.0, 10.0))), schema)
    assert(df.select(vec.dot(col("a"), col("b"))).head().getDouble(0) == 50.0)
  }

  test("non-array input is rejected at analysis time") {
    val df = spark.range(1).select(col("id"))
    intercept[Exception] {
      df.select(vec.norm(col("id"))).head()
    }
  }

  test("a null ELEMENT nulls the result (DuckDB list-fold parity), in both eval paths") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType, containsNull = true)),
      StructField("b", ArrayType(DoubleType, containsNull = true))))
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(Seq[Any](2.0, null, 9.0), Seq[Any](1.0, 1.0, 1.0)),
        Row(Seq[Any](2.0, 3.0), Seq[Any](1.0, 1.0))), schema)
    val rows = df.select(
      vec.dot(col("a"), col("b")).as("d"),
      vec.norm(col("a")).as("n")).collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1),
      "null element must propagate, not count as 0.0")
    assert(rows(1).getDouble(0) == 5.0)
    // interpreted path too (codegen disabled)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val r2 = df.select(vec.dot(col("a"), col("b"))).collect()
      assert(r2(0).isNullAt(0) && r2(1).getDouble(0) == 5.0)
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
    }
  }
}

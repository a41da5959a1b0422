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

  test("nearestAnchors equals the per-anchor struct-least formulation it replaced") {
    // ANSI off for the whole test (Divide bakes failOnError at dataset
    // construction): under ANSI the OLD formulation's 0/0 on the zero
    // vector throws DIVIDE_BY_ZERO before nanvl ever sees the NaN —
    // the fused expression implements the documented nanvl(-1)
    // semantics directly, so the zero-vector row stays covered here
    // with the legacy arithmetic as the reference.
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
    // independent reference: the EXACT expression shape ivfAssign used
    // before the fused argmax — one struct candidate per anchor, least()
    // for rank 1, array_sort+slice for the probe list
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    // includes: near-ties that only differ past 4dp (rounding ties ->
    // aid), a zero vector (NaN cosine -> -1 for every anchor), and
    // exact duplicates of an anchor
    val vecs = Seq(
      Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0), Seq(0.70710, 0.70711, 0.0),
      Seq(0.0, 0.0, 0.0), Seq(0.5, 0.5, 0.70710678), Seq(-1.0, 0.0, 0.0),
      Seq(0.99999, 0.00001, 0.0), Seq(0.3333, 0.3333, 0.3334))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(vecs.zipWithIndex.map {
        case (v, i) => Row(i.toLong, v) }: _*), schema)
    val anchors = Seq(
      (7L, Seq(1.0, 0.0, 0.0)), (11L, Seq(0.0, 1.0, 0.0)),
      (13L, Seq(0.577, 0.577, 0.578)), (17L, Seq(1.0, 0.0, 0.0)))
    val cands = anchors.sortBy(_._1).map { case (aid, av) =>
      struct(
        (-round(nanvl(vec.cosine(col("embedding"), typedLit(av)), lit(-1.0)), 4)).as("nc"),
        lit(aid).as("aid"))
    }
    val sorted = array_sort(array(cands: _*))
    val refDf = df.withColumn("__s", sorted).select(col("id"),
      least(cands: _*).getField("aid").as("best"),
      expr("transform(slice(__s, 1, 3), x -> x.aid)").as("probes"))
    val (aids, mat, nrm) = (anchors.sortBy(_._1).map(_._1).toArray,
      anchors.sortBy(_._1).map(_._2.toArray).toArray,
      anchors.sortBy(_._1).map(a => math.sqrt(a._2.map(x => x * x).sum)).toArray)
    val fused = df.select(col("id"),
      element_at(vec.nearestAnchors(col("embedding"), aids, mat, nrm, 1, 4), 1).as("best"),
      vec.nearestAnchors(col("embedding"), aids, mat, nrm, 3, 4).as("probes"))
    val r = refDf.orderBy("id").collect().map(x =>
      (x.getLong(0), x.getLong(1), x.getSeq[Long](2)))
    val f = fused.orderBy("id").collect().map(x =>
      (x.getLong(0), x.getLong(1), x.getSeq[Long](2)))
    assert(f.toSeq == r.toSeq)
    } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
  }

  test("pqEncodeDetail equals the literal zip_with/aggregate formulation it replaced") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    // m=2 subspaces of sub=2; codebooks engineered for exact distance
    // ties (codewords 0 and 2 of subspace 0 are identical -> tie must
    // go to the LOWER code) and sign/magnitude variety
    val cbs: Array[Array[Array[Double]]] = Array(
      Array(Array(0.0, 0.0), Array(1.0, 1.0), Array(0.0, 0.0)),
      Array(Array(-1.0, 2.0), Array(0.5, 0.5), Array(2.0, -1.0)))
    val vecs = Seq(
      Seq(0.0, 0.0, 0.0, 0.0), Seq(1.0, 1.0, -1.0, 2.0),
      Seq(0.5, 0.5, 0.5, 0.5), Seq(-3.0, 4.0, 2.0, -1.0),
      Seq(0.70001, 0.69999, 1.00005, -0.00005))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(vecs.zipWithIndex.map {
        case (v, i) => Row(i.toLong, v) }: _*), schema)
    val m = cbs.length; val sub = cbs(0)(0).length
    val ref = array((0 until m).map { j =>
      val sl = slice(col("embedding"), j * sub + 1, sub)
      val cands = cbs(j).zipWithIndex.map { case (cw, c) =>
        val cwLit = array(cw.map(lit).toIndexedSeq: _*)
        val d2 = aggregate(
          zip_with(sl, cwLit, (x, w) => pow(x.cast("double") - w, lit(2))),
          lit(0.0), (a, v) => a + v)
        struct(round(d2, 4).as("d"), lit(c.toLong).as("code"))
      }
      element_at(array_sort(array(cands.toIndexedSeq: _*)), 1)
    }: _*)
    val out = df.select(col("id"),
      ref.as("ref"), vec.pqEncodeDetail(col("embedding"), cbs, 4).as("fused"))
      .orderBy("id").collect()
    out.foreach { r =>
      assert(r.getSeq[Row](1) == r.getSeq[Row](2), s"row ${r.getLong(0)}")
    }
  }
}

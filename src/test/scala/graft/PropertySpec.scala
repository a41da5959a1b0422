package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextHashAggregators
import graft.ingest.RangePlanner

/** Property tests over the pure kernels (SURVEY §5 strategy: pin the
  * scalar/planner contracts with generated inputs, not just examples). */
class PropertySpec extends AnyFunSuite with SparkSpec {

  private def check(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val shingleList = Gen.listOfN(30, word)

  test("minhash signature is set-semantic: order and duplicates never matter") {
    check(Prop.forAll(shingleList, Gen.long) { (sh, seed) =>
      val rnd = new scala.util.Random(seed)
      val shuffledWithDups = rnd.shuffle(sh ++ rnd.shuffle(sh).take(sh.size / 2))
      TextHashAggregators.minhashSignature(sh, 16) ==
        TextHashAggregators.minhashSignature(shuffledWithDups, 16)
    })
  }

  test("fused minhash+halves kernel is bit-identical to the separate kernels") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    check(Prop.forAll(shingleList) { sh =>
      val arr = new GenericArrayData(sh.map(UTF8String.fromString).toArray[Any])
      val fused = TextHashAggregators.minhashAndHalvesData(arr, 16)
      val mh = fused.getArray(0)
      val hs = fused.getArray(1)
      val sepMh = TextHashAggregators.minhashArrayData(arr, 16)
      val mhOk = (0 until 16).forall(i => mh.getUTF8String(i) == sepMh.getUTF8String(i))
      val hsOk = sh.indices.forall(i =>
        hs.getLong(i) == TextHashAggregators.md5Half64(UTF8String.fromString(sh(i))))
      mhOk && hsOk && hs.numElements() == sh.size
    })
  }

  test("minhash signature only decreases element-wise as shingles are added") {
    check(Prop.forAll(shingleList, shingleList) { (a, b) =>
      val base = TextHashAggregators.minhashSignature(a, 16)
      val more = TextHashAggregators.minhashSignature(a ++ b, 16)
      base.zip(more).forall { case (x, y) => y <= x }
    })
  }

  test("identical shingle sets ⇒ identical signatures; Jaccard of signature agreement approximates set Jaccard for equal sets") {
    check(Prop.forAll(shingleList) { sh =>
      val s1 = TextHashAggregators.minhashSignature(sh, 16)
      val s2 = TextHashAggregators.minhashSignature(sh.reverse, 16)
      s1 == s2
    })
  }

  test("simhash: scalar path and Aggregator path agree on any token bag") {
    check(Prop.forAll(shingleList, Gen.long) { (toks, seed) =>
      val agg = new TextHashAggregators.SimHashAggregator
      val viaAgg = {
        // aggregator consumes DISTINCT token md5s (set semantics)
        val md = java.security.MessageDigest.getInstance("MD5")
        def md5hex(s: String) = {
          md.reset()
          md.digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
        }
        val state = toks.distinct.foldLeft(agg.zero)((b, t) => agg.reduce(b, md5hex(t)))
        agg.finish(state)
      }
      val shuffled = new scala.util.Random(seed).shuffle(toks ++ toks)
      viaAgg == TextHashAggregators.simhashSignature(shuffled)
    }, n = 100)
  }

  test("backfill chunks are disjoint, ordered, and cover [start, end] exactly") {
    val gen = for {
      start <- Gen.chooseNum(1L, 10000L)
      len <- Gen.chooseNum(1L, 500L)
      nb <- Gen.chooseNum(1L, 100L)
    } yield (start, start + len, nb)
    check(Prop.forAll(gen) { case (start, end, nb) =>
      val chunks = RangePlanner.backfillChunks(start, end, nb)
      val covered = chunks.flatMap { case (s, e) => s to e }
      chunks.forall { case (s, e) => s <= e && s >= start && e <= end } &&
        covered == covered.distinct && covered.sorted == (start to end).toList
    })
  }

  test("gap-fill ranges reproduce exactly the input height set") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(1L, 300L))) { hs =>
      val ranges = RangePlanner.gapFillRanges(hs)
      val expanded = ranges.flatMap { case (s, e) => s to e }
      expanded.toSet == hs.toSet &&
        expanded.size == hs.distinct.size && // no overlap
        ranges.forall { case (s, e) => s <= e }
    })
  }

  test("sync/backfill planner invariants: never refetch, never cross the floor") {
    val gen = for {
      tip <- Gen.chooseNum(100L, 1000000L)
      floor <- Gen.chooseNum(1L, 99L)
      ingested <- Gen.chooseNum(0L, 1000000L)
      nb <- Gen.chooseNum(1L, 50000L)
    } yield (tip, floor, ingested, nb)
    check(Prop.forAll(gen) { case (tip, floor, ingested, nb) =>
      val (s, e) = RangePlanner.syncRange(tip, floor, ingested, nb)
      val (bs, be) = RangePlanner.backfillRange(floor, ingested, nb)
      s > ingested && s >= floor && e == tip && // sync never refetches
        bs >= floor && be == ingested - 1 && (be - bs + 1) <= nb
    })
  }

  test("salted join equals the plain join on generated skew shapes") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val facts = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0, 1000)))
    val dims = Gen.listOfN(8, Gen.zip(Gen.chooseNum(0L, 9L), word))
    check(Prop.forAll(facts, dims, Gen.chooseNum(1, 6)) { (fs, ds, salts) =>
      val fact = fs.toDF("k", "v")
      val dim = ds.distinctBy(_._1).toDF("k", "name") // unique join keys dim-side
      val salted = graft.operators.Layout.saltedJoin(fact, dim, "k", salts)
        .select("k", "v", "name").collect().map(_.toSeq).sortBy(_.toString)
      val plain = fact.join(dim, Seq("k"))
        .select("k", "v", "name").collect().map(_.toSeq).sortBy(_.toString)
      salted.sameElements(plain)
    }, n = 20) // each trial runs two Spark jobs — keep the count sane
  }

  test("temperatureMix: temp_frac is a distribution; alpha=1 leaves weights at 1") {
    import spark.implicits._
    val corpora = Gen.nonEmptyListOf(
      Gen.zip(Gen.oneOf("s1", "s2", "s3", "s4"), Gen.chooseNum(1, 40)))
    check(Prop.forAll(corpora, Gen.oneOf(0.0, 0.3, 0.7, 1.0)) { (rows, alpha) =>
      val docs = rows.map { case (src, n) => (src, Seq.fill(n)("t").mkString(" ")) }
        .toDF("source", "text")
      val out = graft.operators.QualityModels
        .temperatureMix(docs, "source", "text", alpha).collect()
      val fracSum = out.map(_.getDouble(3)).sum
      val distOk = math.abs(fracSum - 1.0) <= 0.001 * out.length // 4-dp rounding slack
      val alphaOneOk = alpha != 1.0 || out.forall(_.getDouble(4) == 1.0)
      distOk && alphaOneOk
    }, n = 15) // each trial runs Spark jobs — keep the count sane
  }

  test("bigramSurprisal is row-order invariant (the model is set-semantic)") {
    import spark.implicits._
    val corpora = Gen.listOfN(6,
      Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    check(Prop.forAll(corpora, Gen.long) { (texts, seed) =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val shuffled = new scala.util.Random(seed).shuffle(rows)
      def run(rs: Seq[(Long, String)]) = graft.operators.QualityModels
        .bigramSurprisal(rs.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      run(rows) == run(shuffled)
    }, n = 10)
  }

  test("bpeMerges: adopted-pair counts never increase across rounds") {
    import spark.implicits._
    // merging the top pair can only shrink any other pair's count, and
    // pairs created by the merge are bounded by the merged token's
    // occurrences — so the adoption-count sequence is non-increasing
    val corpora = Gen.listOfN(5,
      Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c")).map(_.mkString(" ")))
    check(Prop.forAll(corpora) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val ns = graft.operators.QualityModels
        .bpeMerges(docs, "doc_id", "text", rounds = 3)
        .collect().sortBy(_.getInt(0)).map(_.getLong(3))
      ns.isEmpty || ns.zip(ns.tail).forall { case (a, b) => b <= a }
    }, n = 10)
  }

  test("statsSummary conserves row counts and brackets every value") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rows = Gen.nonEmptyListOf(Gen.chooseNum(-1000, 1000))
    check(Prop.forAll(rows) { xs =>
      val df = xs.toDF("x").repartition(3) // several files' worth of splits
      val dir = java.nio.file.Files.createTempDirectory("graft-prop-stats").toString
      df.write.mode("overwrite").parquet(dir)
      val stats = graft.operators.Layout
        .statsSummary(spark.read.parquet(dir), Seq("x")).collect()
      val total = stats.map(_.getAs[Long]("n_rows")).sum
      total == xs.length &&
        stats.forall(r => r.getAs[Int]("min_x") <= r.getAs[Int]("max_x")) &&
        stats.map(_.getAs[Int]("min_x")).min == xs.min &&
        stats.map(_.getAs[Int]("max_x")).max == xs.max
    }, n = 15)
  }

  test("base64 round-trip parity: Spark expr vs JVM codec on generated strings") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val strings = Gen.listOfN(50,
      Gen.nonEmptyListOf(Gen.asciiPrintableChar).map(_.mkString.take(40)))
      .sample.get
    val df = strings.toDF("s")
      .select(col("s"), decode(unbase64(base64(encode(col("s"), "UTF-8"))), "UTF-8").as("rt"),
        base64(encode(col("s"), "UTF-8")).as("b64"))
    df.collect().foreach { r =>
      assert(r.getString(1) == r.getString(0))
      val jvm = java.util.Base64.getMimeEncoder.encodeToString(
        r.getString(0).getBytes("UTF-8")).replaceAll("\r\n", "")
      assert(r.getString(2).replaceAll("\r\n", "") == jvm)
    }
  }

  test("bounded top-k equals the rank-window form on arbitrary grouped data") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.functions.BoundedTopK.topKIds
    import spark.implicits._
    // scores from a SMALL value set force heavy ties at every k-boundary;
    // a handful of seeds rather than 200 ScalaCheck cases — each case is
    // a Spark job, and the aggregate's pure kernel is already covered by
    // BoundedTopKSpec. This pins the DISTRIBUTED equivalence.
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val n = 500 + rnd.nextInt(1500)
      val k = 1 + rnd.nextInt(12)
      val rows = (0 until n).map { i =>
        (s"g${rnd.nextInt(5)}", rnd.nextInt(7).toDouble / 2.0, i.toLong)
      }
      val df = rows.toDF("g", "score", "id").repartition(8)
      val viaAgg = df.groupBy("g")
        .agg(topKIds(col("score"), col("id"), k).as("ids"))
        .select(col("g"), explode(col("ids")).as("id"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val viaWindow = df
        .withColumn("rk", row_number().over(
          Window.partitionBy("g").orderBy(desc("score"), asc("id"))))
        .filter(col("rk") <= k)
        .select("g", "id")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(viaAgg == viaWindow, s"seed=$seed k=$k")
    }
  }
}

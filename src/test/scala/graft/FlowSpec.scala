package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Flow

/** The Prefect-runtime slice (bounded task retries + flow
  * observability) the reference's @prefect.task decorations rely on
  * (pipelines/pipeline.py:64-131), as a driver-side task runner. */
class FlowSpec extends AnyFunSuite with SparkSpec {

  test("a transiently failing task retries with linear backoff and succeeds") {
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val flow = new Flow(retries = 3, backoffMs = 100, sleep = slept += _)
    var calls = 0
    val out = flow.task("flaky") {
      calls += 1
      if (calls < 3) sys.error("node hiccup")
      42
    }
    assert(out == 42 && calls == 3)
    assert(slept.toSeq == Seq(100L, 200L)) // linear backoff per attempt
    val r = flow.report.head
    assert(r.name == "flaky" && r.attempts == 3 && r.error.isEmpty)
  }

  test("an exhausted task rethrows and records the failure") {
    val flow = new Flow(retries = 1, backoffMs = 1, sleep = _ => ())
    val e = intercept[RuntimeException] {
      flow.task("doomed")(sys.error("always down"))
    }
    assert(e.getMessage == "always down")
    val r = flow.report.head
    assert(r.attempts == 2 && r.error.contains("always down"))
    // the report JSON is one parseable record per run
    assert(flow.reportJson.contains(""""task":"doomed","attempts":2"""))
  }

  test("the pipeline flow reports every stage with attempts and timing") {
    val root = java.nio.file.Files.createTempDirectory("graft-flow").toString
    val pipe = new graft.pipeline.Pipeline(spark, root, FakeNode.fetch)
    val (_, flow) = pipe.runWithReport(tip = 5, chainFloor = 1,
      numBlocks = 10, models = Nil)
    val names = flow.report.map(_.name)
    assert(names == Seq("determine_sync_range", "extract_sync",
      "determine_backfill_range", "extract_backfill", "gap_fill",
      "parse_data", "run_models"), names)
    assert(flow.report.forall(r => r.error.isEmpty && r.attempts == 1))
    assert(spark.read.parquet(s"$root/parsed/blocks").count() == 5)
  }
}

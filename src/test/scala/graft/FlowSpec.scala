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
    // extract stages carry quarantine accounting (all-healthy here)
    val sync = flow.report.find(_.name == "extract_sync").get
    assert(sync.counters("chunks_planned") == 2L &&
      sync.counters("chunks_quarantined") == 0L, sync.counters)
    assert(flow.reportJson.contains(""""counters":{"chunks_planned":2"""))
  }

  test("counters reset per attempt — a retried body does not double-count") {
    val flow = new Flow(retries = 2, backoffMs = 1, sleep = _ => ())
    var calls = 0
    flow.task("counted") {
      calls += 1
      flow.count("items", 5)
      if (calls < 2) sys.error("transient")
    }
    assert(flow.report.head.counters == Map("items" -> 5L))
  }

  test("a fully unreachable node fails the extract stage LOUDLY, not silently-empty") {
    // regression for the count-probe Try swallowing every cause: all
    // chunks quarantining is indistinguishable from "node down" and
    // must fail the run (after Flow's retries), with the quarantine
    // counts still in the report — never a "successful" empty run
    val root = java.nio.file.Files.createTempDirectory("graft-flow-down").toString
    val pipe = new graft.pipeline.Pipeline(spark, root,
      _ => sys.error("connection refused"))
    val e = intercept[IllegalStateException] {
      pipe.runWithReport(tip = 5, chainFloor = 1, numBlocks = 10,
        models = Nil, retries = 1, backoffMs = 1)
    }
    assert(e.getMessage.contains("quarantined ALL"), e.getMessage)
    val (_, flow2) = {
      // partial quarantine stays a success: blocks fetch healthy, txs
      // probe down → heights ledgered, counters carry the signal
      val half = new graft.pipeline.Pipeline(spark,
        java.nio.file.Files.createTempDirectory("graft-flow-half").toString,
        url => if (url.contains("tx_search")) sys.error("down")
               else FakeNode.fetch(url))
      half.runWithReport(tip = 5, chainFloor = 1, numBlocks = 10, models = Nil)
    }
    val sync = flow2.report.find(_.name == "extract_sync").get
    assert(sync.error.isEmpty &&
      sync.counters("chunks_quarantined") == 1L &&
      sync.counters("heights_quarantined") == 5L, sync.counters)
  }
}

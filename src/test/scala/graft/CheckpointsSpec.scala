package graft

import graft.plans.Checkpoints

/** The reliable-checkpoint dial (`spark.graft.checkpoint.dir`,
  * DEPLOY.md): iterative loops must produce IDENTICAL results whether
  * they truncate lineage with localCheckpoint (the local[*] default) or
  * with durable reliable checkpoints (the cluster fault-tolerance
  * opt-in), and the reliable path must actually engage — files in the
  * dir — when configured. */
class CheckpointsSpec extends SparkSpec {

  private def withDial[A](body: java.nio.file.Path => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    spark.conf.set(Checkpoints.DirConf, dir.toString)
    try body(dir)
    finally spark.conf.unset(Checkpoints.DirConf)
  }

  private def filesUnder(p: java.nio.file.Path): Long = {
    val s = java.nio.file.Files.walk(p)
    try s.filter(java.nio.file.Files.isRegularFile(_)).count()
    finally s.close()
  }

  test("duplicateClusters: identical labels under the reliable dial, " +
      "and checkpoint files actually land") {
    import spark.implicits._
    // driverMaxEdges = 0 forces the DISTRIBUTED min-label loop — the
    // path whose per-iteration lineage cut is what the dial changes
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L), (5L, 3L), (7L, 7L))
      .toDF("id_a", "id_b")
    val base = graft.operators.Dedup
      .duplicateClusters(pairs, driverMaxEdges = 0)
      .orderBy("id").collect().toSeq
    assert(base.nonEmpty) // the control must itself be a real run
    val rel = withDial { dir =>
      val out = graft.operators.Dedup
        .duplicateClusters(pairs, driverMaxEdges = 0)
        .orderBy("id").collect().toSeq
      assert(filesUnder(dir) > 0,
        "dial set but no checkpoint files were written — the loop did " +
          "not take the reliable path")
      out
    }
    assert(rel === base)
  }

  test("bpeMerges: same learned merge table under the reliable dial") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low low lower lowest"),
      (2L, "low lower newest newest"),
      (3L, "newest low lowest lowest")).toDF("doc_id", "text")
    val base = graft.operators.QualityModels
      .bpeMerges(docs, "doc_id", "text", rounds = 3).collect().toSeq
    val rel = withDial { _ =>
      graft.operators.QualityModels
        .bpeMerges(docs, "doc_id", "text", rounds = 3).collect().toSeq
    }
    assert(rel === base)
  }
}

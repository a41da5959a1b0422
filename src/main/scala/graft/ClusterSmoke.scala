package graft

import org.apache.spark.sql.SparkSession

/** Multi-JVM deployment smoke — run via `tools/cluster_smoke.sh`, which
  * spark-submits this class against `local-cluster[2,4,2048]`: two REAL
  * executor JVMs separate from the driver, so any code path that
  * silently assumes one JVM (driver-local file state, non-serializable
  * closures, single-block-manager assumptions) fails here instead of on
  * a production cluster.
  *
  * Coverage is one representative per operator family whose execution
  * shape differs under multiple JVMs:
  *  - relational agg + broadcast-dim join (shuffle + broadcast exchange
  *    across executors);
  *  - MinHash LSH near-dup (localCheckpoint blocks live on REMOTE
  *    executors; freeLocalCheckpoint must release them there);
  *  - full curation + IVF ANN (persist/unpersist, driver-held model
  *    literals shipped into executor-side expressions);
  *  - the streaming curate sink + state compaction against a
  *    scheme-qualified (`file:`) state path — the Hadoop FS state I/O
  *    on a path executors don't interpret as java.io.File.
  *
  * Executor-loss stance (documented in DEPLOY.md): localCheckpoint
  * truncates lineage, so losing an executor mid-operator fails that
  * job; the retry unit is the OPERATOR call (idempotent by
  * construction — outputs are overwrite-by-batch/version). Durable
  * cross-job state is always parquet (`v=<id>` / `batch=<id>`), never
  * checkpoint blocks. The smoke ends with a DRILL of exactly that
  * stance: halt one executor JVM, assert the in-flight checkpointed
  * frame FAILS (never silently recomputes partial data), then assert
  * a fresh operator call converges to the identical result.
  *
  * Prints ONE JSON line: `{"smoke":"ok","executors":N,...}`; any
  * failure exits nonzero with the exception on stderr. */
object ClusterSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val b = SparkSession.builder().appName("graft-cluster-smoke")
    GraftSession.recommendedConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)

    // getExecutorMemoryStatus counts driver + executor block managers;
    // on local-cluster[2,...] that is >= 3 entries once the executor
    // JVMs REGISTER (takes a few seconds — asserting immediately after
    // getOrCreate races the registration and tears the cluster down).
    // On plain local[*] it stays 1 forever — the assert is what makes
    // this a MULTI-JVM smoke.
    def executorCount(): Int = spark.sparkContext.getExecutorMemoryStatus.size - 1
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (executorCount() < 2 && System.nanoTime() < deadline) Thread.sleep(500)
    val executors = executorCount()
    require(executors >= 2,
      s"expected >= 2 remote executors, got $executors — run via tools/cluster_smoke.sh (local-cluster master)")

    val picks = Seq("q01", "q04", "q36", "q55", "q60")
    val counts = picks.map { prefix =>
      val (name, fn) = SparkEntry.queries.toSeq.sortBy(_._1)
        .find(_._1.startsWith(prefix))
        .getOrElse(sys.error(s"no query with prefix $prefix"))
      name -> fn(spark, sfDir).count()
    }
    // every picked family produces rows at sf0.001 (the relational
    // aggregates, the planted near-dup pairs, curated survivors, ANN
    // top-k) — an empty result here means the family broke under
    // multiple JVMs even though its jobs "succeeded"
    require(counts.forall(_._2 > 0), s"empty result: $counts")

    // streaming curate + compaction on a scheme-qualified state path
    val root = java.nio.file.Files.createTempDirectory("graft-smoke").toString
    val in = s"$root/in"; java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def doc(id: Long, text: String) = s"""{"doc_id":$id,"text":"$text"}"""
    def words(a: Int, z: Int, p: String) = (a to z).map(i => s"$p$i").mkString(" ")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(in, "a.json"),
      Seq(doc(1, words(1, 30, "a")), doc(2, words(1, 30, "b"))).mkString("\n"))
    val docSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val src = graft.streaming.EventStream.jsonFileStream(spark, in, docSchema)
    val state = s"file:$root/state"
    graft.streaming.EventStream
      .streamingCurate(src, state, s"$root/out", s"$root/chk")
      .awaitTermination()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(in, "b.json"),
      Seq(doc(10, words(1, 30, "a")), doc(11, words(1, 30, "c"))).mkString("\n"))
    graft.streaming.EventStream
      .streamingCurate(src, state, s"$root/out", s"$root/chk")
      .awaitTermination()
    val survivors = spark.read.parquet(s"$root/out/batch=1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    require(survivors == Set(11L), s"streaming curate state failed across JVMs: $survivors")
    graft.streaming.EventStream.compactCurateState(spark, state)
    require(spark.read.parquet(s"$state/v=1/fp").count() == 3)

    // ---- executor-loss drill (the DEPLOY.md stance, exercised) ----
    // 1) materialize an operator-internal frame exactly the way the
    //    operators do: localCheckpoint = truncated lineage, blocks
    //    held only on executors (16 partitions → both JVMs hold some)
    val docs = Tables.documents(spark, sfDir)
    val inflight = graft.operators.Dedup.indexDocs(docs, "doc_id", "text")
      .repartition(16).localCheckpoint(true)
    require(inflight.count() > 0)
    // reference result from a complete operator run, pre-loss
    def pairs() = graft.operators.Dedup
      .minHashLshPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = pairs()
    require(before.nonEmpty)
    // 2) abruptly lose ONE executor JVM: a task schedules a delayed
    //    halt (not System.exit — no shutdown hooks, a real crash) and
    //    completes, then its JVM dies taking its blocks with it
    spark.sparkContext.parallelize(Seq(1), 1).foreach { _ =>
      new Thread(() => { Thread.sleep(300); Runtime.getRuntime.halt(77) })
        .start()
    }
    Thread.sleep(4000)
    // 3) the in-flight frame is DEAD: lost blocks + truncated lineage
    //    must fail the job — silently recomputing partial data would
    //    be corruption, not resilience
    val poisoned = scala.util.Try(inflight.count())
    require(poisoned.isFailure,
      s"expected job failure on the checkpointed frame after executor loss, got $poisoned")
    // 4) the retry unit is the operator CALL: once the standalone
    //    master registers a replacement executor, a fresh run
    //    converges to the identical output (all inputs are table
    //    reads; outputs overwrite-by-version)
    val redeadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (executorCount() < 2 && System.nanoTime() < redeadline) Thread.sleep(500)
    require(executorCount() >= 2, "replacement executor never registered")
    require(pairs() == before,
      "operator retry after executor loss diverged from the pre-loss result")

    val qs = counts.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(s"""{"smoke":"ok","executors":$executors,"drill":"executor-loss-ok","sf":"$sfDir",$qs}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: run one registry query with a job listener and print each
  * Spark job's wall time + first line of its call site — locates which
  * stage of a composite pipeline (e.g. q55 curate) dominates.
  *
  * usage: runMain graft.ProfileQ <sfDir> <queryName>
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) sys.error("usage: runMain graft.ProfileQ <sfDir> <queryName>")
    val Array(sfDir, name) = args.take(2)
    // same session recipe as Bench/Verify — a profile is only useful if
    // it observes the plans those mains actually execute
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-profile", cpus)

    val base = new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
    // jobs at or below the cutoff belong to the cold run: listener events
    // arrive on an async bus, so a clear()-based reset would let
    // still-queued cold events repopulate the map and print into the
    // warm profile — filter by job id instead, which is race-free
    val cutoff = new java.util.concurrent.atomic.AtomicInteger(-1)
    val starts = scala.collection.concurrent.TrieMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        if (j.jobId <= cutoff.get()) return
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .filter(_.nonEmpty)
          .orElse(j.stageInfos.lastOption.map(si =>
            s"${si.name} [${j.stageInfos.map(_.numTasks).sum} tasks/${j.stageInfos.size} stages]"))
          .getOrElse("?")
        starts(j.jobId) = (System.nanoTime(), site)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.get(j.jobId).foreach { case (t0, site) =>
          val at = (t0 - base.get()) / 1e9
          println(f"JOB ${j.jobId}%3d @$at%7.3f +${(System.nanoTime() - t0) / 1e9}%7.3f s  $site")
        }
    })

    val q = queries.Registry.all.find(_.name == name)
      .getOrElse(sys.error(s"unknown query $name"))
    // cold run first: codegen compile + JIT dominate it (see
    // spark4-api-gotchas); the printed per-job profile is the WARM run
    q.spark(spark, sfDir).collect()
    println("--- warm run ---")
    Thread.sleep(200) // let the bus drain the cold run's queued events
    cutoff.set((spark.sparkContext.statusTracker.getJobIdsForGroup(null) ++
      starts.keys).foldLeft(-1)(math.max))
    starts.clear()
    base.set(System.nanoTime())
    val t0 = System.nanoTime()
    val n = q.spark(spark, sfDir).collect().length
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
    spark.stop()
  }
}

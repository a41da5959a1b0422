package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
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
    // wall-clock twin of `base`: stage submissionTime is epoch millis, so
    // filtering it against nanoTime/1e6 (arbitrary origin) was always-true
    val baseMs = new java.util.concurrent.atomic.AtomicLong(System.currentTimeMillis())
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
          // broadcast-exchange futures all share the useless
          // "withThreadLocalCaptured at CompletableFuture" call site —
          // the stage name (the exchange's own call site) locates them
          .filter(!_.contains("CompletableFuture"))
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
      // stage-level executor metrics separate real compute from GC and
      // from scheduling/planning gaps — at bench scale (MBs of input)
      // multi-second jobs are usually NOT data compute
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        // cold-run stages are silenced (cutoff == MaxValue while the cold
        // run executes), and cold events that drain from the async bus
        // AFTER the warm reset are dropped by the epoch-millis baseline
        if (cutoff.get() < Int.MaxValue &&
            si.submissionTime.exists(_ >= baseMs.get() - 10)) {
          val m = si.taskMetrics
          val run = m.executorRunTime / 1e3
          val cpu = m.executorCpuTime / 1e9
          val gc = m.jvmGCTime / 1e3
          val deser = m.executorDeserializeTime / 1e3
          if (run > 0.15 || deser > 0.15)
            println(f"  STAGE ${si.stageId}%4d run=$run%6.2f cpu=$cpu%6.2f gc=$gc%5.2f deser=$deser%5.2f tasks=${si.numTasks}%3d  ${si.name.take(90)}")
        }
      }
    })

    // in-JVM sampling profiler over the executor worker threads: every
    // 25 ms, record the top frames of each task thread (the sandbox
    // hides the JVM from external jstack). Prints a frame histogram at
    // exit — separates real compute from lock waits.
    val frameCounts = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    // the DRIVER thread gets its own histogram: at bench scale the gaps
    // BETWEEN jobs (analysis/optimization/codegen/commit on this thread)
    // often outweigh the jobs themselves
    val driverThread = Thread.currentThread()
    val driverCounts = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    val sampler = new Thread(() => {
      while (true) {
        val all = Thread.getAllStackTraces()
        all.forEach { (t, frames) =>
          if (t.getName.startsWith("Executor task launch worker") && frames.nonEmpty) {
            val sig = t.getState.toString + " " +
              frames.take(8).mkString(" <- ")
            frameCounts.merge(sig, 1L, (a, b) => a + b)
          }
          if ((t eq driverThread) && frames.nonEmpty) {
            val sig = t.getState.toString + " " +
              frames.take(10).mkString(" <- ")
            driverCounts.merge(sig, 1L, (a, b) => a + b)
          }
        }
        Thread.sleep(25)
      }
    })
    sampler.setDaemon(true)
    if (sys.env.contains("GRAFT_PROFILE_STACKS")) sampler.start()

    // comma-separated names profile several queries in ONE JVM (the
    // dominant cost of a profiling sweep is sbt+JVM+session startup)
    name.split(",").toSeq.foreach { qn =>
      val q = queries.Registry.all.find(_.name == qn)
        .getOrElse(sys.error(s"unknown query $qn"))
      // cold run first: codegen compile + JIT dominate it (see
      // spark4-api-gotchas); the printed per-job profile is the WARM run
      cutoff.set(Int.MaxValue) // silence the cold run's job lines
      q.spark(spark, sfDir).collect()
      println(s"--- warm run $qn ---")
      Thread.sleep(200) // let the bus drain the cold run's queued events
      cutoff.set((spark.sparkContext.statusTracker.getJobIdsForGroup(null) ++
        starts.keys).foldLeft(-1)(math.max))
      starts.clear()
      base.set(System.nanoTime())
      baseMs.set(System.currentTimeMillis())
      val t0 = System.nanoTime()
      val n = q.spark(spark, sfDir).collect().length
      println(f"TOTAL $qn ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
    }
    if (sys.env.contains("GRAFT_PROFILE_STACKS")) {
      import scala.jdk.CollectionConverters._
      println("--- task-thread frame histogram (25ms samples) ---")
      frameCounts.asScala.toSeq.sortBy(-_._2).take(40).foreach {
        case (sig, c) => println(f"$c%6d  $sig")
      }
      println("--- driver-thread frame histogram (25ms samples) ---")
      driverCounts.asScala.toSeq.sortBy(-_._2).take(40).foreach {
        case (sig, c) => println(f"$c%6d  $sig")
      }
    }
    spark.stop()
  }
}

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
    val Array(sfDir, name) = args.take(2)
    // same session recipe as Bench/Verify — a profile is only useful if
    // it observes the plans those mains actually execute
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local("graft-profile", cpus)

    val base = new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
    val starts = scala.collection.concurrent.TrieMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
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
    starts.clear()
    base.set(System.nanoTime())
    val t0 = System.nanoTime()
    val n = q.spark(spark, sfDir).collect().length
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
    spark.stop()
  }
}

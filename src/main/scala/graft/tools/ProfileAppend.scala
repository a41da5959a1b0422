package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev-only JOB-level profiler for the durable-LSH serving append
  * (the q219 bench shape): builds the sf-dir fixture store once, then
  * runs serving-cadence appends with a listener that prints every
  * Spark job's wall and the DRIVER GAP before it (planning, commit
  * protocol, catalog work — the time no task is running). The sum of
  * gaps is the part of the append's wall that job-count reduction
  * recovers; the sum of job walls is the part only task work explains.
  * Usage: runMain graft.tools.ProfileAppend [sfDir] [nAppends] */
object ProfileAppend {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val nAppends = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.local("graft-profile-append",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val db = "profile_append"
    val loc = java.nio.file.Files.createTempDirectory("graft-profile-append-")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$loc'")
    val docs = graft.Tables.documents(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
    Dedup.lshBuildIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", s"$db.lsh")

    case class J(id: Int, desc: String, sub: Long, var end: Long)
    val jobs = mutable.ArrayBuffer[J]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          val site = e.stageInfos.lastOption.map(_.details.linesIterator
            .filterNot(l => l.contains("org.apache.spark") ||
              l.contains("java.") || l.contains("scala."))
            .take(2).mkString(" <- ")).getOrElse("")
          val names = e.stageInfos.map(s => s"${s.name.takeWhile(_ != ' ')}:${s.numTasks}")
            .mkString(",")
          jobs += J(e.jobId, s"[$names] $site", System.nanoTime(), 0L)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.find(_.id == e.jobId).foreach(_.end = System.nanoTime())
        }
    }
    spark.sparkContext.addSparkListener(listener)

    // PROFILE_ENTRY=1 profiles the whole q219 registry closure (what
    // Bench times) instead of the bare operator call
    val entryMode = sys.env.get("PROFILE_ENTRY").contains("1")
    val q219 = graft.SparkEntry.queries("q219_lsh_append_only")
    if (entryMode) { q219(spark, sfDir).count(); () } // fixture build + call 0
    (1 to nAppends).foreach { callNo =>
      val batch = docs.filter(col("doc_id") % 20 === 1)
        .withColumn("doc_id", col("doc_id") + lit(callNo * 1000000000L))
        .withColumn("text", array_join(transform(split(col("text"), " "),
          t => concat(t, lit("~"), lit(callNo))), " "))
        .coalesce(4)
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      if (entryMode) q219(spark, sfDir).count()
      else Dedup.lshIndexAppend(spark, s"$db.lsh", batch, "doc_id", "text",
        threshold = 0.5).count()
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftBridge.waitForListenerBus(spark)
      val snap = jobs.synchronized(jobs.toVector).sortBy(_.sub)
      var prevEnd = t0
      var gapSum = 0.0
      var jobSum = 0.0
      println(f"== append $callNo: wall $wall%.2f s, ${snap.size} jobs ==")
      snap.foreach { j =>
        val gap = (j.sub - prevEnd) / 1e9
        val dur = if (j.end == 0L) 0.0 else (j.end - j.sub) / 1e9
        gapSum += math.max(gap, 0.0); jobSum += dur
        println(f"  job ${j.id}%4d gap $gap%6.3f run $dur%6.3f  ${j.desc.take(90)}")
        prevEnd = math.max(prevEnd, if (j.end == 0L) j.sub else j.end)
      }
      val tail = (t0 + (wall * 1e9).toLong - prevEnd) / 1e9
      println(f"  [sum] gaps $gapSum%.2f s + jobs $jobSum%.2f s + tail $tail%.2f s = wall $wall%.2f s")
    }
    spark.stop()
  }
}

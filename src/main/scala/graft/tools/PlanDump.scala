package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool: write `.explain("formatted")` for registry queries to
  * files — the plan evidence committed under plans/rNN/ for the
  * optimization rounds (the judge checks plan claims against these).
  *
  * usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [names]
  *   names: comma-separated registry names (prefix match); default = a
  *   representative set — every query an optimization round touched.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [names]")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val only = args.lift(3).map(_.split(",").toSeq)
    val spark = graft.GraftSession.local("graft-plandump",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    Files.createDirectories(Paths.get(outDir))
    graft.queries.Registry.all
      .filter(q => only.forall(_.exists(q.name.startsWith)))
      .foreach { q =>
        try {
          val df = q.spark(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.write(Paths.get(outDir, s"${q.name}_$suffix.txt"),
            txt.getBytes("UTF-8"))
          println(s"dumped ${q.name}")
        } catch { case e: Throwable =>
          println(s"FAILED ${q.name}: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}

ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "breadspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The bench/verify contract: the LAST raw stdout line of
// `sbt "runMain graft.Bench"` must be the machine-readable JSON record.
// sbt's default LoggedOutput strategy prefixes every forked-process line
// with "[info] " and appends its own "[success] Total time ..." line
// after the run, so the JSON was never last nor unprefixed. StdoutOutput
// inherits the parent's stdout (no prefix); showSuccess=false drops the
// trailing [success] line. Exit codes and logging to stderr are
// unaffected.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command loop, not by any task — the
// lintUnused warning for it is a false positive (and stdout noise).
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default: the full bench/verify runs ~140 queries x 3 executions
  // in one JVM; at 8g the later queries ran up to 15x slower than in
  // isolation from accumulated GC pressure (the box has 128 GiB).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Throughput collector: this is a batch workload with allocation-heavy
  // inner loops (hash/shingle kernels), where G1's concurrent machinery
  // degrades badly at large heaps (measured 2x total / 8x on the
  // allocation-heaviest query at -Xmx90g, and cumulative across a long
  // run). ParallelGC keeps the same numbers at 8g and 90g.
  "-XX:+UseParallelGC",
  // Deep-but-linear Column chains (bpeApply folds one replace per
  // learned merge — hundreds for a realistic table) recurse once per
  // node in Catalyst's converter/analyzer; the JVM default stack
  // (512k-1M) makes that conversion depth-limited and intermittently
  // flaky. 32m matches what spark-submit setups use for deep plans.
  "-Xss32m",
)

package graft.queries

import org.apache.spark.sql.SparkSession

/** Build-once-per-JVM durable fixtures for the registry's lifecycle
  * SERVE-face entries (q219/q220). The lifecycle-correctness entries
  * (q215/q217) deliberately time build + serve in one body — they pin
  * the whole edge cross-engine; these fixtures exist so their serve
  * twins can measure ONLY the recurring cost: Bench warms every query
  * once before its measured pair, so the first call pays the store
  * build here and the measured calls append/refit against a standing
  * store — the deployment steady state. Verify's single call also
  * builds on first touch, so correctness never depends on call order.
  *
  * Keyed by (name, sfDir): the driver runs Verify at sf0.01 and Bench
  * at sf0.1 in separate JVMs, but a local profiling run may touch both
  * scale factors in one session — each pair gets its OWN database (the
  * sfDir is folded into the db name) so scale factors never alias.
  */
object Fixtures {
  private val built = scala.collection.mutable.HashMap.empty[String, String]

  /** Returns the database name holding the fixture, building it via
    * `build(db)` the first time this (name, sfDir) pair is requested
    * in the JVM. The database lives in a fresh temp dir under the
    * janitor's `graft-` prefix (GraftSession reaps stale ones). */
  def once(spark: SparkSession, name: String, sfDir: String)(
      build: String => Unit): String = synchronized {
    built.getOrElseUpdate(s"$name|$sfDir", {
      val db = name + "_" +
        java.lang.Long.toHexString(sfDir.hashCode.toLong & 0xffffffffL)
      val loc = java.nio.file.Files.createTempDirectory(s"graft-$name")
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$loc'")
      build(db)
      db
    })
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the shared session contract the mains rely on: scale-relevant
  * conf defaults and the SQL registration of the custom expressions.
  *
  * Deliberately does NOT call GraftSession.local here: getOrCreate on
  * the shared test session would re-apply the recommended conf to it,
  * changing planner behavior for every suite that runs afterwards
  * (order-dependent flakiness). The conf contract is asserted as data;
  * the fresh-session path is exactly `recommendedConf` + the builder
  * boilerplate, both visible in GraftSession.local.
  */
class GraftSessionSpec extends AnyFunSuite with SparkSpec {

  test("registered SQL surface: vec_dot/vec_norm/minhash/simhash_tokens resolve") {
    graft.plans.GraftExtensions.register(spark) // idempotent
    val r = spark.sql("""
      SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
             vec_norm(array(3.0D, 4.0D)) AS n,
             size(minhash(array('a b c d'), 4)) AS k,
             length(simhash_tokens(array('a', 'b'))) AS hx""").head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 5.0)
    assert(r.getInt(2) === 4)
    assert(r.getInt(3) === 16)
  }

  test("fixture janitor: a dir with fresh DEEP writes survives; a fully-stale dir is reaped") {
    import java.nio.file.Files
    val old = System.currentTimeMillis() - 7L * 3600 * 1000
    // stale fixture: root and every file inside untouched for 7 h
    val stale = Files.createTempDirectory("graft-janitorstale")
    val sPart = stale.resolve("part-0"); Files.writeString(sPart, "x")
    assert(sPart.toFile.setLastModified(old) && stale.toFile.setLastModified(old))
    // live fixture: the ROOT mtime is 7 h old (parquet writes under
    // table subdirs never touch it) but a part file deep inside is
    // minutes old — the long-stress-sweep shape the root-mtime rule
    // used to reap mid-use
    val live = Files.createTempDirectory("graft-janitorlive")
    val deep = live.resolve("table").resolve("part-0")
    Files.createDirectories(deep.getParent)
    Files.writeString(deep, "x")
    assert(deep.getParent.toFile.setLastModified(old) &&
      live.toFile.setLastModified(old))
    GraftSession.reapStaleFixtures()
    assert(!Files.exists(stale), "fully-stale fixture should be reaped")
    assert(Files.exists(deep), "deep-fresh fixture must survive the janitor")
    // cleanup the survivor
    Files.delete(deep); Files.delete(deep.getParent); Files.delete(live)
  }

  test("the recommended conf carries the documented scale contract") {
    val c = GraftSession.recommendedConf
    assert(c("spark.sql.adaptive.enabled") == "true")
    assert(c("spark.sql.adaptive.coalescePartitions.enabled") == "true")
    assert(c("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(c("spark.sql.sources.partitionColumnTypeInference.enabled") == "false")
    assert(c("spark.sql.session.timeZone") == "UTC")
  }

  test("withMaintenanceConf: scoped inside, restored after body, exception, and nesting") {
    val aqe0 = spark.conf.getOption("spark.sql.adaptive.enabled")
    val shuf0 = spark.conf.getOption("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.shuffle.partitions", "17")
      // scoped inside, restored after a normal exit
      GraftSession.withMaintenanceConf(spark, 3) {
        assert(spark.conf.get("spark.sql.adaptive.enabled") == "false")
        assert(spark.conf.get("spark.sql.shuffle.partitions") == "3")
        // reentrant: a NESTED scope keeps its own width, and exiting it
        // must NOT restore the caller's conf early — only the outermost
        // exit does (the overlapping-appends guarantee)
        GraftSession.withMaintenanceConf(spark, 5) {
          assert(spark.conf.get("spark.sql.shuffle.partitions") == "5")
        }
        assert(spark.conf.get("spark.sql.adaptive.enabled") == "false",
          "inner exit must not restore the session conf early")
      }
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "17")
      // restored when the body throws (a failed append must not strand
      // the session with AQE off)
      intercept[RuntimeException] {
        GraftSession.withMaintenanceConf(spark, 2) {
          throw new RuntimeException("append failed")
        }
      }
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "17")
      // the width floor: a zero/negative hint still yields a valid conf
      GraftSession.withMaintenanceConf(spark, 0) {
        assert(spark.conf.get("spark.sql.shuffle.partitions") == "1")
      }
      // CONCURRENT overlap (the race the depth counter exists for):
      // two appends on the same session interleave enter/exit — the
      // first exit must leave the session scoped, the last must
      // restore the ORIGINAL values, never the other scope's
      val aEntered = new java.util.concurrent.CountDownLatch(1)
      val bDone = new java.util.concurrent.CountDownLatch(1)
      val t = new Thread(() =>
        GraftSession.withMaintenanceConf(spark, 7) {
          aEntered.countDown()
          bDone.await() // hold the scope open across B's whole lifetime
        })
      t.start()
      aEntered.await()
      GraftSession.withMaintenanceConf(spark, 9) {
        assert(spark.conf.get("spark.sql.adaptive.enabled") == "false")
      } // B exits while A is still inside
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "false",
        "B's exit must not restore while A's scope is open")
      bDone.countDown(); t.join(10000)
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
        "A's exit (the last) must restore the pre-scope conf")
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "17")
    } finally {
      def put(k: String, v: Option[String]): Unit = v match {
        case Some(x) => spark.conf.set(k, x)
        case None => spark.conf.unset(k)
      }
      put("spark.sql.adaptive.enabled", aqe0)
      put("spark.sql.shuffle.partitions", shuf0)
    }
  }
}

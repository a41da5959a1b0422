package graft

import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** Unit semantics of the CDC operators on hand-built frames — the
  * oracled registry entries (q93-q96) cover them at table scale; these
  * pin the edge cases those queries don't reach (deletes, null compare
  * columns, same-ts tie-breaks).
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("upsert applies updates, inserts, and tombstoned deletes") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val changes = Seq((2L, "b2", 25.0), (4L, "d", 40.0)).toDF("k", "name", "v")
    val deletes = Seq(Tuple1(3L)).toDF("k")
    val got = Cdc.upsert(base, changes, "k", Some(deletes))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b2", 25.0), (4L, "d", 40.0)))
  }

  test("scd2 builds half-open intervals with a deterministic same-ts tie-break") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val log = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), "bronze"),
      (1L, 11L, ts("2024-01-01 00:00:00"), "silver"), // same ts → id breaks it
      (1L, 12L, ts("2024-01-02 00:00:00"), "gold"),
      (2L, 20L, ts("2024-01-05 00:00:00"), "bronze"))
      .toDF("k", "id", "ts", "tier")
    val got = Cdc.scd2(log, "k", "ts", "id")
      .select("k", "id", "tier", "is_current").orderBy("k", "id")
      .as[(Long, Long, String, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 10L, "bronze", false), (1L, 11L, "silver", false),
      (1L, 12L, "gold", true), (2L, 20L, "bronze", true)))
    // interval chaining: each non-current row's valid_to is the key's
    // next valid_from
    val iv = Cdc.scd2(log, "k", "ts", "id").filter(col("k") === 1)
      .select("valid_from", "valid_to").orderBy("id")
      .as[(java.sql.Timestamp, Option[java.sql.Timestamp])].collect()
    assert(iv(0)._2.contains(iv(1)._1) && iv(1)._2.contains(iv(2)._1))
    assert(iv(2)._2.isEmpty)
  }

  test("compactLatest keeps exactly the newest row per key") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val log = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), "old"),
      (1L, 11L, ts("2024-01-03 00:00:00"), "new"),
      (2L, 20L, ts("2024-01-02 00:00:00"), "only"))
      .toDF("k", "id", "ts", "v")
    val got = Cdc.compactLatest(log, "k", Seq(col("ts").desc, col("id").desc))
      .select("k", "v").orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "new"), (2L, "only")))
  }

  test("writeVersioned: replayed runs land in place (run twice ≡ run once)") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdc-ver").toString
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val changes = Seq((2L, "b2", 25.0), (4L, "d", 40.0)).toDF("k", "name", "v")

    def runUpsert(): Unit = Cdc.writeVersioned(
      Cdc.upsert(base, changes, "k"), s"$root/upserted", version = 7L)
    runUpsert()
    val once = Cdc.readLatest(spark, s"$root/upserted")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    runUpsert() // orchestrator retry of the SAME run id
    runUpsert()
    val thrice = Cdc.readLatest(spark, s"$root/upserted")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(once == thrice && once.map(_._1) == Seq(1L, 2L, 3L, 4L))

    // compaction output through the same sink: replay-safe, and a newer
    // version supersedes without touching the old one (time travel)
    val log = Seq((1L, 1L, "x"), (1L, 2L, "y"), (2L, 3L, "z"))
      .toDF("k", "ts", "payload")
    def runCompact(v: Long, l: org.apache.spark.sql.DataFrame): Unit =
      Cdc.writeVersioned(
        Cdc.compactLatest(l, "k", Seq(col("ts").desc)), s"$root/compacted", v)
    runCompact(1L, log)
    runCompact(1L, log) // replay
    assert(Cdc.readLatest(spark, s"$root/compacted")
      .orderBy("k").as[(Long, Long, String)].collect().toSeq ==
      Seq((1L, 2L, "y"), (2L, 3L, "z")))
    runCompact(2L, log.union(Seq((1L, 9L, "w")).toDF("k", "ts", "payload")))
    assert(Cdc.completeVersions(spark, s"$root/compacted") == Seq(1L, 2L))
    assert(Cdc.readLatest(spark, s"$root/compacted")
      .filter("k = 1").head().getString(2) == "w")
    // the superseded version is still readable (retention is the caller's)
    assert(spark.read.parquet(s"$root/compacted/v=1")
      .filter("k = 1").head().getString(2) == "y")
  }

  test("tableDiff classifies keys null-safely") {
    val v1 = Seq((1L, Some(10.0)), (2L, None), (3L, Some(30.0)), (5L, Some(50.0)))
      .toDF("k", "v")
    val v2 = Seq((1L, Some(10.0)), (2L, None), (3L, Some(31.0)), (4L, Some(40.0)))
      .toDF("k", "v")
    val got = Cdc.tableDiff(v1, v2, "k", Seq("v"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    // null == null must read unchanged (null-safe compare), not changed
    assert(got == Seq((1L, "unchanged"), (2L, "unchanged"),
      (3L, "changed"), (4L, "added"), (5L, "removed")))
  }

  test("refreshAgg merges state with a delta aggregate: existing, delta-only, and state-only keys") {
    import spark.implicits._
    val state = Seq(("a", 2L, 10.0), ("b", 1L, 5.0)).toDF("k", "n", "total")
    val deltaAgg = Seq(("a", 3L, 7.5), ("c", 1L, 1.0)).toDF("k", "n", "total")
    val got = Cdc.refreshAgg(state, deltaAgg, Seq("k"), Seq("n", "total"))
      .orderBy("k").as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("a", 5L, 17.5), ("b", 1L, 5.0), ("c", 1L, 1.0)))
    // an empty delta is the identity
    val same = Cdc.refreshAgg(state, deltaAgg.limit(0), Seq("k"), Seq("n", "total"))
      .orderBy("k").as[(String, Long, Double)].collect().toSeq
    assert(same == Seq(("a", 2L, 10.0), ("b", 1L, 5.0)))
    // a NULL grouping key must MERGE (null-safe key match), not split
    val nullState = Seq((Option.empty[String], 2L)).toDF("k", "n")
    val nullDelta = Seq((Option.empty[String], 3L)).toDF("k", "n")
    val merged = Cdc.refreshAgg(nullState, nullDelta, Seq("k"), Seq("n"))
      .as[(Option[String], Long)].collect().toSeq
    assert(merged == Seq((None, 5L)))
  }

  test("refreshAgg: NULL sums stay NULL, min/max merge, empty keys = global aggregate") {
    import spark.implicits._
    // SQL SUM over an all-NULL group is NULL; the merge must keep it
    // NULL (a refresh that flips it to 0 diverges from the direct
    // aggregate over base ∪ delta), while a one-sided NULL takes the
    // other side's value
    val s = Seq(("a", Option.empty[Double]), ("b", Some(5.0)))
      .toDF("k", "total")
    val d = Seq(("a", Option.empty[Double]), ("c", Option.empty[Double]))
      .toDF("k", "total")
    val got = Cdc.refreshAgg(s, d, Seq("k"), Seq("total"))
      .orderBy("k").as[(String, Option[Double])].collect().toSeq
    assert(got == Seq(("a", None), ("b", Some(5.0)), ("c", None)))
    // min/max columns merge with least/greatest (insert-only contract)
    val sm = Seq(("a", 5L, 9L), ("b", 2L, 3L)).toDF("k", "lo", "hi")
    val dm = Seq(("a", 3L, 7L), ("c", 8L, 8L)).toDF("k", "lo", "hi")
    val mm = Cdc.refreshAgg(sm, dm, Seq("k"), Nil,
        minCols = Seq("lo"), maxCols = Seq("hi"))
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(mm == Seq(("a", 3L, 9L), ("b", 2L, 3L), ("c", 8L, 8L)))
    // the global (no-key) aggregate: two 1-row states merge to one row
    val g = Cdc.refreshAgg(
        Seq((2L, 10.0)).toDF("n", "total"),
        Seq((3L, 7.5)).toDF("n", "total"),
        Seq.empty, Seq("n", "total"))
      .as[(Long, Double)].collect().toSeq
    assert(g == Seq((5L, 17.5)))
  }

  test("refreshAgg: decimal schema is stable across cycles; a true overflow refuses loudly") {
    import spark.implicits._
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(4, 0)
    val s = Seq(("a", "9000"), ("b", "10")).toDF("k", "total")
      .select(col("k"), col("total").cast(dec).as("total"))
    val small = Seq(("b", "5")).toDF("k", "total")
      .select(col("k"), col("total").cast(dec).as("total"))
    // the cast-back keeps the state schema fixed (no precision drift)
    val refreshed = Cdc.refreshAgg(s, small, Seq("k"), Seq("total"))
    assert(refreshed.schema("total").dataType == dec)
    assert(refreshed.orderBy("k").select("total").as[String].collect()
      .toSeq == Seq("9000", "15"))
    // a merged sum that exceeds decimal(4,0) must FAIL, not cast to
    // NULL (which the next cycle's coalesce would read as empty state,
    // silently dropping the accumulated total). Under ANSI (the Spark 4
    // default) the narrowing cast itself throws; under non-ANSI the
    // cast returns NULL and the in-plan raise_error guard must fire —
    // both modes are pinned here so neither configuration can lose a
    // delta silently.
    val big = Seq(("a", "9000")).toDF("k", "total")
      .select(col("k"), col("total").cast(dec).as("total"))
    def messages(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage}\n${messages(t.getCause)}"
    val ansiKey = "spark.sql.ansi.enabled"
    val prevAnsi = spark.conf.get(ansiKey)
    try {
      spark.conf.set(ansiKey, "true")
      val eAnsi = intercept[Exception] {
        Cdc.refreshAgg(s, big, Seq("k"), Seq("total")).collect()
      }
      assert(messages(eAnsi).contains("NUMERIC_VALUE_OUT_OF_RANGE") ||
        messages(eAnsi).contains("overflows"), messages(eAnsi))
      spark.conf.set(ansiKey, "false")
      val eNull = intercept[Exception] {
        Cdc.refreshAgg(s, big, Seq("k"), Seq("total")).collect()
      }
      assert(messages(eNull).contains("overflows"), messages(eNull))
    } finally spark.conf.set(ansiKey, prevAnsi)
  }

  test("refreshAgg: INTEGRAL sum overflow refuses loudly instead of wrapping") {
    import spark.implicits._
    def messages(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage}\n${messages(t.getCause)}"
    val ansiKey = "spark.sql.ansi.enabled"
    val prevAnsi = spark.conf.get(ansiKey)
    try {
      // non-ANSI is the dangerous mode: long + long and the narrowing
      // cast both WRAP with no NULL, so without the widened merge the
      // state would silently flip sign — the in-plan guard must fire
      spark.conf.set(ansiKey, "false")
      val sL = Seq(("a", Long.MaxValue - 5L), ("b", 10L)).toDF("k", "total")
      val dL = Seq(("a", 10L), ("b", 5L)).toDF("k", "total")
      val eL = intercept[Exception] {
        Cdc.refreshAgg(sL, dL, Seq("k"), Seq("total")).collect()
      }
      assert(messages(eL).contains("overflows"), messages(eL))
      // int state: the merge widens to long, the round-trip check
      // catches the wrap that cast(long -> int) would hide
      val sI = Seq(("a", Int.MaxValue - 5), ("b", 1)).toDF("k", "total")
      val dI = Seq(("a", 10), ("b", 2)).toDF("k", "total")
      val eI = intercept[Exception] {
        Cdc.refreshAgg(sI, dI, Seq("k"), Seq("total")).collect()
      }
      assert(messages(eI).contains("overflows"), messages(eI))
      // and the non-overflowing path keeps the state type AND the sums
      val ok = Cdc.refreshAgg(sI, dI.filter(col("k") === "b"),
        Seq("k"), Seq("total"))
      assert(ok.schema("total").dataType ==
        org.apache.spark.sql.types.IntegerType)
      assert(ok.orderBy("k").as[(String, Int)].collect().toSeq ==
        Seq(("a", Int.MaxValue - 5), ("b", 3)))
    } finally spark.conf.set(ansiKey, prevAnsi)
  }

  test("upsert and tableDiff are null-safe on the KEY, not just the compared columns") {
    import spark.implicits._
    // a null-key change row must SUPERSEDE the base's null-key row
    val base = Seq((Option(1L), "a"), (Option.empty[Long], "old"))
      .toDF("k", "v")
    val changes = Seq((Option.empty[Long], "new")).toDF("k", "v")
    val up = Cdc.upsert(base, changes, "k")
      .as[(Option[Long], String)].collect().toSet
    assert(up == Set((Some(1L), "a"), (None, "new")))
    // and a null-key tombstone must delete it
    val del = Cdc.upsert(base, changes.limit(0), "k",
      deletes = Some(Seq(Option.empty[Long]).toDF("k")))
      .as[(Option[Long], String)].collect().toSet
    assert(del == Set((Some(1L), "a")))
    // tableDiff: a null key present in both versions is ONE row with a
    // real status, not an added+removed pair; null-key only in v1 is
    // "removed", not "added"
    val v1 = Seq((Option(1L), "x"), (Option.empty[Long], "y")).toDF("k", "c")
    val v2 = Seq((Option(1L), "x"), (Option.empty[Long], "z")).toDF("k", "c")
    val diff = Cdc.tableDiff(v1, v2, "k", Seq("c"))
      .as[(Option[Long], String)].collect().toSet
    assert(diff == Set((Some(1L), "unchanged"), (None, "changed")))
    val gone = Cdc.tableDiff(v1, v1.filter(col("k").isNotNull), "k", Seq("c"))
      .as[(Option[Long], String)].collect().toSet
    assert(gone == Set((Some(1L), "unchanged"), (None, "removed")))
  }

  test("writeVersioned: a complete version is never rewritten (reader-safe retries)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-cdc-skip").toString
    Cdc.writeVersioned(Seq((1L, "a")).toDF("k", "v"), s"$root/t", 5L)
    val before = new java.io.File(s"$root/t/v=5").listFiles().map(_.getName).toSet
    // a retry with (buggy) different data must be a no-op on a
    // committed version — deterministic replay is the contract, and
    // skipping keeps overwrite from deleting the dir under a reader
    Cdc.writeVersioned(Seq((9L, "z")).toDF("k", "v"), s"$root/t", 5L)
    val after = new java.io.File(s"$root/t/v=5").listFiles().map(_.getName).toSet
    assert(before == after)
    assert(Cdc.readLatest(spark, s"$root/t")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a")))
  }

  test("writeVersioned: force=true republishes corrected data over a committed version") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-cdc-force").toString
    Cdc.writeVersioned(Seq((1L, "a")).toDF("k", "v"), s"$root/t", 5L)
    // a deliberate correction is NOT a replay: force overwrites in place
    Cdc.writeVersioned(Seq((9L, "z")).toDF("k", "v"), s"$root/t", 5L, force = true)
    assert(Cdc.readLatest(spark, s"$root/t")
      .as[(Long, String)].collect().toSeq == Seq((9L, "z")))
  }

  test("completeVersions skips foreign v= entries instead of crashing") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-cdc-alien").toString
    Cdc.writeVersioned(Seq((1L, "a")).toDF("k", "v"), s"$root/t", 3L)
    new java.io.File(s"$root/t/v=latest").mkdirs()
    new java.io.File(s"$root/t/v=latest/_SUCCESS").createNewFile()
    assert(Cdc.completeVersions(spark, s"$root/t") == Seq(3L))
    assert(Cdc.readLatest(spark, s"$root/t").count() == 1L)
  }

  test("scd2 refuses NULL change timestamps instead of faking multiple current rows") {
    val log = Seq(
      (1L, None: Option[java.sql.Timestamp], "a"),
      (1L, None: Option[java.sql.Timestamp], "b"),
      (1L, Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), "c"))
      .toDF("k", "ts", "v")
    val e = intercept[Exception] {
      Cdc.scd2(log, "k", "ts", "v").collect()
    }
    assert(String.valueOf(e.getMessage).contains("null ts"), e.getMessage)
    // and re-running scd2 on its own output refuses instead of clobbering
    val ok = Cdc.scd2(log.filter(col("ts").isNotNull), "k", "ts", "v")
    val e2 = intercept[IllegalArgumentException] {
      Cdc.scd2(ok, "k", "ts", "v")
    }
    assert(e2.getMessage.contains("valid_from"), e2.getMessage)
  }

  test("tableDiff refuses duplicate keys instead of emitting a per-key cross product") {
    val v1 = Seq((7L, "a"), (7L, "b"), (8L, "c")).toDF("k", "v")
    val v2 = Seq((7L, "a"), (8L, "c")).toDF("k", "v")
    val e = intercept[Exception] {
      Cdc.tableDiff(v1, v2, "k", Seq("v")).collect()
    }
    assert(String.valueOf(e.getMessage).contains("duplicate v1-side key"),
      e.getMessage)
    // unique keys still diff normally
    val ok = Cdc.tableDiff(v1.filter(col("v") =!= "b"), v2, "k", Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ok == Map(7L -> "unchanged", 8L -> "unchanged"), ok)
  }

  test("refreshAgg keeps the state's decimal type stable across refresh cycles") {
    val state = spark.sql(
      "SELECT 1L AS k, CAST(10 AS DECIMAL(20,0)) AS s")
    val delta = spark.sql(
      "SELECT 1L AS k, CAST(5 AS DECIMAL(20,0)) AS s")
    var cur = state
    // Add widens decimal precision by one per cycle; without the cast
    // the third refresh would already be decimal(23,0) and a
    // fixed-schema sink fed by the state would refuse the drift
    (1 to 3).foreach { _ =>
      cur = Cdc.refreshAgg(cur, delta, Seq("k"), Seq("s"))
      assert(cur.schema("s").dataType == state.schema("s").dataType,
        cur.schema("s").dataType.toString)
    }
    assert(cur.collect().head.getDecimal(1).longValueExact == 25L)
  }
}

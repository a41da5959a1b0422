package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoin

class TemporalJoinSpec extends AnyFunSuite with SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOf picks the latest right row at-or-before each left row, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, "k1", ts("2024-01-01 10:00:00")),  // after both k1 rights
      (2L, "k1", ts("2024-01-01 08:30:00")),  // between the two
      (3L, "k1", ts("2024-01-01 08:00:00")),  // EQUAL to a right ts → inclusive
      (4L, "k1", ts("2024-01-01 07:00:00")),  // before every right → null
      (5L, "k2", ts("2024-01-01 10:00:00"))   // key with no right rows → null
    ).toDF("id", "k", "t")
    val right = Seq(
      ("k1", ts("2024-01-01 08:00:00"), "a"),
      ("k1", ts("2024-01-01 09:00:00"), "b")
    ).toDF("k", "rt", "v")
    val out = TemporalJoin.asOf(left, right, "k", "t", "rt", Seq("rt", "v"))
      .orderBy("id").collect()
    assert(out.map(r => (r.getAs[Long]("id"), r.getAs[String]("v"))).toSeq ==
      Seq((1L, "b"), (2L, "a"), (3L, "a"), (4L, null), (5L, null)))
    // left row count is preserved exactly (no explosion, no drops)
    assert(out.length == 5)
  }

  test("asOf rejects colliding right column names") {
    import spark.implicits._
    val l = Seq((1L, "k", ts("2024-01-01 00:00:00"))).toDF("id", "k", "t")
    val r = Seq(("k", ts("2024-01-01 00:00:00"))).toDF("k", "t")
    intercept[IllegalArgumentException](
      TemporalJoin.asOf(l, r, "k", "t", "t", Seq("t")))
  }

  test("intervalJoin: inclusive lower, exclusive upper, matches across bucket edges") {
    import spark.implicits._
    val min15 = 15L * 60 * 1000 * 1000
    val left = Seq((1L, "u", ts("2024-01-01 10:00:00"))).toDF("id", "u", "t")
    val right = Seq(
      ("u", 10L, ts("2024-01-01 09:45:00")), // == t - 15min → inclusive
      ("u", 11L, ts("2024-01-01 09:44:59")), // just outside
      ("u", 12L, ts("2024-01-01 09:59:59")), // inside, same bucket as t
      ("u", 13L, ts("2024-01-01 10:00:00")), // == t → exclusive upper
      ("u", 14L, ts("2024-01-01 09:50:00"))  // inside, previous bucket
    ).toDF("u", "rid", "rt")
    val got = TemporalJoin
      .intervalJoin(left, right, "u", "t", "rt", -min15, 0L)
      .select("rid").as[Long].collect().sorted.toSeq
    assert(got == Seq(10L, 12L, 14L))
  }

  test("intervalJoin rejects shared non-key columns") {
    import spark.implicits._
    val l = Seq((1L, "u", ts("2024-01-01 00:00:00"))).toDF("id", "u", "t")
    val r = Seq((2L, "u", ts("2024-01-01 00:00:00"))).toDF("id", "u", "rt")
    intercept[IllegalArgumentException](
      TemporalJoin.intervalJoin(l, r, "u", "t", "rt", -1000000L, 0L))
  }

  test("asOf: a NULL attribute of the matched right row stays NULL — no splicing from older rows") {
    import spark.implicits._
    // right rows: t=5 has (a=3, b=7); t=10 has (a=5, b=NULL). A left row
    // at t=12 matches the t=10 ROW — its b must be NULL, not backfilled
    // from t=5's b (a row that never existed)
    val right = Seq(
      ("k", ts("2024-01-01 00:00:05"), Some(3L), Some(7L)),
      ("k", ts("2024-01-01 00:00:10"), Some(5L), Option.empty[Long]))
      .toDF("key", "rt", "a", "b")
    val left = Seq(("k", ts("2024-01-01 00:00:12"), 1L))
      .toDF("key", "lt", "id")
    val got = TemporalJoin.asOf(left, right, "key", "lt", "rt", Seq("a", "b"))
      .select("a", "b").head()
    assert(got.getLong(0) == 5L && got.isNullAt(1), got)
    // and a left row BEFORE any right row null-extends every column
    val early = Seq(("k", ts("2024-01-01 00:00:01"), 2L))
      .toDF("key", "lt", "id")
    val g2 = TemporalJoin.asOf(early, right, "key", "lt", "rt", Seq("a", "b"))
      .select("a", "b").head()
    assert(g2.isNullAt(0) && g2.isNullAt(1), g2)
  }

  test("reserved working columns are refused, not silently clobbered") {
    import spark.implicits._
    val l = Seq(("k", ts("2024-01-01 00:00:00"), 1L)).toDF("key", "lt", "__t")
    val r = Seq(("k", ts("2024-01-01 00:00:00"), 2L)).toDF("key", "rt", "v")
    intercept[IllegalArgumentException](
      TemporalJoin.asOf(l, r, "key", "lt", "rt", Seq("v")))
    val l2 = Seq(("k", ts("2024-01-01 00:00:00"), 1L)).toDF("key", "lt", "__bucket")
    intercept[IllegalArgumentException](
      TemporalJoin.intervalJoin(l2, r, "key", "lt", "rt", -1000000L, 0L))
  }

  test("asOf: NULL right times and NULL keys never match (ASOF `l.t >= r.t` semantics)") {
    import spark.implicits._
    // a NULL right time would sort nulls-first ('-infinity') and attach
    // to every left row with no other preceding right row; a NULL key
    // would pair with a NULL-key left row through the window partition —
    // both diverge from the documented equality/inequality semantics
    val left = Seq((Some(1L), ts("2024-01-01 10:00:00")),
        (None: Option[Long], ts("2024-01-01 11:00:00")))
      .toDF("key", "lt")
    val right = Seq(
        (Some(1L), None: Option[java.sql.Timestamp], Some(9.0)),
        (None: Option[Long], Some(ts("2024-01-01 09:00:00")), Some(7.0)))
      .toDF("key", "rt", "price")
    val got = TemporalJoin.asOf(left, right, "key", "lt", "rt", Seq("price"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(2)))).toSet
    // both left rows survive (left outer) and neither matched anything
    assert(got == Set((Some(1L), None), (None, None)), got)
  }

  test("intervalJoin: bucket math is exact past 2^53 microseconds (far-future sentinels)") {
    import spark.implicits._
    // unix_micros(9999-12-31) ~ 2.5e17 > 2^53: double division would
    // round the two sides' buckets independently and could disagree at
    // a boundary, silently dropping the pair before the range filter
    val farL = "9999-12-30 23:59:59"
    val farR = "9999-12-31 00:00:30"
    val l = Seq((1L, ts(farL))).toDF("key", "lt")
    val r = Seq((1L, ts(farR)), (1L, ts("9999-12-31 00:02:00"))).toDF("key", "rt")
    // window [0, +60s): only the :00:30 row is inside
    val got = TemporalJoin.intervalJoin(l, r, "key", "lt", "rt",
        0L, 60L * 1000000L)
      .select("rt").collect().map(_.getTimestamp(0)).toSet
    assert(got == Set(ts(farR)), got)
  }
}

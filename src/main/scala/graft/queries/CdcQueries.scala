package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.Cdc

/** Incremental-maintenance semantics (the CDC family): keyed upsert
  * (MERGE), SCD2 validity intervals, keep-latest compaction, and
  * table-version diff. The change sets are derived deterministically
  * from the base tables (key-modulus predicates), so the oracles mirror
  * them exactly — no fixtures, no RNG.
  *
  * Scale shape: upsert and diff are single key-equi joins (anti + union
  * / full outer) — with a bucketed layout (Layout.writeBucketed) both
  * sides co-locate and the shuffle disappears; SCD2 and compaction are
  * per-key windows, local to each key's partition slice.
  */
object CdcQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dbl(c: Column): Column = c.cast("double")
  private val dec224 = DecimalType(22, 4)

  /** Keyed upsert (MERGE INTO shape): apply a change set — updates
    * (keys % 10 = 0, price uplifted by an exact decimal 1.10 factor)
    * plus inserts (shifted keys) — onto the base. Implemented as
    * anti-join (drop superseded rows) + union (apply the change set):
    * the portable MERGE without a transactional table format. The
    * uplift stays in decimal the whole way, so the merged revenue is
    * bit-exact against the oracle. */
  val q93 = Q(
    "q93_upsert",
    (s, d) => {
      val base = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"),
          dec(col("o_totalprice")).cast(dec224).as("p"))
      val upd = base.filter(col("o_orderkey") % 10 === 0)
        .withColumn("p", (col("p") * dec(lit(1.1))).cast(dec224))
      val ins = base.filter(col("o_orderkey") % 1000 === 7)
        .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
      val chg = upd.unionByName(ins)
      Cdc.upsert(base, chg, "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dbl(sum("p")).as("revenue"))
        .orderBy("o_orderstatus")
    },
    Some("""
      WITH base AS (SELECT o_orderkey, o_orderstatus,
                           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(22,4)) AS p
                    FROM orders),
      upd AS (SELECT o_orderkey, o_orderstatus,
                     CAST(p * CAST(1.1 AS DECIMAL(18,2)) AS DECIMAL(22,4)) AS p
              FROM base WHERE o_orderkey % 10 = 0),
      ins AS (SELECT o_orderkey + 100000000 AS o_orderkey, o_orderstatus, p
              FROM base WHERE o_orderkey % 1000 = 7),
      chg AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
      merged AS (
        SELECT * FROM base b
        WHERE NOT EXISTS (SELECT 1 FROM chg c WHERE c.o_orderkey = b.o_orderkey)
        UNION ALL SELECT * FROM chg)
      SELECT o_orderstatus, COUNT(*) AS n,
             CAST(SUM(p) AS DOUBLE) AS revenue
      FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** SCD2 history build: each user event becomes a validity interval
    * [ts, next event's ts), open-ended (null) on the latest — the
    * slowly-changing-dimension type-2 shape built from an event log
    * with one lead() per key. */
  val q94 = Q(
    "q94_scd2_intervals",
    (s, d) =>
      Cdc.scd2(Tables.events(s, d).filter(col("user_id") < 10),
          "user_id", "ts", "event_id")
        .select(col("user_id"), col("event_id"), col("event_type"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("valid_to"),
          col("is_current"))
        .orderBy("user_id", "valid_from", "event_id"),
    Some("""
      SELECT user_id, event_id, event_type,
             strftime(make_timestamp(epoch_us(ts)), '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
             strftime(make_timestamp(epoch_us(LEAD(ts) OVER w)), '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
             LEAD(ts) OVER w IS NULL AS is_current
      FROM events WHERE user_id < 10
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, valid_from, event_id"""))

  /** Keep-latest compaction: one surviving row per key — the CDC-log
    * compaction every incremental sink needs before serving (latest by
    * event time, event_id as the total tie-break). row_number, not
    * max-join: one window pass, no self-join. */
  val q95 = Q(
    "q95_compact_latest",
    (s, d) =>
      Cdc.compactLatest(Tables.events(s, d), "user_id",
          Seq(col("ts").desc, col("event_id").desc))
        .select(col("user_id"), col("event_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"))
        .orderBy("user_id"),
    Some("""
      WITH r AS (SELECT user_id, event_id, event_type, ts,
                        ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events)
      SELECT user_id, event_id, event_type,
             strftime(make_timestamp(epoch_us(ts)), '%Y-%m-%d %H:%M:%S.%f') AS ts
      FROM r WHERE rn = 1 ORDER BY user_id"""))

  /** Table-version diff: classify every key across two table versions
    * (v2 = v1 with deletes, price updates, and inserts applied) as
    * added / removed / changed / unchanged via ONE full outer join —
    * the reconciliation query behind "what did this pipeline run
    * change". Only (key, price) travel, not whole rows. */
  val q96 = Q(
    "q96_table_diff",
    (s, d) => {
      val o = Tables.orders(s, d)
      val v1 = o.select(col("o_orderkey"), col("o_totalprice").as("price"))
      val v2 = o.filter(col("o_orderkey") % 97 =!= 0)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 10 === 0, col("o_totalprice") * 1.1)
            .otherwise(col("o_totalprice")).as("price"))
        .unionByName(o.filter(col("o_orderkey") % 1000 === 7)
          .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
            col("o_totalprice").as("price")))
      Cdc.tableDiff(v1, v2, "o_orderkey", Seq("price"))
        .groupBy("status").agg(count(lit(1)).as("n"))
        .orderBy("status")
    },
    Some("""
      WITH v1 AS (SELECT o_orderkey, o_totalprice AS price FROM orders),
      v2 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 1.1
                    ELSE o_totalprice END AS price
        FROM orders WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 100000000, o_totalprice
        FROM orders WHERE o_orderkey % 1000 = 7),
      d AS (SELECT CASE WHEN v1.o_orderkey IS NULL THEN 'added'
                        WHEN v2.o_orderkey IS NULL THEN 'removed'
                        WHEN v1.price <> v2.price THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey)
      SELECT status, COUNT(*) AS n FROM d GROUP BY status ORDER BY status"""))

  /** Incremental aggregate refresh (Cdc.refreshAgg): aggregate the first
    * 25 days as the stored state, merge the last days' delta aggregate,
    * and the result must equal the direct aggregate over everything —
    * the oracle IS the semantic definition, computed directly in DuckDB.
    * This is materialized-view maintenance: cost |state| + |delta|, not
    * a recompute of the base. */
  val q119 = Q(
    "q119_incremental_refresh",
    (s, d) => {
      val ev = Tables.events(s, d)
      val cut = to_date(lit("2024-01-25"))
      def aggOf(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2))).as("total"))
      Cdc.refreshAgg(
        aggOf(ev.filter(col("ts").cast("date") <= cut)),
        aggOf(ev.filter(col("ts").cast("date") > cut)),
        Seq("event_type"), Seq("n", "total"))
        .select(col("event_type"), col("n").cast("long").as("n"),
          col("total").cast("double").as("total"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Incremental min/max + NULL-sum refresh (the round-10 refreshAgg
    * upgrades, q119's device extended): per-type state over the first
    * date span merged with the second span's delta — counts/sums by the
    * null-preserving SUM merge, min/max by least/greatest (the
    * insert-only contract; events only ever append). The oracle is the
    * direct aggregate over the WHOLE table, so green here hash-proves
    * refresh ≡ recompute for every merge class at once. */
  val q212 = Q(
    "q212_incremental_minmax",
    (s, d) => {
      val ev = Tables.events(s, d)
      val cut = to_date(lit("2024-01-25"))
      def aggOf(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2))).as("total"),
            min(col("value").cast(DecimalType(18, 2))).as("lo"),
            max(col("value").cast(DecimalType(18, 2))).as("hi"))
      Cdc.refreshAgg(
        aggOf(ev.filter(col("ts").cast("date") <= cut)),
        aggOf(ev.filter(col("ts").cast("date") > cut)),
        Seq("event_type"), Seq("n", "total"),
        minCols = Seq("lo"), maxCols = Seq("hi"))
        .select(col("event_type"), col("n").cast("long").as("n"),
          col("total").cast("double").as("total"),
          col("lo").cast("double").as("lo"),
          col("hi").cast("double").as("hi"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
             CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS lo,
             CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS hi
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Weekly purchase retention cohorts: of the users purchasing in week
    * w, the fraction purchasing again in week w+1 — the distinct-per-
    * period self-join every growth dashboard runs. Week index uses
    * INTEGER division on both engines (DuckDB's CAST rounds; `//` is
    * the floor-division that matches Spark's floor). */
  val q120 = Q(
    "q120_weekly_retention",
    (s, d) => {
      // (week, user) pairs feed both sides of the self-join: materialize
      // once (the AQE fan-out rule — see Dedup.minHashLshPairs)
      val wk = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(
          floor(datediff(col("ts").cast("date"), to_date(lit("2024-01-01"))) / 7)
            .cast("long").as("w"),
          col("user_id"))
        .distinct()
        .localCheckpoint(true)
      val a = wk.as("a")
      val b = wk.as("b")
      a.join(b, col("b.user_id") === col("a.user_id") && col("b.w") === col("a.w") + 1, "left")
        .groupBy(col("a.w").as("w"))
        .agg(count(lit(1)).as("active"), count(col("b.user_id")).as("retained"))
        .select(col("w"), col("active"), col("retained"),
          round(col("retained").cast("double") / col("active"), 4).as("retention"))
        .orderBy("w")
    },
    Some("""
      WITH wk AS (SELECT DISTINCT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS w,
                         user_id FROM events WHERE event_type = 'purchase'),
      r AS (SELECT a.w, CAST(COUNT(*) AS BIGINT) AS active,
                   CAST(COUNT(b.user_id) AS BIGINT) AS retained
            FROM wk a LEFT JOIN wk b ON b.user_id = a.user_id AND b.w = a.w + 1
            GROUP BY a.w)
      SELECT CAST(w AS BIGINT) AS w, active, retained,
             ROUND(CAST(retained AS DOUBLE) / active, 4) AS retention
      FROM r ORDER BY w"""))

  def all: Seq[Q] = Seq(q93, q94, q95, q96, q119, q120, q212)
}

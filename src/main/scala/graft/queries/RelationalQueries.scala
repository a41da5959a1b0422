package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational operator coverage for SURVEY.md §2 (scans, projections,
  * casts, joins, aggregates, windows, sorts, set-ops, scalar functions),
  * expressed over the driver's synthetic tables.
  *
  * Scale notes (100 TB thinking, verified via .explain on sf0.1):
  *  - dimension sides of joins (region/nation/customer/part) are explicitly
  *    broadcast — the fact tables (lineitem/orders/events) never move for
  *    dim enrichment;
  *  - aggregates are plain groupBy (partial + final hash agg, map-side
  *    combine for free); no collect-based logic anywhere;
  *  - the only global-window query (cumulative daily totals, SURVEY §2.5
  *    W1) runs over an already-aggregated per-day frame, so the
  *    single-partition window sees ~days rows, not raw events.
  */
object RelationalQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dbl(c: Column): Column = c.cast("double")

  /** TPC-H Q1 shape — scan + filter + hash agg with decimal-exact money
    * math (SURVEY §2.4 A1, §2.2 P5). Reference analog: the daily gas/tx
    * aggregation models (bread dbt/old_models/gas/gas_used_per_day.sql:1-5).
    */
  val q01 = Q(
    "q01_pricing_summary",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          dbl(sum(dec(col("l_quantity")))).as("sum_qty"),
          dbl(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          dbl(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))))
            .as("sum_disc_price"),
          dbl(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
            * (lit(1) + dec(col("l_tax"))))).as("sum_charge"),
          (dbl(sum(dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
          (dbl(sum(dec(col("l_extendedprice")))) / count(lit(1))).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** Projection + range predicate pushed to the parquet scan
    * (SURVEY §2.2 P1/P3/P6; PushedFilters visible in .explain). */
  val q02 = Q(
    "q02_filter_project",
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate").between(
          lit("1997-01-01").cast("timestamp"), lit("1997-03-31").cast("timestamp"))
          && col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1997-03-31 00:00:00'
        AND l_quantity > 45
      ORDER BY l_orderkey, l_linenumber"""))

  /** Explicit cast of a numeric column (SURVEY §2.2 P5, §2.8 F12 — the
    * reference's dashboard probe `cast(gas_used as int)`,
    * bread pages/index.md:9). floor() first: Spark truncates double→int
    * while DuckDB rounds, so the cast itself must see an integral value. */
  val q03 = Q(
    "q03_cast_int",
    (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          floor(col("value")).cast("long").as("value_int"),
          col("event_type"))
        .orderBy("event_id"),
    Some("""
      SELECT event_id, CAST(FLOOR(value) AS BIGINT) AS value_int, event_type
      FROM events ORDER BY event_id"""))

  /** Inner equi-join, dimension explicitly broadcast (SURVEY §2.3 J1 —
    * bread's time-enrichment join parse.py:219-221, whose blocks side is
    * bounded per ingest batch; an explicit hint is only safe for dims
    * with such a hard bound — see q08 for the adaptive pattern when the
    * dimension grows with the data). */
  val q04 = Q(
    "q04_join_broadcast",
    (s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .filter(col("o_totalprice") > 300000)
        .select("o_orderkey", "c_name", "c_mktsegment", "o_totalprice")
        .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_totalprice > 300000
      ORDER BY o_orderkey"""))

  /** Left join + null-filling aggregate (SURVEY §2.3 J2, §2.2 P10). */
  val q05 = Q(
    "q05_left_join_agg",
    (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
          coalesce(dbl(sum(dec(col("o_totalprice")))), lit(0.0)).as("total_spend"),
          count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey"),
    Some("""
      SELECT c_custkey, c_name,
             COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spend,
             COUNT(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name
      ORDER BY c_custkey"""))

  /** Anti join — customers with no orders (SURVEY §2.3 J3, bread's
    * missing-height set difference extract.py:246-254). */
  val q06 = Q(
    "q06_anti_join",
    (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
    Some("""
      SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      ORDER BY c_custkey"""))

  /** Semi join — orders containing a near-full-quantity line. */
  val q07 = Q(
    "q07_semi_join",
    (s, d) =>
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d).filter(col("l_quantity") >= 48),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 48)
      ORDER BY o_orderkey"""))

  /** Multi-way star join: one fact-fact shuffle join (orders⋈lineitem),
    * bounded dimensions broadcast (SURVEY §2.3; TPC-H Q5 shape).
    *
    * Only nation/region carry explicit broadcast hints: they are bounded
    * (25/5 rows at every scale factor). customer GROWS with the data —
    * force-broadcasting it would OOM the driver at real scale (measured:
    * a 10× stress replica pushed the hinted version to 18 minutes) —
    * so its join strategy is left to AQE, which broadcasts at small SF
    * and degrades gracefully to a shuffle join at large. */
  val q08 = Q(
    "q08_star_revenue",
    (s, d) => {
      val dims =
        Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
          .select("c_custkey", "n_name", "r_name")
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(dims, col("o_custkey") === col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(dbl(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))))
          .as("revenue"))
        .orderBy("r_name", "n_name")
    },
    Some("""
      SELECT r_name, n_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM orders
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name"""))

  /** date_trunc daily rollup (SURVEY §2.4 A2, §2.8 F7/F8 — bread's
    * gas_used_per_day.sql). Day emitted as a string: raw timestamps are
    * never compared across engines (ns vs µs). */
  val q09 = Q(
    "q09_daily_rollup",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(
          dbl(sum(dec(col("value")))).as("total_value"),
          count(lit(1)).as("n_events"))
        .orderBy("day"),
    Some("""
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
             COUNT(*) AS n_events
      FROM events GROUP BY 1 ORDER BY day"""))

  /** Plain group-by count (SURVEY §2.4 A3 — num_txs_per_day.sql). */
  val q10 = Q(
    "q10_count_by_type",
    (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .orderBy("event_type"),
    Some("""
      SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Cumulative sum with an explicit ROWS frame over pre-aggregated days
    * (SURVEY §2.5 W1 — cum_txs_per_day.sql). Global window is safe: input
    * is one row per day. DuckDB's window SUM(bigint) widens to HUGEINT,
    * hence the cast. */
  val q11 = Q(
    "q11_cum_daily_counts",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.select(col("day"), col("n"), sum("n").over(w).as("cum_n"))
        .orderBy("day")
    },
    Some("""
      WITH daily AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, COUNT(*) AS n
        FROM events GROUP BY 1)
      SELECT day, n,
             CAST(SUM(n) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n
      FROM daily ORDER BY day"""))

  /** Cumulative decimal money sum per day (SURVEY §2.5 W1 —
    * daily_cum_ibc_transfers.sql). Running sum stays decimal (exact),
    * double only at the edge. */
  val q12 = Q(
    "q12_cum_daily_value",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(sum(dec(col("value"))).as("sd"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.select(col("day"), dbl(col("sd")).as("daily_value"),
        dbl(sum("sd").over(w)).as("cum_value"))
        .orderBy("day")
    },
    Some("""
      WITH daily AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               SUM(CAST(value AS DECIMAL(18,2))) AS sd
        FROM events GROUP BY 1)
      SELECT day, CAST(sd AS DOUBLE) AS daily_value,
             CAST(SUM(sd) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_value
      FROM daily ORDER BY day"""))

  /** Group-wise occurrence numbering (SURVEY §2.4 A4 / §2.5 W2 — bread's
    * cumcount parse.py:178). Ordered by the unique event_id (insertion
    * order), NOT by ts: the ns→µs truncation could otherwise create
    * engine-dependent ties. */
  val q13 = Q(
    "q13_occurrence",
    (s, d) => {
      val w = Window.partitionBy("user_id", "event_type").orderBy("event_id")
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"),
          (row_number().over(w) - 1).cast("long").as("occurrence"))
        .orderBy("event_id")
    },
    Some("""
      SELECT event_id, user_id, event_type,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id) - 1 AS BIGINT) AS occurrence
      FROM events ORDER BY event_id"""))

  /** Pivot to a wide table with a fixed column set (SURVEY §2.4 A5 —
    * bread's events pivot parse.py:179). Explicit value list keeps the
    * schema static; count nulls are filled to 0 on both sides. */
  val q14 = Q(
    "q14_pivot_counts",
    (s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = Tables.events(s, d)
        .groupBy("user_id")
        .pivot("event_type", types)
        .count()
      p.select(col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy("user_id")
    },
    Some("""
      SELECT user_id,
             COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
             COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
             COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
             COUNT(*) FILTER (WHERE event_type = 'view')     AS view
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** UNION (distinct) with sign flip (SURVEY §2.7 U1 — ibc_transfers.sql:
    * inflows positive, outflows negated, SQL UNION dedups). */
  val q15 = Q(
    "q15_union_sign",
    (s, d) => {
      val e = Tables.events(s, d)
        .withColumn("day", date_format(date_trunc("day", col("ts")), "yyyy-MM-dd"))
      val in = e.filter(col("event_type") === "purchase").select(col("day"), col("value"))
      val out = e.filter(col("event_type") === "error")
        .select(col("day"), (-col("value")).as("value"))
      in.union(out).distinct()
        .groupBy("day")
        .agg(dbl(sum(dec(col("value")))).as("net_value"))
        .orderBy("day")
    },
    Some("""
      WITH flows AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, value
        FROM events WHERE event_type = 'purchase'
        UNION
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, -value AS value
        FROM events WHERE event_type = 'error')
      SELECT day, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS net_value
      FROM flows GROUP BY day ORDER BY day"""))

  /** UNION ALL keeps duplicates (SURVEY §2.7 U2 — pd.concat). */
  val q16 = Q(
    "q16_union_all",
    (s, d) => {
      val e = Tables.events(s, d)
      e.filter(col("value") > 150).select("event_id", "event_type")
        .unionByName(
          e.filter(col("event_type") === "signup").select("event_id", "event_type"))
        .orderBy("event_id", "event_type")
    },
    Some("""
      SELECT event_id, event_type FROM events WHERE value > 150
      UNION ALL
      SELECT event_id, event_type FROM events WHERE event_type = 'signup'
      ORDER BY event_id, event_type"""))

  /** Regex extract of the numeric part + regex strip of it (SURVEY §2.8
    * F1/F2 — ibc amount/denom split ibc_transfers_in.sql:8-16). */
  val q17 = Q(
    "q17_regex_amount",
    (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          regexp_extract(col("props"), "[0-9]+", 0).cast("long").as("k_num"),
          regexp_replace(col("props"), "[0-9]+", "").as("skeleton"))
        .orderBy("event_id"),
    Some("""
      SELECT event_id,
             CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k_num,
             regexp_replace(props, '[0-9]+', '', 'g') AS skeleton
      FROM events ORDER BY event_id"""))

  /** JSON field access on a string column (SURVEY §2.8 F4 — postgres
    * `parsed -> 'field'`). */
  val q18 = Q(
    "q18_json_field",
    (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"))
        .orderBy("k"),
    Some("""
      SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n
      FROM events GROUP BY 1 ORDER BY k"""))

  /** Base64 encode/decode round-trip (SURVEY §2.8 F6 — bread's event
    * attribute decode parse.py:52-64). Input kept short so Spark's
    * MIME-style chunking (76-char lines) can never differ from DuckDB. */
  val q19 = Q(
    "q19_base64",
    (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          base64(encode(substring(col("text"), 1, 24), "UTF-8")).as("b64"),
          decode(unbase64(base64(encode(substring(col("text"), 1, 24), "UTF-8"))), "UTF-8")
            .as("roundtrip"))
        .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             to_base64(encode(substr(text, 1, 24))) AS b64,
             decode(from_base64(to_base64(encode(substr(text, 1, 24))))) AS roundtrip
      FROM documents ORDER BY doc_id"""))

  /** String concat + period formatting (SURVEY §2.8 F10/F8 — bread's
    * `type_key` concat and to_period partition strings). */
  val q20 = Q(
    "q20_concat_period",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(concat_ws("_", col("o_orderpriority"),
          date_format(col("o_orderdate"), "yyyy-MM")).as("tag"))
        .agg(count(lit(1)).as("n"))
        .orderBy("tag"),
    Some("""
      SELECT o_orderpriority || '_' || strftime(o_orderdate, '%Y-%m') AS tag, COUNT(*) AS n
      FROM orders GROUP BY 1 ORDER BY tag"""))

  /** Global descending sort (SURVEY §2.6 O1). */
  val q21 = Q(
    "q21_sort_desc",
    (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey")),
    Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey"""))

  /** Top-k per group via ranked window (SURVEY §2.5 W2). */
  val q22 = Q(
    "q22_topk_per_customer",
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rk"))
        .filter(col("rk") <= 3)
        .orderBy("o_custkey", "rk")
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
        FROM orders) t
      WHERE rk <= 3 ORDER BY o_custkey, rk"""))

  /** Trailing 7-day moving average over pre-aggregated days. */
  val q23 = Q(
    "q23_moving_avg",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
      daily.select(col("day"), col("n"),
        (dbl(sum("n").over(w)) / dbl(count("n").over(w))).as("ma7"))
        .orderBy("day")
    },
    Some("""
      WITH daily AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, COUNT(*) AS n
        FROM events GROUP BY 1)
      SELECT day, n,
             CAST(SUM(n) OVER w AS DOUBLE) / CAST(COUNT(n) OVER w AS DOUBLE) AS ma7
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      ORDER BY day"""))

  /** HAVING-style post-aggregation filter + conditional aggregates. */
  val q24 = Q(
    "q24_having_caseagg",
    (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("value") > 100, 1L).otherwise(0L)).as("n_big"),
          dbl(max(dec(col("value")))).as("max_value"))
        .filter(col("n") >= 5)
        .orderBy("user_id"),
    Some("""
      SELECT user_id, COUNT(*) AS n,
             CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
             CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value
      FROM events GROUP BY user_id HAVING COUNT(*) >= 5 ORDER BY user_id"""))

  /** Min/max watermark aggregate (SURVEY §2.4 A6, §2.1 S12 — bread's
    * metadata.json min/max heights). Timestamps emitted at second
    * granularity as strings. */
  val q25 = Q(
    "q25_watermarks",
    (s, d) =>
      Tables.events(s, d)
        .agg(
          min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("min_ts"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("max_ts"),
          count(lit(1)).as("n")),
    Some("""
      SELECT MIN(event_id) AS min_id, MAX(event_id) AS max_id,
             strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS min_ts,
             strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS max_ts,
             COUNT(*) AS n
      FROM events"""))

  /** Left join with unmatched-side null fill (SURVEY §2.2 P10 —
    * parts never sold). */
  val q26 = Q(
    "q26_fillna_unsold",
    (s, d) =>
      Tables.part(s, d)
        .join(Tables.lineitem(s, d), col("p_partkey") === col("l_partkey"), "left")
        .groupBy("p_partkey", "p_name")
        .agg(coalesce(dbl(sum(dec(col("l_quantity")))), lit(0.0)).as("sold_qty"))
        .orderBy("p_partkey"),
    Some("""
      SELECT p_partkey, p_name,
             COALESCE(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS sold_qty
      FROM part LEFT JOIN lineitem ON p_partkey = l_partkey
      GROUP BY p_partkey, p_name ORDER BY p_partkey"""))

  /** Ordered explode with position (SURVEY §2.8 F3, §2.3 J4 — bread's
    * log→event→attribute explode chain; posexplode gives the
    * deterministic ordinal the reference gets from input order). */
  val q27 = Q(
    "q27_posexplode_tokens",
    (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 200)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .toDF("doc_id", "pos", "token")
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token"))
        .orderBy("doc_id", "pos"),
    Some("""
      SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS token
      FROM (SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents WHERE doc_id < 200) t,
           LATERAL (SELECT UNNEST(generate_series(1, len(toks))) AS i) g
      ORDER BY doc_id, pos"""))

  /** Approximate distinct counts (HyperLogLog++) — the 100 TB substitute
    * for exact COUNT(DISTINCT): sketches merge map-side, so cardinality
    * costs one narrow pass instead of a distinct shuffle. Engines'
    * sketches differ, so the cross-engine contract is the error bound,
    * not the estimate: the query emits whether Spark's estimate is
    * within 5% of exact (rsd=0.02), and the oracle asserts the same
    * bound trivially against itself — a failing bound breaks the hash
    * compare on both the boolean and, indirectly, the exact count
    * column. */
  val q46 = Q(
    "q46_approx_distinct",
    (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")).cast("double") /
            col("exact_users") <= 0.05).as("within_5pct"))
        .orderBy("event_type"),
    Some("""
      SELECT event_type,
             COUNT(DISTINCT user_id) AS exact_users,
             TRUE AS within_5pct
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Exact interpolated percentiles of order value per priority class —
    * distribution analytics (Spark `percentile` == DuckDB
    * `quantile_cont`: both linear-interpolate on the sorted values;
    * outputs rounded to 4dp to absorb last-ulp arithmetic-order
    * differences). At scale the exact percentile is a sort-based
    * aggregate per group; the approximate path (percentile_approx /
    * t-digest) trades that for a mergeable sketch — kept exact here so
    * the oracle can mirror it. */
  val q56 = Q(
    "q56_percentiles",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
        .orderBy("o_orderpriority"),
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n,
             ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
             ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
             ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** ROLLUP aggregate: revenue by (returnflag, linestatus) with subtotal
    * and grand-total rows. Group keys surface as 'ALL' on rolled-up
    * levels so row ordering is total in both engines (decimal-exact sum,
    * double only at the end). */
  val q57 = Q(
    "q57_rollup_revenue",
    (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(java.math.BigDecimal.ONE).cast(DecimalType(18, 2)) -
              col("l_discount").cast(DecimalType(18, 2)))).as("rev"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum(col("rev")).as("revenue"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("revenue").cast("double").as("revenue"))
        .orderBy("returnflag", "linestatus"),
    Some("""
      SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             COALESCE(l_linestatus, 'ALL') AS linestatus,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                  AS DOUBLE) AS revenue
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus"""))

  /** Inter-event gap statistics per user (lead/lag window family): gaps
    * are exact integer microsecond differences; the average divides the
    * exact sum once in double. */
  val q58 = Q(
    "q58_event_gaps",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("gap_us", unix_micros(col("ts")) - col("prev_us"))
        .filter(col("gap_us").isNotNull)
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_gaps"),
          sum(col("gap_us")).as("sum_gap_us"),
          max(col("gap_us")).as("max_gap_us"))
        .select(col("user_id"), col("n_gaps"),
          round(col("sum_gap_us").cast("double") / col("n_gaps") / lit(1e6), 4)
            .as("avg_gap_sec"),
          (col("max_gap_us").cast("double") / lit(1e6)).as("max_gap_sec"))
        .orderBy("user_id")
    },
    Some("""
      WITH g AS (SELECT user_id,
                        epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (
                          PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
                 FROM events)
      SELECT user_id, COUNT(*) AS n_gaps,
             ROUND(CAST(CAST(SUM(gap_us) AS BIGINT) AS DOUBLE) / COUNT(*) / 1e6, 4) AS avg_gap_sec,
             CAST(MAX(gap_us) AS DOUBLE) / 1e6 AS max_gap_sec
      FROM g WHERE gap_us IS NOT NULL
      GROUP BY user_id ORDER BY user_id"""))

  /** Fixed-bin histogram + cumulative distribution of order value — the
    * mergeable building block behind approximate percentiles at scale
    * (one map-side count per bin, constant state per partition; the
    * exact per-group percentile q56 sorts instead). All-integer counts,
    * one final double division. */
  val q61 = Q(
    "q61_histogram",
    (s, d) => {
      val binW = 30000.0
      val bins = 20
      val binned = Tables.orders(s, d)
        .select(least(floor(col("o_totalprice") / binW), lit(bins - 1))
          .cast("long").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n"))
      val w = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val total = binned.agg(sum("n").as("total"))
      binned.crossJoin(broadcast(total))
        .withColumn("cum_n", sum("n").over(w))
        .select(col("bin"),
          (col("bin") * binW).as("lo"),
          col("n"),
          round(col("cum_n").cast("double") / col("total"), 6).as("cum_frac"))
        .orderBy("bin")
    },
    Some("""
      WITH b AS (SELECT CAST(LEAST(FLOOR(o_totalprice / 30000.0), 19) AS BIGINT) AS bin,
                        COUNT(*) AS n
                 FROM orders GROUP BY 1),
      t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM b)
      SELECT bin, bin * 30000.0 AS lo, CAST(n AS BIGINT) AS n,
             ROUND(CAST(CAST(SUM(n) OVER (ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS DOUBLE)
                   / total, 6) AS cum_frac
      FROM b, t ORDER BY bin"""))

  /** INTERSECT (distinct set semantics): customers that placed BOTH an
    * urgent and a low-priority order. */
  val q63 = Q(
    "q63_intersect",
    (s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
        .intersect(
          o.filter(col("o_orderpriority") === "5-LOW").select("o_custkey"))
        .orderBy("o_custkey")
    },
    Some("""
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
      ORDER BY o_custkey"""))

  /** EXCEPT (distinct set semantics): customers with orders but never an
    * urgent one. */
  val q64 = Q(
    "q64_except",
    (s, d) => {
      val o = Tables.orders(s, d)
      o.select("o_custkey")
        .except(
          o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey"))
        .orderBy("o_custkey")
    },
    Some("""
      SELECT o_custkey FROM orders
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      ORDER BY o_custkey"""))

  /** Z-order (Morton) clustering key over (custkey, order-day): the
    * interleaved integer operators.Layout.zorderWrite clusters files by,
    * emitted per order so the oracle pins the exact bit math both
    * engines compute. */
  val q65 = Q(
    "q65_zorder_key",
    (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          (col("o_custkey") % 65536).as("a"),
          datediff(col("o_orderdate"), lit("1995-01-01")).cast("long").as("b"))
        .select(col("o_orderkey"),
          graft.operators.Layout.zValue(col("a"), col("b"), 16).as("z"))
        .orderBy("o_orderkey"),
    Some {
      val terms = (0 until 16).map(i =>
        s"(((a >> $i) & 1) << ${2 * i}) + (((b >> $i) & 1) << ${2 * i + 1})")
        .mkString(" + ")
      s"""
      WITH t AS (SELECT o_orderkey, o_custkey % 65536 AS a,
                        CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS b
                 FROM orders)
      SELECT o_orderkey, CAST($terms AS BIGINT) AS z
      FROM t ORDER BY o_orderkey"""
    })

  /** Wide per-user activity profile: pivot event_type into one summed
    * value column per type (the A5 pivot family over the stream table;
    * fixed column list so the schema is static). Decimal-exact sums,
    * double at the edge. */
  val q66 = Q(
    "q66_pivot_value",
    (s, d) =>
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          col("value").cast(DecimalType(18, 6)).as("v"))
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(sum("v"))
        .select(col("user_id"),
          coalesce(col("click"), lit(0)).cast("double").as("click_v"),
          coalesce(col("view"), lit(0)).cast("double").as("view_v"),
          coalesce(col("purchase"), lit(0)).cast("double").as("purchase_v"),
          coalesce(col("signup"), lit(0)).cast("double").as("signup_v"),
          coalesce(col("error"), lit(0)).cast("double").as("error_v"))
        .orderBy("user_id"),
    Some("""
      SELECT user_id,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,6)) END), 0) AS DOUBLE) AS click_v,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,6)) END), 0) AS DOUBLE) AS view_v,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,6)) END), 0) AS DOUBLE) AS purchase_v,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(18,6)) END), 0) AS DOUBLE) AS signup_v,
             CAST(COALESCE(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,6)) END), 0) AS DOUBLE) AS error_v
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** Decile assignment (ntile) over order value, summarized per decile —
    * the equal-count bucketing used for spend-tier segmentation. ntile
    * semantics (first buckets get the remainder) match across engines;
    * ties broken by orderkey for total determinism.
    *
    * Scale shape: NOT `ntile(10).over(Window.orderBy(...))` — Spark
    * plans an empty-partitionBy window as ONE partition, funnelling the
    * whole fact table through a single task's sort. Instead
    * [[graft.operators.Layout.distributedNtile]] range-partitions a
    * skinny (price, key) projection, folds per-partition counts into
    * broadcast offsets on the driver, and applies the ntile remainder
    * rule to global rank = offset + local row_number — same result,
    * every stage parallel. */
  val q67 = Q(
    "q67_ntile_deciles",
    (s, d) => {
      val skinny = Tables.orders(s, d).select("o_totalprice", "o_orderkey")
      graft.operators.Layout
        .distributedNtile(skinny, 10,
          Seq(col("o_totalprice"), col("o_orderkey")), "decile")
        .groupBy("decile")
        .agg(
          count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
        .orderBy("decile")
    },
    Some("""
      WITH t AS (SELECT o_totalprice,
                        CAST(NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS decile
                 FROM orders)
      SELECT decile, COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
      FROM t GROUP BY decile ORDER BY decile"""))

  /** Register the named tables as temp views and run SQL — the
    * spark.sql entry path (what ModelRunner uses), for queries whose
    * oracle text should be near-identical across engines. */
  private def viaSql(s: SparkSession, d: String, names: Seq[String], sql: String): DataFrame = {
    names.foreach(t => Tables.table(s, d, t).createOrReplaceTempView(t))
    s.sql(sql)
  }

  /** TPC-H Q3 shape (shipping priority): 3-way join, date-window
    * predicates on both fact tables, decimal-exact revenue, top-10.
    * Catalyst plans the join order + pushes both date filters to the
    * scans. */
  val q68 = Q(
    "q68_tpch_q3",
    (s, d) => viaSql(s, d, Seq("customer", "orders", "lineitem"), """
      SELECT l_orderkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate,
             o_orderpriority
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < DATE '1996-03-15'
        AND l_shipdate > DATE '1996-03-15'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10"""),
    Some("""
      SELECT l_orderkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
             o_orderpriority
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < DATE '1996-03-15'
        AND l_shipdate > DATE '1996-03-15'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10"""))

  /** TPC-H Q5 shape (local supplier volume): 6-way join where customer
    * and supplier must share a nation, region + date-window filters,
    * revenue per nation. The bounded dims (nation/region) broadcast;
    * the fact-fact joins shuffle. */
  val q69 = Q(
    "q69_tpch_q5",
    (s, d) => viaSql(s, d,
      Seq("customer", "orders", "lineitem", "supplier", "nation", "region"), """
      SELECT n_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= DATE '1996-01-01'
        AND o_orderdate < DATE '1997-01-01'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name"""),
    Some("""
      SELECT n_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= DATE '1996-01-01'
        AND o_orderdate < DATE '1997-01-01'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name"""))

  /** TPC-H Q6 shape (forecast revenue): the pure-scan query — three
    * pushed-down predicates, no join, one global decimal sum. The plan to
    * want at 100 TB: a single WholeStageCodegen scan-filter-partial-agg
    * pass with every predicate in PushedFilters. */
  val q104 = Q(
    "q104_tpch_q6",
    (s, d) => viaSql(s, d, Seq("lineitem"), """
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""),
    Some("""
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""))

  /** TPC-H Q10 shape (returned-item losses): fact-fact join under a date
    * window + returnflag filter, broadcast nation dim, revenue per
    * customer, top-20. */
  val q105 = Q(
    "q105_tpch_q10",
    (s, d) => viaSql(s, d, Seq("customer", "orders", "lineitem", "nation"), """
      SELECT c_custkey, c_name, n_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             ROUND(c_acctbal, 2) AS acctbal
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
                    JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-07-01'
      GROUP BY c_custkey, c_name, n_name, c_acctbal
      ORDER BY revenue DESC, c_custkey LIMIT 20"""),
    Some("""
      SELECT c_custkey, c_name, n_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             ROUND(c_acctbal, 2) AS acctbal
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
                    JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-07-01'
      GROUP BY c_custkey, c_name, n_name, c_acctbal
      ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  /** TPC-H Q18 shape (large-volume orders): HAVING over a grouped fact
    * (orders whose total quantity clears a threshold — 150 fits this
    * generator's ~4-items/order shape; spec TPC-H uses 300), then the
    * customer/order detail for the top-100.
    *
    * The aggregate is pushed BELOW the joins by hand: the order-level
    * quantity sum groups only lineitem columns, so summing + filtering
    * first shrinks the fact from |lineitem| rows to the few qualifying
    * orders before any join — the customer/orders joins then move a
    * threshold-sized frame instead of re-keying the whole fact table
    * (Catalyst does not reorder aggregates below joins itself). */
  val q106 = Q(
    "q106_tpch_q18",
    (s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sum(dec(col("l_quantity"))).as("__sum_qty"))
        .filter(col("__sum_qty") > 150)
      big
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          dbl(col("__sum_qty")).as("sum_qty"))
        .orderBy(desc("sum_qty"), col("o_orderkey"))
        .limit(100)
    },
    Some("""
      SELECT c_custkey, c_name, o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
      ORDER BY sum_qty DESC, o_orderkey LIMIT 100"""))

  /** TPC-H Q14 shape (promo revenue share): part-dim join under a narrow
    * date window, conditional decimal aggregate, one output row. The
    * ratio divides two decimal-exact doubles — identical operands on
    * both engines, so the 4 dp round is stable. */
  val q107 = Q(
    "q107_tpch_q14",
    (s, d) => viaSql(s, d, Seq("lineitem", "part"), """
      SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue,
             ROUND(CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0 /
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4) AS promo_pct
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-04-01'"""),
    Some("""
      SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue,
             ROUND(CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0 /
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4) AS promo_pct
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-04-01'"""))

  /** TPC-H Q19 shape (discounted revenue under a DISJUNCTION of
    * brand/size/quantity conjuncts): the OR spans both join sides, so
    * the part-side conjuncts (brand, size) must still reach the part
    * scan as a pushed disjunction while the mixed terms evaluate post-
    * join — the classic test that an optimizer splits OR predicates by
    * table rather than evaluating everything after the join. */
  val q110 = Q(
    "q110_tpch_q19",
    (s, d) => viaSql(s, d, Seq("lineitem", "part"), """
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)"""),
    Some("""
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)"""))

  /** 7-day trailing moving average of daily revenue — the bounded-frame
    * window every metrics dashboard needs next to the cumulative sums
    * (q11/q12). The frame averages decimal-exact doubles, so the 4 dp
    * round is stable across engines. */
  val q116 = Q(
    "q116_moving_avg",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
        .agg(dbl(sum(dec(col("value")))).as("v"))
      daily
        .withColumn("ma7", round(avg(col("v")).over(
          Window.orderBy("day").rowsBetween(-6, Window.currentRow)), 4))
        .select("day", "ma7")
        .orderBy("day")
    },
    Some("""
      WITH daily AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        FROM events GROUP BY 1)
      SELECT day, ROUND(AVG(v) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
      FROM daily ORDER BY day"""))

  /** Correlated LATERAL subquery with LIMIT — top-2 nations by customer
    * count per region, written as the per-row subquery a SQL user
    * reaches for first; the optimizer decorrelates it into a ranked
    * join rather than running one query per region. */
  val q117 = Q(
    "q117_lateral_topn",
    (s, d) => viaSql(s, d, Seq("region", "nation", "customer"), """
      SELECT r.r_name, t.n_name, t.n_customers
      FROM region r, LATERAL (
        SELECT n.n_name, CAST(COUNT(c.c_custkey) AS BIGINT) AS n_customers
        FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
        WHERE n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name
        ORDER BY n_customers DESC, n.n_name LIMIT 2) t
      ORDER BY r.r_name, t.n_customers DESC, t.n_name"""),
    Some("""
      SELECT r.r_name, t.n_name, t.n_customers
      FROM region r, LATERAL (
        SELECT n.n_name, CAST(COUNT(c.c_custkey) AS BIGINT) AS n_customers
        FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
        WHERE n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name
        ORDER BY n_customers DESC, n.n_name LIMIT 2) t
      ORDER BY r.r_name, t.n_customers DESC, t.n_name"""))

  /** TPC-H Q12 shape (priority buckets per return flag): fact-fact join
    * under a date window with conditional CASE counts — the canonical
    * "bucketed tally in one pass" aggregate. (The generator's schema has
    * no shipmode/commitdate; order priority stands in for the urgency
    * split.) */
  val q122 = Q(
    "q122_tpch_q12",
    (s, d) => viaSql(s, d, Seq("orders", "lineitem"), """
      SELECT l_returnflag,
             CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      GROUP BY l_returnflag ORDER BY l_returnflag"""),
    Some("""
      SELECT l_returnflag,
             CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** TPC-H Q13 shape (customer order-count distribution): left join so
    * zero-order customers survive, then a second aggregation over the
    * first's output — the double-grouped histogram. */
  val q123 = Q(
    "q123_tpch_q13",
    (s, d) => viaSql(s, d, Seq("customer", "orders"), """
      SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey) t
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""),
    Some("""
      SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey) t
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""))

  /** TPC-H Q4 shape (order priority checking): correlated EXISTS that
    * references the OUTER table's o_orderdate inside the subquery
    * predicate — Catalyst decorrelates it into a semi-join on orderkey
    * with the date comparison as a post-join condition. (The generator
    * has no commitdate/receiptdate; "late" = shipped more than 30 days
    * after the order date.) */
  val q124 = Q(
    "q124_tpch_q4",
    (s, d) => viaSql(s, d, Seq("orders", "lineitem"), """
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      FROM orders o
      WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-10-01'
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    Some("""
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      FROM orders o
      WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-10-01'
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** TPC-H Q7 shape (volume shipping between two nations): 6-way join
    * where the same dimension (nation) enters TWICE under different
    * roles, with a symmetric pair-disjunction across the two aliases.
    * Both nation sides broadcast; the fact-fact joins shuffle on their
    * keys. */
  val q125 = Q(
    "q125_tpch_q7",
    (s, d) => viaSql(s, d,
      Seq("supplier", "lineitem", "orders", "customer", "nation"), """
      SELECT supp_nation, cust_nation, l_year,
             CAST(SUM(volume) AS DOUBLE) AS revenue
      FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
        FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
             JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
             JOIN nation n1 ON s_nationkey = n1.n_nationkey
             JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) shipping
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year"""),
    Some("""
      SELECT supp_nation, cust_nation, l_year,
             CAST(SUM(volume) AS DOUBLE) AS revenue
      FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
        FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
             JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
             JOIN nation n1 ON s_nationkey = n1.n_nationkey
             JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) shipping
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year"""))

  /** TPC-H Q8 shape (national market share): 7-table star with region
    * gating the CUSTOMER side and the share computed as a conditional
    * decimal sum over the supplier nation — numerator and denominator
    * both decimal-exact, divided as doubles once per year row. */
  val q126 = Q(
    "q126_tpch_q8",
    (s, d) => viaSql(s, d,
      Seq("part", "lineitem", "orders", "customer", "supplier", "nation", "region"), """
      SELECT o_year,
             ROUND(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
                   CAST(SUM(volume) AS DOUBLE), 4) AS mkt_share
      FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
               n2.n_name AS nation
        FROM part JOIN lineitem ON p_partkey = l_partkey
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation n1 ON c_nationkey = n1.n_nationkey
             JOIN region ON n1.n_regionkey = r_regionkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'ECONOMY') allnations
      GROUP BY o_year ORDER BY o_year"""),
    Some("""
      SELECT o_year,
             ROUND(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
                   CAST(SUM(volume) AS DOUBLE), 4) AS mkt_share
      FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
               n2.n_name AS nation
        FROM part JOIN lineitem ON p_partkey = l_partkey
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             JOIN nation n1 ON c_nationkey = n1.n_nationkey
             JOIN region ON n1.n_regionkey = r_regionkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'ECONOMY') allnations
      GROUP BY o_year ORDER BY o_year"""))

  /** TPC-H Q17 shape (small-quantity orders): correlated per-part
    * average rewritten division-free — `qty * 5 * count < sum` over
    * decimals is exactly `qty < 0.2 * avg` with no float threshold, so
    * rows at the boundary land identically on both engines. */
  val q127 = Q(
    "q127_tpch_q17",
    (s, d) => viaSql(s, d, Seq("lineitem", "part"), """
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem l JOIN part p ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#1'
        AND CAST(l_quantity AS DECIMAL(18,2)) * 5 *
              (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
            < (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
               FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)"""),
    Some("""
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem l JOIN part p ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#1'
        AND CAST(l_quantity AS DECIMAL(18,2)) * 5 *
              (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
            < (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
               FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)"""))

  /** TPC-H Q22 shape (global-sales opportunity): above-average balance
    * test kept exact as `bal * count > total` on decimals, plus a NOT
    * EXISTS anti-join against RECENT orders (every synthetic customer
    * has some order, so the classic no-orders-at-all test would be
    * vacuously empty — inactivity-since-2000 keeps the anti-join real); the "country code" stands in as a
    * custkey bucket (the generator has no phone column). */
  val q128 = Q(
    "q128_tpch_q22",
    (s, d) => viaSql(s, d, Seq("customer", "orders"), """
      WITH avg_bal AS (
        SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS total,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM customer WHERE c_acctbal > 0)
      SELECT CAST(c_custkey % 7 AS BIGINT) AS cgroup,
             CAST(COUNT(*) AS BIGINT) AS numcust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      FROM customer c, avg_bal
      WHERE CAST(c_acctbal AS DECIMAL(18,2)) * avg_bal.n > avg_bal.total
        AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= DATE '2000-01-01')
      GROUP BY 1 ORDER BY 1"""),
    Some("""
      WITH avg_bal AS (
        SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS total,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM customer WHERE c_acctbal > 0)
      SELECT CAST(c_custkey % 7 AS BIGINT) AS cgroup,
             CAST(COUNT(*) AS BIGINT) AS numcust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      FROM customer c, avg_bal
      WHERE CAST(c_acctbal AS DECIMAL(18,2)) * avg_bal.n > avg_bal.total
        AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= DATE '2000-01-01')
      GROUP BY 1 ORDER BY 1"""))

  /** TPC-H Q15 shape (top supplier): a reused aggregate CTE compared
    * against its own MAX via scalar subquery — the comparison is on the
    * un-cast decimal, so "equal to the max" is exact, not a float
    * equality. */
  val q129 = Q(
    "q129_tpch_q15",
    (s, d) => viaSql(s, d, Seq("supplier", "lineitem"), """
      WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                   (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name,
             CAST(total_revenue AS DOUBLE) AS total_revenue
      FROM supplier JOIN revenue ON s_suppkey = supplier_no
      WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      ORDER BY s_suppkey"""),
    Some("""
      WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                   (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name,
             CAST(total_revenue AS DOUBLE) AS total_revenue
      FROM supplier JOIN revenue ON s_suppkey = supplier_no
      WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      ORDER BY s_suppkey"""))

  /** TPC-H Q16 shape (supplier relationship): COUNT(DISTINCT) under a
    * NOT IN subquery (no NULLs in the key domain, so NOT IN is a plain
    * anti-join on both engines). */
  val q130 = Q(
    "q130_tpch_q16",
    (s, d) => viaSql(s, d, Seq("part", "lineitem", "supplier"), """
      SELECT p_brand, p_type, p_size,
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      FROM part JOIN lineitem ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#1'
        AND p_size IN (1, 7, 14, 23, 30, 36, 45, 49)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""),
    Some("""
      SELECT p_brand, p_type, p_size,
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      FROM part JOIN lineitem ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#1'
        AND p_size IN (1, 7, 14, 23, 30, 36, 45, 49)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""))

  /** TPC-H Q21 shape (suppliers who kept orders waiting): EXISTS plus
    * NOT EXISTS over the same fact table, both correlated on the outer
    * line's orderkey with inequality side-conditions — the hardest
    * decorrelation pattern in the TPC-H suite. "Late" = shipped more
    * than 60 days after the order date (no commit/receipt dates in this
    * schema). */
  val q131 = Q(
    "q131_tpch_q21",
    (s, d) => viaSql(s, d, Seq("supplier", "lineitem", "orders"), """
      SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
      WHERE o_orderstatus = 'F'
        AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY s_name ORDER BY numwait DESC, s_name"""),
    Some("""
      SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
      WHERE o_orderstatus = 'F'
        AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY s_name ORDER BY numwait DESC, s_name"""))

  /** TPC-H Q2 shape (minimum-cost supplier): correlated MIN subquery
    * over a shared CTE, re-entered from the WHERE clause — the classic
    * "join against your own aggregate" decorrelation. (No partsupp
    * table in this schema: "cost" is the account balance of suppliers
    * who actually shipped the part, region-gated like the original.)
    * The min-equality compares the same stored double on both sides —
    * no arithmetic, so no float sensitivity. */
  val q138 = Q(
    "q138_tpch_q2",
    (s, d) => viaSql(s, d,
      Seq("part", "lineitem", "supplier", "nation", "region"), """
      WITH cost AS (
        SELECT DISTINCT l_partkey AS partkey, s_suppkey, s_name, s_acctbal, n_name
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation ON s_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE')
      SELECT p_partkey, p_name, c.s_name, c.n_name, c.s_acctbal
      FROM part p JOIN cost c ON c.partkey = p.p_partkey
      WHERE p_size < 10
        AND c.s_acctbal = (SELECT MIN(c2.s_acctbal) FROM cost c2
                           WHERE c2.partkey = p.p_partkey)
      ORDER BY p_partkey, c.s_suppkey"""),
    Some("""
      WITH cost AS (
        SELECT DISTINCT l_partkey AS partkey, s_suppkey, s_name, s_acctbal, n_name
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation ON s_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE')
      SELECT p_partkey, p_name, c.s_name, c.n_name, c.s_acctbal
      FROM part p JOIN cost c ON c.partkey = p.p_partkey
      WHERE p_size < 10
        AND c.s_acctbal = (SELECT MIN(c2.s_acctbal) FROM cost c2
                           WHERE c2.partkey = p.p_partkey)
      ORDER BY p_partkey, c.s_suppkey"""))

  /** TPC-H Q9 shape (product-type profit by nation and year): LIKE
    * filter on the part dim, 5-way join, profit = revenue − cost as
    * pure decimal products (cost proxies retailprice·quantity — the
    * schema has no partsupp supplycost), grouped on a derived year. */
  val q139 = Q(
    "q139_tpch_q9",
    (s, d) => viaSql(s, d,
      Seq("part", "lineitem", "orders", "supplier", "nation"), """
      SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
      FROM (
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (1 - CAST(l_discount AS DECIMAL(18,2)))
               - CAST(p_retailprice AS DECIMAL(18,2)) *
                 CAST(l_quantity AS DECIMAL(18,2)) AS amount
        FROM part JOIN lineitem ON p_partkey = l_partkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN orders ON o_orderkey = l_orderkey
             JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%bolt%') profit
      GROUP BY nation, o_year
      ORDER BY nation, o_year DESC"""),
    Some("""
      SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
      FROM (
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (1 - CAST(l_discount AS DECIMAL(18,2)))
               - CAST(p_retailprice AS DECIMAL(18,2)) *
                 CAST(l_quantity AS DECIMAL(18,2)) AS amount
        FROM part JOIN lineitem ON p_partkey = l_partkey
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN orders ON o_orderkey = l_orderkey
             JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%bolt%') profit
      GROUP BY nation, o_year
      ORDER BY nation, o_year DESC"""))

  /** TPC-H Q11 shape (important stock identification): a grouped CTE
    * filtered by a scalar-subquery fraction of its OWN total — the
    * aggregate feeds both the rows and the threshold. (Supply value is
    * nation-gated lineitem revenue; no partsupp in this schema.) Both
    * comparison sides are decimal-exact sums cast to double once. */
  val q140 = Q(
    "q140_tpch_q11",
    (s, d) => viaSql(s, d, Seq("lineitem", "supplier", "nation"), """
      WITH sv AS (
        SELECT l_partkey AS partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_5'
        GROUP BY l_partkey)
      SELECT partkey, CAST(value AS DOUBLE) AS value
      FROM sv
      WHERE CAST(value AS DOUBLE) >
            (SELECT CAST(SUM(value) AS DOUBLE) * 0.001 FROM sv)
      ORDER BY value DESC, partkey"""),
    Some("""
      WITH sv AS (
        SELECT l_partkey AS partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_5'
        GROUP BY l_partkey)
      SELECT partkey, CAST(value AS DOUBLE) AS value
      FROM sv
      WHERE CAST(value AS DOUBLE) >
            (SELECT CAST(SUM(value) AS DOUBLE) * 0.001 FROM sv)
      ORDER BY value DESC, partkey"""))

  /** TPC-H Q20 shape (excess inventory): IN against a grouped HAVING
    * subquery — the semi-join whose right side is itself an aggregate.
    * ("Excess" = shipped over 30 units of one ECONOMY part in 1997; the
    * schema has no partsupp availqty.) */
  val q141 = Q(
    "q141_tpch_q20",
    (s, d) => viaSql(s, d, Seq("supplier", "nation", "lineitem", "part"), """
      SELECT s_suppkey, s_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
        AND s_suppkey IN (
          SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_type = 'ECONOMY'
            AND l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
          GROUP BY l_suppkey, l_partkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 30)
      ORDER BY s_suppkey"""),
    Some("""
      SELECT s_suppkey, s_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
        AND s_suppkey IN (
          SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_type = 'ECONOMY'
            AND l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
          GROUP BY l_suppkey, l_partkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 30)
      ORDER BY s_suppkey"""))

  /** Correlated scalar subqueries (Catalyst decorrelates both into
    * aggregated joins): orders worth more than twice their customer's
    * average, kept exact by comparing price*count > 2*sum on decimals —
    * no division, no float-order sensitivity. */
  val q70 = Q(
    "q70_corr_subquery",
    (s, d) => viaSql(s, d, Seq("orders"), """
      SELECT o_orderkey, o_custkey
      FROM orders o
      WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
              (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
            > 2 * (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(18,2)))
                   FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
      ORDER BY o_orderkey"""),
    Some("""
      SELECT o_orderkey, o_custkey
      FROM orders o
      WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
              (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
            > 2 * (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(18,2)))
                   FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
      ORDER BY o_orderkey"""))

  def all: Seq[Q] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20,
    q21, q22, q23, q24, q25, q26, q27, q46, q56, q57, q58, q61,
    q63, q64, q65, q66, q67, q68, q69, q70, q104, q105, q106, q107, q110, q116, q117, q122, q123,
    q124, q125, q126, q127, q128, q129, q130, q131, q138, q139, q140, q141)
}

package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.ingest.{ChainClient, Fetch}

/** Oracle coverage for the INGEST operator family (SURVEY §2.1 S1/S2,
  * §2.4 A7): the distributed paginated-fetch harness driven against a
  * deterministic in-process node, with its accounting emitted as a
  * frame DuckDB can recompute in closed form. These close the last two
  * spec-only SQL-expressible operators — every other family already
  * had CORRECTNESS rows.
  *
  * The fake nodes are pure functions of the request URL (reference
  * extract.py:48-105's RPC envelope shapes), so the fetch fan-out runs
  * as real executor-side tasks and the oracle needs no fixture files —
  * the expected accounting is derivable from `generate_series`
  * arithmetic alone. */
object IngestQueries {

  private val UrlRe =
    """tx\.height>=(\d+) AND tx\.height<=(\d+)"&page=(\d+)&per_page=(\d+)""".r.unanchored

  private def parseUrl(url: String): (Long, Long, Int, Int) = url match {
    case UrlRe(s, e, p, pp) => (s.toLong, e.toLong, p.toInt, pp.toInt)
    case _ => throw new IllegalArgumentException(s"unparseable url: $url")
  }

  /** Count-match node (q198): height h carries `1 + h % 3` items named
    * `"h:k"`, so per-chunk totals are non-uniform and the oracle must
    * actually recompute them. Serves any page slice of the chunk's
    * height-ordered item list plus the RPC string `total_count`. */
  object FakeCountNode extends Serializable {
    def fetch(url: String): String = {
      val (s, e, page, pp) = parseUrl(url)
      val items = (s to e).flatMap(h => (0 until (1 + h % 3).toInt).map(k => s"$h:$k"))
      val slice = items.slice((page - 1) * pp, page * pp)
      s"""{"result":{"total_count":"${items.size}","txs":[${slice.map("\"" + _ + "\"").mkString(",")}]}}"""
    }
  }

  /** Degrade node (q199): every data page over per_page 4 is
    * "oversized" (throws — extract.py:81-101's degrade trigger), the
    * chunk containing height 666 stays oversized down to per_page 2
    * (forcing the full degrade to 1), and the chunk containing height
    * 888 fails even the 1-item count probe (the probe-quarantine
    * path). One item per height elsewhere. */
  object FakeDegradeNode extends Serializable {
    def fetch(url: String): String = {
      val (s, e, page, pp) = parseUrl(url)
      if (s <= 888 && 888 <= e) throw new RuntimeException("node down for this span")
      if (pp > 4) throw new RuntimeException("response too large")
      if (s <= 666 && 666 <= e && pp > 1) throw new RuntimeException("response too large")
      val items = (s to e).map(h => s"t$h")
      val slice = items.slice((page - 1) * pp, page * pp)
      s"""{"result":{"total_count":"${items.size}","txs":[${slice.map("\"" + _ + "\"").mkString(",")}]}}"""
    }
  }

  /** A7 count-match validation over the S1 paginated scan: fetch 8
    * chunks (non-uniform item densities) through the real harness and
    * validate that the landed item count per chunk equals the node's
    * reported `total_count` — the reference's row-count validation
    * after an extract (extract.py:72-78 + the `next < total` loop).
    * The oracle recomputes totals and page counts from
    * generate_series arithmetic; `count_match` must be TRUE on every
    * row in BOTH engines. */
  val q198 = Q(
    "q198_fetch_count_match",
    (s, d) => {
      val urlOf = Fetch.txSearchUrl("http://node", _: Long, _: Long, _: Int, _: Int)
      val chunks = Fetch.chunks(1, 960, 120)
      val raw = Fetch.fetchAll(s, chunks, 7, FakeCountNode.fetch _,
        urlOf, ChainClient.parseTotalCount).toDF()
      // the validation's reference side: the node's own count probe per
      // chunk (8 driver-side calls — chunk planning, not data volume)
      val totals = s.createDataFrame(chunks.map(c =>
        (c.start, ChainClient.parseTotalCount(
          FakeCountNode.fetch(urlOf(c.start, c.end, 1, 1))))))
        .toDF("start_h", "total")
      raw
        .groupBy(col("start").as("start_h"), col("end").as("end_h"))
        .agg(count(lit(1)).as("n_pages"),
          sum(coalesce(json_array_length(
            get_json_object(col("body"), "$.result.txs")), lit(0)))
            .cast("long").as("n_items"),
          max(col("perPage")).as("per_page"))
        .join(broadcast(totals), Seq("start_h"))
        .select(col("start_h"), col("end_h"), col("n_pages"), col("n_items"),
          col("per_page"), (col("n_items") === col("total")).as("count_match"))
        .orderBy("start_h")
    },
    Some("""
      WITH h AS (SELECT UNNEST(generate_series(1, 960)) AS h),
      per AS (SELECT h, 1 + (h % 3) AS k FROM h),
      chunks AS (SELECT (h - 1) // 120 AS c, SUM(k) AS total FROM per GROUP BY 1)
      SELECT CAST(c * 120 + 1 AS BIGINT) AS start_h,
             CAST(c * 120 + 120 AS BIGINT) AS end_h,
             CAST(CEIL(total / 7.0) AS BIGINT) AS n_pages,
             CAST(total AS BIGINT) AS n_items,
             CAST(7 AS INT) AS per_page,
             TRUE AS count_match
      FROM chunks ORDER BY start_h"""))

  /** S2 adaptive per-page degrade accounting: the same harness against
    * a node where every chunk degrades 16→8→4, one chunk degrades all
    * the way to per-height fetches (per_page 1), and one chunk
    * quarantines at the count probe. The emitted accounting — pages
    * landed, final per_page, distinct items (structural dedup absorbs
    * any degrade-overlap re-emission), quarantine flag — is the
    * observable surface of extract.py:81-101's degrade loop; the
    * oracle states it in closed form. */
  val q199 = Q(
    "q199_degrade_accounting",
    (s, d) => {
      val raw = Fetch.fetchAll(s, Fetch.chunks(1, 960, 120), 16,
        FakeDegradeNode.fetch _,
        Fetch.txSearchUrl("http://node", _, _, _, _),
        ChainClient.parseTotalCount).toDF()
      raw
        .withColumn("items", coalesce(
          from_json(get_json_object(col("body"), "$.result.txs"),
            ArrayType(StringType)),
          array()))
        .groupBy(col("start").as("start_h"), col("end").as("end_h"))
        .agg(
          sum(when(!col("quarantined"), 1L).otherwise(0L)).as("n_pages"),
          coalesce(min(when(!col("quarantined"), col("perPage"))), lit(0))
            .as("per_page_final"),
          size(array_distinct(flatten(collect_list(col("items")))))
            .cast("long").as("n_items"),
          (sum(when(col("quarantined"), 1L).otherwise(0L)) > 0)
            .as("quarantined"))
        .orderBy("start_h")
    },
    Some("""
      WITH c AS (SELECT UNNEST(generate_series(0, 7)) AS c)
      SELECT CAST(c * 120 + 1 AS BIGINT) AS start_h,
             CAST(c * 120 + 120 AS BIGINT) AS end_h,
             CAST(CASE WHEN c = 7 THEN 0 WHEN c = 5 THEN 120 ELSE 30 END AS BIGINT) AS n_pages,
             CAST(CASE WHEN c = 7 THEN 0 WHEN c = 5 THEN 1 ELSE 4 END AS INT) AS per_page_final,
             CAST(CASE WHEN c = 7 THEN 0 ELSE 120 END AS BIGINT) AS n_items,
             c = 7 AS quarantined
      FROM c ORDER BY start_h"""))

  def all: Seq[Q] = Seq(q198, q199)
}

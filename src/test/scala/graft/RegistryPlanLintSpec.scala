package graft

import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{CoalesceExec, LocalLimitExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** Fleet-wide physical-plan lint over EVERY registry query — the
  * generalization of PlanAuditSpec's hand-picked pins. A new query (or a
  * refactor of an old one) that reintroduces one of the three
  * at-scale-fatal shapes fails here by NAME, before any benchmark
  * notices:
  *
  *  (a) `CartesianProductExec` — never acceptable; even "small" sides
  *      grow with SF.
  *  (b) a Window with EMPTY partitionBy over corpus-sized input — Spark
  *      plans it as ONE partition, funnelling the whole frame through a
  *      single task's sort (the q67 class, fixed round 12 via
  *      [[graft.operators.Layout.distributedNtile]]). Auto-allowed only
  *      when the planner bounded it itself (a `WindowGroupLimit` below
  *      the window caps what crosses the wire at k per input partition);
  *      every other global window must be justified by name in
  *      [[RegistryPlanLintSpec.globalWindowAllow]].
  *  (c) `BroadcastNestedLoopJoinExec` — quadratic unless one side is a
  *      bounded query/eval batch; each site is justified by name in
  *      [[RegistryPlanLintSpec.bnljAllow]].
  *  (d) single-partition funnels — `coalesce(1)` or a SinglePartition
  *      shuffle — over input the plan itself doesn't bound: everything
  *      above the funnel runs as ONE task. Auto-allowed when the input
  *      is a partial aggregate (the global-agg pattern: one combined
  *      row per upstream partition crosses the wire), a LocalLimit, or
  *      a funnel check (b) already adjudicates under a global window;
  *      the rest justify by name in
  *      [[RegistryPlanLintSpec.singlePartitionAllow]] (q190's
  *      label²-sized confusion-matrix sort is the template entry).
  *
  * The lint enumerates the registry programmatically (Registry.all), so
  * a new query is linted the day it lands — the allowlists are the only
  * escape hatch and each entry carries its smallness argument.
  */
class RegistryPlanLintSpec extends AnyFunSuite with SparkSpec {

  import RegistryPlanLintSpec._

  private val d = sf("sf0.001")

  test("registry sweep: no cartesian product, no unbounded global window, BNLJ only where justified") {
    // AQE off so executedPlan is a walkable tree (AdaptiveSparkPlanExec
    // hides its children from TreeNode.collect); the lint judges the
    // static plan — AQE only ever REPLACES these shapes with better ones
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevAqe = spark.conf.get(aqeKey)
    val offenders = scala.collection.mutable.Buffer[String]()
    val usedWindowAllow = scala.collection.mutable.Set[String]()
    val usedBnljAllow = scala.collection.mutable.Set[String]()
    val usedFunnelAllow = scala.collection.mutable.Set[String]()
    try {
      spark.conf.set(aqeKey, "false")
      for (q <- Registry.all) {
        val plan =
          try q.spark(spark, d).queryExecution.executedPlan
          catch {
            case e: Throwable =>
              fail(s"${q.name}: plan construction failed: ${e.getMessage}")
          }
        def nodes[T](pf: PartialFunction[SparkPlan, T]): Seq[T] =
          plan.collectWithSubqueries(pf)

        if (nodes { case c: CartesianProductExec => c }.nonEmpty)
          offenders += s"${q.name}: CartesianProduct"

        val globalWindows = nodes {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        val bounded = globalWindows.filter(w =>
          w.child.collect { case g: WindowGroupLimitExec => g }.nonEmpty)
        if (globalWindows.size > bounded.size) {
          if (globalWindowAllow.contains(q.name)) usedWindowAllow += q.name
          else offenders += s"${q.name}: ${globalWindows.size - bounded.size} global Window(s) " +
            "with empty partitionBy and no WindowGroupLimit bound"
        }

        if (nodes { case b: BroadcastNestedLoopJoinExec => b }.nonEmpty) {
          if (bnljAllow.contains(q.name)) usedBnljAllow += q.name
          else offenders += s"${q.name}: BroadcastNestedLoopJoin outside the allowlist"
        }

        // (d) single-partition funnels: coalesce(1) or a SinglePartition
        // shuffle serializes everything above it into ONE task. Auto-
        // allowed when the funnel's input is bounded by construction:
        // a partial aggregate below (the global-agg pattern — the one
        // task receives one pre-aggregated row per input partition), a
        // LocalLimit below (≤ k rows per partition cross the wire), or
        // a funnel feeding a global window that check (b) already
        // adjudicates. Everything else is justified by name.
        def boundedFunnelChild(p: SparkPlan): Boolean = p match {
          case h: HashAggregateExec =>
            h.aggregateExpressions.forall(a => a.mode.toString.startsWith("Partial"))
          case h: ObjectHashAggregateExec =>
            h.aggregateExpressions.forall(a => a.mode.toString.startsWith("Partial"))
          case h: SortAggregateExec =>
            h.aggregateExpressions.forall(a => a.mode.toString.startsWith("Partial"))
          case _: LocalLimitExec => true
          case _: WindowGroupLimitExec => true
          // row-count-preserving wrappers between the exchange and the
          // node that actually bounds the funnel's input
          case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
            boundedFunnelChild(w.child)
          case i: org.apache.spark.sql.execution.InputAdapter =>
            boundedFunnelChild(i.child)
          case pr: org.apache.spark.sql.execution.ProjectExec =>
            boundedFunnelChild(pr.child)
          case _ => false
        }
        val windowOwned = globalWindows.flatMap(w =>
          w.child.collect { case e: ShuffleExchangeExec => e }).toSet
        val funnels =
          nodes { case c: CoalesceExec if c.numPartitions == 1 => "coalesce(1)" } ++
          nodes {
            case e: ShuffleExchangeExec
                if e.outputPartitioning == SinglePartition &&
                  !windowOwned.contains(e) && !boundedFunnelChild(e.child) =>
              "SinglePartition exchange over un-bounded input"
          }
        if (funnels.nonEmpty) {
          if (singlePartitionAllow.contains(q.name)) usedFunnelAllow += q.name
          else offenders += s"${q.name}: ${funnels.mkString(", ")}"
        }
      }
    } finally spark.conf.set(aqeKey, prevAqe)
    assert(offenders.isEmpty,
      s"plan lint offenders (justify in the allowlist or fix the plan):\n  " +
        offenders.mkString("\n  "))
    // self-pruning: an allowlist entry whose query no longer plans the
    // shape is stale — delete it so the list stays a live audit record
    val staleW = globalWindowAllow.keySet -- usedWindowAllow
    val staleB = bnljAllow.keySet -- usedBnljAllow
    val staleF = singlePartitionAllow.keySet -- usedFunnelAllow
    assert(staleW.isEmpty && staleB.isEmpty && staleF.isEmpty,
      s"stale allowlist entries (the plan improved — remove them): " +
        s"windows=${staleW.toSeq.sorted} bnlj=${staleB.toSeq.sorted} " +
        s"funnels=${staleF.toSeq.sorted}")
  }

  test("q67: decile plan has no single-partition window — every Window partitions by __pid") {
    val df = Registry.queries("q67_ntile_deciles")(spark, d)
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevAqe = spark.conf.get(aqeKey)
    try {
      spark.conf.set(aqeKey, "false")
      val plan = Registry.queries("q67_ntile_deciles")(spark, d)
        .queryExecution.executedPlan
      val global = plan.collectWithSubqueries {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(global.isEmpty,
        s"q67 regressed to a single-partition global window:\n$plan")
      assert(plan.collectWithSubqueries { case w: WindowExec => w }.nonEmpty,
        s"expected the per-__pid rank window to survive:\n$plan")
    } finally spark.conf.set(aqeKey, prevAqe)
    // and the device still answers correctly (ntile remainder rule:
    // sf0.001 orders rows split into 10 equal-count buckets)
    val rows = df.collect()
    assert(rows.length == 10)
    val ns = rows.map(_.getLong(rows.head.fieldIndex("n")))
    assert(ns.max - ns.min <= 1, ns.mkString(","))
  }
}

object RegistryPlanLintSpec {
  /** Global (empty-partitionBy) windows that are SMALL BY CONSTRUCTION —
    * each entry names the frame the window actually sorts and why it
    * cannot grow with corpus row count. Populated from a full-registry
    * audit (round 12); adding a name requires the same argument. */
  val globalWindowAllow: Map[String, String] = Map(
    "q11_cum_daily_counts" -> "cumulative sum over DAY-level aggregates — frame bounded by calendar days, not corpus rows (the reference's W1 semantics)",
    "q12_cum_daily_value" -> "cumulative sum over day-level aggregates — calendar-bounded frame (W1)",
    "q23_moving_avg" -> "7-day moving average over pre-aggregated days — day-granularity frame",
    "q116_moving_avg" -> "7-day moving average over day-level revenue — day-granularity frame",
    "q61_histogram" -> "cumulative distribution over a FIXED 20-bin histogram — ≤20 rows by construction",
    "q166_jaccard_histogram" -> "cumulative pairs-at-or-above over ≤21 fixed jaccard bins",
    "q112_gap_interpolate" -> "interpolation lookups over the daily date SPINE — day granularity, documented single-partition by design",
    "q144_zipf_slope" -> "rank over the frequency-AGGREGATED vocabulary (Heaps-sublinear in corpus), consumed only to rank ≤ 1000",
    "q173_vocab_coverage" -> "coverage curve over the aggregated vocab frame — vocabulary-sized, never the token stream (documented in the query)",
    "q150_model_dag" -> "cumulative over day-level model output — the reference's own cum_txs_per_day W1 shape",
    "q188_shard_novelty_sketch" -> "prefix-union over numShards(=10) HLL sketch rows — one row per shard",
    "q189_token_budget_fill" -> "water-fill threshold over the sources-sized frame — one row per distinct source",
    "q210_ivf_append_skew" -> "ratio-to-mean over per-CELL occupancy — frame bounded by the anchor grid, not the corpus",
    "q211_ivf_retrain" -> "cell-stats frame of the rebuilt index — bounded by the retrained grid size"
  )

  /** BroadcastNestedLoopJoin sites where the broadcast side is a 1-row
    * scalar aggregate or a bounded query/eval/config-sized frame, so the
    * product is LINEAR in the corpus — never corpus × corpus. */
  val bnljAllow: Map[String, String] = Map(
    // — ANN / retrieval: the broadcast side is the query vector(s) or
    //   anchor grid; corpus side streams once —
    "q34_ann_bruteforce" -> "1-row query vector broadcast; corpus scanned once, TakeOrdered top-k",
    "q39_embed_neardup" -> "anchor grid broadcast for bucket assignment — grid ∝ √corpus by doc'd policy, corpus streams once",
    "q40_ann_ivf" -> "probe-cell set + query vector broadcast against the bucket-pruned corpus scan",
    "q60_lsh_multiprobe" -> "probe bucket keys broadcast; corpus side pruned by bucket",
    "q147_media_embed_ann" -> "1-row query embedding broadcast over frame features",
    "q185_dim_truncation" -> "query vector broadcast at each truncated dim — corpus streams once per dim in ONE pass",
    "q184_hard_negatives" -> "bounded query batch broadcast against postings-bounded candidates",
    "q190_knn_label_eval" -> "eval batch broadcast vs corpus — linear in corpus × |eval batch|",
    "q206_ann_recall_eval" -> "query batch broadcast (recallDialFold) — ONE corpus scan for all dials, linear in |batch|",
    "q207_ivfpq_recall_eval" -> "query batch broadcast — corpus scan count pinned batch- and dial-independent",
    // (q214_ann_stored_batch_search needs no entry: its probe and query
    // joins are equi-joins — BroadcastHashJoin, not BNLJ)
    "q196_hashed_topk" -> "hashed query-term set broadcast; postings-bounded candidate frame",
    "q197_tfidf_hashed_topk" -> "query-term set broadcast; postings-bounded",
    "q201_bm25_topk" -> "query-term set broadcast; postings-bounded BM25 scoring",
    // — 1-row scalar aggregate appended to every row (cum fractions,
    //   corpus totals, anchors) —
    "q61_histogram" -> "1-row grand-total broadcast for the cumulative fraction",
    "q128_tpch_q22" -> "TPC-H Q22's scalar avg(acctbal) subquery — 1-row broadcast",
    "q53_tfidf_top_terms" -> "1-row corpus doc-count broadcast into the IDF",
    "q132_pmi_bigrams" -> "1-row unigram/bigram total broadcast into the PMI denominator",
    "q91_unigram_surprisal" -> "1-row token-mass total broadcast",
    "q92_mix_weights" -> "1-row totals broadcast into the mix-weight normalizer",
    "q143_cms_heavy_hitters" -> "1-row stream-total broadcast for the heavy-hitter threshold",
    "q156_bigram_surprisal" -> "1-row LM totals broadcast",
    "q157_dsir_weights" -> "1-row source/target mass totals broadcast into the importance ratio",
    "q159_temperature_mix" -> "1-row mass total broadcast into the temperature renormalizer",
    "q181_kn_bigram_lm" -> "1-row discount/continuation totals broadcast (KN smoothing constants)",
    "q169_decayed_engagement" -> "1-row max-timestamp anchor broadcast (deterministic now)",
    "q168_dup_triangles" -> "1-row edge/triangle/wedge count frames cross-joined — three scalars",
    "q187_cluster_splits" -> "1-row leak-stats frame appended to the split report",
    "q188_shard_novelty_sketch" -> "1-row sketch-union frame broadcast into the novelty bound",
    "q189_token_budget_fill" -> "1-row budget scalar broadcast into the per-source allocation",
    // — bounded config-sized enumeration frames —
    "q160_source_overlap" -> "source × source pair frame — one row per distinct source pair, config-bounded",
    "q164_source_overlap_sketch" -> "source-pair HLL sketch frame — one row per source",
    "q183_shard_novelty" -> "numShards-sized frame broadcast",
    "q87_array_setops" -> "self-join of an explicitly doc_id<10-filtered frame — ≤10-row broadcast side"
  )

  /** Single-partition funnels (coalesce(1) / SinglePartition exchange
    * over input the auto-allow can't prove bounded) that are SMALL BY
    * CONSTRUCTION — each entry names the frame the one task actually
    * receives and why it cannot grow with corpus row count. */
  val singlePartitionAllow: Map[String, String] = Map(
    "q190_knn_label_eval" -> "coalesce(1) sorts the label^2-sized confusion MATRIX (|labels|=3 here), never the corpus — the r12 job-diet shape; corpus mass is reduced by the upstream per-query top-k aggregation"
  )
}

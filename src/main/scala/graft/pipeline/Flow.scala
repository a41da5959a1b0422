package graft.pipeline

import scala.collection.mutable

/** The Prefect-runtime slice the reference's flow gets for free
  * (pipelines/pipeline.py:64-131 declares `@prefect.task`s inside a
  * `@prefect.flow`; Prefect supplies bounded task retries and run
  * observability): named stages with retry + linear backoff, and a
  * per-task report (attempts, wall seconds, outcome) the caller can
  * log or serve.
  *
  * Deliberately driver-side and tiny: Spark ALREADY retries failed
  * tasks/stages inside a job, so flow-level retry exists for the
  * failures Spark cannot see — a node HTTP probe dying, a filesystem
  * rename refused, a model's SQL failing on a transient view. A stage
  * that exhausts its retries rethrows (the flow is not durable
  * orchestration — rerunning the whole flow is the recovery unit, and
  * every stage output is idempotent by construction: overwrite-by-
  * range files, versioned state, manifest-gated parse). */
final class Flow(retries: Int = 2, backoffMs: Long = 500,
    sleep: Long => Unit = Thread.sleep) {

  final case class TaskRun(name: String, attempts: Int, seconds: Double,
      error: Option[String], counters: Map[String, Long] = Map.empty)

  private val runs = mutable.ArrayBuffer.empty[TaskRun]
  // counters the CURRENT attempt's body records via count(); reset per
  // attempt so a retried body doesn't double-count its partial progress
  private var current = mutable.LinkedHashMap.empty[String, Long]

  /** Record a named counter against the task currently running — the
    * quantitative half of flow observability (e.g. an extract stage's
    * quarantined-chunk count: a run can "succeed" with every chunk
    * quarantined, and without the counter that regression signal is
    * reduced to log lines and ledger growth). Additive within one
    * attempt; reset on retry. */
  def count(key: String, n: Long): Unit =
    current(key) = current.getOrElse(key, 0L) + n

  /** Run `body` as a named task: up to `retries` re-attempts with
    * linear backoff (attempt i sleeps i × backoffMs first), timing,
    * outcome and body-recorded counters recorded. Rethrows the last
    * failure once exhausted. */
  def task[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    var attempt = 0
    while (true) {
      attempt += 1
      current = mutable.LinkedHashMap.empty[String, Long]
      // ListMap keeps the body's count() insertion order all the way to
      // reportJson — a plain toMap would re-order >4 counters by hash
      try {
        val out = body
        runs += TaskRun(name, attempt, (System.nanoTime() - t0) / 1e9, None,
          scala.collection.immutable.ListMap(current.toSeq: _*))
        return out
      } catch {
        case e: Exception if attempt <= retries =>
          sleep(backoffMs * attempt)
        case e: Exception =>
          runs += TaskRun(name, attempt, (System.nanoTime() - t0) / 1e9,
            Some(String.valueOf(e.getMessage)),
            scala.collection.immutable.ListMap(current.toSeq: _*))
          throw e
      }
    }
    sys.error("unreachable")
  }

  /** Tasks in execution order (failures included). */
  def report: Seq[TaskRun] = runs.toSeq

  /** One JSON record per run — the flow-observability record. Every
    * control character is escaped (a failed Spark stage's message can
    * embed plan fragments with tabs/CRs — the record must stay
    * parseable exactly when a stage failed). */
  def reportJson: String = runs.map { r =>
    val err = r.error.fold("null")(m => "\"" + jsonEscape(m) + "\"")
    val ctr =
      if (r.counters.isEmpty) ""
      else r.counters
        .map { case (k, v) => s""""${jsonEscape(k)}":$v""" }
        .mkString(""","counters":{""", ",", "}")
    f"""{"task":"${jsonEscape(r.name)}","attempts":${r.attempts},"sec":${r.seconds}%.3f,"error":$err$ctr}"""
  }.mkString("[", ",", "]")

  private def jsonEscape(s: String): String = s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  }
}

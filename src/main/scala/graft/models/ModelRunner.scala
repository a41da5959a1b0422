package graft.models

import java.nio.file.{Files, Path, Paths}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** dbt-style SQL model DAG runner (SURVEY §2.10 Q5).
  *
  * Reference behavior being reproduced (bread dbt/):
  *  - models are SQL files whose text may contain `{{ ref("model") }}`,
  *    `{{ source("schema", "table") }}` and `{{ var('name') }}` templates
  *    (dbt/old_models/ibc/daily_ibc_transfers.sql:13,
  *    dbt/models/parsed/blocks.sql:1);
  *  - `ref` edges induce a DAG; models build in topological order
  *    (dbt run);
  *  - materialization is `table` or `view` per model
  *    (dbt/dbt_project.yml:34-37: parsed = table, temp = view).
  *
  * Spark realization: `view` → `createOrReplaceTempView` (zero cost,
  * Catalyst inlines it — the scale-friendly default); `table` → parquet
  * write under `workDir` + re-registered view (a real CREATE TABLE AS:
  * downstream models scan compact columnar output instead of recomputing,
  * which is what makes wide DAGs affordable at 100 TB — each expensive
  * stage is materialized once, and later models get parquet pushdown
  * against it).
  *
  * Materialization is declared in-file with a leading directive comment
  * `-- materialized: table` (default: view), keeping each model
  * self-contained instead of needing a project YAML.
  */
final case class Model(
    name: String,
    sql: String,
    materialization: String = "view") {
  require(
    materialization == "view" || materialization == "table",
    s"model $name: unknown materialization '$materialization'")
}

final class ModelRunner(
    spark: SparkSession,
    sources: Map[(String, String), String] = Map.empty,
    vars: Map[String, String] = Map.empty,
    workDir: Option[String] = None) {

  private val refP    = raw"""\{\{\s*ref\(\s*['"]([^'"]+)['"]\s*\)\s*\}\}""".r
  private val sourceP = raw"""\{\{\s*source\(\s*['"]([^'"]+)['"]\s*,\s*['"]([^'"]+)['"]\s*\)\s*\}\}""".r
  private val varP    = raw"""\{\{\s*var\(\s*['"]([^'"]+)['"]\s*\)\s*\}\}""".r

  def refsOf(m: Model): Seq[String] =
    refP.findAllMatchIn(m.sql).map(_.group(1)).toSeq.distinct

  /** Template resolution: ref → model's registered name, source →
    * configured physical table/view, var → configured value. */
  def resolve(sql: String): String = {
    val s1 = refP.replaceAllIn(sql, m => java.util.regex.Matcher.quoteReplacement(m.group(1)))
    val s2 = sourceP.replaceAllIn(s1, m => {
      val key = (m.group(1), m.group(2))
      val t = sources.getOrElse(key,
        throw new IllegalArgumentException(s"unknown source $key"))
      java.util.regex.Matcher.quoteReplacement(t)
    })
    varP.replaceAllIn(s2, m => {
      val v = vars.getOrElse(m.group(1),
        throw new IllegalArgumentException(s"unknown var '${m.group(1)}'"))
      java.util.regex.Matcher.quoteReplacement(v)
    })
  }

  /** Kahn topo sort over ref edges; fails on cycles and unknown refs. */
  def topoSort(models: Seq[Model]): Seq[Model] = {
    // names key every map below — a duplicate (two same-basename .sql
    // files in different subdirs) would collapse last-wins: one model's
    // SQL silently never runs, or the indeg collapse reports a bogus
    // "circular ref". Refuse up front with the colliding names.
    val dup = models.groupBy(_.name).collect { case (n, ms) if ms.size > 1 => n }
    require(dup.isEmpty,
      s"duplicate model name(s): ${dup.toSeq.sorted.mkString(", ")} — " +
        "model names (file basenames) must be unique across the DAG")
    val byName = models.map(m => m.name -> m).toMap
    models.foreach { m =>
      refsOf(m).foreach { r =>
        if (!byName.contains(r))
          throw new IllegalArgumentException(s"model ${m.name} refs unknown model '$r'")
      }
    }
    val indeg = mutable.Map(models.map(m => m.name -> refsOf(m).size): _*)
    val out   = models.flatMap(m => refsOf(m).map(_ -> m.name))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val queue  = mutable.PriorityQueue(
      models.filter(m => indeg(m.name) == 0).map(_.name): _*)(Ordering[String].reverse)
    val sorted = mutable.ArrayBuffer.empty[Model]
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      sorted += byName(n)
      out.getOrElse(n, Nil).foreach { dep =>
        indeg(dep) -= 1
        if (indeg(dep) == 0) queue.enqueue(dep)
      }
    }
    if (sorted.size != models.size) {
      val stuck = models.map(_.name).filterNot(sorted.map(_.name).contains)
      throw new IllegalStateException(s"circular ref among models: ${stuck.sorted.mkString(", ")}")
    }
    sorted.toSeq
  }

  /** Build every model in dependency order; returns name → DataFrame. */
  def run(models: Seq[Model]): Map[String, DataFrame] = {
    val built = mutable.LinkedHashMap.empty[String, DataFrame]
    // one materialization dir per RUN, not per table model — a fresh
    // createTempDirectory per model litters /tmp with N never-cleaned
    // dirs every invocation
    lazy val runDir = Files.createTempDirectory("graft-models").toString
    topoSort(models).foreach { m =>
      val df = spark.sql(resolve(m.sql))
      val registered = m.materialization match {
        case "table" =>
          val dir = workDir.getOrElse(runDir)
          val path = s"$dir/${m.name}"
          df.write.mode("overwrite").parquet(path)
          spark.read.parquet(path)
        case _ => df
      }
      registered.createOrReplaceTempView(m.name)
      built += m.name -> registered
    }
    built.toMap
  }
}

/** dbt-style schema tests (reference dbt/old_models/gas/_gas.yml:6-9,
  * txs/_tx_models.yml:7-18: `unique` and `not_null` probes generated as
  * SQL against the built model). A test passes when its probe returns
  * zero violating rows. */
object SchemaTests {
  sealed trait Kind { def probeSql(view: String, column: String): String }
  case object Unique extends Kind {
    override def probeSql(view: String, column: String): String =
      s"SELECT $column FROM $view WHERE $column IS NOT NULL " +
        s"GROUP BY $column HAVING COUNT(*) > 1"
  }
  case object NotNull extends Kind {
    override def probeSql(view: String, column: String): String =
      s"SELECT 1 FROM $view WHERE $column IS NULL"
  }

  final case class SchemaTest(model: String, column: String, kind: Kind)
  final case class Result(test: SchemaTest, violations: Long) {
    def passed: Boolean = violations == 0
  }

  /** Run probes against already-built models (registered views). */
  def run(spark: SparkSession, tests: Seq[SchemaTest]): Seq[Result] =
    tests.map { t =>
      Result(t, spark.sql(t.kind.probeSql(t.model, t.column)).count())
    }

  /** The reference's own declared test set (gas/txs day columns). */
  val breadTests: Seq[SchemaTest] = Seq(
    SchemaTest("gas_used_per_day", "day", Unique),
    SchemaTest("gas_used_per_day", "day", NotNull),
    SchemaTest("num_txs_per_day", "day", Unique),
    SchemaTest("num_txs_per_day", "day", NotNull),
    SchemaTest("cum_txs_per_day", "day", Unique),
    SchemaTest("cum_txs_per_day", "day", NotNull))
}

object ModelRunner {
  private val matP = raw"""(?m)^\s*--\s*materialized:\s*(\w+)\s*$$""".r

  def parseModel(name: String, sql: String): Model = {
    val mat = matP.findFirstMatchIn(sql).map(_.group(1)).getOrElse("view")
    Model(name, sql, mat)
  }

  /** Load every *.sql under a directory (recursively); model name = file
    * basename, mirroring dbt's models/ convention. */
  def loadDirectory(dir: Path): Seq[Model] = {
    val stream = Files.walk(dir) // close: leaks a directory fd per call
    val files =
      try stream.iterator().asScala
        .filter(p => p.toString.endsWith(".sql"))
        .toSeq.sortBy(_.toString)
      finally stream.close()
    files.map { p =>
      val name = p.getFileName.toString.stripSuffix(".sql")
      parseModel(name, Files.readString(p))
    }
  }

  def loadDirectory(dir: String): Seq[Model] = loadDirectory(Paths.get(dir))
}

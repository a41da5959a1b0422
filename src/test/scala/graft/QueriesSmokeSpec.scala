package graft

import graft.queries.Registry

/** Every registered query must run end-to-end on the sf0.001 tables and
  * produce a stable, non-degenerate result frame. The DuckDB hash-compare
  * happens driver-side (tools/check.py mirrors it); this spec is the fast
  * local gate that a change didn't break plan construction or execution.
  */
class QueriesSmokeSpec extends SparkSpec {
  private val dir = sf("sf0.001")

  Registry.all.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val df  = q.spark(spark, dir)
      val n   = df.count()
      assert(df.columns.nonEmpty, "result must have columns")
      assert(df.columns.distinct.length === df.columns.length,
        s"duplicate column names: ${df.columns.mkString(",")}")
      assert(n >= 0)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val qs = Registry.queries.keySet
    assert(Registry.oracleSql.keySet.subsetOf(qs))
  }

  test("registry invariants: unique names, every query oracled") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.length == names.length,
      s"duplicate query names: ${names.diff(names.distinct).mkString(",")}")
    // the correctness gate is only as wide as its oracle coverage — a
    // query without oracle SQL silently downgrades to a rows-only check,
    // so going oracle-less is an explicit, justified decision, not a
    // default. Current allowlist: q136_kmeans (distributed float mean
    // updates aren't cross-engine hashable; SimilaritySpec pins its
    // real contracts instead).
    val allowedRowsOnly = Set("q136_kmeans")
    val unoracled = Registry.all.filter(_.oracle.isEmpty).map(_.name)
      .filterNot(allowedRowsOnly)
    assert(unoracled.isEmpty, s"queries without oracles: ${unoracled.mkString(",")}")
  }
}

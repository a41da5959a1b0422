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

  test("the recommended conf carries the documented scale contract") {
    val c = GraftSession.recommendedConf
    assert(c("spark.sql.adaptive.enabled") == "true")
    assert(c("spark.sql.adaptive.coalescePartitions.enabled") == "true")
    assert(c("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(c("spark.sql.sources.partitionColumnTypeInference.enabled") == "false")
    assert(c("spark.sql.session.timeZone") == "UTC")
  }
}

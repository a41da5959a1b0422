package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the shared session contract the mains rely on: scale-relevant
  * conf defaults and the SQL registration of the custom expressions. */
class GraftSessionSpec extends AnyFunSuite with SparkSpec {

  test("registered SQL surface: vec_dot/vec_norm/minhash/simhash_tokens resolve") {
    graft.plans.GraftExtensions.register(spark)
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

  test("local() applies the documented scale defaults") {
    // the shared test session exists; GraftSession.local goes through
    // getOrCreate, so conf asserted on the returned handle reflects what
    // the mains run with
    val s = GraftSession.local("graft-session-spec", 4)
    assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(s.conf.get("spark.sql.sources.partitionColumnTypeInference.enabled") == "false")
    assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
  }
}

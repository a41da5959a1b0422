package graft.query

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Unit + property coverage for the INSERT command-tag tuple counter —
  * the statically-known half of the DML-tag contract (PgWireSpec pins
  * the wire-visible half). The counter's promise: EXACT for pure
  * tuple-list inserts, None (→ honest 0 + notice) for anything it
  * cannot count — never a confident wrong number. */
class PgTagSpec extends AnyFunSuite {

  private def count(sql: String) = PgWireServer.staticInsertValuesCount(sql)

  private def check(p: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("pure tuple lists count exactly, whatever the tuple contents") {
    val tupleGen: Gen[String] = Gen.nonEmptyListOf(Gen.oneOf(
      Gen.choose(-1000, 1000).map(_.toString),
      Gen.alphaNumStr.map(s => s"'${s.take(8)}'"),
      Gen.const("(1 + 2)"),              // nested parens inside a tuple
      Gen.const("'it''s, (fine)'"),      // quote-doubled comma+paren in a literal
      Gen.const("NULL"))).map(_.mkString("(", ", ", ")"))
    val tuplesGen = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, tupleGen))
    check(Prop.forAll(tuplesGen) { tuples =>
      val sql = s"INSERT INTO t VALUES ${tuples.mkString(", ")}"
      count(sql) == Some(tuples.length.toLong)
    })
  }

  test("column lists, comments and a 'VALUES' inside a literal don't confuse the scan") {
    assert(count("INSERT INTO t (a, b) VALUES (1, 2), (3, 4)") == Some(2L))
    assert(count("INSERT /* c */ INTO t -- x\nVALUES (1)") == Some(1L))
    assert(count("INSERT INTO t VALUES ('VALUES (1), (2)')") == Some(1L))
    assert(count("insert into t values (1),(2),(3)") == Some(3L))
  }

  test("anything the paren counter cannot count is None, never a wrong number") {
    assert(count("INSERT INTO t SELECT * FROM s").isEmpty)
    assert(count("INSERT INTO t WITH c AS (SELECT 1) SELECT * FROM c").isEmpty)
    assert(count("INSERT INTO t VALUES (1), 2").isEmpty)      // bare expression row
    assert(count("INSERT INTO t VALUES 1, 2").isEmpty)        // all-bare rows
    assert(count("INSERT INTO t VALUES (1), 'x'").isEmpty)    // bare string row
    assert(count("INSERT INTO t VALUES (1), -2").isEmpty)     // bare negative row
    assert(count("INSERT INTO t VALUES (1) RETURNING k").isEmpty)
    assert(count("INSERT INTO t VALUES (1").isEmpty)          // unbalanced
    assert(count("UPDATE t SET k = 1").isEmpty)               // no VALUES at all
  }
}

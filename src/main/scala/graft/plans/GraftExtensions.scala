package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.functions.{CmsProbe, TextHashAggregators, UnicodeNormalize, VecDot, VecNorm}

/** SQL-surface registration for the custom Catalyst expressions, so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works the same as the typed
  * Column API (graft.functions.vec).
  *
  * Two entry points:
  *  - config `spark.sql.extensions=graft.plans.GraftExtensions` applies
  *    at session build time (the standard extensions hook);
  *  - [[GraftExtensions.register]] injects into an already-running
  *    session's function registry (tests, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[VecDot].getName, null, name, usage, "", "", "",
      "math_funcs", "4.0.0", "", "built-in")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - double dot product of two float/double arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot takes 2 arguments")
        VecDot(args(0), args(1))
      }),
    (FunctionIdentifier("vec_norm"),
      info("vec_norm", "vec_norm(a) - L2 norm of a float/double array"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "vec_norm takes 1 argument")
        VecNorm(args.head)
      }),
    (FunctionIdentifier("minhash"),
      info("minhash",
        "minhash(shingles, k) - k element-wise-min double-hashed md5 signatures of a string array"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash takes 2 arguments")
        StaticInvoke(TextHashAggregators.getClass, ArrayType(StringType),
          "minhashArrayData", Seq(args(0), args(1)), returnNullable = false)
      }),
    (FunctionIdentifier("simhash_tokens"),
      info("simhash_tokens",
        "simhash_tokens(tokens) - 16-hex 64-bit simhash of a string array (distinct tokens)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash_tokens takes 1 argument")
        StaticInvoke(TextHashAggregators.getClass, StringType,
          "simhashArrayData", Seq(args.head), returnNullable = false)
      }),
    (FunctionIdentifier("cms_probe"),
      info("cms_probe",
        "cms_probe(sketch, item) - estimated count of a string item in a count_min_sketch binary"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cms_probe takes 2 arguments")
        CmsProbe(args(0), args(1))
      }),
    (FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize",
        "nfc_normalize(str) - Unicode NFC canonical normalization (DuckDB-compatible name)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfc_normalize takes 1 argument")
        UnicodeNormalize(args.head, "NFC")
      }),
    (FunctionIdentifier("nfkc_normalize"),
      info("nfkc_normalize",
        "nfkc_normalize(str) - Unicode NFKC compatibility normalization"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfkc_normalize takes 1 argument")
        UnicodeNormalize(args.head, "NFKC")
      }))

  /** Register on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
}

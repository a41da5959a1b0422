package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for text pipelines (canonicalization before
  * hashing/dedup: visually-identical strings with different codepoint
  * sequences — composed vs combining accents, compatibility forms — must
  * collapse to one fingerprint or every dedup pass silently misses them).
  *
  * Static helpers are plain (UTF8String → UTF8String) functions so the
  * expression's generated code is a single static call that stays inside
  * WholeStageCodegen's fused loop — same pattern as the minhash/simhash
  * kernels (TextHashAggregators).
  */
object TextNorm {
  private[functions] def norm(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    // fast path: NFC/NFKC-normalized is the common case for real corpora
    // (ASCII always is); skip the allocation when already normalized
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
  def nfc(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFC)
  def nfd(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFD)
  def nfkc(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFKC)
  def nfkd(s: UTF8String): UTF8String = norm(s, Normalizer.Form.NFKD)
}

/** `unicode_normalize(str)` under the given form; null → null. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  private val forms = Set("NFC", "NFD", "NFKC", "NFKD")

  override def checkInputDataTypes(): TypeCheckResult =
    if (!forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be one of ${forms.mkString("/")}, got '$form'")
    else if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def prettyName: String = s"${form.toLowerCase}_normalize"

  @transient private lazy val javaForm = Normalizer.Form.valueOf(form)

  // dispatch to the SAME static helper the generated code calls, so
  // interpreted eval and codegen can never diverge
  override protected def nullSafeEval(v: Any): Any =
    TextNorm.norm(v.asInstanceOf[UTF8String], javaForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextNorm.${form.toLowerCase}($c)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

/** Column-level entry points. */
object textnorm {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def nfc(c: Column): Column = column(UnicodeNormalize(expression(c), "NFC"))
  def nfkc(c: Column): Column = column(UnicodeNormalize(expression(c), "NFKC"))
}

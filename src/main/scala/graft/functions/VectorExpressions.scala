package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for dense-vector math over `array<float>` /
  * `array<double>` columns (the `embeddings.embedding` column).
  *
  * Why not `aggregate(zip_with(...))`: higher-order functions allocate a
  * lambda frame per element and stay outside whole-stage codegen's fused
  * loop; for a 64-dim dot product evaluated millions of times (brute-force
  * top-k, all-pairs near-dup) that interpretive overhead dominates. These
  * expressions generate a tight primitive `for` loop via `doGenCode`, so
  * the similarity scan stays inside WholeStageCodegen — the difference
  * between a map-only scan that saturates the disk and one that burns CPU
  * on closure dispatch, which is exactly what matters on a 1000-executor
  * scan of a 100 TB embedding table.
  *
  * Accumulation is double (floats widened per element, ascending index
  * order) — matches an oracle that casts to DOUBLE[] before folding.
  * Dimension mismatch folds over the shorter prefix; null input → null,
  * and a null ELEMENT also → null (DuckDB's list fold propagates NULL —
  * treating a null slot as 0.0 would silently skew every similarity
  * score computed from a partially-null vector).
  */
trait VecArrayHelpers { self: Expression =>
  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  protected def checkVecInputs(inputs: Seq[Expression]): TypeCheckResult = {
    val bad = inputs.find {
      _.dataType match {
        case ArrayType(FloatType | DoubleType, _) => false
        case _                                    => true
      }
    }
    bad match {
      case Some(e) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double>, got ${e.dataType.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  protected def getter(dt: DataType): String = dt match {
    case FloatType  => "getFloat"
    case DoubleType => "getDouble"
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  protected def elemAt(a: ArrayData, dt: DataType, i: Int): Double = dt match {
    case FloatType  => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }
}

/** sum_i(a[i] * b[i]) in double; codegen'd primitive loop. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with VecArrayHelpers {

  override def checkInputDataTypes(): TypeCheckResult =
    checkVecInputs(Seq(left, right))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null ELEMENTS also null the result
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      sum += elemAt(a, lt, i) * elemAt(b, rt, i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val (ga, gb) = (getter(elemType(left)), getter(elemType(right)))
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $sum += (double) $a.$ga($i) * (double) $b.$gb($i);
         |}
         |if (!${ev.isNull}) { ${ev.value} = $sum; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** sqrt(sum_i(a[i]^2)) in double; codegen'd primitive loop. */
case class VecNorm(child: Expression)
    extends UnaryExpression with VecArrayHelpers {

  override def checkInputDataTypes(): TypeCheckResult =
    checkVecInputs(Seq(child))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null ELEMENTS also null the result
  override def prettyName: String = "vec_norm"

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val t = elemType(child)
    val n = a.numElements()
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = elemAt(a, t, i); sum += x * x; i += 1
    }
    math.sqrt(sum)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val x = ctx.freshName("x")
      val g = getter(elemType(child))
      s"""
         |final int $n = $a.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $x = (double) $a.$g($i);
         |  $sum += $x * $x;
         |}
         |if (!${ev.isNull}) { ${ev.value} = java.lang.Math.sqrt($sum); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

/** Column-level entry points (usable anywhere a built-in Column is). */
object vec {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def dot(a: Column, b: Column): Column = column(VecDot(expression(a), expression(b)))
  def norm(a: Column): Column = column(VecNorm(expression(a)))

  /** Raw cosine — DELIBERATELY propagates the degenerate shapes: a
    * zero-norm input gives 0/0 = NaN (like DuckDB's
    * list_cosine_similarity, which the oracles replay), and Spark
    * sorts NaN ABOVE every real double. NEVER rank on this bare: every
    * ranking path in this repo wraps it `nanvl(cosine(..), lit(-1.0))`
    * so degenerates rank LAST (SimilaritySpec pins that), or filters
    * `norm > 0` first. A silent -1 here instead would desync the
    * cross-engine oracle arithmetic. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}

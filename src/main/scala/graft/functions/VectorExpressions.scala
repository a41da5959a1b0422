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

private[functions] object VecRound {
  /** HALF_UP rounding matching Spark's Round on doubles, INCLUDING its
    * non-finite rule: Round passes ±Infinity (and NaN) through untouched,
    * while `BigDecimal.valueOf` throws NumberFormatException on them — a
    * cosine of +Inf (norm underflow) or a d² of +Inf (huge elements) must
    * rank, not crash the task. */
  def halfUp(v: Double, scale: Int): Double =
    if (java.lang.Double.isInfinite(v) || java.lang.Double.isNaN(v)) v
    else java.math.BigDecimal.valueOf(v)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
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

/** Fused IVF anchor argmin: the top-`k` nearest anchors of an embedding
  * by (rounded cosine DESC, anchor id ASC), returned as an array of the
  * anchor ids in rank order.
  *
  * Semantically identical to the per-anchor struct formulation it
  * replaces (`least`/`array_sort` over one
  * `struct(-round(nanvl(vec.cosine(emb, typedLit(av)), -1), r), aid)`
  * per anchor) — but the anchor matrix rides as ONE compact reference
  * object instead of |anchors| literal subtrees, so the plan, the task
  * binary, and the generated code stay O(1) in the anchor count.
  * Measured on the bench sweep: the literal form cost 0.1-0.2s of task
  * DESERIALIZATION per task (every task of every IVF stage re-inflating
  * ~70 cosine subtrees) plus a driver-side Janino compile of the
  * unrolled candidates per fresh plan.
  *
  * Equivalence notes (each mirrors the replaced plan exactly):
  *  - anchor elements are widened per-element to double (VecDot's own
  *    rule), so float anchors stored widened are bit-identical;
  *  - dot folds over the min-length prefix ascending; norms fold the
  *    FULL arrays (VecDot/VecNorm); cosine = dot / (normE * normA);
  *  - a zero norm gives NaN, ranked via nanvl(-1) like every ranking
  *    path here; rounding is java.math.BigDecimal HALF_UP at `roundAt`
  *    (Spark Round's own double path);
  *  - cosine ties break by LOWER anchor id (SQLOrderingUtil double
  *    compare, so -0.0 == 0.0 like struct ordering);
  *  - a null embedding, or any null embedding ELEMENT, nulls every
  *    cosine in the replaced plan, making every candidate's sort key
  *    null and the order anchor-id-ascending — replicated by the
  *    sentinel rank below. The result array is never null.
  */
case class VecNearestAnchors(child: Expression, aids: Array[Long],
    anchors: Array[Array[Double]], anchorNorms: Array[Double],
    k: Int, roundAt: Int)
    extends UnaryExpression with VecArrayHelpers {

  override def checkInputDataTypes(): TypeCheckResult =
    checkVecInputs(Seq(child))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vec_nearest_anchors"

  private def isFloat: Boolean = elemType(child) == FloatType

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    VecNearestAnchors.compute(v.asInstanceOf[ArrayData], isFloat,
      aids, anchors, anchorNorms, k, roundAt)
  }

  // the per-row body is ONE static call with primitive loops inside —
  // the scan stays inside WholeStageCodegen (no row-level fallback),
  // and the anchor matrix rides the generated class as reference
  // objects, not literal subtrees.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.{FalseLiteral, JavaCode}
    val aidsRef = ctx.addReferenceObj("aids", aids, "long[]")
    val matRef = ctx.addReferenceObj("anchors", anchors, "double[][]")
    val nrmRef = ctx.addReferenceObj("anchorNorms", anchorNorms, "double[]")
    val c = child.genCode(ctx)
    val out = ctx.freshName("nearest")
    val call =
      s"graft.functions.VecNearestAnchors$$.MODULE$$.compute(" +
        s"${c.isNull} ? null : ${c.value}, $isFloat, " +
        s"$aidsRef, $matRef, $nrmRef, $k, $roundAt)"
    ev.copy(
      code = code"""
        |${c.code}
        |org.apache.spark.sql.catalyst.util.ArrayData $out = $call;
      """.stripMargin,
      isNull = FalseLiteral,
      value = JavaCode.variable(out, dataType))
  }

  override protected def withNewChildInternal(newChild: Expression): VecNearestAnchors =
    copy(child = newChild)

  // Array fields make the synthesized case-class equals/hashCode
  // reference-based, so two semantically identical expressions never
  // compare equal — defeating subexpression elimination and
  // exchange/cache reuse. Compare contents instead.
  override def equals(o: Any): Boolean = o match {
    case that: VecNearestAnchors =>
      child == that.child && k == that.k && roundAt == that.roundAt &&
        java.util.Arrays.equals(aids, that.aids) &&
        java.util.Arrays.deepEquals(
          anchors.asInstanceOf[Array[AnyRef]],
          that.anchors.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(anchorNorms, that.anchorNorms)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(k),
      Integer.valueOf(roundAt),
      Integer.valueOf(java.util.Arrays.hashCode(aids)),
      Integer.valueOf(java.util.Arrays.deepHashCode(
        anchors.asInstanceOf[Array[AnyRef]])),
      Integer.valueOf(java.util.Arrays.hashCode(anchorNorms)))
}

object VecNearestAnchors {
  /** Rank key per anchor: (sentinel-first, rounded cosine DESC, aid
    * ASC); lower = better. Sentinel (null cosine in the replaced plan)
    * ranks BEFORE any real value — catalyst struct ordering puts null
    * fields first ascending. */
  private def better(rcA: Double, sA: Boolean, aidA: Long,
      rcB: Double, sB: Boolean, aidB: Long): Boolean = {
    if (sA != sB) return sA
    if (!sA) {
      // descending on the rounded cosine: A precedes B iff rcA > rcB
      val c = org.apache.spark.sql.catalyst.util.SQLOrderingUtil
        .compareDoubles(rcA, rcB)
      if (c != 0) return c > 0
    }
    aidA < aidB
  }

  /** Called from generated code — keep the signature Java-friendly. */
  def compute(arr: ArrayData, isFloat: Boolean, aids: Array[Long],
      anchors: Array[Array[Double]], anchorNorms: Array[Double],
      k: Int, roundAt: Int): ArrayData = {
    var allNull = arr == null
    if (!allNull) {
      var i = 0
      val n = arr.numElements()
      while (i < n && !allNull) { allNull = arr.isNullAt(i); i += 1 }
    }
    // full-array norm of the embedding (VecNorm's fold order)
    var normE = 0.0
    if (!allNull) {
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        normE += x * x; i += 1
      }
      normE = math.sqrt(normE)
    }
    val topAid = new Array[Long](k)
    val topRc = new Array[Double](k)
    val topS = new Array[Boolean](k)
    var filled = 0
    var ai = 0
    while (ai < aids.length) {
      val av = anchors(ai)
      var rc = 0.0
      val sentinel = allNull
      if (!sentinel) {
        val n = math.min(arr.numElements(), av.length)
        var dot = 0.0
        var i = 0
        while (i < n) {
          val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          dot += x * av(i); i += 1
        }
        val c = dot / (normE * anchorNorms(ai))
        val nv = if (java.lang.Double.isNaN(c)) -1.0 else c
        rc = VecRound.halfUp(nv, roundAt)
      }
      // insertion into the size-k top list (k is 1-4 in practice)
      var pos = filled
      while (pos > 0 && better(rc, sentinel, aids(ai),
          topRc(pos - 1), topS(pos - 1), topAid(pos - 1))) pos -= 1
      if (pos < k) {
        val end = math.min(filled, k - 1)
        var j = end
        while (j > pos) {
          topAid(j) = topAid(j - 1); topRc(j) = topRc(j - 1)
          topS(j) = topS(j - 1); j -= 1
        }
        topAid(pos) = aids(ai); topRc(pos) = rc; topS(pos) = sentinel
        if (filled < k) filled += 1
      }
      ai += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      java.util.Arrays.copyOf(topAid, filled))
  }
}

/** Fused PQ subspace assignment: for each of `m` subspaces, the
  * (rounded squared distance, codeword) argmin over that subspace's
  * codebook — `array<struct<d: double, code: bigint>>`, element `j` for
  * subspace `j`.
  *
  * Replaces the literal formulation (per codeword: a `sub`-element
  * literal array + `zip_with`+`aggregate` lambdas + an `array_sort`
  * over ksub structs, all × m subspaces): that plan was O(m·ksub·sub)
  * expression nodes — profiled at 4-5 s aggregate task DESERIALIZATION
  * per 32-task stage — and its higher-order lambdas evaluated
  * interpreted, outside whole-stage codegen, on the encode hot path
  * (every Lloyd iteration of a refit re-encodes). The codebooks ride as
  * ONE reference object; the per-row body is a static call of primitive
  * loops inside the fused codegen stage.
  *
  * Equivalence (mirrors the replaced plan exactly):
  *  - d² folds `java.lang.Math.pow(x - w, 2.0)` ascending from 0.0 —
  *    catalyst's Pow is Math.pow, and `aggregate`'s fold order is
  *    ascending index;
  *  - embedding elements cast to double per element;
  *  - rounding is BigDecimal HALF_UP at `roundAt` (Spark Round's
  *    double path); ranking is (d asc, code asc) with SQLOrderingUtil
  *    double compare (so -0.0 == 0.0, NaN can't occur: d² >= 0);
  *  - a null embedding ELEMENT in subspace `j` nulls every codeword's
  *    d² there; null struct fields rank FIRST ascending, ties to the
  *    lower code — so the element comes back as (null, 0), exactly the
  *    replaced plan's output. The size guard (refuse dim mismatch)
  *    stays OUTSIDE in pqEncodeDetailCol's when/raise_error wrapper,
  *    unchanged.
  */
case class PqEncodeDetail(child: Expression,
    codebooks: Array[Array[Array[Double]]], roundAt: Int)
    extends UnaryExpression with VecArrayHelpers {

  override def checkInputDataTypes(): TypeCheckResult =
    checkVecInputs(Seq(child))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d", DoubleType, nullable = true),
    StructField("code", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pq_encode_detail"

  private def isFloat: Boolean = elemType(child) == FloatType

  override protected def nullSafeEval(v: Any): Any =
    PqEncodeDetail.compute(v.asInstanceOf[ArrayData], isFloat,
      codebooks, roundAt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.PqEncodeDetail$$.MODULE$$.compute(
         |  $a, $isFloat, $cbRef, $roundAt);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeDetail =
    copy(child = newChild)

  // contents-based equality: see VecNearestAnchors — the Array field
  // otherwise defeats subexpression elimination and exchange reuse
  override def equals(o: Any): Boolean = o match {
    case that: PqEncodeDetail =>
      child == that.child && roundAt == that.roundAt &&
        java.util.Arrays.deepEquals(
          codebooks.asInstanceOf[Array[AnyRef]],
          that.codebooks.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(roundAt),
      Integer.valueOf(java.util.Arrays.deepHashCode(
        codebooks.asInstanceOf[Array[AnyRef]])))
}

object PqEncodeDetail {
  /** Called from generated code — Java-friendly signature. */
  def compute(arr: ArrayData, isFloat: Boolean,
      codebooks: Array[Array[Array[Double]]], roundAt: Int): ArrayData = {
    val m = codebooks.length
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val sub = if (cb.nonEmpty) cb(0).length else 0
      val off = j * sub
      // null embedding element anywhere in this subspace's slice nulls
      // every codeword's distance → (null, 0), the replaced plan's
      // null-field-first + lower-code tie outcome. A vector SHORTER than
      // m·sub gets the same treatment: the replaced plan's element_at
      // past the end yielded null (never an unchecked read), so the
      // bounds check makes the expression safe standalone, not only
      // under pqEncodeDetailCol's size guard.
      var hasNull = off + sub > arr.numElements()
      var i = 0
      while (i < sub && !hasNull) {
        hasNull = arr.isNullAt(off + i); i += 1
      }
      var bestD = 0.0
      var bestCode = 0L
      if (!hasNull) {
        var first = true
        var c = 0
        while (c < cb.length) {
          val cw = cb(c)
          var d2 = 0.0
          var i2 = 0
          while (i2 < sub) {
            val x = if (isFloat) arr.getFloat(off + i2).toDouble
              else arr.getDouble(off + i2)
            d2 += java.lang.Math.pow(x - cw(i2), 2.0)
            i2 += 1
          }
          val d = VecRound.halfUp(d2, roundAt)
          // (d asc, code asc): strictly-less wins; ties keep the lower
          // (earlier) code, so first-wins insertion is exact
          if (first || org.apache.spark.sql.catalyst.util.SQLOrderingUtil
              .compareDoubles(d, bestD) < 0) {
            bestD = d; bestCode = c.toLong; first = false
          }
          c += 1
        }
      }
      out(j) =
        if (hasNull) org.apache.spark.sql.catalyst.InternalRow(null, 0L)
        else org.apache.spark.sql.catalyst.InternalRow(bestD, bestCode)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Column-level entry points (usable anywhere a built-in Column is). */
object vec {
  import org.apache.spark.sql.GraftBridge.{column, expression}

  def dot(a: Column, b: Column): Column = column(VecDot(expression(a), expression(b)))
  def norm(a: Column): Column = column(VecNorm(expression(a)))

  /** Top-`k` nearest anchors by (rounded cosine desc, anchor id asc) —
    * see [[VecNearestAnchors]]. `anchors` rows must be pre-widened to
    * double and `norms` computed with VecNorm's fold; aids sorted asc. */
  def nearestAnchors(emb: Column, aids: Array[Long],
      anchors: Array[Array[Double]], norms: Array[Double],
      k: Int, roundAt: Int): Column =
    column(VecNearestAnchors(expression(emb), aids, anchors, norms, k, roundAt))

  /** Per-subspace PQ argmin — see [[PqEncodeDetail]]. */
  def pqEncodeDetail(emb: Column, codebooks: Array[Array[Array[Double]]],
      roundAt: Int): Column =
    column(PqEncodeDetail(expression(emb), codebooks, roundAt))

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

package graft.ann.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for embedding math (whole-stage-codegen'd).
 *
 * WHY: Spark's higher-order array functions (`aggregate`, `zip_with`) are
 * INTERPRETED — every per-pair dot product in an ANN re-rank walks the arrays
 * through lambda dispatch outside codegen. For candidate-verification joins
 * (the hot path of every ANN / embedding-dedup query: e1-e4, e3's 300k-pair
 * verify) that interpreter cost dominates the query. These expressions inline
 * the multiply-accumulate loop into generated Java, keeping the verify stage
 * inside whole-stage codegen end to end.
 *
 * DETERMINISM CONTRACT (cross-engine oracles): accumulation is strictly
 * left-to-right over the array — the same order as `aggregate(zip_with(a, b,
 * _*_), 0.0, _+_)`, DuckDB's `list_dot_product`, and `list_cosine_similarity`
 * — so results are BIT-IDENTICAL to both the interpreted formulation they
 * replace and the DuckDB oracle side. [[VecCosine]] keeps three independent
 * sequential accumulators (dot, |a|^2, |b|^2) in one pass; each equals its
 * standalone sequential sum, so fusing the walks does not change a bit.
 *
 * NULL SEMANTICS (match `zip_with` + `aggregate`): null input array, arrays
 * of different lengths (zip_with pads with null), or any null element -> null.
 * Two empty arrays -> dot 0.0 (the fold's init), cosine NaN (0/0) — identical
 * to the interpreted formulation.
 */
trait VecTypeCheck { self: Expression =>
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckSuccess
    else TypeCheckFailure(
      s"$prettyName expects array<double> inputs but got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }
}

object VecExprUtil {
  /** Strict left-to-right dot product; null on length mismatch / null element
    * (boxed for the interpreted path — codegen inlines the loop instead). */
  def dot(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** One-pass cosine: three independent sequential accumulators. */
  def cosine(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var sa = 0.0; var sb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; sa += x * x; sb += y * y
      i += 1
    }
    dot / (math.sqrt(sa) * math.sqrt(sb))
  }
}

/** vec_dot(a, b): sequential dot product of two double arrays. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with VecTypeCheck {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    VecExprUtil.dot(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** rhp_signature(vec): every random-hyperplane sign bit of one vector in a
  * SINGLE fused pass — bit j set iff the strict left-to-right dot of `vec`
  * with plane j's weight row is > 0.
  *
  * WHY an expression and not `numPlanes` vec_dot calls: the unfused
  * formulation (32 x `when(vec_dot(vec, litArray) > 0, ...)`) generates 32
  * inlined cast+dot loops per row; the whole-stage method blows past the
  * JIT's ~8KB inline/huge-method thresholds and runs de-optimized —
  * measured 26s for 200k x 32-plane signatures at 100x sf0.1 vs ~1s fused.
  * At 100 TB the signature projection is the map-side cost of EVERY banded
  * LSH operator, so it must be one tight JIT-able loop nest over a
  * reference-object weight matrix.
  *
  * SEMANTICS (exactly the per-plane formulation this replaces, which wraps
  * each dot in `when(dot > 0, bit).otherwise(0)`): null vector, length
  * mismatch with `dim`, or any null element -> every plane's predicate is
  * null -> every bit falls to otherwise(0) -> signature 0, never null.
  * Per-plane accumulation order is left-to-right — bit-identical to
  * vec_dot and to the oracle's list_dot_product. */
case class RhpSignature(child: Expression, weights: Seq[Double],
    numPlanes: Int, dim: Int)
    extends UnaryExpression with VecTypeCheck {
  require(weights.length == numPlanes * dim,
    s"rhp_signature needs $numPlanes x $dim weights, got ${weights.length}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "rhp_signature"
  @transient private lazy val wFlat: Array[Double] = weights.toArray

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L
    val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (a.numElements() != dim) return 0L
    var i = 0
    while (i < dim) { if (a.isNullAt(i)) return 0L; i += 1 }
    var sig = 0L
    var j = 0
    while (j < numPlanes) {
      var acc = 0.0
      val off = j * dim
      var p = 0
      while (p < dim) { acc += a.getDouble(p) * wFlat(off + p); p += 1 }
      if (acc > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val w = ctx.addReferenceObj("rhpWeights", wFlat, "double[]")
    val a = ctx.freshName("arr")
    val sig = ctx.freshName("sig")
    val ok = ctx.freshName("ok")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val p = ctx.freshName("p")
    val acc = ctx.freshName("acc")
    ev.copy(isNull = FalseLiteral, code =
      code"""
         |${c.code}
         |long $sig = 0L;
         |if (!${c.isNull}) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $a = ${c.value};
         |  boolean $ok = $a.numElements() == $dim;
         |  for (int $i = 0; $ok && $i < $dim; $i++) {
         |    if ($a.isNullAt($i)) $ok = false;
         |  }
         |  if ($ok) {
         |    for (int $j = 0; $j < $numPlanes; $j++) {
         |      double $acc = 0.0;
         |      for (int $p = 0; $p < $dim; $p++) {
         |        $acc += $a.getDouble($p) * $w[$j * $dim + $p];
         |      }
         |      if ($acc > 0) $sig |= 1L << $j;
         |    }
         |  }
         |}
         |long ${ev.value} = $sig;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): RhpSignature =
    copy(child = newChild)
}

/** pq_encode(vec): the full product-quantization code assignment of one
  * vector — per subspace m, the argmax over that subspace's codewords of
  * `2*dot(vec_m, cw) - ||cw||^2` (the L2 argmin identity), ties to the
  * LOWEST code value — in a single pass.
  *
  * WHY: the relational formulation (cross-join every vector against the
  * broadcast numSub x ksub codebook, then a max(struct) argmax) pushes
  * n * numSub * ksub rows (2048x the corpus for 8x256 codebooks) through
  * a join and an aggregation just to compute a per-row pure function; at
  * corpus scale the encode dominates every PQ operator (the r4 smoke's
  * e7 ratio). Here the same arithmetic runs as one per-row loop nest over
  * reference-object codebook tables.
  *
  * DETERMINISM (bit-identical to the formulation it replaces): per-codeword
  * dot is strict left-to-right over subDim; score = 2.0*dot - cwn2 with
  * the SAME collected cwn2 doubles; codewords are visited in ascending
  * code order and only a STRICTLY greater score displaces the best, so
  * ties keep the lowest code — exactly `max(struct(score, -code))`.
  * Null or wrong-length input -> null (callers pre-filter on length).
  *
  * Interpreted eval only (CodegenFallback): the per-row work is a
  * numSub*ksub*subDim JVM-compiled loop — codegen would save one virtual
  * call per ROW against ~16k multiplies, and the fallback keeps the
  * generated whole-stage method small (the rhp_signature lesson). */
case class PqEncode(child: Expression, cb: Seq[Double], cwn2: Seq[Double],
    codeVals: Seq[Long], counts: Seq[Int], numSub: Int, subDim: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    with VecTypeCheck {
  require(counts.length == numSub && counts.forall(_ > 0),
    s"pq_encode needs a non-empty codebook for each of $numSub subspaces")
  require(cb.length == cwn2.length * subDim && cwn2.length == counts.sum,
    "pq_encode codebook table shape mismatch")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"
  @transient private lazy val cbFlat = cb.toArray
  @transient private lazy val n2Flat = cwn2.toArray
  @transient private lazy val codeFlat = codeVals.toArray
  @transient private lazy val offsets: Array[Int] =
    counts.scanLeft(0)(_ + _).init.toArray

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (a.numElements() != numSub * subDim) return null
    val out = new Array[Long](numSub)
    var m = 0
    while (m < numSub) {
      var best = Double.NegativeInfinity
      var bestCode = 0L
      val off = offsets(m)
      var c = 0
      while (c < counts(m)) {
        var acc = 0.0
        val base = (off + c) * subDim
        var d = 0
        while (d < subDim) {
          acc += a.getDouble(m * subDim + d) * cbFlat(base + d)
          d += 1
        }
        val score = 2.0 * acc - n2Flat(off + c)
        if (score > best) { best = score; bestCode = codeFlat(off + c) }
        c += 1
      }
      out(m) = bestCode
      m += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** vec_cosine(a, b): one-pass cosine similarity (dot / (|a| * |b|)). */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression with VecTypeCheck {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_cosine"
  protected override def nullSafeEval(a: Any, b: Any): Any =
    VecExprUtil.cosine(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val sa = ctx.freshName("sa")
      val sb = ctx.freshName("sb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $sa = 0.0; double $sb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = $a.getDouble($i);
         |    final double $y = $b.getDouble($i);
         |    $dot += $x * $y; $sa += $x * $x; $sb += $y * $y;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $dot / (java.lang.Math.sqrt($sa) * java.lang.Math.sqrt($sb));
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}

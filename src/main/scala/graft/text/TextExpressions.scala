package graft.text

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object TextExprUtil {
  import TextOps.P
  private val As = Array.tabulate(8)(TextOps.hashA)
  private val Bs = Array.tabulate(8)(TextOps.hashB)

  /** t2's 2x4-band LSH bucket of a document in ONE compiled pass: 3-char
    * shingle codes -> 8 running MinHash minima -> polynomial band combine.
    * Bit-identical to the declarative formulation
    * ([[TextOps.minhashSignature]] + [[TextOps.bandHash]], pinned by
    * LshBandHashSpec) but ~100x faster per row: the Column version walks
    * the shingle array through 8 INTERPRETED higher-order lambdas, this is
    * a tight JIT'd loop. Returns -1 for texts without a full shingle (the
    * declarative formulation's NULL). Positions are UTF-16 units vs the
    * Column version's code points — identical on BMP text (the corpus);
    * codes above P reduce mod P exactly like the pmod in the lambda. */
  def bandHashRaw(s: UTF8String, band: Int): Long = {
    val str = s.toString
    val n = str.length
    if (n < 3 || band < 0 || band > 1) return -1L
    val mins = new Array[Long](8)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i <= n - 3) {
      val code = (str.charAt(i).toLong * 65536L +
        str.charAt(i + 1).toLong * 256L + str.charAt(i + 2).toLong) % P
      var j = 0
      while (j < 8) {
        val h = (code * As(j) + Bs(j)) % P
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    var acc = 0L
    var j = band * 4
    while (j < band * 4 + 4) { acc = (acc * 31L + mins(j)) % P; j += 1 }
    acc
  }
}

/** lsh_band_hash(text, band): the t2-banding LSH bucket of a document —
  * the per-row form streaming pipelines need (a micro-batch projection
  * cannot amortize through the memoized exploded shingle frame the batch
  * pipelines share). NULL for texts shorter than one shingle. */
case class LshBandHash(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val actual = children.map(_.dataType)
    if (actual == Seq(StringType, IntegerType)) TypeCheckSuccess
    else TypeCheckFailure(
      s"$prettyName expects (string, int) but got (${actual.mkString(", ")})")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_band_hash"
  protected override def nullSafeEval(text: Any, band: Any): Any = {
    val r = TextExprUtil.bandHashRaw(
      text.asInstanceOf[UTF8String], band.asInstanceOf[Int])
    if (r < 0) null else java.lang.Long.valueOf(r)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, b) => {
      val r = ctx.freshName("bandHash")
      s"""
         |long $r = graft.text.TextExprUtil.bandHashRaw($t, $b);
         |if ($r < 0L) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LshBandHash =
    copy(left = newLeft, right = newRight)
}

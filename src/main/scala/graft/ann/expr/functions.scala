package graft.ann.expr

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.shims.{column, expression}

/** Column facade + SQL registration for the vector expressions. */
object functions {
  private def c(e: Expression): Column = column(e)
  // The expressions hard-require array<double> (ImplicitCastInputTypes is
  // private[sql] in Spark 4, so analysis never coerces for us); cast at the
  // facade so float-array embedding columns and SQL decimal literals keep
  // working, like they did through the higher-order functions these replace.
  // Casts that are already array<double> are elided by SimplifyCasts.
  private def e(col: Column): Expression = expression(col.cast("array<double>"))

  def vec_dot(a: Column, b: Column): Column = c(VecDot(e(a), e(b)))
  def vec_cosine(a: Column, b: Column): Column = c(VecCosine(e(a), e(b)))
  def rhp_signature(vec: Column, weights: Seq[Double],
      numPlanes: Int, dim: Int): Column =
    c(RhpSignature(e(vec), weights, numPlanes, dim))
  def pq_encode(vec: Column, cb: Seq[Double], cwn2: Seq[Double],
      codeVals: Seq[Long], counts: Seq[Int], numSub: Int, subDim: Int): Column =
    c(PqEncode(e(vec), cb, cwn2, codeVals, counts, numSub, subDim))
}

object VectorFunctions {
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression = {
    args =>
      if (args.length != n)
        throw new IllegalArgumentException(
          s"$name expects $n argument(s), got ${args.length}")
      build(args)
  }

  // SQL path: wrap args in an explicit cast to array<double> (same coercion
  // rationale as the Column facade — SQL `array(1.0, 2.0)` is decimal)
  private def toDouble(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(e,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))

  val all: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("vec_dot", arity("vec_dot", 2)(a => VecDot(toDouble(a(0)), toDouble(a(1)))),
      "vec_dot(a, b) - sequential dot product of two double arrays"),
    ("vec_cosine", arity("vec_cosine", 2)(a => VecCosine(toDouble(a(0)), toDouble(a(1)))),
      "vec_cosine(a, b) - cosine similarity of two double arrays")
  )

  /** Register the vector functions in the session's registry (SQL-visible). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (name, builder, usage) =>
      registry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.ann.expr", null, name, usage, ""),
        builder)
    }
  }
}

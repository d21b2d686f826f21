package graft.h3.expr

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.shims.{column, expression}

/**
 * Column-level H3 function facade + SQL registration.
 *
 * Usage (DataFrame API):
 *   import graft.h3.expr.functions._
 *   df.withColumn("parent", h3_to_parent($"h3index", lit(5)))
 *
 * Usage (SQL): H3Functions.register(spark) then
 *   spark.sql("SELECT h3_to_parent(h3index, 5) FROM t")
 */
object functions {
  private def c(e: Expression): Column = column(e)
  private def e(col: Column): Expression = expression(col)

  def h3_get_resolution(cell: Column): Column = c(H3GetResolution(e(cell)))
  def h3_get_base_cell(cell: Column): Column = c(H3GetBaseCell(e(cell)))
  def h3_is_valid(cell: Column): Column = c(H3IsValid(e(cell)))
  def h3_to_parent(cell: Column, res: Column): Column = c(H3ToParent(e(cell), e(res)))
  def h3_children_count(cell: Column, res: Column): Column = c(H3ChildrenCount(e(cell), e(res)))
  def h3_to_children(cell: Column, res: Column): Column = c(H3ToChildren(e(cell), e(res)))
  def h3_cell_to_string(cell: Column): Column = c(H3CellToString(e(cell)))
  def h3_string_to_cell(s: Column): Column = c(H3StringToCell(e(s)))
}

object H3Functions {
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression = {
    args =>
      if (args.length != n)
        throw new IllegalArgumentException(
          s"$name expects $n argument(s), got ${args.length}")
      build(args)
  }

  /** (name, arity-checked builder, usage doc) for every H3 SQL function. */
  val all: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("h3_get_resolution", arity("h3_get_resolution", 1)(a => H3GetResolution(a.head)),
      "h3_get_resolution(cell) - resolution (0..15) of an H3 cell index"),
    ("h3_get_base_cell", arity("h3_get_base_cell", 1)(a => H3GetBaseCell(a.head)),
      "h3_get_base_cell(cell) - base cell number (0..121) of an H3 cell index"),
    ("h3_is_valid", arity("h3_is_valid", 1)(a => H3IsValid(a.head)),
      "h3_is_valid(cell) - true iff the long is a valid H3 cell index"),
    ("h3_to_parent", arity("h3_to_parent", 2)(a => H3ToParent(a(0), a(1))),
      "h3_to_parent(cell, res) - ancestor of the cell at the given coarser resolution"),
    ("h3_children_count", arity("h3_children_count", 2)(a => H3ChildrenCount(a(0), a(1))),
      "h3_children_count(cell, res) - number of children at the given finer resolution"),
    ("h3_to_children", arity("h3_to_children", 2)(a => H3ToChildren(a(0), a(1))),
      "h3_to_children(cell, res) - array of all children at the given finer resolution"),
    ("h3_cell_to_string", arity("h3_cell_to_string", 1)(a => H3CellToString(a.head)),
      "h3_cell_to_string(cell) - lowercase hex representation"),
    ("h3_string_to_cell", arity("h3_string_to_cell", 1)(a => H3StringToCell(a.head)),
      "h3_string_to_cell(str) - parse hex representation to a cell index (null on malformed)")
  )

  /** Register all H3 functions in the session's function registry (SQL-visible). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (name, builder, usage) =>
      registry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.h3.expr", null, name, usage, ""),
        builder)
    }
  }
}

/**
 * SparkSessionExtensions injector: enable with
 * `spark.sql.extensions=graft.h3.expr.GraftExtensions` so H3 functions exist
 * in every session without an explicit register() call.
 */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    (H3Functions.all ++ graft.ann.expr.VectorFunctions.all).foreach { case (name, builder, usage) =>
      ext.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo("graft.h3.expr", null, name, usage, ""),
          builder))
    }
    // h3_to_parent probe predicates -> raw-h3index range pushdown; injected
    // into the main operator-optimization fixed point so the inferred
    // conjunct can keep propagating (through joins, aliases) afterwards
    ext.injectOptimizerRule(_ => graft.plans.H3ParentPredicateRewrite)
  }
}

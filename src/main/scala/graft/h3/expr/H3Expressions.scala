package graft.h3.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

import graft.h3.H3

/** Manual input-type validation (AbstractDataType / ExpectsInputTypes are
  * private[sql] in Spark 4, so third-party expressions validate by hand). */
trait H3TypeCheck { self: Expression =>
  protected def expectedTypes: Seq[DataType]
  override def checkInputDataTypes(): TypeCheckResult = {
    val actual = children.map(_.dataType)
    if (actual == expectedTypes) TypeCheckSuccess
    else TypeCheckFailure(
      s"$prettyName expects (${expectedTypes.mkString(", ")}) but got (${actual.mkString(", ")})")
  }
}

/**
 * Native Catalyst expressions for H3 index math (whole-stage-codegen'd; no
 * UDF/serialization overhead in the hot path). These are the Spark-side
 * equivalents of the ClickHouse built-ins the reference engine's generated
 * SQL relies on: `h3ToParent` / `h3GetResolution` / `h3GetBaseCell` /
 * `h3ToChildren` (reference `compacted_tables/insert.rs:393-517`,
 * `schema/partitioning.rs:98-130`, `select.rs:139-162`).
 *
 * All are total functions (no runtime errors on out-of-range resolutions) so
 * they are safe under speculative evaluation and filter reordering:
 *  - `h3_to_parent(cell, r)` with r >= res(cell) returns the cell unchanged;
 *    negative r is clamped to 0.
 *  - `h3_children_count` / `h3_to_children` with childRes < res(cell) return
 *    0 / empty array.
 */
object H3ExprUtil {
  /** Total toParent: clamp negative target res to 0, pass through if coarser. */
  def toParentTotal(h: Long, parentRes: Int): Long =
    H3.toParentUnsafe(h, if (parentRes < 0) 0 else parentRes)

  def childrenCountTotal(h: Long, childRes: Int): Long = {
    val res = H3.getResolution(h)
    if (childRes < res || childRes > H3.MaxRes) 0L
    else H3.childrenCount(h, childRes)
  }

  /** Total: out-of-range resolutions AND oversized expansions (> 2^28
    * children) yield an EMPTY array instead of throwing — this expression
    * must stay safe under speculative evaluation and filter reordering,
    * where Catalyst may evaluate it on rows a later predicate would have
    * excluded. Callers that need the full expansion of a coarse cell should
    * step down one resolution at a time (as restricted uncompaction does). */
  def toChildrenTotal(h: Long, childRes: Int): Array[Long] = {
    val res = H3.getResolution(h)
    if (childRes < res || childRes > H3.MaxRes) Array.emptyLongArray
    else {
      val n = H3.childrenCount(h, childRes)
      if (n > (1L << 28)) Array.emptyLongArray
      else H3.toChildren(h, childRes)
    }
  }
}

/** h3_get_resolution(cell): the 4-bit resolution field. */
case class H3GetResolution(child: Expression)
    extends UnaryExpression with H3TypeCheck {
  override protected def expectedTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "h3_get_resolution"
  protected override def nullSafeEval(input: Any): Any =
    H3.getResolution(input.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.h3.H3.getResolution($c)")
  override protected def withNewChildInternal(newChild: Expression): H3GetResolution =
    copy(child = newChild)
}

/** h3_get_base_cell(cell): the 7-bit base-cell field (0..121). */
case class H3GetBaseCell(child: Expression)
    extends UnaryExpression with H3TypeCheck {
  override protected def expectedTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "h3_get_base_cell"
  protected override def nullSafeEval(input: Any): Any =
    H3.getBaseCell(input.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.h3.H3.getBaseCell($c)")
  override protected def withNewChildInternal(newChild: Expression): H3GetBaseCell =
    copy(child = newChild)
}

/** h3_is_valid(cell): full cell-index validation (mode, base cell, digits,
  * pentagon K-axis). Reference semantics: mandatory h3index column check
  * (`utils.rs:9-20`). */
case class H3IsValid(child: Expression)
    extends UnaryExpression with H3TypeCheck {
  override protected def expectedTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "h3_is_valid"
  protected override def nullSafeEval(input: Any): Any =
    H3.isValidCell(input.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.h3.H3.isValidCell($c)")
  override protected def withNewChildInternal(newChild: Expression): H3IsValid =
    copy(child = newChild)
}

/** h3_to_parent(cell, parentRes): coarsen a cell. Total (see file docs). */
case class H3ToParent(left: Expression, right: Expression)
    extends BinaryExpression with H3TypeCheck {
  override protected def expectedTypes: Seq[DataType] = Seq(LongType, IntegerType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "h3_to_parent"
  protected override def nullSafeEval(cell: Any, res: Any): Any =
    H3ExprUtil.toParentTotal(cell.asInstanceOf[Long], res.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, r) => s"graft.h3.expr.H3ExprUtil.toParentTotal($c, $r)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): H3ToParent =
    copy(left = newLeft, right = newRight)
}

/** h3_children_count(cell, childRes): pentagon-aware child count
  * (hexagon: 7^d; pentagon: 1 + 5*(7^d-1)/6). Mirrors the reference's
  * `length(h3ToChildren(...))` (`insert.rs:391-401`). */
case class H3ChildrenCount(left: Expression, right: Expression)
    extends BinaryExpression with H3TypeCheck {
  override protected def expectedTypes: Seq[DataType] = Seq(LongType, IntegerType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "h3_children_count"
  protected override def nullSafeEval(cell: Any, res: Any): Any =
    H3ExprUtil.childrenCountTotal(cell.asInstanceOf[Long], res.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, r) => s"graft.h3.expr.H3ExprUtil.childrenCountTotal($c, $r)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): H3ChildrenCount =
    copy(left = newLeft, right = newRight)
}

/** h3_to_children(cell, childRes): array of all children at childRes.
  * Compose with `explode(...)` for the generator form used by restricted
  * uncompaction (reference `mod.rs:459-477`). */
case class H3ToChildren(left: Expression, right: Expression)
    extends BinaryExpression with H3TypeCheck {
  override protected def expectedTypes: Seq[DataType] = Seq(LongType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "h3_to_children"
  protected override def nullSafeEval(cell: Any, res: Any): Any = {
    val arr = H3ExprUtil.toChildrenTotal(cell.asInstanceOf[Long], res.asInstanceOf[Int])
    UnsafeArrayData.fromPrimitiveArray(arr)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, r) =>
      s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(" +
        s"graft.h3.expr.H3ExprUtil.toChildrenTotal($c, $r))")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): H3ToChildren =
    copy(left = newLeft, right = newRight)
}

/** h3_cell_to_string(cell): lowercase hex form (ClickHouse `h3ToString`). */
case class H3CellToString(child: Expression)
    extends UnaryExpression with H3TypeCheck {
  override protected def expectedTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "h3_cell_to_string"
  protected override def nullSafeEval(input: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      java.lang.Long.toHexString(input.asInstanceOf[Long]))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(java.lang.Long.toHexString($c))")
  override protected def withNewChildInternal(newChild: Expression): H3CellToString =
    copy(child = newChild)
}

/** h3_string_to_cell(str): parse the hex form back to a cell index. */
case class H3StringToCell(child: Expression)
    extends UnaryExpression with H3TypeCheck {
  override protected def expectedTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // malformed input -> null
  override def prettyName: String = "h3_string_to_cell"
  protected override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    try java.lang.Long.parseUnsignedLong(s, 16)
    catch { case _: NumberFormatException => null }
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |try {
         |  ${ev.value} = java.lang.Long.parseUnsignedLong($c.toString(), 16);
         |} catch (NumberFormatException e) {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): H3StringToCell =
    copy(child = newChild)
}

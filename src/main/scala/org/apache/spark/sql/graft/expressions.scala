package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import graft.index.CellIndex

/**
 * graft_cell_id(lon, lat, level) → long
 *
 * Z-order cell encoding as a native Catalyst expression with whole-stage
 * codegen (a static call into [[CellIndex.cellId]] — no boxing, no closure).
 * This sits in the innermost loop of the spatial join (one call per candidate
 * row at 10^12 scale), the one place custom codegen pays (SURVEY.md §4).
 * Lives under org.apache.spark.sql because ExpectsInputTypes/AbstractDataType
 * are private[sql].
 */
case class CellIdExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, DoubleType, IntegerType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cell_id"

  override protected def nullSafeEval(lon: Any, lat: Any, level: Any): Any =
    CellIndex.cellId(lon.asInstanceOf[Double], lat.asInstanceOf[Double], level.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lon, lat, level) =>
      s"graft.index.CellIndex.cellId($lon, $lat, $level)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): CellIdExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/**
 * graft_contains(ring array<double>, x, y) → boolean
 *
 * Exact point-in-polygon refine (non-zero winding rule, boundary inclusive)
 * over a flat [x0,y0,x1,y1,...] exterior-ring array. Codegen'd static call;
 * runs per-row only after the cell-cover prefilter has cut candidates.
 */
case class WindingContainsExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType, containsNull = false), DoubleType, DoubleType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_contains"

  override protected def nullSafeEval(ring: Any, x: Any, y: Any): Any =
    CellIndex.windingContains(
      ring.asInstanceOf[ArrayData].toDoubleArray(),
      x.asInstanceOf[Double], y.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (ring, x, y) =>
      s"graft.index.CellIndex.windingContains($ring.toDoubleArray(), $x, $y)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): WindingContainsExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

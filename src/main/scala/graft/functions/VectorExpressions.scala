package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two array<double> columns.
  *
  * Why a custom Catalyst Expression (SURVEY.md §4.3): the built-in
  * formulation `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is a
  * higher-order function — evaluated interpreted (HOFs never enter
  * whole-stage codegen) and allocating an intermediate array per row.
  * This expression compiles to a tight primitive loop inside the
  * generated code, no allocation, and keeps the surrounding projection
  * inside one WholeStageCodegen span.
  *
  * Semantics match the HOF fold exactly: left-to-right sequential
  * double accumulation over min(len(a), len(b)) elements — identical
  * IEEE result, so the DuckDB oracle (same ordered list_sum) still
  * hash-matches. Null arrays → null; elements are assumed non-null
  * (embedding vectors; enforced upstream).
  *
  * Lives under org.apache.spark.sql because AbstractDataType and
  * ExpressionUtils are private[sql] — the usual arrangement for Spark
  * extension libraries. User-facing API: graft.functions.
  * VectorExpressions.dotProduct.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        |double $acc = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $acc += $x.getDouble($i) * $y.getDouble($i);
        |}
        |${ev.value} = $acc;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column API for [[DotProduct]]. Inputs must be array<double>. */
  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

package org.apache.spark.sql.graftvec

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
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

/** Executor-side handle to a broadcast k-means codebook. The broadcast
  * ships the centroids once per executor (Torrent, not per-task
  * closure); centroid squared norms are derived lazily on first use per
  * JVM. Accessor *methods* (not fields) so generated Java can call
  * `ref.centroids()` / `ref.norms()` directly.
  */
final class CodebookRef(val bc: Broadcast[Array[Array[Double]]])
    extends Serializable {
  @transient private lazy val cbs: Array[Array[Double]] = bc.value
  @transient private lazy val nrm: Array[Double] = cbs.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }
  def centroids: Array[Array[Double]] = cbs
  def norms: Array[Double] = nrm
  override def toString: String = s"codebook[k=${bc.value.length}]"
}

/** Per-centroid distance scores for IVF assignment/probing:
  * out[j] = −2·x·c_j + ‖c_j‖² (the x-dependent part of ‖x − c_j‖², so
  * argmin over it is the nearest centroid; ‖x‖² is constant per row).
  *
  * Why a custom Expression (the IVF scale fix): building the k scores
  * as an `array()` of k literal-embedded dot products puts k × dim
  * doubles INTO the plan — janino's 64 KB method ceiling and
  * plan-compile time both grow with k, capping the codebook at toy
  * sizes. Here the codebook lives in a broadcast variable referenced
  * by ONE expression node: plan size is O(1) in k, the generated code
  * is a tight two-level primitive loop, and production k (1k–64k
  * cells) ships to executors once via Torrent broadcast.
  *
  * Determinism: left-to-right double accumulation per centroid over
  * min(len(x), dim) elements — bit-identical to the literal-array
  * [[DotProduct]] formulation it replaces. Null input array → null.
  */
case class CentroidScores(child: Expression, codebook: CodebookRef)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "centroid_scores"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val cbs = codebook.centroids
    val nms = codebook.norms
    val out = new Array[Double](cbs.length)
    var j = 0
    while (j < cbs.length) {
      val c = cbs(j)
      val m = math.min(x.numElements(), c.length)
      var acc = 0.0
      var i = 0
      while (i < m) { acc += x.getDouble(i) * c(i); i += 1 }
      out(j) = -2.0 * acc + nms(j)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebook", codebook, classOf[CodebookRef].getName)
    nullSafeCodeGen(ctx, ev, x => {
      val cbs = ctx.freshName("cbs")
      val nms = ctx.freshName("nms")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      s"""
        |double[][] $cbs = $ref.centroids();
        |double[] $nms = $ref.norms();
        |double[] $out = new double[$cbs.length];
        |for (int $j = 0; $j < $cbs.length; $j++) {
        |  double[] $c = $cbs[$j];
        |  int $m = java.lang.Math.min($x.numElements(), $c.length);
        |  double $acc = 0.0;
        |  for (int $i = 0; $i < $m; $i++) { $acc += $x.getDouble($i) * $c[$i]; }
        |  $out[$j] = -2.0 * $acc + $nms[$j];
        |}
        |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column API for [[DotProduct]]. Inputs must be array<double>. */
  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column API for [[CentroidScores]]. Input must be array<double>. */
  def centroidScores(x: Column, codebook: CodebookRef): Column =
    ExpressionUtils.column(
      CentroidScores(ExpressionUtils.expression(x), codebook))
}

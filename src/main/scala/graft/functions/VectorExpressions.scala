package org.apache.spark.sql.graftvec

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}

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

/** Token-level longest common prefix of two space-joined token
  * strings: how many complete tokens the two sequences share from the
  * start. The exact-span dedup hot path ([[graft.operators.Dedup]]
  * `exactRunLengths`) computes this between window-adjacent suffix
  * extensions — with this expression the shuffle carries ONLY the
  * joined string (no parallel array column) and the comparison is one
  * codegen'd byte loop instead of an interpreted
  * zip_with/array_position HOF chain.
  *
  * Byte-level is correct for any UTF-8: a common byte prefix is a
  * common char prefix, the separator 0x20 never occurs inside a
  * multi-byte char, and the token count only reads separator bytes.
  * A partial trailing token doesn't count; equal strings count all
  * tokens; two empty strings share zero tokens. Null → null.
  */
case class TokenLcp(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_lcp"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val y = b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val xn = x.numBytes(); val yn = y.numBytes()
    if (xn == 0 && yn == 0) return 0
    val n = math.min(xn, yn)
    var i = 0
    while (i < n && x.getByte(i) == y.getByte(i)) i += 1
    var t = 0; var j = 0
    while (j < i) { if (x.getByte(j) == 0x20) t += 1; j += 1 }
    val lastWhole = (i == xn && (i == yn || y.getByte(i) == 0x20)) ||
      (i == yn && x.getByte(i) == 0x20)
    if (lastWhole) t + 1 else t
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val xn = ctx.freshName("xn"); val yn = ctx.freshName("yn")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val t = ctx.freshName("t"); val j = ctx.freshName("j")
      val whole = ctx.freshName("whole")
      s"""
        |int $xn = $x.numBytes(); int $yn = $y.numBytes();
        |if ($xn == 0 && $yn == 0) { ${ev.value} = 0; } else {
        |  int $n = java.lang.Math.min($xn, $yn);
        |  int $i = 0;
        |  while ($i < $n && $x.getByte($i) == $y.getByte($i)) $i++;
        |  int $t = 0;
        |  for (int $j = 0; $j < $i; $j++) { if ($x.getByte($j) == (byte) 0x20) $t++; }
        |  // Janino mis-parses a leading parenthesized boolean in
        |  // `(A && (B || C)) || (D && E)` as a cast ("is not a type"),
        |  // which would silently drop this expression out of codegen —
        |  // so the disjunction is sequenced as plain ifs instead.
        |  boolean $whole = false;
        |  if ($i == $xn) { $whole = $i == $yn || $y.getByte($i) == (byte) 0x20; }
        |  if (!$whole && $i == $yn && $i < $xn) { $whole = $x.getByte($i) == (byte) 0x20; }
        |  ${ev.value} = $whole ? $t + 1 : $t;
        |}
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

/** Executor-side handle to the m per-subspace PQ codebooks
  * (m × ksub × dsub doubles, Torrent broadcast — same rationale as
  * [[CodebookRef]]: values never enter the expression tree, plan is
  * O(1) in m·ksub). Norms derived lazily per JVM. */
final class PqRef(val bc: Broadcast[Array[Array[Array[Double]]]])
    extends Serializable {
  @transient private lazy val bks: Array[Array[Array[Double]]] = bc.value
  @transient private lazy val nrm: Array[Array[Double]] = bks.map(_.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  })
  def books: Array[Array[Array[Double]]] = bks
  def norms: Array[Array[Double]] = nrm
  override def toString: String =
    s"pq[m=${bc.value.length},ksub=${bc.value.headOption.map(_.length).getOrElse(0)}]"
}

/** PQ encoding: out[j] = argmin_c ‖x_sub_j − cb[j][c]‖² as the m-byte
  * (stored int) code word — the 100 TB vector layout: m small ints per
  * vector instead of dim doubles. First minimum wins (deterministic).
  * Subvector j covers x[j·dsub … (j+1)·dsub). */
case class PqEncode(child: Expression, pq: PqRef)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val bks = pq.books
    val nms = pq.norms
    val out = new Array[Int](bks.length)
    var off = 0
    var j = 0
    while (j < bks.length) {
      val cands = bks(j)
      var best = 0
      var bestScore = Double.PositiveInfinity
      var c = 0
      while (c < cands.length) {
        val cv = cands(c)
        var acc = 0.0
        var i = 0
        val m = math.min(cv.length, x.numElements() - off)
        while (i < m) { acc += x.getDouble(off + i) * cv(i); i += 1 }
        val s = -2.0 * acc + nms(j)(c)
        if (s < bestScore) { bestScore = s; best = c }
        c += 1
      }
      out(j) = best
      off += cands.headOption.map(_.length).getOrElse(0)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pq", pq, classOf[PqRef].getName)
    nullSafeCodeGen(ctx, ev, x => {
      val bks = ctx.freshName("bks")
      val nms = ctx.freshName("nms")
      val out = ctx.freshName("out")
      val off = ctx.freshName("off")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val cands = ctx.freshName("cands")
      val cv = ctx.freshName("cv")
      s"""
        |double[][][] $bks = $ref.books();
        |double[][] $nms = $ref.norms();
        |int[] $out = new int[$bks.length];
        |int $off = 0;
        |for (int $j = 0; $j < $bks.length; $j++) {
        |  double[][] $cands = $bks[$j];
        |  int $best = 0;
        |  double $bestScore = Double.POSITIVE_INFINITY;
        |  for (int $c = 0; $c < $cands.length; $c++) {
        |    double[] $cv = $cands[$c];
        |    double $acc = 0.0;
        |    int $m = java.lang.Math.min($cv.length, $x.numElements() - $off);
        |    for (int $i = 0; $i < $m; $i++) { $acc += $x.getDouble($off + $i) * $cv[$i]; }
        |    double $s = -2.0 * $acc + $nms[$j][$c];
        |    if ($s < $bestScore) { $bestScore = $s; $best = $c; }
        |  }
        |  $out[$j] = $best;
        |  $off += $cands.length == 0 ? 0 : $cands[0].length;
        |}
        |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-query ADC lookup table over the PQ codebooks, flattened:
  * lut[j·ksub + c] = x_sub_j · cb[j][c]. Computed ONCE per query row;
  * scoring a corpus code word is then m array reads ([[PqAdc]]). */
case class PqLut(child: Expression, pq: PqRef)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_lut"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val bks = pq.books
    val ksub = if (bks.isEmpty) 0 else bks(0).length
    val out = new Array[Double](bks.length * ksub)
    var off = 0
    var j = 0
    while (j < bks.length) {
      val cands = bks(j)
      var c = 0
      while (c < cands.length) {
        val cv = cands(c)
        var acc = 0.0
        var i = 0
        val m = math.min(cv.length, x.numElements() - off)
        while (i < m) { acc += x.getDouble(off + i) * cv(i); i += 1 }
        out(j * ksub + c) = acc
        c += 1
      }
      off += cands.headOption.map(_.length).getOrElse(0)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pq", pq, classOf[PqRef].getName)
    nullSafeCodeGen(ctx, ev, x => {
      val bks = ctx.freshName("bks")
      val ksub = ctx.freshName("ksub")
      val out = ctx.freshName("out")
      val off = ctx.freshName("off")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val cands = ctx.freshName("cands")
      val cv = ctx.freshName("cv")
      s"""
        |double[][][] $bks = $ref.books();
        |int $ksub = $bks.length == 0 ? 0 : $bks[0].length;
        |double[] $out = new double[$bks.length * $ksub];
        |int $off = 0;
        |for (int $j = 0; $j < $bks.length; $j++) {
        |  double[][] $cands = $bks[$j];
        |  for (int $c = 0; $c < $cands.length; $c++) {
        |    double[] $cv = $cands[$c];
        |    double $acc = 0.0;
        |    int $m = java.lang.Math.min($cv.length, $x.numElements() - $off);
        |    for (int $i = 0; $i < $m; $i++) { $acc += $x.getDouble($off + $i) * $cv[$i]; }
        |    $out[$j * $ksub + $c] = $acc;
        |  }
        |  $off += $cands.length == 0 ? 0 : $cands[0].length;
        |}
        |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC score: Σ_j lut[j·ksub + codes[j]] ≈ x · reconstruction(codes).
  * The hot inner loop of the probe join — m array reads per scored
  * pair, no dim-length work at all. */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.IntegerType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m == 0) 0.0
    else {
      val ksub = lut.numElements() / m
      var acc = 0.0
      var j = 0
      while (j < m) { acc += lut.getDouble(j * ksub + codes.getInt(j)); j += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val ksub = ctx.freshName("ksub")
      val acc = ctx.freshName("acc")
      s"""
        |int $m = $codes.numElements();
        |double $acc = 0.0;
        |if ($m > 0) {
        |  int $ksub = $lut.numElements() / $m;
        |  for (int $j = 0; $j < $m; $j++) {
        |    $acc += $lut.getDouble($j * $ksub + $codes.getInt($j));
        |  }
        |}
        |${ev.value} = $acc;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Residual x − c_cell over the coarse codebook: what PQ encodes in
  * classic IVF-PQ (residuals are smaller than raw vectors, so the same
  * ksub spends its precision where it matters). */
case class CentroidResidual(left: Expression, right: Expression,
    codebook: CodebookRef)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), org.apache.spark.sql.types.IntegerType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "centroid_residual"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val c = codebook.centroids(b.asInstanceOf[Int])
    val out = new Array[Double](x.numElements())
    var i = 0
    while (i < out.length) {
      out(i) = x.getDouble(i) - (if (i < c.length) c(i) else 0.0)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebook", codebook, classOf[CodebookRef].getName)
    nullSafeCodeGen(ctx, ev, (x, cell) => {
      val c = ctx.freshName("c")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
        |double[] $c = $ref.centroids()[$cell];
        |double[] $out = new double[$x.numElements()];
        |for (int $i = 0; $i < $out.length; $i++) {
        |  $out[$i] = $x.getDouble($i) - ($i < $c.length ? $c[$i] : 0.0);
        |}
        |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Per-centroid inner products x · c_j (the exact coarse term of the
  * residual ADC decomposition q·x ≈ q·c_cell + q·r̂). */
case class CentroidDots(child: Expression, codebook: CodebookRef)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "centroid_dots"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val cbs = codebook.centroids
    val out = new Array[Double](cbs.length)
    var j = 0
    while (j < cbs.length) {
      val c = cbs(j)
      val m = math.min(x.numElements(), c.length)
      var acc = 0.0
      var i = 0
      while (i < m) { acc += x.getDouble(i) * c(i); i += 1 }
      out(j) = acc
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebook", codebook, classOf[CodebookRef].getName)
    nullSafeCodeGen(ctx, ev, x => {
      val cbs = ctx.freshName("cbs")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      s"""
        |double[][] $cbs = $ref.centroids();
        |double[] $out = new double[$cbs.length];
        |for (int $j = 0; $j < $cbs.length; $j++) {
        |  double[] $c = $cbs[$j];
        |  int $m = java.lang.Math.min($x.numElements(), $c.length);
        |  double $acc = 0.0;
        |  for (int $i = 0; $i < $m; $i++) { $acc += $x.getDouble($i) * $c[$i]; }
        |  $out[$j] = $acc;
        |}
        |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Argmin-by-distance seed id for the two-level (coarse→fine) IVF
  * assignment: given a row vector x and the fine-seed list of the
  * row's COARSE cell — an array<struct<sid:long, se:array<double>,
  * se2:double>> where se2 = ‖se‖² precomputed with the same
  * left-assoc fold — returns the sid minimizing −2·x·se + se2 (the
  * x-dependent part of ‖x − se‖²). First minimum wins, so with the
  * list sorted by sid ascending, ties resolve to the smallest sid —
  * the rule the DuckDB oracle replays with ORDER BY s ASC, sid ASC.
  *
  * Why a custom Expression (same rationale as [[CentroidScores]]): the
  * seed list arrives per-row from a per-coarse-cell join, so a
  * broadcast codebook handle cannot serve it, and the built-in
  * `aggregate` HOF formulation is interpreted per element with a
  * nested fold per seed. This is one codegen'd two-level primitive
  * loop; the surrounding projection stays in WholeStageCodegen.
  *
  * Null or EMPTY seed list → null (caller coalesces a fallback so a
  * float-degenerate empty coarse cell degrades to a singleton instead
  * of dropping the row). */
case class NearestSeedId(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_seed_id"

  override def nullSafeEval(xAny: Any, seedsAny: Any): Any = {
    val x = xAny.asInstanceOf[ArrayData]
    val seeds = seedsAny.asInstanceOf[ArrayData]
    val n = seeds.numElements()
    if (n == 0) return null
    var best = 0.0
    var bestSid = 0L
    var found = false
    var j = 0
    while (j < n) {
      val row = seeds.getStruct(j, 3)
      val se = row.getArray(1)
      val m = math.min(x.numElements(), se.numElements())
      var acc = 0.0
      var i = 0
      while (i < m) { acc += x.getDouble(i) * se.getDouble(i); i += 1 }
      val s = -2.0 * acc + row.getDouble(2)
      if (!found || s < best) { best = s; bestSid = row.getLong(0); found = true }
      j += 1
    }
    bestSid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, seeds) => {
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestSid = ctx.freshName("bestSid")
      val found = ctx.freshName("found")
      val row = ctx.freshName("row")
      val se = ctx.freshName("se")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      s"""
        |int $n = $seeds.numElements();
        |if ($n == 0) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $best = 0.0;
        |  long $bestSid = 0L;
        |  boolean $found = false;
        |  for (int $j = 0; $j < $n; $j++) {
        |    org.apache.spark.sql.catalyst.InternalRow $row = $seeds.getStruct($j, 3);
        |    org.apache.spark.sql.catalyst.util.ArrayData $se = $row.getArray(1);
        |    int $m = java.lang.Math.min($x.numElements(), $se.numElements());
        |    double $acc = 0.0;
        |    for (int $i = 0; $i < $m; $i++) { $acc += $x.getDouble($i) * $se.getDouble($i); }
        |    double $s = -2.0 * $acc + $row.getDouble(2);
        |    if (!$found || $s < $best) { $best = $s; $bestSid = $row.getLong(0); $found = true; }
        |  }
        |  ${ev.value} = $bestSid;
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Executor-side handle to a broadcast linear-model weight vector (the
  * fastText-style hashed bag-of-words classifier): the weights ride a
  * Torrent broadcast, never the expression tree — the plan is O(1) in
  * the vocabulary dimension (same rationale as [[CodebookRef]]). */
final class WeightsRef(val bc: Broadcast[Array[Double]]) extends Serializable {
  @transient private lazy val w: Array[Double] = bc.value
  def weights: Array[Double] = w
  override def toString: String = s"weights[dim=${bc.value.length}]"
}

/** Σ weights[buckets[i]] over an array<long> of hashed-token buckets —
  * the dot product of a hashed bag-of-words with a broadcast weight
  * vector (bucket multiplicity IS the term count). Left-to-right
  * accumulation in array order, so the DuckDB oracle's ordered
  * list_sum is bit-identical. Out-of-range buckets contribute 0
  * (defensive — producers bucket mod dim). Null array → null. */
case class WeightSum(child: Expression, weights: WeightsRef)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "weight_sum"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val w = weights.weights
    var acc = 0.0
    var i = 0
    while (i < xs.numElements()) {
      // Null elements contribute zero weight; getLong on a null slot is undefined.
      if (!xs.isNullAt(i)) {
        val b = xs.getLong(i)
        if (b >= 0 && b < w.length) acc += w(b.toInt)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("weights", weights, classOf[WeightsRef].getName)
    nullSafeCodeGen(ctx, ev, xs => {
      val w = ctx.freshName("w")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      s"""
        |double[] $w = $ref.weights();
        |double $acc = 0.0;
        |for (int $i = 0; $i < $xs.numElements(); $i++) {
        |  if (!$xs.isNullAt($i)) {
        |    long $b = $xs.getLong($i);
        |    if ($b >= 0 && $b < $w.length) { $acc += $w[(int) $b]; }
        |  }
        |}
        |${ev.value} = $acc;
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Executor-side handle to a broadcast Bloom filter
  * (`org.apache.spark.util.sketch.BloomFilter` — Spark's public sketch,
  * Murmur3 with a fixed seed, so probes are deterministic across runs
  * and partitionings). Same plan-size rationale as [[CodebookRef]]:
  * the filter bits ride a Torrent broadcast, never the expression
  * tree. */
final class BloomRef(val bc: Broadcast[org.apache.spark.util.sketch.BloomFilter])
    extends Serializable {
  @transient private lazy val b: org.apache.spark.util.sketch.BloomFilter = bc.value
  def bloom: org.apache.spark.util.sketch.BloomFilter = b
  override def toString: String = s"bloom[${bc.value.bitSize()} bits]"
}

/** Count of array<string> elements the broadcast Bloom filter MIGHT
  * contain. The whole membership pass is one narrow codegen'd loop per
  * row — no explode, no shuffle, no join — which is the point of the
  * Bloom variant: probing is local even when the reference set itself
  * is distributed. Null array → null. */
case class BloomHitCount(child: Expression, bloom: BloomRef)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_hit_count"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val bf = bloom.bloom
    var c = 0
    var i = 0
    while (i < xs.numElements()) {
      // Null elements are never a hit; getUTF8String on a null slot NPEs.
      if (!xs.isNullAt(i) && bf.mightContainString(xs.getUTF8String(i).toString)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomRef].getName)
    nullSafeCodeGen(ctx, ev, xs => {
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      s"""
        |int $c = 0;
        |for (int $i = 0; $i < $xs.numElements(); $i++) {
        |  if (!$xs.isNullAt($i)
        |      && $ref.bloom().mightContainString($xs.getUTF8String($i).toString())) $c++;
        |}
        |${ev.value} = $c;
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Driver-built Aho–Corasick automaton over literal patterns: classic
  * trie + BFS failure links with cumulative output counts, so ONE
  * left-to-right pass over a document counts every occurrence of
  * every pattern (including overlaps and patterns contained in other
  * patterns) — O(len(text)) regardless of how many thousand terms the
  * blocklist holds, vs O(len × terms) for per-term scanning. */
final class AcAutomaton(val patterns: Seq[String]) extends Serializable {
  private val children =
    scala.collection.mutable.ArrayBuffer(scala.collection.mutable.Map.empty[Char, Int])
  private val out = scala.collection.mutable.ArrayBuffer(0)
  patterns.filter(_.nonEmpty).foreach { p =>
    var node = 0
    p.foreach { ch =>
      node = children(node).getOrElseUpdate(ch, {
        children += scala.collection.mutable.Map.empty[Char, Int]
        out += 0
        children.size - 1
      })
    }
    out(node) += 1
  }
  private val fail = new Array[Int](children.size)
  locally {
    val queue = scala.collection.mutable.Queue.empty[Int]
    children(0).valuesIterator.foreach(queue.enqueue)
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (ch, v) =>
        queue.enqueue(v)
        var f = fail(u)
        while (f > 0 && !children(f).contains(ch)) f = fail(f)
        val cand = children(f).getOrElse(ch, 0)
        fail(v) = if (cand != v) cand else 0
        out(v) += out(fail(v)) // dictionary-suffix matches count too
      }
    }
  }

  /** Total pattern occurrences in `s` (every pattern, every position). */
  def countMatches(s: String): Int = {
    var node = 0
    var total = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      while (node > 0 && !children(node).contains(ch)) node = fail(node)
      node = children(node).getOrElse(ch, 0)
      total += out(node)
      i += 1
    }
    total
  }
}

/** Executor-side handle to a broadcast [[AcAutomaton]] — the
  * blocklist rides the broadcast, never the plan (O(1) plan size in
  * the term count, the [[CodebookRef]] rationale). */
final class AcRef(val bc: Broadcast[AcAutomaton]) extends Serializable {
  @transient private lazy val a: AcAutomaton = bc.value
  def automaton: AcAutomaton = a
  override def toString: String = s"ac[${bc.value.patterns.size} terms]"
}

/** Occurrence count of every blocklist pattern in a string column via
  * one broadcast-automaton pass per row. Null string → null. */
case class AcHitCount(child: Expression, ac: AcRef)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ac_hit_count"

  override def nullSafeEval(input: Any): Any =
    ac.automaton.countMatches(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ac", ac, classOf[AcRef].getName)
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = $ref.automaton().countMatches($x.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** JVM-side text normalization helper. A top-level object with no
  * companion class, so Scala emits STATIC forwarders — generated Java
  * calls `TextNorm.nfcStrip(s)` directly. */
object TextNorm {
  /** Unicode NFC normalization + supplementary-plane (non-BMP) strip.
    * NFC collapses composed/decomposed spellings ("é" as one code
    * point vs "e"+combining-acute) to one canonical form, so
    * fingerprints/grams/edit-distances agree across sources that
    * serialize differently. Astral code points (emoji, rare CJK
    * extensions) are stripped because engines disagree on their UNIT
    * (UTF-8 bytes vs UTF-16 units vs code points) in length/distance
    * functions — removing them is the documented, deterministic way to
    * make cross-engine text metrics comparable. */
  def nfcStrip(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    if (s == null) return null
    val str = s.toString
    val nfc =
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) str
      else java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
    var hasAstral = false
    var i = 0
    while (i < nfc.length && !hasAstral) {
      if (Character.isSurrogate(nfc.charAt(i))) hasAstral = true
      i += 1
    }
    val out = if (!hasAstral) nfc else {
      val sb = new java.lang.StringBuilder(nfc.length)
      var j = 0
      while (j < nfc.length) {
        val c = nfc.charAt(j)
        if (Character.isHighSurrogate(c) && j + 1 < nfc.length &&
          Character.isLowSurrogate(nfc.charAt(j + 1))) j += 2
        else if (Character.isSurrogate(c)) j += 1 // unpaired: drop too
        else { sb.append(c); j += 1 }
      }
      sb.toString
    }
    if (out eq str) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(out)
  }
}

/** NFC-normalize + astral-strip a string column (see
  * [[TextNorm.nfcStrip]]); the preprocessing that upgrades the
  * exact-span / edit-distance cross-engine ASCII caveat to "any
  * NFC-normalizable BMP text". Codegen is a single static call, so
  * the surrounding projection stays in one WholeStageCodegen span. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    TextNorm.nfcStrip(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftvec.TextNorm.nfcStrip($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static Jaro–Winkler kernel, shared by interpreted eval and the
  * generated code (codegen emits one static call — the NfcNormalize
  * arrangement). Byte-level over the UTF-8 encoding: exact parity
  * with DuckDB / RapidFuzz on ASCII inputs (the record-linkage
  * queries lowercase ASCII part names first); on multi-byte UTF-8
  * the match unit and window become bytes, which is still a valid
  * similarity but not the codepoint-level figure — callers that need
  * that should NFC-fold to ASCII upstream.
  *
  * Pinned against DuckDB's `jaro_winkler_similarity` by 60k-pair
  * fuzz (JaroWinklerSpec replays a deterministic slice): the three
  * non-obvious conventions that make the figures bit-identical are
  * (1) transpositions are FLOOR-halved (t = mismatches/2 in integer
  * division — the common "t/2.0" reading diverges on odd counts),
  * (2) the Winkler prefix boost applies only when jaro > 0.7
  * strictly, and (3) either input empty → 0.0, including both-empty
  * (NOT 1.0). Match window = max(0, max(len)/2 − 1), prefix ≤ 4,
  * scale 0.1 — the standard constants.
  */
object StringSim {
  def jaroWinkler(au: org.apache.spark.unsafe.types.UTF8String,
      bu: org.apache.spark.unsafe.types.UTF8String): Double = {
    val l1 = au.numBytes(); val l2 = bu.numBytes()
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1); val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var unmatched = true
      while (j <= hi && unmatched) {
        if (!m2(j) && au.getByte(i) == bu.getByte(j)) {
          m1(i) = true; m2(j) = true; m += 1; unmatched = false
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0; var trans = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (au.getByte(i) != bu.getByte(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - trans / 2) / md) / 3.0
    if (jaro > 0.7) {
      val maxL = math.min(4, math.min(l1, l2))
      var l = 0
      while (l < maxL && au.getByte(l) == bu.getByte(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

/** Codegen'd Jaro–Winkler similarity of two strings — the
  * record-linkage scorer ([[StringSim.jaroWinkler]] has the full
  * semantics + DuckDB-parity contract). A custom Expression for the
  * same reason as [[DotProduct]]: the scorer sits inside a blocked
  * pair join's projection, and a static-call expression keeps that
  * projection in one WholeStageCodegen span (no UDF deserialization,
  * no interpreted fallback). */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    StringSim.jaroWinkler(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graftvec.StringSim.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Order-preserving bigint key for a double column: the IEEE-754 bit
  * pattern sign-folded (`bits XOR ((bits >> 63) | Long.MinValue)`) so
  * that UNSIGNED comparison of the key — equivalently, lexicographic
  * comparison of its fixed-width hex rendering — orders exactly like
  * the doubles themselves, negatives included. This is what lets the
  * two-phase prefix-rank machinery ([[graft.operators.Packing]]
  * `withCumulativeSum`, an RDD `sortByKey` that scales like a sort)
  * rank-select raw DOUBLE columns (exact medians, MADs, percentile
  * rows) without a per-key window over raw rows: the global sort key
  * is `concat(group, hex(key), tiebreak)` and per-group rank = global
  * cumulative count − group offset.
  *
  * The mapping is a strictly monotone bijection on non-NaN doubles, so
  * selection-by-rank through it picks exactly the row a plain
  * `ORDER BY value` picks — the DuckDB oracle needs no counterpart
  * function. Edge pins: −0.0 keys BELOW +0.0 (engines treating them
  * equal break such ties by the caller's tiebreak column instead —
  * only distinguishable if a corpus carries both at a selected rank);
  * NaN keys above +∞ (deterministic, but keep NaNs filtered upstream
  * when the oracle must agree). Null → null. */
case class DoubleSortKey(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "double_sort_key"

  override def nullSafeEval(x: Any): Any = {
    val bits = java.lang.Double.doubleToLongBits(x.asInstanceOf[Double])
    bits ^ ((bits >> 63) | java.lang.Long.MIN_VALUE)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val bits = ctx.freshName("bits")
      s"""
        |long $bits = java.lang.Double.doubleToLongBits($x);
        |${ev.value} = $bits ^ (($bits >> 63) | java.lang.Long.MIN_VALUE);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column API for [[DotProduct]]. Inputs must be array<double>. */
  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column API for [[TokenLcp]]: whole-token common prefix of two
    * space-joined strings. */
  def tokenLcp(a: Column, b: Column): Column =
    ExpressionUtils.column(
      TokenLcp(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column API for [[CentroidScores]]. Input must be array<double>. */
  def centroidScores(x: Column, codebook: CodebookRef): Column =
    ExpressionUtils.column(
      CentroidScores(ExpressionUtils.expression(x), codebook))

  /** Column API for [[CentroidDots]]. Input must be array<double>. */
  def centroidDots(x: Column, codebook: CodebookRef): Column =
    ExpressionUtils.column(
      CentroidDots(ExpressionUtils.expression(x), codebook))

  /** Column API for [[CentroidResidual]]: x − centroid[cell]. */
  def centroidResidual(x: Column, cell: Column, codebook: CodebookRef): Column =
    ExpressionUtils.column(CentroidResidual(
      ExpressionUtils.expression(x), ExpressionUtils.expression(cell), codebook))

  /** Column API for [[PqEncode]]. Input must be array<double>. */
  def pqEncode(x: Column, pq: PqRef): Column =
    ExpressionUtils.column(PqEncode(ExpressionUtils.expression(x), pq))

  /** Column API for [[PqLut]]. Input must be array<double>. */
  def pqLut(x: Column, pq: PqRef): Column =
    ExpressionUtils.column(PqLut(ExpressionUtils.expression(x), pq))

  /** Column API for [[PqAdc]]: codes (array<int>) × lut (array<double>). */
  def pqAdc(codes: Column, lut: Column): Column =
    ExpressionUtils.column(
      PqAdc(ExpressionUtils.expression(codes), ExpressionUtils.expression(lut)))

  /** Column API for [[NearestSeedId]]: x (array<double>) ×
    * seeds (array<struct<sid:long, se:array<double>, se2:double>>). */
  def nearestSeedId(x: Column, seeds: Column): Column =
    ExpressionUtils.column(NearestSeedId(
      ExpressionUtils.expression(x), ExpressionUtils.expression(seeds)))

  /** Column API for [[WeightSum]]: buckets (array<long>) × broadcast
    * weight vector. */
  def weightSum(buckets: Column, weights: WeightsRef): Column =
    ExpressionUtils.column(WeightSum(ExpressionUtils.expression(buckets), weights))

  /** Column API for [[BloomHitCount]]: array<string> × broadcast
    * Bloom filter. */
  def bloomHitCount(values: Column, bloom: BloomRef): Column =
    ExpressionUtils.column(BloomHitCount(ExpressionUtils.expression(values), bloom))

  /** Column API for [[AcHitCount]]: string × broadcast Aho–Corasick
    * blocklist automaton. */
  def acHitCount(text: Column, ac: AcRef): Column =
    ExpressionUtils.column(AcHitCount(ExpressionUtils.expression(text), ac))

  /** Column API for [[NfcNormalize]]: NFC + astral strip. */
  def nfcNormalize(text: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(text)))

  /** Column API for [[JaroWinkler]]: DuckDB-parity record-linkage
    * similarity (see [[StringSim.jaroWinkler]] for the pinned
    * conventions). */
  def jaroWinkler(a: Column, b: Column): Column =
    ExpressionUtils.column(
      JaroWinkler(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column API for [[DoubleSortKey]]: order-preserving bigint key of
    * a double (unsigned/hex-lexicographic order = double order). */
  def doubleSortKey(x: Column): Column =
    ExpressionUtils.column(DoubleSortKey(ExpressionUtils.expression(x)))
}

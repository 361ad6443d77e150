package org.apache.spark.sql.graftagg

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable quantile sketch (KLL compactor ladder, Karnin–Lang–
  * Liberty FOCS'16 — public literature) as the engine's THIRD native
  * `TypedImperativeAggregate`, with the buffer shape the first two
  * don't exercise: a MULTI-LEVEL variable-size structure (log(n/k)
  * compactor levels of ≤ k longs each) whose merge is a level-wise
  * concatenation + cascading compaction.
  *
  * Determinism stance: the classic KLL compactor keeps a RANDOM
  * parity; this implementation alternates parity deterministically
  * per compactor (valid worst-case bounds, reproducible runs — the
  * repo-wide requirement). The price is the bias-cancellation
  * argument: we carry the WORST-CASE error, not the randomized
  * expectation. Every compaction of level l (weight w = 2^l) perturbs
  * any rank estimate by at most w, so the sketch maintains
  * `errAcc = Σ w_l per compaction` as an exact self-certified bound:
  * for every value v, |est_rank(v) − true_rank(v)| ≤ errAcc. A
  * quantile select at target rank r returns the first stored value
  * whose weighted cumulative reaches r, overshooting by less than the
  * largest level weight — so the reported `err` field
  * (errAcc + 2^(L−1)) bounds |true_rank(answer) − r|.
  *
  * Guarantee arithmetic: items ever reaching level l ≈ n/2^l, so
  * compactions_l ≈ n/(k·2^l) and errAcc ≈ log2(n/k)·n/k — relative
  * rank error ≈ log2(n/k)/k. At k = 2048: 0.6 % at n = 6·10⁶ and
  * still 1.4 % at n = 10¹² (a 100 TB column) — the bound GROWS ONLY
  * LOGARITHMICALLY, which is why the sketch survives scale. The
  * shuffle ships ≤ k·log(n/k) longs per group (≈ 190 KB at n = 10¹²)
  * instead of the column.
  *
  * Like Misra–Gries, the stored VALUES depend on partition merge
  * order while the GUARANTEES hold for every order — so consumers
  * (q279) emit certified facts (rank error ≤ bound), never raw
  * sketch internals, keeping driver hashes deterministic.
  *
  * eval() renders "n=..,err=..,q<phi_ppm>=<value>,..." for the φ list
  * given as the third (literal array<double>) argument — scalar,
  * `str_to_map`-friendly, same style as `graft_mg`. Registered as SQL
  * function `graft_kll` by [[graft.GraftExtensions]]; Scala API
  * [[KllAgg.graftKll]].
  */
case class KllAgg(
    child: Expression,
    kExpr: Expression,
    phisExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllSketch]
  with ExpectsInputTypes with TernaryLike[Expression] {

  private lazy val k: Int = kExpr.eval(null) match {
    case i: Int if i >= 8 && i % 2 == 0 => i
    case other => throw new IllegalArgumentException(
      s"graft_kll k must be a literal even int >= 8, got $other")
  }

  private lazy val phis: Array[Double] = phisExpr.eval(null) match {
    case a: ArrayData =>
      val ds = a.toDoubleArray()
      require(ds.nonEmpty && ds.forall(p => p > 0.0 && p <= 1.0),
        "graft_kll phis must be in (0, 1]")
      ds
    case other => throw new IllegalArgumentException(
      s"graft_kll phis must be a literal array<double>, got $other")
  }

  override def first: Expression = child
  override def second: Expression = kExpr
  override def third: Expression = phisExpr
  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, IntegerType, ArrayType(DoubleType))
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll"

  override def createAggregationBuffer(): KllSketch = new KllSketch(k)

  override def update(buf: KllSketch, input: InternalRow): KllSketch = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KllSketch, other: KllSketch): KllSketch = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: KllSketch): Any = {
    val sb = new java.lang.StringBuilder
    sb.append("n=").append(buf.n).append(",err=").append(buf.errClaim)
    phis.foreach { p =>
      sb.append(",q").append(math.round(p * 1e6))
        .append('=').append(if (buf.n == 0) 0L else buf.quantile(p))
    }
    UTF8String.fromString(sb.toString)
  }

  override def serialize(buf: KllSketch): Array[Byte] = buf.toBytes

  override def deserialize(storage: Array[Byte]): KllSketch =
    KllSketch.fromBytes(storage)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): KllAgg =
    copy(child = newFirst, kExpr = newSecond, phisExpr = newThird)
}

/** The compactor ladder. levels(l) holds items of weight 2^l; level
  * contents are unsorted between compactions (compaction sorts). */
final class KllSketch(val k: Int) {
  var n: Long = 0L
  var errAcc: Long = 0L
  var flip: Boolean = false
  val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Long]] =
    mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Long])

  def add(v: Long): Unit = {
    levels(0) += v
    n += 1
    if (levels(0).length >= k) compactFrom(0)
  }

  /** Compact every level ≥ l0 that is at/over capacity, bottom-up.
    * A compaction sorts the level, promotes every other element (the
    * parity alternates per compaction — deterministic), and leaves an
    * odd leftover in place. Worst-case rank perturbation = the level
    * weight, accumulated into errAcc. */
  private def compactFrom(l0: Int): Unit = {
    var l = l0
    while (l < levels.length && levels(l).length >= k) {
      val lev = levels(l)
      val sorted = lev.toArray
      java.util.Arrays.sort(sorted)
      val m = sorted.length - (sorted.length % 2)
      val start = if (flip) 0 else 1
      flip = !flip
      if (levels.length == l + 1)
        levels += mutable.ArrayBuffer.empty[Long]
      val up = levels(l + 1)
      var i = start
      while (i < m) { up += sorted(i); i += 2 }
      lev.clear()
      if (m < sorted.length) lev += sorted(m) // odd leftover
      errAcc += 1L << l
      l += 1
    }
  }

  def mergeIn(other: KllSketch): Unit = {
    require(other.k == k, "merging sketches with different k")
    n += other.n
    errAcc += other.errAcc
    while (levels.length < other.levels.length)
      levels += mutable.ArrayBuffer.empty[Long]
    var l = 0
    while (l < other.levels.length) {
      levels(l) ++= other.levels(l)
      l += 1
    }
    // bottom-up sweep: compactFrom(i) cascades upward while levels
    // overflow, and promotions only ever land at >= i+1, which this
    // loop has not passed yet — so one ascending sweep settles every
    // overflow the concatenation created
    var i = 0
    while (i < levels.length) {
      if (levels(i).length >= k) compactFrom(i)
      i += 1
    }
  }

  /** Upper bound on |true_rank(answer) − target_rank| for quantile(). */
  def errClaim: Long =
    errAcc + (1L << math.max(0, levels.length - 1))

  /** Smallest stored value whose weighted cumulative count reaches
    * ceil(phi * n). */
  def quantile(phi: Double): Long = {
    val target = math.max(1L, math.ceil(phi * n).toLong)
    val all = mutable.ArrayBuffer.empty[(Long, Long)]
    var l = 0
    while (l < levels.length) {
      val w = 1L << l
      levels(l).foreach(v => all += ((v, w)))
      l += 1
    }
    val sorted = all.sortBy(_._1)
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum >= target) return sorted(i)._1
      i += 1
    }
    if (sorted.nonEmpty) sorted.last._1 else 0L
  }

  /** Weighted count of stored items ≤ v (the sketch's rank estimate;
    * |est − true| ≤ errAcc). */
  def estRank(v: Long): Long = {
    var r = 0L
    var l = 0
    while (l < levels.length) {
      val w = 1L << l
      levels(l).foreach(x => if (x <= v) r += w)
      l += 1
    }
    r
  }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream(64 + levels.map(_.length).sum * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(k)
    out.writeLong(n)
    out.writeLong(errAcc)
    out.writeBoolean(flip)
    out.writeInt(levels.length)
    levels.foreach { lev =>
      out.writeInt(lev.length)
      lev.foreach(out.writeLong)
    }
    out.flush()
    bos.toByteArray
  }
}

object KllSketch {
  def fromBytes(bytes: Array[Byte]): KllSketch = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val sk = new KllSketch(in.readInt())
    sk.n = in.readLong()
    sk.errAcc = in.readLong()
    sk.flip = in.readBoolean()
    val nLevels = in.readInt()
    sk.levels.clear()
    var l = 0
    while (l < nLevels) {
      val sz = in.readInt()
      val lev = new mutable.ArrayBuffer[Long](math.max(sz, 4))
      var i = 0
      while (i < sz) { lev += in.readLong(); i += 1 }
      sk.levels += lev
      l += 1
    }
    sk
  }
}

object KllAgg {
  /** Scala-API column: KLL quantile summary of a long column.
    * Renders "n=..,err=..,q<phi_ppm>=<value>,..." for the given φs. */
  def graftKll(v: Column, k: Int, phis: Seq[Double]): Column = {
    import org.apache.spark.sql.functions.{array, lit}
    ExpressionUtils.column(
      KllAgg(ExpressionUtils.expression(v),
        ExpressionUtils.expression(lit(k)),
        ExpressionUtils.expression(array(phis.map(lit): _*)))
        .toAggregateExpression())
  }
}

package org.apache.spark.sql.graftagg

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter summary as a native Catalyst aggregate —
  * the engine's second `TypedImperativeAggregate`, with the buffer
  * shape [[org.apache.spark.sql.graftagg.HllAgg]] doesn't exercise:
  * VARIABLE-size state (≤ k−1 counters) with real binary
  * serialization through the partial-aggregation shuffle and the
  * streaming state store.
  *
  * Semantics (the mergeable-summaries formulation, Agarwal et al.,
  * PODS'12 — public literature): per-partition summaries keep ≤ k−1
  * (item, counter) pairs; on overflow every counter decrements by the
  * evicted weight; MERGE sums two summaries' counters and subtracts
  * the k-th largest value, dropping non-positives. The merged summary
  * retains the MG guarantees over the whole input: for every item,
  * 0 ≤ true(x) − est(x) ≤ N/k, and therefore EVERY item with
  * true(x) > N/k is present in the summary. Those inequalities are
  * deterministic facts of any execution; the individual counter
  * VALUES depend on partition merge order — so consumers (q262)
  * output the guaranteed facts, never the raw counters.
  *
  * At 100 TB this is the deterministic-guarantee complement to the
  * count-min sketch (q200): the shuffle carries ≤ k−1 pairs per
  * group, and a frequent-items report needs no second exact pass to
  * be trustworthy — membership above N/k is certain.
  *
  * eval() renders the summary as "item:est" pairs sorted by item
  * (a scalar string — driver- and `str_to_map`-friendly).
  * Registered as SQL function `graft_mg` by [[graft.GraftExtensions]];
  * Scala API [[MisraGriesAgg.graftMg]].
  */
case class MisraGriesAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Long, Long]]
  with ExpectsInputTypes with BinaryLike[Expression] {

  private lazy val k: Int = kExpr.eval(null) match {
    case i: Int if i >= 2 => i
    case other => throw new IllegalArgumentException(
      s"graft_mg k must be a literal int >= 2, got $other")
  }

  override def left: Expression = child
  override def right: Expression = kExpr
  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, IntegerType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_mg"

  override def createAggregationBuffer(): mutable.HashMap[Long, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Long, Long],
      input: InternalRow): mutable.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[Long]
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k - 1 => buf.update(item, 1L)
        case None =>
          // decrement-all: the classic MG overflow step
          val dead = mutable.ArrayBuffer.empty[Long]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (i, c) => if (c <= 0) dead += i }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Long, Long],
      other: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
    other.foreach { case (i, c) =>
      buf.update(i, buf.getOrElse(i, 0L) + c)
    }
    if (buf.size > k - 1) {
      // subtract the k-th largest counter; strictly-greater survive
      val values = buf.values.toArray
      java.util.Arrays.sort(values)
      val kth = values(values.length - k)
      val dead = mutable.ArrayBuffer.empty[Long]
      buf.mapValuesInPlace((_, c) => c - kth)
      buf.foreach { case (i, c) => if (c <= 0) dead += i }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[Long, Long]): Any = {
    val sb = new java.lang.StringBuilder
    buf.toArray.sortBy(_._1).foreach { case (i, c) =>
      if (sb.length > 0) sb.append(',')
      sb.append(i).append(':').append(c)
    }
    UTF8String.fromString(sb.toString)
  }

  override def serialize(buf: mutable.HashMap[Long, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + buf.size * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, c) => out.writeLong(i); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storage: Array[Byte]): mutable.HashMap[Long, Long] = {
    val bb = ByteBuffer.wrap(storage)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[Long, Long]
    var i = 0
    while (i < n) {
      val item = bb.getLong
      val c = bb.getLong
      buf.update(item, c)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MisraGriesAgg =
    copy(child = newLeft, kExpr = newRight)
}

object MisraGriesAgg {
  /** Scala-API column: MG summary string of a long item column. */
  def graftMg(item: Column, k: Int): Column =
    ExpressionUtils.column(
      MisraGriesAgg(ExpressionUtils.expression(item), Literal(k))
        .toAggregateExpression())
}

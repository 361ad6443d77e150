package org.apache.spark.sql.graftagg

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-heap grouped top-k as a native Catalyst aggregate — the
  * scale-correct replacement for the row_number-window top-k idiom:
  * a window must SORT every row of every group (and without a
  * rank-filter adjacent to the window, WindowGroupLimit cannot prune,
  * so a hot group funnels through one task), while this aggregate
  * keeps ≤ k (value, id) pairs per partial buffer, combines
  * map-side, and ships k pairs per group through the shuffle — the
  * plan contains NO Window and NO corpus-wide Sort.
  *
  * Unlike Misra–Gries (order-dependent counters), top-k under the
  * total order (value DESC, id ASC) is a semilattice: any merge order
  * yields the same k survivors — the aggregate is fully deterministic
  * under any partitioning, which TopKAggSpec pins by re-running under
  * 1/7/32-partition layouts.
  *
  * eval() renders "id@value" pairs in rank order joined by ',' — a
  * scalar string both the driver hash and a DuckDB
  * string_agg(... ORDER BY value DESC, id) oracle reproduce exactly.
  * Registered as SQL `graft_topk(value, id, k)` by
  * [[graft.GraftExtensions]]; Scala API [[TopKAgg.graftTopK]].
  */
case class TopKAgg(
    valueExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Long)]]
  with ExpectsInputTypes with TernaryLike[Expression] {

  private lazy val k: Int = kExpr.eval(null) match {
    case i: Int if i >= 1 => i
    case other => throw new IllegalArgumentException(
      s"graft_topk k must be a literal int >= 1, got $other")
  }

  override def first: Expression = valueExpr
  override def second: Expression = idExpr
  override def third: Expression = kExpr
  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, LongType, IntegerType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  // rank order: value DESC, id ASC
  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def trim(buf: mutable.ArrayBuffer[(Long, Long)])
      : mutable.ArrayBuffer[(Long, Long)] = {
    val sorted = buf.sortWith(better)
    sorted.takeInPlace(k)
    sorted
  }

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Long)] =
    mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[(Long, Long)],
      input: InternalRow): mutable.ArrayBuffer[(Long, Long)] = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null) {
      val cand = (v.asInstanceOf[Long], id.asInstanceOf[Long])
      if (buf.length < k) {
        buf += cand
        if (buf.length == k) return trim(buf)
        buf
      } else if (better(cand, buf.last)) {
        // buf is kept rank-sorted once full: replace the worst, then
        // bubble the candidate into place (k is small)
        buf(buf.length - 1) = cand
        var i = buf.length - 1
        while (i > 0 && better(buf(i), buf(i - 1))) {
          val t = buf(i); buf(i) = buf(i - 1); buf(i - 1) = t
          i -= 1
        }
        buf
      } else buf
    } else buf
  }

  override def merge(buf: mutable.ArrayBuffer[(Long, Long)],
      other: mutable.ArrayBuffer[(Long, Long)])
      : mutable.ArrayBuffer[(Long, Long)] =
    trim(buf ++= other)

  override def eval(buf: mutable.ArrayBuffer[(Long, Long)]): Any = {
    val ranked = buf.sortWith(better).take(k)
    val sb = new java.lang.StringBuilder
    ranked.foreach { case (v, id) =>
      if (sb.length > 0) sb.append(',')
      sb.append(id).append('@').append(v)
    }
    UTF8String.fromString(sb.toString)
  }

  override def serialize(buf: mutable.ArrayBuffer[(Long, Long)])
      : Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buf.size * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, id) => out.writeLong(v); out.writeLong(id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storage: Array[Byte])
      : mutable.ArrayBuffer[(Long, Long)] = {
    val bb = ByteBuffer.wrap(storage)
    val n = bb.getInt
    val buf = mutable.ArrayBuffer.empty[(Long, Long)]
    var i = 0
    while (i < n) {
      buf += ((bb.getLong, bb.getLong))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): TopKAgg =
    copy(valueExpr = newFirst, idExpr = newSecond, kExpr = newThird)
}

object TopKAgg {
  /** Scala-API column: "id@value" rank-ordered top-k summary. */
  def graftTopK(value: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKAgg(ExpressionUtils.expression(value),
        ExpressionUtils.expression(id), Literal(k))
        .toAggregateExpression())
}

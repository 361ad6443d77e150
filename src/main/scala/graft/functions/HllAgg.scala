package org.apache.spark.sql.graftagg

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** HyperLogLog distinct-count sketch as a NATIVE Catalyst aggregate
  * (`TypedImperativeAggregate[Array[Byte]]`) — the extension-point the
  * engine had not yet exercised (expressions, optimizer rule, planner
  * strategy + physical operator, and DSv2 source all exist; this
  * completes the ladder with a custom aggregate function).
  *
  * Why native instead of the q230 groupBy/register formulation: a
  * TypedImperativeAggregate participates in PARTIAL aggregation — each
  * executor keeps one 256-byte register array per group and ships only
  * that to the final stage (classic mergeable-sketch behaviour), so
  * the shuffle for a distinct-count over 10⁹ rows is |groups|·256
  * bytes instead of |groups|·|buckets| rows. At 100 TB this is the
  * difference between a sketch that IS the shuffle reduction and a
  * sketch computed after a full-width exchange.
  *
  * Bit-parity contract: the input is the engine-standard 60-bit md5
  * hash (h ≥ 0) — bucket = h mod 256, payload w = h div 256, register
  * value ρ = 53 − bitlength(w) (53 when w = 0) — and the estimator is
  * the exact-bigint harmonic form with the SAME IEEE operation order
  * as q230's SQL text, so `graft_hll(h)` returns bit-identical
  * estimates to the register-table formulation and to the DuckDB
  * oracle. m = 256 keeps every fixture SF in the flat (small-range
  * corrected... none needed ≤ 8.4% err measured) regime; the harmonic
  * sum Σ 2^(53−ρ) is exact in long (≤ 256·2^53 < 2^63).
  *
  * Registered as SQL function `graft_hll` by [[graft.GraftExtensions]];
  * Scala API [[HllAgg.graftHll]].
  */
case class HllAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll"

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](256)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val bucket = (((h % 256) + 256) % 256).toInt // pmod, h60 is ≥ 0
      val w = h / 256
      val rho =
        if (w == 0) 53
        else 53 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < 256) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    // exact-bigint harmonic sum: Σ 2^(53−ρ) over set registers plus
    // 2^53 per empty register — then ONE pinned-order double
    // expression, identical to q230's SQL text
    var sExact = 0L
    var i = 0
    while (i < 256) {
      sExact +=
        (if (buf(i) == 0) 9007199254740992L // 2^53, empty bucket
         else 1L << (53 - buf(i)))
      i += 1
    }
    math.floor((0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0 *
      9007199254740992.0 / sExact.toDouble).toLong
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(storage: Array[Byte]): Array[Byte] = storage

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllAgg =
    copy(child = newChild)
}

object HllAgg {
  /** Scala-API column: HLL distinct estimate of a 60-bit-hash column. */
  def graftHll(h: Column): Column =
    ExpressionUtils.column(
      HllAgg(ExpressionUtils.expression(h)).toAggregateExpression())
}

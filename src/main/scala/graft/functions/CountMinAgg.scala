package org.apache.spark.sql.graftagg

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** COUNT–MIN SKETCH as a native mergeable aggregate
  * (`TypedImperativeAggregate`) — Cormode & Muthukrishnan's streaming
  * frequency summary (J. Algorithms 2005): a fixed d×w table of
  * counters; each key increments one counter per row (chosen by an
  * independent hash), and a key's frequency estimate is the MINIMUM
  * of its d counters — never an undercount, over by at most εN with
  * probability 1−δ (ε = e/w, δ = e^−d). The complement to
  * [[MisraGriesAgg]]: Misra–Gries answers "which keys are heavy",
  * the CMS answers "how heavy is THIS key" for any key, in O(d·w)
  * space independent of both corpus size and key cardinality.
  *
  * Why it scales: the buffer is a flat `Array[Long]` of d·w counters
  * (d=4, w=256 ⇒ 8 KB), updates are O(d) increments, and MERGE IS
  * ELEMENTWISE ADDITION — fully commutative/associative, so partial
  * aggregation ships one 8 KB table per group per partial regardless
  * of row count, and the result is bit-identical under ANY
  * partitioning or micro-batch split (the q308/q335 determinism
  * class — this is also what makes it safely driver-hashable and
  * streaming-state-store-safe).
  *
  * Hashing is PINNED so an external engine can replay the table
  * row-for-row: h_i(k) = ((A_i·(k mod p) + B_i) mod p) mod w with
  * p = 2³¹−1 (the classic Carter–Wegman universal family); A_i·x
  * stays under 2⁶² so plain int64 arithmetic is exact in both
  * engines. Keys must be non-negative; null keys are skipped (SQL
  * aggregate convention).
  *
  * Eval returns the FULL counter table as `array<bigint>` in row-major
  * order (row i at [i·w, (i+1)·w)), not a point estimate — the sketch
  * IS the result; probes are then plain `element_at`/`least`
  * expressions, so one aggregation pass serves any number of lookups.
  *
  * Registered as SQL function `graft_cms` by [[graft.GraftExtensions]];
  * Scala API [[CountMinAgg.graftCms]].
  */
case class CountMinAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  import CountMinAgg.{A, B, D, P, W}

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](D * W)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val k = v.asInstanceOf[Long]
      require(k >= 0, s"graft_cms key must be non-negative: $k")
      val x = k % P
      var i = 0
      while (i < D) {
        buf(i * W + ((A(i) * x + B(i)) % P % W).toInt) += 1L
        i += 1
      }
      buf
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = ArrayData.toArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): CountMinAgg = copy(child = newChild)
}

object CountMinAgg {
  /** Table shape and the pinned Carter–Wegman seeds — shared verbatim
    * with every oracle replay (any change is a cross-engine break). */
  val D = 4
  val W = 256
  val P = 2147483647L // 2^31 − 1
  val A: Array[Long] = Array(1103L, 12289L, 524287L, 8191L)
  val B: Array[Long] = Array(7L, 101L, 3571L, 65537L)

  /** Scala-API column: the d×w counter table over a non-negative key. */
  def graftCms(k: Column): Column =
    ExpressionUtils.column(
      CountMinAgg(ExpressionUtils.expression(k)).toAggregateExpression())

  /** SQL fragment for h_i(key)+row-major offset, identical text in
    * Spark and DuckDB: 1-based position of key's counter in row `i`
    * of the flattened table (for `element_at`/`list_extract`). */
  def cellExpr(i: Int, key: String): String =
    s"cast($i * $W + ((${A(i)} * ($key % $P) + ${B(i)}) % $P) % $W + 1 as int)"
}

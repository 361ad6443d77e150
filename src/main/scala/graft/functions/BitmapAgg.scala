package org.apache.spark.sql.graftagg

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** EXACT distinct count over a non-negative integer key as a native
  * mergeable BITMAP aggregate (`TypedImperativeAggregate`) — the
  * ClickHouse `groupBitmap` / Druid bitmap-index approach, and the
  * exact counterpart to [[HllAgg]]'s estimate: same partial-
  * aggregation shape (each executor keeps ONE buffer per group and
  * ships only that), but the buffer is a bitmap over the key domain,
  * so the answer is exact instead of ±2%.
  *
  * The buffer is CONTAINER-SPARSE (the Roaring idea): keys partition
  * into 65,536-bit chunks (8 KB of longs each), and only touched
  * chunks exist, each trimmed to its occupied word prefix on
  * serialization. This matters beyond politeness — the driver's own
  * sf10 fixtures carry user ids up to 9.9×10⁸ with only 1.5×10⁵
  * distinct values (ScaleGen block-shifts the id space), and a flat
  * dense bitset over that domain is 124 MB PER GROUP PER PARTIAL (a
  * measured 141 s bench blow-up); the chunked form is proportional to
  * the OCCUPIED ranges (~tens of KB here), which is also the honest
  * 100 TB shape where id spaces are allocated in shifted blocks.
  *
  * Why it scales vs `count(distinct k)`: the two-phase distinct
  * either plants an Expand (when mixed with other aggregates) or
  * shuffles one row per distinct key; the bitmap ships ~1 bit per
  * member of each occupied range with map-side combining. The algebra
  * is set-bit / OR / popcount — commutative, associative, idempotent
  * — so the result is identical under ANY partitioning and safely
  * driver-hashable.
  *
  * Keys must be in [0, 2⁴⁷) (chunk index must fit an Int); a guard
  * throws on out-of-domain input rather than silently truncating.
  *
  * Registered as SQL function `graft_bitmap_distinct` by
  * [[graft.GraftExtensions]]; Scala API
  * [[BitmapDistinctAgg.graftBitmapDistinct]].
  */
case class BitmapDistinctAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[
    scala.collection.mutable.HashMap[Int, Array[Long]]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  import BitmapDistinctAgg.{Buf, ChunkWords}

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bitmap_distinct"

  override def createAggregationBuffer(): Buf = new Buf

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val k = v.asInstanceOf[Long]
      require(k >= 0 && k < (1L << 47),
        s"graft_bitmap_distinct key out of domain [0, 2^47): $k")
      val chunk = (k >>> 16).toInt
      val bit = (k & 0xFFFF).toInt
      val words = buf.getOrElseUpdate(chunk, new Array[Long](ChunkWords))
      words(bit >>> 6) |= 1L << (bit & 63)
      buf
    }
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val it = b.iterator
    while (it.hasNext) {
      val (chunk, bw) = it.next()
      a.get(chunk) match {
        case Some(aw) =>
          var i = 0
          val n = math.min(aw.length, bw.length)
          while (i < n) { aw(i) |= bw(i); i += 1 }
          // a deserialized chunk may be a trimmed prefix shorter than
          // the incoming one — widen to keep every set bit
          if (bw.length > aw.length)
            a.update(chunk, {
              val grown = java.util.Arrays.copyOf(bw, bw.length)
              var j = 0
              while (j < aw.length) { grown(j) |= aw(j); j += 1 }
              grown
            })
        case None => a.update(chunk, bw)
      }
    }
    a
  }

  override def eval(buf: Buf): Any = {
    var n = 0L
    val it = buf.valuesIterator
    while (it.hasNext) {
      val words = it.next()
      var i = 0
      while (i < words.length) {
        n += java.lang.Long.bitCount(words(i)); i += 1
      }
    }
    n
  }

  override def serialize(buf: Buf): Array[Byte] = {
    // per chunk: [int chunkIdx][int nWords][nWords longs], trailing
    // zero words trimmed — sparse groups ship only occupied prefixes
    var size = 0
    val trimmed = buf.toSeq.sortBy(_._1).map { case (c, words) =>
      var last = words.length
      while (last > 0 && words(last - 1) == 0L) last -= 1
      size += 8 + last * 8
      (c, words, last)
    }.filter(_._3 > 0)
    val bb = java.nio.ByteBuffer.allocate(size)
    trimmed.foreach { case (c, words, last) =>
      bb.putInt(c); bb.putInt(last)
      var i = 0
      while (i < last) { bb.putLong(words(i)); i += 1 }
    }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Buf
    while (bb.remaining() >= 8) {
      val c = bb.getInt()
      val n = bb.getInt()
      val words = new Array[Long](n)
      var i = 0
      while (i < n) { words(i) = bb.getLong(); i += 1 }
      out.update(c, words)
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): BitmapDistinctAgg = copy(child = newChild)
}

object BitmapDistinctAgg {
  type Buf = scala.collection.mutable.HashMap[Int, Array[Long]]
  val ChunkWords: Int = 1024 // 65,536 bits = 8 KB per touched chunk

  /** Scala-API column: exact distinct count of a non-negative long key. */
  def graftBitmapDistinct(k: Column): Column =
    ExpressionUtils.column(
      BitmapDistinctAgg(ExpressionUtils.expression(k))
        .toAggregateExpression())
}

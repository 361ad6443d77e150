package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftagg.BitmapDistinctAgg
import org.apache.spark.sql.graftagg.BitmapDistinctAgg.graftBitmapDistinct

/** The native exact-distinct bitmap aggregate: exactness against
  * countDistinct, partition invariance (OR/popcount is a semilattice),
  * the serialize/merge path, trimmed sparse buffers, the SQL surface,
  * and the out-of-domain guard.
  */
class BitmapAggSpec extends SparkSpec {

  test("exact vs countDistinct on duplicate-heavy grouped data, " +
      "invariant under partitioning") {
    import spark.implicits._
    val rows = (0 until 5000).map { i =>
      (s"g${i % 3}", (i * 7919L) % 997) // heavy collisions
    }
    val expected = rows.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.size.toLong).toMap
    for (parts <- Seq(1, 4, 13)) {
      val df = rows.toDF("g", "k").repartition(parts)
      val got = df.groupBy("g")
        .agg(graftBitmapDistinct(col("k")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, s"parts=$parts")
      // and agreement with the built-in
      val cd = df.groupBy("g").agg(countDistinct(col("k")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == cd)
    }
  }

  test("sparse and boundary keys: word edges, key 0, empty group") {
    import spark.implicits._
    val keys = Seq(0L, 1L, 63L, 64L, 65L, 127L, 128L, 4096L, 100000L,
      63L, 0L) // dups on the boundaries
    val n = keys.toDF("k").repartition(3)
      .agg(graftBitmapDistinct(col("k"))).head().getLong(0)
    assert(n == 9L)
    val empty = Seq.empty[Long].toDF("k")
      .agg(graftBitmapDistinct(col("k"))).head().getLong(0)
    assert(empty == 0L)
    // nulls are ignored, like count(distinct)
    val withNull = Seq(Some(5L), None, Some(5L), Some(6L)).toDF("k")
      .agg(graftBitmapDistinct(col("k"))).head().getLong(0)
    assert(withNull == 2L)
  }

  test("SQL registration: graft_bitmap_distinct from pure SQL") {
    import spark.implicits._
    (0 until 100).map(i => (i % 7).toLong).toDF("k")
      .createOrReplaceTempView("bm_v")
    val r = spark.sql(
      "SELECT graft_bitmap_distinct(k) AS n FROM bm_v").head()
    assert(r.getLong(0) == 7L)
  }

  test("serialize ships only occupied chunk prefixes; round-trips; " +
      "sparse far-apart keys stay proportional to members") {
    val agg = BitmapDistinctAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(1L))
    val empty = agg.createAggregationBuffer()
    assert(agg.serialize(empty).length == 0)
    assert(agg.eval(agg.deserialize(agg.serialize(empty))) == 0L)

    // two keys ~1e9 apart (the ScaleGen block-shift shape): the
    // serialized form must be two tiny chunk records, nowhere near
    // domain/8 bytes
    val buf = agg.createAggregationBuffer()
    buf.getOrElseUpdate((5L >>> 16).toInt,
      new Array[Long](BitmapDistinctAgg.ChunkWords))(0) |= 1L << 5
    val farChunk = ((990001499L >>> 16)).toInt
    val fw = buf.getOrElseUpdate(farChunk,
      new Array[Long](BitmapDistinctAgg.ChunkWords))
    val farBit = (990001499L & 0xFFFF).toInt
    fw(farBit >>> 6) |= 1L << (farBit & 63)
    val bytes = agg.serialize(buf)
    assert(bytes.length < 4096, s"serialized ${bytes.length} bytes")
    val rt = agg.deserialize(bytes)
    assert(agg.eval(rt) == 2L)
    // merge of trimmed (short) and full-width chunk buffers
    val merged = agg.merge(rt, buf)
    assert(agg.eval(merged) == 2L)
  }

  test("out-of-domain key (negative) throws rather than truncating") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(-1L).toDF("k").agg(graftBitmapDistinct(col("k"))).head()
    }
    assert(ex.getMessage != null)
  }
}

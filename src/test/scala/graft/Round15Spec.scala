package graft

import org.apache.spark.sql.functions._

/** Brute-force verification of the round-15 graph/layout machinery,
  * independent of the DuckDB oracle: the q299 k-core peel is replayed
  * with a naive in-memory peel, and q300's generated Hilbert
  * expressions are proven to BE the Hilbert curve (bijection over the
  * full 256×256 grid + unit-step adjacency between consecutive
  * indexes — properties no merely-engine-consistent formula slip
  * would survive). */
class Round15Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q299 k-core peel equals the naive in-memory peel") {
    val got = graft.queries.GraphQueries.q299.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    CacheRegistry.releaseAll()
    val baskets = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairCnt = baskets.groupBy(_._1).values.flatMap { b =>
      val parts = b.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).view.mapValues(_.size)
    val und = pairCnt.filter(_._2 >= 2).keys.toSeq
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    var alive = adj.keySet
    for (r <- 1 to 6) {
      val next = alive.filter(v => (adj(v) & alive).size >= 3)
      val (rm, rem) = got(r.toLong)
      assert(rm == (alive.size - next.size).toLong, s"round $r removed")
      assert(rem == next.size.toLong, s"round $r remaining")
      alive = next
    }
  }

  test("q300 Hilbert expressions: bijection + unit-step adjacency on the full grid") {
    import spark.implicits._
    val cells = for (x <- 0 until 256; y <- 0 until 256)
      yield (x.toLong, y.toLong)
    val grid0 = cells.toDF("u8", "d8")
      .selectExpr("u8", "d8", "u8 as x", "d8 as y", "cast(0 as bigint) as acc")
    val h = graft.queries.LayoutQueries.hilbertLevels.foldLeft(grid0) {
      (df, lv) =>
        val (nx, ny, nacc) = graft.queries.LayoutQueries.hilbertLevel(lv)
        df.selectExpr("u8", "d8", s"$nx as x", s"$ny as y", s"$nacc as acc")
    }
    val rows = h.select("u8", "d8", "acc").collect()
      .map(r => (r.getLong(2), (r.getLong(0), r.getLong(1))))
    assert(rows.length == 65536)
    val byD = rows.sortBy(_._1)
    // bijection onto 0..65535
    assert(byD.head._1 == 0L && byD.last._1 == 65535L)
    assert(byD.map(_._1).distinct.length == 65536, "not a bijection")
    // consecutive Hilbert indexes are grid-adjacent (|dx| + |dy| == 1)
    for (i <- 1 until byD.length) {
      val (_, (x0, y0)) = byD(i - 1)
      val (_, (x1, y1)) = byD(i)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1L,
        s"jump at d=${byD(i)._1}: ($x0,$y0) -> ($x1,$y1)")
    }
  }
}

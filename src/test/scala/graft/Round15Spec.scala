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

  test("q302 FIFO allocation equals the naive per-part scan") {
    val got = graft.queries.PlanningQueries.q302.fn(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    CacheRegistry.releaseAll()
    val li = Tables(spark, dir, "lineitem")
      .selectExpr("l_partkey", "l_returnflag",
        "cast(l_quantity as bigint)",
        "cast(datediff(cast(l_shipdate as date), date'1970-01-01') as bigint)",
        "l_orderkey", "l_linenumber",
        "cast(floor(l_extendedprice * 100) as bigint) div cast(l_quantity as bigint)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getInt(5).toLong, r.getLong(6)))
    val byPart = li.groupBy(_._1)
    for ((part, rows) <- byPart) {
      val demand = rows.filter(_._2 == "R").map(_._3).sum
      if (demand > 0 && rows.exists(_._2 != "R")) {
        val lots = rows.filter(_._2 != "R")
          .sortBy(t => (t._4, t._5, t._6, t._3, t._7))
        var remaining = demand
        var nLots = 0L
        var cost = 0L
        var allocated = 0L
        for ((_, _, qty, _, _, _, uc) <- lots) {
          val a = math.max(0L, math.min(qty, remaining))
          if (a > 0) { nLots += 1; cost += a * uc; allocated += a }
          remaining -= a
          if (remaining < 0) remaining = 0
        }
        val (d, sup, alloc, unfilled, nl, cc) = got(part)
        assert(d == demand, s"part=$part demand")
        assert(sup == lots.map(_._3).sum, s"part=$part supply")
        assert(alloc == allocated, s"part=$part allocated")
        assert(unfilled == demand - allocated, s"part=$part unfilled")
        assert(nl == nLots, s"part=$part n_lots")
        assert(cc == cost, s"part=$part cost")
      } else {
        assert(!got.contains(part), s"part=$part should be absent")
      }
    }
  }

  test("q306 greedy non-overlap count equals the naive sequential scan") {
    val got = graft.queries.MatchQueries.q306.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    CacheRegistry.releaseAll()
    val cand = graft.queries.MatchQueries.cepCandidates(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    CacheRegistry.releaseAll()
    val naive = cand.groupBy(_._1).map { case (u, cs) =>
      val sorted = cs.map(c => (c._2, c._3)).sortBy(_._1)
      var cursor = -1L
      var n = 0L
      for ((v, p) <- sorted if n < 8) {
        if (v > cursor) { n += 1; cursor = p }
      }
      u -> n
    }.filter(_._2 >= 1)
    assert(got == naive.toMap, "greedy mismatch")
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

package graft

import org.apache.spark.sql.functions._

/** Brute-force verification of the round-14 query machinery at
  * sf0.001, independent of the DuckDB oracle: the packed two-counter
  * sweep-line (q252), the BFS iterative frontier (q255), the
  * prefix-rank Gini (q251), the bitmap algebra (q253), and the ACF
  * lag pairing (q248) are each recomputed with naive in-memory Scala
  * and compared row for row. */
class Round14Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q252 sweep-line equals the naive in-memory sweep") {
    val got = graft.queries.IntervalQueries.q252.fn(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    CacheRegistry.releaseAll()
    // naive: per type, sort endpoints, scan
    val iv = Tables(spark, dir, "events")
      .select(col("event_type"), expr("unix_micros(ts)").as("st"),
        expr("unix_micros(ts) + (cast(round(value * 100) as bigint) " +
          "% 3600 + 60) * 1000000").as("en"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for ((t, rows) <- iv.groupBy(_._1)) {
      val pts = rows.flatMap { case (_, s, e) =>
        Seq((s, 1, 1L), (e, 0, -1L)) // (time, pri: end first, delta)
      }.sortBy(p => (p._1, p._2))
      var conc = 0L
      var maxc = 0L
      var peakT = Long.MaxValue
      var covered = 0L
      for (i <- pts.indices) {
        conc += pts(i)._3
        if (conc > maxc) { maxc = conc; peakT = pts(i)._1 }
        if (i + 1 < pts.length && conc > 0)
          covered += pts(i + 1)._1 - pts(i)._1
      }
      val span = rows.map(_._3).max - rows.map(_._2).min
      val r = got(t)
      assert(r.getLong(1) == rows.length.toLong, s"$t n_intervals")
      assert(r.getLong(2) == maxc, s"$t max_conc")
      assert(r.getLong(3) == peakT, s"$t peak_t")
      assert(r.getLong(4) == covered, s"$t covered")
      assert(r.getLong(5) == span, s"$t span")
      assert(r.getLong(6) == covered * 1000000L / span, s"$t util")
    }
  }

  test("q255 BFS hop histogram equals the naive in-memory BFS") {
    val got = graft.queries.GraphQueries.q255.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    CacheRegistry.releaseAll()
    val baskets = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairCnt = baskets.groupBy(_._1).values.flatMap { b =>
      val parts = b.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).view.mapValues(_.size)
      .filter(_._2 >= 2).keys.toSeq
    val adj = (pairCnt ++ pairCnt.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = adj.view.mapValues(_.size).toMap
    val seeds = deg.toSeq.sortBy { case (p, d) => (-d, p) }.take(3)
      .map(_._1)
    var lab = seeds.map(_ -> 0L).toMap
    var frontier = seeds.toSet
    for (k <- 1 to 4) {
      val nxt = frontier.flatMap(adj.getOrElse(_, Set.empty))
        .diff(lab.keySet)
      lab = lab ++ nxt.map(_ -> k.toLong)
      frontier = nxt
    }
    val hist = lab.values.groupBy(identity).view.mapValues(_.size.toLong)
    for ((h, n) <- hist) assert(got(h) == n, s"hop $h")
    assert(got(-1L) == (deg.keySet.size - lab.size).toLong, "unreached")
  }

  test("q251 Gini/concentration equals the naive per-nation computation") {
    val got = graft.queries.StatsQueries.q251.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    CacheRegistry.releaseAll()
    val rev = Tables(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("v"))
      .join(Tables(spark, dir, "customer")
        .select(col("c_custkey").as("o_custkey"),
          col("c_nationkey").cast("long").as("nation")), "o_custkey")
      .collect().map(r => (r.getLong(2), r.getLong(0), r.getLong(1)))
    for ((nation, rows) <- rev.groupBy(_._1)) {
      val sorted = rows.sortBy(r => (r._3, r._2)) // by (v, custkey)
      val n = sorted.length.toLong
      val s = sorted.map(_._3).sum
      val t = sorted.zipWithIndex.map { case (r, i) => (i + 1) * r._3 }.sum
      val gini = ((2 * t) / n) * 1000000L / s - (n + 1) * 1000000L / n
      val hhi = sorted.map(r => (r._3 * 1000000L / s) *
        (r._3 * 1000000L / s)).sum / 1000000L
      val top1 = sorted.map(_._3).max * 1000000L / s
      val cr10 = sorted.takeRight(10).map(_._3).sum * 1000000L / s
      val r = got(nation)
      assert(r.getLong(1) == n, s"nation $nation n")
      assert(r.getLong(2) == gini, s"nation $nation gini")
      assert(r.getLong(3) == hhi, s"nation $nation hhi")
      assert(r.getLong(4) == top1, s"nation $nation top1")
      assert(r.getLong(5) == cr10, s"nation $nation cr10")
    }
  }

  test("q253 bitmap cardinalities equal the exact ride-along counts " +
      "on every zone") {
    val rows = graft.queries.IntervalQueries.q253.fn(spark, dir).collect()
    CacheRegistry.releaseAll()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getLong(2) == r.getLong(6), s"zone ${r.getLong(0)} A")
      assert(r.getLong(3) == r.getLong(7), s"zone ${r.getLong(0)} B")
      assert(r.getLong(4) == r.getLong(8), s"zone ${r.getLong(0)} AND")
      assert(r.getLong(5) == r.getLong(9), s"zone ${r.getLong(0)} OR")
    }
  }

  test("q269 watermark audit equals the naive running-max lateness") {
    val got = graft.queries.IntervalQueries.q269.fn(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    CacheRegistry.releaseAll()
    val ev = Tables(spark, dir, "events")
      .select(col("event_type"), col("event_id"),
        expr("unix_micros(ts)").as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for ((tpe, rows) <- ev.groupBy(_._1)) {
      val inOrder = rows.sortBy(_._2)
      var mx = Long.MinValue
      val lateMin = inOrder.map { case (_, _, t) =>
        if (t > mx) mx = t
        (mx - t) / 60000000L
      }
      val sorted = lateMin.sorted
      val n = sorted.length
      def pct(j: Int, k: Int) = sorted((n * j + k - 1) / k - 1)
      val r = got(tpe)
      assert(r.getLong(1) == n.toLong, s"$tpe n")
      assert(r.getLong(2) == pct(1, 2), s"$tpe p50")
      assert(r.getLong(3) == pct(19, 20), s"$tpe p95")
      assert(r.getLong(4) == pct(99, 100), s"$tpe p99")
      assert(r.getLong(5) == sorted.last, s"$tpe max")
      assert(r.getLong(6) ==
        lateMin.count(_ == 0L).toLong * 1000000L / n, s"$tpe on-time")
    }
  }

  test("q248 ACF equals the naive lagged computation") {
    val got = graft.queries.StatsQueries.q248.fn(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    CacheRegistry.releaseAll()
    val daily = Tables(spark, dir, "events")
      .groupBy(col("event_type"),
        expr("cast(floor(cast(ts as long) / 86400) as bigint)")
          .as("day_idx"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for ((t, rows) <- daily.groupBy(_._1) if rows.length >= 4) {
      val n = rows.length.toLong
      val s = rows.map(_._3).sum
      val mean = s / n
      val dev = rows.map(r => (r._2, r._3 - mean)).toMap
      val den = dev.values.map(d => d * d).sum
      if (den > 0) {
        for (lag <- 1L to 3L) {
          val num = dev.toSeq.flatMap { case (d0, dv) =>
            dev.get(d0 + lag).map(dv * _)
          }.sum
          got.get((t, lag)).foreach { r =>
            assert(r.getLong(4) == num * 1000000L / den, s"$t lag $lag")
          }
        }
      }
    }
  }
}

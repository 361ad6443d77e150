package graft

import org.apache.spark.sql.functions._

/** Brute-force pins for the round-15 statistics wave: each query's
  * closed-form / histogram arithmetic re-derived the naive way on
  * tiny in-memory data, so the algebra (not just the oracle mirror)
  * is certified.
  */
class Wave15Spec extends SparkSpec {

  test("q326 Gini identity: histogram formula equals the naive " +
      "sorted-rank computation") {
    // values with heavy ties — the tied-rank run arithmetic is the
    // part worth brute-forcing
    val xs = Seq(5L, 1L, 5L, 9L, 1L, 1L, 7L, 5L, 9L, 2L)
    val sorted = xs.sorted
    val n = sorted.length
    val s = sorted.sum
    val twoSumRankX = 2L * sorted.zipWithIndex
      .map { case (x, i) => (i + 1) * x }.sum
    val giniNaive = twoSumRankX.toDouble / (n.toDouble * s) -
      (n + 1.0) / n

    // the histogram-run identity used by q326
    val hist = xs.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1)
    var cumBefore = 0L
    var acc = 0L
    for ((x, cnt) <- hist) {
      acc += x * (2L * cnt * cumBefore + cnt.toLong * (cnt + 1))
      cumBefore += cnt
    }
    assert(acc == twoSumRankX)
    assert(math.floor(1e6 * giniNaive) ==
      math.floor(1e6 * (acc.toDouble / (n.toDouble * s) - (n + 1.0) / n)))
  }

  test("q326 Lorenz: decile share numerators from histogram runs " +
      "equal the naive prefix of the sorted list") {
    val xs = Seq(5L, 1L, 5L, 9L, 1L, 1L, 7L, 5L, 9L, 2L)
    val sorted = xs.sorted
    val n = sorted.length
    val s = sorted.sum
    val hist = xs.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    for (d <- 1 to 10) {
      val r = d * n / 10
      val naive = sorted.take(r.toInt).sum
      // locate r's bucket
      var cumBefore = 0L; var cumXBefore = 0L; var got = -1L
      for ((x, cnt) <- hist) {
        if (cumBefore < r && r <= cumBefore + cnt)
          got = cumXBefore + (r - cumBefore) * x
        cumXBefore += x * cnt; cumBefore += cnt
      }
      assert(got == naive, s"decile $d")
      assert(got * 1000000L / s == naive * 1000000L / s)
    }
  }

  test("q327 AR(1): n2-scaled integer identities equal the naive " +
      "centered Yule-Walker estimate") {
    val x = Seq(3L, 7L, 4L, 9L, 12L, 8L, 5L, 11L, 10L, 6L)
    val n = x.length
    val m = x.sum.toDouble / n
    val numNaive = (1 until n).map(t => (x(t) - m) * (x(t - 1) - m)).sum
    val denNaive = x.map(v => (v - m) * (v - m)).sum
    val phiNaive = numNaive / denNaive

    val sx = x.sum
    val sxx = x.map(v => v * v).sum
    val sxy = (1 until n).map(t => x(t) * x(t - 1)).sum
    val sa = x.drop(1).sum
    val sb = x.dropRight(1).sum
    val numN2 = n.toLong * n * sxy - n.toLong * sx * (sa + sb) +
      (n - 1L) * sx * sx
    val denN2 = n.toLong * n * sxx - n.toLong * sx * sx
    val phiInt = numN2.toDouble / denN2
    assert(math.abs(phiInt - phiNaive) < 1e-12)
    // and the forecast expression
    val fNaive = m + phiNaive * (x.last - m)
    val fInt = sx.toDouble / n + phiInt * (x.last - sx.toDouble / n)
    assert(math.abs(fInt - fNaive) < 1e-9)
  }

  test("q325 stump: the ppm Gini cost is minimized at the planted " +
      "separator on a constructed dataset") {
    import spark.implicits._
    // y = 1 iff q <= 20 (perfect separator at t=20 modulo noise)
    val rows = (1 to 50).flatMap { q =>
      val nRows = 10
      (0 until nRows).map { i =>
        val y = if (q <= 20) (if (i < 9) 1L else 0L)
                else (if (i < 1) 1L else 0L)
        (q.toLong, y)
      }
    }
    val df = rows.toDF("q", "y")
    import org.apache.spark.sql.expressions.Window
    val hist = df.groupBy("q")
      .agg(count(lit(1)).as("cnt"), sum("y").as("pos"))
    val w = Window.orderBy("q")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("nl", sum("cnt").over(w))
      .withColumn("posl", sum("pos").over(w))
      .withColumn("n", sum("cnt").over(Window.partitionBy(lit(1))))
      .withColumn("post", sum("pos").over(Window.partitionBy(lit(1))))
      .where(col("nl") < col("n"))
    val best = cum.select(col("q"),
        expr("""cast(floor(1000000.0 * (
          (cast(nl as double) * cast(nl as double)
            - cast(posl as double) * cast(posl as double)
            - cast(nl - posl as double) * cast(nl - posl as double))
            / cast(nl as double)
          + (cast(n - nl as double) * cast(n - nl as double)
            - cast(post - posl as double) * cast(post - posl as double)
            - cast((n - nl) - (post - posl) as double)
              * cast((n - nl) - (post - posl) as double))
            / cast(n - nl as double)
        ) / cast(n as double)) as bigint)""").as("cost_ppm"))
      .orderBy("cost_ppm", "q").limit(1).head()
    assert(best.getLong(0) == 20L, s"best split was ${best.getLong(0)}")
  }

  test("q324 Benford literals are floor(log10(1 + 1/d) * 1e6)") {
    val pinned = Seq(301029L, 176091L, 124938L, 96910L, 79181L,
      66946L, 57991L, 51152L, 45757L)
    for (d <- 1 to 9)
      assert(pinned(d - 1) ==
        math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong, s"digit $d")
  }
}

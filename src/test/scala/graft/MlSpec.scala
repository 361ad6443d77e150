package graft

import org.apache.spark.sql.functions._

/** Brute-force verification of the round-15 ML tier at sf0.001,
  * independent of the DuckDB oracle: q292's Lloyd iterations are
  * replayed with a naive in-memory k-means on the same integer grid;
  * q293's Cramer solve must recover PLANTED coefficients exactly on a
  * synthetic exact-fit frame (the oracle can only prove both engines
  * agree — this proves the algebra is right); q294's doubled-U
  * statistics are recomputed from naive midranks.
  */
class MlSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q292 k-means equals the naive in-memory Lloyd on the integer grid") {
    val got = graft.queries.MlQueries.q292.fn(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    CacheRegistry.releaseAll()
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long"),
        expr("transform(embedding, x -> floor(cast(x as double) * 1000.0))"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Long](2).toArray))
    val k = 8
    def dist(q: Array[Long], c: Array[Long]): Long =
      q.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
    def assignAll(cents: Map[Long, Array[Long]]): Map[Long, (Long, Long)] =
      vecs.map { case (vid, _, q) =>
        val (cid, d) = cents.toSeq
          .map { case (cid, c) => (cid, dist(q, c)) }
          .minBy { case (cid, d) => (d, cid) }
        vid -> (cid, d)
      }.toMap
    def updateAll(asg: Map[Long, (Long, Long)]): Map[Long, Array[Long]] =
      vecs.groupBy { case (vid, _, _) => asg(vid)._1 }.map {
        case (cid, members) =>
          val n = members.length
          cid -> Array.tabulate(64) { i =>
            val s = members.map(_._3(i)).sum
            // floor-div toward zero == Spark `div` == DuckDB `//`
            s / n
          }
      }
    var cents = vecs.filter(_._1 < k)
      .map { case (vid, _, q) => vid -> q }.toMap
    for (_ <- 1 to 2) cents = updateAll(assignAll(cents))
    val fin = assignAll(cents)
    val byCid = vecs.groupBy { case (vid, _, _) => fin(vid)._1 }
    assert(got.keySet == byCid.keySet, "cluster id sets differ")
    for ((cid, members) <- byCid) {
      val (n, wcss, topLabel, purityPpm) = got(cid)
      assert(n == members.length.toLong, s"cid=$cid n")
      assert(wcss == members.map { case (vid, _, _) => fin(vid)._2 }.sum,
        s"cid=$cid wcss")
      val counts = members.groupBy(_._2).view.mapValues(_.length.toLong)
      val (lbl, cnt) = counts.toSeq.maxBy { case (l, c) => (c, -l) }
      assert(topLabel == lbl, s"cid=$cid top_label")
      assert(purityPpm == cnt * 1000000L / n, s"cid=$cid purity")
    }
  }

  test("q293 Cramer solve recovers planted coefficients on an exact-fit frame") {
    import spark.implicits._
    // y = 700 + 3*x1 - 11*x2 exactly -> betas must come back as
    // 700e6 / 3e6 / -11e6 ppm (pinned-float floor is exact on
    // integer-valued quotients representable in double)
    val rows = for (i <- 1 to 500) yield {
      val x1 = (i * 7) % 50 + 1L
      val x2 = (i * 13) % 10 + 1L
      (x1, x2, 700L + 3L * x1 - 11L * x2)
    }
    val df = rows.toDF("x1", "x2", "y")
    val out = df
      .agg(count(lit(1)).as("n"), sum("x1").as("s1"), sum("x2").as("s2"),
        sum(expr("x1 * x1")).as("s11"), sum(expr("x1 * x2")).as("s12"),
        sum(expr("x2 * x2")).as("s22"), sum("y").as("sy"),
        sum(expr("x1 * y")).as("s1y"), sum(expr("x2 * y")).as("s2y"))
      .select(
        expr("cast(n as double)").as("dn"), expr("cast(s1 as double)").as("d1"),
        expr("cast(s2 as double)").as("d2"), expr("cast(s11 as double)").as("d11"),
        expr("cast(s12 as double)").as("d12"), expr("cast(s22 as double)").as("d22"),
        expr("cast(sy as double)").as("dy"), expr("cast(s1y as double)").as("d1y"),
        expr("cast(s2y as double)").as("d2y"))
      .select(
        expr(s"cast(floor((${graft.queries.MlQueries.det0Expr}) / (${graft.queries.MlQueries.detExpr}) * 1000000.0) as bigint)").as("b0"),
        expr(s"cast(floor((${graft.queries.MlQueries.det1Expr}) / (${graft.queries.MlQueries.detExpr}) * 1000000.0) as bigint)").as("b1"),
        expr(s"cast(floor((${graft.queries.MlQueries.det2Expr}) / (${graft.queries.MlQueries.detExpr}) * 1000000.0) as bigint)").as("b2"))
      .head()
    assert(out.getLong(0) == 700000000L, s"beta0 ${out.getLong(0)}")
    assert(out.getLong(1) == 3000000L, s"beta1 ${out.getLong(1)}")
    assert(out.getLong(2) == -11000000L, s"beta2 ${out.getLong(2)}")
  }

  test("q301 power iteration equals the naive BigInt trajectory") {
    val got = graft.queries.MlQueries.q301.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    CacheRegistry.releaseAll()
    val vecs = Tables(spark, dir, "embeddings")
      .select(expr("transform(embedding, x -> floor(cast(x as double) * 1000.0))"))
      .collect().map(_.getSeq[Long](0).toArray)
    val n = vecs.length
    val means = Array.tabulate(64)(i => vecs.map(_(i)).sum / n)
    val dev = vecs.map(q => Array.tabulate(64)(i => q(i) - means(i)))
    val cov = Array.tabulate(64, 64)((i, j) =>
      BigInt(dev.map(d => d(i) * d(j)).sum))
    var v = Array.fill(64)(BigInt(1000000))
    for (_ <- 1 to 3) {
      val u = Array.tabulate(64)(i =>
        (0 until 64).map(j => cov(i)(j) * v(j)).sum)
      val mx = u.map(_.abs).max
      v = u.map(x => x * 1000000 / mx) // BigInt / truncates toward zero
    }
    val num = (for (i <- 0 until 64; j <- 0 until 64)
      yield cov(i)(j) * v(i) * v(j)).sum
    val den = v.map(x => x * x).sum
    val lambda = (num / den).toLong
    for (i <- 0 until 64) {
      assert(got(i)._1 == (i + 1).toLong)
      assert(got(i)._2 == v(i).toLong, s"dim ${i + 1} v_ppm")
      assert(got(i)._3 == lambda, s"dim ${i + 1} lambda")
    }
  }

  test("q294 doubled-U equals naive midrank computation") {
    val row = graft.queries.MlQueries.q294.fn(spark, dir).head()
    CacheRegistry.releaseAll()
    val ev = Tables(spark, dir, "events")
      .where(col("event_type").isin("click", "view"))
      .select(expr("cast(floor(value * 100) as bigint)"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val sorted = ev.sortBy(_._1)
    // doubled midranks: for the tie-group occupying 1-based positions
    // [i, j], each member's doubled rank is i + j
    val rank2 = scala.collection.mutable.Map.empty[Long, Long]
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j + 1 < sorted.length && sorted(j + 1)._1 == sorted(i)._1) j += 1
      rank2(sorted(i)._1) = (i + 1).toLong + (j + 1).toLong
      i = j + 1
    }
    val na = ev.count(_._2 == "click").toLong
    val nb = ev.count(_._2 == "view").toLong
    val r2a = ev.filter(_._2 == "click").map(e => rank2(e._1)).sum
    val r2b = ev.filter(_._2 == "view").map(e => rank2(e._1)).sum
    assert(row.getLong(0) == na && row.getLong(1) == nb, "group sizes")
    assert(row.getLong(2) == r2a - na * (na + 1), "u2_a")
    assert(row.getLong(3) == r2b - nb * (nb + 1), "u2_b")
    // identity: U_a + U_b = n_a * n_b
    assert(row.getLong(2) + row.getLong(3) == 2 * na * nb, "U identity")
  }
}

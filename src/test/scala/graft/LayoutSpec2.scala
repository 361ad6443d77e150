package graft

import org.apache.spark.sql.functions._

/** Property pins for the round-13 layout/frontier/integrity wave
  * (q233–q235): the Z-order audit's defining asymmetry, skyline
  * non-domination verified against brute force, and the homoglyph
  * screen recovering exactly its known injection. sf0.001 fixture. */
class LayoutSpec2 extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q233: single-key layout skips ~nothing on the other dim; " +
      "z-order skips on BOTH dims") {
    val out = graft.queries.LayoutQueries.q233.fn(spark, dir).collect()
      .map(r => (r.getAs[String]("layout"), r.getAs[String]("probe_dim")) ->
        r.getAs[Long]("skip_ppm")).toMap
    assert(out.size == 4)
    // the single-key (user) layout cannot skip day probes: every
    // user-zone spans the full day range
    assert(out(("single_key", "d")) == 0L,
      s"single-key layout claims day skipping: $out")
    // it skips its own key well
    assert(out(("single_key", "u")) > 500000L)
    // z-order trades a little u-skipping for real d-skipping: both
    // dims must skip a meaningful fraction
    assert(out(("zorder", "u")) > 250000L, s"zorder u: $out")
    assert(out(("zorder", "d")) > 250000L, s"zorder d: $out")
  }

  test("q234: no skyline point dominates another; every non-skyline " +
      "candidate is dominated by some skyline point (brute force)") {
    val out = graft.queries.LayoutQueries.q234.fn(spark, dir).collect()
      .map(r => (r.getAs[Long]("price_cents"), r.getAs[Long]("order_day")))
    assert(out.nonEmpty)
    // mutual non-domination: price strictly increases, day strictly
    // increases along the frontier (minimize price, maximize recency)
    val sorted = out.sortBy(_._1).toSeq
    for (Seq((x1, d1), (x2, d2)) <- sorted.sliding(2)) {
      assert(x1 < x2, "duplicate price on frontier")
      assert(d1 < d2, s"($x2,$d2) dominated by ($x1,$d1)")
    }
    // completeness: brute-force the distinct point set
    val pts = Tables(spark, dir, "orders")
      .select(expr("cast(round(o_totalprice * 100) as bigint)").as("x"),
        expr("cast(datediff(o_orderdate, date'1970-01-01') as bigint)")
          .as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val frontier = out.toSet
    for (p <- pts if !frontier.contains(p)) {
      assert(frontier.exists { case (fx, fd) =>
        fx <= p._1 && fd >= p._2 && (fx < p._1 || fd > p._2) },
        s"non-frontier point $p is not dominated")
    }
  }

  test("q240: Morton-bucketed radius join finds exactly the brute-force " +
      "pair set (no pair lost at cell borders, none duplicated)") {
    // sf0.01: 500 documents -> a few dozen qualifying pairs (sf0.001's
    // 50 points are too sparse to exercise the bands)
    val d01 = "/root/testdata/sf0.01"
    val out = graft.queries.LayoutQueries.q240.fn(spark, d01).collect()
    val r2 = 8192L * 8192L
    // brute force the same hash coordinates
    val pts = Tables(spark, d01, "documents")
      .selectExpr("doc_id as id",
        "pmod(cast(conv(substring(md5(concat('px|', doc_id)), 1, 15), 16, 10) as bigint), 1048576) as x",
        "pmod(cast(conv(substring(md5(concat('py|', doc_id)), 1, 15), 16, 10) as bigint), 1048576) as y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var want = 0L
    val bandWant = scala.collection.mutable.Map.empty[Long, Long]
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      val (_, x1, y1) = pts(i); val (_, x2, y2) = pts(j)
      val d2 = (x1 - x2) * (x1 - x2) + (y1 - y2) * (y1 - y2)
      if (d2 <= r2) {
        want += 1
        val b = d2 * 8 / (r2 + 1)
        bandWant(b) = bandWant.getOrElse(b, 0L) + 1
      }
    }
    assert(out.map(_.getAs[Long]("n_pairs")).sum == want,
      s"pair count ${out.map(_.getAs[Long]("n_pairs")).sum} vs brute $want")
    for (r <- out) {
      assert(r.getAs[Long]("n_pairs") == bandWant(r.getAs[Long]("band")))
      assert(r.getAs[Long]("max_d2") <= r2)
    }
  }

  test("q245: encoding-advisor laws — ndv <= runs <= n, models " +
      "consistent, and 'best' is the true argmin") {
    val out = graft.queries.LayoutQueries.q245.fn(spark, dir).collect()
    assert(out.length == 3)
    for (r <- out) {
      val n = r.getAs[Long]("n"); val ndv = r.getAs[Long]("ndv")
      val runs = r.getAs[Long]("runs")
      assert(ndv >= 1 && ndv <= runs && runs <= n,
        s"${r.getAs[String]("column_name")}: ndv $ndv runs $runs n $n")
      val sizes = Map(
        "plain" -> r.getAs[Long]("plain_bytes"),
        "rle" -> r.getAs[Long]("rle_bytes"),
        "dict" -> r.getAs[Long]("dict_bytes"))
      assert(sizes(r.getAs[String]("best")) == sizes.values.min)
    }
  }

  test("q235: the detector recovers exactly the injected 1-in-7 docs " +
      "and flags zero clean docs") {
    val out = graft.queries.LayoutQueries.q235.fn(spark, dir).collect()
    assert(out.nonEmpty)
    val injected = Tables(spark, dir, "documents")
      .select(col("source"), col("doc_id"))
      .withColumn("inj", expr(
        "pmod(cast(conv(substring(md5(concat('hg|', doc_id)), 1, 15), " +
          "16, 10) as bigint), 7) = 0"))
      .groupBy("source")
      .agg(sum(when(col("inj"), 1L).otherwise(0L)).as("n_inj"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("n_inj"))
      .toMap
    for (r <- out) {
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("flagged_docs") == injected(src),
        s"$src: flagged ${r.getAs[Long]("flagged_docs")} vs " +
          s"injected ${injected(src)}")
    }
  }
}

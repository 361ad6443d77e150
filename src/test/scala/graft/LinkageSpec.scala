package graft

import org.apache.spark.sql.functions._

/** Property pins for the round-12 governance tier (q221–q226) — the
  * laws the fixture oracle can't state for all inputs: count-min's
  * one-sided join-size error, rank-selected medians being actual data
  * values, and the k-anonymity ride-along being the true min. Runs on
  * the sf0.001 testdata (the smallest driver fixture). */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q222: count-min join-size estimate is a one-sided upper bound") {
    val r = graft.queries.LinkageQueries.q222.fn(spark, dir).head()
    val exact = r.getAs[Long]("exact_rows")
    val est = r.getAs[Long]("cm_estimate")
    val ppm = r.getAs[Long]("overest_ppm")
    assert(est >= exact, "CM inner product never underestimates")
    assert(ppm >= 0L)
    // w=256 buckets vs ~150 keys: collisions must stay moderate
    assert(ppm < 500000L, s"overestimate $ppm ppm out of character")
  }

  test("q223: med and mad are actual data values (rank-select, " +
      "never interpolation)") {
    val ev = Tables(spark, dir, "events")
      .select(col("event_type"), col("value")).cache()
    try {
      val out = graft.queries.LinkageQueries.q223.fn(spark, dir).collect()
      assert(out.nonEmpty)
      for (row <- out) {
        val et = row.getAs[String]("event_type")
        val med = row.getAs[Double]("med")
        val vals = ev.where(col("event_type") === et)
          .select("value").as[Double].collect()
        assert(vals.contains(med), s"median of $et must be a data value")
        val mad = row.getAs[Double]("mad")
        assert(vals.map(v => math.abs(v - med)).contains(mad),
          s"MAD of $et must be a realized absolute deviation")
      }
    } finally ev.unpersist()
  }

  test("q223 scale shape: no window over raw events — every Window " +
      "node sits above an Aggregate (bounded offset frames only)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val plan = graft.queries.LinkageQueries.q223.fn(spark, dir)
      .queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.forall(w =>
      w.child.collectFirst { case a: Aggregate => a }.isDefined),
      "a Window directly over raw event rows funnels a whole event " +
        "type through one task — q223 must rank via the two-phase " +
        "prefix-rank core instead")
  }

  test("DoubleSortKey: hex-lexicographic key order IS double order " +
      "(negatives, zeros, subnormals, codegen and interpreted)") {
    val rnd = new scala.util.Random(13L)
    val doubles = Seq(0.0, -0.0, 1.0, -1.0, Double.MinPositiveValue,
      -Double.MinPositiveValue, 1e308, -1e308, 3.14, -2.71) ++
      Seq.fill(500)(math.tan(rnd.nextDouble() * 3.0 - 1.5) *
        math.pow(10, rnd.nextInt(12) - 6))
    val df = doubles.zipWithIndex.toDF("v", "i")
      .withColumn("k", lpad(hex(
        org.apache.spark.sql.graftvec.VectorExpressions
          .doubleSortKey(col("v"))), 16, "0"))
    val rows = df.select("v", "k").collect()
      .map(r => (r.getDouble(0), r.getString(1)))
    // strict monotonicity: v1 < v2 ⇔ k1 < k2 (−0.0 vs 0.0 compare
    // equal as doubles, so the v1 < v2 guard skips exactly that pair)
    for ((v1, k1) <- rows; (v2, k2) <- rows if v1 < v2)
      assert(k1 < k2, s"key order broke between $v1 and $v2")
    assert(rows.nonEmpty && rows.forall(_._2.length == 16))
  }

  test("q226: the k_anon ride-along equals the true min class size " +
      "and suppression flags agree with it") {
    val out = graft.queries.LinkageQueries.q226.fn(spark, dir).collect()
    val sizes = out.map(_.getAs[Long]("class_size"))
    val k = out.head.getAs[Long]("k_anon")
    assert(out.forall(_.getAs[Long]("k_anon") == k))
    assert(k == sizes.min)
    assert(out.forall(r =>
      r.getAs[Boolean]("suppress") == (r.getAs[Long]("class_size") < 5)))
  }

  test("q221: linkage scores sit in [0.84, 1) ppm and the dictionary " +
      "self-join emits each unordered pair once") {
    val out = graft.queries.LinkageQueries.q221.fn(spark, dir).collect()
    assert(out.nonEmpty)
    val pairs = out.map(r =>
      (r.getAs[String]("nm_a"), r.getAs[String]("nm_b")))
    assert(pairs.distinct.length == pairs.length)
    assert(pairs.forall { case (a, b) => a < b })
    assert(out.forall { r =>
      val ppm = r.getAs[Long]("jw_ppm")
      ppm >= 840000L && ppm < 1000000L
    })
  }
}

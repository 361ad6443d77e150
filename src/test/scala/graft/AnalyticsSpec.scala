package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Property pins for the round-12 sketch/analytics family — laws the
  * oracle compare cannot express because they hold for ALL inputs,
  * not just the fixture: KMV mergeability, count-min's one-sided
  * error, priority sampling's weight monotonicity, and the
  * Gini–Simpson bounds. Fixtures here are adversarial (skew, ties,
  * empties), not the synthetic corpus. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def h60(c: String): String =
    s"cast(conv(substring(md5($c), 1, 15), 16, 10) as bigint)"

  test("q209 scale shape: the OHLC bar is one aggregate — zero Window " +
      "nodes in the plan (min_by/max_by, not ranked sorts)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val plan = graft.queries.AnalyticsQueries.q209
      .fn(spark, "/root/testdata/sf0.001").queryExecution.optimizedPlan
    assert(plan.collect { case w: LWindow => w }.isEmpty,
      "a window over raw events funnels a hot (type, day) through one " +
        "task's sort — open/close must come from min_by/max_by")
  }

  test("q247: Theil-Sen slope is the true lower-median pairwise slope " +
      "(brute force over the daily frame)") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.AnalyticsQueries.q247.fn(spark, dir).collect()
    assert(out.nonEmpty)
    val daily = Tables(spark, dir, "events")
      .groupBy(col("event_type"),
        expr("cast(floor(cast(ts as long) / 86400) as bigint)").as("d"))
      .agg(expr("sum(cast(round(value * 100) as bigint))").as("x"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    for (r <- out) {
      val et = r.getAs[String]("event_type")
      val pts = daily(et).map(t => (t._2, t._3)).sortBy(_._1)
      val slopes = (for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield ((pts(j)._2 - pts(i)._2).toDouble /
          (pts(j)._1 - pts(i)._1).toDouble,
        pts(i)._1, pts(j)._1)).sortBy(t => (t._1, t._2, t._3))
      assert(r.getAs[Long]("n_pairs") == slopes.length.toLong)
      val med = slopes((slopes.length + 1) / 2 - 1)
      val gotSlope = r.getAs[Long]("med_dy_cents").toDouble /
        r.getAs[Long]("med_dx_days").toDouble
      assert(gotSlope == med._1, s"$et: $gotSlope vs ${med._1}")
    }
  }

  test("KMV mergeability: the sketch of a union equals the merge of " +
      "the sketches (k smallest of the k-smallest unions)") {
    val k = 16
    // two overlapping value sets, hashed the engine way
    val a = (0 until 200).map(i => s"v$i")
    val b = (150 until 400).map(i => s"v$i")
    def hashes(vs: Seq[String]): Seq[Long] =
      vs.toDF("v").selectExpr(h60("v")).as[Long].collect().sorted.toSeq
    val ha = hashes(a).take(k)
    val hb = hashes(b).take(k)
    val merged = (ha ++ hb).distinct.sorted.take(k)
    val direct = hashes((a ++ b).distinct).take(k)
    assert(merged == direct,
      "merging two KMV sketches must equal sketching the union")
  }

  test("KMV estimate is exact below k and within 3/sqrt(k) above it") {
    val k = 64
    val n = 5000
    val hs = (0 until n).map(i => s"item$i").toDF("v")
      .selectExpr(h60("v")).as[Long].collect().sorted
    val hk = hs(k - 1)
    val est = math.floor((k - 1).toDouble * 1152921504606846976.0 / hk)
    val rel = math.abs(est - n) / n.toDouble
    assert(rel < 3.0 / math.sqrt(k),
      s"KMV estimate $est vs true $n (rel err $rel)")
  }

  test("count-min never underestimates, even under heavy skew") {
    // one hot key (10k), many cold keys — the sketch's worst case is
    // collision ONTO a probe key, which only inflates
    val rows = Seq.fill(1)(("hot", 10000L)) ++
      (0 until 3000).map(i => (s"cold$i", 1L + i % 3))
    val counts = rows.toDF("tok", "cnt")
    val sketch = counts
      .select(col("tok"), col("cnt"), explode(expr("sequence(0, 3)")).as("d"))
      .withColumn("b", expr(s"pmod(${h60("concat(d, ':', tok)")}, 64)"))
      .groupBy("d", "b").agg(sum("cnt").as("cell"))
    val est = counts
      .select(col("tok"), col("cnt"), explode(expr("sequence(0, 3)")).as("d"))
      .withColumn("b", expr(s"pmod(${h60("concat(d, ':', tok)")}, 64)"))
      .join(sketch, Seq("d", "b"))
      .groupBy("tok", "cnt").agg(min("cell").as("est"))
    assert(est.where(col("est") < col("cnt")).count() == 0,
      "count-min must never underestimate")
    // and the hot key's estimate is tight (width 64 cells, min-of-4)
    val hot = est.where(col("tok") === "hot").select("est").as[Long].head()
    assert(hot >= 10000L && hot < 10000L + 1000L, s"hot est $hot")
  }

  test("priority sampling: doubling a document's weight never lowers " +
      "its priority, and the sample is deterministic across runs") {
    val docs = (0 until 500).map(i => (i.toLong, 1L + i % 40)).toDF("doc_id", "w")
    def prio(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("h31",
        expr(s"pmod(${h60("concat('ps|', doc_id)")}, 2147483648) + 1"))
      .withColumn("priority", expr("(w * 2147483648) div h31"))
    val p1 = prio(docs)
    val doubled = prio(docs.withColumn("w", col("w") * 2))
    val joined = p1.select(col("doc_id"), col("priority").as("p"))
      .join(doubled.select(col("doc_id"), col("priority").as("p2")), "doc_id")
    assert(joined.where(col("p2") < col("p")).count() == 0,
      "priority must be monotone in weight")
    // determinism: two evaluations agree exactly
    val s1 = p1.orderBy(desc("priority"), asc("doc_id")).limit(20)
      .select("doc_id").as[Long].collect().toSeq
    val s2 = prio(docs).orderBy(desc("priority"), asc("doc_id")).limit(20)
      .select("doc_id").as[Long].collect().toSeq
    assert(s1 == s2)
  }

  test("Gini-Simpson diversity ppm: 0 for single-char docs, tends to " +
      "1e6 for all-distinct, always within [0, 1e6]") {
    val docs = Seq(
      (1L, "aaaaaaaa"),             // one symbol → 0
      (2L, "abcdefgh"),             // all distinct → (n²-n)/n² · 1e6
      (3L, "aabb"),                 // half/half → 500000
      (4L, "x")                     // single char → 0
    ).toDF("doc_id", "text")
    val got = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
      .where(col("c") =!= "")
      .groupBy("doc_id", "c").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n"), sum(col("cnt") * col("cnt")).as("s2"))
      .withColumn("g", expr("((n * n - s2) * 1000000) div (n * n)"))
      .select("doc_id", "g").as[(Long, Long)].collect().toMap
    assert(got(1L) == 0L && got(4L) == 0L)
    assert(got(3L) == 500000L)
    assert(got(2L) == (64L - 8L) * 1000000L / 64L) // 875000
    assert(got.values.forall(g => g >= 0L && g <= 1000000L))
  }

  test("log-quantile bin bracket always contains the exact quantile") {
    val vals = (1 to 2000).map(i => (1L + (i * i) % 3000).toLong)
    val df = vals.toDF("cents").where(col("cents") > 0)
    val binned = df
      .withColumn("bin", (length(expr("bin(cents)")) - 1).cast("long"))
      .groupBy("bin").agg(count(lit(1)).as("bc"))
    val w = Window.orderBy("bin")
    val n = vals.size.toLong
    for (q <- Seq(50, 90, 99)) {
      val qbin = binned
        .withColumn("cumc", sum("bc").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .where(col("cumc") * 100 >= lit(q) * n)
        .agg(min("bin")).as[Long].head()
      val exact = vals.sorted.apply(
        (math.ceil(q / 100.0 * n).toInt - 1).max(0))
      val lo = 1L << qbin.toInt
      val hi = (1L << (qbin.toInt + 1)) - 1
      assert(exact >= lo && exact <= hi,
        s"p$q exact $exact outside bracket [$lo, $hi]")
    }
  }
}

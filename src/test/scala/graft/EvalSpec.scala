package graft

import org.apache.spark.sql.functions._

/** Property pins for the round-13 evaluation tier (q236–q238): the
  * rank-sum AUC against a brute-force pair count, Wilson interval
  * ordering/coverage laws, and calibration-bin consistency. */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q236: rank-sum AUC equals the brute-force pair statistic " +
      "(wins + half-ties over all pos×neg pairs)") {
    val out = graft.queries.EvalQueries.q236.fn(spark, dir).head()
    val docs = Tables(spark, dir, "documents")
      .select(
        round(round(graft.functions.Text.qualityScore(col("text")), 6)
          * 1e6, 0).cast("long").as("q_u"),
        (col("lang") === "en").as("pos"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val ps = docs.filter(_._2).map(_._1)
    val ns = docs.filterNot(_._2).map(_._1)
    assert(out.getAs[Long]("n_pos") == ps.length.toLong)
    assert(out.getAs[Long]("n_neg") == ns.length.toLong)
    // brute force in doubled units to stay integer: win=2, tie=1
    var num2 = 0L
    for (p <- ps; n <- ns)
      num2 += (if (p > n) 2L else if (p == n) 1L else 0L)
    val wantPpm = num2 * 1000000L / (2L * ps.length * ns.length)
    assert(out.getAs[Long]("auc_ppm") == wantPpm,
      s"rank-sum ${out.getAs[Long]("auc_ppm")} vs brute $wantPpm")
  }

  test("q239: KS statistic equals the brute-force max CDF gap and " +
      "the reported threshold attains it") {
    val out = graft.queries.EvalQueries.q239.fn(spark, dir).head()
    val docs = Tables(spark, dir, "documents")
      .select(
        round(round(graft.functions.Text.qualityScore(col("text")), 6)
          * 1e6, 0).cast("long").as("q_u"),
        (col("lang") === "en").as("en"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val as = docs.filter(_._2).map(_._1).sorted
    val bs = docs.filterNot(_._2).map(_._1).sorted
    val nA = as.length.toLong; val nB = bs.length.toLong
    assert(out.getAs[Long]("n_a") == nA && out.getAs[Long]("n_b") == nB)
    val thresholds = (as ++ bs).distinct.sorted
    def gapAt(t: Long): Long =
      math.abs(as.count(_ <= t) * nB - bs.count(_ <= t) * nA)
    val dScaled = thresholds.map(gapAt).max
    assert(out.getAs[Long]("d_ppm") == dScaled * 1000000L / (nA * nB))
    assert(gapAt(out.getAs[Long]("at_q_u")) == dScaled,
      "reported threshold must attain the max gap")
  }

  test("q237: Wilson interval brackets the point rate and the gate " +
      "matches its own lower bound") {
    val out = graft.queries.EvalQueries.q237.fn(spark, dir).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val lo = r.getAs[Long]("wilson_lo_ppm")
      val hi = r.getAs[Long]("wilson_hi_ppm")
      val rate = r.getAs[Long]("rate_ppm")
      assert(lo <= rate && rate <= hi,
        s"${r.getAs[String]("source")}: [$lo,$hi] must bracket $rate")
      assert(lo >= 0L && hi <= 1000000L, "bounds live in [0,1]")
      assert(r.getAs[Boolean]("gate_fail") == (lo > 300000L))
    }
  }

  test("q241: sessions partition the event stream and native " +
      "session_window agrees with the batch lag/cumsum replay") {
    val out = graft.queries.EvalQueries.q241.fn(spark, dir).collect()
    assert(out.nonEmpty)
    val covered = out.map(r =>
      r.getAs[Long]("n_events") * r.getAs[Long]("n_sessions")).sum
    assert(covered == Tables(spark, dir, "events").count(),
      "every event must land in exactly one session")
    // replay sessionization independently (scala fold over sorted
    // per-user micro-times) and compare the histogram
    val evs = Tables(spark, dir, "events")
      .selectExpr("user_id", "unix_micros(ts) as t")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val hist = scala.collection.mutable.Map.empty[Long, Long]
    for ((_, ts) <- evs) {
      var n = 0L
      var prev = Long.MinValue
      for (t <- ts) {
        if (prev == Long.MinValue || t - prev >= 1800000000L) {
          if (n > 0) hist(n) = hist.getOrElse(n, 0L) + 1
          n = 0L
        }
        n += 1; prev = t
      }
      if (n > 0) hist(n) = hist.getOrElse(n, 0L) + 1
    }
    val got = out.map(r =>
      r.getAs[Long]("n_events") -> r.getAs[Long]("n_sessions")).toMap
    assert(got == hist.toMap, s"histogram $got vs replay $hist")
  }

  test("q238: bins partition the corpus, mean prediction lives inside " +
      "its bin, observed rates are probabilities") {
    val out = graft.queries.EvalQueries.q238.fn(spark, dir).collect()
    assert(out.nonEmpty)
    val total = out.map(_.getAs[Long]("n")).sum
    assert(total == Tables(spark, dir, "documents").count())
    for (r <- out) {
      val bin = r.getAs[Long]("bin")
      val mp = r.getAs[Long]("mean_pred_u")
      val lo = bin * 100000L
      val hi = if (bin == 9L) 1000000L else (bin + 1) * 100000L
      assert(mp >= lo && mp <= hi, s"bin $bin mean $mp outside [$lo,$hi]")
      val obs = r.getAs[Long]("obs_pos_ppm")
      assert(obs >= 0L && obs <= 1000000L)
    }
  }
}

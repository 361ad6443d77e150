package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftagg.{KllAgg, KllSketch}

/** The native KLL quantile aggregate: exactness below capacity, the
  * self-certified worst-case rank bound under varied partitionings,
  * per-group independence, serialization round trip, SQL
  * registration. All ground truths are independent in-memory sorts.
  */
class KllSpec extends SparkSpec {
  import spark.implicits._

  private def parse(s: String): Map[String, Long] =
    s.split(',').map { kv =>
      val Array(a, b) = kv.split('='); (a, b.toLong)
    }.toMap

  /** Deterministic pseudo-random longs (LCG), no Math.random. */
  private def lcg(n: Int, seed: Long = 42L): Array[Long] = {
    var x = seed
    Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      math.abs(x % 1000000L)
    }
  }

  test("exact below capacity: quantiles are true order statistics") {
    val vals = lcg(200)
    val got = parse(vals.toSeq.toDF("v")
      .agg(KllAgg.graftKll(col("v"), 256, Seq(0.1, 0.5, 0.9)).as("s"))
      .head().getString(0))
    val sorted = vals.sorted
    assert(got("n") == 200L)
    for ((p, ppm) <- Seq((0.1, "q100000"), (0.5, "q500000"), (0.9, "q900000")))
      assert(got(ppm) == sorted(math.ceil(p * 200).toInt - 1),
        s"phi=$p got=${got(ppm)}")
  }

  test("worst-case rank bound holds under every partitioning") {
    val vals = lcg(50000)
    val sorted = vals.sorted
    def trueRank(v: Long): Long = {
      // count(x <= v) via binary search on the sorted array
      var lo = 0; var hi = sorted.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (sorted(mid) <= v) lo = mid + 1 else hi = mid
      }
      lo.toLong
    }
    for (parts <- Seq(1, 7, 32)) {
      val got = parse(vals.toSeq.toDF("v").repartition(parts)
        .agg(KllAgg.graftKll(col("v"), 256,
          Seq(0.01, 0.25, 0.5, 0.75, 0.99)).as("s"))
        .head().getString(0))
      assert(got("n") == 50000L)
      val err = got("err")
      // self-certified bound is sane: < 4% of n for k=256 at this n
      assert(err > 0 && err < 2000, s"err=$err parts=$parts")
      for (p <- Seq(0.01, 0.25, 0.5, 0.75, 0.99)) {
        val target = math.max(1L, math.ceil(p * 50000).toLong)
        val v = got(s"q${math.round(p * 1e6)}")
        val r = trueRank(v)
        // true_rank(answer) is within the self-certified bound of the
        // target, and the answer is a genuine data value
        assert(math.abs(r - target) <= err,
          s"phi=$p parts=$parts rank=$r target=$target err=$err")
        assert(java.util.Arrays.binarySearch(sorted, v) >= 0)
      }
    }
  }

  test("per-group sketches are independent") {
    val df = (0 until 3000).map(i => (i % 3, (i * 37 % 500).toLong))
      .toDF("g", "v")
    val rows = df.groupBy("g")
      .agg(KllAgg.graftKll(col("v"), 64, Seq(0.5)).as("s"))
      .collect().map(r => (r.getInt(0), parse(r.getString(1)))).toMap
    assert(rows.size == 3)
    rows.values.foreach(m => assert(m("n") == 1000L))
  }

  test("serialization round trip preserves the ladder") {
    val sk = new KllSketch(16)
    lcg(5000, seed = 7L).foreach(sk.add)
    val back = KllSketch.fromBytes(sk.toBytes)
    assert(back.n == sk.n && back.errAcc == sk.errAcc &&
      back.k == sk.k &&
      back.levels.map(_.sorted.toSeq) == sk.levels.map(_.sorted.toSeq))
    for (p <- Seq(0.1, 0.5, 0.9))
      assert(back.quantile(p) == sk.quantile(p))
  }

  test("merge bound accumulates: merged err = sum + own compactions") {
    val a = new KllSketch(16)
    val b = new KllSketch(16)
    lcg(2000, 1L).foreach(a.add)
    lcg(2000, 2L).foreach(b.add)
    val errBefore = a.errAcc + b.errAcc
    val nA = a.n
    a.mergeIn(b)
    assert(a.n == nA + 2000)
    assert(a.errAcc >= errBefore) // merge may compact, never forgets
    // bound still holds after merge
    val all = (lcg(2000, 1L) ++ lcg(2000, 2L)).sorted
    for (p <- Seq(0.25, 0.5, 0.75)) {
      val v = a.quantile(p)
      val target = math.max(1L, math.ceil(p * a.n).toLong)
      val r = all.count(_ <= v).toLong
      assert(math.abs(r - target) <= a.errClaim,
        s"phi=$p rank=$r target=$target claim=${a.errClaim}")
    }
  }

  test("registered as SQL function graft_kll via GraftExtensions") {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val sess = SparkSession.builder()
        .master(base.sparkContext.master)
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val s = sess.sql(
        "SELECT graft_kll(id, 64, array(0.5D)) FROM range(0, 1000)")
        .head().getString(0)
      val m = parse(s)
      assert(m("n") == 1000L)
      assert(math.abs(m("q500000") - 500L) <= m("err"))
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}

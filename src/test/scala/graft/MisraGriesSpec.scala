package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftagg.MisraGriesAgg

/** The Misra–Gries native aggregate: the PODS'12 mergeable-summary
  * guarantees (underestimate bounded by N/k; every > N/k item
  * present) verified against exact counts under varied partitionings,
  * exactness below capacity, serialization through repartitioned
  * merges, and the SQL registration. */
class MisraGriesSpec extends SparkSpec {

  import spark.implicits._

  private def parse(s: String): Map[Long, Long] =
    if (s.isEmpty) Map.empty
    else s.split(',').map { p =>
      val Array(i, c) = p.split(':'); i.toLong -> c.toLong
    }.toMap

  /** Deterministic skewed stream: item = isqrt(h mod 10000). */
  private def skewed(n: Int) = spark.range(0, n)
    .selectExpr(
      "cast(floor(sqrt(cast(pmod(cast(conv(substring(md5(cast(id as " +
        "string)), 1, 15), 16, 10) as bigint), 10000) as double))) " +
        "as bigint) as item")

  test("exact when distinct items fit the k-1 capacity") {
    val df = spark.range(0, 1000).selectExpr("id % 10 as item")
    for (parts <- Seq(1, 7)) {
      val s = df.repartition(parts)
        .agg(MisraGriesAgg.graftMg(col("item"), 64)).head().getString(0)
      val got = parse(s)
      assert(got == (0L until 10L).map(_ -> 100L).toMap, s"parts=$parts")
    }
  }

  test("MG guarantees hold vs exact counts under varied partitionings") {
    val df = skewed(20000)
    val exact = df.groupBy("item").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    for (k <- Seq(16, 64); parts <- Seq(1, 3, 11)) {
      val s = df.repartition(parts)
        .agg(MisraGriesAgg.graftMg(col("item"), k)).head().getString(0)
      val est = parse(s)
      assert(est.size <= k - 1, s"k=$k parts=$parts size")
      for ((i, e) <- est) {
        val t = exact.getOrElse(i, 0L)
        assert(e <= t, s"k=$k parts=$parts item $i over-estimated")
        assert(t - e <= n / k, s"k=$k parts=$parts item $i bound")
      }
      // every item strictly above N/k must be present
      for ((i, t) <- exact if t * k > n)
        assert(est.contains(i), s"k=$k parts=$parts heavy item $i missing")
    }
  }

  test("grouped summaries are independent per group") {
    val df = spark.range(0, 4000)
      .selectExpr("id % 2 as g", "(id % 7) + (id % 2) * 100 as item")
    val rows = df.groupBy("g")
      .agg(MisraGriesAgg.graftMg(col("item"), 32).as("s"))
      .collect().map(r => r.getLong(0) -> parse(r.getString(1))).toMap
    assert(rows(0L).keySet == (0L until 7L).toSet)
    assert(rows(1L).keySet == (100L until 107L).toSet)
  }

  test("registered as SQL function graft_mg via GraftExtensions") {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val sess = SparkSession.builder()
        .master(base.sparkContext.master)
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val s = sess.sql(
        "SELECT graft_mg(id % 5, 16) FROM range(0, 500)")
        .head().getString(0)
      assert(parse(s) == (0L until 5L).map(_ -> 100L).toMap)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}

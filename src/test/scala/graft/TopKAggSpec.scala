package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftagg.TopKAgg

/** The native bounded-heap top-k aggregate: exactness vs the naive
  * sort, invariance under partition layout (the semilattice claim —
  * any merge order, same survivors), tie handling (value ties break
  * to the lowest id), SQL registration, and the plan contract (no
  * Window, no corpus-wide Sort below the aggregate). */
class TopKAggSpec extends SparkSpec {

  private def naiveTop(rows: Seq[(String, Long, Long)], k: Int)
      : Map[String, String] =
    rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3))
        .sortBy { case (v, id) => (-v, id) }
        .take(k).map { case (v, id) => s"$id@$v" }.mkString(",")
    }

  private val rows: Seq[(String, Long, Long)] = {
    var seed = 20260815L
    def next(): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      math.abs(seed % 1000)
    }
    (1 to 500).map(i => (s"g${i % 7}", next(), i.toLong))
  }

  test("equals naive top-k; invariant under 1/7/32 partitions") {
    import spark.implicits._
    val want = naiveTop(rows, 3)
    for (p <- Seq(1, 7, 32)) {
      val df = rows.toDF("g", "v", "id").repartition(p)
      val got = df.groupBy("g")
        .agg(TopKAgg.graftTopK(col("v"), col("id"), 3).as("t"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == want, s"partitions=$p")
    }
  }

  test("ties break to the lowest id; k larger than group returns all") {
    import spark.implicits._
    val t = Seq(("a", 5L, 9L), ("a", 5L, 2L), ("a", 5L, 7L), ("b", 1L, 1L))
      .toDF("g", "v", "id")
      .groupBy("g").agg(TopKAgg.graftTopK(col("v"), col("id"), 2).as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(t("a") == "2@5,7@5")
    assert(t("b") == "1@1")
  }

  test("SQL registration via graft_topk; plan has no Window/Sort below the agg") {
    import org.apache.spark.sql.SparkSession
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val sess = SparkSession.builder()
        .master(base.sparkContext.master)
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import sess.implicits._
      rows.toDF("g", "v", "id").createOrReplaceTempView("topk_in")
      val df = sess.sql(
        "SELECT g, graft_topk(v, id, 3) AS t FROM topk_in GROUP BY g")
      val got = df.collect().map(r => r.getString(0) -> r.getString(1))
        .toMap
      assert(got == naiveTop(rows, 3))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), "plan must not contain a Window")
      assert(plan.contains("graft_topk"), "agg must appear in the plan")
      // the only Sort allowed would be above the aggregate (none here)
      assert(!plan.contains("Sort "), s"unexpected Sort in plan:\n$plan")
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("serialization round-trips through a real shuffle with nulls") {
    import spark.implicits._
    val withNulls = Seq(
      (Some("a"), Some(3L), Some(1L)), (Some("a"), None, Some(2L)),
      (Some("a"), Some(9L), None), (Some("a"), Some(7L), Some(4L)))
      .toDF("g", "v", "id").repartition(5)
    val got = withNulls.groupBy("g")
      .agg(TopKAgg.graftTopK(col("v"), col("id"), 2).as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // null value or null id rows are skipped
    assert(got("a") == "4@7,1@3")
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftagg.HllAgg

/** The native HLL TypedImperativeAggregate: bit-parity with the q230
  * register-table formulation, partition invariance (the merge path),
  * partial aggregation in the plan, null handling, and the SQL-name
  * registration through GraftExtensions. */
class HllAggSpec extends SparkSpec {

  import spark.implicits._

  /** q230's declarative register-table estimate for the same hashes —
    * the ground truth the native aggregate must reproduce exactly. */
  private def declarative(hashes: Seq[Long]): Long = {
    val regs = hashes.map { h =>
      val bucket = (((h % 256) + 256) % 256).toInt
      val v = h / 256
      val rho =
        if (v == 0) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(v))
      bucket -> rho
    }.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).max }
    val sExact = (0 until 256).map { b =>
      regs.get(b) match {
        case Some(r) => 1L << (53 - r)
        case None => 9007199254740992L
      }
    }.sum
    math.floor((0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0 *
      9007199254740992.0 / sExact.toDouble).toLong
  }

  private def h60(df: org.apache.spark.sql.DataFrame, c: String) =
    df.withColumn("h", expr(
      s"cast(conv(substring(md5(cast($c as string)), 1, 15), 16, 10) as bigint)"))

  test("estimate equals the declarative register-table computation") {
    val df = h60(spark.range(0, 5000).toDF("k"), "k")
    val hashes = df.select("h").as[Long].collect().toSeq
    val got = df.agg(HllAgg.graftHll(col("h"))).head().getLong(0)
    assert(got == declarative(hashes))
    // sanity: the estimate is in the right ballpark for 5000 distinct
    assert(math.abs(got - 5000) < 500)
  }

  test("partition-invariant: merge path yields the identical estimate") {
    val df = h60(spark.range(0, 3000).toDF("k"), "k")
    val one = df.coalesce(1).agg(HllAgg.graftHll(col("h"))).head().getLong(0)
    val many = df.repartition(7).agg(HllAgg.graftHll(col("h"))).head().getLong(0)
    assert(one == many)
  }

  test("duplicates do not move the estimate; nulls are ignored") {
    val base = h60(spark.range(0, 1000).toDF("k"), "k")
    val dup = base.union(base).union(base)
    assert(base.agg(HllAgg.graftHll(col("h"))).head().getLong(0) ==
      dup.agg(HllAgg.graftHll(col("h"))).head().getLong(0))
    val withNulls = base.select(
      when(col("k") % 2 === 0, col("h")).otherwise(lit(null)).as("h"))
    val onlyEven = base.where(col("k") % 2 === 0)
    assert(withNulls.agg(HllAgg.graftHll(col("h"))).head().getLong(0) ==
      onlyEven.agg(HllAgg.graftHll(col("h"))).head().getLong(0))
  }

  test("grouped: per-group sketches are independent") {
    val df = h60(spark.range(0, 2000).toDF("k"), "k")
      .withColumn("g", col("k") % 2)
    val grouped = df.groupBy("g").agg(HllAgg.graftHll(col("h")).as("e"))
      .orderBy("g").collect()
    val g0 = df.where(col("g") === 0)
      .agg(HllAgg.graftHll(col("h"))).head().getLong(0)
    assert(grouped(0).getLong(1) == g0)
    assert(grouped.length == 2)
  }

  test("plan runs PARTIAL aggregation (sketches merge, rows don't ship)") {
    val df = h60(spark.range(0, 100).toDF("k"), "k")
      .withColumn("g", col("k") % 4)
    val plan = df.groupBy("g").agg(HllAgg.graftHll(col("h")))
      .queryExecution.executedPlan.toString
    // TypedImperativeAggregate plans through ObjectHashAggregate with
    // a partial_ mode first stage
    assert(plan.contains("partial_graft_hll") ||
      plan.toLowerCase.contains("objecthashaggregate"),
      s"no partial aggregation visible in:\n$plan")
  }

  test("registered as SQL function graft_hll via GraftExtensions") {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val sess = SparkSession.builder()
        .master(base.sparkContext.master)
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val got = sess.sql(
        """SELECT graft_hll(cast(conv(substring(md5(cast(id as string)),
          |1, 15), 16, 10) as bigint)) AS e FROM range(0, 5000)
          |""".stripMargin).head().getLong(0)
      val hashes = sess.range(0, 5000).selectExpr(
        "cast(conv(substring(md5(cast(id as string)), 1, 15), 16, 10) as bigint) as h")
        .collect().map(_.getLong(0)).toSeq
      assert(got == declarative(hashes))
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}

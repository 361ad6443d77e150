package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftagg.CountMinAgg
import org.apache.spark.sql.graftagg.CountMinAgg.graftCms

/** The native count-min sketch aggregate: the defining identities
  * (row sums = N, estimate = min cell ≥ exact), a reference table
  * computed in plain Scala, partition invariance (merge is
  * elementwise addition), the serialize round-trip, the SQL surface,
  * and the negative-key guard.
  */
class CountMinAggSpec extends SparkSpec {

  import CountMinAgg.{A, B, D, P, W}

  private def refTable(keys: Seq[Long]): Array[Long] = {
    val t = new Array[Long](D * W)
    keys.foreach { k =>
      val x = k % P
      (0 until D).foreach(i => t(i * W + ((A(i) * x + B(i)) % P % W).toInt) += 1L)
    }
    t
  }

  test("matches the reference table exactly, invariant under partitioning") {
    import spark.implicits._
    val keys = (0 until 4000).map(i => (i * 2654435761L) % 1000L)
    val expected = refTable(keys).toSeq
    for (parts <- Seq(1, 4, 13)) {
      val got = keys.toDF("k").repartition(parts)
        .agg(graftCms(col("k")).as("sk"))
        .head().getSeq[Long](0)
      assert(got == expected, s"parts=$parts")
    }
  }

  test("defining identities: row sums = N; min-cell estimate >= exact") {
    import spark.implicits._
    val keys = (0 until 3000).map(i => (i % 41).toLong * 1000003L)
    val sk = keys.toDF("k").repartition(7)
      .agg(graftCms(col("k")).as("sk")).head().getSeq[Long](0)
    (0 until D).foreach { i =>
      assert(sk.slice(i * W, (i + 1) * W).sum == keys.length.toLong,
        s"row $i must sum to N")
    }
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (k, cnt) =>
      val est = (0 until D).map { i =>
        sk(i * W + ((A(i) * (k % P) + B(i)) % P % W).toInt)
      }.min
      assert(est >= cnt, s"key $k: est $est < exact $cnt")
    }
  }

  test("nulls skipped; empty input is the zero table; negative key throws") {
    import spark.implicits._
    val withNull = Seq(Some(5L), None, Some(5L)).toDF("k")
      .agg(graftCms(col("k"))).head().getSeq[Long](0)
    assert(withNull.sum == 2L * D)
    val empty = Seq.empty[Long].toDF("k")
      .agg(graftCms(col("k"))).head().getSeq[Long](0)
    assert(empty.forall(_ == 0L) && empty.length == D * W)
    val err = intercept[Exception] {
      Seq(-1L).toDF("k").agg(graftCms(col("k"))).head()
    }
    assert(err.getMessage != null)
  }

  test("SQL registration + probe expression: graft_cms from pure SQL") {
    import spark.implicits._
    (0 until 90).map(i => (i % 3).toLong).toDF("k")
      .createOrReplaceTempView("cms_v")
    val est = spark.sql(
      "SELECT least(" + (0 until D).map(i =>
        s"element_at(sk, ${CountMinAgg.cellExpr(i, "0")})").mkString(", ") +
        ") AS est FROM (SELECT graft_cms(k) AS sk FROM cms_v)")
      .head().getLong(0)
    // key 0 occurs 30 times; no guarantee of collision-freedom, but
    // with 3 distinct keys in 256 buckets the min cell is exact here
    assert(est == 30L)
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[graft.plans.DistinctToBitmap]]: the count(DISTINCT long) →
  * bitmap substitution must preserve answers exactly and refuse every
  * shape the bitmap can't represent. */
class DistinctToBitmapSpec extends SparkSpec {

  private val ConfKey = "spark.graft.bitmapDistinct.enabled"

  private def withRule[T](f: => T): T = {
    spark.conf.set(ConfKey, "true")
    try f finally spark.conf.unset(ConfKey)
  }

  private def rewritten(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString
      .contains("graft_bitmap_distinct")

  test("rewrites count(DISTINCT long); answers identical; nulls skipped") {
    import spark.implicits._
    val df = Seq(("a", Some(1L)), ("a", Some(1L)), ("a", Some(2L)),
      ("a", None), ("b", Some(7L)), ("b", Some(9L)), ("b", Some(7L)))
      .toDF("g", "k")
    def q(): DataFrame = df.groupBy("g")
      .agg(countDistinct(col("k")).as("n"), count(lit(1)).as("c"))
      .orderBy("g")
    val plain = rows(q())
    val viaBitmap = withRule {
      val out = q()
      assert(rewritten(out))
      rows(out)
    }
    assert(viaBitmap == plain)
    assert(plain.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) ==
      Seq(("a", 2L, 4L), ("b", 2L, 3L)))
  }

  test("FILTER clause rides along on the rewritten aggregate") {
    import spark.implicits._
    val df = Seq((1L, 10L), (1L, 10L), (2L, 20L), (3L, 30L))
      .toDF("k", "v")
    val got = withRule {
      val out = df.agg(
        expr("count(DISTINCT k) FILTER (WHERE v >= 20)").as("n"))
      assert(rewritten(out))
      out.head().getLong(0)
    }
    assert(got == 2L)
  }

  test("vetoes: string key, multi-column distinct, conf off") {
    import spark.implicits._
    val df = Seq(("x", 1L, 2L), ("y", 1L, 3L)).toDF("sk", "k1", "k2")
    withRule {
      assert(!rewritten(df.agg(countDistinct(col("sk")).as("n"))))
      assert(!rewritten(
        df.agg(countDistinct(col("k1"), col("k2")).as("n"))))
    }
    assert(!rewritten(df.agg(countDistinct(col("k1")).as("n"))))
  }
}

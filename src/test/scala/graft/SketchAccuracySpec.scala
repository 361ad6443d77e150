package graft

import org.apache.spark.sql.functions._

/** Machine-checked accuracy bounds for the q62 sketch aggregates.
  *
  * Sketches can't be oracle-hash-compared (implementations differ
  * across engines by design), but their error CONTRACTS are checkable
  * against the exact counterparts the engine also implements (q08/q54
  * verify those against DuckDB):
  *
  *  - `approx_count_distinct(c, rsd)` is HLL++ with relative standard
  *    deviation `rsd`; |approx − exact| ≤ 3·rsd·exact covers ~99.7% of
  *    randomness and the hash seed is fixed, so the assertion is
  *    deterministic for this data.
  *  - `percentile_approx(c, 0.5, acc)` (GK sketch) guarantees a
  *    deterministic rank error ≤ n/acc: the returned value must lie
  *    within the exact [0.5 − 1/acc, 0.5 + 1/acc] quantile envelope
  *    (one extra 1/acc of slack for boundary ties).
  */
class SketchAccuracySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct(rsd=0.02) within 3*rsd of exact per year") {
    val rsd = 0.02
    val both = Tables(spark, dir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy").as("year"))
      .agg(approx_count_distinct(col("o_custkey"), rsd).as("approx"),
        countDistinct(col("o_custkey")).as("exact"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val approx = r.getAs[Long]("approx").toDouble
      val exact = r.getAs[Long]("exact").toDouble
      assert(math.abs(approx - exact) <= 3 * rsd * exact,
        s"year=${r.getString(0)}: approx=$approx exact=$exact " +
          s"exceeds 3*rsd bound ${3 * rsd * exact}")
    }
  }

  test("percentile_approx(0.5, acc=1000) within the 1/acc quantile envelope") {
    val acc = 1000
    val eps = 2.0 / acc // documented n/acc rank error + tie slack
    val r = Tables(spark, dir, "orders")
      .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(acc)).as("approx"),
        percentile(col("o_totalprice"), lit(0.5 - eps)).as("lo"),
        percentile(col("o_totalprice"), lit(0.5 + eps)).as("hi"))
      .head()
    val (approx, lo, hi) =
      (r.getAs[Double]("approx"), r.getAs[Double]("lo"), r.getAs[Double]("hi"))
    assert(approx >= lo && approx <= hi,
      s"approx median $approx outside exact envelope [$lo, $hi]")
  }

  test("q62 error-contract booleans all TRUE per year (every SF)") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val rows = SparkEntry.queries("q62_sketch_agg")(spark, d).collect()
      assert(rows.nonEmpty, s"no rows at $d")
      rows.foreach { r =>
        assert(r.getAs[Boolean]("cd_ok"),
          s"$d year=${r.getString(0)}: approx_count_distinct outside 3*rsd")
        assert(r.getAs[Boolean]("pct_ok"),
          s"$d year=${r.getString(0)}: percentile_approx outside envelope")
      }
    }
  }
}

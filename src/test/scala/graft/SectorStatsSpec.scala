package graft

import org.apache.spark.sql.functions._
import graft.operators.SectorStats

/** Sector median enrichment (A1/A2/J1/J2): exact interpolating median,
  * per-sector broadcast join, overall fallback for all-null groups.
  */
class SectorStatsSpec extends SparkSpec {
  import spark.implicits._

  test("per-sector medians with overall fallback for all-null sectors") {
    val df = Seq(
      ("Tech", Some(10.0), Some(20.0)),
      ("Tech", Some(20.0), Some(30.0)),   // Tech median pe = 15 (interpolated)
      ("Fin", Some(8.0), None),           // Fin median pe = 8
      ("Ghost", None, None),              // all-null → falls back to overall
      ("Ghost", None, None)
    ).toDF("sector", "trailing_pe", "forward_pe")
    val got = SectorStats.enrich(df)
      .select("sector", "sector_median_pe", "pe_median_used")
      .distinct().orderBy("sector")
    val m = rows(got).map(r => r.getString(0) ->
      (Option(r.getAs[java.lang.Double](1)), r.getDouble(2))).toMap
    assert(m("Tech") == ((Some(15.0), 15.0)))
    assert(m("Fin") == ((Some(8.0), 8.0)))
    // overall median of (10,20,8) = 10
    assert(m("Ghost") == ((None, 10.0)))
  }

  test("median interpolates mean-of-middle-two (pandas/DuckDB parity)") {
    val df = Seq(("S", 1.0), ("S", 2.0), ("S", 100.0), ("S", 101.0))
      .toDF("sector", "trailing_pe").withColumn("forward_pe", lit(null).cast("double"))
    val got = SectorStats.enrich(df).select("sector_median_pe").distinct()
    assert(col1(got, "sector_median_pe") == Seq(51.0))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Cleanse

/** Cleanse stage (SURVEY.md §2 E10→F1→D1→E1→F3→F2) unit tests. */
class CleanseSpec extends SparkSpec {
  import spark.implicits._

  test("keep-first dedup is deterministic under the given order") {
    val df = Seq((3L, "A", "third"), (1L, "A", "first"), (2L, "A", "second"),
      (5L, "B", "only")).toDF("ord", "k", "v")
    val got = Cleanse.keepFirst(df, "k", col("ord")).orderBy("k")
    assert(rows(got).map(r => (r.getString(1), r.getString(2))) ==
      Seq(("A", "first"), ("B", "only")))
  }

  test("full cleanse: normalize, drop empties, dedup, repair") {
    val df = Seq(
      // (order, ticker, sector, price, market_cap)
      (1L, " brk.b ", "", "10.5", "100"),
      (2L, "BRK.B", "Tech", "99", "100"),    // dup of row 1 after normalize
      (3L, "", "Tech", "5", "100"),          // empty ticker dropped
      (4L, null, "Tech", "5", "100"),        // null ticker dropped
      (5L, "neg", "Fin", "-3", "0"),         // price/mcap repaired to null
      (6L, "bad", null, "oops", "1")         // unparseable price → null
    ).toDF("ord", "ticker", "sector", "price", "market_cap")
    val got = Cleanse(df, col("ord")).orderBy("ticker")
    val m = rows(got).map(r => r.getAs[String]("ticker") ->
      (r.getAs[String]("sector"), Option(r.getAs[java.lang.Double]("price")),
        Option(r.getAs[java.lang.Double]("market_cap")))).toMap
    assert(m.keySet == Set("BRK-B", "NEG", "BAD"))
    assert(m("BRK-B") == (("Unknown", Some(10.5), Some(100.0)))) // first wins
    assert(m("NEG") == (("Fin", None, None)))
    assert(m("BAD") == (("Unknown", None, Some(1.0))))
  }
}

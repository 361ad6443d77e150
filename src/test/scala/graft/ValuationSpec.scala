package graft

import org.apache.spark.sql.functions._
import graft.functions.{Valuation => V, ValuationThresholds}

/** Unit tests for the scalar expression library (SURVEY.md §2.7 E1–E12)
  * with the adversarial inputs of §5: nulls, NaN, ±inf, non-positive
  * values, growth-unit boundary, fair_value = 0.
  */
class ValuationSpec extends SparkSpec {
  import spark.implicits._

  private val th = ValuationThresholds()

  test("E1 safeDouble: NaN/±inf/malformed → null, numerics preserved") {
    val df = Seq("1.5", "nope", "NaN", "Infinity", "-Infinity", null)
      .toDF("x").select(V.safeDouble($"x").as("d"))
    assert(col1(df, "d") == Seq(1.5, null, null, null, null, null))
  }

  test("E10 normalizeTicker: strip/upper/dot→dash") {
    val df = Seq("  brk.b ", "AAPL", "a.b.c").toDF("t")
      .select(V.normalizeTicker($"t").as("n"))
    assert(col1(df, "n") == Seq("BRK-B", "AAPL", "A-B-C"))
  }

  test("E2 graham: positive eps·bvps only; null/zero/negative → null") {
    val df = Seq(
      (Some(2.0), Some(10.0)),   // sqrt(22.5*2*10) = sqrt(450)
      (Some(-2.0), Some(10.0)),  // eps<=0 → null
      (Some(2.0), Some(0.0)),    // bvps<=0 → null
      (None, Some(10.0)),        // null eps → null
      (Some(2.0), None)          // null bvps → null
    ).toDF("eps", "bvps").select(V.grahamValue($"eps", $"bvps").as("g"))
    val got = col1(df, "g")
    assert(math.abs(got.head.asInstanceOf[Double] - math.sqrt(450.0)) < 1e-12)
    assert(got.tail == Seq(null, null, null, null))
  }

  test("E4 peg: reported wins; derived scales fractional growth ×100") {
    // (reported, pe, growth) → (value, source)
    val df = Seq(
      (Some(1.2), Some(30.0), Some(0.5)),  // reported
      (None, Some(30.0), Some(0.5)),       // derived: 30/(0.5*100)=0.6
      (None, Some(30.0), Some(1.0)),       // boundary: 1.0 ≤ 1 → ×100 → 0.3
      (None, Some(30.0), Some(15.0)),      // percent units: 30/15 = 2
      (Some(-1.0), Some(30.0), Some(15.0)),// reported ≤ 0 falls through → derived
      (None, Some(-3.0), Some(15.0)),      // pe ≤ 0 → missing
      (None, None, None)                   // all null → missing
    ).toDF("rep", "pe", "g")
      .select(V.pegValue($"rep", $"pe", $"g").as("v"),
        V.pegSource($"rep", $"pe", $"g").as("s"))
    assert(col1(df, "v") == Seq(1.2, 0.6, 0.3, 2.0, 2.0, null, null))
    assert(col1(df, "s") == Seq("reported", "derived", "derived", "derived",
      "derived", "missing", "missing"))
  }

  test("E3 fair value: 4-way priority ladder with matched source tags") {
    // (graham, target, teps, pe_med, feps, fpe_med)
    val df = Seq(
      (Some(50.0), Some(60.0), Some(2.0), Some(20.0), Some(3.0), Some(15.0)),
      (None, Some(60.0), Some(2.0), Some(20.0), Some(3.0), Some(15.0)),
      (None, None, Some(2.0), Some(20.0), Some(3.0), Some(15.0)),
      (None, None, Some(-2.0), Some(20.0), Some(3.0), Some(15.0)),
      (None, None, None, None, None, None)
    ).toDF("g", "t", "te", "pm", "fe", "fm")
      .select(V.fairValue($"g", $"t", $"te", $"pm", $"fe", $"fm").as("v"),
        V.fairValueSource($"g", $"t", $"te", $"pm", $"fe", $"fm").as("s"))
    assert(col1(df, "v") == Seq(50.0, 60.0, 40.0, 45.0, null))
    assert(col1(df, "s") == Seq("graham_value", "target_mean_price",
      "sector_median_trailing_pe", "sector_median_forward_pe", "missing"))
  }

  test("E5 margin of safety: defined only for graham>0; ≤ 1 when defined") {
    val df = Seq(
      (Some(100.0), Some(80.0)),  // (100-80)/100 = 0.2
      (Some(100.0), Some(120.0)), // -0.2
      (Some(0.0), Some(80.0)),    // graham ≤ 0 → null
      (None, Some(80.0)),
      (Some(100.0), None)         // null price propagates
    ).toDF("g", "p").select(V.marginOfSafety($"g", $"p").as("m"))
    val got = col1(df, "m")
    assert(got(0) == 0.2 && got(1) == -0.2)
    assert(got(2) == null && got(3) == null && got(4) == null)
  }

  test("E6 tri-state checks: unknown/pass/fail") {
    val df = Seq(
      (Some(0.5), Some(10.0), Some(12.0), Some(0.1)),
      (Some(1.5), Some(14.0), Some(12.0), Some(-0.1)),
      (None, None, None, None)
    ).toDF("peg", "pe", "med", "mos")
      .select(V.pegPass($"peg", th).as("a"),
        V.peVsSectorPass($"pe", $"med", th).as("b"),
        V.marginOfSafetyPass($"mos", th).as("c"))
    assert(rows(df).map(_.toSeq) == Seq(
      Seq("pass", "pass", "pass"),
      Seq("fail", "fail", "fail"),
      Seq("unknown", "unknown", "unknown")))
  }

  test("E7 hunter: unknown absorbs; all-pass passes; else fails") {
    val df = Seq(
      ("pass", "pass", "pass"), ("pass", "fail", "pass"),
      ("unknown", "pass", "pass"), ("fail", "unknown", "fail")
    ).toDF("a", "b", "c")
      .select(V.valuationHunter($"a", $"b", $"c").as("h"))
    assert(col1(df, "h") == Seq("pass", "fail", "unknown", "unknown"))
  }

  test("E8 classifier boundaries: IEEE threshold products, like the reference") {
    // Note 100.0*1.10 = 110.00000000000001 in IEEE doubles — price 110.0
    // is classified "fair", identically to the reference's numpy floats.
    val df = Seq(
      (Some(90.0), Some(100.0)),  // ≤ fair*0.90 → undervalued
      (Some(90.1), Some(100.0)),  // fair
      (Some(110.0), Some(100.0)), // just below fair*1.10 (IEEE) → fair
      (Some(110.00000000000001), Some(100.0)), // = fair*1.10 → overvalued
      (Some(111.0), Some(100.0)), // overvalued
      (Some(50.0), Some(0.0)),    // fair ≤ 0 → unknown
      (None, Some(100.0)), (Some(50.0), None)
    ).toDF("p", "f").select(V.classifyValuation($"p", $"f", th).as("v"))
    assert(col1(df, "v") == Seq("undervalued", "fair", "fair", "overvalued",
      "overvalued", "unknown", "unknown", "unknown"))
  }

  test("E9/E12: pct_diff and downstream ratio guards") {
    val df = Seq((Some(110.0), Some(100.0)), (Some(50.0), None))
      .toDF("p", "f")
      .select(V.pctDiff($"p", $"f").as("d"),
        V.priceToFair($"p", $"f").as("r"),
        V.discountToFairPct($"p", $"f").as("disc"))
    val got = rows(df)
    assert(math.abs(got(0).getDouble(0) - 0.1) < 1e-12)
    assert(got(0).getDouble(1) == 1.1)
    assert(got(1).isNullAt(0) && got(1).isNullAt(1) && got(1).isNullAt(2))
  }

  test("E12 mos_bucket: 4 buckets + unknown, boundary-inclusive") {
    val df = Seq(Some(0.30), Some(0.25), Some(0.10), Some(0.0), Some(-0.5), None)
      .toDF("m").select(V.mosBucket($"m").as("b"))
    assert(col1(df, "b") == Seq(">=25%", ">=25%", "10-25%", "0-10%", "<0%", "unknown"))
  }
}

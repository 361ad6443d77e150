package graft

import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.functions.{Valuation => V, ValuationThresholds}
import graft.operators.Dedup

/** Property tests (SURVEY.md §5.3): totality and invariants of the
  * expression ladders, checked over generated inputs in one batched
  * Spark evaluation per property.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val th = ValuationThresholds()
  private val maybeDouble: Gen[Option[Double]] = Gen.frequency(
    3 -> Gen.chooseNum(-1e6, 1e6).map(Some(_)),
    1 -> Gen.const(None),
    1 -> Gen.oneOf(Some(0.0), Some(-1.0), Some(1.0), Some(Double.MinPositiveValue)))

  test("E8 classifier is total over {undervalued, overvalued, fair, unknown}") {
    val cases = Gen.listOfN(300, Gen.zip(maybeDouble, maybeDouble)).sample.get
    val got = cases.toDF("p", "f")
      .select(V.classifyValuation($"p", $"f", th).as("v"))
    val vals = col1(got, "v").toSet
    assert(vals.subsetOf(Set("undervalued", "overvalued", "fair", "unknown")))
    assert(!col1(got, "v").contains(null))
  }

  test("E6/E7: hunter is unknown iff any input unknown; pass iff all pass") {
    val states = Seq("pass", "fail", "unknown")
    val all = for (a <- states; b <- states; c <- states) yield (a, b, c)
    val got = all.toDF("a", "b", "c")
      .select($"a", $"b", $"c", V.valuationHunter($"a", $"b", $"c").as("h"))
      .collect()
    got.foreach { r =>
      val in = Seq(r.getString(0), r.getString(1), r.getString(2))
      val h = r.getString(3)
      if (in.contains("unknown")) assert(h == "unknown")
      else if (in.forall(_ == "pass")) assert(h == "pass")
      else assert(h == "fail")
    }
  }

  test("E5: margin of safety ≤ 1 whenever defined (graham > 0, price ≥ 0)") {
    val cases = Gen.listOfN(300,
      Gen.zip(Gen.chooseNum(0.001, 1e6), Gen.chooseNum(0.0, 1e6))).sample.get
    val got = cases.toDF("g", "p")
      .select(V.marginOfSafety($"g", $"p").as("m")).collect()
    got.foreach(r => assert(!r.isNullAt(0) && r.getDouble(0) <= 1.0))
  }

  test("E4: PEG emitted iff source ≠ missing; never negative") {
    // (≥ 0, not > 0: a subnormal pe over a large growth% underflows the
    // derived ratio to exactly 0.0 — float64-faithful to the reference)
    val cases = Gen.listOfN(300, Gen.zip(maybeDouble, maybeDouble, maybeDouble))
      .sample.get
    val got = cases.toDF("rep", "pe", "g")
      .select(V.pegValue($"rep", $"pe", $"g").as("v"),
        V.pegSource($"rep", $"pe", $"g").as("s")).collect()
    got.foreach { r =>
      val s = r.getString(1)
      if (s == "missing") assert(r.isNullAt(0))
      else assert(!r.isNullAt(0) && r.getDouble(0) >= 0)
    }
  }

  test("jaccard is symmetric, bounded in [0,1], and 1 on self") {
    val gen = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e"))
    val cases = Gen.listOfN(100, Gen.zip(gen, gen)).sample.get
    val df = cases.toDF("x", "y").select(
      Dedup.jaccard(array_distinct($"x"), array_distinct($"y")).as("xy"),
      Dedup.jaccard(array_distinct($"y"), array_distinct($"x")).as("yx"),
      Dedup.jaccard(array_distinct($"x"), array_distinct($"x")).as("xx"),
      size(array_distinct($"x")).as("nx"))
    df.collect().foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      assert(if (r.getInt(3) == 0) r.getDouble(2) == 0.0 else r.getDouble(2) == 1.0)
    }
  }

  test("ticker normalization is idempotent") {
    val cases = Gen.listOfN(200,
      Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('.', ' ', '-')))
        .map(_.mkString)).sample.get
    val df = cases.toDF("t").select(
      V.normalizeTicker($"t").as("once"),
      V.normalizeTicker(V.normalizeTicker($"t")).as("twice"))
    df.collect().foreach(r => assert(r.getString(0) == r.getString(1)))
  }
}

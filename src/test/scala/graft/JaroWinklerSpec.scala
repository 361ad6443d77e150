package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftvec.{StringSim, VectorExpressions}
import org.apache.spark.unsafe.types.UTF8String

/** Pins [[StringSim.jaroWinkler]] bit-for-bit against DuckDB's
  * `jaro_winkler_similarity` (the q221 oracle function). The expected
  * doubles below were captured from DuckDB 1.x directly; the pair set
  * is a deterministic LCG replay of the 60k-pair fuzz that validated
  * the kernel (zero mismatches), plus the textbook pairs and the three
  * convention-sensitive cases: floor-halved transpositions, strict
  * `jaro > 0.7` boost gate, and empty-input → 0.0 (both-empty
  * included).
  */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    StringSim.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook + convention-sensitive pairs match DuckDB bit-for-bit") {
    val expected: Seq[(String, String, Double)] = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      // jaro 0.7333 but zero common prefix → no boost
      ("CRATE", "TRACE", 0.7333333333333334),
      // boost with the full 4-char prefix: 0.75 + 4·0.1·0.25
      ("aaaa", "aaaaaaaaaaaaaaaa", 0.85),
      // odd transposition count — floor-halved (t = 3/2 = 1), the
      // convention that separates DuckDB/RapidFuzz from the t/2.0 form
      ("ecbebbdb", "bedcaacd", 0.5833333333333334),
      // jaro 0.6 with a 4-char prefix — strictly-greater gate holds it
      ("abcdzzzzzz", "abcdqqqqqq", 0.6),
      ("abc", "abc", 1.0),
      ("ab", "ba", 0.0),
      ("a", "", 0.0),
      ("", "", 0.0))
    for ((a, b, e) <- expected)
      assert(jw(a, b) == e, s"jw($a, $b)")
  }

  test("LCG fuzz-slice replay matches DuckDB bit-for-bit") {
    val expected: Seq[(String, String, Double)] = Seq(
      ("cechc ", "fgf  dah ", 0.4259259259259259),
      ("adcdcfbaa", "ff hgehhh", 0.0),
      (" eg dcb", "gagdfbhf ", 0.5873015873015873),
      ("da ", "hg", 0.0),
      (" hf gbc", "bedagg", 0.4365079365079365),
      (" dfggc dca", "ha", 0.0),
      ("b", "b", 1.0),
      ("ffdcbcdbcdg", "cagbd", 0.5131313131313131),
      ("bff beghdg", "adfcch g", 0.5499999999999999),
      ("", "", 0.0),
      ("gccfh ", " ", 0.0),
      (" b", "df dbbc", 0.5476190476190476),
      ("edeh ee", "afde ", 0.6761904761904761),
      (" cc ahb", "af fh  fefcc", 0.5515873015873015),
      ("c  addhdg", "afbaegdedde", 0.6033670033670034),
      ("c", "", 0.0),
      ("eedcccedfhd", "fbdbbebcac ", 0.49242424242424243),
      ("eggeb", "bhhahaeaahfc", 0.35555555555555557),
      ("", "fb", 0.0),
      ("afch", "fdeabgggc ", 0.39999999999999997),
      ("dfbhbffgheg ", "", 0.0),
      ("hc", "c hffedg", 0.5833333333333334),
      ("eac", "hfddgbabfg", 0.0),
      ("adhd", " f", 0.0))
    for ((a, b, e) <- expected)
      assert(jw(a, b) == e, s"jw($a, $b)")
  }

  test("codegen path (Column API over a DataFrame) equals the kernel") {
    import spark.implicits._
    val pairs = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
      ("small ring", "small gizmo"), ("", "x"), ("same", "same"))
    val df = pairs.toDF("a", "b")
      .withColumn("s", VectorExpressions.jaroWinkler(col("a"), col("b")))
    val got = df.select("s").as[Double].collect().toSeq
    val want = pairs.map { case (a, b) => jw(a, b) }
    assert(got == want)
    // null propagation
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(VectorExpressions.jaroWinkler(col("a"), col("b")))
      .head()
    assert(n.isNullAt(0))
  }
}

package graft

import graft.functions.{Text => T}
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unicode robustness of the text-parity surface: `unicodeClean`
  * (NFC + astral strip) in front of the exact-span and edit-distance
  * paths makes CJK and mixed-encoding fixtures behave exactly like
  * ASCII ones — the upgrade that narrows the cross-engine caveat to
  * "non-normalized input". */
class UnicodeTextSpec extends SparkSpec {
  import spark.implicits._

  // "é" composed (U+00E9) vs decomposed (e + U+0301): same text, two
  // byte spellings. U+1F600 😀 is astral (outside the BMP).
  private val composed = "café"
  private val decomposed = "café"
  private val emoji = new String(Character.toChars(0x1F600))

  test("unicodeClean: NFC collapses spellings, astral strips, BMP passes through") {
    val df = Seq(
      (1L, composed), (2L, decomposed),
      (3L, s"ab${emoji}cd"), (4L, "漢字 テスト"), (5L, "plain ascii")
    ).toDF("id", "t").select(col("id"), T.unicodeClean(col("t")).as("c"))
    val got = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1) == composed && got(2) == composed, "NFC canonicalizes")
    assert(got(3) == "abcd", "astral stripped")
    assert(got(4) == "漢字 テスト", "CJK (BMP) untouched")
    assert(got(5) == "plain ascii")
    // null-safety
    val n = Seq((1L, null: String)).toDF("id", "t")
      .select(T.unicodeClean(col("t"))).collect().head
    assert(n.isNullAt(0))
  }

  test("q103 path: CJK verbatim runs report exact token spans") {
    // a 7-token CJK run shared by two docs, unique filler around it
    val run = (1 to 7).map(i => s"漢字$i").mkString(" ")
    val a = s"前a 前b $run 後x"
    val b = s"甲1 $run 乙2 乙3"
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
      .withColumn("text", T.unicodeClean(col("text")))
    val got = Dedup.exactDupSpans(docs, "doc_id", "text", minLen = 5, cap = 50)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 7L), (2L, 1L, 7L)),
      s"CJK spans exact: ${got.toSeq}")
  }

  test("q103 path: composed and decomposed spellings form ONE duplicate run") {
    val runC = (1 to 6).map(i => s"café$i").mkString(" ")
    val runD = (1 to 6).map(i => s"café$i").mkString(" ")
    val docs = Seq((1L, s"x1 x2 $runC y1"), (2L, s"z1 $runD w1 w2"))
      .toDF("doc_id", "text")
    // WITHOUT unicodeClean the spellings hash apart: no spans
    assert(Dedup.exactDupSpans(docs, "doc_id", "text",
      minLen = 5, cap = 50).count() == 0)
    // WITH it they are the same run
    val cleaned = docs.withColumn("text", T.unicodeClean(col("text")))
    val got = Dedup.exactDupSpans(cleaned, "doc_id", "text", minLen = 5, cap = 50)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 6L), (2L, 1L, 6L)))
  }

  test("q108 path: CJK contamination spans against a CJK benchmark") {
    val shared = (1 to 6).map(i => s"試験$i").mkString(" ")
    val corpus = Seq(
      (1L, s"корпус1 $shared хвост"),
      (2L, "только уникальный текст здесь совсем")).toDF("doc_id", "text")
      .withColumn("text", T.unicodeClean(col("text")))
    val bench = Seq((90L, s"評価 $shared")).toDF("doc_id", "text")
      .withColumn("text", T.unicodeClean(col("text")))
    val got = Dedup.exactContaminationSpans(corpus, bench, "doc_id", "text",
      minLen = 6, cap = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 1L, 6L)), s"got ${got.toSeq}")
  }

  test("q100 path: edit distance over cleaned CJK text is stable vs emoji noise") {
    // same CJK sentence, one copy polluted with astral emoji — after
    // unicodeClean the pair is exact-duplicate (distance 0)
    val s1 = "漢字 の 文書 です ね はい"
    val s2 = s"漢字 の 文書${emoji} です ね はい"
    val docs = Seq((1L, s1), (2L, s2)).toDF("doc_id", "text")
      .withColumn("text", T.unicodeClean(col("text")))
    val got = Dedup.editDistancePairs(docs, "doc_id", "text",
      prefixTokens = 3, threshold = 0.8)
      .select("a", "b", "dist").collect()
    assert(got.length == 1)
    assert(got.head.getLong(2) == 0L, s"dist ${got.head.getLong(2)}")
  }

  test("codegen and interpreted NfcNormalize agree") {
    import org.apache.spark.sql.graftvec.NfcNormalize
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    for (s <- Seq(composed, decomposed, s"a${emoji}b", "漢字", "", "plain")) {
      val e = NfcNormalize(Literal(UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType))
      val interpreted = e.eval(null).asInstanceOf[UTF8String].toString
      val viaDf = Seq(Tuple1(s)).toDF("t")
        .select(T.unicodeClean(col("t"))).collect().head.getString(0)
      assert(interpreted == viaDf, s"'$s'")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.MultiPattern

/** Aho–Corasick automaton vs the naive end-position counter: the
  * automaton must report, for every pattern, the count of END
  * positions where the pattern occurs — overlapping occurrences and
  * patterns nested inside other patterns included. Fuzzed over a
  * 2-letter alphabet (maximum overlap pressure) with a deterministic
  * LCG, plus hand-pinned classic cases. */
class MultiPatternSpec extends SparkSpec {

  private def naive(text: String, p: String): Long =
    (0 to text.length - p.length)
      .count(i => text.regionMatches(i, p, 0, p.length)).toLong

  test("hand-pinned overlap and nesting cases") {
    val a = MultiPattern.Automaton.build(Seq("aba", "ab", "ba", "a"))
    val c = a.countAll("ababa")
    // aba: ends at 2,4 (0-based end idx) -> 2; ab: 2; ba: 2; a: 3
    assert(c.toSeq == Seq(2L, 2L, 2L, 3L))
    val b = MultiPattern.Automaton.build(Seq("ta", "table", "a"))
    val d = b.countAll("a table attack")
    assert(d(0) == naive("a table attack", "ta"))
    assert(d(1) == naive("a table attack", "table"))
    assert(d(2) == naive("a table attack", "a"))
  }

  test("fuzz: automaton equals naive counts on random 2-letter strings") {
    val pats = Seq("a", "b", "ab", "ba", "aa", "aba", "bab", "aabb", "abab")
    val ac = MultiPattern.Automaton.build(pats)
    var seed = 987654321L
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    for (trial <- 1 to 200) {
      val len = 1 + math.abs(next() % 64).toInt
      val text = Array.fill(len)(if ((next() & 1L) == 0L) 'a' else 'b')
        .mkString
      val got = ac.countAll(text)
      for ((p, i) <- pats.zipWithIndex)
        assert(got(i) == naive(text, p), s"trial=$trial text=$text pat=$p")
    }
  }

  test("matchCounts over a DataFrame matches naive per-row counts") {
    import spark.implicits._
    val rows = Seq((1L, "abcabcabc"), (2L, "bbbb"), (3L, "xyz"))
    val df = rows.toDF("id", "txt")
    val pats = Seq("abc", "bb", "b", "cab")
    val got = MultiPattern.matchCounts(spark, df, "id", "txt", pats)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    for ((id, txt) <- rows; p <- pats) {
      val want = naive(txt, p)
      assert(got.getOrElse((id, p), 0L) == want, s"id=$id pat=$p")
    }
  }
}

package graft

import graft.operators.Repetition

/** Hand-computed Gopher repetition signals. */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String): Repetition.RepStats =
    Repetition.stats(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head

  test("boilerplate doc: repeated bigram and full trigram coverage") {
    val r = one("a b a b a b")
    assert(r.n_tokens == 6 && r.top_bigram == "a b" && r.top_bigram_n == 3)
    assert(r.top_bigram_frac == 1.0 && r.dup_trigram_frac == 1.0)
  }

  test("all-unique doc: count-1 tie broken to smallest bigram, zero dup") {
    val r = one("x y z w")
    assert(r.top_bigram == "x y" && r.top_bigram_n == 1)
    assert(r.top_bigram_frac == 0.5 && r.dup_trigram_frac == 0.0)
  }

  test("one repeated trigram covers exactly its positions") {
    val r = one("p q r s p q r")
    assert(r.top_bigram == "p q" && r.top_bigram_n == 2)
    assert(math.abs(r.dup_trigram_frac - 6.0 / 7) < 1e-12)
    assert(math.abs(r.top_bigram_frac - 4.0 / 7) < 1e-12)
  }

  test("degenerate docs: empty, single-token, messy whitespace") {
    val e = one("   ")
    assert(e.n_tokens == 0 && e.top_bigram == "" && e.top_bigram_n == 0 &&
      e.top_bigram_frac == 0.0 && e.dup_trigram_frac == 0.0)
    val s = one("only")
    assert(s.n_tokens == 1 && s.top_bigram == "" && s.top_bigram_frac == 0.0)
    // tokenization mirrors Text.normalizeText: collapse + trim + lower
    val m = one("  A   b\tA  b ")
    assert(m.n_tokens == 4 && m.top_bigram == "a b" && m.top_bigram_n == 2)
  }
}

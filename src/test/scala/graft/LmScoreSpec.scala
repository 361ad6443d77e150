package graft

import org.apache.spark.sql.functions.col
import graft.operators.LmScore

/** Bigram-LM perplexity scorer: hand-computed reference on a corpus
  * small enough to verify the smoothing arithmetic by eye. */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("add-one bigram LM: smoothed log-probs, unseen grams, empty docs") {
    val docs = Seq(
      (0L, "a b a b"),   // reference: uni a:2 b:2 (V=2); bi "a b":2 "b a":1
      (1L, "a b c"),     // seen + unseen bigram, unseen unigram c
      (2L, ""),          // no bigrams
      (3L, "z"))         // single token: no bigrams
      .toDF("doc_id", "text")
    val got = LmScore.perplexity(docs, "doc_id", "text", col("doc_id") === 0)
      .orderBy("id").collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logp"),
          r.getAs[Double]("ppl")))).toMap
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 0: ln(3/4), ln(2/4), ln(3/4)
    val m0 = (math.log(3.0 / 4) + math.log(2.0 / 4) + math.log(3.0 / 4)) / 3
    // doc 1: "a b" → ln((2+1)/(2+2)); "b c" unseen → ln((0+1)/(2+2))
    val m1 = (math.log(3.0 / 4) + math.log(1.0 / 4)) / 2
    assert(got(0L) == ((3L, r6(m0), r6(math.exp(-m0)))))
    assert(got(1L) == ((2L, r6(m1), r6(math.exp(-m1)))))
    assert(got(2L) == ((0L, 0.0, 1.0)))
    assert(got(3L) == ((0L, 0.0, 1.0)))
    // the reference doc scores HIGHER (lower ppl) than the one with
    // unseen mass — the filtering signal points the right way
    assert(got(0L)._3 < got(1L)._3)
    CacheRegistry.releaseAll()
  }
}

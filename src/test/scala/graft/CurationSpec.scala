package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Crafted-fixture semantics for the corpus-curation operators added
  * in round 3: test-set decontamination (default 13-gram width) and
  * SemDeDup-style semantic dedup (cluster transitivity, outlier
  * isolation). The synthetic-corpus oracles (q92/q93) pin the
  * end-to-end numbers; these pin the operator CONTRACTS on inputs
  * built to hit each branch.
  */
class CurationSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("decontaminate flags any 13-gram overlap, at any offset, case/space-insensitively") {
    val bench13 = (1 to 13).map(i => s"w$i").mkString(" ")
    val corpus = docsDf(Seq(
      1L -> s"prefix junk $bench13 suffix junk",            // overlap mid-doc
      2L -> ("  " + bench13.toUpperCase + "  "),            // only case/space differ
      3L -> (1 to 13).map(i => s"w${i + 1}").mkString(" "), // shifted — no overlap
      4L -> "entirely unrelated text with plenty of words to shingle over here",
      5L -> "short"))                                       // < 13 tokens
    val bench = docsDf(Seq(100L -> s"intro $bench13 outro"))
    val got = Dedup.decontaminate(corpus, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got(1L)._1 >= 1 && !got(1L)._2, "mid-doc overlap must flag")
    assert(got(2L)._1 >= 1 && !got(2L)._2, "normalization must not hide overlap")
    assert(got(3L) == (0L, true), "shifted 13-gram is a different gram")
    assert(got(4L) == (0L, true))
    assert(got(5L) == (0L, true), "sub-width docs have no grams, stay clean")
  }

  test("semanticDedup: transitive clusters keep one representative; outliers keep themselves") {
    import spark.implicits._
    def v(base: Array[Double], eps: Double, at: Int): Array[Float] = {
      val c = base.clone(); c(at) = c(at) + eps; c.map(_.toFloat)
    }
    val e1 = Array.fill(8)(1.0)
    val far = Array(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 5.0)
    // chain 10~11~12: transitivity is what the CC pass guarantees,
    // even when the chain's far ends drop below tau on their own
    val rows = Seq(
      (10L, v(e1, 0.0, 0)), (11L, v(e1, 0.01, 1)), (12L, v(e1, 0.02, 2)),
      (20L, far.map(_.toFloat)))
    val emb = rows.toDF("vec_id", "embedding")
    // public entry point = the two-level production path (n=4 → k=1
    // fine cell: the one hash-rank seed is vec 11, all rows share its
    // cell, so the chain pairs within one cell exactly as intended)
    val got = Similarity.semanticDedup(emb, tau = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(got(10L) == (10L, true))
    assert(got(11L) == (10L, false), "near-identical vectors collapse to min id")
    assert(got(12L) == (10L, false), "transitive closure reaches the chain end")
    assert(got(20L) == (20L, true), "outlier is its own keeper")
    CacheRegistry.releaseAll()
    spark.catalog.clearCache()
  }
}

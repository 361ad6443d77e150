package graft

import org.apache.spark.sql.graftvec.{AcAutomaton, AcRef, VectorExpressions}

/** Aho–Corasick blocklist automaton: hand-pinned match counts
  * (overlaps, contained patterns, dictionary suffixes) and the
  * broadcast contract (plan O(1) in term count). */
class AcSpec extends SparkSpec {

  test("counts every occurrence: overlaps, containment, suffix hits") {
    def count(pats: Seq[String], s: String): Int =
      new AcAutomaton(pats).countMatches(s)
    assert(count(Seq("ab"), "ababab") == 3)
    // SELF-overlapping occurrences of one pattern all count
    assert(count(Seq("a a"), "a a a") == 2)
    // a pattern contained in another: both fire at the same end
    assert(count(Seq("spark", "spark table"), "spark table x") == 2)
    // dictionary-suffix via fail links: "he" inside "she"
    assert(count(Seq("she", "he"), "she said hello") == 3)
    assert(count(Seq("xyz"), "no match here") == 0)
    assert(count(Seq("whole"), "whole") == 1)
    assert(count(Seq.empty, "anything") == 0)
    assert(count(Seq("q"), "") == 0)
  }

  test("blocklist rides a broadcast: plan is O(1) in term count") {
    import org.apache.spark.sql.functions._
    val docs = spark.range(4).select(col("id").as("doc_id"),
      concat_ws(" ", lit("w"), col("id").cast("string")).as("text"))
    def plan(terms: Seq[String]): String = {
      val ref = new AcRef(spark.sparkContext.broadcast(new AcAutomaton(terms)))
      docs.select(VectorExpressions.acHitCount(col("text"), ref).as("n"))
        .queryExecution.executedPlan.toString
    }
    val small = plan(Seq("w 1"))
    val big = plan((0 until 500).map(i => s"term number $i"))
    assert(small.contains("ac_hit_count"))
    assert(math.abs(small.length - big.length) <= 16,
      s"plan grew with blocklist size: ${small.length} vs ${big.length}")
  }
}

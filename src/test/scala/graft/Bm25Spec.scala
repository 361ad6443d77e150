package graft

import graft.operators.Bm25
import org.apache.spark.sql.functions.col

/** BM25 retrieval-scored selection: formula sanity + plan shape. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  test("matching docs outscore non-matching; absent terms contribute 0") {
    val df = Seq(
      (1L, "spark table query spark"),   // two query terms, one twice
      (2L, "spark table"),               // two terms, shorter doc
      (3L, "nothing relevant here")).toDF("doc_id", "text")
    val got = Bm25.score(df, "doc_id", "text",
      Seq("spark", "table", "vector"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(3L) == 0.0, "no query term ⇒ zero score")
    assert(got(1L) > 0 && got(2L) > 0)
    // same df/idf for both, doc 2 is shorter (length normalization) and
    // still has both terms once ⇒ higher per-term contribution
    assert(got(2L) > got(1L) * 0.5, "both genuinely scored")
    // hand-check one term: N=3, df(spark)=2 ⇒ idf = ln((3-2+.5)/(2+.5)+1)
    val idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
    assert(idf > 0 && got(1L) < 3 * idf * 2.2, "bounded by Σ idf·(k1+1)")
  }

  test("plan: one tiny aggregate broadcast back, no explode, no term shuffle") {
    val df = spark.range(32).select(col("id").as("doc_id"),
      org.apache.spark.sql.functions.concat_ws(" ",
        org.apache.spark.sql.functions.lit("a spark of"),
        col("id").cast("string")).as("text"))
    val plan = Bm25.score(df, "doc_id", "text", Seq("spark", "table"))
      .queryExecution.executedPlan.toString
    val body = plan.split("\\+\\- == Initial Plan ==")(0)
    assert(!body.contains("Generate"), "no explode in the scoring pass")
    assert(body.contains("BroadcastNestedLoopJoin") || body.contains("Broadcast"),
      "stats come back via broadcast")
  }
}

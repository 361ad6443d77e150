package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftgen.CharNgrams

/** The lazy character-n-gram Generator: parity with the eager
  * explode(array) formulation, edge cases (short/empty/null input,
  * non-positive n), plan shape (GenerateExec, no array
  * materialization), and SQL registration. */
class CharNgramsSpec extends SparkSpec {

  import spark.implicits._

  private def eager(s: String, n: Int): Seq[String] =
    if (s == null || n <= 0 || s.length < n) Seq.empty
    else (0 to s.length - n).map(i => s.substring(i, i + n))

  test("generator equals the eager sliding-window on varied inputs") {
    val inputs = Seq("hello world", "ab", "abc", "", "aaaa",
      "naïve café ß", "x")
    val df = inputs.toDF("t")
    for (n <- Seq(1, 2, 3, 5)) {
      val got = df.select(col("t"),
          CharNgrams.charNgrams(col("t"), n).as("g"))
        .groupBy("t").agg(sort_array(collect_list("g")).as("gs"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      for (s <- inputs) {
        val want = eager(s, n).sorted
        assert(got.getOrElse(s, Seq.empty) == want,
          s"n=$n input='$s'")
      }
    }
  }

  test("null input and non-positive n emit nothing") {
    val df = Seq(Some("abc"), None).toDF("t")
    assert(df.select(CharNgrams.charNgrams(col("t"), 2).as("g"))
      .count() == 2) // only from 'abc'
    assert(df.select(CharNgrams.charNgrams(col("t"), 0).as("g"))
      .count() == 0)
  }

  test("plan generates lazily: GenerateExec over the generator, " +
      "no intermediate array expression") {
    val df = Seq("abcdef").toDF("t")
      .select(CharNgrams.charNgrams(col("t"), 3).as("g"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), plan)
    assert(plan.contains("graft_char_ngrams"), plan)
  }

  test("registered as SQL function graft_char_ngrams via GraftExtensions") {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val sess = SparkSession.builder()
        .master(base.sparkContext.master)
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val got = sess.sql(
        "SELECT g.ngram FROM (SELECT 'abcd' AS t) " +
          "LATERAL VIEW graft_char_ngrams(t, 2) g AS ngram")
        .collect().map(_.getString(0)).toSeq
      assert(got == Seq("ab", "bc", "cd"))
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}

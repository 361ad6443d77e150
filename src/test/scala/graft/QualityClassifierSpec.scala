package graft

import graft.operators.QualityClassifier

/** Model-based quality filtering (hashed bag-of-words linear
  * classifier): scoring correctness against a plain-Scala reference,
  * and the scale contract — the weight vector rides a broadcast, so
  * the plan is O(1) in the hash dimension. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def refProb(w: Array[Double], text: String): (Long, Double) = {
    val toks = text.trim.toLowerCase.replaceAll("\\s+", " ")
      .split(" ").filter(_.nonEmpty)
    def bucket(t: String): Int = (java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString,
      16) % w.length).toInt
    val raw = toks.foldLeft(0.0)((acc, t) => acc + w(bucket(t)))
    val logit = raw / math.max(toks.length, 1).toDouble
    (toks.length.toLong, BigDecimal(1.0 / (1.0 + math.exp(-logit)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("hashed-BoW sigmoid score matches a plain-Scala reference") {
    val texts = Seq((1L, "The quick brown fox jumps"), (2L, ""),
      (3L, "aa aa aa aa"), (4L, "  Mixed   CASE  tokens  here  "))
    val w = QualityClassifier.demoWeights(64)
    val got = QualityClassifier.score(texts.toDF("doc_id", "text"),
      "doc_id", "text", w).orderBy("doc_id").collect()
    texts.zip(got).foreach { case ((id, text), row) =>
      val (n, p) = refProb(w, text)
      assert(row.getAs[Long]("doc_id") == id)
      assert(row.getAs[Long]("n_tokens") == n, s"n_tokens for '$text'")
      assert(row.getAs[Double]("prob") == p, s"prob for '$text'")
      assert(row.getAs[Boolean]("keep") == (p >= 0.5))
    }
    // empty doc: zero evidence → sigmoid(bias=0) = exactly 0.5, kept
    assert(got(1).getAs[Double]("prob") == 0.5 && got(1).getAs[Boolean]("keep"))
  }

  test("weights ride a broadcast: plan is O(1) in the hash dimension") {
    // spark.range leaf, not a LocalRelation — ConvertToLocalRelation
    // would otherwise constant-fold the whole projection away
    val docs = spark.range(4).select(
      org.apache.spark.sql.functions.col("id").as("doc_id"),
      org.apache.spark.sql.functions.concat_ws(" ",
        org.apache.spark.sql.functions.lit("tok"),
        org.apache.spark.sql.functions.col("id").cast("string")).as("text"))
    def plan(dim: Int): String = QualityClassifier.score(docs,
      "doc_id", "text", QualityClassifier.demoWeights(dim))
      .queryExecution.executedPlan.toString
    val small = plan(64)
    val big = plan(1 << 16)
    assert(small.contains("weight_sum"))
    // identical plans up to the dim literal's digit count — no weight
    // value may appear in the tree (the r2 IVF lesson: literal-embedded
    // vectors cap the model at toy sizes)
    assert(math.abs(small.length - big.length) <= 24,
      s"plan grew with dim: ${small.length} vs ${big.length}")
  }
}

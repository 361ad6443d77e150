package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftvec.{VectorExpressions, WeightsRef}
import graft.functions.{Text => T}

/** Model-based document quality filtering: a hashed bag-of-words
  * linear classifier (the fastText-style scorer the standard curation
  * stack runs next to the heuristic rules — CCNet / Llama "Wikipedia-
  * like" filtering, GPT-3 §A quality classifier).
  *
  * Shape, end to end:
  *  - token → bucket in [0, dim) via the engine's md5 idiom
  *    (`Sampling.hashBucket` fold — deterministic across engines, so
  *    the DuckDB oracle recomputes the exact buckets);
  *  - logit = bias + (Σ w[bucket(tok)]) / max(n_tokens, 1) — the mean
  *    hashed-BoW dot product, computed by the codegen'd
  *    [[org.apache.spark.sql.graftvec.WeightSum]] expression whose
  *    weight vector rides a Torrent BROADCAST, never the plan: plan
  *    size is O(1) in dim, so a production 2M-bucket model costs the
  *    same plan as a toy 64-bucket one;
  *  - prob = sigmoid(logit), keep = prob ≥ threshold.
  *
  * The whole scorer is one narrow projection over the corpus — no
  * shuffle, no UDF; at 100 TB it fuses into the scan like every other
  * per-document feature in this engine. Training the weights is an
  * offline problem (a tiny labeled set, any solver); serving them —
  * this operator — is the part that must scale.
  */
object QualityClassifier {

  /** Per-token hash bucket in [0, dim): first 8 md5 hex chars of the
    * token (+salt), base-16, mod dim. */
  def tokenBuckets(text: Column, dim: Int, salt: String = ""): Column =
    transform(T.tokens(T.normalizeText(text)),
      t => conv(substring(md5(concat(t, lit(salt))), 1, 8), 16, 10)
        .cast("long") % dim)

  /** Deterministic stand-in weights (a real deployment loads learned
    * ones): w(b) = ((b·2654435761) mod 2001 − 1000) / 1000 ∈ [−1, 1],
    * recomputable by the oracle from the bucket index alone. */
  def demoWeights(dim: Int): Array[Double] =
    Array.tabulate(dim)(b => ((b.toLong * 2654435761L) % 2001L - 1000L) / 1000.0)

  /** The classifier probability as a plain COLUMN (rounded to 6), so
    * composed pipelines can inline the scorer into their own narrow
    * projection. Broadcasts `weights` on first use of the returned
    * column's plan. */
  def probCol(spark: org.apache.spark.sql.SparkSession, text: Column,
      weights: Array[Double], bias: Double = 0.0): Column = {
    val ref = new WeightsRef(spark.sparkContext.broadcast(weights))
    val raw = VectorExpressions.weightSum(
      tokenBuckets(text, weights.length), ref)
    val nToks = size(T.tokens(T.normalizeText(text)))
    val logit = lit(bias) + raw / greatest(nToks.cast("double"), lit(1.0))
    round(lit(1.0) / (lit(1.0) + exp(-logit)), 6)
  }

  /** Score every document: (id, n_tokens, prob rounded to 6, keep).
    * `weights.length` is the hash dimension. */
  def score(df: DataFrame, idCol: String, textCol: String,
      weights: Array[Double], bias: Double = 0.0,
      threshold: Double = 0.5): DataFrame = {
    val nToks = size(T.tokens(T.normalizeText(col(textCol))))
    // balanced on the (id, text) projection only (guide §2.3)
    graft.QueryUtil.balanced(df.select(col(idCol), col(textCol)))
      .select(col(idCol), nToks.cast("long").as("n_tokens"),
        probCol(df.sparkSession, col(textCol), weights, bias).as("prob"))
      .withColumn("keep", col("prob") >= threshold)
  }
}

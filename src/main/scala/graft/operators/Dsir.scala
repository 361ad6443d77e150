package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftvec.{VectorExpressions, WeightsRef}
import graft.functions.{Text => T}

/** DSIR-style importance resampling weights (Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling"): score
  * every document by how much its hashed-feature distribution looks
  * like a TARGET subset versus the corpus at large —
  *
  *   log w(doc) = mean over the doc's hashed token buckets b of
  *                log p̂_target(b) − log p̂_corpus(b)
  *
  * with add-one-smoothed bucket unigram models. Selection then keeps
  * the high-weight docs (or samples ∝ w) — the principled version of
  * "keep what looks like Wikipedia".
  *
  * Scale shape, in two passes:
  *  1. TRAIN: bucket counts for target and corpus in ONE aggregate —
  *    explode to (bucket, is_target) and group by bucket: cardinality
  *    is the hash dim (bounded, e.g. 256–64k), map-side partials make
  *    the shuffle tiny, and the resulting count table collects to the
  *    driver like any codebook (dim doubles, not data).
  *  2. SERVE: the log-ratio vector rides a Torrent broadcast behind
  *    the codegen'd [[org.apache.spark.sql.graftvec.WeightSum]] — the
  *    scoring pass is one narrow projection, zero corpus shuffle,
  *    plan O(1) in dim (identical serving shape to
  *    [[QualityClassifier]]; only where the weights come from
  *    differs: learned from the data itself, no labels needed).
  *
  * Determinism: WeightSum folds buckets in token order; the oracle
  * mirrors with a position-ordered list fold (the q23/q47 idiom), so
  * the doubles agree before rounding.
  */
object Dsir {

  /** (id, n_tokens, log_weight rounded to 6, keep = log_weight > 0)
    * for every row, with `targetFilter` marking the target subset and
    * `dim` the hashed-feature dimension. */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      targetFilter: Column, dim: Int = 256): DataFrame = {
    require(dim > 0, s"hash dimension $dim must be positive")
    val spark = df.sparkSession
    // materialized: the count aggregate AND the scoring pass read it
    // balanced on the (id, is_target, text) projection only — the
    // target predicate (a cheap boolean over arbitrary caller columns)
    // is evaluated BEFORE the exchange so only three columns cross it;
    // the heavy token-bucket fold runs after, on every core
    val base = graft.CacheRegistry.persistTracked(
      graft.QueryUtil.balanced(df.select(col(idCol).as("id"),
          targetFilter.as("is_target"), col(textCol).as("__t")))
        .select(col("id"), col("is_target"),
          QualityClassifier.tokenBuckets(col("__t"), dim).as("bs"),
          size(T.tokens(T.normalizeText(col("__t")))).as("n")))
    val counts = base
      .select(col("is_target"), explode(col("bs")).as("b"))
      .groupBy("b")
      // coalesce: if every row in a bucket has a NULL is_target (e.g. a
      // null-lang targetFilter), sum() is NULL and getLong below would
      // NPE on the driver — an all-null bucket counts 0 targets
      .agg(count(lit(1)).as("cc"),
        coalesce(sum(col("is_target").cast("long")), lit(0L)).as("ct"))
      .collect() // ≤ dim rows — a codebook-sized driver aggregate
    val cc = new Array[Long](dim); val ct = new Array[Long](dim)
    counts.foreach { r =>
      val b = r.getLong(0).toInt
      cc(b) = r.getLong(1); ct(b) = r.getLong(2)
    }
    val nc = cc.sum.toDouble; val nt = ct.sum.toDouble
    val w = Array.tabulate(dim)(b =>
      math.log((ct(b) + 1.0) / (nt + dim)) -
        math.log((cc(b) + 1.0) / (nc + dim)))
    val ref = new WeightsRef(spark.sparkContext.broadcast(w))
    base.select(col("id"), col("n").cast("long").as("n_tokens"),
        round(VectorExpressions.weightSum(col("bs"), ref) /
          greatest(col("n").cast("double"), lit(1.0)), 6).as("log_weight"))
      .withColumn("keep", col("log_weight") > 0)
  }
}

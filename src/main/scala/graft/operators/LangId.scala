package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftvec.{VectorExpressions, WeightsRef}
import graft.functions.{Text => T}

/** LEARNED language identification: a hashed char-n-gram multinomial
  * naive-Bayes classifier — the model family CCNet/RefinedWeb actually
  * run (fastText lid.176 is a linear model over char n-gram buckets),
  * next to q19's stopword heuristic which stays as the zero-training
  * tier.
  *
  * Shape, end to end:
  *  - features: character trigrams of the whitespace-normalized
  *    lowercase text, hashed to [0, dim) via the engine's md5 fold
  *    (deterministic across engines — the DuckDB oracle recomputes the
  *    exact buckets);
  *  - training: one `groupBy(lang, bucket).count` over the labeled
  *    subset — a map-side-combined aggregation whose result is bounded
  *    by classes × dim REGARDLESS of corpus size, so the driver
  *    collect is O(L·dim), never O(N). Weights are add-one-smoothed
  *    log-likelihoods w_l[b] = ln((c_{l,b}+1)/(total_l+dim)), priors
  *    ln((docs_l+1)/(docs+L));
  *  - scoring: per class, logp_l = prior_l + Σ w_l[bucket(g)] via the
  *    codegen'd [[org.apache.spark.sql.graftvec.WeightSum]] whose
  *    weight array rides a Torrent broadcast — ONE narrow projection
  *    over the corpus, no shuffle, no UDF; argmax with a fixed class
  *    order for ties.
  *
  * At 100 TB the training pass is a bounded-output aggregation over
  * the (tiny, labeled) fixture slice and the serving pass fuses into
  * the scan like every other per-document feature. Reference north
  * star: the language filter the curation stack runs before quality
  * scoring (CCNet fig. 1; the reference repo has no lang-ID — this is
  * part of the 100 TB extension surface).
  */
object LangId {

  /** Fixed label set, alphabetical — ties in the argmax resolve to the
    * first class in this order on both engines. */
  val classes: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  final case class Model(dim: Int, priors: Map[String, Double],
      weights: Map[String, Array[Double]])

  /** Char n-gram hash buckets in [0, dim) over the normalized text:
    * grams are substr(norm, i, n) for i in [1, len−n+1] (character
    * positions, same on both engines), bucket = first 8 md5 hex chars
    * base-16 mod dim. */
  def charGramBuckets(text: Column, n: Int, dim: Int): Column =
    T.bound(T.normalizeText(text)) { nm =>
      when(length(nm) < n, array().cast("array<long>"))
        .otherwise(transform(sequence(lit(1), length(nm) - (n - 1)),
          i => conv(substring(md5(nm.substr(i, lit(n))), 1, 8), 16, 10)
            .cast("long") % dim))
    }

  /** Train the NB model on `docs` rows passing `trainFilter`, labeled
    * by `labelCol`. Both aggregations are bounded-output (≤ L·dim and
    * ≤ L rows) — safe to collect at any corpus size. */
  def train(docs: DataFrame, textCol: String, labelCol: String,
      trainFilter: Column, n: Int = 3, dim: Int = 4096): Model = {
    // balanced on the (label, text) projection only (guide §2.3); the
    // md5 gram fold runs after the exchange, on every core
    val train = graft.QueryUtil.balanced(
        docs.filter(trainFilter).select(col(labelCol), col(textCol)))
      .select(col(labelCol).as("lang"),
        charGramBuckets(col(textCol), n, dim).as("bs"))
    // gram counts per (class, bucket): output ≤ L·dim rows by construction
    val counts = train.select(col("lang"), explode(col("bs")).as("b"))
      .groupBy("lang", "b").count()
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    // document counts per class (for priors): output ≤ L rows
    val docCounts = train.groupBy("lang").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val nTrain = docCounts.values.sum
    val priors = classes.map { l =>
      l -> math.log((docCounts.getOrElse(l, 0L) + 1.0) /
        (nTrain + classes.length))
    }.toMap
    val weights = classes.map { l =>
      val total = counts.iterator.collect { case ((`l`, _), c) => c }.sum
      l -> Array.tabulate(dim)(b =>
        math.log((counts.getOrElse((l, b.toLong), 0L) + 1.0) / (total + dim)))
    }.toMap
    Model(dim, priors, weights)
  }

  /** Score every document: per-class log-posteriors via broadcast
    * WeightSum, argmax in [[classes]] order. Output: (id, label,
    * lang_model, logp rounded to 6, agree). */
  def classify(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, model: Model, n: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    // Materialize the bucket array ONCE per row — the five per-class
    // WeightSum columns read the same array, so the md5 fold isn't
    // recomputed per class.
    val withBs = graft.QueryUtil.balanced(
        docs.select(col(idCol), col(labelCol), col(textCol)))
      .select(col(idCol), col(labelCol),
        charGramBuckets(col(textCol), n, model.dim).as("__bs"))
    val scores = classes.map { l =>
      val ref = new WeightsRef(spark.sparkContext.broadcast(model.weights(l)))
      l -> (lit(model.priors(l)) +
        VectorExpressions.weightSum(col("__bs"), ref))
    }
    val best = greatest(scores.map(_._2): _*)
    val pred = scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best, lit(l)).otherwise(acc)
    }
    withBs.select(col(idCol), col(labelCol),
        pred.as("lang_model"), round(best, 6).as("logp"))
      .withColumn("agree", (col(labelCol) === col("lang_model")).cast("boolean"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Text => T}

/** Retrieval-scored data selection: BM25 (Robertson/Lucene variant)
  * of every document against a FIXED query-term set — the shape of
  * domain-targeted corpus selection ("keep the docs that look like my
  * target domain"), where the target is described by a handful of
  * terms and the corpus is 100 TB.
  *
  * Scale shape: because only the query's terms can score, nothing
  * corpus-wide is keyed by term — ONE tiny aggregate computes N,
  * avgdl, and one conditional df counter per query term (map-side
  * partials, a few doubles total), broadcasts back, and the scoring
  * pass is a narrow projection (per-term `filter(toks, = term)`
  * counts — O(dl · |terms|) per doc, no explode, no (doc, term)
  * shuffle, raw text never moves). Contrast a general inverted-index
  * build, which would shuffle every token; a fixed-query scorer
  * never needs one.
  *
  * Determinism: contributions fold in the query's term order with a
  * fixed left-to-right sum, and the formula is written with literal
  * constants in one agreed operation order, so DuckDB reproduces the
  * exact IEEE result and the rounded score hash-matches.
  */
object Bm25 {

  /** (id, n_tokens, bm25) for every row of `df`, scored against
    * `terms` with the standard k1 = 1.2, b = 0.75. */
  def score(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "query terms must be non-empty")
    // materialized: Catalyst's projection collapse would otherwise
    // inline the tokenization into dl, the df aggregate, AND each
    // per-term filter() — 7+ re-tokenizations per doc (the q34
    // lesson; sf10 measured 41.8 s → see PLANS.md). The cache is the
    // token arrays once; both the stats aggregate and the scoring
    // pass read it. Tracked for the caller's releaseAll.
    // balanced on the raw (id, text) projection so the exchange moves
    // text, not the (wider) token arrays, and the tokenization fold
    // runs AFTER the exchange on every core (guide §2.3)
    val toks = graft.CacheRegistry.persistTracked(
      graft.QueryUtil.balanced(df.select(col(idCol).as("id"), col(textCol)))
        .select(col("id"), T.tokens(T.normalizeText(col(textCol))).as("toks")))
      .withColumn("dl", size(col("toks")))
    // one tiny corpus aggregate: N, avgdl, df per query term
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      sum(array_contains(col("toks"), t).cast("long")).as(s"df$i")
    }
    val aggCols = avg(col("dl")).as("avgdl") +: dfCols
    val stats = toks.agg(count(lit(1)).as("n"), aggCols: _*)
    val scored = toks.crossJoin(broadcast(stats))
    // Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)) — written
    // in the exact operation order the oracle mirrors
    val contribs: Seq[Column] = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(col("toks"), x => x === lit(t))).cast("double")
      val dfT = col(s"df$i").cast("double")
      val idf = log((col("n").cast("double") - dfT + lit(0.5)) /
        (dfT + lit(0.5)) + lit(1.0))
      idf * (tf * lit(2.2)) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) *
          col("dl").cast("double") / col("avgdl")))
    }
    scored.select(col("id"), col("dl").cast("long").as("n_tokens"),
      round(contribs.reduceLeft(_ + _), 6).as("bm25"))
  }
}

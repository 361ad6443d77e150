package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Text => T}

/** Language-model perplexity scoring — the CCNet move: score every
  * document by a small LM trained on a REFERENCE corpus (Wikipedia in
  * CCNet; any trusted high-quality subset), and filter/bucket on
  * perplexity. Complements [[QualityClassifier]] (discriminative
  * keep/drop) with the generative fluency signal.
  *
  * The LM here is a bigram model with add-one smoothing over the
  * reference vocabulary: logp(w2|w1) = ln((c(w1 w2) + 1)/(c(w1) + V)).
  * Per document: mean bigram log-prob and ppl = exp(−mean).
  *
  * Scale shape: counts are map-side-combined aggregates over the
  * (small) reference subset; the corpus is scored by joining its
  * bigram stream against the two count tables on token keys — the
  * no-assumptions layout that works even when the LM is too big to
  * broadcast (when it isn't, the count tables are exactly the
  * broadcast-weights pattern of [[QualityClassifier]] — swap the join
  * for a broadcast probe, same semantics). Per-doc reduction collects
  * each document's (position, logp) pairs and folds them in POSITION
  * order — a deterministic left-to-right IEEE sum the DuckDB oracle
  * mirrors with an ordered list aggregate, so results are
  * bit-reproducible across engines and partitionings.
  */
object LmScore {

  /** Score `df` against a bigram LM trained on the rows matching
    * `refFilter`. Returns (id, n_bigrams, avg_logp, ppl) per row;
    * documents with < 2 tokens score avg_logp = 0, ppl = 1.
    *
    * Precondition: `refFilter` should match at least one row with ≥ 1
    * token — an empty reference set has vocabulary V = 0 and nothing
    * to smooth against. The denominator is floored at 1
    * (`greatest(v, 1)`) so a degenerate reference degrades to finite
    * (if meaningless) scores instead of silently propagating
    * Infinity/NaN through avg_logp/ppl. */
  def perplexity(df: DataFrame, idCol: String, textCol: String,
      refFilter: Column): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    // materialized: the reference aggregates AND the corpus stream
    // both read it; tracked for the caller's releaseAll
    val toks = graft.CacheRegistry.persistTracked(
      df.repartition(par).select(col(idCol).as("id"),
        T.tokens(T.normalizeText(col(textCol))).as("toks"),
        refFilter.as("is_ref")))
    val uni = toks.where(col("is_ref"))
      .select(explode(col("toks")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val bi = toks.where(col("is_ref"))
      .select(explode(T.wordShingles(col("toks"), 2)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c2"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    // corpus bigram stream with position: shingle j (0-based) pairs
    // tokens j+1, j+2 (1-based), so w1 = toks[j+1]
    val stream = toks.select(col("id"),
        posexplode(T.wordShingles(col("toks"), 2)).as(Seq("pos", "g")),
        col("toks"))
      .select(col("id"), col("pos"), col("g"),
        element_at(col("toks"), col("pos") + 1).as("w1"))
    val scored = stream
      .join(bi, Seq("g"), "left")
      .join(uni, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("id"), col("pos"),
        log((coalesce(col("c2"), lit(0L)) + 1).cast("double") /
          (coalesce(col("c1"), lit(0L)) + greatest(col("v"), lit(1L)))).as("lp"))
    val perDoc = scored.groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        sort_array(collect_list(struct(col("pos"), col("lp")))).as("ps"))
      .select(col("id"), col("n_bigrams"),
        aggregate(col("ps"), lit(0.0d), (acc, s) => acc + s.getField("lp"))
          .as("sm"))
    toks.select("id").join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(coalesce(col("sm") / col("n_bigrams"), lit(0.0d)), 6)
          .as("avg_logp"),
        round(exp(-coalesce(col("sm") / col("n_bigrams"), lit(0.0d))), 6)
          .as("ppl"))
  }
}

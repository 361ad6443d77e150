package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Text => T}

/** Learned byte-pair encoding: a trained merge table instead of the
  * regex pre-tokenizer approximation (`Text.bpePieces`), layered the
  * way production tokenizer trainers are:
  *
  *  - the ONLY corpus-scale pass is a word-frequency aggregation (one
  *    shuffle keyed by word, map-side partial agg) truncated to the
  *    top `maxWords` — Zipf makes this cover almost all token mass;
  *  - the classic BPE merge loop then runs driver-side over that
  *    vocab-bounded table (k×|vocab| work, no further corpus reads);
  *  - application is a BROADCAST JOIN of exploded tokens against the
  *    trained word→pieces vocabulary — the lookup lives in a join, not
  *    in the expression tree, so vocabulary size never inflates the
  *    plan (the IvfIndex lesson). Out-of-vocabulary tokens fall back
  *    to the regex pre-tokenizer, which is lossless over non-space
  *    characters, so piece concatenation always reassembles the token.
  *
  * Determinism: pair ties break on (count desc, pair lexicographic),
  * so the merge list is a pure function of the corpus.
  */
object Bpe {

  /** One learned merge rule: `left`+`right` fuse at priority `rank`. */
  final case class Merge(left: String, right: String, rank: Int)

  /** A trained tokenizer: the ordered merge list plus the end-state
    * piece sequence of every trained word. */
  final case class Trained(merges: Seq[Merge], vocab: Map[String, Seq[String]])

  /** Train on a corpus column: distributed word counts, driver-side
    * merge loop (see object doc for why this layering scales). */
  def train(df: DataFrame, textCol: String, numMerges: Int = 64,
      maxWords: Int = 10000): Trained = {
    val wc = df
      .select(explode(T.tokens(T.normalizeText(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromWordCounts(wc, numMerges)
  }

  /** Classic BPE over a word-frequency table: repeatedly fuse the most
    * frequent adjacent symbol pair. Stops early when no pair repeats
    * the loop is exact, not sampled — the table is already small. */
  def trainFromWordCounts(wordCounts: Seq[(String, Long)],
      numMerges: Int): Trained = {
    var words: Vector[(Vector[String], Long)] =
      wordCounts.map { case (w, c) => (w.map(_.toString).toVector, c) }.toVector
    val merges = Vector.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val pairCounts = collection.mutable.LinkedHashMap[(String, String), Long]()
      for ((syms, c) <- words; j <- 0 until syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val ((a, b), _) = pairCounts.toSeq
          .sortBy { case ((x, y), c) => (-c, x, y) }.head
        merges += Merge(a, b, rank)
        words = words.map { case (syms, c) => (fuse(syms, a, b), c) }
        rank += 1
      }
    }
    val vocab = wordCounts.map(_._1).zip(words.map(_._1)).toMap
    Trained(merges.result(), vocab)
  }

  /** One merge pass over a symbol sequence (left-to-right, greedy). */
  private def fuse(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
        out += (a + b); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Apply the full merge list (in rank order) to an arbitrary word —
    * how OOV-but-similar words would be encoded by a full tokenizer;
    * exposed for building vocab tables over new word lists. */
  def encodeWord(word: String, merges: Seq[Merge]): Seq[String] =
    merges.sortBy(_.rank).foldLeft(word.map(_.toString).toVector) {
      (syms, m) => fuse(syms, m.left, m.right)
    }

  /** The trained vocabulary as a (w, pieces) DataFrame for the
    * broadcast-join application path. */
  def vocabDf(spark: SparkSession, trained: Trained): DataFrame = {
    import spark.implicits._
    trained.vocab.toSeq.sortBy(_._1).toDF("w", "pieces")
  }

  /** Encode a corpus: per-row piece array over the normalized tokens.
    * Plan shape: posexplode (order key) → broadcast join on the token
    * → regroup by row id (the one shuffle) → order-restoring flatten.
    * Rows with no tokens keep an empty piece array (left join back).
    */
  def encode(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    // balanced on the (id, text) projection only (guide §2.3); the
    // tokenization itself runs AFTER the exchange so it is what gets
    // parallelized, not what feeds the shuffle
    val toks = graft.QueryUtil.balanced(
        df.select(col(idCol).as("id"), col(textCol).as("__t")))
      .select(col("id"),
        posexplode(T.tokens(T.normalizeText(col("__t")))).as(Seq("pos", "w")))
    val pieces = toks
      .join(broadcast(vocab), Seq("w"), "left")
      // OOV fallback: regex pre-tokenizer (lossless over non-space chars)
      .withColumn("p", coalesce(col("pieces"), T.bpePieces(col("w"))))
      .groupBy("id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("p")))),
        x => x("p"))).as("bpe_pieces"))
    df.join(pieces.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("bpe_pieces",
        coalesce(col("bpe_pieces"), array().cast("array<string>")))
  }
}

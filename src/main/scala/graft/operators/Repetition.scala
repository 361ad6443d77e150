package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Within-document repetition signals — the Gopher quality-filter
  * family (Rae et al. 2021, table A1: "fraction of characters in the
  * most frequent n-gram", "fraction of characters in duplicated
  * n-grams"), token-denominated here. These are PER-DOCUMENT
  * statistics with no corpus-wide state, so the right 100 TB shape is
  * a single narrow mapPartitions pass — no explode, no (doc, gram)
  * shuffle, no aggregation exchange; each task streams its rows and
  * emits one stats row per document. (Contrast q96/q103, whose
  * duplication is CORPUS-wide and genuinely needs the gram shuffle.)
  *
  * Tokenization mirrors `Text.normalizeText`/`Text.tokens` exactly
  * (lower → whitespace collapse → trim → split) so the signals
  * compose with every other text operator, and the DuckDB oracle can
  * rebuild them from the same normalized token stream.
  */
object Repetition {

  final case class RepStats(id: Long, n_tokens: Long, top_bigram: String,
      top_bigram_n: Long, top_bigram_frac: Double, dup_trigram_frac: Double)

  /** Split of ALREADY-normalized text (see [[stats]]: lowercasing runs
    * column-side through `Text.normalizeText`, never here). Spark's
    * `lower()` is NOT locale-independent for non-ASCII input —
    * UTF8String byte-lowercases pure ASCII but falls back to JVM
    * `String.toLowerCase()` (default locale) otherwise — so the only
    * way to guarantee engine/driver tokenization parity on a
    * Turkish/Azeri-locale JVM is to do the case fold in exactly one
    * place: the engine. */
  private[operators] def tokenize(norm: String): Array[String] =
    if (norm == null || norm.isEmpty) Array.empty else norm.split(" ")

  /** Per document:
    *  - `top_bigram` / `top_bigram_n`: the most frequent word bigram
    *    (ties → lexicographically smallest, so results are
    *    deterministic and engine-independent) and its count;
    *  - `top_bigram_frac`: 2·count / n_tokens — the boilerplate
    *    signal ("subscribe subscribe subscribe" scores high);
    *  - `dup_trigram_frac`: fraction of token positions covered by a
    *    trigram occurring ≥ 2 times in the SAME document (overlap
    *    counted once, the within-doc twin of q96's corpus fraction).
    */
  def stats(df: DataFrame, idCol: String, textCol: String): Dataset[RepStats] = {
    import df.sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    // normalization (incl. the case fold) runs COLUMN-SIDE so it is the
    // same code path every other text operator and the oracle see;
    // the Scala side below only splits on single spaces
    // balanced on the raw (id, text) projection; the normalization
    // regex fold runs AFTER the exchange so it parallelizes too
    graft.QueryUtil.balanced(df.select(col(idCol), col(textCol)))
      .select(col(idCol), graft.functions.Text.normalizeText(col(textCol)))
      .as[(Long, String)].mapPartitions { it =>
      it.map { case (id, text) =>
        val toks = tokenize(text)
        val n = toks.length
        // most frequent bigram, smallest-gram tie-break
        var topG = ""; var topN = 0L
        if (n >= 2) {
          val counts = new java.util.HashMap[String, Long]()
          var i = 0
          while (i < n - 1) {
            val g = toks(i) + " " + toks(i + 1)
            counts.merge(g, 1L, _ + _)
            i += 1
          }
          val eit = counts.entrySet().iterator()
          while (eit.hasNext) {
            val e = eit.next()
            if (e.getValue > topN ||
              (e.getValue == topN && e.getKey < topG)) {
              topN = e.getValue; topG = e.getKey
            }
          }
        }
        // positions covered by within-doc duplicated trigrams
        var dupFrac = 0.0
        if (n >= 3) {
          val tri = new java.util.HashMap[String, Int]()
          var i = 0
          while (i < n - 2) {
            tri.merge(toks(i) + " " + toks(i + 1) + " " + toks(i + 2), 1, _ + _)
            i += 1
          }
          val covered = new Array[Boolean](n)
          i = 0
          while (i < n - 2) {
            if (tri.get(toks(i) + " " + toks(i + 1) + " " + toks(i + 2)) > 1) {
              covered(i) = true; covered(i + 1) = true; covered(i + 2) = true
            }
            i += 1
          }
          dupFrac = covered.count(identity).toDouble / n
        }
        // fractions left unrounded: callers round with Spark's SQL
        // round(), whose decimal semantics match the DuckDB oracle's
        RepStats(id, n.toLong, topG, topN,
          if (n >= 2) 2.0 * topN / n else 0.0,
          dupFrac)
      }
    }
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Text => T}

/** Document chunking — the window split every LLM training / RAG
  * pipeline runs between cleaning and tokenization: long documents
  * become fixed-size token windows with an overlap so no span is lost
  * at a boundary, each chunk carrying stable provenance
  * (doc id, chunk index, start offset).
  *
  * Scale shape: a pure narrow per-row transform — tokens, a generated
  * start sequence, one posexplode; NO shuffle anywhere, so it
  * pipelines into whatever scan or write surrounds it at any corpus
  * size. Chunk identity is (doc_id, chunk_idx), a pure function of
  * the document alone: ids never change when the corpus around a doc
  * grows — the same stability property as the md5 sampling buckets.
  */
object Chunking {

  /** Split each document into windows of `chunkTokens` normalized
    * tokens starting every `chunkTokens - overlap` tokens. The final
    * window may be shorter; a trailing window lying ENTIRELY inside
    * its predecessor (doc ends within the overlap region) is dropped
    * — it would duplicate content verbatim. Empty docs yield no
    * chunks.
    *
    * Output: (doc_id, chunk_idx, start, n_chunk_tokens, chunk_text),
    * one row per chunk, `start` 0-based in tokens.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int): DataFrame = {
    val step = chunkTokens - overlap
    require(step > 0, s"chunkTokens ($chunkTokens) must exceed overlap ($overlap)")
    df.select(col(idCol).as("doc_id"),
        T.tokens(T.normalizeText(col(textCol))).as("toks"))
      .withColumn("n", size(col("toks")))
      .where(col("n") > 0)
      .select(col("doc_id"), col("toks"), col("n"),
        posexplode(sequence(lit(0), col("n") - 1, lit(step))))
      // pos = start/step = the chunk index; a trailing start with
      // n ≤ start + overlap is contained in the previous window
      .where(col("pos") === 0 || col("n") > col("col") + overlap)
      .select(col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        col("col").cast("long").as("start"),
        least(lit(chunkTokens), col("n") - col("col")).cast("long")
          .as("n_chunk_tokens"),
        concat_ws(" ", slice(col("toks"), col("col") + 1, lit(chunkTokens)))
          .as("chunk_text"))
  }
}

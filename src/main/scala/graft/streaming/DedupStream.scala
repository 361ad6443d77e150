package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.{Text => T}

/** Streaming exact deduplication — the incremental form of
  * `operators.Dedup.exact` for a continuously-ingested corpus (the
  * shape a training-data pipeline actually runs: documents arrive
  * forever; duplicates must be dropped online).
  *
  * State design (the part that decides 100 TB viability): a naive
  * streaming `dropDuplicates` keeps every fingerprint seen FOREVER —
  * state grows with the corpus and the job dies. Keying the state by
  * content fingerprint under `dropDuplicatesWithinWatermark` bounds
  * it to the watermark horizon: duplicates arriving within the delay
  * are dropped with an exactness guarantee, fingerprints older than
  * the watermark are evicted. The accepted trade-off (and the
  * documented contract): a re-occurrence AFTER eviction re-emits —
  * downstream exact dedup (q30) over the accumulated batch output
  * remains the global backstop, which is precisely how production
  * pipelines layer online + offline dedup.
  */
object DedupStream {

  /** One streamed document: event-time + payload. */
  final case class Doc(doc_id: Long, ts_us: Long, text: String)

  /** First occurrence per normalized-content fingerprint within the
    * watermark horizon. Output carries the fingerprint so the offline
    * layer can join/audit. */
  def firstOccurrences(docs: Dataset[Doc],
      watermarkDelay: String = "10 minutes"): DataFrame =
    docs.toDF()
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withColumn("fp", T.fingerprint(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")
      .select("doc_id", "ts_us", "fp")
}

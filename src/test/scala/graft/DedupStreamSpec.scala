package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.DedupStream
import graft.streaming.DedupStream.Doc

/** Streaming exact dedup: first occurrence wins across micro-batches,
  * duplicates within the watermark horizon are dropped, and state is
  * EVICTED past the watermark (the bounded-state contract — a
  * post-eviction re-occurrence re-emits and the offline layer catches
  * it).
  */
class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val M = 60L * 1000000L // one minute in µs
  private def doc(id: Long, minutes: Long, text: String) =
    Doc(id, minutes * M, text)

  test("cross-batch dedup with watermark-bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = DedupStream.firstOccurrences(input.toDS(), "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream_test")
      .outputMode(OutputMode.Append()).start()

    // batch 1: A, B, and an in-batch duplicate of A (whitespace/case
    // variant — the fingerprint normalizes both)
    input.addData(doc(1, 0, "hello world"), doc(2, 1, "fresh text"),
      doc(3, 2, "  Hello   WORLD "))
    q.processAllAvailable()
    // batch 2 (within the 10-min horizon): duplicate of A again → drop
    input.addData(doc(4, 5, "hello world"), doc(5, 6, "another doc"))
    q.processAllAvailable()
    // batch 3: jump event time far ahead — watermark passes, state for
    // the old fingerprints is evicted
    input.addData(doc(6, 1000, "late era doc"))
    q.processAllAvailable()
    // batch 4: A re-occurs AFTER eviction → re-emitted (documented
    // bounded-state trade-off)
    input.addData(doc(7, 1001, "hello world"))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_stream_test")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // exactly ONE representative of the in-batch duplicate pair {1, 3}
    // is emitted (which one is engine-defined — unlike the batch
    // keep-first operator, the streaming op takes no ordering column);
    // the cross-batch duplicate 4 is dropped; 7 re-emits post-eviction
    assert(ids.intersect(Set(1L, 3L)).size == 1, s"got $ids")
    assert(!ids.contains(4L), s"cross-batch dup not dropped: $ids")
    assert(Set(2L, 5L, 6L, 7L).subsetOf(ids), s"got $ids")
    assert(ids.size == 5, s"got $ids")
  }
}

package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online per-key admission quota — the streaming form of
  * [[graft.operators.Sampling.quotaPerKey]] (the C4/FineWeb per-domain
  * cap): admit the FIRST `quota` documents of each key in stream
  * order, across micro-batches, then drop the key's tail forever.
  * Offline the cap is a rank over the accumulated corpus; online the
  * rank state is one counter per key in a
  * `flatMapGroupsWithState` — a host quota holds while the crawl is
  * still arriving, instead of after-the-fact.
  *
  * Ordering contract: stream order = (micro-batch order, ascending
  * doc_id within the batch). Batch order is the file-source commit
  * order (deterministic under AvailableNow); the within-batch sort is
  * explicit here because a shuffled group iterator has no order. So a
  * replayed/resumed drain admits the same set — and an oracle can
  * rank by the same key.
  *
  * State size: ONE long per distinct key ever seen — bounded by key
  * cardinality (registered domains, not documents), the smallest
  * state of any operator in this package. Memory caveat: each key's
  * PER-BATCH rows are buffered to sort; a single key flooding one
  * micro-batch holds its batch volume on one task (same contract as
  * sessionization). At a healthy cap almost every key is closed
  * after its first batches and later rows stream straight to the
  * drop branch without buffering (the `admitted >= quota` early exit).
  *
  * Delivery: append-mode output; a replayed batch re-admits the same
  * prefix (state counts only ADMITTED docs), so replay can duplicate
  * output rows but never change the admitted SET — the exact-dedup
  * backstop downstream removes duplicates, as with the other
  * at-least-once streams here.
  */
object QuotaStream {

  final case class KeyedDoc(doc_id: Long, key: String)

  def firstKPerKey(docs: Dataset[KeyedDoc], quota: Int): Dataset[KeyedDoc] = {
    require(quota > 0, s"quota must be positive, got $quota")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.key)
      .flatMapGroupsWithState[Long, KeyedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[KeyedDoc], state: GroupState[Long]) =>
          val admitted = state.getOption.getOrElse(0L)
          if (admitted >= quota) Iterator.empty
          else {
            val sorted = rows.toArray.sortBy(_.doc_id)
            val admit = sorted.take((quota - admitted).toInt)
            state.update(admitted + admit.length)
            admit.iterator
          }
      }
  }
}

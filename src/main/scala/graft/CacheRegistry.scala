package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Session-scoped tracking of DataFrames the operators persist
  * internally (Dedup/Similarity materialize signature tables that feed
  * both sides of a self-join — see Dedup.minhashPairs).
  *
  * Persist is the right call per query; the leak is per *session*: a
  * long-lived JVM running many queries accumulates MEMORY_AND_DISK
  * blocks it can never release because the handles are buried inside
  * returned lazy plans. Operators therefore register every handle
  * here, and callers release them once the query's result is
  * materialized (`Bench`/`Verify` do this between queries; an
  * embedding application should do the same per unit of work).
  */
object CacheRegistry {

  private val handles = new ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `ds` at MEMORY_AND_DISK and track the handle. */
  def persistTracked[T](ds: Dataset[T]): Dataset[T] = {
    val p = ds.persist(StorageLevel.MEMORY_AND_DISK)
    handles.add(p)
    p
  }

  /** Unpersist every tracked handle (non-blocking: block eviction is
    * async, but each RDD leaves the persistence registry immediately).
    */
  def releaseAll(): Unit = {
    var h = handles.poll()
    while (h != null) {
      h.unpersist(blocking = false)
      h = handles.poll()
    }
  }

  /** Number of currently tracked (not yet released) handles. */
  def trackedCount: Int = handles.size()
}

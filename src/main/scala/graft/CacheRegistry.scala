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
  *
  * Scope contract: the registry is process-global, so `releaseAll()`
  * drops EVERY tracked handle in the JVM — it assumes one unit of work
  * in flight at a time (true of Bench/Verify/Job). Correctness is
  * never at risk (persist is a hint; an unpersisted plan recomputes),
  * but a host running queries concurrently would silently lose the
  * self-join reuse the persists exist for — such a host should call
  * releaseAll() only at quiescent points, or persist/unpersist its
  * operators' inputs itself and skip the registry.
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

package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset

/** Registry for operator-scoped caches.
  *
  * Several operators persist an intermediate relation that feeds the lazy
  * DataFrame they return (e.g. the shingle sets both sides of a dedup
  * self-join read, or the prepared embedding relation an IVF probe reads
  * three times). The operator cannot unpersist that intermediate itself —
  * the caller has not materialized the result yet — so ownership of the
  * release transfers to the caller: every such `persist()` is routed
  * through `track`, and the caller invokes `releaseAll()` after the
  * query's terminal action (Verify after each parquet dump, Bench after
  * each rep). A long-lived session running many queries therefore never
  * accumulates dead cache entries until LRU eviction starts thrashing.
  *
  * Iterative operators that can release mid-flight (dupClusters' edge
  * relation) still unpersist eagerly themselves; a second unpersist via
  * the registry is a harmless no-op.
  */
object Caches {
  private val tracked = new ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `ds` and register it for the caller-side release. */
  def track[T](ds: Dataset[T]): Dataset[T] = {
    ds.persist()
    tracked.add(ds)
    ds
  }

  /** Unpersist every tracked dataset (async) and empty the registry. */
  def releaseAll(): Unit = {
    var ds = tracked.poll()
    while (ds != null) {
      ds.unpersist(blocking = false)
      ds = tracked.poll()
    }
  }
}

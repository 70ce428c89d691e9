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
  * through `track`, and the caller releases after the query's terminal
  * action. A long-lived session running many queries therefore never
  * accumulates dead cache entries until LRU eviction starts thrashing.
  *
  * Release is SCOPED, so concurrent queries cannot drop each other's
  * caches: `open()` pushes a fresh scope for the calling thread (child
  * threads inherit it), `track` registers into the thread's current
  * scope, and `Scope.release()` unpersists only what that scope tracked.
  * Single-threaded callers may skip `open()` entirely — tracks then land
  * in a shared default scope drained by `releaseAll()`, the original
  * contract. The intended shape:
  *
  * {{{
  * val scope = Caches.open()
  * try {
  *   val df = SomeOperator.run(spark, dir)   // track() lands in `scope`
  *   df.write...                             // terminal action
  * } finally scope.release()                  // drops ONLY this query's caches
  * }}}
  *
  * Iterative operators that can release mid-flight (dupClusters' edge
  * relation) still unpersist eagerly themselves; a second unpersist via
  * the registry is a harmless no-op.
  */
object Caches {

  /** One query's tracked caches. Created via [[Caches.open]]; releasing
    * restores the opener's previous scope (when released on the opening
    * thread) and unpersists everything tracked here — and nothing else.
    */
  final class Scope private[Caches] (parent: Scope) {
    private val tracked = new ConcurrentLinkedQueue[Dataset[_]]()

    private[Caches] def add(ds: Dataset[_]): Unit = tracked.add(ds)

    /** Unpersist every dataset tracked in this scope (async) and, if this
      * scope is still the calling thread's current one, pop back to the
      * scope that was current when it was opened. Idempotent.
      */
    def release(): Unit = {
      if (parent != null && (current.get() eq this)) current.set(parent)
      var ds = tracked.poll()
      while (ds != null) {
        ds.unpersist(blocking = false)
        ds = tracked.poll()
      }
    }
  }

  /** Fallback scope for callers that never open one (null parent marks it
    * un-poppable). */
  private val defaultScope = new Scope(null)

  // Inheritable so an operator that fans plan construction out to helper
  // threads still tracks into the query's scope.
  private val current = new InheritableThreadLocal[Scope]() {
    override def initialValue(): Scope = defaultScope
  }

  /** Open a fresh release scope for the calling thread and return it.
    * Pair with `Scope.release()` after the query's terminal action.
    */
  def open(): Scope = {
    val s = new Scope(current.get())
    current.set(s)
    s
  }

  /** Persist `ds` and register it with the calling thread's current scope
    * for caller-side release.
    */
  def track[T](ds: Dataset[T]): Dataset[T] = {
    ds.persist()
    current.get().add(ds)
    ds
  }

  /** Release the calling thread's CURRENT scope — for single-threaded
    * callers that never opened one this is the shared default scope,
    * i.e. the original drain-everything-I-tracked behavior.
    */
  def releaseAll(): Unit = current.get().release()
}

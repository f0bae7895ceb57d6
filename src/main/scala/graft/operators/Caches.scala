package graft.operators

import org.apache.spark.sql.Dataset

/** Caching contract for composable operators.
  *
  * Several operators cache an intermediate frame that feeds multiple
  * downstream branches (a shingle explode used by both sides of a
  * candidate self-join, an LSH sketch probed by corpus and query side).
  * The returned DataFrames are lazy, so the operator itself can never
  * know when its caller is done — unpersisting inside the operator would
  * evict the block before the first action runs.
  *
  * Instead every operator-internal `.cache()` goes through
  * [[Caches.track]], and library callers release the accumulated blocks
  * with ONE call after materializing their results:
  *
  * {{{
  *   val pairs = Dedup.minhashLshPairs(spark, dir).collect()
  *   Caches.release()           // drops every operator-internal cache
  * }}}
  *
  * Harness `main`s (Verify/Bench) call `release()` after every query so
  * neither the cached blocks nor the registry's Dataset references
  * accumulate; `release()` is likewise for library callers composing
  * operators inside a long-lived session.
  *
  * SCOPE: the registry is process-wide and assumes ONE composition at a
  * time — `release()` drops every tracked cache, including those of a
  * concurrently running composition in the same JVM. Concurrent
  * pipelines should serialize their release points (results stay
  * correct either way: an evicted cache recomputes, it never corrupts).
  */
object Caches {
  private val tracked = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  /** Cache `ds` and remember it for a later [[release]]. */
  def track[T](ds: Dataset[T]): Dataset[T] = synchronized {
    tracked += ds
    ds.cache()
  }

  /** Remember an ALREADY-persisted dataset for a later [[release]]
    * (iterative operators persist loop state themselves; re-calling
    * `.cache()` on it would only log a spurious "already cached"
    * warning). */
  def register[T](ds: Dataset[T]): Dataset[T] = synchronized {
    tracked += ds
    ds
  }

  /** Unpersist every tracked dataset (non-blocking) and forget them. */
  def release(): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking = false))
    tracked.clear()
  }

  /** Number of currently tracked cached datasets (spec surface). */
  def trackedCount: Int = synchronized(tracked.size)
}

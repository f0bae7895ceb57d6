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
  * [[Caches.track]], and callers release the accumulated blocks after
  * materializing their results. Two granularities:
  *
  * {{{
  *   // whole-process (one composition at a time):
  *   val pairs = Dedup.minhashLshPairs(spark, dir).collect()
  *   Caches.release()           // drops every globally tracked cache
  *
  *   // per-composition scope (concurrency-safe):
  *   val (result, scope) = Caches.scope {
  *     Dedup.minhashLshPairs(spark, dir).collect()
  *   }
  *   scope.release()            // drops ONLY this composition's caches
  * }}}
  *
  * [[scope]] works because tracking happens at COMPOSITION time (the
  * operator function runs, builds the plan, calls `track`) on the
  * caller's thread — the scope stack is a thread-local, so two
  * compositions on different threads (or sequential scopes on one
  * thread) can't see each other's frames. Actions run after the body
  * merely fill blocks already tracked by the right scope. An operator
  * invoked OUTSIDE any scope tracks into the process-global registry,
  * preserving the original one-composition-at-a-time contract.
  *
  * Harness `main`s (Verify/Bench) wrap each query in a scope so neither
  * cached blocks nor registry Dataset references accumulate, and so a
  * concurrent composition in the same JVM keeps its caches. (Results
  * stay correct either way: an evicted cache recomputes, never
  * corrupts.)
  */
object Caches {

  /** A per-composition cache registry. Obtain via [[Caches.scope]]. */
  final class Scope private[Caches] () {
    private[Caches] val tracked = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

    /** Unpersist every dataset tracked in THIS scope and forget them.
      * Other scopes' (and the global registry's) caches stay live. */
    def release(): Unit = Caches.synchronized {
      tracked.foreach(_.unpersist(blocking = false))
      tracked.clear()
    }

    /** Number of datasets this scope currently tracks (spec surface). */
    def trackedCount: Int = Caches.synchronized(tracked.size)
  }

  private val global = new Scope
  // stack, not a single slot: scopes nest (an operator composed inside
  // a scoped composition may itself open a scope)
  private val current = new ThreadLocal[List[Scope]] {
    override def initialValue(): List[Scope] = Nil
  }

  /** Run `body` with a fresh scope capturing every [[track]]/[[register]]
    * on this thread; returns the body's result and the scope handle. */
  def scope[A](body: => A): (A, Scope) = {
    val s = new Scope
    val prev = current.get()
    current.set(s :: prev)
    try {
      // a throwing body would otherwise leak its already-tracked caches
      // forever: the handle never reaches the caller and the global
      // release() deliberately doesn't cover scoped frames
      val r = try body catch { case t: Throwable => s.release(); throw t }
      (r, s)
    } finally current.set(prev)
  }

  private def registry: Scope = current.get().headOption.getOrElse(global)

  /** Cache `ds` and remember it for a later release (innermost active
    * scope on this thread, else the global registry). */
  def track[T](ds: Dataset[T]): Dataset[T] = synchronized {
    registry.tracked += ds
    ds.cache()
  }

  /** Remember an ALREADY-persisted dataset for a later release
    * (iterative operators persist loop state themselves; re-calling
    * `.cache()` on it would only log a spurious "already cached"
    * warning). */
  def register[T](ds: Dataset[T]): Dataset[T] = synchronized {
    registry.tracked += ds
    ds
  }

  /** The calling thread's current scope stack — captured by [[Par]] so
    * a driver-side worker thread tracks into the SAME scope as the
    * composition that spawned it (a bare thread would otherwise track
    * into the global registry, leaking Dataset references past the
    * query's scope release). */
  private[operators] def scopes: List[Scope] = current.get()

  /** Run `body` with the given scope stack installed on this thread
    * (restores the previous stack afterwards) — [[Par]]'s worker-thread
    * entry. */
  private[operators] def runWithScopes[A](s: List[Scope])(body: => A): A = {
    val prev = current.get()
    current.set(s)
    try body finally current.set(prev)
  }

  /** Unpersist every GLOBALLY tracked dataset (non-blocking) and forget
    * them. Scoped caches are untouched — release those via their handle. */
  def release(): Unit = global.release()

  /** Number of globally tracked cached datasets (spec surface). */
  def trackedCount: Int = global.trackedCount
}

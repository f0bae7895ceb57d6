package graft.operators

/** Overlap INDEPENDENT Spark actions from driver threads — the
  * optimization-guide §2.6 pattern: Spark's scheduler happily runs
  * several jobs at once inside one application; actions are only
  * sequential because driver code calls them sequentially. Where a
  * declared query performs several independent builds (q79's six index
  * tables, q109's tokenizer training alongside the cleaning funnel),
  * submitting them concurrently lets the next job's tasks back-fill
  * executors freed by the current job's tail instead of leaving the
  * cluster idle on every straggler. Default FIFO scheduling gives
  * exactly the back-fill behavior; results are unchanged because the
  * tasks share no data and write to disjoint outputs.
  *
  * Thread plumbing: each worker inherits the spawning thread's
  * [[Caches]] scope stack, so operator-internal `Caches.track` calls
  * land in the SAME scope the composition releases (a bare thread would
  * track into the process-global registry and leak Dataset references
  * past the query's release). Failures propagate: the first throwable
  * is rethrown on the caller after all workers finish.
  */
private[graft] object Par {

  /** Run all `tasks` concurrently (one driver thread each — the task
    * bodies are Spark actions, so real parallelism happens on the
    * executors); rethrows the first failure after every task ends. */
  def run(tasks: Seq[() => Unit]): Unit = {
    if (tasks.sizeIs <= 1) { tasks.foreach(_.apply()); return }
    val scopes = Caches.scopes
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val threads = tasks.zipWithIndex.map { case (t, i) =>
      val th = new Thread(
        () =>
          try Caches.runWithScopes(scopes)(t())
          catch { case e: Throwable => failure.compareAndSet(null, e) },
        s"graft-par-$i")
      th.setDaemon(true)
      th.start()
      th
    }
    threads.foreach(_.join())
    val e = failure.get()
    if (e != null) throw e
  }

  /** Run `bg` on a worker thread while `fg` runs on the caller; returns
    * both results after both complete. Either side's failure is
    * rethrown (fg's first — it is the caller's own frame). */
  def join2[A, B](fg: => A)(bg: => B): (A, B) = {
    val scopes = Caches.scopes
    val out = new java.util.concurrent.atomic.AtomicReference[Either[Throwable, B]]()
    val th = new Thread(
      () =>
        out.set(
          try Right(Caches.runWithScopes(scopes)(bg))
          catch { case e: Throwable => Left(e) }),
      "graft-par-bg")
    th.setDaemon(true)
    th.start()
    val a = try fg catch { case e: Throwable => th.join(); throw e }
    th.join()
    out.get() match {
      case Right(b) => (a, b)
      case Left(e)  => throw e
    }
  }
}

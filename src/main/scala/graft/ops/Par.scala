package graft.ops

/** Run INDEPENDENT driver-side actions concurrently — the optimization
  * guide's §2.6 "overlap independent jobs": Spark happily runs several
  * jobs at once inside one application, and actions are only sequential
  * because driver code calls them sequentially. Submitting independent
  * pipelines (e.g. the campaign composites' three per-family builds,
  * which touch disjoint persisted roots) from separate threads lets the
  * next pipeline's tasks back-fill executor cores freed by the current
  * one's straggler tail, instead of leaving the machine idle.
  *
  * Scope rules, enforced by the call sites, not this helper:
  *  - thunks must touch DISJOINT persisted roots ([[Stage]] leases are
  *    per-root and re-entrancy is thread-local, so a lease the CALLER
  *    already holds is invisible to the pool thread — never dispatch
  *    work under a held lease);
  *  - thunks must not depend on one another's side effects.
  *
  * The first failing thunk's exception propagates (unwrapped); remaining
  * threads are interrupted best-effort, matching the sequential form's
  * fail-fast semantics (a partially built composite state fails the
  * query either way).
  */
object Par {
  def run(thunks: (() => Unit)*): Unit = {
    if (thunks.sizeIs <= 1) { thunks.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(thunks.size)
    try {
      val futs = thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = t()
        })
      }
      futs.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      }
    } finally pool.shutdownNow()
  }
}

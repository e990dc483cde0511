package graft

/** Run independent DataFrame-CONSTRUCTION closures concurrently
  * (optimization guide §2.6 "overlap independent jobs"): the per-class /
  * per-strategy cells of the evaluation matrices each issue several small
  * blocking driver actions while they are BUILT (query-file collects,
  * ground-truth localCheckpoints, selectivity counts), and running those
  * constructions sequentially serializes the actions while most executor
  * cores idle — the scheduler happily back-fills tasks from concurrent
  * jobs (FIFO scheduling is exactly the desired behaviour).
  *
  * Results are position-identical to the sequential form: each closure
  * builds its own deterministic frame, the caller unions them in input
  * order, and on failure the FIRST failing item BY INPUT POSITION (not by
  * wall-clock) propagates — guard exceptions stay deterministic. */
object Par {
  def ordered[A, B](items: Seq[A], parallelism: Int = 4)(f: A => B): Seq[B] = {
    if (items.size <= 1) return items.map(f)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, items.size))
    try {
      val futures = items.map(a =>
        pool.submit(new java.util.concurrent.Callable[B] {
          override def call(): B = f(a)
        }))
      futures.zipWithIndex.map { case (fut, i) =>
        try fut.get()
        catch { case e: java.util.concurrent.ExecutionException =>
          // first failure BY POSITION propagates (deterministic guards);
          // cancel the rest so in-flight cells' eager Spark jobs don't
          // keep running on non-daemon threads after the unwind (ADVICE
          // r17) — interrupt + shutdownNow, then a bounded drain
          futures.drop(i + 1).foreach(_.cancel(true))
          pool.shutdownNow()
          pool.awaitTermination(10, java.util.concurrent.TimeUnit.SECONDS)
          throw e.getCause }
      }
    } finally pool.shutdown()
  }
}

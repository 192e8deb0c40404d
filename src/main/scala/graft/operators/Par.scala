package graft.operators

/** Driver-thread overlap for INDEPENDENT eager builds (guide §2.6
  * "overlap independent jobs", r21): Spark happily runs several jobs
  * at once inside one application — actions are only sequential
  * because driver code calls them sequentially. The operators here
  * use it where two or three build chains share nothing but
  * already-pinned inputs (a recall dial's truth pass beside its chain
  * build; a funnel's per-arm closures), so the scheduler back-fills
  * one stream's task tail with the other's tasks. Purely a
  * scheduling overlap: each branch is deterministic on its own and
  * neither reads anything another writes, so evaluation order cannot
  * change any row. Branch failures are rethrown unwrapped.
  */
private[operators] object Par {
  private def await[T](f: java.util.concurrent.CompletableFuture[T]): T =
    try f.get()
    catch { case e: java.util.concurrent.ExecutionException =>
      throw e.getCause }

  def concurrently[A, B](a: => A, b: => B): (A, B) = {
    val fb = java.util.concurrent.CompletableFuture.supplyAsync(() => b)
    val ra = a
    (ra, await(fb))
  }

  def concurrently3[A, B, C](a: => A, b: => B, c: => C): (A, B, C) = {
    val fb = java.util.concurrent.CompletableFuture.supplyAsync(() => b)
    val fc = java.util.concurrent.CompletableFuture.supplyAsync(() => c)
    val ra = a
    (ra, await(fb), await(fc))
  }
}

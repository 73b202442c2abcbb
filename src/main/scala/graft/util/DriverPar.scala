package graft.util

/** Concurrent execution of INDEPENDENT blocking Spark driver actions
  * (collects, localCheckpoints, eager plane builds) so their jobs overlap
  * in the scheduler instead of queueing behind one another. Job submission
  * is thread-safe in Spark; what needs discipline is the driver side:
  *
  *  - DEDICATED threads, never `ExecutionContext.Implicits.global`: the
  *    shared fork-join pool is sized for CPU-bound work, and parking
  *    blocking Spark actions there can starve every other caller of the
  *    global pool (and deadlock a small one) — the r17 advice finding on
  *    the dataset-card plane build. One plain thread per thunk is the
  *    right tool: the fan-out is always bounded (2–4 driver actions), so
  *    pool reuse buys nothing.
  *  - Settle ALL thunks before surfacing any failure: a Spark job cannot
  *    be cancelled through a Future/Thread handle, so rethrowing on the
  *    first failure would leave sibling jobs running detached — consuming
  *    the cluster with nothing awaiting them (the r17 review find on the
  *    card futures, kept as the shared rule here).
  */
object DriverPar {

  /** Run every thunk on its own daemon thread, join them all, rethrow the
    * FIRST failure only after every sibling has settled. Returns results
    * in input order. */
  def settleAll[A](thunks: Seq[() => A]): Seq[A] = {
    val results = new Array[scala.util.Try[A]](thunks.size)
    val threads = thunks.zipWithIndex.map { case (t, i) =>
      val th = new Thread(() => { results(i) = scala.util.Try(t()) },
        s"graft-driver-par-$i")
      th.setDaemon(true)
      th.start()
      th
    }
    threads.foreach(_.join())
    results.collectFirst { case scala.util.Failure(e) => throw e }
    results.toIndexedSeq.map(_.get)
  }
}

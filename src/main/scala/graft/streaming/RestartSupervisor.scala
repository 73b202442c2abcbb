package graft.streaming

/** U5 — failure-rate restart policy, the driver-side twin of the reference's
  * `failureRateRestart(10 failures / 5 min, 10 s delay)`
  * (BaseValidationJob.scala:389-393). Structured Streaming has no engine-level
  * restart strategy — a failed query is dead until the driver restarts it — so
  * the supervisor loop owns the policy: rerun after `delayMs`, unless more than
  * `maxFailuresPerWindow` failures landed inside the trailing `windowMs`, in
  * which case the last failure is rethrown (job-level failure, exactly like
  * Flink giving up).
  *
  * Clock and sleep are injectable so the spec pins the policy with a virtual
  * clock, mirroring how the reference's strategy is configuration-tested.
  */
class RestartSupervisor(
    maxFailuresPerWindow: Int = 10,
    windowMs: Long = 300000L,
    delayMs: Long = 10000L,
    now: () => Long = () => System.currentTimeMillis,
    sleep: Long => Unit = Thread.sleep) {

  private val failures = scala.collection.mutable.Queue.empty[Long]

  /** Run `runOnce` (e.g. `() => startQuery().awaitTermination()`) to completion,
    * restarting on failure per the failure-rate policy. Returns when a run
    * finishes without throwing; rethrows when the rate is exceeded. */
  def supervise(runOnce: () => Unit): Unit = {
    while (true) {
      try {
        runOnce()
        return
      } catch {
        // NonFatal: OutOfMemoryError/LinkageError must kill the driver, and an
        // InterruptedException during shutdown must propagate, not restart
        case scala.util.control.NonFatal(e) =>
          val t = now()
          failures.enqueue(t)
          while (failures.nonEmpty && failures.head <= t - windowMs) failures.dequeue()
          if (failures.size > maxFailuresPerWindow) throw e
          sleep(delayMs)
      }
    }
  }
}

package graft.util

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** [[DriverPar.settleAll]] — the shared concurrent-driver-action
  * discipline (x49 plane builds, x92 artifact builds). Pins: input-order
  * results, genuine concurrency (dedicated threads, not caller-serial),
  * and the settle-ALL rule — the first failure rethrows only after every
  * sibling finished (Spark jobs can't be cancelled through a thread
  * handle; abandoning one would leak running work). */
class DriverParSpec extends AnyFunSuite with Matchers {

  test("results come back in input order, not completion order") {
    val out = DriverPar.settleAll(Seq(
      () => { Thread.sleep(120); "slow" },
      () => "fast"))
    out shouldBe Seq("slow", "fast")
  }

  test("thunks genuinely overlap on dedicated threads") {
    val gate = new java.util.concurrent.CountDownLatch(2)
    // each thunk blocks until BOTH have started: serial execution would
    // deadlock, so completing at all proves concurrency
    val out = DriverPar.settleAll(Seq.fill(2)(() => {
      gate.countDown()
      gate.await(10, java.util.concurrent.TimeUnit.SECONDS) shouldBe true
      Thread.currentThread().getName
    }))
    out.foreach(_ should startWith("graft-driver-par-"))
    out.toSet should have size 2
  }

  test("a failing thunk rethrows only after every sibling settled, and " +
      "the FIRST failure wins") {
    val finished = new java.util.concurrent.atomic.AtomicBoolean(false)
    val e = intercept[IllegalStateException] {
      DriverPar.settleAll[Any](Seq(
        () => throw new IllegalStateException("first"),
        () => throw new RuntimeException("second"),
        () => { Thread.sleep(150); finished.set(true) }))
    }
    e.getMessage shouldBe "first"
    finished.get() shouldBe true // the slow sibling ran to completion
  }
}

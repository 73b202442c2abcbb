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
      "the TEMPORALLY first failure wins (later ones are usually its " +
      "cancellation artifacts)") {
    val finished = new java.util.concurrent.atomic.AtomicBoolean(false)
    val e = intercept[IllegalStateException] {
      DriverPar.settleAll[Any](Seq(
        () => { Thread.sleep(200); throw new RuntimeException("later") },
        () => throw new IllegalStateException("first"),
        () => { Thread.sleep(150); finished.set(true) }))
    }
    e.getMessage shouldBe "first"
    finished.get() shouldBe true // the non-Spark sibling ran to completion
  }
}

/** The Spark half of the [[DriverPar]] contract: the first failure CANCELS
  * sibling job groups mid-stage instead of letting them burn to
  * completion — on a real cluster a failed plane must not keep its
  * siblings computing results nobody will read. */
class DriverParCancelSpec extends AnyFunSuite with graft.SparkSpec
    with Matchers {
  test("first failure cancels a sibling's running Spark job group and the " +
      "root cause — not the cancellation artifact — rethrows") {
    val s = spark
    import org.apache.spark.sql.functions.{col, udf}
    val slow = udf((_: Long) => { Thread.sleep(10); true })
    // warm the plan shape OUTSIDE the timed window: cancelJobGroup kills
    // IN-FLIGHT jobs only, so the sibling must already be running tasks
    // when the failure lands — a cold first-job compile would race it
    s.range(8).repartition(4).filter(slow(col("id"))).count()
    val t0 = System.nanoTime()
    val e = intercept[RuntimeException] {
      DriverPar.settleAll[Any](Seq(
        () => { Thread.sleep(1500); throw new RuntimeException("root cause") },
        // 4 tasks × 3 000 rows × 10 ms ≈ 30 s natural runtime
        () => s.range(12000).repartition(4)
          .filter(slow(col("id"))).count()))
    }
    e.getMessage shouldBe "root cause"
    val wall = (System.nanoTime() - t0) / 1e9
    withClue(s"wall ${wall}s — cancellation should beat the ~30s job: ") {
      wall should be < 15.0
    }
  }
}

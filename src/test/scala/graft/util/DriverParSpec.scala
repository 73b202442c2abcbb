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
    // the cancellation evidence is the OBSERVABLE work count, not wall
    // clock: a wall-clock bound on a shared box with documented ~30%
    // co-tenant swings can flake with no product bug (r18 advice). Spark
    // folds accumulator updates from SUCCESSFUL tasks only, so a killed
    // task contributes nothing — an uncancelled sibling would fold all
    // 12 000 rows, a cancelled one only the rows of tasks that finished
    // before the kill landed.
    val seen = s.sparkContext.longAccumulator("driverpar-cancel-rows")
    val slow = udf((_: Long) => { seen.add(1); Thread.sleep(10); true })
    // warm the plan shape OUTSIDE the measured window: cancelJobGroup
    // kills IN-FLIGHT jobs only, so the sibling must already be running
    // tasks when the failure lands — a cold first-job compile would race it
    s.range(8).repartition(4).filter(slow(col("id"))).count()
    seen.reset()
    val e = intercept[RuntimeException] {
      DriverPar.settleAll[Any](Seq(
        () => { Thread.sleep(1500); throw new RuntimeException("root cause") },
        // 4 tasks × 3 000 rows × 10 ms ≈ 30 s natural runtime
        () => s.range(12000).repartition(4)
          .filter(slow(col("id"))).count()))
    }
    e.getMessage shouldBe "root cause"
    withClue(s"rows folded from successful tasks: ${seen.value} of 12000 — " +
        "an uncancelled sibling runs to completion and folds them all: ") {
      seen.value.longValue should be < 12000L
    }
  }
}

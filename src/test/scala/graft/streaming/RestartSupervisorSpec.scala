package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the failure-rate restart policy (reference
  * BaseValidationJob.scala:389-393) with a virtual clock. */
class RestartSupervisorSpec extends AnyFunSuite with Matchers {

  test("transient failures restart after the delay; success ends supervision") {
    var t = 0L
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sup = new RestartSupervisor(maxFailuresPerWindow = 10, windowMs = 300000L,
      delayMs = 10000L, now = () => t, sleep = d => { sleeps += d; t += d })
    var runs = 0
    sup.supervise { () =>
      runs += 1
      if (runs <= 3) throw new RuntimeException(s"boom $runs")
    }
    runs shouldBe 4
    sleeps.toSeq shouldBe Seq(10000L, 10000L, 10000L)
  }

  test("exceeding the rate inside the window rethrows the last failure") {
    var t = 0L
    val sup = new RestartSupervisor(maxFailuresPerWindow = 3, windowMs = 300000L,
      delayMs = 1000L, now = () => t, sleep = d => t += d)
    val e = intercept[RuntimeException] {
      sup.supervise { () => throw new RuntimeException("always") }
    }
    e.getMessage shouldBe "always"
  }

  test("failures outside the trailing window do not count toward the rate") {
    var t = 0L
    var runs = 0
    val sup = new RestartSupervisor(maxFailuresPerWindow = 2, windowMs = 100L,
      delayMs = 60L, now = () => t, sleep = d => t += d)
    // each failure is 60 ms apart; window holds at most 2 -> never exceeds 2,
    // so the 5th run can succeed even though 4 failures happened overall
    sup.supervise { () =>
      runs += 1
      if (runs <= 4) throw new RuntimeException("flaky")
    }
    runs shouldBe 5
  }
}

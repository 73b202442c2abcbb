package graft.topics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** U1 — topic validation + derivation, mirroring the reference's
  * BaseValidationJobPropertiesTest.scala:32-111 cases. */
class TopicsSpec extends AnyFunSuite with Matchers {

  test("derives sibling topics by suffix swap") {
    val in = "ingest.tenant1.claims.in"
    Topics.outputTopic(in) shouldBe "ingest.tenant1.claims.out"
    Topics.invalidTopic(in) shouldBe "ingest.tenant1.claims.invalid"
    Topics.notificationTopic(in) shouldBe "ingest.tenant1.claims.notification"
    Topics.tenantId(in) shouldBe "tenant1"
  }

  test("accepts the optional qualifier part") {
    val in = "ingest.tenant1.claims.qualifier.in"
    Topics.outputTopic(in) shouldBe "ingest.tenant1.claims.qualifier.out"
    Topics.tenantId(in) shouldBe "tenant1"
  }

  test("qualifier may itself contain dots (>=4 parts accepted)") {
    val in = "ingest.t.di.q1.q2.in"
    Topics.notificationTopic(in) shouldBe "ingest.t.di.q1.q2.notification"
  }

  test("rejects missing ingest. prefix") {
    a[TopicNamingException] should be thrownBy Topics.validate("bad.tenant.claims.in")
  }

  test("rejects missing .in suffix") {
    a[TopicNamingException] should be thrownBy Topics.validate("ingest.tenant.claims.out")
  }

  test("rejects too few parts") {
    a[TopicNamingException] should be thrownBy Topics.validate("ingest.tenant.in")
  }

  test("derivation on an invalid name throws before deriving") {
    a[TopicNamingException] should be thrownBy Topics.outputTopic("ingest.t.in")
  }
}

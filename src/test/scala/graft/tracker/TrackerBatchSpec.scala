package graft.tracker

import graft.SparkSpec
import graft.model.Status
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The batch (oracle-checkable) twin of the tracker: final-count decision CASE.
  * Covers each terminal branch plus the documented streaming-vs-batch divergences. */
class TrackerBatchSpec extends AnyFunSuite with Matchers with SparkSpec {

  import spark.implicits._

  private def countsDf(rows: (String, Boolean)*): DataFrame =
    rows.toSeq.toDF("batchId", "isValid")

  /** (id, status, expected, threshold) */
  private def batchesDf(rows: (String, String, Int, Int)*): DataFrame =
    rows.toSeq.map { case (id, st, exp, thr) => (id, s"name-$id", st, exp, thr) }
      .toDF("id", "name", "status", "expectedRecordCount", "invalidThreshold")

  private def decide(counts: DataFrame, batches: DataFrame): Map[String, Row] =
    TrackerBatch.decide(counts, batches).collect()
      .map(r => r.getAs[String]("id") -> Row(r)).toMap

  private case class Row(r: org.apache.spark.sql.Row) {
    def status: String = r.getAs[String]("final_status")
    def msg: String = r.getAs[String]("failure_message")
    def actual: AnyRef = r.getAs[AnyRef]("actual_record_count")
    def invalidCount: AnyRef = r.getAs[AnyRef]("invalid_record_count")
  }

  test("counts: conditional sums per batch") {
    val c = TrackerBatch.counts(countsDf(
      "a" -> true, "a" -> false, "a" -> true, "b" -> false))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    c("a") shouldBe ((2, 1))
    c("b") shouldBe ((0, 1))
  }

  test("COMPLETED when SEND_COMPLETED and total == expected") {
    val d = decide(
      countsDf("a" -> true, "a" -> false),
      batchesDf(("a", Status.SendCompleted, 2, -1)))
    d("a").status shouldBe Status.Completed
    d("a").actual shouldBe 2
    d("a").invalidCount shouldBe 1
  }

  test("FAILED on overflow with the reference message shape") {
    val d = decide(
      countsDf("a" -> true, "a" -> true, "a" -> true),
      batchesDf(("a", Status.SendCompleted, 2, -1)))
    d("a").status shouldBe Status.Failed
    d("a").msg should include("received too many records, actualRecordCount: 3 > expectedRecordCount: 2")
  }

  test("FAILED on threshold (>= in batch mode) regardless of SEND_COMPLETED") {
    val d = decide(
      countsDf("a" -> false, "a" -> false, "a" -> false),
      batchesDf(("a", Status.Started, 100, 2)))
    d("a").status shouldBe Status.Failed
    d("a").msg should include("too many invalid records invalidCount: 3 == invalidThreshold: 2")
  }

  test("threshold precedence over overflow when both hold") {
    val d = decide(
      countsDf("a" -> false, "a" -> false, "a" -> false),
      batchesDf(("a", Status.SendCompleted, 1, 2)))
    d("a").status shouldBe Status.Failed
    d("a").msg should include("too many invalid records")
  }

  test("TERMINATED suppresses the threshold check; STARTED under-count stays put") {
    val d = decide(
      countsDf("t" -> false, "t" -> false, "s" -> true),
      batchesDf(("t", Status.Terminated, 10, 1), ("s", Status.Started, 10, -1)))
    d("t").status shouldBe Status.Terminated
    d("s").status shouldBe Status.Started
    d("s").actual shouldBe null // no terminal decision -> null final counters
  }

  test("batches with no counts keep their status with null counters") {
    val d = decide(
      countsDf("other" -> true),
      batchesDf(("idle", Status.SendCompleted, 5, -1)))
    d("idle").status shouldBe Status.SendCompleted
    d("idle").actual shouldBe null
  }

  test("SEND_COMPLETED under-count stays SEND_COMPLETED (incomplete, waiting)") {
    val d = decide(
      countsDf("a" -> true),
      batchesDf(("a", Status.SendCompleted, 5, -1)))
    d("a").status shouldBe Status.SendCompleted
  }
}

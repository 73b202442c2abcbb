package graft.validation

import graft.SparkSpec
import graft.model.{ErrorMessages, Schemas}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.nio.charset.StandardCharsets.UTF_8

/** V1–V11 router semantics over handcrafted records, mirroring the reference's
  * ValidationProcessFunctionTest matrix: header extraction (null/absent/duplicate/
  * UTF-8), each disposition branch, byte-for-byte pass-through on the valid output,
  * and the counts-emission rule (valid + payload-invalid only). */
class ValidationEngineSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def b(s: String): Array[Byte] = if (s == null) null else s.getBytes(UTF_8)
  private def hdr(k: String, v: String): Row = Row(k, b(v))

  /** (key, value, headers, topic, partition, offset) in Schemas.hriRecord shape. */
  private def records(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Schemas.hriRecord)

  private def rec(key: String, value: String, headers: Seq[Row], offset: Long): Row =
    Row(b(key), b(value), headers, "ingest.t1.claims.in", 0, offset)

  private def batches(rows: (String, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("id", "status")
  }

  private val liveBatches = batches(
    "started" -> "STARTED", "sending" -> "SEND_COMPLETED", "done" -> "COMPLETED",
    "failed" -> "FAILED", "terminated" -> "TERMINATED",
    "weird" -> "PAUSED") // not a status this pipeline knows

  private def validate(rows: Seq[Row]): DataFrame =
    ValidationEngine.validate(records(rows), liveBatches, new JsonValidator)

  private def dispositions(rows: Seq[Row]): Map[Long, String] =
    validate(rows).select("offset", "disposition").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("V1: extractBatchId takes the FIRST batchId header (duplicates legal)") {
    val d = validate(Seq(
      rec("k", "{}", Seq(hdr("batchId", "started"), hdr("batchId", "other")), 1L)))
      .select("batch_id").head.getString(0)
    d shouldBe "started"
  }

  test("V1: UTF-8 header values round-trip (中文)") {
    val out = validate(Seq(
      rec("k", "{}", Seq(hdr("batchId", "批次-中文")), 1L)))
      .select("batch_id").head.getString(0)
    out shouldBe "批次-中文"
  }

  test("V1: null headers array and absent batchId header both yield null batch_id") {
    val m = dispositions(Seq(
      rec("k", "{}", null, 1L),
      rec("k", "{}", Seq(hdr("passThru", "x")), 2L)))
    m(1L) shouldBe ValidationEngine.DispInvalidMissing
    m(2L) shouldBe ValidationEngine.DispInvalidMissing
  }

  test("router: one disposition per branch (V4-V8)") {
    val m = dispositions(Seq(
      rec("k", "{}", Seq(hdr("batchId", "started")), 1L),            // valid
      rec("k", "not-json", Seq(hdr("batchId", "started")), 2L),      // invalid payload
      rec("k", "{}", Seq(hdr("batchId", "nope")), 3L),               // unknown
      rec("k", "{}", Seq(hdr("batchId", "done")), 4L),               // already completed
      rec("k", "{}", Seq(hdr("batchId", "failed")), 5L),             // dropped
      rec("k", "{}", Seq(hdr("batchId", "terminated")), 6L),         // dropped
      rec("k", "{}", Seq.empty[Row], 7L),                            // missing
      // an UNRECOGNIZED status string (new API enum, wrong casing, typo):
      // the validator is gated off, so a bare otherwise(valid) fallthrough
      // would publish the record UNVALIDATED — it must route invalid instead
      rec("k", "not-json", Seq(hdr("batchId", "weird")), 8L)))
    m(1L) shouldBe ValidationEngine.DispValid
    m(2L) shouldBe ValidationEngine.DispInvalidPayload
    m(3L) shouldBe ValidationEngine.DispInvalidUnknown
    m(4L) shouldBe ValidationEngine.DispInvalidCompleted
    m(5L) shouldBe ValidationEngine.DispDropped
    m(6L) shouldBe ValidationEngine.DispDropped
    m(7L) shouldBe ValidationEngine.DispInvalidMissing
    m(8L) shouldBe ValidationEngine.DispInvalidUnknown
  }

  test("V8: null value is invalid; validator runs only for live batches") {
    val v = validate(Seq(
      rec("k", null, Seq(hdr("batchId", "started")), 1L),
      rec("k", "not-json", Seq(hdr("batchId", "done")), 2L)))
    val m = v.select("offset", "disposition").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    m(1L) shouldBe ValidationEngine.DispInvalidPayload
    // completed batch wins over payload state - validator result not consulted
    m(2L) shouldBe ValidationEngine.DispInvalidCompleted
  }

  test("V9: valid output passes key/value/headers through byte-for-byte (incl 中文)") {
    val payload = """{"name":"Porcpine","status":"snorkel-中文"}"""
    val out = ValidationEngine.validOutput(validate(Seq(
      rec("hriRec01", payload, Seq(hdr("batchId", "started"), hdr("passThru", "justPassinThru")), 1L))))
      .head
    new String(out.getAs[Array[Byte]]("key"), UTF_8) shouldBe "hriRec01"
    new String(out.getAs[Array[Byte]]("value"), UTF_8) shouldBe payload
    val hs = out.getSeq[Row](out.fieldIndex("headers"))
    hs.map(_.getString(0)) shouldBe Seq("batchId", "passThru")
    new String(hs(1).getAs[Array[Byte]](1), UTF_8) shouldBe "justPassinThru"
  }

  test("V10: invalid output carries the reference error strings and original pointers") {
    val inv = ValidationEngine.invalidOutput(validate(Seq(
      rec("k", "{}", Seq.empty[Row], 10L),
      rec("k", "{}", Seq(hdr("batchId", "nope")), 11L),
      rec("k", "{}", Seq(hdr("batchId", "done")), 12L),
      rec("k", "oops", Seq(hdr("batchId", "started")), 13L))))
      .collect().map(r => r.getAs[Long]("offset") -> r.getAs[String]("failure")).toMap
    inv(10L) shouldBe ErrorMessages.MissingBatchId
    inv(11L) shouldBe ErrorMessages.UnknownBatchId
    inv(12L) shouldBe ErrorMessages.AlreadyCompleted
    inv(13L) should startWith("com.fasterxml.jackson.core.JsonParseException")
  }

  test("V11: counts emitted for valid AND payload-invalid, never for V4/V5/V6/V7") {
    val counts = ValidationEngine.countsOutput(validate(Seq(
      rec("k", "{}", Seq(hdr("batchId", "started")), 1L),
      rec("k", "bad", Seq(hdr("batchId", "sending")), 2L),
      rec("k", "{}", Seq.empty[Row], 3L),
      rec("k", "{}", Seq(hdr("batchId", "nope")), 4L),
      rec("k", "{}", Seq(hdr("batchId", "done")), 5L),
      rec("k", "{}", Seq(hdr("batchId", "terminated")), 6L))))
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    counts.toSet shouldBe Set("started" -> true, "sending" -> false)
  }

  test("the batch snapshot join is planned as a broadcast join (no shuffle of records)") {
    val plan = validate(Seq(rec("k", "{}", Seq(hdr("batchId", "started")), 1L)))
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }
}

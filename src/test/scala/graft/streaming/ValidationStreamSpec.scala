package graft.streaming

import graft.SparkSpec
import graft.http.{MapBatchLookup, RequestException, Retry}
import graft.model.{BatchNotification, Status}
import graft.validation.JsonValidator
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.collection.mutable.ArrayBuffer
import scala.util.Try

/** End-to-end streaming validation — the SS analog of the reference's
  * mini-cluster job tests (ValidationJobIntTest.scala): scripted sources, real
  * queries, collected outputs. */
class ValidationStreamSpec extends AnyFunSuite with SparkSpec with Matchers {

  case class Hdr(key: String, value: Array[Byte])
  case class Rec(key: Array[Byte], value: Array[Byte], headers: Seq[Hdr],
      topic: String, partition: Int, offset: Long)

  private def rec(offset: Long, batchId: Option[String], payload: String,
      topic: String = "ingest.t1.claims.in"): Rec =
    Rec(s"k$offset".getBytes, payload.getBytes,
      batchId.map(b => Hdr("batchId", b.getBytes)).toSeq, topic, 0, offset)

  private def notifJson(id: String, status: String, expected: Int = 10): String =
    s"""{"id":"$id","name":"n-$id","topic":"ingest.t1.claims.in","dataType":"claims",""" +
      s""""status":"$status","expectedRecordCount":$expected,"invalidThreshold":-1}"""

  class CollectingSinks extends ValidationSinks {
    val validRows = ArrayBuffer.empty[Row]
    val invalidRows = ArrayBuffer.empty[Row]
    val countRows = ArrayBuffer.empty[Row]
    def valid(df: DataFrame, epochId: Long): Unit =
      validRows.synchronized { validRows ++= df.collect() }
    def invalid(df: DataFrame, epochId: Long): Unit =
      invalidRows.synchronized { invalidRows ++= df.collect() }
    def counts(df: DataFrame, epochId: Long): Unit =
      countRows.synchronized { countRows ++= df.collect() }
  }

  test("records are validated against the compacted notification snapshot") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val records = MemoryStream[Rec]
    val notifications = MemoryStream[String]
    val sinks = new CollectingSinks
    val dir = java.nio.file.Files.createTempDirectory("vstream").toString

    val running = graft.jobs.ValidationJob.start(
      s, records.toDF(), notifications.toDF(), new JsonValidator, sinks, dir)
    try {
      // control first: announce batch-1 (STARTED)
      notifications.addData(notifJson("batch-1", Status.Started))
      running.notificationQuery.processAllAvailable()

      records.addData(
        rec(0, Some("batch-1"), """{"ok":1}"""),      // valid
        rec(1, Some("batch-1"), "not-json"),          // payload-invalid → counts
        rec(2, Some("nope"), """{"ok":1}"""),         // unknown batch → invalid
        rec(3, None, """{"ok":1}"""))                 // missing header → invalid
      running.recordQuery.processAllAvailable()

      sinks.validRows.map(_.getAs[Long]("offset")) shouldBe ArrayBuffer(0L)
      val failures = sinks.invalidRows
        .map(r => r.getAs[Long]("offset") -> r.getAs[String]("failure")).toMap
      failures.keySet shouldBe Set(1L, 2L, 3L)
      failures(1L) should include("JsonParseException")
      failures(2L) shouldBe graft.model.ErrorMessages.UnknownBatchId
      failures(3L) shouldBe graft.model.ErrorMessages.MissingBatchId
      sinks.countRows.map(r =>
        (r.getAs[String]("batchId"), r.getAs[Boolean]("isValid"))).toSet shouldBe
        Set("batch-1" -> true, "batch-1" -> false)

      // status update compacts last-write-wins: COMPLETED rejects late records
      notifications.addData(notifJson("batch-1", Status.Completed))
      running.notificationQuery.processAllAvailable()
      records.addData(rec(4, Some("batch-1"), """{"late":1}"""))
      running.recordQuery.processAllAvailable()
      sinks.invalidRows.find(_.getAs[Long]("offset") == 4L)
        .get.getAs[String]("failure") shouldBe graft.model.ErrorMessages.AlreadyCompleted
    } finally {
      running.recordQuery.stop(); running.notificationQuery.stop()
    }
  }

  test("snapshot misses resolve through the BatchLookup SPI (V3 remote fallback)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val records = MemoryStream[Rec]
    val notifications = MemoryStream[String]
    val sinks = new CollectingSinks
    val dir = java.nio.file.Files.createTempDirectory("vstream2").toString
    val remote = new MapBatchLookup(Map(
      "remote-1" -> BatchNotification("remote-1", "n", "ingest.t1.claims.in",
        "claims", Status.Started, null, null, 10, -1, -1, -1, null,
        """{"compression":"gzip"}""")))

    val running = graft.jobs.ValidationJob.start(
      s, records.toDF(), notifications.toDF(), new JsonValidator, sinks, dir,
      lookup = Some(remote),
      lookupRetry = new Retry(initialBackoffMs = 1, giveUpAfterMs = 50))
    try {
      records.addData(
        rec(0, Some("remote-1"), """{"ok":1}"""),  // resolves remotely → valid
        rec(1, Some("remote-x"), """{"ok":1}"""))  // 404 → invalid (V5)
      running.recordQuery.processAllAvailable()
      sinks.validRows.map(_.getAs[Long]("offset")) shouldBe ArrayBuffer(0L)
      sinks.invalidRows.map(_.getAs[Long]("offset")) shouldBe ArrayBuffer(1L)
      running.snapshot.get("remote-1") should not be empty
      // opaque metadata survives the remote resolve into the snapshot row
      running.snapshot.get("remote-1").map(_.getString(12)) shouldBe
        Some("""{"compression":"gzip"}""")
    } finally {
      running.recordQuery.stop(); running.notificationQuery.stop()
    }
  }

  test("snapshot persists across restart (journal + reload)") {
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("vsnap").toString
    val store = new NotificationSnapshot(s, Some(dir))
    import s.implicits._
    store.update(Seq(("b1", Status.Started)).toDF("id", "status")
      .select(org.apache.spark.sql.functions.to_json(
        org.apache.spark.sql.functions.struct($"id", $"status")).as("v"))
      .select(org.apache.spark.sql.functions.from_json($"v",
        graft.model.Schemas.batchNotification).as("n"))
      .select($"n.*"))
    val reloaded = new NotificationSnapshot(s, Some(dir))
    reloaded.get("b1").map(_.getAs[String]("status")) shouldBe Some(Status.Started)
  }

  test("snapshot reload falls back to the pre-versioning journal layout") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("vsnap-legacy").toString
    // a checkpoint dir written before the journal became versioned: one
    // snapshot.parquet, no snapshot-v*.parquet
    Seq(("b-old", Status.SendCompleted)).toDF("id", "status")
      .select(org.apache.spark.sql.functions.to_json(
        org.apache.spark.sql.functions.struct($"id", $"status")).as("v"))
      .select(org.apache.spark.sql.functions.from_json($"v",
        graft.model.Schemas.batchNotification).as("n"))
      .select($"n.*")
      .write.parquet(s"$dir/snapshot.parquet")
    val store = new NotificationSnapshot(s, Some(dir))
    store.get("b-old").map(_.getAs[String]("status")) shouldBe Some(Status.SendCompleted)
  }
}

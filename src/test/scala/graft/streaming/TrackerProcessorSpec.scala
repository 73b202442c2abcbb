package graft.streaming

import graft.SparkSpec
import graft.model.{BatchNotification, Status}
import graft.tracker._
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Streaming twin of BatchStateMachineSpec: drives the real transformWithState
  * operator (RocksDB state store, processing-time timers) with a MemoryStream of
  * struct-encoded TrackerInputs — the SS analog of the reference's
  * `forKeyedCoProcessFunction` harness runs (TrackerTest.scala).
  *
  * Synchronization note: with ProcessingTime timers the engine schedules
  * timer-wakeup micro-batches continuously, so `processAllAvailable` never
  * quiesces — the harness instead waits on the committed source offset after each
  * feed step (preserving the cross-batch event ordering the reference tests pin)
  * and then polls the sink for the expected emission count.
  */
class TrackerProcessorSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def notif(id: String, status: String, expected: Int = 10,
      threshold: Int = -1): BatchNotification =
    BatchNotification(id, s"name-$id", s"ingest.t1.di.in", "claims", status,
      null, null, expected, -1, -1, threshold, null, null)

  /** Wait until the query has committed the MemoryStream offset `target`. */
  private def awaitOffset(q: StreamingQuery, target: Long, timeoutMs: Long = 30000): Unit = {
    val deadline = System.currentTimeMillis + timeoutMs
    def committed: Option[Long] =
      Option(q.lastProgress).flatMap(p => p.sources.headOption)
        .flatMap(s => Option(s.endOffset)).map(_.trim.toLong)
    while (!committed.exists(_ >= target)) {
      if (System.currentTimeMillis > deadline)
        fail(s"timed out waiting for offset $target (committed=$committed)")
      Thread.sleep(25)
    }
  }

  private def runStream(feed: Seq[Seq[TrackerEvent]], expectEmissions: Int,
      delayMs: Long = 0L, sinkName: String = s"tracker_out_${System.nanoTime}")
      : Seq[BatchNotification] = {
    val s = spark
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[TrackerInput] =
      Encoders.product[TrackerInput]
    val input = MemoryStream[TrackerInput]
    val out = TrackerProcessor.track(input.toDS(), delayMs)
    val dir = java.nio.file.Files.createTempDirectory("tracker-spec").toString
    val q = out.writeStream
      .format("memory").queryName(sinkName)
      .option("checkpointLocation", dir)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      // each feed step lands in its own micro-batch, preserving event order
      // across steps (the reference's per-element harness ordering); MemoryStream
      // offsets advance by one per addData call, starting at 0
      var offset = -1L
      feed.foreach { batch =>
        input.addData(batch.map(TrackerInput.of): _*)
        offset += 1
        awaitOffset(q, offset)
      }
      val deadline = System.currentTimeMillis + 30000
      while (s.table(sinkName).count() < expectEmissions &&
        System.currentTimeMillis < deadline) Thread.sleep(50)
      Thread.sleep(300) // settle: prove nothing EXTRA is emitted (T8)
      s.table(sinkName).as[BatchNotification](Encoders.product[BatchNotification])
        .collect().toSeq
    } finally q.stop()
  }

  test("T3: threshold crossing emits exactly one FAILED with counts at fire time") {
    val events = Seq(
      Seq[TrackerEvent](NotificationEvent("b1", notif("b1", Status.Started, threshold = 2))),
      Seq[TrackerEvent](CountEvent("b1", true), CountEvent("b1", false)),
      Seq[TrackerEvent](CountEvent("b1", false)), // invalid == 2 → FAILED
      Seq[TrackerEvent](CountEvent("b1", false))) // past threshold: nothing more
    val out = runStream(events, expectEmissions = 1)
    out.map(_.status) shouldBe Seq(Status.Failed)
    out.head.invalidRecordCount shouldBe 2
    out.head.actualRecordCount shouldBe 3
    out.head.failureMessage should include("invalidThreshold: 2")
  }

  test("T6: overflow past expectedRecordCount fails immediately") {
    // both counts in ONE micro-batch: with a zero completion delay, a lone
    // counts-match event would otherwise complete before the overflow arrives
    val out = runStream(Seq(
      Seq[TrackerEvent](NotificationEvent("b2", notif("b2", Status.SendCompleted, expected = 1))),
      Seq[TrackerEvent](CountEvent("b2", true), CountEvent("b2", true))),
      expectEmissions = 1)
    out.map(_.status) shouldBe Seq(Status.Failed)
    out.head.failureMessage should include("received too many records")
  }

  test("T4/T5: counts match arms the completion timer; fire emits COMPLETED once") {
    val out = runStream(Seq(
      Seq[TrackerEvent](NotificationEvent("b3", notif("b3", Status.SendCompleted, expected = 2))),
      Seq[TrackerEvent](CountEvent("b3", true)),
      Seq[TrackerEvent](CountEvent("b3", false))),
      expectEmissions = 1, delayMs = 100L)
    out.map(_.status) shouldBe Seq(Status.Completed)
    out.head.actualRecordCount shouldBe 2
    out.head.invalidRecordCount shouldBe 1
  }

  test("keyed isolation: two interleaved batches track independently") {
    val out = runStream(Seq(
      Seq[TrackerEvent](
        NotificationEvent("a", notif("a", Status.SendCompleted, expected = 1)),
        NotificationEvent("b", notif("b", Status.Started, threshold = 1))),
      Seq[TrackerEvent](CountEvent("a", true), CountEvent("a", true),
        CountEvent("b", false))),
      expectEmissions = 2)
    out.find(_.id == "a").map(_.status) shouldBe Some(Status.Failed) // overflow
    out.find(_.id == "b").map(_.status) shouldBe Some(Status.Failed) // threshold
    out should have size 2
  }

  test("the tracker input stream has a real column schema, not a Kryo blob") {
    import spark.implicits._
    val counts = Seq(graft.model.CountsDelta("b", 1L, 0L)).toDS()
    val notifs = spark.createDataset(
      Seq(notif("b", Status.Started)))(Encoders.product[BatchNotification])
    val unioned = TrackerProcessor.unionEvents(counts, notifs)
    // the union that crosses the tracker shuffle must stay introspectable
    // (state/offset tooling reads columns) and evolvable (nullable adds) —
    // a sealed-trait Kryo encoding collapses to one opaque binary column
    unioned.schema.fieldNames.toSeq shouldBe
      Seq("batchId", "validDelta", "invalidDelta", "notification")
    unioned.schema("notification").dataType shouldBe a[
      org.apache.spark.sql.types.StructType]
    // round-trip: both variants decode back to the machine's ADT
    val evs = unioned.collect().map(_.toEvent)
    evs.collect { case CountEvent(b, v, i) => (b, v, i) } shouldBe
      Array(("b", 1L, 0L))
    evs.collect { case NotificationEvent(b, n) => (b, n.status) } shouldBe
      Array(("b", Status.Started))
  }
}

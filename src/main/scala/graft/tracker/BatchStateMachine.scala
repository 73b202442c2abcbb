package graft.tracker

import graft.model.{BatchNotification, BatchState, Status}

/** Events consumed by the tracker: a per-record counts message or a notification
  * update. SS has no two-input keyed co-process, so the two streams are
  * union-encoded into one ADT before `groupByKey` (SURVEY.md §7.8 risk #2) —
  * mirroring the reference's `KeyedCoProcessFunction` twin inputs
  * (Tracker.scala:47-90).
  */
sealed trait TrackerEvent { def batchId: String }

/** Pre-aggregated per-epoch count deltas. The validation plane aggregates its
  * per-record counts map-side before the tracker shuffle (one row per batch per
  * micro-batch, not per record) — so a delta may advance the invalid counter past
  * the threshold in one step; the machine fires T3 on the CROSSING
  * (`before < threshold <= after`), which reduces to the reference's exact-`==`
  * fire for unit deltas (Tracker.scala:153-162). */
case class CountEvent(batchId: String, validDelta: Long, invalidDelta: Long) extends TrackerEvent
object CountEvent {
  /** Unit-delta convenience — one validated record (the reference's per-record
    * counts message shape, ValidationProcessFunction.scala:152-158). */
  def apply(batchId: String, isValid: Boolean): CountEvent =
    CountEvent(batchId, if (isValid) 1L else 0L, if (isValid) 0L else 1L)
}
case class NotificationEvent(batchId: String, notification: BatchNotification) extends TrackerEvent
/** Processing-time timer firing (T5). */
case class TimerEvent(batchId: String, fireTime: Long) extends TrackerEvent

/** STRUCT-encoded union of the tracker's two STREAM inputs (counts ⊎
  * notifications) — the wire/shuffle twin of the [[TrackerEvent]] ADT. A
  * sealed trait needs an opaque Kryo blob to cross the shuffle, which hides
  * the stream schema from the offset/state tooling and can never evolve; this
  * flat struct keeps every field a real column (introspectable via
  * `printSchema`/state-reader, evolvable by adding nullable columns). The
  * discriminant is `notification`: null ⇒ count event, present ⇒ notification
  * event. [[TimerEvent]]s never flow through the stream — the processor
  * synthesizes them from expired timers, so they need no wire shape. */
case class TrackerInput(
    batchId: String,
    validDelta: Long,
    invalidDelta: Long,
    notification: Option[BatchNotification]) {
  def toEvent: TrackerEvent =
    notification.map(n => NotificationEvent(batchId, n): TrackerEvent)
      .getOrElse(CountEvent(batchId, validDelta, invalidDelta))
}
object TrackerInput {
  def count(c: graft.model.CountsDelta): TrackerInput =
    TrackerInput(c.batchId, c.validDelta, c.invalidDelta, None)
  def notification(n: BatchNotification): TrackerInput =
    TrackerInput(n.id, 0L, 0L, Some(n))
  /** Wire-encode a machine event (test harnesses drive the processor with
    * ADT values); timers are processor-internal and have no wire shape. */
  def of(ev: TrackerEvent): TrackerInput = ev match {
    case CountEvent(b, v, i) => TrackerInput(b, v, i, None)
    case NotificationEvent(b, n) => TrackerInput(b, 0L, 0L, Some(n))
    case t: TimerEvent => throw new IllegalArgumentException(
      s"TimerEvent is processor-internal and never stream-carried: $t")
  }
}

/** Pure per-batch state machine — T1–T8 of SURVEY.md §2.4, kept Spark-free so the
  * timer/ordering semantics are unit-testable without a cluster (reference pins them
  * in TrackerTest.scala with a virtual clock; we do the same).
  *
  * Transition semantics (reference Tracker.scala):
  *  - T1 counts accumulate valid/invalid, bump lastModified (:47-69)
  *  - T2 notification replaces the stored metadata, keeps counts (:71-90)
  *  - T3 threshold fail fires when invalid == threshold exactly (:153-162)
  *  - T4 counts-match + SEND_COMPLETED arms a completion timer at
  *    lastModified + completionDelayMs (:116-120,129-139)
  *  - T5 timer fire re-checks completeness before emitting COMPLETED (:93-103)
  *  - T6 overflow (total > expected) fails immediately (:141-151)
  *  - T8 at most one terminal notification per batch, ever (:186-194)
  */
class BatchStateMachine(completionDelayMs: Long = 300000L) extends Serializable {

  def initialState: BatchState = BatchState(0, 0, isFinished = false, 0L, None)

  /** Outcome of one event: next state, optional terminal notification to emit,
    * optional processing-time timer to (re-)arm. */
  case class Outcome(state: BatchState, emit: Option[BatchNotification], armTimerAt: Option[Long])

  def onEvent(state: BatchState, event: TrackerEvent, nowMs: Long): Outcome = event match {
    case CountEvent(_, validDelta, invalidDelta) =>
      val s = state.copy(
        valid = state.valid + validDelta,
        invalid = state.invalid + invalidDelta,
        lastModified = nowMs)
      check(s, nowMs, prevInvalid = state.invalid)
    case NotificationEvent(_, n) =>
      val s = state.copy(notification = Some(n), lastModified = nowMs)
      check(s, nowMs, prevInvalid = state.invalid)
    case TimerEvent(_, _) =>
      // T5: re-validate at fire time — arrivals during the delay with counts that no
      // longer match cancel the completion (reference Tracker.scala:93-103).
      if (isComplete(state)) terminal(state, Status.Completed, null)
      else Outcome(state, None, None)
  }

  private def isComplete(s: BatchState): Boolean = s.notification.exists { n =>
    n.status == Status.SendCompleted && !s.isFinished &&
      s.valid + s.invalid == n.expectedRecordCount
  }

  private def check(s: BatchState, nowMs: Long, prevInvalid: Long): Outcome = s.notification match {
    case None => Outcome(s, None, None)
    case Some(n) =>
      if (n.invalidThreshold > -1 && n.status != Status.Terminated && !s.isFinished &&
        s.invalid >= n.invalidThreshold &&
        (prevInvalid < n.invalidThreshold || s.invalid == n.invalidThreshold)) {
        // T3 — fires exactly once, on the CROSSING. For unit deltas this is the
        // reference's exact `==` (Tracker.scala:153-162); for pre-aggregated
        // deltas the counter may jump past the threshold in one event, so the
        // condition is `before < threshold <= after`. A notification arriving
        // when the counter already exceeds (not equals) the threshold does NOT
        // fire — exactly like the reference's `==`.
        terminal(s, Status.Failed,
          s"Failing Batch: ${n.id}, too many invalid records invalidCount: " +
            s"${s.invalid} == invalidThreshold: ${n.invalidThreshold}")
      } else if (n.status == Status.SendCompleted && !s.isFinished &&
        s.valid + s.invalid > n.expectedRecordCount) {
        // T6 — overflow fails immediately.
        terminal(s, Status.Failed,
          s"Failing batch: ${n.id}, received too many records, actualRecordCount: " +
            s"${s.valid + s.invalid} > expectedRecordCount: ${n.expectedRecordCount}")
      } else if (isComplete(s)) {
        // T4 — arm (or re-arm, from lastModified) the completion-delay timer.
        Outcome(s, None, Some(s.lastModified + completionDelayMs))
      } else Outcome(s, None, None)
  }

  /** T7+T8 — build the terminal notification (copy + status + final counts) and
    * latch isFinished so nothing further ever emits (reference Tracker.scala:164-194). */
  private def terminal(s: BatchState, status: String, failureMessage: String): Outcome = {
    val base = s.notification.get
    val out = base.copy(
      status = status,
      // the notification POJO's Int contract (reference) — clamp, never wrap
      actualRecordCount = math.min(s.valid + s.invalid, Int.MaxValue).toInt,
      invalidRecordCount = math.min(s.invalid, Int.MaxValue).toInt,
      failureMessage = if (failureMessage != null) failureMessage else base.failureMessage)
    Outcome(s.copy(isFinished = true), Some(out), None)
  }
}

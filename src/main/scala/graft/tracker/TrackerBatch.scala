package graft.tracker

import graft.model.Status
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Batch (oracle-checkable) twin of the Tracker state machine — SURVEY.md §2.4.
  *
  * The streaming tracker folds events one at a time; over a *finished* input the
  * decision depends only on final counts + latest notification, so the twin is a
  * grouped aggregate plus a decision CASE. Divergences from streaming semantics
  * (documented, deliberate):
  *  - T3 fires on `invalid == threshold` mid-stream; the batch twin sees only final
  *    counts, so it tests `invalid >= threshold`, and the failure message reports the
  *    final invalid count.
  *  - T4/T5's completion *delay* degenerates to an immediate decision.
  *  - The reference checks threshold, then complete, then overflow
  *    (Tracker.scala batchStatusCheck, :112-125). This twin evaluates threshold,
  *    then overflow, then complete — behavior-neutral, because complete
  *    (total == expected) and overflow (total > expected) are mutually exclusive.
  *
  * Scale: `counts` pre-aggregates map-side (partial hash agg) before the shuffle on
  * batchId; the notification side is tiny and broadcast. At 100 TB the shuffle
  * carries one row per (partition × batch), not per record.
  */
object TrackerBatch {

  /** T1 — final per-batch counters from the counts stream (batchId, isValid).
    * Clamped to Int.MaxValue exactly like the streaming twin
    * ([[BatchStateMachine]]'s terminal builder): a bare `.cast("int")` would
    * WRAP a >2^31 count negative (non-ANSI cast), after which overflow/
    * complete/threshold comparisons in [[decide]] can never fire — precisely
    * at the scale this module exists for. */
  def counts(countsStream: DataFrame): DataFrame =
    countsStream.groupBy(col("batchId").as("id"))
      .agg(least(sum(when(col("isValid"), 1L).otherwise(0L)),
          lit(Int.MaxValue.toLong)).cast("int").as("valid"),
        least(sum(when(col("isValid"), 0L).otherwise(1L)),
          lit(Int.MaxValue.toLong)).cast("int").as("invalid"))

  /** T2–T8 — join counters with the latest notification snapshot and decide the
    * terminal status. Batches with no counts (dropped/completed/unknown statuses
    * upstream) keep their status and null counters, mirroring tracker state that
    * never received an element. */
  def decide(countsStream: DataFrame, batches: DataFrame): DataFrame = {
    val c = counts(countsStream)
    val b = batches.select("id", "name", "status", "expectedRecordCount", "invalidThreshold")
    // long arithmetic: two near-Int.MaxValue counters would wrap an int sum
    val total = col("valid").cast("long") + col("invalid")
    val thresholdFail = col("invalidThreshold") > -1 &&
      col("status") =!= Status.Terminated && col("valid").isNotNull &&
      col("invalid") >= col("invalidThreshold")
    val overflowFail = col("status") === Status.SendCompleted &&
      col("valid").isNotNull && total > col("expectedRecordCount")
    val complete = col("status") === Status.SendCompleted &&
      col("valid").isNotNull && total === col("expectedRecordCount")
    b.join(broadcast(c), Seq("id"), "left")
      .select(col("id"), col("name"), col("valid"), col("invalid"),
        col("expectedRecordCount").as("expected_record_count"),
        col("invalidThreshold").as("invalid_threshold"),
        when(thresholdFail, Status.Failed)
          .when(overflowFail, Status.Failed)
          .when(complete, Status.Completed)
          .otherwise(col("status")).as("final_status"),
        when(thresholdFail,
          concat(lit("Failing Batch: "), col("id"),
            lit(", too many invalid records invalidCount: "), col("invalid").cast("string"),
            lit(" == invalidThreshold: "), col("invalidThreshold").cast("string")))
          .when(overflowFail,
            concat(lit("Failing batch: "), col("id"),
              lit(", received too many records, actualRecordCount: "), total.cast("string"),
              lit(" > expectedRecordCount: "), col("expectedRecordCount").cast("string")))
          .as("failure_message"),
        // int output with the twin's clamp (BatchStateMachine.terminal):
        // both counters at the Int.MaxValue ceiling would wrap a bare cast
        when(thresholdFail || overflowFail || complete,
          least(total, lit(Int.MaxValue.toLong)).cast("int"))
          .as("actual_record_count"),
        when(thresholdFail || overflowFail || complete, col("invalid"))
          .as("invalid_record_count"))
  }
}

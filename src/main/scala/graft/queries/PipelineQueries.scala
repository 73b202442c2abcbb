package graft.queries

import graft.fixtures.Dress
import graft.tracker.TrackerBatch
import graft.validation.{JsonValidator, ValidationEngine, Validators}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-expressible queries for the pipeline operators of SURVEY.md §2 (the `q:`
  * ids). Each runs the REAL engine machinery (binary columns, header arrays, Jackson
  * validator UDF, broadcast joins) over the deterministic Dress fixtures; the DuckDB
  * oracle reproduces the *results* arithmetically (graft.oracle.OracleSql).
  */
object PipelineQueries {

  private def validated(spark: SparkSession, dir: String): DataFrame =
    validatedWith(spark, dir, Dress.batches(spark, dir))

  /** [[validated]] over a caller-built batches snapshot: batches collects
    * at construction (see [[Dress.batches]]), so a query that needs it in
    * TWO places (validate's broadcast side and a meta/decide join) must
    * build it once and pass it here — two `Dress.batches` calls would pay
    * the 8-row collect job twice per construction (r20). */
  private def validatedWith(spark: SparkSession, dir: String,
      batches: DataFrame): DataFrame =
    ValidationEngine.validate(
      Dress.records(spark, dir), batches, new JsonValidator)

  /** D1 — identity projection of the record plane (deserializer is a no-op shim). */
  def d1RecordProjection(spark: SparkSession, dir: String): DataFrame =
    Dress.records(spark, dir).select(
      decode(col("key"), "UTF-8").as("rec_key"),
      col("topic"), col("partition"), col("offset"))

  /** D2/D4 — notification JSON round-trip: to_json → from_json → flatten. */
  def d2NotificationParse(spark: SparkSession, dir: String): DataFrame = {
    val n = Dress.notifications(spark, dir)
    val js = n.select(to_json(struct(n.columns.toIndexedSeq.map(col): _*)).as("js"))
    val schema = org.apache.spark.sql.types.StructType(
      graft.model.Schemas.batchNotification.fields.filterNot(f =>
        Seq("actualRecordCount", "invalidRecordCount", "failureMessage", "metadata")
          .contains(f.name)) :+
        org.apache.spark.sql.types.StructField("seq", org.apache.spark.sql.types.IntegerType))
    js.select(from_json(col("js"), schema).as("n"))
      .select(col("n.id").as("id"), col("n.name").as("name"),
        col("n.status").as("status"), col("n.seq").as("seq"),
        col("n.dataType").as("data_type"),
        col("n.expectedRecordCount").as("expected_record_count"),
        col("n.invalidThreshold").as("invalid_threshold"),
        date_format(col("n.startDate"), "yyyy-MM-dd HH:mm:ss").as("start_date"),
        date_format(col("n.endDate"), "yyyy-MM-dd HH:mm:ss").as("end_date"))
  }

  /** D5 — InvalidRecord → JSON bytes (batchId also injected as a Kafka header; here
    * we check the JSON text; null batchId is omitted by to_json like the reference's
    * Jackson NON_NULL-ish rendering). */
  def d5InvalidJson(spark: SparkSession, dir: String): DataFrame =
    ValidationEngine.invalidOutput(validated(spark, dir))
      .filter(col("failure").startsWith("Bad Message"))
      .select(col("offset"), to_json(struct(
        col("failure"), col("topic"), col("partition"), col("offset"),
        col("batchId"))).as("invalid_json"))

  /** U1 — topic validation + derivation over the distinct input topics. */
  def u1TopicDerivation(spark: SparkSession, dir: String): DataFrame =
    Dress.records(spark, dir).select(col("topic").as("in_topic")).distinct()
      .select(col("in_topic"),
        element_at(split(col("in_topic"), "\\."), 2).as("tenant"),
        regexp_replace(col("in_topic"), "\\.in$", ".out").as("out_topic"),
        regexp_replace(col("in_topic"), "\\.in$", ".invalid").as("invalid_topic"),
        regexp_replace(col("in_topic"), "\\.in$", ".notification").as("notification_topic"))

  /** V1 — batchId extraction from the Kafka-style headers array. */
  def v1ExtractBatchId(spark: SparkSession, dir: String): DataFrame =
    Dress.records(spark, dir).select(col("event_id"),
      ValidationEngine.extractBatchId(col("headers")).as("batch_id"))

  /** V2 — latest-per-key compaction of the notification stream (window row_number,
    * the batch twin of broadcast-state upsert). */
  def v2LatestNotification(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Dress.notifications(spark, dir)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("seq").desc)))
      .filter(col("rn") === 1)
      .select(col("id"), col("status").as("latest_status"), col("seq").as("latest_seq"))
  }

  /** V3 — record × batch-snapshot broadcast left lookup join. */
  def v3BatchLookupJoin(spark: SparkSession, dir: String): DataFrame =
    validated(spark, dir).select(col("event_id"), col("batch_id"),
      col("batch_status"))

  private def invalidWith(spark: SparkSession, dir: String, failure: String): DataFrame =
    ValidationEngine.invalidOutput(validated(spark, dir))
      .filter(col("failure") === failure)
      .select(col("failure"), col("topic"), col("partition"), col("offset"),
        col("batchId").as("batch_id"))

  /** V4 — missing batchId header → invalid, no counts. */
  def v4MissingBatchId(spark: SparkSession, dir: String): DataFrame =
    invalidWith(spark, dir, graft.model.ErrorMessages.MissingBatchId)

  /** V5 — unknown batchId (snapshot miss) → invalid, no counts. */
  def v5UnknownBatchId(spark: SparkSession, dir: String): DataFrame =
    invalidWith(spark, dir, graft.model.ErrorMessages.UnknownBatchId)

  /** V6 — records of FAILED/TERMINATED batches are silently dropped. */
  def v6DroppedStatuses(spark: SparkSession, dir: String): DataFrame =
    validated(spark, dir).filter(col("disposition") === ValidationEngine.DispDropped)
      .select(col("event_id"), col("batch_id"), col("batch_status"))

  /** V7 — records landing after COMPLETED → invalid ("already completed"). */
  def v7LateAfterComplete(spark: SparkSession, dir: String): DataFrame =
    invalidWith(spark, dir, graft.model.ErrorMessages.AlreadyCompleted)

  /** V8 — the pluggable validator UDF over every record (JSON well-formedness). */
  def v8JsonValidity(spark: SparkSession, dir: String): DataFrame = {
    val r = Dress.records(spark, dir)
    r.select(col("event_id"),
      Validators.asColumn(new JsonValidator, col("key"), col("value"))
        .getField("isValid").as("is_valid"))
  }

  /** V10 — the full invalid side output; payload failures carry a Jackson exception
    * rendering, normalized here to the exception class for cross-engine checking. */
  def v10InvalidRecords(spark: SparkSession, dir: String): DataFrame =
    ValidationEngine.invalidOutput(validated(spark, dir))
      .select(
        when(col("failure").startsWith("Bad Message"), col("failure"))
          .otherwise(substring_index(col("failure"), ":", 1)).as("failure_class"),
        col("topic"), col("partition"), col("offset"), col("batchId").as("batch_id"))

  // invalidOutput aliases batchId; re-alias for snake_case output
  /** V11 — the counts stream (batchId, isValid) for live batches. */
  def v11CountsStream(spark: SparkSession, dir: String): DataFrame =
    ValidationEngine.countsOutput(validated(spark, dir))
      .select(col("batchId").as("batch_id"), col("isValid").as("is_valid"))

  /** T1 — final per-batch counters. */
  def t1BatchCounts(spark: SparkSession, dir: String): DataFrame =
    TrackerBatch.counts(ValidationEngine.countsOutput(validated(spark, dir)))

  /** T2 — counters joined with latest notification metadata. */
  def t2CountsWithMeta(spark: SparkSession, dir: String): DataFrame =
    {
      val b = Dress.batches(spark, dir)
      TrackerBatch.counts(
        ValidationEngine.countsOutput(validatedWith(spark, dir, b)))
        .join(b, "id")
    }
      .select(col("id"), col("valid"), col("invalid"), col("status"),
        col("expectedRecordCount").as("expected_record_count"))

  /** T2–T8 — the full tracker decision (flagship). */
  def t4CompleteDecision(spark: SparkSession, dir: String): DataFrame = {
    // one collected batches snapshot for both consumers (see validatedWith)
    val b = Dress.batches(spark, dir)
    TrackerBatch.decide(
      ValidationEngine.countsOutput(validatedWith(spark, dir, b)), b)
  }

  /** T3 — threshold-fail slice of the decision. */
  def t3ThresholdFail(spark: SparkSession, dir: String): DataFrame =
    t4CompleteDecision(spark, dir)
      .filter(col("final_status") === "FAILED" && col("invalid_threshold") > -1 &&
        col("invalid") >= col("invalid_threshold"))
      .select(col("id"), col("failure_message"), col("invalid_record_count"))

  /** T6 — overflow-fail slice of the decision. */
  def t6OverflowFail(spark: SparkSession, dir: String): DataFrame =
    t4CompleteDecision(spark, dir)
      .filter(col("final_status") === "FAILED" &&
        (col("invalid_threshold") === -1 || col("invalid") < col("invalid_threshold")))
      .select(col("id"), col("failure_message"), col("actual_record_count"),
        col("expected_record_count"))
}

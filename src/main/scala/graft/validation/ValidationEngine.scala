package graft.validation

import graft.model.{ErrorMessages, Status}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The heart of the engine — V1–V11 of SURVEY.md §2.3, re-expressed as one
  * declarative DataFrame pass.
  *
  * The reference fuses projection + broadcast-state lookup + a multi-way router +
  * a validator UDF inside one Flink `BroadcastProcessFunction`
  * (ValidationProcessFunction.scala:29-234). Spark-first, that decomposes into:
  *
  *   1. header extraction (V1) — higher-order `filter` over the headers array,
  *      first match, UTF-8 decode (codegen'd, no UDF);
  *   2. a '''broadcast left join''' against the compacted batch snapshot (V3) —
  *      batch cardinality is small by design (reference README:28), so the snapshot
  *      broadcasts and the record plane never shuffles;
  *   3. one `disposition` CASE column (V4–V8 router) — single evaluation, then the
  *      three outputs (valid / invalid / counts) are cheap filters, mirroring Flink
  *      side-outputs without re-scans (SURVEY.md §4 "operator fusion");
  *   4. the validator UDF (V8) runs '''only''' on records still live after the
  *      router — short-circuited via CASE ordering, so dropped/invalid-by-routing
  *      records never pay the parse cost.
  *
  * At 100 TB: the only wide operation downstream is the counts aggregation
  * (Tracker), which is pre-aggregated map-side by Spark's partial hash aggregate;
  * everything here is a narrow map over the Kafka/parquet scan with one broadcast.
  */
object ValidationEngine {

  /** V1 — first `batchId` header, UTF-8-decoded; null when headers are null/absent
    * (reference ValidationProcessFunction.scala:226-232). Array semantics (ordered,
    * duplicates legal, FIRST match wins) — deliberately not a map lookup. */
  def extractBatchId(headers: Column): Column =
    decode(get(filter(headers, h => h.getField("key") === "batchId"), lit(0))
      .getField("value"), "UTF-8")

  val DispValid            = "valid"
  val DispInvalidPayload   = "invalid_payload"
  val DispInvalidMissing   = "invalid_missing_batch_id"
  val DispInvalidUnknown   = "invalid_unknown_batch_id"
  val DispInvalidCompleted = "invalid_already_completed"
  val DispDropped          = "dropped"

  /** Run the full validation pass.
    *
    * @param records  data plane in Schemas.hriRecord shape
    * @param batches  compacted latest-per-id notification snapshot (small)
    * @param validator the pluggable V8 SPI
    * @return records + `batch_id`, `batch_status`, `validation` STRUCT, `disposition`
    */
  def validate(records: DataFrame, batches: DataFrame, validator: Validator): DataFrame = {
    val snapshot = broadcast(
      batches.select(col("id").as("batch_id"), col("status").as("batch_status")))
    val withBatch = records
      .withColumn("batch_id", extractBatchId(col("headers")))
      .join(snapshot, Seq("batch_id"), "left")
    val v = Validators.asColumn(validator, col("key"), col("value"))
    withBatch
      .withColumn("validation",
        when(col("batch_status").isin(Status.Started, Status.SendCompleted), v)
          .otherwise(lit(null).cast("struct<isValid:boolean,errMsg:string>")))
      .withColumn("disposition",
        when(col("batch_id").isNull, DispInvalidMissing)
          .when(col("batch_status").isNull, DispInvalidUnknown)
          .when(col("batch_status").isin(Status.Dropped: _*), DispDropped)
          .when(col("batch_status") === Status.Completed, DispInvalidCompleted)
          .when(!col("validation").getField("isValid"), DispInvalidPayload)
          .when(col("validation").getField("isValid"), DispValid)
          // an UNRECOGNIZED status string (new API enum, wrong casing, producer
          // typo — the snapshot ingests external JSON) left `validation` NULL:
          // both isValid branches above miss, and a bare otherwise(valid)
          // would publish the batch's records UNVALIDATED. Route them like an
          // unknown batch instead — never valid-by-fallthrough
          .otherwise(DispInvalidUnknown))
  }

  /** V9 — valid main output: the original record untouched (headers, key, value all
    * pass through byte-for-byte; asserted by reference ValidationJobIntTest:281-295). */
  def validOutput(validated: DataFrame): DataFrame =
    validated.filter(col("disposition") === DispValid)
      .select("key", "value", "headers", "topic", "partition", "offset")

  /** V10 — invalid side output: error pointers to the ORIGINAL record
    * (reference ValidationProcessFunction.scala:140-150 and the three router
    * branches). The failure text per category matches the reference's constants. */
  def invalidOutput(validated: DataFrame): DataFrame =
    validated.filter(col("disposition").startsWith("invalid"))
      .select(
        when(col("disposition") === DispInvalidMissing, ErrorMessages.MissingBatchId)
          .when(col("disposition") === DispInvalidUnknown, ErrorMessages.UnknownBatchId)
          .when(col("disposition") === DispInvalidCompleted, ErrorMessages.AlreadyCompleted)
          .otherwise(col("validation").getField("errMsg")).as("failure"),
        col("topic"), col("partition"), col("offset"), col("batch_id").as("batchId"))

  /** V11 — counts side output: one `{batchId, isValid}` per record whose batch is
    * known and live (reference ValidationProcessFunction.scala:152-158 — counts are
    * emitted for BOTH valid and payload-invalid records, but not for routing
    * failures V4/V5/V7 or drops V6). */
  def countsOutput(validated: DataFrame): DataFrame =
    validated.filter(col("disposition").isin(DispValid, DispInvalidPayload))
      .select(col("batch_id").as("batchId"),
        (col("disposition") === DispValid).as("isValid"))
}

package graft.fixtures

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic dressing of the driver's `events` parquet into the engine's two
  * input planes (FIXTURES.md §6):
  *
  *  - `records(...)`  — HRI data records (Schemas.hriRecord shape): opaque binary
  *    key/value, Kafka-style headers array carrying `batchId`, topic/partition/offset.
  *  - `notifications(...)` — the batch-notification control stream, two versioned
  *    rows per batch (STARTED then the current status) so latest-per-key compaction
  *    (V2) is a real operation.
  *  - `batches(...)` — the compacted (latest) notification snapshot.
  *
  * Every derivation is pure arithmetic on `event_id` so the DuckDB oracle
  * (graft.oracle.OracleSql.prelude) can reproduce the *results* without re-running
  * the engine's binary/header machinery. Any change here MUST be mirrored there.
  *
  * Dressing rules (event_id is a non-negative BIGINT):
  *  - topic       = 'ingest.tenant<event_id%3>.claims.in'
  *  - partition   = event_id % 4, offset = event_id
  *  - batchId header: absent         when event_id % 100 == 0   (V4 missing case)
  *                    'batch-unknown-<event_id%3>' when event_id % 100 == 1 (V5)
  *                    'batch-<event_id%8>' otherwise
  *  - payload     = 'Not-validJSON-<event_id>'          when event_id % 7 == 0
  *                  '{"id":<event_id>,"type":"<event_type>"}' otherwise
  *  - batch statuses by batch number: 0 STARTED, 1 SEND_COMPLETED (counts match →
  *    completes), 2 COMPLETED, 3 FAILED, 4 TERMINATED, 5 STARTED with
  *    invalidThreshold=2 (threshold fail), 6 SEND_COMPLETED with expected=actual-2
  *    (overflow fail), 7 SEND_COMPLETED with expected=actual+5 (stays incomplete).
  */
object Dress {

  val PassThruHeader = "justPassinThru"

  def events(spark: SparkSession, sfDir: String): DataFrame =
    graft.util.Tables.events(spark, sfDir)

  /** Derived batch id as a plain column (null / unknown / known), pre-header. */
  private def batchIdCol = {
    import org.apache.spark.sql.Column
    val id: Column = col("event_id")
    when(id % 100 === 0, lit(null).cast("string"))
      .when(id % 100 === 1, concat(lit("batch-unknown-"), (id % 3).cast("string")))
      .otherwise(concat(lit("batch-"), (id % 8).cast("string")))
  }

  private def payloadCol = {
    val id = col("event_id")
    // JSON-escape the interpolated event_type and NULL-proof it: the payload
    // validity ORACLE is the %7 rule alone, which only holds if the non-%7
    // branch is valid JSON BY CONSTRUCTION. Today's generated event_type
    // values are benign (escaping is the identity), but a regenerated corpus
    // carrying a quote/backslash/null would otherwise silently break the
    // proxy and hash-fail v8/v10/v11/t1-t6/d5 with nothing in-repo to blame
    val safeType = regexp_replace(
      regexp_replace(coalesce(col("event_type"), lit("")), "\\\\", "\\\\\\\\"),
      "\"", "\\\\\"")
    when(id % 7 === 0, concat(lit("Not-validJSON-"), id.cast("string")))
      .otherwise(concat(lit("{\"id\":"), id.cast("string"),
        lit(",\"type\":\""), safeType, lit("\"}")))
  }

  /** HRI record plane. Binary key/value and a real Kafka-shaped headers array —
    * downstream operators must extract batchId from headers (V1), not from a
    * convenience column. */
  def records(spark: SparkSession, sfDir: String): DataFrame = {
    val passThru = struct(lit("passThru").as("key"),
      encode(lit(PassThruHeader), "UTF-8").as("value"))
    val batchHdr = struct(lit("batchId").as("key"),
      encode(batchIdCol, "UTF-8").as("value"))
    events(spark, sfDir).select(
      col("event_id"),
      encode(concat(lit("rec-"), col("event_id").cast("string")), "UTF-8").as("key"),
      encode(payloadCol, "UTF-8").as("value"),
      when(batchIdCol.isNull, array(passThru))
        .otherwise(array(batchHdr, passThru)).as("headers"),
      concat(lit("ingest.tenant"), (col("event_id") % 3).cast("string"),
        lit(".claims.in")).as("topic"),
      (col("event_id") % 4).cast("int").as("partition"),
      col("event_id").as("offset"))
  }

  /** Per-known-batch record/invalid counts (used to size expectedRecordCount so the
    * complete/overflow/incomplete scenarios are data-driven, not hard-coded). */
  private def batchCounts(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .filter(col("event_id") % 100 >= 2)
      .groupBy(concat(lit("batch-"), (col("event_id") % 8).cast("string")).as("id"))
      .agg(count(lit(1)).as("c"))

  /** Latest (compacted) notification snapshot — one row per batch, current
    * status. COLLECTED to a local relation at construction (r20): the
    * 8-row snapshot embeds a real per-batch count aggregate over the
    * events table, and as a lazy frame that subtree was physically
    * instantiated in EVERY consumer — each control-plane query evaluated
    * the scan+dress+count pipeline twice (validate's broadcast side AND
    * the decide/meta join side; Spark plans share no common subtrees).
    * Eight rows is the bounded-driver-artifact envelope (the rm3 weight
    * sheet / centroid pattern); eager-snapshot semantics apply as there. */
  def batches(spark: SparkSession, sfDir: String): DataFrame = {
    val lazyB = batchesLazy(spark, sfDir)
    spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(
        lazyB.collect(): _*)), lazyB.schema)
  }

  private def batchesLazy(spark: SparkSession, sfDir: String): DataFrame = {
    val i = col("i")
    spark.range(8).select(col("id").cast("int").as("i"))
      .select(
        i.as("i"),
        concat(lit("batch-"), i.cast("string")).as("id"),
        concat(lit("batch-name-"), i.cast("string")).as("name"),
        concat(lit("ingest.tenant"), (i % 3).cast("string"), lit(".claims.in")).as("topic"),
        lit("claims").as("dataType"),
        when(i === 0, "STARTED").when(i === 1, "SEND_COMPLETED")
          .when(i === 2, "COMPLETED").when(i === 3, "FAILED")
          .when(i === 4, "TERMINATED").when(i === 5, "STARTED")
          .otherwise("SEND_COMPLETED").as("status"),
        to_timestamp(lit("2020-12-08 03:02:23")).as("startDate"),
        to_timestamp(lit("2020-12-11 16:02:44")).as("endDate"),
        when(i === 5, 2).otherwise(-1).cast("int").as("invalidThreshold"))
      .join(batchCounts(spark, sfDir), "id")
      .withColumn("expectedRecordCount",
        when(i === 6, col("c") - 2).when(i === 7, col("c") + 5)
          .otherwise(col("c")).cast("int"))
      .drop("i", "c")
  }

  /** Versioned notification stream: seq=1 is always the STARTED announcement; seq=2
    * (present unless the batch is still STARTED) carries the current status. Latest-
    * per-key compaction over this stream must reproduce `batches`. */
  def notifications(spark: SparkSession, sfDir: String): DataFrame = {
    val b = batches(spark, sfDir)
    val v1 = b.withColumn("seq", lit(1)).withColumn("status", lit("STARTED"))
    val v2 = b.withColumn("seq", lit(2)).filter(col("status") =!= "STARTED")
    v1.unionByName(v2)
  }
}

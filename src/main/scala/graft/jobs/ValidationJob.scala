package graft.jobs

import graft.http.{BatchLookup, MgmtClient, Retry}
import graft.streaming._
import graft.topics.Topics
import graft.validation.{JsonValidator, Validator}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Job builder — the engine's `BaseValidationJob` twin
  * (reference BaseValidationJob.scala:56-219): derive sibling topics from the
  * input topic, wire sources → validation → sinks → tracker → terminal sink, and
  * start the coordinated streaming queries.
  *
  * Three construction modes, mirroring the reference's three constructors:
  *  - production: Kafka in/out + Mgmt API terminal sink (`:87-104`);
  *  - no-Mgmt-API: Kafka in/out, terminal notifications written straight back to
  *    the `*.notification` topic (`:106-113`, used by the standalone CLI);
  *  - test-injected: caller supplies sources/sinks/lookup (`:128-146`) — this is
  *    what the specs use, with MemoryStream sources and collecting sinks.
  *
  * Operational envelope adopted from the reference (BASELINE.md): 1 s trigger
  * cadence (checkpoint interval `:367`), zstd + bounded batch sizes on the Kafka
  * producers (`:330-347`), 7-day state TTL (in TrackerProcessor), bounded remote
  * lookup instead of a 24 h operator-thread block (SURVEY.md §7.5).
  */
object ValidationJob {

  /** Kafka source options for the record stream (S1) — byte passthrough with
    * headers, exactly the Schemas.hriRecord shape
    * (reference BaseValidationJob.scala:230-236). */
  def kafkaRecordSource(spark: SparkSession, brokers: String, inputTopic: String,
      extra: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", Topics.validate(inputTopic))
      .option("includeHeaders", "true")
      .option("startingOffsets", "earliest")
      .option("kafka.fetch.max.wait.ms", "500")
      .options(extra)
      .load()
      .select(col("key"), col("value"), col("headers"), col("topic"),
        col("partition"), col("offset"))

  /** Kafka source for the notification control stream (S2). The reference forces
    * parallelism 1 + low fetch wait so control outruns data
    * (BaseValidationJob.scala:165-170,79-81); here the snapshot store is
    * driver-side, so single-writer semantics hold regardless. */
  def kafkaNotificationSource(spark: SparkSession, brokers: String,
      inputTopic: String, extra: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", Topics.notificationTopic(inputTopic))
      .option("startingOffsets", "earliest")
      .option("kafka.fetch.max.wait.ms", "150")
      .options(extra)
      .load()

  /** SASL_SSL client properties, built exactly when an Event-Streams-style API
    * key password is provided (reference BaseValidationJob.scala:318-327). The
    * password is JAAS-escaped — a `"` or `\` in an API key must not corrupt the
    * config line (the same corruption class the OAuth form encoding guards).
    * The reference's `auto.offset.reset=latest` has no direct Kafka-option twin
    * in Structured Streaming (the source owns offsets; use `startingOffsets`),
    * so it is intentionally not set here. Shared by consumers AND producers. */
  def kafkaSaslOptions(password: Option[String]): Map[String, String] =
    password.fold(Map.empty[String, String]) { pw =>
      val esc = pw.replace("\\", "\\\\").replace("\"", "\\\"")
      Map(
        "kafka.sasl.jaas.config" ->
          ("org.apache.kafka.common.security.plain.PlainLoginModule required " +
            s"""username="token" password="$esc";"""),
        "kafka.security.protocol" -> "SASL_SSL",
        "kafka.sasl.mechanism" -> "PLAIN",
        "kafka.ssl.protocol" -> "TLSv1.2",
        "kafka.ssl.enabled.protocols" -> "TLSv1.2",
        "kafka.ssl.endpoint.identification.algorithm" -> "HTTPS")
    }

  /** Consumer group id per SOURCE role. The record source carries the
    * reference's exact `hri-validation-<in>-<out>` id
    * (BaseValidationJob.scala:330); the other sources suffix their role —
    * concurrent Spark queries must never share one group id (partition
    * assignment would split a topic between them under group-based offset
    * fetching), and a consumer-only property has no business on a producer. */
  def kafkaGroupId(inputTopic: String, role: String = "records"): Map[String, String] = {
    val base = s"hri-validation-$inputTopic-${Topics.outputTopic(inputTopic)}"
    Map("kafka.group.id" -> (if (role == "records") base else s"$base-$role"))
  }

  /** Kafka producer options shared by all sinks — zstd, 16 KB batches, 10 MB max
    * request, 15 min transaction timeout (reference BaseValidationJob.scala:330-347;
    * the 1 MB Event Streams message cap is the why). SS's Kafka sink is
    * at-least-once; exactly-once-equivalence comes from T8 + the 409-tolerant
    * API sink + offset-keyed dedup downstream (SURVEY.md §7.6). */
  val kafkaProducerOptions: Map[String, String] = Map(
    "kafka.compression.type" -> "zstd",
    "kafka.batch.size" -> "16384",
    "kafka.max.request.size" -> "10485760",
    "kafka.transaction.timeout.ms" -> "900000")

  /** Kafka-writing ValidationSinks (K1 valid → `*.out`, K2 invalid → `*.invalid`;
    * counts stay in-job, handed to the tracker via [[countsHandoff]]). */
  def kafkaSinks(brokers: String, inputTopic: String,
      countsHandoff: (DataFrame, Long) => Unit,
      extra: Map[String, String] = Map.empty): ValidationSinks = new ValidationSinks {
    private def write(df: DataFrame, topic: String): Unit =
      df.write.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .options(kafkaProducerOptions ++ extra)
        .save()
    def valid(df: DataFrame, epochId: Long): Unit =
      write(validRecordProjection(df), Topics.outputTopic(inputTopic))
    def invalid(df: DataFrame, epochId: Long): Unit =
      write(invalidRecordProjection(df), Topics.invalidTopic(inputTopic))
    def counts(df: DataFrame, epochId: Long): Unit = countsHandoff(df, epochId)
  }

  /** K1/K2 with EXACTLY-ONCE delivery — SURVEY §7.6 option (c), the twin of
    * the reference's `Semantic.EXACTLY_ONCE` FlinkKafkaProducer
    * (BaseValidationJob.scala:252-268): every record epoch is published
    * through [[TransactionalEpochSink]] — per-(epoch, partition)
    * transactions under stable `transactional.id`s, a commit marker in the
    * same transaction, replayed epochs skipping already-committed partitions
    * — so a read-committed consumer of `*.out` / `*.invalid` sees each
    * record exactly once across any number of foreachBatch replays. Counts
    * stay on the idempotent journal handoff (option b), which already has
    * that guarantee in-job.
    *
    * `factory` defaults to the real broker binding; specs inject
    * [[InMemoryTxnFactory]]. The marker topic is a derived sibling
    * (`<base>.txn-markers`) — an EXTENSION, not a reference topic: the
    * reference keeps transaction state broker-side via Flink's checkpoint
    * 2PC, which Spark does not expose, so the marker topic is where this
    * engine parks the same commit bookkeeping. Size it by `retention.ms`
    * (see [[TransactionalEpochSink]]). */
  def transactionalKafkaSinks(brokers: String, inputTopic: String,
      countsHandoff: (DataFrame, Long) => Unit,
      extra: Map[String, String] = Map.empty,
      factory: Option[TxnProducerFactory] = None): ValidationSinks = new ValidationSinks {
    private val f = factory.getOrElse(
      KafkaTxnProducerFactory(brokers, kafkaProducerOptions ++ extra))
    private val markers = Topics.outputTopic(inputTopic)
      .stripSuffix(".out") + ".txn-markers"
    // the FULL input topic scopes the transactional.id namespace — two jobs
    // on different topics of one tenant must never fence each other
    private val txnBase = s"hri-validation-$inputTopic"
    def valid(df: DataFrame, epochId: Long): Unit =
      TransactionalEpochSink.write(validRecordProjection(df),
        Topics.outputTopic(inputTopic), markers, s"$txnBase-out", epochId, f)
    def invalid(df: DataFrame, epochId: Long): Unit =
      TransactionalEpochSink.write(invalidRecordProjection(df),
        Topics.invalidTopic(inputTopic), markers, s"$txnBase-invalid", epochId, f)
    def counts(df: DataFrame, epochId: Long): Unit = countsHandoff(df, epochId)
  }

  /** D3 — valid-record Kafka projection: key/value/headers byte passthrough
    * (reference HriRecordSerializer.scala:21-44 — null key, null value, null or
    * empty headers, and any UTF-8 payload must all round-trip untouched). */
  def validRecordProjection(df: DataFrame): DataFrame =
    df.select(col("key"), col("value"), col("headers"))

  /** D5 — invalid-record Kafka projection: JSON body + batchId echoed as a
    * message header, null key (reference InvalidRecordSerializer.scala:21-44);
    * a null batchId yields null headers, and the JSON body is UTF-8 so non-ASCII
    * failure text survives byte-exact. */
  def invalidRecordProjection(df: DataFrame): DataFrame =
    df.select(
      lit(null).cast("binary").as("key"),
      encode(to_json(struct(df.columns.toIndexedSeq.map(col): _*)), "UTF-8").as("value"),
      when(col("batchId").isNotNull,
        array(struct(lit("batchId").as("key"),
          encode(col("batchId"), "UTF-8").as("value"))))
        .as("headers"))

  /** Idempotent counts handoff: pre-aggregate the epoch's per-record counts to
    * one `(batchId, validDelta, invalidDelta)` row per batch, and journal them to
    * a DETERMINISTIC single file `epoch-<id>.parquet`. `foreachBatch` is
    * at-least-once — a replayed epoch sees its file already present and skips, so
    * counts are never double-applied (the reference gets the same guarantee from
    * Flink's exactly-once checkpointed shuffle, BaseValidationJob.scala:367-370).
    * Pre-aggregation also shrinks the handoff from record volume to live-batch
    * cardinality — at 100 TB the journal stays KB-sized per epoch. */
  private[jobs] def countsHandoff(countsDir: String)(df: DataFrame, epochId: Long): Unit = {
    val target = new org.apache.hadoop.fs.Path(countsDir, f"epoch-$epochId%020d.parquet")
    val fs = target.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(target)) return // replayed epoch — already journaled
    val agg = df.groupBy(col("batchId")).agg(
      sum(when(col("isValid"), 1L).otherwise(0L)).as("validDelta"),
      sum(when(col("isValid"), 0L).otherwise(1L)).as("invalidDelta"))
    // single part file so the write+rename is one atomic visibility event for the
    // tailing file source (dot-prefixed temp dirs are invisible to it)
    val tmp = new org.apache.hadoop.fs.Path(countsDir, s".tmp-epoch-$epochId")
    agg.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val parts = fs.globStatus(new org.apache.hadoop.fs.Path(tmp, "part-*"))
    if (parts.nonEmpty) fs.rename(parts.head.getPath, target)
    fs.delete(tmp, true)
  }

  /** Everything a running job exposes. */
  case class Running(
      recordQuery: StreamingQuery,
      notificationQuery: StreamingQuery,
      trackerQuery: Option[StreamingQuery],
      snapshot: NotificationSnapshot)

  /** Test/embedded entry point with injected sources and sinks (the reference's
    * e2e constructor, BaseValidationJob.scala:128-146). `records` must be a
    * streaming DataFrame in Schemas.hriRecord shape; `notifications` a streaming
    * DataFrame with a `value` column of notification JSON. */
  def start(
      spark: SparkSession,
      records: DataFrame,
      notifications: DataFrame,
      validator: Validator,
      sinks: ValidationSinks,
      checkpointDir: String,
      lookup: Option[BatchLookup] = None,
      lookupRetry: Retry = new Retry(initialBackoffMs = 100, giveUpAfterMs = 2000)): Running = {
    val store = new NotificationSnapshot(spark, Some(checkpointDir))
    val nq = ValidationStream.startNotificationQuery(notifications, store, checkpointDir)
    val rq = ValidationStream.startRecordQuery(
      records, store, validator, sinks, checkpointDir, lookup, lookupRetry)
    Running(rq, nq, None, store)
  }

  /** Production entry point: Kafka sources/sinks, tracker fed through an
    * intra-job counts handoff, terminal notifications to the Mgmt API (or back to
    * the notification topic when `mgmtClient` is None — the reference's
    * `useMgmtApi=false` mode, BaseValidationJob.scala:273-286). */
  def startKafka(
      spark: SparkSession,
      brokers: String,
      inputTopic: String,
      validator: Validator,
      checkpointDir: String,
      completionDelayMs: Long = 300000L,
      mgmtClient: Option[MgmtClient] = None,
      kafkaPassword: Option[String] = None,
      exactlyOnce: Boolean = false): Running = {
    import spark.implicits._
    Topics.validate(inputTopic)
    val sasl = kafkaSaslOptions(kafkaPassword)
    // the RocksDB provider transformWithState needs is set on the CONTROL
    // PLANE child session (TrackerProcessor.controlPlaneSession) — the only
    // session running a stateful query. Setting it here too would mutate
    // the caller's session for their own later stateful queries.
    val store = new NotificationSnapshot(spark, Some(checkpointDir))
    val countsDir = s"$checkpointDir/counts"

    val nq = ValidationStream.startNotificationQuery(
      kafkaNotificationSource(spark, brokers, inputTopic,
        sasl ++ kafkaGroupId(inputTopic, "notifications")), store, checkpointDir)

    // counts handoff: epoch-keyed parquet files feed the tracker query's file
    // source — the in-job stand-in for the reference's operator-to-operator
    // shuffle, made idempotent against foreachBatch's at-least-once replays.
    // exactlyOnce upgrades the DATA topics from at-least-once to
    // transactional per-epoch publishes (§7.6 option c) — consumers must
    // then read `isolation.level=read_committed`
    val sinks =
      if (exactlyOnce)
        transactionalKafkaSinks(brokers, inputTopic, countsHandoff(countsDir), sasl)
      else kafkaSinks(brokers, inputTopic, countsHandoff(countsDir), sasl)
    val rq = ValidationStream.startRecordQuery(
      kafkaRecordSource(spark, brokers, inputTopic,
        sasl ++ kafkaGroupId(inputTopic, "records")), store, validator, sinks,
      checkpointDir, mgmtClient)

    // the tracker is CONTROL-plane: build its sources and query on a child
    // session sized to TrackerProcessor.ControlPlaneShufflePartitions — at the
    // data plane's shuffle width, every ProcessingTime tick commits that many
    // RocksDB stores and measurably drains the record query (see
    // TrackerProcessor.controlPlaneSession)
    val trackerSession = TrackerProcessor.controlPlaneSession(spark)
    val countEvents = trackerSession.readStream
      .schema("batchId STRING, validDelta BIGINT, invalidDelta BIGINT")
      // only the deterministic per-epoch delta files — a countsDir left over
      // from the pre-delta layout (part-*.parquet, per-record schema) must not
      // be parsed as deltas
      .option("pathGlobFilter", "epoch-*.parquet")
      .parquet(countsDir)
      .as[graft.model.CountsDelta]
    val notifEvents = kafkaNotificationSource(trackerSession, brokers, inputTopic,
        sasl ++ kafkaGroupId(inputTopic, "tracker"))
      .select(from_json(col("value").cast("string"),
        graft.model.Schemas.batchNotification).as("n"))
      .select(col("n.*"))
      // poison-message guard, the startNotificationQuery twin: malformed JSON
      // (null struct/id) or an absent Int field would otherwise NPE the
      // non-nullable encoder fields and crash-loop the tracker query from the
      // checkpoint. Absent counts default -1, matching
      // MgmtClient.parseNotification's open-world convention
      .filter(col("id").isNotNull)
      .na.fill(-1L, Seq("expectedRecordCount", "actualRecordCount",
        "invalidRecordCount", "invalidThreshold"))
      .as[graft.model.BatchNotification]
    val terminal = TrackerProcessor.track(
      TrackerProcessor.unionEvents(countEvents, notifEvents), completionDelayMs)

    val tq = mgmtClient match {
      case Some(client) =>
        val apiSink = new MgmtApiSink(client)
        terminal.writeStream
          .queryName("graft-tracker")
          .option("checkpointLocation", s"$checkpointDir/graft-tracker")
          .trigger(Trigger.ProcessingTime("1 second"))
          .foreachBatch(apiSink.writeBatch _)
          .start()
      case None =>
        terminal
          .select(lit(null).cast("binary").as("key"),
            encode(to_json(struct(col("*"))), "UTF-8").as("value"))
          .writeStream
          .queryName("graft-tracker")
          .option("checkpointLocation", s"$checkpointDir/graft-tracker")
          .trigger(Trigger.ProcessingTime("1 second"))
          .format("kafka")
          .option("kafka.bootstrap.servers", brokers)
          .option("topic", Topics.notificationTopic(inputTopic))
          .options(kafkaProducerOptions ++ sasl)
          .start()
    }
    Running(rq, nq, Some(tq), store)
  }

  /** `-x` parsing, extracted for its spec: a DELIVERY-SEMANTICS switch must
    * fail loudly on malformed usage — a bare `-x` (no value, or another flag
    * where the value belongs) silently falling back to at-least-once while
    * the operator believes the transactional path is active is exactly the
    * duplicate-delivery class the flag exists to eliminate. */
  private[jobs] def parseExactlyOnceFlag(args: Array[String]): Boolean =
    if (!args.contains("-x")) false
    else {
      val v = args.dropWhile(_ != "-x").drop(1).headOption
        .filterNot(_.startsWith("-"))
        .getOrElse(throw new IllegalArgumentException(
          "-x requires an explicit true/false value"))
      v.toBooleanOption.getOrElse(throw new IllegalArgumentException(
        s"-x requires true or false, got '$v'"))
    }

  /** Standalone CLI (the reference's JsonValidationJob.main,
    * jobtest/JsonValidationJob.scala:25-73): `-b` brokers, `-i` input topic,
    * `-d` completion delay ms, `-c` checkpoint dir, `-p` Kafka API-key password
    * (enables SASL_SSL, like the reference's `--password`); JSON well-formedness
    * validation, terminal notifications to the notification topic. `-x true`
    * selects the exactly-once transactional data sinks (§7.6 option c). */
  def main(args: Array[String]): Unit = {
    def arg(flag: String, default: String = null): String =
      args.sliding(2).collectFirst { case Array(`flag`, v) => v }
        .getOrElse(Option(default).getOrElse(
          throw new IllegalArgumentException(s"missing required arg $flag")))
    val brokers = arg("-b")
    // fail-fast on a bad topic BEFORE building a session, like the reference's
    // constructor-time validation (BaseValidationJob.scala:56-75)
    val inputTopic = Topics.validate(arg("-i"))
    val delay = arg("-d", "300000").toLong
    val checkpoint = arg("-c", "/tmp/graft-checkpoint")
    val password = Option(arg("-p", "")).filter(_.nonEmpty)
    val exactlyOnce = parseExactlyOnceFlag(args)
    val spark = SparkSession.builder()
      .appName(s"graft-validation-$inputTopic")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val running = startKafka(spark, brokers, inputTopic, new JsonValidator,
      checkpoint, delay, kafkaPassword = password, exactlyOnce = exactlyOnce)
    running.recordQuery.awaitTermination()
  }
}

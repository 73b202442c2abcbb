package graft.streaming

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col

/** One open Kafka-style transaction bound to a single `transactional.id`.
  * Obtained from [[TxnProducerFactory.open]], which performs the fencing
  * handshake; the handle then lives for exactly one begin → sends →
  * commit-or-abort cycle.
  */
trait TxnProducer extends AutoCloseable {
  def begin(): Unit
  def send(topic: String, key: Array[Byte], value: Array[Byte],
      headers: Seq[(String, Array[Byte])]): Unit
  /** Atomically publish every send since [[begin]] — after this returns, a
    * read-committed consumer sees all of them; before it, none. */
  def commit(): Unit
  def abort(): Unit
}

/** Broker binding for [[TransactionalEpochSink]]. Implementations:
  * [[KafkaTxnProducerFactory]] (real Kafka via the deployment's
  * kafka-clients jar) and [[InMemoryTxnFactory]] (in-process reference
  * implementation with the same semantics, used by the specs — the
  * MemoryStream/K5 pattern applied to the transactional plane). */
trait TxnProducerFactory extends Serializable {
  /** Open the producer for `transactionalId`, running the FENCING handshake
    * (Kafka `initTransactions()`): any in-flight transaction a crashed or
    * zombie attempt left under the same id is aborted, and that older
    * attempt's handle can never commit afterwards. This is what makes a
    * task-retry race safe: whichever attempt opened LAST owns the id. */
  def open(transactionalId: String): TxnProducer

  /** Driver-side read-committed scan of `markerTopic`: the set of task
    * partition ids whose `(txnIdBase, epochId)` commit marker is visible —
    * i.e. whose transaction COMMITTED in a previous attempt of this epoch. */
  def committedPartitions(markerTopic: String, txnIdBase: String,
      epochId: Long): Set[Int]
}

/** Exactly-once Kafka DATA sink — SURVEY §7.6 option (c), the equivalent of
  * the reference's transactional producer bound to checkpoints
  * (reference BaseValidationJob.scala:252-268, `Semantic.EXACTLY_ONCE`
  * FlinkKafkaProducer: per-subtask transactions committed on checkpoint
  * completion).
  *
  * Spark's `foreachBatch` re-delivers an epoch after a failure, so the sink
  * must make replay invisible to consumers. Scheme, per (epoch, task
  * partition):
  *
  *  1. `transactional.id = <txnIdBase>-<epochId>-<partitionId>` — stable
  *     across replays, so opening it FENCES the crashed attempt (its
  *     in-flight transaction aborts, its zombie handle can never commit).
  *  2. All of the partition's rows AND a commit-marker record (to
  *     `markerTopic`, keyed `<txnIdBase>/<epochId>/<partitionId>`) are sent
  *     in ONE transaction. Marker and data commit atomically — there is no
  *     window where data is committed but the marker is missing.
  *  3. On entry, the driver scans `markerTopic` read-committed: partitions
  *     whose marker is already visible COMMITTED in a previous attempt and
  *     are skipped entirely. Partitions whose transaction aborted (no
  *     marker) rewrite under the same id.
  *
  * Net effect: every row is visible to a read-committed consumer exactly
  * once, no matter how many times the epoch replays. (Epoch-keyed
  * transactional ids ALONE do not give this — a replay after a successful
  * commit would rewrite and re-commit; the in-transaction marker is what
  * closes that window.)
  *
  * Determinism assumption (same as the reference's checkpoint replay): a
  * replayed epoch re-reads the same source offset range and plans the same
  * partitioning, so partition ids line up across attempts. This holds for
  * Structured Streaming's Kafka/file sources, whose batches are pinned by
  * the offset log.
  *
  * Marker-topic sizing: one tiny record per (sink, epoch, partition). Keys
  * are unique, so compaction cannot reclaim them — bound the topic with
  * `retention.ms` instead, set comfortably above the longest conceivable
  * replay horizon (the job's own state TTL, 7 d, is a natural ceiling).
  * The per-epoch driver scan is then bounded by
  * partitions × epochs-in-retention, KB-scale traffic against the brokers.
  *
  * The COUNTS side output deliberately stays on the journal handoff
  * (§7.6 option b, `ValidationJob.countsHandoff`): it feeds the in-job
  * tracker, not an external consumer, and the deterministic epoch file is
  * already exactly-once there.
  */
object TransactionalEpochSink {

  def transactionalId(txnIdBase: String, epochId: Long, partitionId: Int): String =
    s"$txnIdBase-$epochId-$partitionId"

  /** Marker-record key. `/`-separated (the txn-id itself uses `-`) so the
    * scan side can parse the partition id back out unambiguously — topic
    * names may contain `-` but never `/`. */
  def markerKey(txnIdBase: String, epochId: Long, partitionId: Int): String =
    s"$txnIdBase/$epochId/$partitionId"

  /** Parse a marker key back to its partition id, or None if it belongs to a
    * different (base, epoch). */
  def parseMarker(key: String, txnIdBase: String, epochId: Long): Option[Int] = {
    val prefix = s"$txnIdBase/$epochId/"
    if (key != null && key.startsWith(prefix))
      key.substring(prefix.length).toIntOption
    else None
  }

  /** Publish one epoch of `df` (Kafka sink shape: `key` binary, `value`
    * binary, `headers` array<struct<key string, value binary>> — nulls
    * allowed everywhere) to `topic`, exactly once per the scheme above.
    * Call from `foreachBatch` with the epoch id Spark hands over. */
  def write(df: DataFrame, topic: String, markerTopic: String,
      txnIdBase: String, epochId: Long, factory: TxnProducerFactory): Unit = {
    val done = factory.committedPartitions(markerTopic, txnIdBase, epochId)
    df.select(col("key"), col("value"), col("headers"))
      .foreachPartition { (it: Iterator[Row]) =>
        // an empty partition publishes nothing, so replaying it is already
        // idempotent — skip the producer round-trip AND the marker
        if (it.hasNext) {
          val pid = TaskContext.get().partitionId()
          if (!done.contains(pid)) {
            val p = factory.open(transactionalId(txnIdBase, epochId, pid))
            var committed = false
            try {
              p.begin()
              it.foreach { r =>
                val headers: Seq[(String, Array[Byte])] =
                  if (r.isNullAt(2)) Nil
                  else r.getSeq[Row](2).map(h =>
                    (h.getString(0), h.getAs[Array[Byte]](1)))
                p.send(topic, r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1),
                  headers)
              }
              p.send(markerTopic,
                markerKey(txnIdBase, epochId, pid)
                  .getBytes(java.nio.charset.StandardCharsets.UTF_8),
                Array.emptyByteArray, Nil)
              p.commit()
              committed = true
            } finally {
              if (!committed) {
                // surface the ORIGINAL failure, not a secondary abort error
                // (an already-fenced handle aborts with an exception too)
                try p.abort() catch { case _: Throwable => () }
              }
              try p.close() catch { case _: Throwable => () }
            }
          }
        }
      }
  }
}

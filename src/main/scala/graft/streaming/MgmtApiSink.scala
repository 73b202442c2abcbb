package graft.streaming

import graft.http.{MgmtClient, RequestException, Retry}
import graft.model.{BatchNotification, Status}

/** K4 — terminal-notification sink against the batch-management REST API
  * (reference MgmtApiSink.scala:43-92):
  *
  *  - COMPLETED → `PUT …/action/processingComplete {actualRecordCount,
  *    invalidRecordCount}`;
  *  - FAILED → `PUT …/action/fail {…, failureMessage}`;
  *  - any other status → error (the Tracker only ever emits terminal statuses);
  *  - 409 Conflict → warn + continue (the batch already reached a terminal state —
  *    idempotent replay tolerance, :66-71);
  *  - other 4xx → fail the query (client bug, fail-fast);
  *  - 5xx/transport → exponential-backoff retry, 1 s → 5 min, ≤ 24 h (:25-27).
  *
  * Used as a `foreachBatch` side-effect on the Tracker output — the stream is tiny
  * (one row per finished batch), so driver-side sequential PUTs are the right
  * shape; idempotence comes from T8's at-most-one-terminal guarantee plus the 409
  * tolerance here, which together make at-least-once sink replays safe
  * (SURVEY.md §7.6).
  */
class MgmtApiSink(client: MgmtClient, retry: Retry = new Retry()) extends Serializable {

  // transient: log4j Loggers are not serializable, and the class advertises
  // Serializable (foreachBatch closures may capture it); re-acquired lazily
  // after deserialization
  @transient private lazy val log = org.apache.log4j.Logger.getLogger(getClass)

  def send(n: BatchNotification): Unit = {
    // the topic string arrives from externally-supplied notification JSON: a
    // malformed one (no derivable tenant) has nowhere to PUT, and throwing
    // here would crash-loop the query — foreachBatch replays the same poison
    // row on every restart. Log loudly and skip it instead; the non-terminal
    // status case below stays fail-fast (that one is a CALLER bug)
    val tenant =
      try graft.topics.Topics.tenantId(n.topic)
      catch {
        case e: graft.topics.TopicNamingException =>
          log.error(s"batch ${n.id}: cannot derive tenant from topic " +
            s"'${n.topic}' — skipping terminal PUT: ${e.getMessage}")
          return
      }
    // status dispatch OUTSIDE the retry loop: a non-terminal status is a caller
    // bug (fail fast, reference MgmtApiSink.scala:53-55), never a retryable fault
    val call: () => Unit = n.status match {
      case Status.Completed => () =>
        client.processingComplete(tenant, n.id, n.actualRecordCount, n.invalidRecordCount)
      case Status.Failed => () =>
        client.fail(tenant, n.id, n.actualRecordCount, n.invalidRecordCount, n.failureMessage)
      case other =>
        throw new IllegalArgumentException(
          s"MgmtApiSink received non-terminal status $other for batch ${n.id}")
    }
    try retry.run(call())
    catch {
      case RequestException(409, body) =>
        log.warn(s"batch ${n.id} already terminal at the API (409): $body")
    }
  }

  /** foreachBatch adapter for `Dataset[BatchNotification]`. */
  def writeBatch(ds: org.apache.spark.sql.Dataset[BatchNotification], epochId: Long): Unit =
    ds.collect().foreach(send)
}

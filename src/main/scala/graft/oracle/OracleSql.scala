package graft.oracle

/** DuckDB-dialect oracle SQL for every SQL-expressible query in SparkEntry.
  *
  * The `prelude` CTE block reproduces graft.fixtures.Dress arithmetically (no
  * binary/header machinery — just the event_id rules documented there) plus the
  * validation disposition (ValidationEngine) and tracker decision (TrackerBatch)
  * semantics. ANY change to Dress/ValidationEngine/TrackerBatch must be mirrored
  * here. The lockstep is enforced by the driver's DuckDB compare (and can be
  * replayed locally via `graft.Verify` + `scripts/compare.py`); there is no
  * in-repo ScalaTest guard for it, since DuckDB is not on the JVM classpath.
  */
object OracleSql {

  val prelude: String = """WITH rec AS (
  SELECT event_id,
    'rec-' || CAST(event_id AS VARCHAR) AS rec_key,
    'ingest.tenant' || CAST(event_id % 3 AS VARCHAR) || '.claims.in' AS topic,
    CAST(event_id % 4 AS INTEGER) AS part_no,
    event_id AS rec_offset,
    CASE WHEN event_id % 100 = 0 THEN NULL
         WHEN event_id % 100 = 1 THEN 'batch-unknown-' || CAST(event_id % 3 AS VARCHAR)
         ELSE 'batch-' || CAST(event_id % 8 AS VARCHAR) END AS batch_id,
    (event_id % 7 <> 0) AS is_valid,
    CASE WHEN event_id % 7 = 0 THEN 'Not-validJSON-' || CAST(event_id AS VARCHAR)
         ELSE '{"id":' || CAST(event_id AS VARCHAR) || ',"type":"' || event_type || '"}' END AS payload
  FROM events),
bcnt AS (
  SELECT 'batch-' || CAST(event_id % 8 AS VARCHAR) AS id, COUNT(*) AS c
  FROM events WHERE event_id % 100 >= 2 GROUP BY 1),
bats AS (
  SELECT 'batch-' || CAST(i AS VARCHAR) AS id,
         'batch-name-' || CAST(i AS VARCHAR) AS name,
         'ingest.tenant' || CAST(i % 3 AS VARCHAR) || '.claims.in' AS topic,
         'claims' AS data_type,
         CASE WHEN i = 0 THEN 'STARTED' WHEN i = 1 THEN 'SEND_COMPLETED'
              WHEN i = 2 THEN 'COMPLETED' WHEN i = 3 THEN 'FAILED'
              WHEN i = 4 THEN 'TERMINATED' WHEN i = 5 THEN 'STARTED'
              ELSE 'SEND_COMPLETED' END AS status,
         TIMESTAMP '2020-12-08 03:02:23' AS start_date,
         TIMESTAMP '2020-12-11 16:02:44' AS end_date,
         CAST(CASE WHEN i = 6 THEN c - 2 WHEN i = 7 THEN c + 5 ELSE c END AS INTEGER) AS expected_record_count,
         CAST(CASE WHEN i = 5 THEN 2 ELSE -1 END AS INTEGER) AS invalid_threshold
  FROM range(8) t(i) JOIN bcnt ON bcnt.id = 'batch-' || CAST(i AS VARCHAR)),
notifs AS (
  SELECT id, name, topic, data_type, 'STARTED' AS status, start_date, end_date,
         expected_record_count, invalid_threshold, 1 AS seq FROM bats
  UNION ALL
  SELECT id, name, topic, data_type, status, start_date, end_date,
         expected_record_count, invalid_threshold, 2 AS seq FROM bats WHERE status <> 'STARTED'),
disp AS (
  SELECT r.*, b.status AS batch_status,
    CASE WHEN r.batch_id IS NULL THEN 'invalid_missing_batch_id'
         WHEN b.id IS NULL THEN 'invalid_unknown_batch_id'
         WHEN b.status IN ('FAILED','TERMINATED') THEN 'dropped'
         WHEN b.status = 'COMPLETED' THEN 'invalid_already_completed'
         WHEN b.status IN ('STARTED','SEND_COMPLETED') AND NOT r.is_valid
           THEN 'invalid_payload'
         WHEN b.status IN ('STARTED','SEND_COMPLETED') AND r.is_valid
           THEN 'valid'
         -- unrecognized status: never valid-by-fallthrough (engine twin)
         ELSE 'invalid_unknown_batch_id' END AS disposition
  FROM rec r LEFT JOIN bats b ON r.batch_id = b.id),
cnts AS (
  SELECT batch_id AS id,
         CAST(LEAST(SUM(CASE WHEN is_valid THEN 1 ELSE 0 END), 2147483647) AS INTEGER) AS valid,
         CAST(LEAST(SUM(CASE WHEN is_valid THEN 0 ELSE 1 END), 2147483647) AS INTEGER) AS invalid
  FROM disp WHERE disposition IN ('valid','invalid_payload') GROUP BY 1),
decis AS (
  SELECT b.id, b.name, c.valid, c.invalid, b.expected_record_count, b.invalid_threshold,
    CASE WHEN b.invalid_threshold > -1 AND b.status <> 'TERMINATED' AND c.valid IS NOT NULL
              AND c.invalid >= b.invalid_threshold THEN 'FAILED'
         WHEN b.status = 'SEND_COMPLETED' AND c.valid IS NOT NULL
              AND c.valid + c.invalid > b.expected_record_count THEN 'FAILED'
         WHEN b.status = 'SEND_COMPLETED' AND c.valid IS NOT NULL
              AND c.valid + c.invalid = b.expected_record_count THEN 'COMPLETED'
         ELSE b.status END AS final_status,
    CASE WHEN b.invalid_threshold > -1 AND b.status <> 'TERMINATED' AND c.valid IS NOT NULL
              AND c.invalid >= b.invalid_threshold
           THEN 'Failing Batch: ' || b.id || ', too many invalid records invalidCount: '
                || CAST(c.invalid AS VARCHAR) || ' == invalidThreshold: ' || CAST(b.invalid_threshold AS VARCHAR)
         WHEN b.status = 'SEND_COMPLETED' AND c.valid IS NOT NULL
              AND c.valid + c.invalid > b.expected_record_count
           THEN 'Failing batch: ' || b.id || ', received too many records, actualRecordCount: '
                || CAST(c.valid + c.invalid AS VARCHAR) || ' > expectedRecordCount: ' || CAST(b.expected_record_count AS VARCHAR)
         ELSE NULL END AS failure_message,
    CASE WHEN (b.invalid_threshold > -1 AND b.status <> 'TERMINATED' AND c.valid IS NOT NULL
               AND c.invalid >= b.invalid_threshold)
           OR (b.status = 'SEND_COMPLETED' AND c.valid IS NOT NULL
               AND c.valid + c.invalid >= b.expected_record_count)
           THEN CAST(LEAST(CAST(c.valid AS BIGINT) + c.invalid, 2147483647)
                     AS INTEGER) ELSE NULL END AS actual_record_count,
    CASE WHEN (b.invalid_threshold > -1 AND b.status <> 'TERMINATED' AND c.valid IS NOT NULL
               AND c.invalid >= b.invalid_threshold)
           OR (b.status = 'SEND_COMPLETED' AND c.valid IS NOT NULL
               AND c.valid + c.invalid >= b.expected_record_count)
           THEN c.invalid ELSE NULL END AS invalid_record_count
  FROM bats b LEFT JOIN cnts c ON b.id = c.id)
"""

  /** Oracle for each SparkEntry query key; keys absent here get the driver's weaker
    * rows-only check (non-SQL-expressible ops: sketches, streaming-only behavior). */
  val sql: Map[String, String] = Map(
    "d1_record_projection" -> (prelude +
      """SELECT rec_key, topic, part_no AS "partition", rec_offset AS "offset" FROM rec"""),

    "d2_notification_parse" -> (prelude +
      """SELECT id, name, status, seq, data_type, expected_record_count, invalid_threshold,
         strftime(start_date, '%Y-%m-%d %H:%M:%S') AS start_date,
         strftime(end_date, '%Y-%m-%d %H:%M:%S') AS end_date
       FROM notifs"""),

    "d5_invalid_json" -> (prelude +
      """SELECT rec_offset AS "offset",
         CASE WHEN batch_id IS NULL THEN
           '{"failure":"Bad Message - No header or batchId node","topic":"' || topic ||
           '","partition":' || CAST(part_no AS VARCHAR) || ',"offset":' || CAST(rec_offset AS VARCHAR) || '}'
         ELSE
           '{"failure":"' ||
           CASE disposition WHEN 'invalid_unknown_batch_id' THEN 'Bad Message - Unknown batchId'
                            ELSE 'Bad Message - batchId is already completed' END ||
           '","topic":"' || topic || '","partition":' || CAST(part_no AS VARCHAR) ||
           ',"offset":' || CAST(rec_offset AS VARCHAR) || ',"batchId":"' || batch_id || '"}'
         END AS invalid_json
       FROM disp
       WHERE disposition IN ('invalid_missing_batch_id','invalid_unknown_batch_id','invalid_already_completed')"""),

    "u1_topic_derivation" -> (prelude +
      """SELECT DISTINCT topic AS in_topic,
         split_part(topic, '.', 2) AS tenant,
         regexp_replace(topic, '\.in$', '.out') AS out_topic,
         regexp_replace(topic, '\.in$', '.invalid') AS invalid_topic,
         regexp_replace(topic, '\.in$', '.notification') AS notification_topic
       FROM rec"""),

    "v1_extract_batch_id" -> (prelude + "SELECT event_id, batch_id FROM rec"),

    "v2_latest_notification" -> (prelude +
      """SELECT id, status AS latest_status, seq AS latest_seq
       FROM (SELECT id, status, seq, ROW_NUMBER() OVER (PARTITION BY id ORDER BY seq DESC) AS rn
             FROM notifs) WHERE rn = 1"""),

    "v3_batch_lookup_join" -> (prelude +
      "SELECT event_id, batch_id, batch_status FROM disp"),

    "v4_missing_batch_id" -> (prelude +
      """SELECT 'Bad Message - No header or batchId node' AS failure, topic,
         part_no AS "partition", rec_offset AS "offset", batch_id
       FROM disp WHERE disposition = 'invalid_missing_batch_id'"""),

    "v5_unknown_batch_id" -> (prelude +
      """SELECT 'Bad Message - Unknown batchId' AS failure, topic,
         part_no AS "partition", rec_offset AS "offset", batch_id
       FROM disp WHERE disposition = 'invalid_unknown_batch_id'"""),

    "v6_dropped_statuses" -> (prelude +
      "SELECT event_id, batch_id, batch_status FROM disp WHERE disposition = 'dropped'"),

    "v7_late_after_complete" -> (prelude +
      """SELECT 'Bad Message - batchId is already completed' AS failure, topic,
         part_no AS "partition", rec_offset AS "offset", batch_id
       FROM disp WHERE disposition = 'invalid_already_completed'"""),

    "v8_json_validity" -> (prelude + "SELECT event_id, is_valid FROM rec"),

    "v10_invalid_records" -> (prelude +
      """SELECT CASE disposition
           WHEN 'invalid_missing_batch_id' THEN 'Bad Message - No header or batchId node'
           WHEN 'invalid_unknown_batch_id' THEN 'Bad Message - Unknown batchId'
           WHEN 'invalid_already_completed' THEN 'Bad Message - batchId is already completed'
           ELSE 'com.fasterxml.jackson.core.JsonParseException' END AS failure_class,
         topic, part_no AS "partition", rec_offset AS "offset", batch_id
       FROM disp WHERE disposition LIKE 'invalid%'"""),

    "v11_counts_stream" -> (prelude +
      """SELECT batch_id, is_valid FROM disp WHERE disposition IN ('valid','invalid_payload')"""),

    "t1_batch_counts" -> (prelude + "SELECT id, valid, invalid FROM cnts"),

    "t2_counts_with_meta" -> (prelude +
      """SELECT c.id, c.valid, c.invalid, b.status, b.expected_record_count
       FROM cnts c JOIN bats b ON c.id = b.id"""),

    "t3_threshold_fail" -> (prelude +
      """SELECT id, failure_message, invalid_record_count FROM decis
       WHERE final_status = 'FAILED' AND invalid_threshold > -1 AND invalid >= invalid_threshold"""),

    "t4_complete_decision" -> (prelude + "SELECT * FROM decis"),

    "t6_overflow_fail" -> (prelude +
      """SELECT id, failure_message, actual_record_count, expected_record_count FROM decis
       WHERE final_status = 'FAILED' AND (invalid_threshold = -1 OR invalid < invalid_threshold)"""),

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
         COUNT(*) AS count_order
       FROM lineitem GROUP BY l_returnflag, l_linestatus""",

    "q2_topk_revenue" ->
      """SELECT o_orderkey AS order_key, revenue, o_orderpriority AS order_priority
       FROM (SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
             FROM lineitem GROUP BY l_orderkey) r
       JOIN orders ON l_orderkey = o_orderkey
       ORDER BY revenue DESC, order_key LIMIT 10""",

    "q3_nation_revenue" ->
      """SELECT n_name AS nation,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_lineitems
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       GROUP BY n_name""",

    "q4_customers_no_orders" ->
      """SELECT c_mktsegment AS mktsegment, COUNT(*) AS n_customers
       FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
       GROUP BY c_mktsegment""",

    "q5_latest_order_per_customer" ->
      """SELECT o_custkey AS custkey, o_orderkey AS order_key,
         strftime(o_orderdate, '%Y-%m-%d') AS order_date
       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
             FROM orders) WHERE rn = 1""",

    "q6_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS event_hour, event_type,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
       FROM events GROUP BY 1, 2""",

    "q7_sessions" ->
      """SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
       FROM (SELECT user_id,
               CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
             FROM (SELECT user_id, ts,
                     LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                   FROM events))
       GROUP BY user_id""",

    // q8: DuckDB's NATIVE ASOF JOIN pins the as-of operator against an
    // independent implementation of the same semantics (greatest order_ts <=
    // ts per key, inner); orders pre-aggregated per (custkey, date) so the
    // match is unambiguous
    "q8_asof_last_order" ->
      """WITH e AS (SELECT event_id, ts, user_id FROM events),
o AS (SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS order_ts,
             MAX(o_orderkey) AS order_key
      FROM orders GROUP BY 1, 2)
SELECT e.event_id, e.user_id, o.order_key AS last_order_key,
       strftime(o.order_ts, '%Y-%m-%d') AS last_order_date
FROM e ASOF JOIN o ON e.user_id = o.o_custkey AND o.order_ts <= e.ts""",

    // q9: the oracle is the PLAIN inequality join — the Spark side's bucketized
    // range join must lose and invent nothing relative to it
    "q9_range_followups" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, CAST(o_orderdate AS TIMESTAMP) AS ot
             FROM orders)
SELECT a.o_orderkey AS base_order_key, b.o_orderkey AS followup_order_key,
       a.o_custkey AS custkey, date_diff('day', a.ot, b.ot) AS days_after
FROM o a JOIN o b
  ON a.o_custkey = b.o_custkey AND b.o_orderkey <> a.o_orderkey
 AND b.ot >= a.ot AND b.ot < a.ot + INTERVAL 7 DAY""",

    "q10_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(22,2)) AS DOUBLE) AS sum_qty
       FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",

    // Spark `percentile` and DuckDB `quantile_cont` share the same linear
    // interpolation — verified bit-equal on this data
    "q11_percentiles" ->
      """SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS p50_price,
         quantile_cont(l_extendedprice, 0.95) AS p95_price, COUNT(*) AS n_items
       FROM lineitem GROUP BY 1"""
  )
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational coverage queries over the TPC-H-ish tables — exercising the engine's
  * scan/filter/project/join/aggregate/window surface with plans that hold at scale:
  * dims broadcast, facts never shuffle except for their group-by keys, money math in
  * DECIMAL so results are bit-deterministic across engines (oracle parity).
  */
object RelationalQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") graft.util.Tables.events(spark, dir)
    else graft.util.Tables.table(spark, dir, name)

  private def dec2(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")

  /** Q1 — TPC-H Q1-style pricing summary: grouped conditional aggregates.
    * Partial (map-side) aggregation makes the shuffle carry ~|groups| rows. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("decimal(22,2)").cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("decimal(22,2)").cast("double").as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(BigDecimal(1)).cast("decimal(12,2)") - dec2(col("l_discount"))))
          .cast("decimal(26,4)").cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  /** Q2 — top-10 orders by revenue (deterministic tiebreak on key). The limit is
    * applied BEFORE the orders join: revenue and the tiebreak key both come from
    * the aggregate alone (lineitem.l_orderkey ⊆ orders.o_orderkey, enforced by the
    * generator), so TakeOrderedAndProject bounds the sort to 10 rows per partition
    * and the join degenerates to a 10-row broadcast against the orders scan —
    * at 100 TB that's the difference between shuffling the whole orders table and
    * shipping 10 rows. */
  def q2TopkRevenue(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      // revenue in exact integer 10⁻⁴ units (the x60 long-kernel pattern,
      // r20): dec2(price)·100 and dec2(1−disc)·100 are compact-long
      // decimals (precision ≤ 18 — no BigDecimal anywhere on the row
      // path), their long product is the exact 4-dp value ×10⁴, and the
      // long sum replaces the decimal(38,4) buffer whose every add
      // allocated (measured: the partial aggregate was 6.1 s of the
      // plan's task time at sf0.1). The one exact 10⁻⁴ rescale per GROUP
      // reconstructs the same decimal → double bit-for-bit. Overflow
      // headroom: a group is one order (≤ 7 lineitems × < 10⁹ per row);
      // this kernel is per-order-bounded — q1/q3's whole-table groups
      // keep the decimal sum, whose long twin could overflow at extreme
      // row counts (ANSI would be loud, but the decimal form is the
      // scale-correct one there).
      .agg((sum((dec2(col("l_extendedprice")) * 100).cast("long") *
          ((lit(BigDecimal(1)).cast("decimal(12,2)") -
            dec2(col("l_discount"))) * 100).cast("long"))
          .cast("decimal(24,0)") * lit(new java.math.BigDecimal("0.0001")))
        .cast("decimal(26,4)").cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey").as("order_key"), col("revenue"),
        col("o_orderpriority").as("order_priority"))
      .orderBy(col("revenue").desc, col("order_key"))
      .limit(10)

  /** Q3 — star join: revenue by nation. Dims (customer/nation/region) broadcast; the
    * lineitem fact joins orders on its own key — at 100 TB this is the one shuffle. */
  def q3NationRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(sum(dec2(col("l_extendedprice")) * (lit(BigDecimal(1)).cast("decimal(12,2)") - dec2(col("l_discount"))))
        .cast("decimal(26,4)").cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))
  }

  /** Q4 — anti join: customers with no orders, counted by market segment. */
  def q4CustomersNoOrders(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment").as("mktsegment"))
      .agg(count(lit(1)).as("n_customers"))

  /** Q5 — window rank: each customer's latest order (row_number, deterministic
    * tiebreak). One shuffle on the partition key; no global sort. */
  def q5LatestOrderPerCustomer(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)))
      .filter(col("rn") === 1)
      .select(col("o_custkey").as("custkey"), col("o_orderkey").as("order_key"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))

  /** Q6 — tumbling-window aggregate over the event stream (batch twin of the
    * Structured Streaming windowed agg): per-hour counts and value sums. */
  def q6EventsHourly(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("event_hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec2(col("value"))).cast("decimal(22,2)").cast("double").as("sum_value"))

  /** Q8 — as-of join: each event's most recent prior order of the same customer
    * (orders pre-aggregated to one row per (custkey, date) so the match is
    * deterministic). Runs [[graft.operators.AsOfJoin]]'s union + carry-forward
    * — one shuffle, skew-linear — and the oracle is DuckDB's native ASOF JOIN,
    * so the operator's semantics are pinned against an independent
    * implementation. */
  def q8AsofLastOrder(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events").select(col("event_id"), col("ts"), col("user_id"))
    val o = t(spark, dir, "orders")
      .select(col("o_custkey"),
        col("o_orderdate").cast("timestamp").as("order_ts"), col("o_orderkey"))
      .groupBy(col("o_custkey"), col("order_ts"))
      .agg(max(col("o_orderkey")).as("order_key"))
    graft.operators.AsOfJoin.asOf(e, o, "user_id", "ts", "o_custkey", "order_ts")
      .select(col("event_id"), col("user_id"),
        col("asof_order_key").as("last_order_key"),
        date_format(col("asof_order_ts"), "yyyy-MM-dd").as("last_order_date"))
  }

  /** Q9 — range join: orders placed within 7 days AFTER another order by the
    * same customer. Runs [[graft.operators.RangeJoin]]'s bucketized
    * point-in-range join (equi-join on (key, week-bucket) + exact containment,
    * never the per-key cross product); the oracle is the plain inequality-join
    * SQL, so the bucketing must lose and invent nothing. */
  def q9RangeFollowups(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
      col("o_orderdate").cast("timestamp").as("ot"))
    val ranges = o.select(col("o_custkey"), col("o_orderkey").as("base_order"),
      col("ot").as("range_start"), (col("ot") + expr("INTERVAL 7 DAYS")).as("range_end"))
    val points = o
    graft.operators.RangeJoin.pointInRange(points, ranges,
        "o_custkey", "ot", "o_custkey", "range_start", "range_end",
        granularitySeconds = 7L * 86400)
      .filter(col("o_orderkey") =!= col("range_base_order"))
      .select(col("range_base_order").as("base_order_key"),
        col("o_orderkey").as("followup_order_key"),
        col("o_custkey").as("custkey"),
        datediff(col("ot"), col("range_range_start")).as("days_after"))
  }

  /** Q10 — ROLLUP subtotal hierarchy: per (returnflag, linestatus), per
    * returnflag, and grand total in ONE pass (Spark expands grouping sets
    * map-side; one shuffle for all three levels — three separate GROUP BYs
    * would scan and shuffle three times). */
  def q10Rollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(dec2(col("l_quantity"))).cast("decimal(22,2)").cast("double").as("sum_qty"))

  /** Q11 — exact percentiles (linear interpolation): median and p95 price per
    * returnflag. Spark's `percentile` and DuckDB's `quantile_cont` implement
    * the same interpolation — verified bit-equal. Exact percentile sorts
    * within each group; for sketch-sized state at 100 TB you'd switch to
    * `percentile_approx` (t-digest), which no longer oracle-matches by design. */
  def q11Percentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("l_extendedprice"), lit(0.5)).as("p50_price"),
        percentile(col("l_extendedprice"), lit(0.95)).as("p95_price"),
        count(lit(1)).as("n_items"))

  /** Q7 — sessionization: 30-minute-gap sessions per user via lag + running sum.
    * Interval arithmetic (not float epoch math) keeps it engine-portable. */
  def q7Sessions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(spark, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
  }
}

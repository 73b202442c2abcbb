package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver test data.
  *
  * `events.ts` has shipped in two physical schemas across driver testdata
  * generations: INT64 TIMESTAMP(NANOS) — which Spark 4's parquet reader rejects
  * outright (PARQUET_TYPE_ILLEGAL), so we read it via the legacy nanos-as-long
  * mode and floor-divide to microseconds (exactly the truncation DuckDB applies
  * to the same file: epoch_us(ts) == ns // 1000) — and plain timestamp[us],
  * which both engines read directly. [[events]] dispatches on the type the
  * reader actually produced, so either generation (and the scaling harness's
  * bigint-ts replicas) loads identically; every session that touches a raw
  * timestamp runs with `spark.sql.session.timeZone=UTC`, so the NTZ→LTZ cast
  * is instant-preserving.
  */
object Tables {

  def tune(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Session conf: minimum scan-side parallelism (0 = off). The driver's
    * testdata ships ONE parquet row group per table, and a parquet scan can
    * never split below a row group — so every scan-fused narrow pipeline
    * (tokenize/explode, the validation router, the Jackson validator) was
    * executing in a single task no matter how many cores the session had
    * (measured: 0.7–1.5 s serial per control-plane query at sf0.1).
    * `spark.sql.files.minPartitionNum` is the built-in remedy but is
    * powerless against a single row group. When this conf is set and a scan
    * resolves to FEWER partitions than it, [[table]] inserts one round-robin
    * repartition — the same cost/benefit as minPartitionNum's extra splits.
    * At deployment scale the scan has orders of magnitude more row groups
    * than the floor, the branch never triggers, and the plan is untouched. */
  val MinScanPartitionsConf = "spark.graft.scan.minPartitions"

  /** Per-(session, conf, path) memo of loaded tables. A fresh
    * `spark.read.parquet` re-lists the directory and re-reads footers for
    * the schema, and the min-partition probe below forces a full
    * analyze→optimize→plan cycle (`df.rdd`) — ~0.1–0.15 s per load at
    * sf0.1, paid by EVERY query in a 114-query single-pass bench (~230
    * loads ≈ 25 s of pure re-derivation of identical immutable state;
    * measured round 13, `graft.Profile`). The returned DataFrame is
    * immutable and the driver testdata never changes under a session, so
    * the memo is a catalog, not a result cache: nothing about query
    * results, partitioning, or plans differs from the uncached path. Keyed
    * by session identity (a DataFrame is bound to the session that built
    * it) and by the min-partition conf actually applied, so a session that
    * flips the conf re-derives. Writers that overwrite a previously read
    * path in the SAME session (the scaling harness's replica dirs) call
    * [[invalidate]] after writing. Bounded: cleared wholesale past 256
    * entries (dozens of test sessions × a handful of tables). */
  private val tableMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, String), DataFrame]()

  /** Drop every memoized table (see [[tableMemo]]) — call after overwriting
    * parquet under a directory some query in this session already read. */
  def invalidate(): Unit = tableMemo.clear()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    tune(spark)
    val min = spark.conf.getOption(MinScanPartitionsConf).map(_.toInt).getOrElse(0)
    if (tableMemo.size > 256) tableMemo.clear()
    tableMemo.computeIfAbsent(
      (System.identityHashCode(spark), min, s"$dir/$name.parquet"), _ => {
        val df = spark.read.parquet(s"$dir/$name.parquet")
        if (min > 0 && df.rdd.getNumPartitions < min) df.repartition(min) else df
      })
  }

  /** events with `ts` normalized to a true TimestampType (µs, UTC). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}

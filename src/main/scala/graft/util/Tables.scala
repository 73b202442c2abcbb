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

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    tune(spark)
    spark.read.parquet(s"$dir/$name.parquet")
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

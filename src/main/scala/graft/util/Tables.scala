package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver test data.
  *
  * `events.ts` is INT64 TIMESTAMP(NANOS), which Spark 4's parquet reader rejects
  * outright (PARQUET_TYPE_ILLEGAL). We read it via the legacy nanos-as-long mode and
  * floor-divide to microseconds — exactly the truncation DuckDB applies when it reads
  * the same file (verified: epoch_us(ts) == ns // 1000), so oracle parity holds.
  */
object Tables {

  def tune(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    tune(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events with `ts` normalized to a true TimestampType (µs, UTC). */
  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.Suite

/** One shared local SparkSession for every Spark-backed spec (JVM-wide; ScalaTest
  * runs suites in one forked JVM, so getOrCreate dedupes). */
trait SparkSpec { this: Suite =>
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

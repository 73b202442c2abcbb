package graft

import graft.util.Tables
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The scan-parallelism floor (Tables.MinScanPartitionsConf): a
  * single-row-group parquet file must spread to the floor when the conf is
  * set, stay untouched when it is not, and never repartition a scan that is
  * already wider than the floor (the deployment-scale case). */
class TablesSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("min-scan-partitions floor spreads single-row-group files, is inert otherwise") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tables").toString
    (1L to 1000L).map(i => (i, s"t$i")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      // conf unset: the single-split scan arrives as-is
      spark.conf.unset(Tables.MinScanPartitionsConf)
      Tables.table(spark, dir, "documents").rdd.getNumPartitions shouldBe 1
      // conf set above the scan width: spread to the floor, rows intact
      spark.conf.set(Tables.MinScanPartitionsConf, "4")
      val t = Tables.table(spark, dir, "documents")
      t.rdd.getNumPartitions shouldBe 4
      t.count() shouldBe 1000L
      // conf at/below the scan width: untouched (no gratuitous shuffle)
      spark.conf.set(Tables.MinScanPartitionsConf, "1")
      Tables.table(spark, dir, "documents").queryExecution.executedPlan
        .toString should not include "Exchange"
    } finally spark.conf.unset(Tables.MinScanPartitionsConf)
  }
}

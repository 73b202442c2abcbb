package graft.jobs

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the counts-handoff exactly-once contract: `foreachBatch` is
  * at-least-once, so a replayed epoch MUST change nothing — the journal is
  * epoch-keyed and first-write-wins (the SS stand-in for the reference's
  * checkpointed exactly-once shuffle, BaseValidationJob.scala:367-370). */
class CountsHandoffSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def counts(rows: (String, Boolean)*) = {
    import spark.implicits._
    rows.toDF("batchId", "isValid")
  }

  private def journal(dir: String): Map[String, (Long, Long)] =
    spark.read.parquet(dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("epoch write pre-aggregates to one delta row per batch") {
    val dir = java.nio.file.Files.createTempDirectory("counts1").toString
    ValidationJob.countsHandoff(dir)(
      counts("b1" -> true, "b1" -> true, "b1" -> false, "b2" -> false), 0L)
    journal(dir) shouldBe Map("b1" -> (2L, 1L), "b2" -> (0L, 1L))
  }

  test("replayed epoch is a no-op even with different (retried) content") {
    val dir = java.nio.file.Files.createTempDirectory("counts2").toString
    ValidationJob.countsHandoff(dir)(counts("b1" -> true), 7L)
    // at-least-once replay of epoch 7 — content must NOT be double-applied
    ValidationJob.countsHandoff(dir)(counts("b1" -> true, "b1" -> true), 7L)
    journal(dir) shouldBe Map("b1" -> (1L, 0L))
  }

  test("distinct epochs accumulate as separate delta files") {
    val dir = java.nio.file.Files.createTempDirectory("counts3").toString
    ValidationJob.countsHandoff(dir)(counts("b1" -> true), 1L)
    ValidationJob.countsHandoff(dir)(counts("b1" -> false), 2L)
    spark.read.parquet(dir).groupBy("batchId")
      .agg(org.apache.spark.sql.functions.sum("validDelta").as("v"),
        org.apache.spark.sql.functions.sum("invalidDelta").as("i"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq shouldBe Seq(("b1", 1L, 1L))
    new java.io.File(dir).listFiles().count(_.getName.startsWith("epoch-")) shouldBe 2
  }

  test("-x delivery-semantics flag: explicit values only, malformed usage throws") {
    import ValidationJob.parseExactlyOnceFlag
    parseExactlyOnceFlag(Array("-b", "x:9092")) shouldBe false
    parseExactlyOnceFlag(Array("-x", "true")) shouldBe true
    parseExactlyOnceFlag(Array("-x", "false", "-b", "x:9092")) shouldBe false
    // a bare -x must never silently mean at-least-once
    intercept[IllegalArgumentException] { parseExactlyOnceFlag(Array("-x")) }
    intercept[IllegalArgumentException] {
      parseExactlyOnceFlag(Array("-x", "-b", "x:9092")) // flag where value belongs
    }
    intercept[IllegalArgumentException] {
      parseExactlyOnceFlag(Array("-x", "yes"))
    }
  }
}

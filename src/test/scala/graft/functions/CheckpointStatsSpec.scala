package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.GraftExpressionBridge
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** [[GraftExpressionBridge.localCheckpointNoStats]] — the packing plane's
  * defense against Catalyst's size-only join estimate SQUARING a
  * checkpoint's propagated statistics per self-join round (caught live on
  * the r16 skew ladder: hundred-megabit BigIntegers inside visitJoin, the
  * driver pinned at one core). Pins (a) rows and schema are the plain
  * checkpoint's, (b) the origin stats are actually severed, and (c) the
  * self-join squaring the severed form exists to stop. */
class CheckpointStatsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def stats(df: org.apache.spark.sql.DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  test("rows, schema, partition count survive; origin stats do not") {
    val s = spark
    import s.implicits._
    val src = (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(5)
    val plain = src.localCheckpoint()
    val severed = GraftExpressionBridge.localCheckpointNoStats(src)
    severed.schema shouldBe plain.schema
    severed.rdd.getNumPartitions shouldBe plain.rdd.getNumPartitions
    severed.collect().map(_.mkString("|")).sorted shouldBe
      plain.collect().map(_.mkString("|")).sorted
    // the plain checkpoint carries the origin plan's (small, computed)
    // size; the severed one falls back to the default leaf estimate
    stats(plain) should be < stats(severed)
    stats(severed) shouldBe BigInt(
      s.sessionState.conf.defaultSizeInBytes)
  }

  test("self-joining a plain checkpoint SQUARES the estimate per round; " +
      "the severed form keeps every round's estimate bounded") {
    val s = spark
    import s.implicits._
    val base = (0L until 50L).map(i => (i, i + 1)).toDF("pos", "jmp")
    def round(df: org.apache.spark.sql.DataFrame,
        sever: Boolean): org.apache.spark.sql.DataFrame = {
      val joined = df.as("a").join(
        df.select(org.apache.spark.sql.functions.col("pos").as("bpos"),
          org.apache.spark.sql.functions.col("jmp").as("bjmp")).as("b"),
        org.apache.spark.sql.functions.col("a.jmp") ===
          org.apache.spark.sql.functions.col("bpos"))
        .select(org.apache.spark.sql.functions.col("a.pos").as("pos"),
          org.apache.spark.sql.functions.col("bjmp").as("jmp"))
      if (sever) GraftExpressionBridge.localCheckpointNoStats(joined)
      else joined.localCheckpoint()
    }
    var plain = base.localCheckpoint()
    var severed = GraftExpressionBridge.localCheckpointNoStats(base)
    val plainBits = scala.collection.mutable.ArrayBuffer.empty[Int]
    val severedBits = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (_ <- 0 until 4) {
      plain = round(plain, sever = false)
      severed = round(severed, sever = true)
      plainBits += stats(plain).bitLength
      severedBits += stats(severed).bitLength
    }
    // plain: bit count roughly doubles per round (the squaring); severed:
    // flat at the default-leaf product
    plainBits.last should be > 2 * plainBits.head
    severedBits.distinct.size shouldBe 1
  }
}

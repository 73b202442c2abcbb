package graft.corpus

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The packing plane's distributed prefix sum ([[Curation.bandedRunning]]):
  * bit-equality with the per-source window form it replaced — on exactly
  * the skew the window form could not survive (one source = 90% of rows,
  * the mega-crawl-host shape), with NULL texts and NULL sources mixed in,
  * across band counts including degenerate (1 band = the window form
  * itself) and deliberately-misaligned ones. Splitter quality must affect
  * only balance, never values: every `bands` setting must produce the
  * IDENTICAL frame. */
class BandedPrefixSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def words(n: Int): String = Seq.fill(n)("w").mkString(" ")

  /** 90%-one-source skew fixture: source "mega" holds 9 of every 10 docs;
    * NULL texts and a NULL source ride along. */
  private def skewed(n: Int, seed: Long): DataFrame = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map { i =>
      val src = if (i % 10 == 0) Some(s"s${rnd.nextInt(3)}")
        else if (i % 97 == 0) None
        else Some("mega")
      val text = if (rnd.nextInt(23) == 0) None
        else Some(words(1 + rnd.nextInt(30)))
      (i, text, src)
    }.toDF("doc_id", "text", "source")
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("packSequences is bit-equal to the one-window form on " +
      "90%-one-source skew, for every band count") {
    val d = skewed(400, 11L)
    val want = rows(Curation.packSequencesOneWindow(d))
    for (bands <- Seq(1, 2, 7, 32)) {
      withClue(s"bands=$bands: ") {
        rows(Curation.packSequences(d, bands = bands)) shouldBe want
      }
    }
  }

  test("packNextFit is invariant in the band count on skewed corpora " +
      "(bands=1 IS the windowed chain)") {
    val d = skewed(300, 13L)
    val want = rows(Curation.packNextFit(d, budget = 24, bands = 1))
    for (bands <- Seq(2, 5, 32)) {
      withClue(s"bands=$bands: ") {
        rows(Curation.packNextFit(d, budget = 24, bands = bands)) shouldBe want
      }
    }
  }

  test("assignShardsBanded deals bit-identically to the window form on " +
      "90%-one-source skew (NULL texts rank last both ways)") {
    val d = skewed(300, 23L)
    val want = rows(Curation.assignShards(d))
    for (bands <- Seq(1, 3, 16)) {
      withClue(s"bands=$bands: ") {
        rows(Curation.assignShardsBanded(d, bands = bands)) shouldBe want
      }
    }
  }

  test("windowCrossover = Long.MaxValue is genuinely probe-free: " +
      "construction runs NO eager scan (the stay-lazy escape hatch)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, udf}
    val bomb = udf((x: String) => {
      throw new RuntimeException("probe executed"); x: String
    })
    // the bomb sits on the SOURCE column, the one column the probe reads —
    // any eager construction-time scan detonates it
    val d = Seq((1L, "a b c", "s0"), (2L, "d e", "s1"))
      .toDF("doc_id", "text", "source")
      .withColumn("source", bomb(col("source")))
    // default: the cardinality probe executes at construction -> boom
    an[Exception] should be thrownBy Curation.assignShards(d)
    // pinned window: pure plan construction, nothing executes
    val lazyPlan = Curation.assignShards(d, windowCrossover = Long.MaxValue)
    an[Exception] should be thrownBy lazyPlan.collect() // still a real plan
  }

  test("assignShards skew-dispatches: past the crossover the default takes " +
      "the banded rank (no per-source window task), below it the window — " +
      "same deal either way") {
    val d = skewed(300, 29L)
    val below = Curation.assignShards(d) // 270 rows/source < any crossover
    val above = Curation.assignShards(d, windowCrossover = 100L)
    rows(above) shouldBe rows(below)
    // the dispatched plan really is the banded one: no window exchange on
    // the source key (bandedRunning shuffles on the band key instead)
    below.queryExecution.executedPlan.toString should
      include("Exchange hashpartitioning(source")
    above.queryExecution.executedPlan.toString should
      not include "Exchange hashpartitioning(source"
  }

  test("bandedRunning: global row numbers and running sums match the " +
      "window form with NULL values, NULL parts, and 2 bands") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17L)
    val d = (0L until 200L).map { i =>
      (i,
        if (rnd.nextInt(11) == 0) None else Some(rnd.nextInt(50).toLong),
        if (i % 50 == 3) None else Some(if (i % 8 == 0) "a" else "mega"))
    }.toDF("doc_id", "v", "source")
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val want = rows(d.select(col("source"), col("doc_id"),
      coalesce(sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        lit(0L)).as("rs"),
      row_number().over(w).cast("long").as("rn")))
    val got = rows(Curation.bandedRunning(d, "source", Seq("doc_id"),
        "doc_id", col("v"), "rs", "rn", bands = 2)
      .select(col("source"), col("doc_id"), col("rs"), col("rn")))
    got shouldBe want
  }
}

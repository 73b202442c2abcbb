package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.GraftExpressionBridge.{column => c, expression => x}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** [[Opaque]] — the fixture-plane pushdown barrier (r20). Pins the two
  * halves of its contract: bit-identical values (identity on eval AND on
  * the codegen path — a wrong `doGenCode` delegation would only surface
  * under wholestage codegen), and the plan property it exists for: a
  * filter on an Opaque-derived column must NOT be substituted below a
  * repartition onto the scan (the r20 single-task-scan finding —
  * 0.55–0.9 s serial fixture evaluation per url-plane query). */
class OpaqueSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("identity on values and nulls, through the codegen path") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, "c"))
      .toDF("id", "v")
      .withColumn("w", c(Opaque(x(concat(col("v"), lit("!"))))))
    df.collect().map(r => (r.getLong(0), r.getString(2))).toSet shouldBe
      Set((1L, "a!"), (2L, null), (3L, "c!"))
  }

  test("a filter on an Opaque-derived column stays above a repartition " +
      "(no substitution into the scan-side filter)") {
    // spark.range, not a local Seq: ConvertToLocalRelation would fold the
    // deterministic control case into a LocalTableScan and hide the push
    val base = spark.range(100).toDF("id").repartition(4)
    // string-matched: AdaptiveSparkPlanExec exposes no children, so a
    // physical-tree collect sees nothing under AQE
    def planOf(url: org.apache.spark.sql.Column) = base
      .withColumn("url", url)
      .filter(col("url").rlike("^k[0-9]$"))
      .queryExecution.executedPlan.toString
    // deterministic construction: the filter is pushed below the exchange
    // with the constructor substituted into its condition
    val det = planOf(concat(lit("k"), (col("id") % 10).cast("string")))
    val detPushed = det.linesIterator
      .exists(l => l.contains("Filter") && l.contains("concat"))
    // opaque construction: no filter condition inlines the constructor —
    // it references the projected attribute above the exchange
    val opq = planOf(c(Opaque(x(
      concat(lit("k"), (col("id") % 10).cast("string"))))))
    val opqInlined = opq.linesIterator
      .exists(l => l.contains("Filter") && l.contains("concat"))
    withClue(s"det plan:\n$det\nopq plan:\n$opq\n") {
      detPushed shouldBe true
      opqInlined shouldBe false
    }
    // and the results agree
    val a = base.withColumn("url",
        concat(lit("k"), (col("id") % 10).cast("string")))
      .filter(col("url").rlike("^k[0-9]$")).count()
    val b = base.withColumn("url", c(Opaque(x(
        concat(lit("k"), (col("id") % 10).cast("string"))))))
      .filter(col("url").rlike("^k[0-9]$")).count()
    a shouldBe b
  }
}

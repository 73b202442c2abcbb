package graft.corpus

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** X90 — deterministic training order: the banded global rank must be
  * bit-equal to the naive global window it replaces, rank every row
  * (NULL text included), be a permutation, move with the seed, and plan
  * with no single-partition exchange. */
class TrainingOrderSpec extends AnyFunSuite with SparkSpec {

  private def docs(n: Int) = {
    val s = spark
    import s.implicits._
    (0 until n).map(i => (i.toLong,
      if (i % 7 == 3) null else s"text $i")).toDF("doc_id", "text")
  }

  test("banded rank == the naive global window; every row ranked; " +
      "positions are a permutation of 1..n") {
    val d = docs(257) // crosses band boundaries at 4 shuffle partitions
    val got = Curation.trainingOrder(d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val key = md5(concat(lit(Curation.ShuffleSeed), lit(":"),
      col("doc_id").cast("string")))
    val naive = d.select(col("doc_id"), key.as("k"))
      .withColumn("position", row_number().over(
        Window.orderBy(col("k"), col("doc_id"))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == naive)
    assert(got.size == 257)
    assert(got.values.toSeq.sorted == (1L to 257L))
  }

  test("a different seed is a different permutation; the same seed replays") {
    val d = docs(64)
    def order(seed: String) = Curation.trainingOrder(d, seed).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(order("epoch-1") == order("epoch-1"))
    assert(order("epoch-1") != order("epoch-2"))
  }

  test("a NULL doc_id fails loudly at the key, not as an opaque NPE later") {
    val s = spark
    import s.implicits._
    val d = Seq((Some(1L), "a"), (None, "b"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] { Curation.trainingOrder(d).collect() }
    def msg(t: Throwable): String =
      Option(t.getMessage).getOrElse("") +
        Option(t.getCause).map(msg).getOrElse("")
    assert(msg(e).contains("NULL doc_id"))
  }

  test("plan: rank window partitions on the hash band — no SinglePartition " +
      "exchange anywhere") {
    val d = docs(200)
    val df = Curation.trainingOrder(d)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(band#"),
      s"expected the banded window exchange:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      "a global single-partition stage crept into the rank plan")
  }
}

package graft.functions

import graft.SparkSpec
import graft.corpus.Similarity
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** X96 — the bounded one-pass top-k aggregate. Pins the unit contract
  * (ordering, ties, NULL score/id handling, under-full groups), bit-parity
  * with the row_number-window plan on adversarial corpora, SQL-registration
  * parity, distributed partial/merge correctness, and the plan shape (hash
  * aggregation, no Window/Sort over the candidate stream). */
class TopKPairsSpec extends AnyFunSuite with SparkSpec {

  test("unit: rank order, id ties, NULL scores last, NULL ids skipped, " +
      "under-full groups") {
    val s = spark
    import s.implicits._
    val d = Seq[(Long, Option[Double], Option[Long])](
      (1L, Some(0.9), Some(10L)),
      (1L, Some(0.9), Some(7L)),   // tie: smaller id first
      (1L, Some(1.5), Some(99L)),
      (1L, None, Some(3L)),        // NULL score: after every non-null
      (1L, None, Some(1L)),        // ...NULLs ordered by id
      (1L, Some(0.1), Some(50L)),
      (1L, Some(2.0), None),       // NULL id: skipped entirely
      (2L, Some(0.5), Some(4L)))   // under-full group: 1 entry
      .toDF("g", "score", "id")
    val got = d.groupBy(col("g"))
      .agg(TopKPairs.topK(col("score"), col("id"), 4).as("top"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Row](1).map(e => (Option(e.get(0)), e.getLong(1)))).toMap
    assert(got(1L) == Seq(
      (Some(1.5), 99L), (Some(0.9), 7L), (Some(0.9), 10L), (Some(0.1), 50L)))
    assert(got(2L) == Seq((Some(0.5), 4L)))
    // NULLs-last + id-ordered among themselves: visible once k admits them
    val wide = d.groupBy(col("g"))
      .agg(TopKPairs.topK(col("score"), col("id"), 6).as("top"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Row](1).map(e => (Option(e.get(0)), e.getLong(1)))).toMap
    assert(wide(1L) == Seq(
      (Some(1.5), 99L), (Some(0.9), 7L), (Some(0.9), 10L), (Some(0.1), 50L),
      (None, 1L), (None, 3L)))
  }

  test("distributed partial/merge: many partitions reproduce the " +
      "single-partition result") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7L)
    val rows = (0L until 5000L).map(i =>
      (i % 13, rnd.nextDouble(), i))
    val d = rows.toDF("g", "score", "id")
    def run(df: org.apache.spark.sql.DataFrame) = df.groupBy(col("g"))
      .agg(TopKPairs.topK(col("score"), col("id"), 7).as("top"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Row](1).map(e => (e.getDouble(0), e.getLong(1)))).toMap
    assert(run(d.repartition(32)) == run(d.coalesce(1)))
  }

  test("x96 = x6 bit-for-bit on an adversarial corpus (duplicates, " +
      "zero-norm, NULL embedding)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11L)
    val rows: Seq[(Long, Option[Seq[Float]])] =
      (0L until 50L).map { i =>
        i -> Some(Seq.fill(5)((rnd.nextDouble() * 2 - 1).toFloat))
      } ++ Seq(
        50L -> Some(Seq(0f, 0f, 0f, 0f, 0f)), // zero-norm
        51L -> None,                           // NULL embedding
        52L -> Some(Seq(1f, 2f, 3f, 4f, 5f)),
        53L -> Some(Seq(1f, 2f, 3f, 4f, 5f))) // exact duplicate pair
    val d = rows.toDF("vec_id", "embedding")
    val a = Similarity.cosineTopK(d, numQueries = 8, k = 5)
      .collect().map(_.toSeq).toSet
    val b = Similarity.cosineTopKAgg(d, numQueries = 8, k = 5)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.size == 40)
  }

  test("SQL registration: topk_pairs agrees with the DataFrame API") {
    val s = spark
    import s.implicits._
    GraftFunctions.register(s)
    Seq((1L, 0.3, 10L), (1L, 0.7, 11L), (1L, 0.5, 12L))
      .toDF("g", "score", "id").createOrReplaceTempView("tk_in")
    val got = s.sql(
      "SELECT g, topk_pairs(score, id, 2) AS top FROM tk_in GROUP BY g")
      .selectExpr("g", "inline(top)")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 0.7, 11L), (1L, 0.5, 12L)))
  }

  test("plan shape: hash aggregation, no Window and no Sort over the " +
      "candidate stream") {
    val s = spark
    import s.implicits._
    val d = (0L until 100L).map(i =>
      i -> Seq.fill(4)((i % 7).toFloat + 1f)).toDF("vec_id", "embedding")
    val plan = Similarity.cosineTopKAgg(d, numQueries = 4, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert(!plan.contains("Window"))
  }

  test("exactAggDenseCandidates = exactDenseCandidates bit-for-bit " +
      "(the SPI swap-in)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23L)
    // duplicate vectors force cosine ties; small dim forces near-ties
    val base = (0L until 60L).map { i =>
      val v = Seq.fill(3)((rnd.nextInt(4) - 2).toDouble)
      i -> v
    }
    val corpus = base.toDF("vec_id", "e")
    val queries = base.take(5).map { case (id, v) => (id, v) }
      .toDF("query_id", "qe")
    val a = graft.corpus.Retrieval.exactDenseCandidates(corpus, queries, 7)
      .collect().map(_.toSeq).toSet
    val b = graft.corpus.Retrieval.exactAggDenseCandidates(corpus, queries, 7)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("k guard is loud") {
    intercept[IllegalArgumentException] {
      TopKPairs(org.apache.spark.sql.GraftExpressionBridge.expression(lit(1.0)),
        org.apache.spark.sql.GraftExpressionBridge.expression(lit(1L)), 0)
    }
  }
}

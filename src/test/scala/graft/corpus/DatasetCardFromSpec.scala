package graft.corpus

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** X49 extended — the persisted-plane card. [[Profiling.datasetCardFrom]]
  * must be bit-equal to the self-contained [[Profiling.datasetCard]] when
  * fed a parquet round-trip of the exact plane outputs the self-contained
  * form builds inline (the deployment story: a curation run that already
  * materialized x93–x97 pays only bounded rollups for the card), and the
  * persisted form must actually be cheap — no packing chain, no embedding
  * candidate passes, just scans of the given frames. */
class DatasetCardFromSpec extends AnyFunSuite with SparkSpec {

  private def docs(n: Int, seed: Long = 7L): DataFrame = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map { i =>
      val text =
        if (i % 17 == 3) null
        else (0 until (1 + rnd.nextInt(30)))
          .map(_ => s"w${rnd.nextInt(40)}").mkString(" ")
      (i, text, s"lang${i % 3}", s"src${i % 4}")
    }.toDF("doc_id", "text", "lang", "source")
  }

  private def emb(n: Int, dim: Int = 6, seed: Long = 91L): DataFrame = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map(i =>
      i -> Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
      .toDF("vec_id", "embedding")
  }

  private def roundTrip(df: DataFrame, tag: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(s"card_$tag").toString
    df.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("persisted-plane card is bit-equal to the self-contained form " +
      "through a parquet round-trip of every plane") {
    val d = docs(120)
    val e = emb(60)
    val selfContained = Profiling.datasetCard(d, e).collect()
    val fromPlanes = Profiling.datasetCardFrom(d, e,
      roundTrip(Curation.packEfficiencyReport(d), "p31"),
      roundTrip(Curation.packNextFit(d), "p97"),
      roundTrip(Similarity.denseRecallEval(e), "rec"),
      roundTrip(Similarity.hardNegatives(e), "neg")).collect()
    assert(selfContained.length == 1 && fromPlanes.length == 1)
    assert(selfContained.head.schema.fieldNames.toSeq ==
      fromPlanes.head.schema.fieldNames.toSeq)
    // bit-equal: every scalar, doubles compared exactly
    assert(selfContained.head.toSeq == fromPlanes.head.toSeq)
  }

  test("the persisted form re-runs NO audit plane: its physical plan is " +
      "scans of the given frames plus the base card's one docs pass") {
    val d = roundTrip(docs(50), "docs")
    val e = roundTrip(emb(40), "emb")
    val p31 = roundTrip(Curation.packEfficiencyReport(d), "pp31")
    val p97 = roundTrip(Curation.packNextFit(d), "pp97")
    val rec = roundTrip(Similarity.denseRecallEval(e), "prec")
    val neg = roundTrip(Similarity.hardNegatives(e), "pneg")
    val card = Profiling.datasetCardFrom(d, e, p31, p97, rec, neg)
    val plan = card.queryExecution.executedPlan.toString
    // docs(1, base card) + emb(1, the bounded n_q slice) + pack31(1) +
    // pack97 layout(2 — packEfficiencyOf's per-seq fill and its n_docs
    // rollup) + recall(1) + negPool(1) = 7 parquet scans, nothing else:
    // a packNextFit doubling chain or a candidate generator pass would
    // add scans/checkpoint RDDs far beyond this
    assert(plan.split("Scan parquet").length - 1 == 7, plan)
    assert(!plan.contains("Scan ExistingRDD"), // no checkpointed chain ran
      "persisted-plane card must not embed an eager checkpointed subtree")
    assert(card.collect().length == 1)
  }

  test("hardneg_yield is zero-guarded: an all-degenerate query slice " +
      "reports 0.0, never NaN/Infinity") {
    val s = spark
    import s.implicits._
    // every embedding zero-norm: normalizedCorpus leaves e NULL for all,
    // so n_q = 0 and the unguarded division would be 0/0 = NaN
    val e = (0L until 30L).map(i => i -> Seq(0f, 0f, 0f))
      .toDF("vec_id", "embedding")
    val d = docs(20)
    Seq(
      Profiling.datasetCard(d, e),
      Profiling.datasetCardFrom(d, e,
        Curation.packEfficiencyReport(d), Curation.packNextFit(d),
        Similarity.denseRecallEval(e), Similarity.hardNegatives(e))
    ).foreach { card =>
      val y = card.collect().head.getAs[Double]("hardneg_yield")
      assert(y == 0.0, s"expected guarded 0.0, got $y")
    }
  }
}

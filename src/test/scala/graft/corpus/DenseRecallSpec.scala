package graft.corpus

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** X94 — generator recall audit. The DuckDB oracle referees the default
  * IVF generator at sf; these pin the calibration contracts: the exact
  * generator scores 1.0 against itself, a deliberately-truncated generator
  * scores exactly its truncation, an empty index scores 0, full probe
  * restores 1.0, and degenerate queries surface as visible zeros. */
class DenseRecallSpec extends AnyFunSuite with SparkSpec {

  private def emb(n: Int, dim: Int = 6, seed: Long = 91L): DataFrame = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map(i =>
      i -> Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
      .toDF("vec_id", "embedding")
  }

  test("the exact generator audits against itself at recall 1.0") {
    val got = Similarity.denseRecallEval(emb(50), numQueries = 6,
      dense = Retrieval.exactDenseCandidates).collect()
    assert(got.length == 6)
    assert(got.forall(_.getAs[Double]("recall") == 1.0))
  }

  test("a top-1-truncated generator scores exactly 1/k") {
    val top1: Retrieval.DenseCandidates = (corpus, queries, _) =>
      Retrieval.exactDenseCandidates(corpus, queries, 2)
    // proposes 2 ids (k+1 is requested but the generator truncates): after
    // the self-drop at most 1 usable non-self candidate remains per query
    // when self ranks in its own top-2 — that candidate is the exact top-1,
    // always a hit
    val got = Similarity.denseRecallEval(emb(50), numQueries = 6, k = 5,
      dense = top1).collect()
    assert(got.length == 6)
    assert(got.forall(_.getAs[Long]("hits") <= 2))
    assert(got.exists(r => r.getAs[Long]("hits") == 1L &&
      r.getAs[Double]("recall") == 0.2))
  }

  test("an explicitly-empty IVF index scores a visible 0 for every query") {
    val got = Similarity.denseRecallEval(emb(40), numQueries = 5,
      dense = Retrieval.ivfDenseCandidates(
        centroids = Some(Seq.empty))).collect()
    assert(got.length == 5)
    assert(got.forall(r => r.getAs[Long]("hits") == 0L &&
      r.getAs[Double]("recall") == 0.0))
  }

  test("IVF at full probe recovers recall 1.0") {
    val got = Similarity.denseRecallEval(emb(60), numQueries = 6,
      dense = Retrieval.ivfDenseCandidates(numCentroids = 8, nprobe = 8))
      .collect()
    assert(got.length == 6)
    assert(got.forall(_.getAs[Double]("recall") == 1.0))
  }

  test("a degenerate query keeps its exact-side rows and scores a " +
      "visible 0") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17L)
    val rows = (0L until 30L).map {
      case 2L => 2L -> Seq(0f, 0f, 0f) // zero-norm query slot
      case i  => i -> Seq.fill(3)((rnd.nextDouble() * 2 - 1).toFloat)
    }
    val got = Similarity.denseRecallEval(rows.toDF("vec_id", "embedding"),
      numQueries = 4, dense = Retrieval.exactDenseCandidates)
      .collect().map(r => r.getAs[Long]("qid") ->
        r.getAs[Double]("recall")).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    assert(got(2L) == 0.0)
    assert(Seq(0L, 1L, 3L).forall(got(_) == 1.0))
  }
}

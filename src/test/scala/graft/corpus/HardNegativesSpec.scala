package graft.corpus

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** X93 — denoised hard-negative mining. The DuckDB oracle is the
  * cross-engine referee; these pin the BEHAVIOR (a near-duplicate of the
  * positive is suppressed by the margin gate while a clear negative
  * survives), the positive = exact-top-1 contract, the generator SPI
  * bit-equality at full probe, and the edge contracts. */
class HardNegativesSpec extends AnyFunSuite with SparkSpec {

  private def emb(rows: Seq[(Long, Seq[Float])]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  // query (1,0,0); positive ~aligned; an unlabeled COPY of the positive
  // (cos within margin of pos_cos) that plain top-k would rank first among
  // negatives; and two genuinely-hard negatives clear of the margin
  private def denoiseFixture: DataFrame = emb(Seq(
    0L -> Seq(1f, 0f, 0f),
    10L -> Seq(10f, 0.1f, 0f),   // positive (best match)
    11L -> Seq(10f, 0.1f, 0f),   // exact copy of the positive — suppressed
    12L -> Seq(0.8f, 0f, 0.6f),  // hard negative, cos = 0.8
    13L -> Seq(0.5f, 0f, 0.9f))) // hard negative, cos ~ 0.49

  test("a copy of the positive is margin-suppressed; clear negatives " +
      "survive and re-rank from 1") {
    val got = Similarity.hardNegatives(denoiseFixture, numQueries = 1,
      k = 3, margin = 0.1, kCand = 4)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("pos_id"), r.getAs[Long]("neg_id"),
        r.getAs[Int]("rank")))
    assert(got.map(_._2).toSet == Set(10L)) // positive = exact best match
    assert(got.map(t => t._4 -> t._3).toMap == Map(1 -> 12L, 2 -> 13L))
    assert(!got.exists(_._3 == 11L)) // the copy never appears as a negative
  }

  test("margin = 0 keeps the copy (ties at pos_cos survive the <= gate)") {
    val got = Similarity.hardNegatives(denoiseFixture, numQueries = 1,
      k = 3, margin = 0.0, kCand = 4)
      .collect().map(r => r.getAs[Int]("rank") -> r.getAs[Long]("neg_id"))
      .toMap
    assert(got == Map(1 -> 11L, 2 -> 12L, 3 -> 13L))
  }

  test("a query whose every candidate sits within the margin emits no rows") {
    val d = emb(Seq(
      0L -> Seq(1f, 0f),
      10L -> Seq(5f, 0.1f),
      11L -> Seq(5f, 0.1f),
      12L -> Seq(5f, 0.12f)))
    assert(Similarity.hardNegatives(d, numQueries = 1, k = 2,
      margin = 0.1, kCand = 3).count() == 0L)
  }

  test("positive agrees with cosineTopK rank 1 on a random corpus") {
    val rnd = new scala.util.Random(47L)
    val d = emb((0L until 60L).map(i =>
      i -> Seq.fill(6)((rnd.nextDouble() * 2 - 1).toFloat)))
    val pos = Similarity.hardNegatives(d, numQueries = 5)
      .select("query_id", "pos_id").distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val top1 = Similarity.cosineTopK(d, numQueries = 5, k = 1)
      .collect().map(r => r.getAs[Long]("qid") -> r.getAs[Long]("neighbor_id"))
      .toMap
    pos.foreach { case (q, p) => assert(top1(q) == p) }
  }

  test("degenerate (zero-norm/NULL) vectors take no part on either side") {
    val s = spark
    import s.implicits._
    val d = Seq[(Long, Option[Seq[Float]])](
      0L -> Some(Seq(1f, 0f, 0f)),
      1L -> Some(Seq(0f, 0f, 0f)),     // zero-norm query slot — no rows
      10L -> Some(Seq(10f, 0.1f, 0f)),
      12L -> Some(Seq(0.8f, 0f, 0.6f)),
      13L -> None)                     // NULL corpus vector — never a negative
      .toDF("vec_id", "embedding")
    val got = Similarity.hardNegatives(d, numQueries = 2, k = 3,
      margin = 0.0, kCand = 4).collect()
    assert(got.map(_.getAs[Long]("query_id")).toSet == Set(0L))
    assert(!got.exists(r => Set(1L, 13L)(r.getAs[Long]("neg_id"))))
  }

  test("IVF generator at full probe is bit-equal to the exact default") {
    val rnd = new scala.util.Random(53L)
    val d = emb((0L until 80L).map(i =>
      i -> Seq.fill(6)((rnd.nextDouble() * 2 - 1).toFloat)))
    val exact = Similarity.hardNegatives(d, numQueries = 4)
    val ivf = Similarity.hardNegatives(d, numQueries = 4,
      dense = Retrieval.ivfDenseCandidates(numCentroids = 8, nprobe = 8))
    val ea = exact.collect().map(_.toSeq).toSet
    val ia = ivf.collect().map(_.toSeq).toSet
    assert(ea == ia && ea.nonEmpty)
  }

  test("two-frame hardNegativesFor on a disjoint-id arriving batch mines " +
      "against the corpus; the embedded case delegates bit-equal") {
    val s = spark
    import s.implicits._
    // arriving query: id 100, equal to corpus vector 10's direction — its
    // positive is 10 (cos ~1), 11 the copy is margin-suppressed, 12/13 mine
    val corpus = emb(Seq(
      10L -> Seq(10f, 0.1f, 0f),
      11L -> Seq(10f, 0.1f, 0f),
      12L -> Seq(0.8f, 0f, 0.6f),
      13L -> Seq(0.5f, 0f, 0.9f)))
    val batch = Seq(100L -> Seq(1f, 0f, 0f)).toDF("vec_id", "embedding")
    val got = Similarity.hardNegativesFor(batch, corpus, k = 3,
      margin = 0.1, kCand = 4)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("pos_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neg_id")))
    assert(got.map(_._1).toSet == Set(100L))
    assert(got.map(_._2).toSet == Set(10L))
    assert(got.map(t => t._3 -> t._4).toMap == Map(1 -> 12L, 2 -> 13L))
    // embedded single-frame case = two-frame with a corpus slice as queries
    val all = denoiseFixture
    val a = Similarity.hardNegatives(all, numQueries = 1, k = 3,
      margin = 0.1, kCand = 4).collect().map(_.toSeq).toSet
    val b = Similarity.hardNegativesFor(
      all.filter(col("vec_id") < 1), all, k = 3, margin = 0.1, kCand = 4)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("argument guards are loud") {
    intercept[IllegalArgumentException] {
      Similarity.hardNegatives(denoiseFixture, k = 5, kCand = 5)
    }
    intercept[IllegalArgumentException] {
      Similarity.hardNegatives(denoiseFixture, margin = -0.1)
    }
  }
}

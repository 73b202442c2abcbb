package graft.corpus

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** X89 — MMR-diversified top-k. The oracle (chained greedy CTEs) is the
  * cross-engine referee; these pin the BEHAVIOR (a duplicate crowding plain
  * top-k is displaced by a diverse candidate), exact agreement with a
  * plain-Scala greedy on random pools, and the edge contracts. */
class MmrSpec extends AnyFunSuite with SparkSpec {

  private def emb(rows: Seq[(Long, Seq[Float])]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("a perfect duplicate of the top hit is displaced by a diverse " +
      "candidate at step 2") {
    // query (1,0,0); a and b duplicates (rel ~1, sim(a,b)=1); c relevant but
    // diverse: mmr(b) = rel/2 - 1/2 < mmr(c) = 0.8/2 - sim(a,c)/2
    val d = emb(Seq(
      0L -> Seq(1f, 0f, 0f),
      10L -> Seq(10f, 0.1f, 0f),
      11L -> Seq(10f, 0.1f, 0f),
      12L -> Seq(0.8f, 0f, 0.6f)))
    val got = Similarity.mmrTopK(d, numQueries = 1, kCand = 3, k = 2)
      .collect().map(r => r.getAs[Int]("step") -> r.getAs[Long]("neighbor_id"))
      .toMap
    assert(got == Map(1 -> 10L, 2 -> 12L))
    // contrast: plain cosine top-2 returns the duplicate pair
    val plain = Similarity.cosineTopK(d, numQueries = 1, k = 2)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(plain == Set(10L, 11L))
  }

  test("matches a plain-Scala greedy referee exactly on random pools") {
    val rnd = new scala.util.Random(19L)
    val dim = 8
    val rows = (0L until 40L).map(i =>
      i -> Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
    def unit(v: Seq[Float]): Array[Double] = {
      val d = v.map(_.toDouble).toArray
      var ss = 0.0; var i = 0
      while (i < d.length) { ss += d(i) * d(i); i += 1 }
      val n = math.sqrt(ss)
      d.map(_ / n)
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val numQueries = 4; val kCand = 6; val k = 3
    val units = rows.map { case (id, v) => id -> unit(v) }.toMap
    val expected = (0L until numQueries.toLong).flatMap { q =>
      val cand = rows.map(_._1).filter(_ != q)
        .map(c => (c, dot(units(q), units(c))))
        .sortBy { case (c, rel) => (-rel, c) }.take(kCand)
      val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
      for (step <- 1 to k) {
        val pickFrom = cand.filterNot(c => sel.exists(_._1 == c._1))
        val scored = pickFrom.map { case (c, rel) =>
          val mmr = if (step == 1) rel
            else rel / 2 - sel.map(s => dot(units(c), units(s._1))).max / 2
          (c, rel, mmr)
        }
        val best = scored.minBy { case (c, _, m) => (-m, c) }
        sel += ((best._1, best._2))
      }
      sel.zipWithIndex.map { case ((c, _), i) => (q, i + 1, c) }
    }.toSet
    val got = Similarity.mmrTopK(emb(rows), numQueries, kCand, k)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Int]("step"), r.getAs[Long]("neighbor_id"))).toSet
    assert(got == expected)
  }

  test("IVF generator at full probe is bit-equal to the exact default " +
      "(the x71 restriction-never-changes-a-score discipline)") {
    val rnd = new scala.util.Random(23L)
    val rows = (0L until 48L).map(i =>
      i -> Seq.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))
    def key(df: DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("step"), r.getAs[Double]("relevance"),
        r.getAs[Double]("mmr_score"))).toSet
    val exact = key(Similarity.mmrTopK(emb(rows), numQueries = 4))
    assert(exact.nonEmpty)
    val nc = Similarity.DefaultIvfCentroids
    val ivf = key(Similarity.mmrTopK(emb(rows), numQueries = 4,
      dense = Retrieval.ivfDenseCandidates(nc, nprobe = nc)))
    assert(ivf == exact)
  }

  test("knn label transfer: IVF generator at full probe is bit-equal to " +
      "the exact default") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(29L)
    val rows = (0L until 60L).map(i => (i,
      Seq.fill(8)((rnd.nextDouble() * 2 - 1).toFloat),
      Some(rnd.nextInt(3))))
    val d = rows.toDF("vec_id", "embedding", "label")
    def key(df: DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("vec_id"), r.getAs[Int]("predicted_label"),
        r.getAs[Int]("actual_label"), r.getAs[Long]("n_votes"),
        r.getAs[Boolean]("agree"))).toSet
    val exact = key(Similarity.knnLabelTransfer(d))
    assert(exact.nonEmpty)
    val nc = Similarity.DefaultIvfCentroids
    val ivf = key(Similarity.knnLabelTransfer(d,
      dense = Retrieval.ivfDenseCandidates(nc, nprobe = nc)))
    assert(ivf == exact)
  }

  test("pools smaller than k stop early; degenerate vectors take no part") {
    val d = emb(Seq(
      0L -> Seq(1f, 0f),
      1L -> Seq(0f, 0f),               // zero-norm: excluded
      10L -> Seq(0.9f, 0.1f),
      11L -> Seq(0.1f, 0.9f)))
    val got = Similarity.mmrTopK(d, numQueries = 1, kCand = 5, k = 5)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(got == Set(10L, 11L)) // 2 live candidates -> 2 steps, not 5
  }
}

package graft.corpus

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SemanticSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def emb(rows: (Long, Seq[Float])*): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  // two obvious directions in R⁴; seeds (ids 0 and 1) are one per direction
  private val twoClusters = emb(
    0L -> Seq(1f, 0f, 0f, 0f),
    1L -> Seq(0f, 1f, 0f, 0f),
    2L -> Seq(0.9f, 0.1f, 0f, 0f),
    3L -> Seq(0.1f, 0.9f, 0f, 0f),
    4L -> Seq(1f, 0.2f, 0f, 0f))

  test("kmeans assigns vectors to the nearest seed direction and keeps seed cids") {
    val out = Semantic.kmeansAssign(twoClusters, k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(0L -> 0L, 2L -> 0L, 4L -> 0L, 1L -> 1L, 3L -> 1L)
  }

  test("kmeans cosine is the similarity to the winning (recomputed) centroid") {
    val rows = Semantic.kmeansAssign(twoClusters, k = 2, iters = 2).collect()
    // every vector sits close to its cluster mean; cosines stay high and ≤ 1
    all(rows.map(_.getAs[Double]("cosine"))) should (be >= 0.9 and be <= 1.0)
  }

  test("semanticDedup drops higher ids toward the best lower keeper, ties to min id") {
    // 0, 2, 5 are colinear (cosine exactly 1 pairwise); 1, 3 the other cluster
    val d = emb(
      0L -> Seq(2f, 0f, 0f, 0f),
      1L -> Seq(0f, 1f, 0f, 0f),
      2L -> Seq(1f, 0f, 0f, 0f),
      3L -> Seq(0f, 2f, 0f, 0f),
      5L -> Seq(3f, 0f, 0f, 0f))
    val out = Semantic.semanticDedup(d, k = 2, iters = 1, tau = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // 2 keeps to 0; 5's keepers 0 and 2 tie at cosine 1 → min id 0 wins.
    // 3 keeps to 1. 0 and 1 survive (no lower-id mate).
    out shouldBe Set((2L, 0L), (5L, 0L), (3L, 1L))
  }

  test("semanticDedup only compares within a cluster (blocking semantics)") {
    // the two directions are ~45° apart (cos ≈ 0.707) so with tau = 0.5 a
    // GLOBAL pair scan would flag cross-direction pairs; clustering blocks them
    val d = emb(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(1f, 1f, 0f, 0f),
      2L -> Seq(0.99f, 0.01f, 0f, 0f))
    val out = Semantic.semanticDedup(d, k = 2, iters = 1, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // 2 clusters with 0 (cos ≈ 1); 1 seeds its own cluster and is never paired
    out shouldBe Set((2L, 0L))
  }

  test("embedDecontam flags near-benchmark vectors with their best bench match") {
    val d = emb(
      0L -> Seq(1f, 0f, 0f, 0f), // bench (0 % 25 == 0)
      25L -> Seq(0f, 1f, 0f, 0f), // bench
      1L -> Seq(2f, 0f, 0f, 0f), // exact dup of bench 0 → cos 1
      2L -> Seq(0f, 0f, 1f, 0f), // orthogonal to both → clean
      3L -> Seq(1f, 1f, 0f, 0f)) // cos .7071 to both → tie → bench 0
    val out = Semantic.embedDecontam(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("cosine"))).toSet
    out shouldBe Set((1L, 0L, 1.0), (3L, 0L, 0.707107))
  }

  test("embedDecontam compiles to a shuffle-free narrow plan (driver-held benchmark)") {
    import org.apache.spark.sql.execution.exchange.Exchange
    val d = emb(0L -> Seq(1f, 0f, 0f, 0f), 1L -> Seq(0f, 1f, 0f, 0f))
    val plan = Semantic.embedDecontam(d).queryExecution.executedPlan
    plan.isInstanceOf[
      org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec] shouldBe false
    plan.collect { case e: Exchange => e } shouldBe empty
  }

  test("kmeansAssign's final plan is shuffle-free (iteration work happens at build time)") {
    import org.apache.spark.sql.execution.exchange.Exchange
    // the Lloyd's rounds run as their own jobs during construction (centroid
    // collect); the RETURNED frame must be a single narrow assignment pass
    val plan = Semantic.kmeansAssign(twoClusters, k = 2, iters = 2)
      .queryExecution.executedPlan
    plan.isInstanceOf[
      org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec] shouldBe false
    plan.collect { case e: Exchange => e } shouldBe empty
  }

  test("embedDecontamAgainst runs unchanged on a streaming corpus") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Double])]
    val base = input.toDF().toDF("vec_id", "e")
    val bench = Seq(7L -> Seq(1.0, 0.0, 0.0, 0.0))
    val flagged = Semantic.embedDecontamAgainst(base, bench, tau = 0.9)
    flagged.isStreaming shouldBe true
    val sink = s"semdecon_${System.nanoTime}"
    val q = flagged.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("semdecon").toString)
      .start()
    try {
      input.addData((1L, Seq(1.0, 0.0, 0.0, 0.0)), (2L, Seq(0.0, 1.0, 0.0, 0.0)))
      q.processAllAvailable()
      val rows = s.table(sink).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      rows shouldBe Set((1L, 7L)) // 2 is orthogonal to the benchmark → clean
    } finally q.stop()
  }

  test("clusterProfile shares sum to 1 per cluster and counts carry the label mix") {
    import spark.implicits._
    val d = Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 10),
      (1L, Seq(0f, 1f, 0f, 0f), 20),
      (2L, Seq(0.9f, 0.1f, 0f, 0f), 10),
      (3L, Seq(0.8f, 0.2f, 0f, 0f), 20),
      (4L, Seq(0.1f, 0.9f, 0f, 0f), 20)).toDF("vec_id", "embedding", "label")
    val rows = Semantic.clusterProfile(d, k = 2, iters = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // cluster 0 = {0, 2, 3}: labels 10×2, 20×1; cluster 1 = {1, 4}: 20×2
    rows((0L, 10)) shouldBe ((2L, 0.666667))
    rows((0L, 20)) shouldBe ((1L, 0.333333))
    rows((1L, 20)) shouldBe ((2L, 1.0))
    rows.keySet shouldBe Set((0L, 10), (0L, 20), (1L, 20))
  }

  test("embeddingProfile reports dim bounds, zero-norm vectors, and exact norm stats") {
    import spark.implicits._
    val d = Seq(
      (0L, Seq(3f, 4f, 0f), 1),       // norm 5
      (1L, Seq(0f, 0f, 0f), 1),       // zero vector
      (2L, Seq(1f, 0f), 1),           // ragged: dim 2
      (3L, Seq(0f, 2f, 0f), 2)).toDF("vec_id", "embedding", "label")
    val out = Profiling.embeddingProfile(d).collect()
      .map(r => r.getInt(0) -> r).toMap
    val l1 = out(1)
    l1.getAs[Long]("n_vecs") shouldBe 3L
    l1.getAs[Long]("min_dim") shouldBe 2L
    l1.getAs[Long]("max_dim") shouldBe 3L
    l1.getAs[Long]("n_zero") shouldBe 1L
    l1.getAs[Double]("min_norm") shouldBe 0.0
    l1.getAs[Double]("max_norm") shouldBe 5.0
    l1.getAs[Double]("mean_norm") shouldBe 2.0 // (5 + 0 + 1) / 3
    out(2).getAs[Double]("mean_norm") shouldBe 2.0
    out(2).getAs[Long]("n_zero") shouldBe 0L
  }

  test("assignAgainst(trainCentroids) reproduces kmeansAssign exactly") {
    val cents = Semantic.trainCentroids(twoClusters, k = 2, iters = 2)
    val online = Semantic.assignAgainst(twoClusters, cents).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = Semantic.kmeansAssign(twoClusters, k = 2, iters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    online shouldBe batch
  }

  test("large-k assignAgainst (loop-codegen BestMatch) equals the unrolled kernel and a referee") {
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(17)
    def vec(): Seq[Double] = Seq.fill(dim)(rnd.nextGaussian())
    // 40 centroids (> BestMatchUnrollLimit → BestMatch expression), including
    // an exact DUPLICATE pair (ids 35 and 36) so the tie-break is exercised:
    // identical cosines must resolve to the LOWEST centroid id
    val base = (0 until 35).map(i => i.toLong -> vec())
    val dupOf = base(3)._2
    val cents = base ++ Seq(35L -> dupOf, 36L -> dupOf)
    cents.size should be > Semantic.BestMatchUnrollLimit
    val vecs = (100L until 180L).map(id => id -> Seq.fill(dim)(rnd.nextGaussian().toFloat))
    // one probe vector EQUAL to the duplicated centroid: its top-2 are the
    // duplicate ids 35/36 (plus original 3) at identical cosine
    val probe = 999L -> dupOf.map(_.toFloat)
    // one NULL embedding: both formulations must NULL the whole struct —
    // the unrolled array_max would otherwise "assign" the lowest ref id
    // (every cos NULL → lexicographic max falls through to nid)
    val d = (vecs :+ probe :+ (998L -> null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val fastRows = Semantic.assignAgainst(d, cents).collect()
    // the NULL embedding surfaces with a NULL assignment, it is never dropped
    val fastNull = fastRows.filter(_.getLong(0) == 998L)
    fastNull should have size 1
    fastNull.head.isNullAt(1) shouldBe true
    val fastMap = fastRows.filter(_.getLong(0) != 998L)
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // referee: driver-side argmax with the same normalize + dot arithmetic
    def normalize(v: Seq[Double]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val vecsAll = vecs.map { case (id, v) => id -> v.map(_.toDouble) } :+
      (999L -> dupOf)
    vecsAll.foreach { case (id, raw) =>
      val e = normalize(raw)
      val scored = cents.map { case (cid, c) =>
        (e.zip(c).map { case (a, b) => a * b }.sum, cid)
      }
      val bestCos = scored.map(_._1).max
      val bestId = scored.filter(_._1 == bestCos).map(_._2).min // ties → lowest id
      val (gotId, gotCos) = fastMap(id)
      gotId shouldBe bestId
      math.abs(gotCos - bestCos) should be <= 1e-6 // output rounds to 6 dp
    }
    // the probe's duplicate-centroid tie resolved to the ORIGINAL (lowest) id
    fastMap(999L)._1 shouldBe 3L
    // and the two FORMULATIONS agree bit-for-bit on the SAME reference set:
    // the loop-codegen BestMatch column vs the hand-built unrolled
    // array_max(struct(dotp, -id)) it replaces past the unroll limit
    import org.apache.spark.sql.functions.{array, array_max, col, lit, struct, typedLit, when}
    val norm = graft.corpus.Similarity.normalizedBase(d)
    // the production unrolled branch, null-guard included (withBestMatch)
    val unrolledCol = when(col("e").isNotNull,
      array_max(array(cents.map { case (id, re) =>
        struct(graft.functions.VectorOps.dotp(col("e"), typedLit(re)).as("cos"),
          lit(-id).as("nid"))
      }: _*)))
    val loopCol = graft.functions.VectorOps.bestMatch(col("e"), cents)
    val both = norm.select(col("vec_id"),
        unrolledCol.getField("cos").as("uc"), unrolledCol.getField("nid").as("un"),
        loopCol.getField("cos").as("lc"), loopCol.getField("nid").as("ln"))
      .collect()
    both.foreach { r =>
      if (r.getLong(0) == 998L) // the NULL embedding: both paths NULL out
        (1 to 4).foreach(i => r.isNullAt(i) shouldBe true)
      else {
        r.getDouble(1) shouldBe r.getDouble(3) // cosines identical, no tolerance
        r.getLong(2) shouldBe r.getLong(4)
      }
    }
    both.count(_.getLong(0) == 998L) shouldBe 1
  }

  test("assignAgainst routes a streaming corpus with fixed centroids") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val cents = Seq(0L -> Seq(1.0, 0.0, 0.0, 0.0), 1L -> Seq(0.0, 1.0, 0.0, 0.0))
    val out = Semantic.assignAgainst(
      input.toDF().toDF("vec_id", "embedding"), cents)
    out.isStreaming shouldBe true
    val sink = s"semassign_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("semassign").toString)
      .start()
    try {
      input.addData((7L, Seq(0.9f, 0.1f, 0f, 0f)), (8L, Seq(0f, 0f, 0f, 2f)))
      q.processAllAvailable()
      val rows = s.table(sink).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      rows(7L) shouldBe 0L
      // orthogonal to both centroids: cos 0 ties → lowest centroid id
      rows(8L) shouldBe 0L
    } finally q.stop()
  }

  test("kmeans matches a driver-side Lloyd's referee on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(33)
    val dim = 8
    val k = 3
    val iters = 2
    val vecs: Seq[(Long, Seq[Float])] = (0L until 60L).map { i =>
      i -> Seq.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)
    }
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
    def normalize(raw: Seq[Double]): Seq[Double] = {
      val n = math.sqrt(dot(raw, raw)); raw.map(_ / n)
    }
    val base = vecs.map { case (id, f) => id -> normalize(f.map(_.toDouble)) }.toMap
    def assignAll(cs: Seq[(Long, Seq[Double])]): Map[Long, Long] =
      base.map { case (id, e) =>
        // max cosine, ties to the lowest centroid id
        id -> cs.map { case (cid, ce) => (dot(e, ce), -cid) }.max._2.unary_-
      }
    var cents: Seq[(Long, Seq[Double])] = (0L until k).map(i => i -> base(i))
    for (_ <- 1 to iters) {
      val asg = assignAll(cents)
      cents = asg.groupBy(_._2).toSeq.map { case (cid, members) =>
        val ms = members.keys.toSeq
        val mean = (0 until dim).map(p => ms.map(id => base(id)(p)).sum / ms.size)
        cid -> normalize(mean)
      }
    }
    val expected = assignAll(cents)
    val got = Semantic.kmeansAssign(vecs.toDF("vec_id", "embedding"),
        k = k, iters = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe expected
  }

  test("incremental semantic dedup: new-vs-old only, trained on the old side") {
    // old corpus: two directions (ids 0, 2 seed; 4 joins direction-0)
    val oldE = emb(
      0L -> Seq(1f, 0f, 0f, 0f),
      2L -> Seq(0f, 1f, 0f, 0f),
      4L -> Seq(1f, 0.05f, 0f, 0f))
    // increment: 1 duplicates old direction-0; 3 is novel (z-axis);
    // 5 duplicates 1 (new-vs-new — must NOT be reported)
    val newE = emb(
      1L -> Seq(2f, 0f, 0f, 0f),
      3L -> Seq(0f, 0f, 1f, 0f),
      5L -> Seq(3f, 0f, 0f, 0f))
    val out = Semantic.incrementalSemanticDedup(newE, oldE, k = 2, iters = 1,
        tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // 1 and 5 each match old 0 (cos 1); 3 assigned somewhere but below tau
    out shouldBe Map(1L -> 0L, 5L -> 0L)
  }

  test("empty reference sets return empty results, never crash (annIvf's contract)") {
    import spark.implicits._
    // empty benchmark: nothing can be contaminated
    val base = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "e")
    val decon = Semantic.embedDecontamAgainst(base, Seq.empty)
    decon.count() shouldBe 0L
    decon.columns.toSeq shouldBe Seq("vec_id", "bench_id", "cosine")
    // empty centroids: no cluster can be assigned
    val corpus = emb(7L -> Seq(1f, 0f, 0f, 0f))
    val asg = Semantic.assignAgainst(corpus, Seq.empty)
    asg.count() shouldBe 0L
    asg.columns.toSeq shouldBe Seq("vec_id", "cluster", "cosine")
    // empty corpus through the full trainer
    val none = emb()
    Semantic.kmeansAssign(none, k = 2, iters = 2).count() shouldBe 0L
    Semantic.trainCentroids(none, k = 2, iters = 2) shouldBe empty
    Semantic.semanticDedup(none, k = 2, iters = 1).count() shouldBe 0L
    // the documented first-increment shape: an EMPTY existing index — train
    // collects zero seeds, and the increment must flow through to an empty
    // report (nothing exists to duplicate), not an IllegalArgumentException
    val inc = Semantic.incrementalSemanticDedup(
      emb(1L -> Seq(1f, 0f, 0f, 0f)), none, k = 2, iters = 1)
    inc.count() shouldBe 0L
    inc.columns.toSeq shouldBe
      Seq("vec_id", "cluster", "matched_vec_id", "cosine")
  }

  test("zero-norm vectors surface as NULL, never as a NaN centroid that absorbs the corpus") {
    // k=1: both vectors land in the single seed cluster and their mean
    // cancels to the exact zero vector. Under 0/0 = NaN semantics the NaN
    // centroid would win EVERY max-cosine contest next round (Spark orders
    // NaN greatest) and silently absorb the corpus with NaN cosines; the
    // zero-norm-mean cluster must instead DROP OUT (the empty-cluster
    // doctrine), leaving no centroids and an empty assignment
    val d = emb(0L -> Seq(1f, 0f, 0f, 0f), 1L -> Seq(-1f, 0f, 0f, 0f))
    Semantic.kmeansAssign(d, k = 1, iters = 2).collect() shouldBe empty
    // a zero-norm INPUT vector: e is NULL downstream, so its assignment row
    // carries NULL cluster/cosine instead of NaN-dominating the argmax —
    // and healthy vectors are untouched
    val withZero = emb(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0f, 0f, 0f, 0f), // zero-norm
      2L -> Seq(0.9f, 0.1f, 0f, 0f))
    val asg = Semantic.assignAgainst(withZero, Seq(0L -> Seq(1.0, 0.0, 0.0, 0.0)))
      .collect()
    asg.filter(_.getLong(0) == 1L).foreach(r => r.isNullAt(1) shouldBe true)
    asg.filter(r => r.getLong(0) != 1L)
      .map(_.getAs[Double]("cosine")).foreach(_ should be >= 0.9)
  }

  test("degenerate vectors cannot seed, centroid, or benchmark") {
    // a zero-norm vector among the k lowest ids: training seeds from the
    // HEALTHY candidates only — collecting a NULL vector to the driver-held
    // seed set would poison every downstream typedLit/BestMatch reference
    val d = emb(
      0L -> Seq(0f, 0f, 0f, 0f), // degenerate seed candidate
      1L -> Seq(1f, 0f, 0f, 0f),
      2L -> Seq(0f, 1f, 0f, 0f),
      3L -> Seq(0.9f, 0.1f, 0f, 0f))
    val cents = Semantic.trainCentroids(d, k = 2, iters = 1)
    cents.map(_._1) should contain only 1L
    cents.foreach { case (_, v) => v should not be null }
    // x51: the old side's k lowest HEALTHY ids seed (filter-then-limit — a
    // degenerate low id must not shrink the seed set); the degenerate old
    // vector also matches nothing
    val inc = Semantic.incrementalSemanticDedup(
      emb(11L -> Seq(1f, 0f, 0f, 0f)),
      d, k = 2, iters = 1)
    inc.collect().map(_.getLong(0)).toSeq shouldBe Seq(11L)
    // a degenerate benchmark vector is dropped, not collected: with the only
    // %-mod slice member degenerate, the benchmark set is EMPTY and nothing
    // is flagged (the documented empty-benchmark shape), instead of an NPE
    val bench = emb(
      0L -> Seq(0f, 0f, 0f, 0f), // 0 % DecontamBenchMod == 0 -> benchmark
      1L -> Seq(1f, 0f, 0f, 0f),
      2L -> Seq(0.99f, 0.01f, 0f, 0f))
    Semantic.embedDecontam(bench).count() shouldBe 0L
  }

  test("persisted assigned index: probe matches the self-contained query and " +
      "re-shuffles only the increment") {
    val oldEmb = emb(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0f, 1f, 0f, 0f),
      2L -> Seq(0.9f, 0.1f, 0f, 0f),
      3L -> Seq(0.1f, 0.9f, 0f, 0f))
    val newEmb = emb(
      10L -> Seq(0.95f, 0.05f, 0f, 0f),
      11L -> Seq(0f, 0f, 1f, 0f)) // matches nothing
    val cents = Semantic.trainCentroids(oldEmb, k = 2, iters = 2)
    Semantic.writeAssignedIndex(
      Semantic.assignedIndex(oldEmb, cents), "sem_idx_spec", buckets = 4)
    val conf = spark.conf
    val prev = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = Semantic.incrementalSemanticDedupAgainst(
        newEmb, spark.table("sem_idx_spec"), cents)
      // value parity with the self-contained query (same centroids: trained
      // on the same old side with the same geometry)
      val direct = Semantic.incrementalSemanticDedup(newEmb, oldEmb,
        k = 2, iters = 2)
      probe.collect().map(_.toSeq).toSet shouldBe
        direct.collect().map(_.toSeq).toSet
      probe.collect().map(_.getLong(0)).toSeq shouldBe Seq(10L)
      // plan shape: exchanges are increment-side ONLY — the increment's
      // assignment into the cid join (1) and the best-match window (2); an
      // index-side exchange would make it three
      val finalPlan = probe.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val rendered = finalPlan.toString
      "Exchange hashpartitioning".r.findAllIn(rendered).size shouldBe 2
      rendered should not include "BroadcastExchange"
      rendered should include("Bucketed: true")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS sem_idx_spec")
    }
  }

  test("embedDecontam leaves a clean corpus unflagged") {
    val d = emb(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0f, 0f, 1f, 0f),
      2L -> Seq(0f, 0f, 0f, 1f))
    Semantic.embedDecontam(d).count() shouldBe 0L
  }

  test("outlier report surfaces the farthest member per cluster with a positive gap") {
    // cluster 0 around e1: ids 0,2,3 tight, id 9 at ~45 degrees (the outlier);
    // cluster 1 around e2: ids 1,4 tight; id 6 degenerate (excluded, not outlier)
    val d = emb(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0f, 1f, 0f, 0f),
      2L -> Seq(0.95f, 0.05f, 0f, 0f),
      3L -> Seq(0.9f, 0.1f, 0f, 0f),
      9L -> Seq(0.7f, 0.55f, 0f, 0f),
      4L -> Seq(0.05f, 0.95f, 0f, 0f),
      6L -> Seq(0f, 0f, 0f, 0f))
    val out = Semantic.outlierReport(d, k = 2, m = 1).collect()
      .map(r => r.getAs[Long]("cluster") ->
        ((r.getAs[Long]("vec_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("n_members"), r.getAs[Double]("gap")))).toMap
    out.keySet shouldBe Set(0L, 1L)
    val (worst0, rank0, n0, gap0) = out(0L)
    worst0 shouldBe 9L // the 45-degree stray, never the tight members
    rank0 shouldBe 1
    n0 shouldBe 4L     // degenerate id 6 is NOT a member anywhere
    gap0 should be > 0.05
    val (_, _, n1, gap1) = out(1L)
    n1 shouldBe 2L
    gap1 should (be >= 0.0 and be < 0.01) // tight cluster: tiny gap
  }

  test("outlier report ranks by cosine ascending with vec_id tiebreak, m bounds rows") {
    val d = emb(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(0f, 1f, 0f, 0f),
      2L -> Seq(1f, 0f, 0f, 0f),
      7L -> Seq(1f, 0f, 0f, 0f),   // three exact members pin the mean at e1
      3L -> Seq(0.6f, 0.4f, 0f, 0f),
      5L -> Seq(0.6f, 0.4f, 0f, 0f)) // identical strays: tie broken by id
    val rows = Semantic.outlierReport(d, k = 2, m = 2).collect()
      .filter(_.getAs[Long]("cluster") == 0L)
      .sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("rank")))
    rows shouldBe Array((3L, 1), (5L, 2))
  }
}

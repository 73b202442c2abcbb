package graft.corpus

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck properties for the PQ plane's contracts across random vector
  * sets (sizes, dimensions, degenerate rates the fixture specs never cover):
  *
  *  - encode produces one in-range code per subspace for every clean
  *    vector, and drops exactly the degenerate/wrong-dim rows;
  *  - the ADC micro-score is EXACTLY the sum of the per-subspace LUT
  *    entries selected by the codes (recomputed independently here);
  *  - IVF-PQ with full probe coverage equals the unrestricted ADC search
  *    row-for-row, and under any nprobe never invents a score the
  *    unrestricted search would not have produced;
  *  - re-rank at full depth reproduces the exact cosine baseline.
  *
  * Sample count is bounded (each trial runs several small Spark jobs). */
object QuantizationProperties extends Properties("quantization") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session

  private case class Fixture(dim: Int, m: Int, ksub: Int,
      rows: List[(Long, Array[Float])])

  private val fixtureGen: Gen[Fixture] = for {
    mExp <- Gen.choose(1, 3)          // m ∈ {2, 4, 8}
    dsub <- Gen.choose(2, 4)
    ksub <- Gen.choose(2, 6)
    n <- Gen.choose(15, 60)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield {
    val m = 1 << mExp
    val dim = m * dsub
    val rnd = new scala.util.Random(seed)
    val rows = (0L until n.toLong).map { i =>
      val v =
        if (rnd.nextDouble() < 0.06) Array.fill(dim)(0.0f)          // zero norm
        else if (rnd.nextDouble() < 0.06) Array.fill(dim / 2)(1.0f) // wrong dim
        else Array.fill(dim)(rnd.nextGaussian().toFloat)
      i -> v
    }.toList
    Fixture(dim, m, ksub, rows)
  }

  private def df(f: Fixture) = {
    val s = spark
    import s.implicits._
    f.rows.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
  }

  /** Independent replica of normalizedBase: float→double, x/√Σx². */
  private def norm(v: Array[Float]): Option[Array[Double]] = {
    val xs = v.map(_.toDouble)
    val n2 = xs.foldLeft(0.0)((s, x) => s + x * x)
    if (n2 > 0) Some(xs.map(_ / math.sqrt(n2))) else None
  }

  private def micro(d: Double): Long =
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .movePointRight(6).longValueExact()

  property("encode: in-range dense codes for clean rows, drops for the rest") =
    Prop.forAll(fixtureGen) { f =>
      val d = df(f)
      val seeds = f.rows.filter { case (id, v) =>
        id < f.ksub && v.length == f.dim && norm(v).isDefined }
      (seeds.nonEmpty) ==> {
        val cbs = Quantization.sliceCodebooks(d, f.m, f.ksub, f.dim)
        val got = Quantization.encoded(d, cbs, f.dim).collect()
          .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Int](1)).toMap
        val clean = f.rows.filter { case (_, v) =>
          v.length == f.dim && norm(v).isDefined }.map(_._1).toSet
        (got.keySet == clean) :| s"population ${got.keySet} vs $clean" &&
          got.values.forall(cs => cs.length == f.m &&
            cs.forall(c => c >= 0 && c < seeds.length)) :| "codes in range"
      }
    }

  property("ADC micro-score = Σ_s lut[s·ksub + code_s], recomputed independently") =
    Prop.forAll(fixtureGen) { f =>
      val d = df(f)
      val seeds = f.rows.filter { case (id, v) =>
        id < f.ksub && v.length == f.dim && norm(v).isDefined }
      val queries = f.rows.filter { case (id, v) =>
        id < 5 && v.length == f.dim && norm(v).isDefined }
      (seeds.nonEmpty && queries.nonEmpty) ==> {
        val cbs = Quantization.sliceCodebooks(d, f.m, f.ksub, f.dim)
        val dsub = f.dim / f.m
        val codes = Quantization.encoded(d, cbs, f.dim).collect()
          .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Int](1)).toMap
        val out = Quantization.adcTopKWith(d, cbs, numQueries = 5,
          k = Int.MaxValue, dim = f.dim).collect()
        out.nonEmpty && out.forall { r =>
          val q = norm(f.rows(r.getAs[Long]("qid").toInt)._2).get
          val cs = codes(r.getAs[Long]("neighbor_id"))
          val expect = (0 until f.m).map { s =>
            val qs = q.slice(s * dsub, (s + 1) * dsub)
            val cw = cbs(s)(cs(s))
            micro(qs.zip(cw).foldLeft(0.0)((a, p) => a + p._1 * p._2))
          }.sum
          r.getAs[Double]("score") == expect.toDouble / 1000000.0
        }
      }
    }

  property("IVF-PQ: full probe ≡ unrestricted; any nprobe never invents a score") =
    Prop.forAll(fixtureGen, Gen.choose(1, 4)) { (f, nprobe) =>
      val d = df(f)
      val seeds = f.rows.filter { case (id, v) =>
        id < f.ksub && v.length == f.dim && norm(v).isDefined }
      (seeds.nonEmpty) ==> {
        val key = (r: org.apache.spark.sql.Row) =>
          (r.getAs[Long]("qid"), r.getAs[Int]("rank")) ->
            (r.getAs[Long]("neighbor_id"), r.getAs[Double]("score"))
        val numC = math.min(f.ksub + 2, 8)
        val full = Quantization.ivfAdcTopK(d, f.m, f.ksub, numCentroids = numC,
          nprobe = numC, numQueries = 4, k = 3, dim = f.dim)
          .collect().map(key).toMap
        val unrestricted = Quantization.adcTopK(d, f.m, f.ksub,
          numQueries = 4, k = 3, dim = f.dim).collect().map(key).toMap
        val allScores = Quantization.adcTopK(d, f.m, f.ksub, numQueries = 4,
          k = Int.MaxValue, dim = f.dim).collect()
          .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor_id")) ->
            r.getAs[Double]("score")).toMap
        val probed = Quantization.ivfAdcTopK(d, f.m, f.ksub,
          numCentroids = numC, nprobe = nprobe, numQueries = 4, k = 3,
          dim = f.dim).collect()
        (full == unrestricted) :| "full probe == unrestricted" &&
          probed.forall(r => allScores.get(
            (r.getAs[Long]("qid"), r.getAs[Long]("neighbor_id")))
            .contains(r.getAs[Double]("score"))) :| "scores preserved"
      }
    }

  property("re-rank at corpus depth reproduces the exact cosine baseline") =
    Prop.forAll(fixtureGen) { f =>
      val d = df(f)
      val seeds = f.rows.filter { case (id, v) =>
        id < f.ksub && v.length == f.dim && norm(v).isDefined }
      (seeds.nonEmpty) ==> {
        val key = (r: org.apache.spark.sql.Row) =>
          (r.getAs[Long]("qid"), r.getAs[Int]("rank")) ->
            (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))
        val cbs = Quantization.sliceCodebooks(d, f.m, f.ksub, f.dim)
        val rr = Quantization.adcRerankTopKWith(d, cbs, numQueries = 3,
          k = 3, depth = f.rows.size, dim = f.dim).collect().map(key).toMap
        // exact baseline restricted to the clean-QUERY population the PQ
        // plane searches. x6 itself does not dimension-check, so two
        // wrong-dim vectors of the SAME length legitimately pair there
        // (found by this property's first run) — but a clean query's top-k
        // can only contain clean rows (any other pairing has NULL cosine,
        // which ranks last), so filtering to clean queries aligns the
        // populations without touching rank arithmetic; guard k ≤ clean
        val cleanIds = f.rows.collect { case (id, v)
          if v.length == f.dim && norm(v).isDefined => id }.toSet
        (cleanIds.size > 4) ==> {
          val exact = Similarity.cosineTopK(d, 3, 3).collect()
            .filter(r => cleanIds(r.getAs[Long]("qid"))).map(key).toMap
          rr == exact
        }
      }
    }

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  property("SQ8: codes match a min-max replica; ADC is the factored dequantized dot") =
    Prop.forAll(fixtureGen) { f =>
      val base = f.rows.flatMap { case (id, v) =>
        if (v.length != f.dim) None else norm(v).map(id -> _) }
      (base.size > 4) ==> {
        val dim = f.dim
        val mins = Array.tabulate(dim)(s => base.map(_._2(s)).min)
        val diffs = Array.tabulate(dim)(s => base.map(_._2(s)).max - mins(s))
        // the engine's exact code arithmetic: ((x−mn)/d)·255, HALF_UP, clamp
        def code(x: Double, s: Int): Long =
          if (diffs(s) > 0) math.min(255L, math.max(0L,
            java.math.BigDecimal.valueOf((x - mins(s)) / diffs(s) * 255)
              .setScale(0, java.math.RoundingMode.HALF_UP).longValue()))
          else 0L
        val expCodes = base.flatMap { case (id, e) =>
          e.indices.map(s => (id, s) -> code(e(s), s)) }.toMap
        val gotCodes = Quantization.sq8Codes(df(f), dim).collect()
          .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("s")) ->
            r.getAs[Long]("code")).toMap
        val codesOk = gotCodes == expCodes
        // ADC referee: qconst = ⟨q, mins⟩, plus ⟨(q_s·d_s/255)_s, codes⟩
        val nq = 10L; val k = 3
        def dot(a: Seq[Double], b: Seq[Double]): Double = {
          var s = 0.0; var i = 0
          while (i < a.length) { s += a(i) * b(i); i += 1 }
          s
        }
        val expAdc = base.filter(_._1 < nq).flatMap { case (qid, qe) =>
          val qconst = dot(qe.toSeq, mins.toSeq)
          val qs = Array.tabulate(dim)(s => qe(s) * diffs(s) / 255)
          base.filter(_._1 != qid).map { case (id, e) =>
            val codes = Array.tabulate(dim)(s => code(e(s), s).toDouble)
            (id, dot(qs.toSeq, codes.toSeq) + qconst)
          }.sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
            .take(k).zipWithIndex
            .map { case ((id, sc), i) => (qid, id, i + 1, round6(sc)) }
        }.toSet
        val gotAdc = Quantization.sq8TopK(df(f), numQueries = nq.toInt,
            k = k, dim = dim).collect()
          .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor_id"),
            r.getAs[Int]("rank"), r.getAs[Double]("score"))).toSet
        (codesOk && gotAdc == expAdc) :|
          s"codesOk=$codesOk adc got=${gotAdc.size} exp=${expAdc.size}"
      }
    }
}

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
}

package graft.corpus

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck properties for the sketch-based 100 TB twins
  * ([[Profiling.lengthProfileApprox]], [[Profiling.datasetCardApprox]]):
  * the fixture spec pins one corpus; these pin the TOLERANCE CONTRACT
  * itself across random corpora — duplicate rates, source/lang
  * cardinalities, and length distributions the fixture never covers.
  *
  * Bounds are the sketches' own guarantees, not tuned-to-pass slack:
  *  - `percentile_approx` (GK) at accuracy 10 000 has rank error
  *    ≤ n/accuracy < 1 for every generated corpus, so the returned value
  *    must be one of the two order statistics the exact interpolated
  *    percentile lies between — asserted per source, per quartile.
  *  - `approx_count_distinct` (HLL++, rsd 0.02): generated cardinalities
  *    sit in the linear-counting regime where the estimate is near-exact;
  *    the bound max(1, 3·rsd·exact) covers the occasional register
  *    collision without ever accepting a wrong order of magnitude. The
  *    duplicate count (docs − distinct digests) gets the same bound on
  *    its distinct term plus the documented clamp-at-zero.
  *  - everything non-sketched in the twins (counts, min/max/sums,
  *    mean_quality) must be EXACTLY equal — same expressions by
  *    construction; a drifted copy is a bug, not an approximation.
  *
  * Sample count is bounded (each trial runs four tiny Spark jobs). */
object ApproxTwinProperties extends Properties("approx-twins") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.session

  /** Random corpus with injected exact duplicates (15%) so n_dup_docs is
    * non-trivial, across varying sizes, vocabularies, and cardinalities. */
  private val corpusGen: Gen[List[Doc]] = for {
    n <- Gen.choose(1, 300)
    nSrc <- Gen.choose(1, 6)
    nLang <- Gen.choose(1, 4)
    vocab <- Gen.choose(5, 60)
    maxLen <- Gen.choose(1, 80)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield {
    val rnd = new scala.util.Random(seed)
    val texts = scala.collection.mutable.ArrayBuffer.empty[String]
    (0 until n).map { i =>
      val text =
        if (i > 0 && rnd.nextDouble() < 0.15) texts(rnd.nextInt(texts.size))
        else (0 until (1 + rnd.nextInt(maxLen)))
          .map(_ => s"w${rnd.nextInt(vocab)}").mkString(" ")
      texts += text
      Doc(i.toLong, text, s"lang${rnd.nextInt(nLang)}", s"src${rnd.nextInt(nSrc)}")
    }.toList
  }

  private def df(docs: List[Doc]) = {
    val s = spark
    import s.implicits._
    docs.map(d => (d.doc_id, d.text, d.lang, d.source))
      .toDF("doc_id", "text", "lang", "source")
  }

  property("lengthProfileApprox: exact fields equal; quartiles inside the GK rank bracket") =
    Prop.forAll(corpusGen) { docs =>
      val byLabel = (r: org.apache.spark.sql.Row) => r.getString(0) -> r
      val exact = Profiling.lengthProfile(df(docs)).collect().map(byLabel).toMap
      val approx = Profiling.lengthProfileApprox(df(docs)).collect().map(byLabel).toMap
      val referee = docs.groupBy(_.source).map { case (src, ds) =>
        src -> ds.map(_.text.split(" ").length).sorted.toIndexedSeq
      }
      Prop.all(referee.toSeq.map { case (src, sorted) =>
        val e = exact(src); val a = approx(src)
        val quartiles = Seq(0.25 -> 4, 0.5 -> 5, 0.75 -> 6).map { case (q, idx) =>
          val rank = (sorted.size - 1) * q
          val (lo, hi) = (sorted(rank.toInt), sorted(math.ceil(rank).toInt))
          val interp = lo + (rank - rank.toInt) * (hi - lo)
          // the exact operator IS the interpolated percentile...
          (e.getDouble(idx) == interp) :| s"$src exact q$q" &&
            // ...and GK at accuracy 10k (rank error < 1 doc here) must return
            // one of the two bracketing order statistics, in the input's type
            (a.getInt(idx) >= lo && a.getInt(idx) <= hi) :| s"$src approx q$q"
        }
        val untouched = Seq(1, 2, 3, 7).forall(i => e.getLong(i) == a.getLong(i))
        Prop.all((untouched :| s"$src non-sketched fields drifted") +: quartiles: _*)
      }: _*)
    }

  property("datasetCardApprox: exact fields equal; HLL fields within max(1, 3·rsd·exact)") =
    Prop.forAll(corpusGen) { docs =>
      val rsd = 0.02
      val e = Profiling.datasetCard(df(docs)).collect().head
      val a = Profiling.datasetCardApprox(df(docs), rsd).collect().head
      def within(name: String, tol: Long => Double): Prop = {
        val (ev, av) = (e.getAs[Long](name), a.getAs[Long](name))
        (math.abs(av - ev) <= math.max(1.0, tol(ev))) :|
          s"$name: approx=$av exact=$ev"
      }
      // pure-Scala referee pins the exact card too (not just twin-vs-twin)
      val refDup = docs.size - docs.map(_.text).distinct.size
      Prop.all(
        (e.getAs[Long]("n_docs") == docs.size.toLong) :| "exact n_docs vs referee",
        (e.getAs[Long]("n_dup_docs") == refDup.toLong) :| "exact n_dup_docs vs referee",
        (a.getAs[Long]("n_docs") == e.getAs[Long]("n_docs")) :| "n_docs drifted",
        (a.getAs[Long]("n_tokens") == e.getAs[Long]("n_tokens")) :| "n_tokens drifted",
        (a.getAs[Long]("n_chars") == e.getAs[Long]("n_chars")) :| "n_chars drifted",
        (a.getAs[Double]("mean_quality") == e.getAs[Double]("mean_quality")) :|
          "mean_quality drifted",
        within("n_sources", 3 * rsd * _),
        within("n_langs", 3 * rsd * _),
        // the sketched term is the DISTINCT-digest count (n - dup), so the
        // tolerance scales with it, and the clamp keeps the result ≥ 0
        within("n_dup_docs", d => 3 * rsd * (docs.size - d)),
        (a.getAs[Long]("n_dup_docs") >= 0L) :| "dup count went negative")
    }
}

/** Top-level (not object-nested) so the tuple-free Dataset encoder would
  * stay codegen-friendly if ever used directly; the generator builds these. */
private[corpus] case class Doc(doc_id: Long, text: String, lang: String, source: String)

package graft.corpus

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck properties for the retrieval plane's parity contracts — the
  * fixture specs pin one corpus each; these pin the CONTRACTS themselves
  * across random corpora (sizes, vocabularies, duplicate rates, degenerate
  * documents the fixtures never cover):
  *
  *  - the persisted-index path ([[Retrieval.bm25TopKAgainst]] over
  *    [[Retrieval.bm25Index]]) must reproduce the self-contained
  *    [[Retrieval.bm25TopK]] EXACTLY — rows, scores, ranks;
  *  - the driver-held ingest gate ([[Retrieval.bm25IngestGate]]) must agree
  *    with the batch path's best-query-per-document decision BIT-FOR-BIT
  *    (scores included — that is the auditing contract);
  *  - [[TextStats.trainBpe]] must learn exactly the reference merge list a
  *    plain-collections implementation produces.
  *
  * Sample count is bounded (each trial runs several small Spark jobs). */
object RetrievalProperties extends Properties("retrieval") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session

  private case class Doc(docId: Long, text: String)

  /** Random corpus whose ids straddle the query-sheet boundary, with
    * occasional empty / whitespace-only / repeated-token texts. */
  private val corpusGen: Gen[List[Doc]] = for {
    n <- Gen.choose(30, 200)
    vocab <- Gen.choose(3, 25)
    maxLen <- Gen.choose(1, 20)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val text =
        if (rnd.nextDouble() < 0.03) ""
        else if (rnd.nextDouble() < 0.03) " "
        else Seq.fill(1 + rnd.nextInt(maxLen))(
          s"w${rnd.nextInt(vocab)}").mkString(" ")
      // ids cover sheet members (multiples of QueryMod below the cap),
      // post-cap multiples, and plain corpus ids
      Doc(i.toLong * (Retrieval.QueryMod / 2), text)
    }.toList
  }

  private def df(docs: List[Doc]) = {
    val s = spark
    import s.implicits._
    docs.map(d => (d.docId, d.text)).toDF("doc_id", "text")
  }

  private def collectTopK(out: org.apache.spark.sql.DataFrame) =
    out.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("n_terms"), r.getAs[Double]("score"),
      r.getAs[Int]("rank"))).toSet

  property("index-path bm25 reproduces the self-contained query exactly") =
    Prop.forAll(corpusGen) { docs =>
      val all = df(docs)
      val sheet = all.filter(Retrieval.querySheetCol())
      val corpus = all.filter(!Retrieval.querySheetCol())
      val self = collectTopK(Retrieval.bm25TopK(all))
      val via = collectTopK(
        Retrieval.bm25TopKAgainst(corpus, Retrieval.bm25Index(corpus), sheet))
      (via == self) :| s"self=${self.size} via=${via.size}"
    }

  property("ingest gate agrees bit-for-bit with the batch best-query decision") =
    Prop.forAll(corpusGen) { docs =>
      val all = df(docs)
      val sheet = all.filter(Retrieval.querySheetCol())
      val corpus = all.filter(!Retrieval.querySheetCol())
      val index = Retrieval.bm25Index(corpus)
      val gate = Retrieval.bm25IngestGate(corpus,
        Retrieval.bm25Model(index, sheet))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("query_id"), r.getAs[Double]("score"),
            r.getAs[Long]("n_terms")))).toMap
      val batch = Retrieval.bm25TopKAgainst(corpus, index, sheet,
          k = Int.MaxValue)
        .collect().map(r => (r.getAs[Long]("doc_id"),
          (r.getAs[Long]("query_id"), r.getAs[Double]("score"),
            r.getAs[Long]("n_terms"))))
        .groupBy(_._1).view
        .mapValues(_.map(_._2).minBy { case (q, s, _) => (-s, q) }).toMap
      (gate == batch) :| s"gate=${gate.size} batch=${batch.size}"
    }

  // --- independent BPE reference (plain collections, no Spark) ---
  private def refMerge(syms: Vector[String], l: String, r: String): Vector[String] =
    syms.foldLeft(Vector.empty[String])((acc, x) =>
      if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
      else acc :+ x)

  private def refTrain(corpus: Seq[String], n: Int): Seq[(String, String, Long)] = {
    var words: Map[Vector[String], Long] = corpus.flatMap(_.split(" "))
      .filter(_.nonEmpty).groupBy(identity).view.mapValues(_.size.toLong)
      .toMap.map { case (w, f) => w.map(_.toString).toVector -> f }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 0 until n) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += f
      if (counts.isEmpty) return out.toSeq
      val ((l, r), c) = counts.toSeq.minBy { case ((a, b), k) => (-k, a, b) }
      out += ((l, r, c))
      words = words.map { case (syms, f) => refMerge(syms, l, r) -> f }
    }
    out.toSeq
  }

  property("trainBpe learns exactly the reference merge list") =
    Prop.forAll(corpusGen, Gen.choose(1, 5)) { (docs, merges) =>
      val learned = TextStats.trainBpe(df(docs), numMerges = merges)
      val expected = refTrain(docs.map(_.text), merges)
      (learned == expected) :| s"learned=$learned expected=$expected"
    }

  // --- plain-Scala vector referee (engine operation order: float→double
  // cast, left-to-right sum-of-squares, sqrt, element divide, left-to-right
  // dot — every step bit-identical to NormalizeVector/DotProduct) ---
  private def refNorm(v: Array[Float]): Option[Array[Double]] = {
    val d = v.map(_.toDouble)
    var ss = 0.0
    d.foreach(x => ss += x * x)
    val n = math.sqrt(ss)
    if (!(n > 0)) None else Some(d.map(_ / n))
  }
  private def refDot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private case class Vecs(rows: List[(Long, Array[Float])])

  /** Random embeddings on the corpusGen id grid (sheet members, post-cap
    * multiples, plain ids) with occasional zero-norm vectors; small-int
    * components keep doubles exact and dodge -0.0/NaN ordering edges. */
  private val vecGen: Gen[Vecs] = for {
    n <- Gen.choose(25, 80)
    dim <- Gen.oneOf(4, 8)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield {
    val rnd = new scala.util.Random(seed)
    Vecs((0 until n).map { i =>
      val v = if (rnd.nextDouble() < 0.08) Array.fill(dim)(0f)
        else Array.fill(dim)((rnd.nextInt(9) - 4).toFloat)
      (i.toLong * (Retrieval.QueryMod / 2), v)
    }.toList)
  }

  private def vdf(vecs: Vecs) = {
    val s = spark
    import s.implicits._
    vecs.rows.toDF("vec_id", "embedding")
  }

  property("annTruncated matches a plain-Scala two-stage referee; full prefix equals cosineTopK") =
    Prop.forAll(vecGen, Gen.choose(1, 4), Gen.choose(2, 8)) { (vecs, dp0, m) =>
      val base = vecs.rows.flatMap { case (id, v) =>
        refNorm(v).map(id -> _) }
      val dim = vecs.rows.head._2.length
      val dp = math.min(dp0, dim)
      val nq = 30L // covers several ids on the 25-grid
      val k = 4
      val expected = base.filter(_._1 < nq).flatMap { case (qid, qe) =>
        val cands = base.filter(_._1 != qid)
          .map { case (id, e) =>
            (id, refDot(qe.take(dp), e.take(dp)), refDot(qe, e)) }
          .sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
          .take(m)
        cands.map { case (id, _, cos) => (id, cos) }
          .sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
          .take(k).zipWithIndex
          .map { case ((id, cos), i) => (qid, id, i + 1, round6(cos)) }
      }.toSet
      val got = Similarity.annTruncated(vdf(vecs), dPrefix = dp,
          shortlist = m, numQueries = nq.toInt, k = k).collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor_id"),
          r.getAs[Int]("rank"), r.getAs[Double]("cosine"))).toSet
      (got == expected) :| s"got=${got.size} expected=${expected.size}"
    }

  property("hybridRrfTopK fuses its two candidate lists exactly (rank-0 absences, 1/(60+r) arithmetic)") =
    Prop.forAll(corpusGen, vecGen) { (docs, vecs) =>
      val kCand = Retrieval.DefaultFusionCandidates
      val k = Retrieval.DefaultTopK
      val sheetCap = Retrieval.QueryMod * Retrieval.QueryCount
      def isSheet(id: Long) =
        id % Retrieval.QueryMod == 0 && id < sheetCap
      // lexical list from the engine (pinned by its own properties above)
      val lex = Retrieval.bm25TopK(df(docs), k = kCand).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) ->
          r.getAs[Int]("rank")).toMap
      // dense list from the plain-Scala referee
      val base = vecs.rows.flatMap { case (id, v) => refNorm(v).map(id -> _) }
      val dense = base.filter(t => isSheet(t._1)).flatMap { case (qid, qe) =>
        base.filterNot(t => isSheet(t._1))
          .map { case (id, e) => (id, refDot(qe, e)) }
          .sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
          .take(kCand).zipWithIndex
          .map { case ((id, _), i) => (qid, id) -> (i + 1) }
      }.toMap
      val expected = (lex.keySet ++ dense.keySet).groupBy(_._1).toSeq
        .flatMap { case (qid, pairs) =>
          pairs.toSeq.map { case (_, did) =>
            val lr = lex.getOrElse((qid, did), 0)
            val dr = dense.getOrElse((qid, did), 0)
            val rrf = (if (lr > 0) 1.0 / (Retrieval.RrfK + lr) else 0.0) +
              (if (dr > 0) 1.0 / (Retrieval.RrfK + dr) else 0.0)
            (did, lr, dr, rrf)
          }.sortWith((a, b) => a._4 > b._4 || (a._4 == b._4 && a._1 < b._1))
            .take(k).zipWithIndex
            .map { case ((did, lr, dr, rrf), i) =>
              (qid, did, lr, dr, round6(rrf), i + 1) }
        }.toSet
      val got = Retrieval.hybridRrfTopK(df(docs), vdf(vecs)).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
          r.getAs[Int]("lex_rank"), r.getAs[Int]("dense_rank"),
          r.getAs[Double]("rrf_score"), r.getAs[Int]("rank"))).toSet
      (got == expected) :| s"got=${got.size} expected=${expected.size}"
    }
}

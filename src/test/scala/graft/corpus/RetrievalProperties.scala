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
}

package graft.corpus

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck properties for the exact-substring span plane (x99/x100):
  * the fixture spec pins hand-computed corpora; these pin the CONTRACT
  * across random corpora against a plain-collections referee that
  * re-derives duplicated windows, maximal runs, and the length gate from
  * scratch (an independent serial implementation — the PackNextFitSpec
  * discipline). Small vocabularies force heavy cross-document window
  * collisions, so runs, splices, and gates all actually exercise. */
object ExactSubstrProperties extends Properties("exactSubstr") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session

  private case class Doc(docId: Long, text: Option[String])

  private val corpusGen: Gen[(List[Doc], Int, Int)] = for {
    n <- Gen.choose(6, 40)
    vocab <- Gen.choose(2, 6) // tiny vocabulary: collisions guaranteed
    maxLen <- Gen.choose(6, 30)
    spanTokens <- Gen.choose(2, 4)
    minExtra <- Gen.choose(0, 6)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield {
    val rnd = new scala.util.Random(seed)
    val docs = (0 until n).map { i =>
      val text =
        if (rnd.nextDouble() < 0.07) None
        else Some(Seq.fill(1 + rnd.nextInt(maxLen))(
          s"w${rnd.nextInt(vocab)}").mkString(" "))
      Doc(i.toLong, text)
    }.toList
    (docs, spanTokens, spanTokens + minExtra)
  }

  /** The referee: per doc, duplicated window starts (window string occurs
    * in >= 2 DISTINCT docs), merged into maximal consecutive runs, gated
    * on covered length — plain collections, no Spark. */
  private def referee(docs: List[Doc], w: Int, minTokens: Int)
      : Set[(Long, Long, Long, String)] = {
    val toks: Map[Long, Array[String]] = docs.collect {
      case Doc(id, Some(t)) => id -> t.split(" ", -1)
    }.toMap
    val windows: Map[Long, Seq[(Int, String)]] = toks.collect {
      case (id, ts) if ts.length >= w =>
        id -> (0 to ts.length - w).map(i => (i + 1, ts.slice(i, i + w).mkString(" ")))
    }
    val df: Map[String, Int] = windows.values.flatten.toSeq
      .groupBy(_._2).map { case (g, occ) =>
        g -> docs.collect { case Doc(id, Some(_))
          if windows.getOrElse(id, Nil).exists(_._2 == g) => id }.size
      }
    windows.flatMap { case (id, ws) =>
      val dup = ws.collect { case (p, g) if df(g) >= 2 => p }.sorted
      // islands
      val runs = dup.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if e + 1 == p => (s, p) :: rest
        case (acc, p) => (p, p) :: acc
      }
      runs.collect { case (s, e) if e - s + w >= minTokens =>
        (id, s.toLong, (e - s + w).toLong,
          toks(id).slice(s - 1, s - 1 + e - s + w).mkString(" "))
      }
    }.toSet
  }

  private def run(docs: List[Doc], w: Int, m: Int, hashGrams: Boolean)
      : Set[(Long, Long, Long, String)] = {
    val s = spark
    import s.implicits._
    TextDedup.duplicatedSpans(
        docs.map(d => (d.docId, d.text.orNull)).toDF("doc_id", "text"),
        spanTokens = w, minTokens = m, hashGrams = hashGrams)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
  }

  property("duplicatedSpans equals the plain-collections referee on random" +
      " corpora, string and hashed keys alike") =
    Prop.forAll(corpusGen) { case (docs, w, m) =>
      val want = referee(docs, w, m)
      val got = run(docs, w, m, hashGrams = false)
      val gotHashed = run(docs, w, m, hashGrams = true)
      (got == want) :| s"string path: got ${got.size}, want ${want.size}" &&
        (gotHashed == want) :| "hashed path diverged"
    }

  /** The x102 referee: even docs freeze the vocabulary, odd docs scrub —
    * matched starts (window in the vocab set) merge into maximal runs,
    * the gate keeps runs covering >= minTokens, coverage drops every token
    * under a qualifying matched window, survivors re-join in order. Plain
    * collections, no Spark — an independent serial implementation. */
  private def scrubAgainstReferee(docs: List[Doc], w: Int, minTokens: Int)
      : Set[(Long, Option[String], Option[Long], Option[Long])] = {
    val vocab: Set[String] = docs.collect {
      case Doc(id, Some(t)) if id % 2 == 0 =>
        val ts = t.split(" ", -1)
        if (ts.length >= w)
          (0 to ts.length - w).map(i => ts.slice(i, i + w).mkString(" "))
        else Seq.empty
    }.flatten.toSet
    docs.collect { case Doc(id, text) if id % 2 == 1 =>
      text match {
        case None => (id, None, None, None)
        case Some(t) =>
          val ts = t.split(" ", -1)
          val matched =
            if (ts.length >= w)
              (0 to ts.length - w).map(_ + 1)
                .filter(p => vocab(ts.slice(p - 1, p - 1 + w).mkString(" ")))
            else Seq.empty
          val runs = matched.foldLeft(List.empty[(Int, Int)]) {
            case ((s, e) :: rest, p) if e + 1 == p => (s, p) :: rest
            case (acc, p) => (p, p) :: acc
          }
          val cov = runs.filter { case (s, e) => e - s + w >= minTokens }
            .flatMap { case (s, e) =>
              matched.filter(p => p >= s && p <= e)
                .flatMap(p => p until p + w) }
            .toSet
          val kept = ts.zipWithIndex.collect {
            case (tok, i) if !cov(i + 1) => tok }
          (id, Some(kept.mkString(" ")), Some(ts.length.toLong),
            Some((ts.length - kept.length).toLong))
      }
    }.toSet
  }

  /** The x101 referee: full self-contained semantics — per-gram df and
    * canonical home (min doc_id) over per-doc-distinct windows, maximal
    * runs over ALL duplicated positions (canonical included), removal of
    * NON-canonical occurrences inside runs covering >= minTokens,
    * position-coverage scrub. Plain collections, no Spark. */
  private def scrubLongReferee(docs: List[Doc], w: Int, minTokens: Int)
      : Set[(Long, Option[String], Option[Long], Option[Long])] = {
    val windows: Map[Long, Seq[(Int, String)]] = docs.collect {
      case Doc(id, Some(t)) =>
        val ts = t.split(" ", -1)
        id -> (if (ts.length >= w)
          (0 to ts.length - w).map(i => (i + 1, ts.slice(i, i + w).mkString(" ")))
        else Seq.empty)
    }.toMap
    val byGram: Map[String, Seq[Long]] = windows.toSeq
      .flatMap { case (id, ws) => ws.map(_._2).distinct.map(g => (g, id)) }
      .groupBy(_._1).map { case (g, occ) => g -> occ.map(_._2) }
    def df(g: String) = byGram(g).size
    def minDoc(g: String) = byGram(g).min
    docs.collect { case Doc(id, text) =>
      text match {
        case None => (id, None, None, None)
        case Some(t) =>
          val ts = t.split(" ", -1)
          val ws = windows(id)
          val dup = ws.collect { case (p, g) if df(g) >= 2 => p }.sorted
          val runs = dup.foldLeft(List.empty[(Int, Int)]) {
            case ((s, e) :: rest, p) if e + 1 == p => (s, p) :: rest
            case (acc, p) => (p, p) :: acc
          }.filter { case (s, e) => e - s + w >= minTokens }
          val wsMap = ws.toMap
          val cov = runs.flatMap { case (s, e) =>
            (s to e).filter(p => dup.contains(p) && minDoc(wsMap(p)) != id)
              .flatMap(p => p until p + w)
          }.toSet
          val kept = ts.zipWithIndex.collect {
            case (tok, i) if !cov(i + 1) => tok }
          (id, Some(kept.mkString(" ")), Some(ts.length.toLong),
            Some((ts.length - kept.length).toLong))
      }
    }.toSet
  }

  property("spanScrubLong equals the full-semantics referee on random " +
      "corpora (canonical-home + run gate + coverage), hashed keys alike") =
    Prop.forAll(corpusGen) { case (docs, w, m) =>
      val s = spark
      import s.implicits._
      val df = docs.map(d => (d.docId, d.text.orNull)).toDF("doc_id", "text")
      def rows(hashGrams: Boolean) =
        TextDedup.spanScrubLong(df, spanTokens = w, minTokens = m,
            hashGrams = hashGrams)
          .collect()
          .map(r => (r.getLong(0), Option(r.getString(1)),
            Option(r.get(2)).map(_.asInstanceOf[Long]),
            Option(r.get(3)).map(_.asInstanceOf[Long])))
          .toSet
      val want = scrubLongReferee(docs, w, m)
      val got = rows(hashGrams = false)
      (got == want) :| s"string path: got ${got.size}, want ${want.size}" &&
        (rows(hashGrams = true) == want) :| "hashed path diverged"
    }

  property("spanScrubLongAgainst equals the referee on random corpora " +
      "(even = frozen reference, odd = increment), hashed keys alike") =
    Prop.forAll(corpusGen) { case (docs, w, m) =>
      val s = spark
      import s.implicits._
      val all = docs.map(d => (d.docId, d.text.orNull)).toDF("doc_id", "text")
      val ref = all.filter(org.apache.spark.sql.functions.col("doc_id")
        % 2 === 0)
      val incr = all.filter(org.apache.spark.sql.functions.col("doc_id")
        % 2 === 1)
      def rows(hashGrams: Boolean) =
        TextDedup.spanScrubLongAgainst(incr,
            TextDedup.spanVocabulary(ref, spanTokens = w,
              hashGrams = hashGrams),
            spanTokens = w, minTokens = m, hashGrams = hashGrams)
          .collect()
          .map(r => (r.getLong(0), Option(r.getString(1)),
            Option(r.get(2)).map(_.asInstanceOf[Long]),
            Option(r.get(3)).map(_.asInstanceOf[Long])))
          .toSet
      val want = scrubAgainstReferee(docs, w, m)
      val got = rows(hashGrams = false)
      (got == want) :| s"string path: got ${got.size}, want ${want.size}" &&
        (rows(hashGrams = true) == want) :| "hashed path diverged"
    }
}

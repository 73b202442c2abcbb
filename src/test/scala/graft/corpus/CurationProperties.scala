package graft.corpus

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck properties for the output/verify plane (x79/x80) — the fixture
  * specs pin one hand-computed corpus each; these pin the CONTRACTS across
  * random corpora against plain-collections referees:
  *
  *  - [[Curation.assignShards]] must reproduce the referee's per-source
  *    (tokens desc NULLS LAST, doc_id) snake deal EXACTLY, assign every
  *    document, and deal per-source shard CARDINALITIES within 1 of each
  *    other (the round-robin guarantee the balance claim rests on);
  *  - [[TextDedup.editVerify]] must emit exactly one row per candidate
  *    pair, with `lev` equal to the referee's Levenshtein DP and `is_dup`
  *    the integer comparison `lev · EditDupDen ≤ max_len`; NULL-text pairs
  *    yield NULL verdicts (the unresolvable-id loud gate is pinned in
  *    CorpusSpec).
  *
  * Sample count is bounded (each trial runs several small Spark jobs). */
object CurationProperties extends Properties("outputPlane") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session

  private case class Doc(docId: Long, text: Option[String], source: String)

  private val corpusGen: Gen[List[Doc]] = for {
    n <- Gen.choose(10, 120)
    sources <- Gen.choose(1, 5)
    vocab <- Gen.choose(2, 12)
    maxLen <- Gen.choose(1, 25)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val text =
        if (rnd.nextDouble() < 0.05) None
        else if (rnd.nextDouble() < 0.05) Some("")
        else Some(Seq.fill(1 + rnd.nextInt(maxLen))(
          s"w${rnd.nextInt(vocab)}").mkString(" "))
      Doc(i.toLong, text, s"src${rnd.nextInt(sources)}")
    }.toList
  }

  private def df(docs: List[Doc]) = {
    val s = spark
    import s.implicits._
    docs.map(d => (d.docId, d.text.orNull, d.source))
      .toDF("doc_id", "text", "source")
  }

  /** Spark `split(text, " ")` semantics: limit −1, trailing empties kept. */
  private def refTokens(text: Option[String]): Option[Long] =
    text.map(_.split(" ", -1).length.toLong)

  private def snake(r: Long, k: Int): Long =
    if ((r / k) % 2 == 0) r % k else (k - 1) - r % k

  property("assignShards matches the referee snake deal on random corpora") =
    Prop.forAll(corpusGen, Gen.choose(1, 6)) { (docs, shards) =>
      val expected = docs.groupBy(_.source).flatMap { case (_, ds) =>
        val ranked = ds.sortBy(d =>
          // tokens desc with NULLS LAST, doc_id asc
          (refTokens(d.text).map(-_).getOrElse(Long.MaxValue), d.docId))
        ranked.zipWithIndex.map { case (d, r) =>
          d.docId -> ((refTokens(d.text), snake(r.toLong, shards)))
        }
      }
      val got = Curation.assignShards(df(docs), shards).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((Option(r.get(r.fieldIndex("n_tokens"))).map(_.asInstanceOf[Long]),
            r.getAs[Long]("shard")))).toMap
      val cardsOk = docs.groupBy(_.source).forall { case (src, ds) =>
        val counts = ds.map(d => got(d.docId)._2)
          .groupBy(identity).view.mapValues(_.size).toMap
        val per = (0L until shards.toLong).map(s => counts.getOrElse(s, 0))
        per.max - per.min <= 1
      }
      (got == expected) :| s"assignment drift: got=$got expected=$expected" &&
        cardsOk :| "per-source shard cardinalities differ by more than 1"
    }

  private def refLev(a: String, b: String): Long = {
    val (n, m) = (a.length, b.length)
    val prev = Array.tabulate(m + 1)(_.toLong)
    val cur = new Array[Long](m + 1)
    for (i <- 1 to n) {
      cur(0) = i.toLong
      for (j <- 1 to m) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      Array.copy(cur, 0, prev, 0, m + 1)
    }
    prev(m)
  }

  property("editVerify matches the referee DP verdicts on random candidates") =
    Prop.forAll(corpusGen, Gen.choose(0L, Long.MaxValue)) { (docs, seed) =>
      val rnd = new scala.util.Random(seed)
      // random candidate pairs over resolvable ids (NULL-text ids included;
      // ABSENT ids are the loud-gate path, pinned in CorpusSpec)
      val ids = docs.map(_.docId)
      val cand = (0 until math.min(40, ids.size * 2)).map { _ =>
        val a = ids(rnd.nextInt(ids.size))
        val b = ids(rnd.nextInt(ids.size))
        (math.min(a, b), math.max(a, b), rnd.nextInt(4))
      }.groupBy(c => (c._1, c._2)).values.map(_.head).toList // one per pair
      val s = spark
      import s.implicits._
      val candDf = cand.toDF("doc_id_1", "doc_id_2", "hamming")
      val texts = docs.map(d => d.docId -> d.text).toMap
      val expected = cand.map { case (a, b, h) =>
        (a, b) -> ((h, (texts(a), texts(b)) match {
          case (Some(ta), Some(tb)) =>
            val lev = refLev(ta, tb)
            val maxLen = math.max(ta.length, tb.length).toLong
            (Some(maxLen), Some(lev),
              Some(lev * TextDedup.EditDupDen <= maxLen))
          case (ta, tb) => // a NULL text: lev and is_dup are NULL
            (ta.orElse(tb).map(_.length.toLong), None, None)
        }))
      }.toMap
      val got = TextDedup.editVerify(candDf, df(docs)).collect()
        .map { r =>
          def opt[T](n: String): Option[T] =
            Option(r.get(r.fieldIndex(n))).map(_.asInstanceOf[T])
          (r.getAs[Long]("doc_id_1"), r.getAs[Long]("doc_id_2")) ->
            ((r.getAs[Int]("hamming"), (opt[Long]("max_len"),
              opt[Long]("lev"), opt[Boolean]("is_dup"))))
        }.toMap
      (got == expected) :| s"verdict drift: got=$got expected=$expected"
    }

  property("editVerifyBanded agrees with the exact kernel: is_dup identical, lev exact on dups, NULL on refuted") =
    Prop.forAll(corpusGen, Gen.choose(0L, Long.MaxValue),
        Gen.oneOf(0, 0, 6)) { (docs, seed, capChars) =>
      val rnd = new scala.util.Random(seed)
      val ids = docs.map(_.docId)
      val cand = (0 until math.min(40, ids.size * 2)).map { _ =>
        val a = ids(rnd.nextInt(ids.size))
        val b = ids(rnd.nextInt(ids.size))
        (math.min(a, b), math.max(a, b), rnd.nextInt(4))
      }.groupBy(c => (c._1, c._2)).values.map(_.head).toList
      val s = spark
      import s.implicits._
      val candDf = cand.toDF("doc_id_1", "doc_id_2", "hamming")
      def cap(t: String) = if (capChars > 0) t.take(capChars) else t
      val texts = docs.map(d => d.docId -> d.text.map(cap)).toMap
      val expected = cand.map { case (a, b, h) =>
        (a, b) -> ((h, (texts(a), texts(b)) match {
          case (Some(ta), Some(tb)) =>
            val lev = refLev(ta, tb)
            val maxLen = math.max(ta.length, tb.length).toLong
            val dup = lev * TextDedup.EditDupDen <= maxLen
            // the banded contract: lev materializes exactly on dups, the
            // band refutes non-dups without a distance
            (Some(maxLen), if (dup) Some(lev) else None, Some(dup))
          case (ta, tb) =>
            (ta.orElse(tb).map(_.length.toLong), None, None)
        }))
      }.toMap
      val got = TextDedup.editVerifyBanded(candDf, df(docs), capChars)
        .collect()
        .map { r =>
          def opt[T](n: String): Option[T] =
            Option(r.get(r.fieldIndex(n))).map(_.asInstanceOf[T])
          (r.getAs[Long]("doc_id_1"), r.getAs[Long]("doc_id_2")) ->
            ((r.getAs[Int]("hamming"), (opt[Long]("max_len"),
              opt[Long]("lev"), opt[Boolean]("is_dup"))))
        }.toMap
      (got == expected) :| s"banded drift (cap=$capChars): got=$got expected=$expected"
    }
}

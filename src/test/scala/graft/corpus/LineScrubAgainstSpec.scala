package graft.corpus

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** x109 — [[TextDedup.lineScrubAgainst]] / [[TextDedup.lineVocabulary]]:
  * the incremental twin of x58's line-level boilerplate scrub. Pins: the
  * vocabulary's minDf−1 floor (the exact decomposition threshold), blank
  * exemption, pure-boilerplate rebuild, hashKeys parity + the loud mode
  * gate, a persisted bucketed vocabulary probe, a plain-collections
  * referee over a random corpus, and the x84-style decomposition — the
  * against form removes a SUBSET of self-contained [[TextDedup.lineScrub]]
  * over reference ∪ increment always, and EQUALS it when no sub-floor
  * non-blank line is shared by two distinct increment documents. */
class LineScrubAgainstSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def collect3(df: DataFrame) = df.collect()
    .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
    .toMap

  test("vocabulary floor is minDf - 1: a line ANY increment occurrence " +
      "would push past the self-contained threshold is in; one below isn't") {
    import spark.implicits._
    // minDf = 2 (default): ref df 1 qualifies (1 + the arriving copy = 2),
    // ref df 0 (a line the reference never saw) cannot
    val ref = Seq((100L, "BOILER\nref only"), (101L, "other ref")).toDF(
      "doc_id", "text")
    val inc = Seq((1L, "BOILER\nfresh text"), (2L, "fresh text\nnever seen"))
      .toDF("doc_id", "text")
    val got = collect3(TextDedup.lineScrubAgainst(
      inc, TextDedup.lineVocabulary(ref)))
    got(1L) shouldBe ((2L, 1L, "fresh text"))
    // "fresh text" is shared by TWO increment docs but no reference doc:
    // increment-internal repetition is the NEXT snapshot's problem
    got(2L) shouldBe ((2L, 0L, "fresh text\nnever seen"))
  }

  test("blank lines are exempt, pure-boilerplate docs rebuild to empty " +
      "text (never dropped), and the vocabulary never carries blanks") {
    import spark.implicits._
    val ref = Seq((100L, "SPAM\n\nfoo"), (101L, "SPAM\n \nbar")).toDF(
      "doc_id", "text")
    val vocab = TextDedup.lineVocabulary(ref)
    vocab.collect().map(_.getString(0)).toSet shouldBe Set("SPAM", "foo",
      "bar")
    val inc = Seq((1L, "SPAM\n\nmine"), (2L, "SPAM\nfoo")).toDF(
      "doc_id", "text")
    val got = collect3(TextDedup.lineScrubAgainst(inc, vocab))
    got(1L) shouldBe ((3L, 1L, "\nmine"))
    got(2L) shouldBe ((2L, 2L, ""))
  }

  test("hashKeys parity and the loud vocabulary-mode gate") {
    import spark.implicits._
    val ref = Seq((100L, "HEAD\na b"), (101L, "HEAD\nc d")).toDF(
      "doc_id", "text")
    val inc = Seq((1L, "HEAD\nx y"), (2L, "a b\nz")).toDF("doc_id", "text")
    val strKeyed = collect3(TextDedup.lineScrubAgainst(
      inc, TextDedup.lineVocabulary(ref)))
    collect3(TextDedup.lineScrubAgainst(
      inc, TextDedup.lineVocabulary(ref, hashKeys = true),
      hashKeys = true)) shouldBe strKeyed
    an[IllegalArgumentException] should be thrownBy
      TextDedup.lineScrubAgainst(
        inc, TextDedup.lineVocabulary(ref, hashKeys = true))
  }

  test("a persisted bucketed line vocabulary probes in place") {
    import spark.implicits._
    val ref = Seq((100L, "TPL\nref a"), (101L, "TPL\nref b")).toDF(
      "doc_id", "text")
    try {
      TextDedup.writeVocabulary(
        TextDedup.lineVocabulary(ref, hashKeys = true), "line_vocab_spec",
        buckets = 4)
      val inc = Seq((1L, "TPL\nnew stuff")).toDF("doc_id", "text")
      collect3(TextDedup.lineScrubAgainst(
        inc, spark.table("line_vocab_spec"), hashKeys = true))(1L) shouldBe
        ((2L, 1L, "new stuff"))
    } finally spark.sql("DROP TABLE IF EXISTS line_vocab_spec")
  }

  test("referee on a random multi-line corpus, plus the decomposition: " +
      "against ⊆ self-contained on the union always, equal when no " +
      "sub-floor line is shared within the increment") {
    import spark.implicits._
    val minDf = TextDedup.LineScrubMinDf
    val rnd = new scala.util.Random(97)
    // tiny line vocabulary => heavy cross-document collisions. Reference
    // docs draw lines from w0..w5, increment docs from w2..w7: w2..w5
    // collide across the split (vocabulary hits), w6/w7 are shared ONLY
    // within the increment (vocabulary misses with incr df >= 2) — so the
    // decomposition's equality condition genuinely fails for some docs and
    // both branches below are exercised non-vacuously. Blanks ride along.
    def line(offset: Int): String = rnd.nextInt(8) match {
      case 6 => ""
      case 7 => " "
      case _ => s"w${offset + rnd.nextInt(6)}"
    }
    val rows = (0L until 60L).map { i =>
      val off = if (i % 2 == 0) 0 else 2
      (i, Seq.fill(1 + rnd.nextInt(6))(line(off)).mkString("\n"))
    }
    val ref = rows.filter(_._1 % 2 == 0)
    val inc = rows.filter(_._1 % 2 == 1)
    val got = collect3(TextDedup.lineScrubAgainst(
      inc.toDF("doc_id", "text"), TextDedup.lineVocabulary(
        ref.toDF("doc_id", "text"))))

    // plain-collections referee for the against form
    val refDf = ref.flatMap { case (id, t) =>
      t.split("\n", -1).filter(_.trim.nonEmpty).distinct.map((id, _))
    }.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size).toMap
    val vocab = refDf.collect {
      case (l, df) if df >= minDf - 1 => l
    }.toSet
    val want = inc.map { case (id, t) =>
      val ls = t.split("\n", -1)
      def gone(l: String) = l.trim.nonEmpty && vocab(l)
      id -> ((ls.length.toLong, ls.count(gone).toLong,
        ls.filterNot(gone).mkString("\n")))
    }.toMap
    got shouldBe want
    got.values.map(_._2).sum should be > 0L // scrubbing actually happened

    // decomposition vs the SELF-CONTAINED form over reference ∪ increment
    val selfGot = collect3(TextDedup.lineScrub(rows.toDF("doc_id", "text")))
    val incDf = inc.flatMap { case (id, t) =>
      t.split("\n", -1).filter(_.trim.nonEmpty).distinct.map((id, _))
    }.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size).toMap
    var equalDocs = 0
    var strictSubsetDocs = 0
    inc.foreach { case (id, t) =>
      val (nl, nr, tx) = got(id)
      val (snl, snr, stx) = selfGot(id)
      nl shouldBe snl
      nr should be <= snr // against never removes what the union wouldn't
      // equality holds exactly when no line of THIS doc is union-removable
      // solely through increment-internal sharing
      val internalOnly = t.split("\n", -1).exists { l =>
        l.trim.nonEmpty && !vocab(l) &&
          refDf.getOrElse(l, 0) + incDf.getOrElse(l, 0) >= minDf
      }
      if (!internalOnly) {
        (nr, tx) shouldBe ((snr, stx))
        equalDocs += 1
      } else strictSubsetDocs += 1
    }
    equalDocs should be > 0
    strictSubsetDocs should be > 0 // both branches exercised
  }
}

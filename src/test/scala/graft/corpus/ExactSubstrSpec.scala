package graft.corpus

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** X99 — exact-substring duplicate spans ([[TextDedup.duplicatedSpans]]):
  * maximal cross-document duplicated-window runs at ExactSubstr length
  * (Lee et al. 2022). Pins the run merge, the length gate, the
  * within-doc-repetition exclusion, the documented splice over-extension
  * (no false negatives, possible chain), and the hashGrams twin. */
class ExactSubstrSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def spans(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3))).toSet

  test("a shared verbatim span is reported ONCE per document as one " +
      "maximal run, both copies, with exact bounds and text") {
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val d = docs(
      1L -> s"a1 a2 a3 $shared z1 z2",
      2L -> s"b1 $shared y1 y2 y3 y4")
    val got = spans(TextDedup.duplicatedSpans(d, spanTokens = 5,
      minTokens = 10))
    got shouldBe Set(
      (1L, 4L, 12L, shared),
      (2L, 2L, 12L, shared))
    // the length gate: one token above the span kills both rows
    TextDedup.duplicatedSpans(d, spanTokens = 5, minTokens = 13)
      .count() shouldBe 0L
  }

  test("within-document repetition does not count (x37's df definition) " +
      "and sub-window overlap stays silent") {
    val rep = (1 to 10).map(i => s"r$i").mkString(" ")
    val d = docs(
      1L -> s"$rep mid1 mid2 $rep", // same doc twice: df = 1
      2L -> "other text entirely here now always")
    TextDedup.duplicatedSpans(d, spanTokens = 5, minTokens = 5)
      .count() shouldBe 0L
  }

  test("chained windows splice: two different partners extend one " +
      "maximal span (the documented over-extension, never a miss)") {
    // doc 1 holds A(8) ++ B(8); doc 2 shares doc 1's tokens 1..10 and
    // doc 3 its tokens 5..16 — the two shared regions OVERLAP, so every
    // 4-window of doc 1 is duplicated against SOME partner and doc 1
    // reports the full 16-token chain even though no single document
    // contains it — the splice the scaladoc documents
    val a = (1 to 8).map(i => s"a$i").mkString(" ")
    val b = (1 to 8).map(i => s"b$i").mkString(" ")
    val d = docs(1L -> s"$a $b",
      2L -> s"x1 x2 $a b1 b2",
      3L -> s"a5 a6 a7 a8 $b y1 y2")
    val got = spans(TextDedup.duplicatedSpans(d, spanTokens = 4,
      minTokens = 13))
    got.filter(_._1 == 1L) shouldBe Set((1L, 1L, 16L, s"$a $b"))
    // and no true copy is ever missed: each partner's own shared region
    // (10 and 12 tokens) reports at its own length
    val all = spans(TextDedup.duplicatedSpans(d, spanTokens = 4,
      minTokens = 10))
    all should contain ((2L, 3L, 10L, s"$a b1 b2"))
    all should contain ((3L, 1L, 12L, s"a5 a6 a7 a8 $b"))
  }

  test("two separated duplicated regions in one document stay two runs") {
    val p = (1 to 6).map(i => s"p$i").mkString(" ")
    val q = (1 to 6).map(i => s"q$i").mkString(" ")
    val d = docs(
      1L -> s"$p u1 u2 u3 u4 u5 $q",
      2L -> s"$p w1 w2 w3 w4 w5 $q")
    val got = spans(TextDedup.duplicatedSpans(d, spanTokens = 3,
      minTokens = 6))
    got.filter(_._1 == 1L).map(s => (s._2, s._3)) shouldBe
      Set((1L, 6L), (12L, 6L))
    got.filter(_._1 == 1L).map(_._4) shouldBe Set(p, q)
  }

  test("hashGrams keys the shuffles on xxhash64 but reports identical " +
      "spans; NULL/short docs are absent; minTokens below the window " +
      "is rejected") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(41L)
    val base = (0L until 40L).map { i =>
      val t =
        if (i % 7 == 3) null
        else if (i % 11 == 5) "tiny doc"
        else (0 until (6 + rnd.nextInt(30)))
          .map(_ => s"w${rnd.nextInt(12)}").mkString(" ")
      (i, t)
    }.toDF("doc_id", "text")
    val want = spans(TextDedup.duplicatedSpans(base, spanTokens = 4,
      minTokens = 6))
    spans(TextDedup.duplicatedSpans(base, spanTokens = 4, minTokens = 6,
      hashGrams = true)) shouldBe want
    // no NULL-text (id % 7 == 3) or shorter-than-window (id % 11 == 5)
    // document ever reports a span
    want.map(_._1).foreach { id =>
      id % 7 should not be 3
      id % 11 should not be 5
    }
    an[IllegalArgumentException] should be thrownBy
      TextDedup.duplicatedSpans(base, spanTokens = 5, minTokens = 4)
  }

  test("duplicatedSpansAgainst decomposes: when the increment shares spans " +
      "only with the reference, it equals the self-contained run on the " +
      "union restricted to increment rows") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(43L)
    // reference (even ids): random docs; increment (odd ids): half embed a
    // verbatim slice of SOME reference doc, half are fresh vocabulary (no
    // increment-internal cross-doc duplication by construction: fresh
    // halves draw from disjoint per-doc vocabularies)
    val ref = (0L until 30L by 2L).map(i =>
      (i, (0 until 20).map(_ => s"r${rnd.nextInt(15)}").mkString(" ")))
    val refTexts = ref.map(_._2).toIndexedSeq
    val incr = (1L until 30L by 2L).map { i =>
      val t =
        if (i % 4 == 1) {
          val src = refTexts((i % refTexts.size.toLong).toInt)
          s"n${i}a n${i}b $src n${i}z"
        } else (0 until 15).map(j => s"u${i}_$j").mkString(" ")
      (i, t)
    }
    val all = (ref ++ incr).toDF("doc_id", "text")
    val incrDf = all.filter(col("doc_id") % 2 === 1)
    val vocab = TextDedup.spanVocabulary(
      all.filter(col("doc_id") % 2 === 0), spanTokens = 4)
    val got = spans(TextDedup.duplicatedSpansAgainst(incrDf, vocab,
      spanTokens = 4, minTokens = 8))
    val want = spans(TextDedup.duplicatedSpans(all, spanTokens = 4,
      minTokens = 8)).filter(_._1 % 2 == 1)
    got shouldBe want
    got should not be empty
    // hashGrams must match the vocabulary's build mode (loud), and the
    // hashed pair reports identically
    an[IllegalArgumentException] should be thrownBy
      TextDedup.duplicatedSpansAgainst(incrDf, vocab, spanTokens = 4,
        minTokens = 8, hashGrams = true)
    spans(TextDedup.duplicatedSpansAgainst(incrDf,
      TextDedup.spanVocabulary(all.filter(col("doc_id") % 2 === 0),
        spanTokens = 4, hashGrams = true),
      spanTokens = 4, minTokens = 8, hashGrams = true)) shouldBe want
  }

  test("spanScrubLong removes only qualifying-run occurrences outside the " +
      "canonical doc; short incidental overlaps survive BOTH copies") {
    val s = spark
    import s.implicits._
    val long = (1 to 12).map(i => s"L$i").mkString(" ")
    val short = (1 to 6).map(i => s"S$i").mkString(" ")
    val d = Seq(
      (1L, s"$long a1 $short"),     // canonical home of both (min doc_id)
      (2L, s"b1 b2 $long b3"),      // long dup: scrubbed here
      (3L, s"c1 $short c2 c3 c4"))  // short dup: BELOW the gate, survives
      .toDF("doc_id", "text")
    val out = TextDedup.spanScrubLong(d, spanTokens = 5, minTokens = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    out(1L) shouldBe ((s"$long a1 $short", 19L, 0L)) // canonical intact
    out(2L) shouldBe (("b1 b2 b3", 15L, 12L))        // long span removed
    out(3L) shouldBe ((s"c1 $short c2 c3 c4", 10L, 0L)) // short dup kept
    // x83 by contrast would have scrubbed the short dup too
    val x83 = TextDedup.spanScrub(d, spanTokens = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    x83(3L) shouldBe "c1 c2 c3 c4"
  }

  test("spanScrubLong at minTokens = spanTokens IS spanScrub (the " +
      "degenerate pin that keeps the two scrub tiers one definition apart)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(47L)
    val d = (0L until 60L).map { i =>
      val t =
        if (i % 9 == 4) null
        else (0 until (1 + rnd.nextInt(25)))
          .map(_ => s"w${rnd.nextInt(10)}").mkString(" ")
      (i, t)
    }.toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)), Option(r.get(3)))).toSet
    rows(TextDedup.spanScrubLong(d, spanTokens = 4, minTokens = 4)) shouldBe
      rows(TextDedup.spanScrub(d, spanTokens = 4))
    // and the hashed twin agrees with the string path
    rows(TextDedup.spanScrubLong(d, spanTokens = 4, minTokens = 7,
      hashGrams = true)) shouldBe
      rows(TextDedup.spanScrubLong(d, spanTokens = 4, minTokens = 7))
    an[IllegalArgumentException] should be thrownBy
      TextDedup.spanScrubLong(d, spanTokens = 5, minTokens = 4)
  }

  test("duplicatedSpansAgainst leaves increment-internal duplication to " +
      "the next snapshot (the x84 role split)") {
    val s = spark
    import s.implicits._
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val ref = Seq((0L, "completely different reference words here entirely"))
    val incr = Seq((1L, shared), (3L, s"pre1 pre2 $shared"))
    val vocab = TextDedup.spanVocabulary(ref.toDF("doc_id", "text"),
      spanTokens = 4)
    TextDedup.duplicatedSpansAgainst(incr.toDF("doc_id", "text"), vocab,
      spanTokens = 4, minTokens = 8).count() shouldBe 0L
  }

  private def scrubRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), Option(r.getString(1)),
      Option(r.get(2)), Option(r.get(3)))).toSet

  test("spanScrubLongAgainst removes only qualifying matched runs, leaves " +
      "short vocabulary hits AND increment-internal duplication untouched") {
    val s = spark
    import s.implicits._
    val long = (1 to 12).map(i => s"L$i").mkString(" ")
    val short = (1 to 6).map(i => s"S$i").mkString(" ")
    val innerDup = (1 to 11).map(i => s"D$i").mkString(" ")
    val ref = Seq((0L, s"$long r1 r2 $short")).toDF("doc_id", "text")
    val incr = Seq(
      (101L, s"a1 a2 $long a3"),          // long ref hit: scrubbed
      (102L, s"b1 $short b2 b3"),         // short ref hit: below gate, kept
      (103L, innerDup),                   // incr-internal dup: untouched
      (104L, s"c1 c2 $innerDup c3"))
      .toDF("doc_id", "text")
    val vocab = TextDedup.spanVocabulary(ref, spanTokens = 5)
    val out = TextDedup.spanScrubLongAgainst(incr, vocab, spanTokens = 5,
      minTokens = 10).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    out(101L) shouldBe (("a1 a2 a3", 15L, 12L))
    out(102L) shouldBe ((s"b1 $short b2 b3", 9L, 0L))
    out(103L) shouldBe ((innerDup, 11L, 0L))
    out(104L) shouldBe ((s"c1 c2 $innerDup c3", 14L, 0L))
    // x84 by contrast scrubs the short hit too — the gate is the tier
    val x84 = TextDedup.spanScrubAgainst(incr, vocab, spanTokens = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    x84(102L) shouldBe "b1 b2 b3"
  }

  test("spanScrubLongAgainst at minTokens = spanTokens IS spanScrubAgainst " +
      "(degenerate pin), decomposes to spanScrubLong on the union when the " +
      "reference precedes and holds every shared span, and loud-fails a " +
      "vocab-mode mismatch") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(53L)
    // reference ids 0..28: random small-vocab docs; increment ids 101..129:
    // half embed a verbatim reference slice, half draw fresh per-doc
    // vocabulary (no increment-internal cross-doc duplication, and every
    // reference id precedes every increment id — the decomposition pin's
    // precondition)
    val ref = (0L until 30L by 2L).map(i =>
      (i, (0 until 20).map(_ => s"r${rnd.nextInt(12)}").mkString(" ")))
    val refTexts = ref.map(_._2).toIndexedSeq
    val incr = (101L until 130L by 2L).map { i =>
      val t =
        if (i % 4 == 1) {
          val src = refTexts((i % refTexts.size.toLong).toInt)
          s"n${i}a n${i}b $src n${i}z"
        } else if (i % 8 == 7) null
        else (0 until 15).map(j => s"u${i}_$j").mkString(" ")
      (i, t)
    }
    val all = (ref ++ incr).toDF("doc_id", "text")
    val refDf = all.filter(col("doc_id") < 100L)
    val incrDf = all.filter(col("doc_id") >= 100L)
    val vocab = TextDedup.spanVocabulary(refDf, spanTokens = 4)
    // degenerate pin
    scrubRows(TextDedup.spanScrubLongAgainst(incrDf, vocab, spanTokens = 4,
      minTokens = 4)) shouldBe
      scrubRows(TextDedup.spanScrubAgainst(incrDf, vocab, spanTokens = 4))
    // decomposition pin
    val got = scrubRows(TextDedup.spanScrubLongAgainst(incrDf, vocab,
      spanTokens = 4, minTokens = 8))
    got shouldBe scrubRows(TextDedup.spanScrubLong(all, spanTokens = 4,
      minTokens = 8).filter(col("doc_id") >= 100L))
    got.exists(_._4.exists(_.asInstanceOf[Long] > 0L)) shouldBe true
    // hashed twin agrees; mode mismatch is loud at construction
    scrubRows(TextDedup.spanScrubLongAgainst(incrDf,
      TextDedup.spanVocabulary(refDf, spanTokens = 4, hashGrams = true),
      spanTokens = 4, minTokens = 8, hashGrams = true)) shouldBe got
    an[IllegalArgumentException] should be thrownBy
      TextDedup.spanScrubLongAgainst(incrDf, vocab, spanTokens = 4,
        minTokens = 8, hashGrams = true)
    an[IllegalArgumentException] should be thrownBy
      TextDedup.spanScrubLongAgainst(incrDf, vocab, spanTokens = 4,
        minTokens = 3)
  }

  test("the retired x101 join referee is value-equal to spanScrubLong " +
      "(the ladder pair differs only in plan, never in answer)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(59L)
    val d = (0L until 50L).map { i =>
      val t =
        if (i % 9 == 4) null
        else (0 until (1 + rnd.nextInt(30)))
          .map(_ => s"w${rnd.nextInt(8)}").mkString(" ")
      (i, t)
    }.toDF("doc_id", "text")
    scrubRows(TextDedup.spanScrubLongJoinReferee(d, spanTokens = 4,
      minTokens = 8)) shouldBe
      scrubRows(TextDedup.spanScrubLong(d, spanTokens = 4, minTokens = 8))
  }

  test("decontaminationSpansBloom is bit-identical to decontaminationSpans " +
      "(the bloom changes the plan, never the answer) and an empty " +
      "benchmark vocabulary gates everything instead of erroring") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(61L)
    val leak = (1 to 15).map(i => s"q$i").mkString(" ")
    val d = (0L until 120L).map { i =>
      val t =
        if (i % 50 == 0) s"bench head $leak bench tail ${i}"
        else if (i % 7 == 3) s"train a$i b$i $leak c$i"
        else if (i % 9 == 4) null
        else (0 until (3 + rnd.nextInt(20)))
          .map(_ => s"w${rnd.nextInt(9)}").mkString(" ")
      (i, t)
    }.toDF("doc_id", "text")
    spans(TextDedup.decontaminationSpansBloom(d)) shouldBe
      spans(TextDedup.decontaminationSpans(d))
    spans(TextDedup.decontaminationSpansBloom(d)) should not be empty
    // bench slice present but span-less: the bloom must be a real
    // zero-item filter (gates everything), not a NULL that drops the run
    val tiny = Seq((0L, "short bench"), (1L, s"doc with $leak inside"))
      .toDF("doc_id", "text")
    TextDedup.decontaminationSpansBloom(tiny).count() shouldBe 0L
    TextDedup.decontaminationSpans(tiny).count() shouldBe 0L
  }

  test("decontaminationSpans reports WHAT leaked: the verbatim >= 13-token " +
      "benchmark overlap with its text; benchmark rows and clean docs are " +
      "absent") {
    val s = spark
    import s.implicits._
    val leak = (1 to 15).map(i => s"q$i").mkString(" ")
    val d = Seq(
      (0L, s"bench intro $leak bench outro"),          // benchmark (0 % 50)
      (1L, s"train a1 a2 $leak tail1 tail2"),          // leaks 15 tokens
      (2L, "clean training text with no overlap at all here whatsoever"),
      (50L, s"another bench row $leak"),               // benchmark too
      (3L, s"short s1 ${(1 to 8).map(i => s"q$i").mkString(" ")} s2"))
      .toDF("doc_id", "text")                          // 8 < 13: below gate
    val got = spans(TextDedup.decontaminationSpans(d))
    got shouldBe Set((1L, 4L, 15L, leak))
    // and it IS the documented composition (vocabulary -> against screen)
    got shouldBe spans(TextDedup.duplicatedSpansAgainst(
      d.filter(col("doc_id") % 50 =!= 0),
      TextDedup.spanVocabulary(d.filter(col("doc_id") % 50 === 0)),
      minTokens = TextDedup.DecontamMinTokens))
  }
}

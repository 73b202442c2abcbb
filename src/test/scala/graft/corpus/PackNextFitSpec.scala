package graft.corpus

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** X97 — boundary-respecting next-fit packing. The DuckDB oracle replays
  * the chain recursively; these pin the semantics against a plain-Scala
  * sequential next-fit (the definitionally-serial referee the distributed
  * doubling must reproduce EXACTLY), the no-split invariant, oversize
  * singletons, NULL-text riders, and the x31 contrast. */
class PackNextFitSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def df(rows: Seq[(Long, Option[String], String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "source")
  }
  private def words(n: Int): String = Seq.fill(n)("w").mkString(" ")

  /** The sequential referee: per source in doc_id order, fill greedily,
    * break when the document would overflow; oversize docs are their own
    * bins. Returns (doc_id -> (seq, offset, oversize)). */
  private def referee(rows: Seq[(Long, Option[String], String)], budget: Int)
      : Map[Long, (Long, Long, Boolean)] =
    rows.filter(_._2.isDefined).groupBy(_._3).flatMap { case (_, ds) =>
      var seq = -1L; var fill = budget.toLong + 1 // force a first break
      ds.sortBy(_._1).map { case (id, text, _) =>
        val n = text.get.split(" ", -1).length.toLong
        if (fill + n > budget) { seq += 1; fill = 0 }
        val r = id -> ((seq, fill, n > budget))
        fill += n
        r
      }
    }

  private def collectPacked(out: DataFrame): Map[Long, (Long, Long, Boolean)] =
    out.filter("seq_id IS NOT NULL").collect().map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Long]("seq_id"),
        r.getAs[Long]("offset"), r.getAs[Boolean]("oversize")))).toMap

  test("hand fixture: fits pack tight, a non-fitting doc opens a new " +
      "sequence, and no document ever splits") {
    val rows = Seq[(Long, Option[String], String)](
      (1L, Some(words(3)), "a"), (2L, Some(words(2)), "a"),
      (3L, Some(words(4)), "a"), (4L, Some(words(1)), "a"),
      (10L, Some(words(5)), "b"))
    val got = collectPacked(Curation.packNextFit(df(rows), budget = 5))
    got(1L) shouldBe ((0L, 0L, false))
    got(2L) shouldBe ((0L, 3L, false)) // 3 + 2 = 5 fits exactly
    got(3L) shouldBe ((1L, 0L, false)) // would overflow -> new sequence
    got(4L) shouldBe ((1L, 4L, false))
    got(10L) shouldBe ((0L, 0L, false)) // sources pack independently
  }

  test("oversize documents are flagged singletons and the chain continues") {
    val rows = Seq[(Long, Option[String], String)](
      (1L, Some(words(2)), "a"),
      (2L, Some(words(9)), "a"), // > budget: its own sequence
      (3L, Some(words(2)), "a"),
      (4L, Some(words(3)), "a"))
    val got = collectPacked(Curation.packNextFit(df(rows), budget = 5))
    got(1L) shouldBe ((0L, 0L, false))
    got(2L) shouldBe ((1L, 0L, true))
    got(3L) shouldBe ((2L, 0L, false))
    got(4L) shouldBe ((2L, 2L, false))
  }

  test("NULL-text documents ride with NULL packing columns") {
    val rows = Seq[(Long, Option[String], String)](
      (1L, Some(words(2)), "a"), (2L, None, "a"), (3L, Some(words(2)), "a"))
    val out = Curation.packNextFit(df(rows), budget = 5).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    out(2L).isNullAt(out(2L).fieldIndex("seq_id")) shouldBe true
    out(2L).isNullAt(out(2L).fieldIndex("oversize")) shouldBe true
    // the chain skips the NULL row: 2 + 2 fits one sequence
    (out(1L).getAs[Long]("seq_id"), out(3L).getAs[Long]("seq_id")) shouldBe
      ((0L, 0L))
    out(3L).getAs[Long]("offset") shouldBe 2L
  }

  test("matches the sequential referee exactly on random multi-source " +
      "corpora with oversize mixed in") {
    val rnd = new scala.util.Random(43L)
    for (trial <- 0 until 3) {
      val budget = 8 + rnd.nextInt(24)
      val rows: Seq[(Long, Option[String], String)] =
        (0L until 120L).map { i =>
          val n = 1 + rnd.nextInt(if (rnd.nextInt(12) == 0) 3 * budget
            else budget)
          (i, Some(words(n)), s"s${rnd.nextInt(4)}")
        }
      val got = collectPacked(Curation.packNextFit(df(rows), budget))
      val want = referee(rows, budget)
      withClue(s"trial=$trial budget=$budget: ") { got shouldBe want }
      // the guarantee itself: no non-oversize doc crosses the budget
      Curation.packNextFit(df(rows), budget)
        .filter("NOT oversize AND offset + n_tokens > " + budget)
        .count() shouldBe 0L
    }
  }

  test("contrast with x31: the boundary-crossers x95 counts vanish") {
    val rnd = new scala.util.Random(7L)
    val rows: Seq[(Long, Option[String], String)] = (0L until 60L).map(i =>
      (i, Some(words(1 + rnd.nextInt(20))), s"s${i % 2}"))
    val d = df(rows)
    val splitsX31 = Curation.packSequences(d, budget = 16)
      .filter("offset + n_tokens > 16").count()
    splitsX31 should be > 0L // the fixture genuinely crosses boundaries
    Curation.packNextFit(d, budget = 16)
      .filter("NOT oversize AND offset + n_tokens > 16").count() shouldBe 0L
  }

  test("NULL-source documents pack on their own chain — never silently " +
      "dropped (every stage joins on a non-null sentinel key)") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, Option(words(3)), Option("a")), (2L, Option(words(2)), Option("a")),
      (10L, Option(words(4)), Option.empty[String]),
      (11L, Option(words(2)), Option.empty[String]),
      (12L, Option(words(9)), Option.empty[String])) // oversize, NULL chain
    val d = rows.toDF("doc_id", "text", "source")
    val got = Curation.packNextFit(d, budget = 5).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    got.keySet shouldBe rows.map(_._1).toSet // no row loss
    // the NULL chain packs independently of source "a"
    got(10L).getAs[Long]("seq_id") shouldBe 0L
    got(11L).getAs[Long]("seq_id") shouldBe 1L // 4 + 2 > 5
    got(12L).getAs[Long]("seq_id") shouldBe 2L
    got(12L).getAs[Boolean]("oversize") shouldBe true
    got(10L).isNullAt(got(10L).fieldIndex("source")) shouldBe true
    // and x31 sees the same document set (its window keeps NULL partitions)
    Curation.packSequences(d, budget = 5).count() shouldBe rows.size.toLong
  }

  test("budget guard is loud") {
    intercept[IllegalArgumentException] {
      Curation.packNextFit(df(Seq((1L, Some("a"), "s"))), budget = 0)
    }
  }

  test("the packing trade, each layout priced by ITS audit: x31 splits " +
      "but pads only the tail, x97 never splits and pays per-tail padding") {
    val rnd = new scala.util.Random(31L)
    val rows: Seq[(Long, Option[String], String)] = (0L until 80L).map(i =>
      (i, Some(words(1 + rnd.nextInt(20))), s"s${i % 2}"))
    val d = df(rows)
    val budget = 16
    def grab(rep: DataFrame) = rep.collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_split_docs"),
        r.getAs[Long]("padding_tokens"), r.getAs[Long]("total_tokens"))))
      .toMap
    // x31 = concat-then-chunk: its ceil-formula report is the correct one
    val x31 = grab(Curation.packEfficiencyReport(d, budget))
    // x97 = boundary-respecting: the per-sequence-tail report applies
    val x97 = grab(Curation.packEfficiencyOf(
      Curation.packNextFit(d, budget)
        .select("source", "doc_id", "n_tokens", "seq_id", "offset"), budget))
    x31.keySet shouldBe x97.keySet
    x31.foreach { case (src, (splits31, pad31, total31)) =>
      val (splits97, pad97, total97) = x97(src)
      withClue(s"$src: ") {
        total97 shouldBe total31 // same tokens, different layout
        splits31 should be > 0L
        splits97 shouldBe 0L // the x97 guarantee
        pad97 should be >= pad31 // and what it costs
      }
    }
  }

  test("assembleSequencesOf materializes the x97 layout: every sequence's " +
      "text fits the budget, and the NULL-text rider drops out of assembly") {
    val rows = Seq[(Long, Option[String], String)](
      (1L, Some("a b c"), "s"), (2L, Some("d e"), "s"),
      (3L, None, "s"), (4L, Some("f g h i"), "s"))
    val d = df(rows)
    val seqs = Curation.assembleSequencesOf(
      Curation.packNextFit(d, budget = 5), d)
      .collect().map(r => r.getAs[Long]("seq_id") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("seq_tokens"),
          r.getAs[String]("seq_text")))).toMap
    seqs(0L) shouldBe ((2L, 5L, "a b c d e"))
    seqs(1L) shouldBe ((1L, 4L, "f g h i"))
    seqs.values.foreach(_._2 should be <= 5L)
  }

  test("packEfficiencyOf on a boundary-respecting layout is exact: " +
      "per-tail padding, oversize overflows contribute zero") {
    val rows = Seq[(Long, Option[String], String)](
      (1L, Some(words(3)), "a"), (2L, Some(words(2)), "a"), // seq0 fill 5
      (3L, Some(words(9)), "a"), // oversize singleton, fill 9 > 5 -> pad 0
      (4L, Some(words(1)), "a")) // seq2 fill 1 -> pad 4
    val got = Curation.packEfficiencyOf(
      Curation.packNextFit(df(rows), budget = 5)
        .select("source", "doc_id", "n_tokens", "seq_id", "offset"),
      budget = 5).collect().head
    got.getAs[Long]("n_seqs") shouldBe 3L
    got.getAs[Long]("total_tokens") shouldBe 15L
    got.getAs[Long]("n_split_docs") shouldBe 0L
    got.getAs[Long]("padding_tokens") shouldBe 4L // 0 + max(0,-4) + 4
  }
}

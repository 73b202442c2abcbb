package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp

/** As-of join semantics: greatest right time <= left time per key, equality
  * matches, inner drop when no prior right row, carry across interleavings. */
class AsOfJoinSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def run() = {
    val s = spark
    import s.implicits._
    val quotes = Seq( // (sym, qt, px)
      ("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 10:02:00"), 2.0),
      ("A", ts("2024-01-01 10:05:00"), 3.0),
      ("B", ts("2024-01-01 10:03:00"), 9.0)).toDF("sym", "qt", "px")
    val trades = Seq( // (id, sym, tt)
      (1L, "A", ts("2024-01-01 10:01:30")), // between q1 and q2 -> px 1.0
      (2L, "A", ts("2024-01-01 10:02:00")), // EXACT tie with q2 -> px 2.0 (<=)
      (3L, "A", ts("2024-01-01 10:59:00")), // after all -> px 3.0
      (4L, "B", ts("2024-01-01 10:00:00")), // before B's only quote -> dropped
      (5L, "C", ts("2024-01-01 10:00:00"))) // no quotes at all -> dropped
      .toDF("id", "sym", "tt")
    AsOfJoin.asOf(trades, quotes, "sym", "tt", "sym", "qt")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("asof_px")).toMap
  }

  test("greatest right time <= left time; equality matches; unmatched lefts drop") {
    run() shouldBe Map(1L -> 1.0, 2L -> 2.0, 3L -> 3.0)
  }

  test("NULL keys and NULL times never match (ASOF JOIN parity)") {
    val s = spark
    import s.implicits._
    val quotes = Seq(
      (null.asInstanceOf[String], ts("2024-01-01 09:00:00"), 7.0), // null key
      ("A", null.asInstanceOf[Timestamp], 8.0),                    // null time
      ("A", ts("2024-01-01 10:00:00"), 1.0)).toDF("sym", "qt", "px")
    val trades = Seq(
      (1L, "A", ts("2024-01-01 11:00:00")),
      (2L, null.asInstanceOf[String], ts("2024-01-01 11:00:00")), // null key left
      (3L, "A", null.asInstanceOf[Timestamp]))                    // null time left
      .toDF("id", "sym", "tt")
    val out = AsOfJoin.asOf(trades, quotes, "sym", "tt", "sym", "qt")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("asof_px")).toMap
    out shouldBe Map(1L -> 1.0) // only the real match; null rows invent nothing
  }

  test("output carries all left columns plus asof_-prefixed right columns") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, "A", ts("2024-01-01 10:01:00"))).toDF("id", "sym", "tt")
    val r = Seq(("A", ts("2024-01-01 10:00:00"), 5.0)).toDF("sym", "qt", "px")
    AsOfJoin.asOf(l, r, "sym", "tt", "sym", "qt").columns.toSeq shouldBe
      Seq("id", "sym", "tt", "asof_sym", "asof_qt", "asof_px")
  }

  test("matches a brute-force reference on seeded random interleavings") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11) // fixed seed — deterministic test
    val base = ts("2024-03-01 00:00:00").getTime
    def t(): Timestamp = new Timestamp(base + rnd.nextInt(5000) * 1000L)
    val keys = Seq("a", "b", "c", "d")
    // right rows unique per (key, time) — the operator's documented contract
    val right = Seq.fill(120)((keys(rnd.nextInt(keys.size)), t()))
      .distinct.zipWithIndex
      .map { case ((k, qt), i) => (k, qt, i.toDouble) }
    val left = Seq.tabulate(200)(i => (i.toLong, keys(rnd.nextInt(keys.size)), t()))
    val expected = left.flatMap { case (id, k, tt) =>
      right.filter(r => r._1 == k && !r._2.after(tt))
        .sortBy(_._2.getTime).lastOption.map(r => id -> r._3)
    }.toMap
    val got = AsOfJoin.asOf(
      left.toDF("id", "sym", "tt"), right.toDF("sym", "qt", "px"),
      "sym", "tt", "sym", "qt")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("asof_px")).toMap
    got shouldBe expected
  }
}

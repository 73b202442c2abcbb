package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp

/** Range-join semantics: start-inclusive/end-exclusive containment, matches
  * across bucket boundaries, per-key isolation, no duplicate pairs. */
class RangeJoinSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("containment is [start, end); boundary-crossing ranges still match; no dups") {
    val s = spark
    import s.implicits._
    val ranges = Seq( // (key, rid, start, end)
      ("k1", 1L, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")),
      // crosses the 1-day bucket boundary — covered buckets exploded
      ("k1", 2L, ts("2024-01-02 12:00:00"), ts("2024-01-04 12:00:00")),
      ("k2", 3L, ts("2024-01-01 00:00:00"), ts("2024-01-09 00:00:00")))
      .toDF("key", "rid", "start", "end")
    val points = Seq( // (key, pid, t)
      ("k1", 10L, ts("2024-01-01 00:00:00")), // == start of r1: inclusive
      ("k1", 11L, ts("2024-01-03 00:00:00")), // == end of r1: exclusive; inside r2
      ("k1", 12L, ts("2024-01-05 00:00:00")), // outside both
      ("k2", 13L, ts("2024-01-02 00:00:00")), // r3 only (key isolation)
      ("k3", 14L, ts("2024-01-02 00:00:00"))) // unknown key -> nothing
      .toDF("key", "pid", "t")
    val out = RangeJoin.pointInRange(points, ranges,
        "key", "t", "key", "start", "end", granularitySeconds = 86400)
      .collect().map(r => (r.getAs[Long]("pid"), r.getAs[Long]("range_rid")))
    out.toSet shouldBe Set((10L, 1L), (11L, 2L), (13L, 3L))
    out.length shouldBe out.toSet.size // exactly-one-bucket meeting: no dups
  }

  test("sub-second range ends keep their last bucket's matches") {
    val s = spark
    import s.implicits._
    // end 00:02:00.5 covers instants in bucket 2 (g=60), but unix_timestamp
    // truncates to seconds — enumerating to (end-1) div g stopped at bucket
    // 1 and silently lost the 00:02:00.3 match
    val ranges = Seq(("k", 1L, Timestamp.valueOf("2024-01-01 00:00:00"),
        new Timestamp(Timestamp.valueOf("2024-01-01 00:02:00").getTime + 500)))
      .toDF("key", "rid", "start", "end")
    val points = Seq(
      ("k", 10L, new Timestamp(Timestamp.valueOf("2024-01-01 00:02:00").getTime + 300)),
      ("k", 11L, new Timestamp(Timestamp.valueOf("2024-01-01 00:02:00").getTime + 700)))
      .toDF("key", "pid", "t")
    val out = RangeJoin.pointInRange(points, ranges,
        "key", "t", "key", "start", "end", granularitySeconds = 60)
      .collect().map(r => (r.getAs[Long]("pid"), r.getAs[Long]("range_rid")))
    // 10 is inside [start, end); 11 is past the sub-second end
    out.toSet shouldBe Set((10L, 1L))
  }

  test("empty and inverted ranges are dropped, not enumerated downward") {
    val s = spark
    import s.implicits._
    val ranges = Seq(
      ("k", 1L, ts("2024-01-02 00:00:00"), ts("2024-01-02 00:00:00")), // empty
      ("k", 2L, ts("2024-06-01 00:00:00"), ts("2024-01-01 00:00:00")), // inverted
      ("k", 3L, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00"))) // real
      .toDF("key", "rid", "start", "end")
    val points = Seq(("k", 10L, ts("2024-01-02 00:00:00"))).toDF("key", "pid", "t")
    val out = RangeJoin.pointInRange(points, ranges, "key", "t", "key",
      "start", "end", granularitySeconds = 3600)
    out.collect().map(_.getAs[Long]("range_rid")).toSeq shouldBe Seq(3L)
  }

  test("a long range matches points many buckets away") {
    val s = spark
    import s.implicits._
    val ranges = Seq(("k", 1L, ts("2024-01-01 00:00:00"), ts("2024-03-01 00:00:00")))
      .toDF("key", "rid", "start", "end")
    val points = Seq(("k", 20L, ts("2024-02-25 13:37:00"))).toDF("key", "pid", "t")
    RangeJoin.pointInRange(points, ranges, "key", "t", "key", "start", "end", 3600)
      .count() shouldBe 1
  }

  test("matches a brute-force reference on seeded random points and ranges") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13) // fixed seed — deterministic test
    val base = ts("2024-02-25 00:00:00").getTime
    def t(max: Int): Long = base + rnd.nextInt(max) * 1000L
    val keys = Seq("k1", "k2", "k3")
    val points = Seq.tabulate(150)(i =>
      (keys(rnd.nextInt(keys.size)), i.toLong, new Timestamp(t(20000))))
    val ranges = Seq.tabulate(60) { i =>
      val s0 = t(20000)
      (keys(rnd.nextInt(keys.size)), i.toLong + 1000L,
        new Timestamp(s0), new Timestamp(s0 + (rnd.nextInt(8) - 1) * 900000L))
    } // whole-second ranges up to ~105 min wide, spanning many 600s buckets;
      // some empty/inverted on purpose — the operator must drop them
    val expected = (for {
      (pk, pid, pt) <- points
      (rk, rid, rs, re) <- ranges
      if pk == rk && !pt.before(rs) && pt.before(re)
    } yield (pid, rid)).toSet
    val got = RangeJoin.pointInRange(
      points.toDF("key", "pid", "t"), ranges.toDF("key", "rid", "start", "end"),
      "key", "t", "key", "start", "end", granularitySeconds = 600)
      .collect().map(r => (r.getAs[Long]("pid"), r.getAs[Long]("range_rid"))).toSet
    got shouldBe expected
  }
}

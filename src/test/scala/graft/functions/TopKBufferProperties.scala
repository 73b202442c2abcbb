package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck properties for the [[TopKBuffer]] kernel itself — pure JVM,
  * no Spark session: the fixture spec pins the aggregate end-to-end; these
  * pin the BUFFER's ordering contract against a reference sort across
  * random streams (ties, NULL scores, ±0.0, NaN, every k, arbitrary merge
  * splits — the edges one fixture cannot enumerate). */
object TopKBufferProperties extends Properties("topKBuffer") {

  private type Entry = (Boolean, Double, Long) // (isNull, score, id)

  /** The window ordering the buffer must reproduce: score DESC NULLS LAST
    * (SQL double total order via SQLOrderingUtil), id ASC. */
  private def refSort(xs: Seq[Entry]): Seq[Entry] =
    xs.sortWith { case ((an, as, ai), (bn, bs, bi)) =>
      if (!an && !bn) {
        val c = -org.apache.spark.sql.catalyst.util.SQLOrderingUtil
          .compareDoubles(as, bs)
        if (c != 0) c < 0 else ai < bi
      } else if (an && bn) ai < bi
      else bn // a non-null ranks before b null
    }

  private def drain(b: TopKBuffer): Seq[Entry] =
    (0 until b.n).map(i => (b.nulls(i), b.scores(i), b.ids(i)))

  /** Tuple == on Double has NaN != NaN; compare canonical bit patterns. */
  private def canon(xs: Seq[Entry]): Seq[(Boolean, Long, Long)] =
    xs.map { case (n, s, id) =>
      (n, java.lang.Double.doubleToLongBits(s), id)
    }

  private val entryGen: Gen[Entry] = for {
    isNull <- Gen.prob(0.15)
    score <- Gen.oneOf(
      Gen.chooseNum(-5.0, 5.0),
      Gen.oneOf(0.0, -0.0, 1.0, 1.0, Double.NaN,
        Double.PositiveInfinity, Double.NegativeInfinity))
    id <- Gen.chooseNum(0L, 40L) // small range forces score AND id ties
  } yield (isNull, if (isNull) 0.0 else score, id)

  property("insert stream = reference sort take k") =
    Prop.forAll(Gen.listOf(entryGen), Gen.chooseNum(1, 12)) { (xs, k) =>
      val b = new TopKBuffer(k)
      xs.foreach { case (n, s, id) => b.insert(n, s, id) }
      canon(drain(b)) == canon(refSort(xs).take(k))
    }

  property("arbitrary merge split = single-buffer result") =
    Prop.forAll(Gen.listOf(entryGen), Gen.chooseNum(1, 10),
      Gen.chooseNum(0, 100)) { (xs, k, cut) =>
      val (l, r) = xs.splitAt(cut % (xs.size + 1))
      val a = new TopKBuffer(k); l.foreach(e => a.insert(e._1, e._2, e._3))
      val c = new TopKBuffer(k); r.foreach(e => c.insert(e._1, e._2, e._3))
      // merge c into a, exactly as TypedImperativeAggregate.merge does
      (0 until c.n).foreach(i => a.insert(c.nulls(i), c.scores(i), c.ids(i)))
      val whole = new TopKBuffer(k)
      xs.foreach(e => whole.insert(e._1, e._2, e._3))
      canon(drain(a)) == canon(drain(whole))
    }
}

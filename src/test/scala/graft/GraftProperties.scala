package graft

import graft.streaming.TransactionalEpochSink
import graft.topics.{TopicNamingException, Topics}
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the pure string-protocol surfaces — the places
  * where a malformed name or key silently mis-routing data would be
  * invisible until production: marker-key round-trips (the exactly-once
  * sink's replay bookkeeping) and topic-name validation/derivation (U1). */
object GraftProperties extends Properties("graft") {

  private val baseGen: Gen[String] = for {
    n <- Gen.choose(1, 4)
    parts <- Gen.listOfN(n, Gen.nonEmptyListOf(
      Gen.oneOf(Gen.alphaNumChar, Gen.const('-'), Gen.const('.')))
      .map(_.mkString))
  } yield parts.mkString("-") // bases may contain '-' and '.', never '/'

  property("markerKey parses back to exactly its own (base, epoch, pid)") =
    Prop.forAll(baseGen, Gen.choose(0L, Long.MaxValue), Gen.choose(0, 1 << 20)) {
      (base, epoch, pid) =>
        TransactionalEpochSink.parseMarker(
          TransactionalEpochSink.markerKey(base, epoch, pid), base, epoch)
          .contains(pid)
    }

  property("markerKey never cross-matches a different epoch or base") =
    Prop.forAll(baseGen, Gen.choose(0L, 1L << 40), Gen.choose(0, 1024)) {
      (base, epoch, pid) =>
        val key = TransactionalEpochSink.markerKey(base, epoch, pid)
        TransactionalEpochSink.parseMarker(key, base, epoch + 1).isEmpty &&
        TransactionalEpochSink.parseMarker(key, base + "x", epoch).isEmpty &&
        // an epoch whose DIGITS prefix another epoch must not match either
        // (e.g. epoch 1 vs 10 — the trailing '/' boundary prevents it)
        TransactionalEpochSink.parseMarker(key, base,
          (epoch.toString + "0").toLong).isEmpty
    }

  property("parseMarkerEpoch recovers exactly its own base's epoch") =
    Prop.forAll(baseGen, Gen.choose(0L, Long.MaxValue), Gen.choose(0, 1 << 20)) {
      (base, epoch, pid) =>
        val key = TransactionalEpochSink.markerKey(base, epoch, pid)
        TransactionalEpochSink.parseMarkerEpoch(key, base).contains(epoch) &&
        // a different base must see None — the prune path relies on this to
        // leave other queries' cached keys untouched
        TransactionalEpochSink.parseMarkerEpoch(key, base + "x").isEmpty &&
        TransactionalEpochSink.parseMarkerEpoch(key, "y" + base).isEmpty
    }

  private val segGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  property("valid ingest topics derive consistent siblings and tenant") =
    Prop.forAll(segGen, segGen, Gen.option(segGen)) { (tenant, di, qualifier) =>
      val in = (Seq("ingest", tenant, di) ++ qualifier.toSeq :+ "in").mkString(".")
      val base = in.stripSuffix(".in")
      Topics.validate(in) == in &&
      Topics.outputTopic(in) == s"$base.out" &&
      Topics.invalidTopic(in) == s"$base.invalid" &&
      Topics.notificationTopic(in) == s"$base.notification" &&
      Topics.tenantId(in) == tenant
    }

  property("topics missing the contract shape are rejected") =
    Prop.forAll(segGen, segGen) { (a, b) =>
      def rejected(t: String): Boolean =
        try { Topics.validate(t); false }
        catch { case _: TopicNamingException => true }
      rejected(s"$a.$b.in") && // too few parts
      rejected(s"notingest.$a.$b.in") && // wrong prefix
      rejected(s"ingest.$a.$b.out") // wrong suffix
    }
}

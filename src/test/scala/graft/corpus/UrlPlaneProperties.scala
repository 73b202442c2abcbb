package graft.corpus

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck contract for [[Curation.normalizeUrl]] (x106): URLs are
  * BUILT from random components, so the referee knows the ground-truth
  * canonical by construction — it never re-parses, making it a genuinely
  * independent check of the parse+policy pipeline (the
  * ExactSubstrProperties discipline). Decorations (case, www, default
  * port, trailing slashes, tracking params, fragments) are sampled
  * independently of the identity components; the property also pins that
  * two renderings of the SAME identity always canonicalize identically
  * (x107's collision premise). */
object UrlPlaneProperties extends Properties("urlPlane") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session

  /** Identity: what normalization must keep. */
  private case class Id(scheme: String, host: String, port: Option[Int],
      path: List[String], kept: List[String])

  /** Decoration: what normalization must strip. */
  private case class Deco(upperScheme: Boolean, www: String,
      hostCaps: Boolean, defaultPort: Boolean, trailingSlashes: Int,
      trackPre: List[String], trackPost: List[String], frag: Option[String])

  private val idGen: Gen[Id] = for {
    scheme <- Gen.oneOf("http", "https")
    labels <- Gen.choose(1, 3)
    host <- Gen.listOfN(labels,
      Gen.oneOf("alpha", "beta", "gm7", "x")).map(_.mkString("."))
    suffix <- Gen.oneOf("", ".com", ".co.uk", ".org", ".com.au")
    port <- Gen.option(Gen.oneOf(8080, 8443, 3000))
    path <- Gen.listOf(Gen.oneOf("p", "q2", "rr")).map(_.take(3))
    kept <- Gen.listOf(Gen.oneOf("a=1", "id=7", "b", "referrer=z",
      "xutm_q=1")).map(_.take(3))
  } yield Id(scheme, host + suffix, port, path, kept)

  private val decoGen: Gen[Deco] = for {
    upperScheme <- Gen.oneOf(true, false)
    www <- Gen.oneOf("", "www.", "WWW.")
    hostCaps <- Gen.oneOf(true, false)
    defaultPort <- Gen.oneOf(true, false)
    slashes <- Gen.choose(0, 2)
    trk = Gen.oneOf("utm_source=x", "utm_q", "fbclid=1", "gclid=2",
      "msclkid=3", "ref=tw", "ref")
    pre <- Gen.listOf(trk).map(_.take(2))
    post <- Gen.listOf(trk).map(_.take(2))
    frag <- Gen.option(Gen.oneOf("#f", "#sec/2?x=1"))
  } yield Deco(upperScheme, www, hostCaps, defaultPort, slashes, pre, post,
    frag)

  private def render(id: Id, d: Deco): String = {
    val scheme = if (d.upperScheme) id.scheme.toUpperCase else id.scheme
    val host = d.www + (if (d.hostCaps) id.host.toUpperCase else id.host)
    val port = id.port.map(":" + _).getOrElse(
      if (d.defaultPort) if (id.scheme == "https") ":443" else ":80" else "")
    val path = id.path.map("/" + _).mkString + "/" * d.trailingSlashes
    val params = d.trackPre ++ id.kept ++ d.trackPost
    val query = if (params.isEmpty) "" else params.mkString("?", "&", "")
    scheme + "://" + host + port + path + query + d.frag.getOrElse("")
  }

  /** Ground truth from the components — no parsing anywhere. */
  private def expected(id: Id): (String, String) = {
    val port = id.port.map(":" + _).getOrElse("")
    val path = id.path.map("/" + _).mkString
    val query = if (id.kept.isEmpty) "" else id.kept.mkString("?", "&", "")
    val norm = id.scheme + "://" + id.host + port + path + query
    val labels = id.host.split("\\.")
    val domain =
      if (labels.length <= 1) id.host
      else {
        val last2 = labels.takeRight(2).mkString(".")
        if (labels.length >= 3 &&
            Curation.MultiLabelSuffixes.contains(last2))
          labels.takeRight(3).mkString(".")
        else last2
      }
    (norm, domain)
  }

  private val caseGen: Gen[List[(Id, Deco, Deco)]] =
    Gen.listOfN(12, for {
      id <- idGen; d1 <- decoGen; d2 <- decoGen
    } yield (id, d1, d2))

  property("normalizeUrl recovers the identity components under every " +
      "decoration, and two decorations of one identity collide") =
    Prop.forAll(caseGen) { cases =>
      val s = spark
      import s.implicits._
      val rows = cases.zipWithIndex.flatMap { case ((id, d1, d2), i) =>
        Seq((i * 2L, render(id, d1)), (i * 2L + 1, render(id, d2)))
      }
      val got = Curation.normalizeUrl(rows.toDF("doc_id", "url"))
        .select("doc_id", "url_norm", "domain")
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getString(2)))).toMap
      cases.zipWithIndex.forall { case ((id, _, _), i) =>
        val (wantNorm, wantDom) = expected(id)
        got(i * 2L) == ((wantNorm, wantDom)) &&
          got(i * 2L + 1) == ((wantNorm, wantDom))
      } :| s"got $got"
    }
}

package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The URL canonicalization kernel (x106's policy) as ONE pass over the
  * string, shared by [[UrlNormalize]] and [[UrlDomain]].
  *
  * WHY a fused expression rather than the original declarative staged
  * projection (the [[Bm25GateScore]] doctrine, second sighting): staged
  * intermediate columns survive only until an optimizer rule needs to see
  * through them. Under x107's aggregate they held; under x112's JOIN,
  * constraint inference (`isnotnull(url_norm)` from the inner join) and
  * pushdown SUBSTITUTE the aliases — the probe-side plan ballooned from 6
  * `regexp_extract` nodes to 77 (plan text 7 KB → 105 KB), each row
  * re-running shared parse stages tens of times (measured: the 5 000-row
  * sf0.1 probe paid ~2 s PER SIDE; the x112 driver row read 4.4 s against
  * x107's 0.78 s for strictly more work). Fusing makes duplication
  * harmless: one evaluation is one linear scan plus a handful of anchored
  * regexes, so even a pushed-down copy costs one extra parse, not a
  * substituted forest.
  *
  * Exactness: every step replicates the Catalyst expression it fuses, on
  * the SAME engine — `java.util.regex` with the identical pattern strings
  * (Spark's `regexp_extract`/`rlike`/`regexp_replace` compile to
  * `java.util.regex`), `UTF8String.toLowerCase` (Catalyst's `Lower`,
  * locale-free — `String.toLowerCase` is not), and `String.split(re, -1)`
  * (Catalyst's `split` keeps trailing empties; bare `String.split` drops
  * them). The policy constants (tracking-param pattern, multi-label
  * suffixes) stay owned by `graft.corpus.Curation` and arrive as
  * constructor arguments, so the engine, this kernel, and the DuckDB
  * oracle generators all read one source of truth. Spec-pinned equal to
  * the retired declarative chain by `UrlPlaneSpec`'s hand cases and
  * `UrlPlaneProperties`' build-from-components referee. */
object UrlPolicy {
  private val SchemeRe = Pattern.compile("^([A-Za-z][A-Za-z0-9+.\\-]*)://")
  private val RestRe = Pattern.compile("^[A-Za-z][A-Za-z0-9+.\\-]*://([^#]*)")
  private val AuthRe = Pattern.compile("^([^/?]*)")
  private val PathRe = Pattern.compile("^([^?]*)")
  private val HostRe = Pattern.compile("^([^:]*)")
  private val PortRe = Pattern.compile(":([0-9]+)$")
  private val WwwRe = Pattern.compile("^www\\.")
  private val TrailSlashRe = Pattern.compile("/+$")

  /** `regexp_extract(u, re, 1)` — "" when unmatched or the group skipped,
    * exactly Catalyst's contract. */
  private def extract(re: Pattern, s: String): String = {
    val m = re.matcher(s)
    if (m.find()) { val g = m.group(1); if (g == null) "" else g } else ""
  }

  private def lower(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString

  private val PortRestRe = Pattern.compile("^:[0-9]*$")

  /** Parsed canonical pieces: (scheme, host, port, npath, query) — scheme
    * or host empty ⟺ the URL does not parse (NULL url_norm/domain).
    *
    * Authority strictness (the r19 review's two policy holes, closed on
    * BOTH engines): an authority carrying userinfo (`user@host`) or
    * anything after the host that is not `:` + digits (possibly empty —
    * RFC 3986 allows a bare-colon empty port, which normalizes away like
    * a default port) is MALFORMED: a garbage port like `:8080a`, a second
    * colon — the original lenient parse
    * silently keyed `http://allowed.com:x@blocked.com/` on `allowed.com`
    * (a domain-blocklist bypass) and collapsed `ex.com:8080a` onto the
    * clean `ex.com` identity. Malformed-is-data: NULL, never a throw. */
  private def parse(u: String): (String, String, String, String, String) = {
    val scheme = lower(extract(SchemeRe, u))
    val rest = extract(RestRe, u)
    val auth = extract(AuthRe, rest)
    val pathq = rest.substring(auth.length)
    val path = extract(PathRe, pathq)
    val query =
      if (pathq.length > path.length) pathq.substring(path.length + 1) else ""
    val hostRaw = extract(HostRe, auth)
    val portRest = auth.substring(hostRaw.length)
    val authOk = auth.indexOf('@') < 0 &&
      (portRest.isEmpty || PortRestRe.matcher(portRest).matches())
    val host =
      if (authOk) WwwRe.matcher(lower(hostRaw)).replaceAll("") else ""
    val port = extract(PortRe, auth)
    val npath = TrailSlashRe.matcher(path).replaceAll("")
    (scheme, host, port, npath, query)
  }

  /** The canonical form, or null when the URL does not parse. */
  def normalize(u: UTF8String, tracking: Pattern): UTF8String = {
    val (scheme, host, port, npath, query) = parse(u.toString)
    if (scheme.isEmpty || host.isEmpty) return null
    val kept = query.split("&", -1)
      .filter(p => p.nonEmpty && !tracking.matcher(p).find())
      .mkString("&")
    val dropPort = port.isEmpty ||
      (scheme == "http" && port == "80") ||
      (scheme == "https" && port == "443")
    val sb = new java.lang.StringBuilder(u.numChars())
    sb.append(scheme).append("://").append(host)
    if (!dropPort) sb.append(':').append(port)
    sb.append(npath)
    if (kept.nonEmpty) sb.append('?').append(kept)
    UTF8String.fromString(sb.toString)
  }

  /** The registrable domain (one label more than a recognized public
    * suffix), or null when the URL does not parse. */
  def domain(u: UTF8String, suffixes: java.util.Set[String]): UTF8String = {
    val (scheme, host, _, _, _) = parse(u.toString)
    if (scheme.isEmpty || host.isEmpty) return null
    val labels = host.split("\\.", -1)
    val n = labels.length
    val d =
      if (n <= 1) host
      else {
        val last2 = labels(n - 2) + "." + labels(n - 1)
        if (n >= 3 && suffixes.contains(last2)) labels(n - 3) + "." + last2
        else last2
      }
    UTF8String.fromString(d)
  }
}

/** `url_normalize(url)` — x106's canonical form as one codegen'd kernel
  * call; NULL for a string that does not parse as `scheme://host…`
  * (malformed is data — the gate routes it, nothing throws). */
case class UrlNormalize(child: Expression, trackingPattern: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"url_normalize expects a STRING input, got ${t.sql}")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "url_normalize"

  @transient private lazy val tracking = Pattern.compile(trackingPattern)

  def compute(u: UTF8String): UTF8String = UrlPolicy.normalize(u, tracking)

  override protected def nullSafeEval(u: Any): Any =
    compute(u.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, u => {
      val self = ctx.addReferenceObj("urlNormalize", this,
        classOf[UrlNormalize].getName)
      s"""${ev.value} = $self.compute($u);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UrlNormalize =
    copy(child = newChild)
}

/** `url_domain(url)` — the registrable domain of x106's canonical host;
  * NULL for a string that does not parse. Deliberately a second
  * independent kernel call rather than a shared struct output: a depth-1
  * expression duplicates as one extra linear parse, a multiply-referenced
  * struct field would re-open the substitution door this kernel closes. */
case class UrlDomain(child: Expression, multiLabelSuffixes: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"url_domain expects a STRING input, got ${t.sql}")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "url_domain"

  @transient private lazy val suffixes: java.util.Set[String] = {
    val s = new java.util.HashSet[String](multiLabelSuffixes.size * 2)
    multiLabelSuffixes.foreach(s.add)
    s
  }

  def compute(u: UTF8String): UTF8String = UrlPolicy.domain(u, suffixes)

  override protected def nullSafeEval(u: Any): Any =
    compute(u.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, u => {
      val self = ctx.addReferenceObj("urlDomain", this,
        classOf[UrlDomain].getName)
      s"""${ev.value} = $self.compute($u);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UrlDomain =
    copy(child = newChild)
}

package graft.http

import graft.model.BatchNotification

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.util.Base64
import scala.util.{Failure, Success, Try}

/** U3/V3 SPI — synchronous batch-metadata lookup
  * (reference BatchLookup.scala:11-13): `getBatchId(tenantId, batchId)`;
  * a `Failure(RequestException(404, _))` means "unknown batch" to the caller. */
trait BatchLookup extends Serializable {
  def getBatchId(tenantId: String, batchId: String): Try[BatchNotification]
}

/** Map-backed test lookup (reference MapBatchLookup.scala:13-30). */
class MapBatchLookup(batches: Map[String, BatchNotification]) extends BatchLookup {
  def getBatchId(tenantId: String, batchId: String): Try[BatchNotification] =
    batches.get(batchId) match {
      case Some(n) => Success(n)
      case None    => Failure(RequestException(404, s"batch $batchId not found"))
    }
}

/** U3 — REST client for the batch-management API
  * (reference MgmtClient.scala:30-205): OAuth2 client-credentials token
  * (`POST {oauthBase}/token` with Basic auth, scopes
  * `hri_internal hri_consumer tenant_<id>`, audience = clientId), then
  * `GET /tenants/{t}/batches/{b}` and
  * `PUT /tenants/{t}/batches/{b}/action/{processingComplete|fail}` with Bearer.
  * Any non-2xx response surfaces as [[RequestException]] — retry/404 policy is the
  * caller's (Retry / MgmtApiSink), exactly as in the reference.
  *
  * Plain `java.net.http` — no Spark involvement; instances live driver-side.
  */
class MgmtClient(
    baseUri: String,
    oauthBase: String,
    clientId: String,
    clientSecret: String,
    audience: String,
    http: HttpClient = MgmtClient.createHttpClient()) extends BatchLookup {

  private def send(req: HttpRequest): String = {
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() < 200 || resp.statusCode() > 299)
      throw RequestException(resp.statusCode(), resp.body())
    resp.body()
  }

  /** OAuth client-credentials grant; one token per call-site invocation — the
    * reference likewise fetches per request batch (MgmtClient.scala:95-128).
    * Every form value is URL-encoded — a clientSecret or audience containing
    * `&`, `+`, `=` or non-ASCII must not corrupt the grant body (the Basic
    * header needs no encoding beyond Base64). */
  private[http] def token(tenantId: String): String = {
    val basic = Base64.getEncoder.encodeToString(
      s"$clientId:$clientSecret".getBytes(StandardCharsets.UTF_8))
    def enc(v: String) = URLEncoder.encode(v, StandardCharsets.UTF_8)
    val form = s"grant_type=client_credentials" +
      s"&scope=${enc(s"hri_internal hri_consumer tenant_$tenantId")}" +
      s"&audience=${enc(audience)}"
    val body = send(HttpRequest.newBuilder(URI.create(s"$oauthBase/token"))
      .header("Authorization", s"Basic $basic")
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(form)).build())
    Json.strField(body, "access_token")
      .getOrElse(throw RequestException(500, "no access_token in token response"))
  }

  def getBatchId(tenantId: String, batchId: String): Try[BatchNotification] = Try {
    val body = send(HttpRequest.newBuilder(
      URI.create(s"$baseUri/tenants/$tenantId/batches/$batchId"))
      .header("Authorization", s"Bearer ${token(tenantId)}")
      .GET().build())
    Json.parseNotification(body)
  }

  /** PUT …/action/processingComplete (reference MgmtClient.scala:44-63). */
  def processingComplete(tenantId: String, batchId: String,
      actualRecordCount: Int, invalidRecordCount: Int): Unit = {
    val body =
      s"""{"actualRecordCount":$actualRecordCount,"invalidRecordCount":$invalidRecordCount}"""
    put(tenantId, batchId, "processingComplete", body)
  }

  /** PUT …/action/fail (reference MgmtClient.scala:65-85). */
  def fail(tenantId: String, batchId: String, actualRecordCount: Int,
      invalidRecordCount: Int, failureMessage: String): Unit = {
    val body = s"""{"actualRecordCount":$actualRecordCount,""" +
      s""""invalidRecordCount":$invalidRecordCount,""" +
      s""""failureMessage":${Json.quote(failureMessage)}}"""
    put(tenantId, batchId, "fail", body)
  }

  private def put(tenantId: String, batchId: String, action: String, body: String): Unit =
    send(HttpRequest.newBuilder(
      URI.create(s"$baseUri/tenants/$tenantId/batches/$batchId/action/$action"))
      .header("Authorization", s"Bearer ${token(tenantId)}")
      .header("Content-Type", "application/json")
      .PUT(HttpRequest.BodyPublishers.ofString(body)).build())
}

object MgmtClient {

  val TrustStoreEnv = "HRI_TRUSTSTORE"
  val TrustStorePasswordEnv = "HRI_TRUSTSTORE_PASSWORD"

  /** Build the HTTP client, honoring a custom truststore when the
    * `HRI_TRUSTSTORE` / `HRI_TRUSTSTORE_PASSWORD` environment variables are set
    * (reference MgmtClient.scala:166-204, pinned by MgmtClientTest.scala:369-422):
    * truststore unset → default client (a password alone is ignored, exactly like
    * the reference's path-first check); truststore set without a password →
    * IllegalArgumentException; path not a file → FileNotFoundException; else an
    * SSLContext trusting only that store (JKS or PKCS12, auto-probed). `env` is
    * injectable for tests. */
  def createHttpClient(
      env: String => Option[String] = k => Option(System.getenv(k))): HttpClient = {
    val path = env(TrustStoreEnv).filter(_.nonEmpty)
    val password = env(TrustStorePasswordEnv).filter(_.nonEmpty)
    (path, password) match {
      case (None, _) => HttpClient.newHttpClient()
      case (Some(_), None) =>
        throw new IllegalArgumentException(
          s"$TrustStoreEnv is set, but $TrustStorePasswordEnv is not. Both must be empty or set.")
      case (Some(p), Some(pw)) =>
        val f = new java.io.File(p)
        if (!f.exists() || !f.isFile)
          throw new java.io.FileNotFoundException(s"Not found or not a file: ${f.getPath}")
        val ks = java.security.KeyStore.getInstance(f, pw.toCharArray)
        val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
          javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
        tmf.init(ks)
        val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
        ctx.init(null, tmf.getTrustManagers, null)
        HttpClient.newBuilder().sslContext(ctx).build()
    }
  }
}

/** Minimal JSON helpers for the two fixed control payloads — driver-side only; the
  * data plane parses JSON with Spark's codegen'd `from_json`, never this. */
private[http] object Json {

  def quote(s: String): String =
    if (s == null) "null"
    else "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private val str = """"%s"\s*:\s*"((?:[^"\\]|\\.)*)""""
  private val num = """"%s"\s*:\s*(-?\d+)"""

  /** Index of `"field"` as a TOP-LEVEL key (depth 1, outside string content,
    * followed by optional whitespace and ':'), or -1. Depth-aware so a
    * user-controlled NESTED object — the opaque `metadata` passthrough — can
    * never shadow a notification field: in `{"metadata":{"status":
    * "COMPLETED"},"status":"STARTED"}` the notification's status is STARTED
    * regardless of server field order; a whole-document regex scan would
    * have matched the nested key first and e.g. marked a live batch
    * COMPLETED (routing every record invalid) or corrupted
    * expectedRecordCount in the tracker. */
  private def topLevelKeyIndex(json: String, field: String): Int = {
    val key = "\"" + field + "\""
    var depth = 0; var inStr = false; var esc = false; var k = 0
    while (k < json.length) {
      val c = json.charAt(k)
      if (esc) esc = false
      else if (inStr) { if (c == '\\') esc = true else if (c == '"') inStr = false }
      else c match {
        case '"' =>
          if (depth == 1 && json.regionMatches(k, key, 0, key.length)) {
            var j = k + key.length
            while (j < json.length && json.charAt(j).isWhitespace) j += 1
            if (j < json.length && json.charAt(j) == ':') return k
          }
          // not this field's key (or a string VALUE that merely equals it):
          // enter the string and keep scanning
          inStr = true
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1
        case _ =>
      }
      k += 1
    }
    -1
  }

  def strField(json: String, field: String): Option[String] = {
    val i = topLevelKeyIndex(json, field)
    if (i < 0) None
    // prefix-anchored at the located key: a later (possibly nested)
    // same-named key must not be picked up when THIS value isn't a string
    else str.format(java.util.regex.Pattern.quote(field)).r
      .findPrefixMatchOf(json.substring(i)).map(m => unescape(m.group(1)))
  }

  def intField(json: String, field: String): Option[Int] = {
    val i = topLevelKeyIndex(json, field)
    if (i < 0) None
    else num.format(java.util.regex.Pattern.quote(field)).r
      .findPrefixMatchOf(json.substring(i)).map(_.group(1).toInt)
  }

  /** Raw text of `field`'s JSON value — balanced-brace scan, string-aware. Used
    * for the opaque `metadata` passthrough: an object/array/number/bool comes
    * back byte-for-byte; a quoted string comes back unescaped (matching what
    * Spark's `from_json` yields for a StringType field); absent or `null` →
    * None. */
  def rawField(json: String, field: String): Option[String] = {
    // the same depth-1 key location as strField/intField: a nested object's
    // same-named key (or the key text as a string VALUE) never matches
    val i = topLevelKeyIndex(json, field)
    if (i < 0) None
    else {
      var j = i + field.length + 2
      while (j < json.length && json(j).isWhitespace) j += 1
      rawValueAt(json, j + 1, field, i)
    }
  }

  private def rawValueAt(json: String, from: Int, field: String, keyPos: Int): Option[String] = {
    var j = from
    while (j < json.length && json(j).isWhitespace) j += 1
    if (j >= json.length) return None
    json(j) match {
      case '"' => // string value: unescape, prefix-anchored at THIS key
        str.format(java.util.regex.Pattern.quote(field)).r
          .findPrefixMatchOf(json.substring(keyPos)).map(m => unescape(m.group(1)))
      case '{' | '[' =>
        val open = json(j); val close = if (open == '{') '}' else ']'
        var depth = 0; var k = j; var inStr = false; var esc = false
        while (k < json.length) {
          val c = json(k)
          if (esc) esc = false
          else if (inStr) { if (c == '\\') esc = true else if (c == '"') inStr = false }
          else if (c == '"') inStr = true
          else if (c == open) depth += 1
          else if (c == close) { depth -= 1; if (depth == 0) return Some(json.substring(j, k + 1)) }
          k += 1
        }
        None // unbalanced
      case _ =>
        var k = j
        while (k < json.length && !",}]".contains(json(k)) && !json(k).isWhitespace) k += 1
        Some(json.substring(j, k)).filter(v => v.nonEmpty && v != "null")
    }
  }

  private def unescape(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => b.append('\n'); i += 2
          case 'r' => b.append('\r'); i += 2
          case 't' => b.append('\t'); i += 2
          case 'u' if i + 5 < s.length =>
            b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case o => b.append(o); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** Parse the notification payload's known fields (open-world: unknown fields
    * ignored, like the reference's FAIL_ON_UNKNOWN_PROPERTIES=false Jackson setup,
    * NotificationDeserializer.scala:26-29). */
  def parseNotification(json: String): BatchNotification = {
    def ts(f: String): java.sql.Timestamp =
      strField(json, f).map(v =>
        java.sql.Timestamp.from(java.time.OffsetDateTime.parse(v).toInstant)).orNull
    BatchNotification(
      id = strField(json, "id").orNull,
      name = strField(json, "name").orNull,
      topic = strField(json, "topic").orNull,
      dataType = strField(json, "dataType").orNull,
      status = strField(json, "status").orNull,
      startDate = ts("startDate"),
      endDate = ts("endDate"),
      expectedRecordCount = intField(json, "expectedRecordCount").getOrElse(-1),
      actualRecordCount = intField(json, "actualRecordCount").getOrElse(-1),
      invalidRecordCount = intField(json, "invalidRecordCount").getOrElse(-1),
      invalidThreshold = intField(json, "invalidThreshold").getOrElse(-1),
      failureMessage = strField(json, "failureMessage").orNull,
      // opaque passthrough — the reference carries metadata byte-for-byte
      // (TestBatchNotification.scala:45); a remotely-resolved batch must not
      // lose user metadata on its way into a terminal notification
      metadata = rawField(json, "metadata").orNull)
  }
}

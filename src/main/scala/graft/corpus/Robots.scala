package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The robots.txt plane — the FILE-level politeness gate a crawl applies
  * before it fetches anything (x114's meta-robots directive governs what
  * to do with a page already fetched; robots.txt governs whether to fetch
  * at all — RFC 9309, the one protocol every polite crawler implements).
  * Reference scope note: the Alvearie reference pipeline has no crawl
  * plane at all; this is engine-extension surface like the rest of the
  * X-series.
  *
  * Two operators:
  *
  *  - [[parseRules]] — `(domain, robots_txt)` files → the `(domain,
  *    rtype, rpath)` rule set SELECTED for one crawler agent (RFC 9309
  *    §2.2.1 group semantics: consecutive `User-agent` lines share a
  *    header; ALL groups naming the agent merge; the `*` groups apply
  *    only when NO group names the agent);
  *  - [[robotsTxtGate]] — URLs × selected rules → a disposition per row
  *    (longest-match wins, `Allow` wins length ties — RFC 9309 §2.2.2;
  *    flags, NOT filters, the x73/x108 routing doctrine).
  *
  * The parsing policy is an explicit documented SUBSET shared verbatim
  * with the DuckDB oracle (the [[Curation.TrackingParamPattern]]
  * doctrine — the policy surface is the constant, a deployment widens it
  * without touching the operator):
  *
  *  - `#` starts a comment (stripped to end of line, trailing comments
  *    included); directive names and agent tokens are case-insensitive;
  *  - values are single whitespace-free tokens (UA product tokens and
  *    URL paths contain no spaces; anything after the first blank is
  *    ignored — which is also what makes trailing comments safe);
  *  - an EMPTY `Disallow:`/`Allow:` value declares nothing (the
  *    traditional allow-all file is three bytes of no rules) and is
  *    dropped, never treated as an empty prefix that matches everything;
  *  - rules BEFORE any `User-agent` line belong to no group and are
  *    dropped (never promoted to global);
  *  - path matching is LITERAL prefix only — the `*`/`$` wildcard
  *    extension is out of scope and documented so (a value containing
  *    `*` simply never matches a literal path);
  *  - the matched text is the canonical path-plus-query of the
  *    [[Curation.normalizeUrl]] form, `/`-rooted (an empty path matches
  *    as `/`, RFC 9309 §2.2.2's empty-pattern rule).
  */
object Robots {

  /** The product token [[parseRules]] selects groups for by default —
    * the engine's own crawler name. Shared with the x117 oracle
    * generator. */
  val CrawlerAgent: String = "graftbot"

  /** Parse per-domain robots.txt files into the rule set selected for
    * `agent`: `(domain, rtype ∈ {allow, disallow}, rpath)`.
    *
    * Group algebra (RFC 9309 §2.2.1): a `User-agent` line whose
    * predecessor is NOT a `User-agent` line starts a new group, so
    * consecutive UA lines share one header; a group applies to `agent`
    * when any header token equals it (case-insensitive); if ANY group
    * applies, the selected rules are the union over those groups and
    * every `*` group is ignored; otherwise the union over the `*`
    * groups. A file with neither yields no rows — [[robotsTxtGate]]
    * reads absence as allowed, the web default.
    *
    * Scale shape: every stage is keyed on `domain` over the ROBOTS
    * table only (one row per registrable domain, file size bounded —
    * RFC 9309 §2.5 caps parse obligation at 500 KiB), so the windows
    * and group joins never touch the document corpus; the output is the
    * bounded rule table the gate joins against. */
  def parseRules(robots: DataFrame, agent: String = CrawlerAgent,
      txtCol: String = "robots_txt"): DataFrame = {
    val w = Window.partitionBy("domain").orderBy("pos")
    val lines = robots.select(col("domain"),
      posexplode(split(col(txtCol), "\n")).as(Seq("pos", "line")))
    val parsed = lines
      .withColumn("__g_ln", regexp_replace(col("line"), "#.*", ""))
      .withColumn("__g_ua", lower(regexp_extract(col("__g_ln"),
        "(?i)^[ \\t]*user-agent[ \\t]*:[ \\t]*([^ \\t]*)", 1)))
      .withColumn("__g_al", regexp_extract(col("__g_ln"),
        "(?i)^[ \\t]*allow[ \\t]*:[ \\t]*([^ \\t]*)", 1))
      .withColumn("__g_di", regexp_extract(col("__g_ln"),
        "(?i)^[ \\t]*disallow[ \\t]*:[ \\t]*([^ \\t]*)", 1))
      .withColumn("__g_isua", col("__g_ua") =!= "")
      .withColumn("__g_gid", sum(
        (col("__g_isua") &&
          !coalesce(lag(col("__g_isua"), 1).over(w), lit(false)))
          .cast("int")).over(w))
    val uas = parsed.filter(col("__g_isua"))
      .select(col("domain"), col("__g_gid").as("gid"),
        col("__g_ua").as("ua"))
    val rules = parsed
      .filter(col("__g_al") =!= "" || col("__g_di") =!= "")
      .select(col("domain"), col("__g_gid").as("gid"),
        when(col("__g_al") =!= "", "allow").otherwise("disallow")
          .as("rtype"),
        when(col("__g_al") =!= "", col("__g_al")).otherwise(col("__g_di"))
          .as("rpath"))
    val groups = uas.groupBy(col("domain"), col("gid")).agg(
      max(when(col("ua") === agent.toLowerCase(java.util.Locale.ROOT), 1)
        .otherwise(0)).as("__g_isagent"),
      max(when(col("ua") === "*", 1).otherwise(0)).as("__g_isstar"))
    val domains = groups.groupBy(col("domain"))
      .agg(max(col("__g_isagent")).as("__g_hasagent"))
    rules
      .join(groups, Seq("domain", "gid"))
      .join(domains, Seq("domain"))
      .filter((col("__g_hasagent") === 1 && col("__g_isagent") === 1) ||
        (col("__g_hasagent") === 0 && col("__g_isstar") === 1))
      .select(col("domain"), col("rtype"), col("rpath"))
  }

  /** X117 — the robots.txt crawl gate: every row comes back with
    * `url_norm`/`domain` (the [[Curation.normalizeUrl]] columns) plus
    *
    *  - `robots_disposition` — `malformed` (URL didn't parse — no
    *    identity, no verdict, x107's rule), `blocked` (a `Disallow`
    *    rule decided), `allowed` (an `Allow` rule decided, no rule
    *    matched, or the domain has no robots file — the web default);
    *  - `matched_rule` — the deciding rule's path, `''` when none
    *    decided.
    *
    * The verdict (RFC 9309 §2.2.2): among the selected rules whose path
    * literally prefixes the URL's canonical path-plus-query, the
    * LONGEST wins; an `Allow`/`Disallow` tie at the same length goes to
    * `Allow`. Encoded as one integer key `2·len + isAllow` so the
    * maximum IS the verdict — and because two same-length prefixes of
    * one string are equal, key ties can only carry the same path, so
    * the winner is deterministic on any engine and any evaluation
    * order.
    *
    * Scale shape: rules are collapsed to ONE array row per domain
    * (bounded by the 500 KiB file cap), so the gate is a single
    * domain-keyed equi-join plus a narrow higher-order-function verdict
    * per row — no per-rule row explosion on the corpus side, no
    * re-aggregation, no join-back; columns pass through untouched.
    * Stateless given the frozen rule table, so it rides Structured
    * Streaming as a stream-static join unchanged
    * ([[graft.streaming.StreamOps.gateByRobotsTxt]]). A curated-crawl
    * rule table small enough to broadcast composes with a broadcast
    * hint on `rules`; web-scale (~10⁸ domains) stays a shuffle join. */
  def robotsTxtGate(docs: DataFrame, rules: DataFrame,
      urlCol: String = "url"): DataFrame = {
    val byDomain = rules.groupBy(col("domain"))
      .agg(collect_list(struct(col("rtype"), col("rpath")))
        .as("__g_rules"))
    val staged = Curation.normalizeUrl(docs, urlCol)
      .join(byDomain, Seq("domain"), "left")
      .withColumn("__g_pq0",
        regexp_extract(col("url_norm"), "^[^:/?#]+://[^/?]*(.*)$", 1))
      .withColumn("__g_pq", when(col("__g_pq0").startsWith("/"),
        col("__g_pq0")).otherwise(concat(lit("/"), col("__g_pq0"))))
      .withColumn("__g_best", array_max(transform(
        filter(col("__g_rules"),
          r => startswith(col("__g_pq"), r.getField("rpath"))),
        r => struct(
          (length(r.getField("rpath")) * 2 +
            when(r.getField("rtype") === "allow", 1).otherwise(0))
            .as("k"),
          r.getField("rpath").as("p")))))
    staged
      .withColumn("robots_disposition",
        when(col("domain").isNull, "malformed")
          .when(col("__g_best").isNull, "allowed")
          .when(col("__g_best").getField("k") % 2 === 1, "allowed")
          .otherwise("blocked"))
      .withColumn("matched_rule",
        when(col("domain").isNull || col("__g_best").isNull, "")
          .otherwise(col("__g_best").getField("p")))
      .drop("__g_rules", "__g_pq0", "__g_pq", "__g_best")
  }

  /** Deterministic robots.txt fixture for the x117 driver row (the
    * x28/x106/x110 fixture pattern): one file per registrable domain of
    * the [[Curation.urlFixture]] URL space, content driven by the brand
    * number `b` and the tld class `t`, replayed byte-for-byte by the
    * oracle generator. Every parsing/matching policy is exercised
    * NON-VACUOUSLY so any rule failing open or closed breaks the hash:
    *
    *  - `b % 7 == 3` domains have NO file at all (absent ⟹ allowed; a
    *    distinct path from `b = 15`'s present-but-empty star group);
    *  - an ORPHAN `Disallow: /` before any group on `b % 10 == 7` — a
    *    parser that promotes orphans to global (or attaches them
    *    backward) blocks the whole domain and breaks the hash;
    *  - an `OtherBot` group disallowing everything — group selection
    *    must keep it away from [[CrawlerAgent]];
    *  - a `*` group with: prefix rule `/p/1` (blocks `/p/10`/`/p/11`
    *    too) on even `b`; `Allow: /p/11` on `b % 4 == 0` (longest-match
    *    override, live at brand0.com); a same-path Allow/Disallow TIE on
    *    `b % 5 == 1` (allow wins, live at brand6.com); an UPPERCASE
    *    `DISALLOW: /p/7` on `b % 3 == 1`; an empty `Disallow:` on
    *    `b % 6 == 2` (declares nothing); `Disallow: /` on every
    *    `.com.au` domain (the pathless-URL `/` match); a trailing
    *    comment on `b % 11 == 6`;
    *  - a SECOND `*` group on `b % 6 == 0` (`/p/3` — same-agent groups
    *    merge, live at brand6.co.uk);
    *  - an agent group on `b % 4 == 1` (header case-variant
    *    `User-Agent: GraftBot` on `b % 8 == 5`) — when present the `*`
    *    group is IGNORED (live on `.com.au`: star blocks all, agent
    *    doesn't);
    *  - a SHARED-header group (`graftbot` + `otherbot`) on `b % 9 == 4`
    *    — merges with the `b % 4 == 1` group at `b = 13`. */
  def robotsFixture(docs: DataFrame): DataFrame = {
    val domains = Curation.normalizeUrl(Curation.urlFixture(docs))
      .select(col("domain")).filter(col("domain").isNotNull).distinct()
    val withKeys = domains
      .withColumn("__g_b",
        regexp_extract(col("domain"), "^brand([0-9]+)\\.", 1).cast("long"))
      .withColumn("__g_t", when(col("domain").endsWith(".co.uk"), 0)
        .when(col("domain").endsWith(".com.au"), 1).otherwise(2))
    val b = col("__g_b")
    val t = col("__g_t")
    val nl = "\n"
    def line(cond: Column, text: String): Column =
      when(cond, nl + text).otherwise("")
    val txt = concat(
      concat(lit("# robots brand"), b.cast("string"), lit(" t"),
        t.cast("string")),
      line(b % 10 === 7, "Disallow: /"),
      lit(nl + nl + "User-agent: OtherBot" + nl + "Disallow: /"),
      lit(nl + nl + "User-agent: *"),
      line(b % 2 === 0, "Disallow: /p/1"),
      line(b % 4 === 0, "Allow: /p/11"),
      line(b % 5 === 1, "Disallow: /p/2" + nl + "Allow: /p/2"),
      line(b % 3 === 1, "DISALLOW: /p/7"),
      line(b % 6 === 2, "Disallow:"),
      line(t === 1, "Disallow: /"),
      line(b % 11 === 6, "Disallow: /p/4 # trailing"),
      line(b % 6 === 0, nl + "User-agent: *" + nl + "Disallow: /p/3"),
      when(b % 4 === 1, concat(
        lit(nl + nl),
        when(b % 8 === 5, "User-Agent: GraftBot")
          .otherwise("User-agent: graftbot"),
        when(t === 2, nl + "Allow: /p/").otherwise(""),
        lit(nl + "Disallow: /p/5"))).otherwise(""),
      line(b % 9 === 4, nl + "User-agent: graftbot" + nl +
        "User-agent: otherbot" + nl + "Disallow: /p/9"))
    withKeys.filter(b % 7 =!= 3)
      .select(col("domain"), txt.as("robots_txt"))
  }
}

package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The HTML plane — the crawl-native stage UPSTREAM of every text operator:
  * a crawl stores fetched pages as HTML; the documents every other operator
  * in this library consumes (dedup, quality, LM, packing) only exist after
  * an extraction pass turns markup into text, and the web graph a curation
  * pipeline weighs domains with (RefinedWeb §3.1 reads WARC, not WET,
  * precisely to own this step; C4 starts from already-extracted WET but
  * every modern pipeline re-extracts) only exists after an outlink pass.
  *
  * Two operators, one policy surface:
  *
  *  - [[extractText]] (x110) — markup → text, each stage an explicit,
  *    ordered rule shared with the DuckDB oracle;
  *  - [[extractOutlinks]] (x111 feeds) — `href` targets, absolute
  *    http(s) only, comments stripped FIRST so commented-out markup can
  *    never contribute a link.
  *
  * Both are pure narrow codegen'd column work — regexp stages staged as
  * REAL intermediate columns (the x107 lesson: inlined non-cheap producers
  * referenced more than once re-run their whole regexp chain per consumer;
  * staged attributes survive CollapseProject) — zero shuffles, zero state,
  * so they compose unchanged under Structured Streaming and sit on the
  * scan at 100 TB.
  *
  * Regex dialect note: every pattern here is written in the subset Java
  * regex (the engine) and RE2 (the DuckDB oracle) read identically — no
  * backtracking constructs, no `\s` (the two engines disagree on vertical
  * tab; explicit `[ \t\n\r]` classes instead), inline `(?is)` flags only.
  */
object Html {

  /** The entity subset [[extractText]] decodes, IN ORDER — `&amp;` LAST,
    * the standard decode order that keeps a double-escaped `&amp;lt;`
    * rendering as the literal text `&lt;` instead of a phantom `<`.
    * `&nbsp;` decodes to a plain space (it then collapses with its
    * neighbors — a non-breaking space is layout, not content). Shared
    * VERBATIM with the x110 oracle generator. A full named-entity table is
    * a deployment artifact; this explicit constant is the policy surface. */
  val EntityDecodes: Seq[(String, String)] = Seq(
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&nbsp;" -> " ",
    "&amp;" -> "&")

  /** X110 — HTML → text extraction. The `text` column is REPLACED by the
    * extraction of `htmlCol` (pipeline-composable: everything downstream —
    * scrub, quality, dedup — runs on the result unchanged), with
    * `html_len` / `text_len` appended (the extraction-ratio signal a
    * quality gate reads: boilerplate-heavy chrome pages extract short).
    *
    * The policy, each stage an explicit ordered rule shared with the
    * oracle:
    *
    *  1. comments stripped (`<!-- … -->`, dotall) — FIRST, so markup
    *     hidden inside a comment can never surface as text or links;
    *  2. `<script>` blocks stripped whole (tag + content, non-greedy to
    *     the closing tag) — script BODIES are code, not text, and a bare
    *     tag-strip would leak them;
    *  3. `<style>` blocks stripped whole, same rule;
    *  4. every remaining tag → one space (`<[^>]*>` — attributes and all;
    *     block/inline distinction is layout, and the whitespace collapse
    *     erases it anyway);
    *  5. the [[EntityDecodes]] subset decoded, in order, `&amp;` last.
    *     Decode runs AFTER tag-strip by design: `&lt;here&gt;` is the
    *     AUTHOR writing a literal angle bracket, so the decoded `<here>`
    *     must survive as text, never be re-read as a tag;
    *  6. runs of whitespace (`[ \t\n\r]+`) collapse to one space; ends
    *     trimmed.
    *
    * Malformed markup degrades, never throws (the x73 doctrine): an
    * unclosed `<script>` block is not matched by stage 2 (non-greedy to a
    * closing tag that never comes), so stage 4 strips the dangling open
    * tag and the body degrades to visible text; a dangling `<` pairs with
    * the next `>` as one tag. Both are the documented honest failure
    * modes of regexp extraction — a crawl pipeline routes pathological
    * pages by the extraction RATIO (`text_len / html_len`), not by
    * expecting a parser to bless them. */
  def extractText(docs: DataFrame, htmlCol: String = "html"): DataFrame = {
    val staged = docs
      .withColumn("__g_nc",
        regexp_replace(col(htmlCol), "(?s)<!--.*?-->", " "))
      .withColumn("__g_ns", regexp_replace(col("__g_nc"),
        "(?is)<script\\b[^>]*>.*?</script>", " "))
      .withColumn("__g_nst", regexp_replace(col("__g_ns"),
        "(?is)<style\\b[^>]*>.*?</style>", " "))
      .withColumn("__g_nt",
        regexp_replace(col("__g_nst"), "<[^>]*>", " "))
      .withColumn("__g_dec", EntityDecodes.foldLeft(col("__g_nt")) {
        case (c, (ent, ch)) => replace(c, lit(ent), lit(ch))
      })
      .withColumn("__g_txt",
        trim(regexp_replace(col("__g_dec"), "[ \\t\\n\\r]+", " ")))
    staged
      .withColumn("html_len", length(col(htmlCol)))
      .withColumn("text_len", length(col("__g_txt")))
      .withColumn("text", col("__g_txt"))
      .drop("__g_nc", "__g_ns", "__g_nst", "__g_nt", "__g_dec", "__g_txt")
  }

  /** Outlink extraction — one `(…, link)` row per `href` whose target is
    * an ABSOLUTE http(s) URL (relative links resolve against a base URL
    * the row may not carry and never leave the site's own domain — the
    * domain-graph consumer gains nothing from them; a crawl frontier that
    * wants them resolves them at fetch time where the base is in hand).
    * Both quoting styles are read (`href="…"` / `href='…'`, attribute
    * name and scheme case-insensitive); comments are stripped FIRST with
    * [[extractText]]'s stage-1 rule, so a commented-out anchor can never
    * contribute an edge. Multiplicity is preserved — a page linking a
    * target three times asserts the edge three times; collapsing is the
    * aggregate's job (x111 counts, a PageRank-style consumer weighs).
    *
    * Scale shape: one comment-strip + two `regexp_extract_all` passes
    * staged as real columns, one explode — narrow end to end; the
    * downstream x111 edge aggregate is the plane's only shuffle. */
  def extractOutlinks(docs: DataFrame, htmlCol: String = "html"): DataFrame = {
    val staged = docs
      .withColumn("__g_nc",
        regexp_replace(col(htmlCol), "(?s)<!--.*?-->", " "))
      .withColumn("__g_links", concat(
        regexp_extract_all(col("__g_nc"),
          lit("(?i)href[ \\t\\n\\r]*=[ \\t\\n\\r]*\"(https?://[^\"]*)\""),
          lit(1)),
        regexp_extract_all(col("__g_nc"),
          lit("(?i)href[ \\t\\n\\r]*=[ \\t\\n\\r]*'(https?://[^']*)'"),
          lit(1))))
    staged.drop("__g_nc")
      .withColumn("link", explode(col("__g_links")))
      .drop("__g_links")
  }

  /** X111 — the domain-level web graph: one `(src_domain, dst_domain,
    * n_links)` row per ordered pair of registrable domains with at least
    * one link, multiplicity counted. The graph every crawl-curation
    * quality weight is computed ON (OPIC/harmonic-centrality seeds,
    * spam-neighborhood flags); self-loops (site-internal absolute links)
    * are kept — in-template self-links are themselves a boilerplate
    * signal. Rows whose SOURCE URL does not canonicalize are excluded
    * (no src identity — x107's malformed rule), as are links that do not
    * canonicalize (defensive: the extraction pattern already guarantees
    * parseability).
    *
    * Scale shape: source-domain parse + link extraction ride the scan
    * (narrow, one pass — [[Curation.normalizeUrl]] on the page URL
    * BEFORE the explode, so the per-doc parse is never re-run per link);
    * ONE domain-pair aggregate with map-side partials is the only
    * shuffle, and its key space is registrable DOMAINS (web-scale ≈ 10⁸)
    * not URLs. */
  def domainEdges(docs: DataFrame, urlCol: String = "url",
      htmlCol: String = "html"): DataFrame = {
    val src = Curation.normalizeUrl(
        docs.filter(Curation.urlParses(col(urlCol))), urlCol)
      .select(col("doc_id"), col("domain").as("src_domain"), col(htmlCol))
    val links = extractOutlinks(src, htmlCol)
      .select(col("doc_id"), col("src_domain"), col("link"))
    Curation.normalizeUrl(links, "link")
      .filter(col("domain").isNotNull)
      .groupBy(col("src_domain"), col("domain").as("dst_domain"))
      .agg(count(lit(1)).as("n_links"))
  }

  /** X118 — anchor-text aggregation: one `(dst_domain, term, n_mentions,
    * n_pages)` row per (target registrable domain, anchor-text term) —
    * the description OTHER pages give a domain, the classic off-page
    * relevance/quality signal (anchor text is how web search learned
    * what a page is about before reading it; a curation pipeline uses
    * the same aggregate to label domains and spot anchor spam —
    * thousands of pages all saying "cheap pills" about one domain).
    *
    * Extraction policy: comments stripped FIRST (stage-1 rule — a
    * commented-out anchor contributes nothing); an anchor is an
    * `<a … href="…absolute http(s)…" …>text</a>` pair, both quote
    * styles, attribute/scheme case-insensitive, text captured
    * non-greedily to the first closing tag (nested anchors are
    * malformed HTML and degrade to double counting — documented, same
    * honest-regex doctrine as [[extractText]]). The text then runs the
    * [[extractText]] content stages scoped to the anchor: inner tags →
    * space, [[EntityDecodes]] in order, lowercase, whitespace collapse —
    * and splits on spaces into terms. Targets key by registrable domain
    * via [[Curation.normalizeUrl]]; non-canonicalizable targets are
    * excluded (no identity — x107's malformed rule). `n_mentions`
    * counts every (anchor, term) occurrence; `n_pages` the distinct
    * linking pages.
    *
    * Scale shape: extraction and text processing are narrow per-row
    * regex work on the scan; the explode fans out to (anchors × terms)
    * rows — bounded by the html length that produced them — and ONE
    * (domain, term)-keyed aggregate with map-side partials is the only
    * shuffle. Key space is domains × vocabulary, web-scale friendly;
    * the distinct-page count rides the same aggregate. */
  def anchorTerms(docs: DataFrame, htmlCol: String = "html"): DataFrame = {
    val dq = "(?is)<a\\b[^>]*href[ \\t\\n\\r]*=[ \\t\\n\\r]*" +
      "\"(https?://[^\"]*)\"[^>]*>(.*?)</a>"
    val sq = "(?is)<a\\b[^>]*href[ \\t\\n\\r]*=[ \\t\\n\\r]*" +
      "'(https?://[^']*)'[^>]*>(.*?)</a>"
    val staged = docs
      .withColumn("__g_nc",
        regexp_replace(col(htmlCol), "(?s)<!--.*?-->", " "))
      .withColumn("__g_pairs", concat(
        arrays_zip(
          regexp_extract_all(col("__g_nc"), lit(dq), lit(1)).as("link"),
          regexp_extract_all(col("__g_nc"), lit(dq), lit(2)).as("atext")),
        arrays_zip(
          regexp_extract_all(col("__g_nc"), lit(sq), lit(1)).as("link"),
          regexp_extract_all(col("__g_nc"), lit(sq), lit(2)).as("atext"))))
      .withColumn("__g_pair", explode(col("__g_pairs")))
      .withColumn("link", col("__g_pair").getField("link"))
      .withColumn("__g_t0", regexp_replace(
        col("__g_pair").getField("atext"), "<[^>]*>", " "))
      .withColumn("__g_t1", EntityDecodes.foldLeft(col("__g_t0")) {
        case (c, (ent, ch)) => replace(c, lit(ent), lit(ch))
      })
      .withColumn("__g_txt", lower(trim(
        regexp_replace(col("__g_t1"), "[ \\t\\n\\r]+", " "))))
    Curation.normalizeUrl(staged, "link")
      .filter(col("domain").isNotNull)
      .withColumn("term", explode(split(col("__g_txt"), " ")))
      .filter(col("term") =!= "")
      .groupBy(col("domain").as("dst_domain"), col("term"))
      .agg(count(lit(1)).as("n_mentions"),
        countDistinct(col("doc_id")).as("n_pages"))
  }

  /** X122 — the page's DECLARED language: every row comes back with
    * `lang_attr` (the `<html lang="…">` value verbatim, `''` when the
    * page declares none) and `lang_primary` (the lowercased primary
    * subtag — `EN-US` → `en`; NULL when nothing was declared). The
    * cheap language prior every crawl pipeline reads before paying for
    * detection (x8's n-gram langId): the production pattern is
    * declared-as-prior, detected-as-verdict, and a DISAGREEMENT between
    * the two is itself a quality signal (machine-translated spam
    * routinely declares `en` over non-English text) — the comparison is
    * a one-column join the consumer writes.
    *
    * Policy: comments stripped first; the attribute must be the `lang`
    * attribute proper (whitespace before the name — `xml:lang` and
    * `data-lang` don't read); both quote styles, double-quoted wins
    * when both appear; name and tag case-insensitive; value trimmed;
    * the primary subtag is the leading alphanumeric run. Narrow,
    * stateless, streaming-composable. */
  def declaredLanguage(docs: DataFrame, htmlCol: String = "html"): DataFrame = {
    val dq = "(?is)<html\\b[^>]*[ \\t\\n\\r]lang[ \\t\\n\\r]*=" +
      "[ \\t\\n\\r]*\"([^\"]*)\""
    val sq = "(?is)<html\\b[^>]*[ \\t\\n\\r]lang[ \\t\\n\\r]*=" +
      "[ \\t\\n\\r]*'([^']*)'"
    val staged = docs
      .withColumn("__g_nc",
        regexp_replace(col(htmlCol), "(?s)<!--.*?-->", " "))
      .withColumn("__g_l1", regexp_extract(col("__g_nc"), dq, 1))
      .withColumn("__g_l2", regexp_extract(col("__g_nc"), sq, 1))
      .withColumn("lang_attr", trim(
        when(col("__g_l1") =!= "", col("__g_l1")).otherwise(col("__g_l2"))))
    staged
      .withColumn("lang_primary", when(col("lang_attr") === "", lit(null))
        .otherwise(lower(regexp_extract(col("lang_attr"),
          "^([A-Za-z0-9]+)", 1))))
      .drop("__g_nc", "__g_l1", "__g_l2")
  }

  /** Block-level tags for [[contentBlocks]]' segmentation — a tag from
    * this list (open or close) ends one block and starts the next;
    * everything else (`<a>`, `<b>`, `<span>`, …) is inline and stays
    * inside its block. `<br>`/`<hr>` are separators here (the boilerpipe
    * convention — a forced break usually separates content units).
    * Longer names first so both regex engines try the same alternative
    * first (the `\b` guard makes order semantically moot; fixed order
    * makes it provably moot). Shared with the x121 oracle generator. */
  val BlockTags: Seq[String] = Seq(
    "blockquote", "fieldset", "article", "section", "header", "footer",
    "aside", "table", "thead", "tbody", "title", "main", "meta", "form",
    "html", "head", "body", "link", "nav", "pre", "div", "h[1-6]", "dl",
    "dt", "dd", "tr", "td", "th", "ul", "ol", "li", "hr", "br", "p")

  /** The block-boundary pattern [[contentBlocks]] splits on (both
    * engines keep empty segments, so positions align). */
  val BlockTagPattern: String =
    "(?i)</?(" + BlockTags.mkString("|") + ")\\b[^>]*>"

  /** Minimum words for a block to qualify as content (jusText/boilerpipe
    * family heuristic — chrome is short). Shared with the oracle. */
  val ContentMinWords: Int = 5

  /** Maximum anchor-word share (percent) for a content block — a block
    * whose words sit mostly inside links is navigation, however long
    * (the link-density rule, THE boilerpipe discriminator). Integer
    * percent so the verdict is integer arithmetic on both engines. */
  val ContentMaxLinkDensityPct: Int = 33

  /** X121 — single-document content-block extraction by link density
    * (the jusText/boilerpipe heuristic): the page splits into blocks at
    * [[BlockTags]] boundaries, and each block is judged CONTENT when it
    * carries at least [[ContentMinWords]] words AND at most
    * [[ContentMaxLinkDensityPct]] percent of them inside anchors —
    * `n_anchor_words · 100 ≤ pct · n_words`, integer on both engines.
    * The SINGLE-DOC complement of the corpus-df boilerplate tiers (x48
    * needs document frequency across a corpus; this reads one page in
    * isolation — the filter RefinedWeb applies at extraction, before
    * any corpus exists). Flags, not filters: every non-empty block is
    * emitted as `(doc_id, block_idx, n_words, n_anchor_words,
    * is_content, text)`; [[mainContent]] is the keep-content fold.
    *
    * Processing policy: comments, then whole `<script>`/`<style>`
    * blocks stripped ([[extractText]] stages 1–3); the split keeps
    * empty segments so `block_idx` is stable; per block, anchor words
    * come from `<a …>text</a>` bodies and both the block text and the
    * anchor text run the content stages (inline tag strip,
    * [[EntityDecodes]] in order, whitespace collapse). An anchor split
    * across a block boundary (malformed nesting) loses its tail to the
    * next block — the documented honest-regex degradation.
    *
    * Scale shape: narrow per-row regex work + one bounded explode
    * (blocks per page bounded by the html that produced them); no
    * shuffle at all — stateless, streaming-composable. */
  def contentBlocks(docs: DataFrame, htmlCol: String = "html",
      minWords: Int = ContentMinWords,
      maxLinkDensityPct: Int = ContentMaxLinkDensityPct): DataFrame = {
    def clean(c: Column): Column =
      trim(regexp_replace(
        EntityDecodes.foldLeft(regexp_replace(c, "<[^>]*>", " ")) {
          case (x, (ent, ch)) => replace(x, lit(ent), lit(ch))
        }, "[ \\t\\n\\r]+", " "))
    def words(c: Column): Column =
      size(filter(split(c, " "), w => w =!= ""))
    val staged = docs
      .withColumn("__g_nc",
        regexp_replace(col(htmlCol), "(?s)<!--.*?-->", " "))
      .withColumn("__g_ns", regexp_replace(col("__g_nc"),
        "(?is)<script\\b[^>]*>.*?</script>", " "))
      .withColumn("__g_nst", regexp_replace(col("__g_ns"),
        "(?is)<style\\b[^>]*>.*?</style>", " "))
      .select(col("*"), posexplode(split(col("__g_nst"), BlockTagPattern))
        .as(Seq("block_idx", "__g_seg")))
      .withColumn("__g_atxt", concat_ws(" ", regexp_extract_all(
        col("__g_seg"), lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1))))
      .withColumn("text", clean(col("__g_seg")))
      .withColumn("n_words", words(col("text")))
      .withColumn("n_anchor_words", words(clean(col("__g_atxt"))))
    staged
      .filter(col("text") =!= "")
      .withColumn("is_content", col("n_words") >= minWords &&
        col("n_anchor_words") * 100 <= lit(maxLinkDensityPct) * col("n_words"))
      .drop("__g_nc", "__g_ns", "__g_nst", "__g_seg", "__g_atxt")
  }

  /** The keep-content fold over [[contentBlocks]]: one row per document
    * whose `text` is the content blocks joined in block order — what the
    * extraction stage hands the text pipeline when the consumer wants
    * the verdicts applied (documents with NO content block are absent;
    * routing them is the owner's call, per the flags doctrine). One
    * doc-keyed aggregate; block order rides `block_idx`. */
  def mainContent(docs: DataFrame, htmlCol: String = "html"): DataFrame =
    contentBlocks(docs, htmlCol)
      .filter(col("is_content"))
      .groupBy(col("doc_id"))
      .agg(concat_ws(" ", array_sort(collect_list(
        struct(col("block_idx"), col("text")))).getField("text"))
        .as("text"),
        sum(col("n_words")).as("n_words"))

  /** X114 — the meta-robots crawl gate: every row comes back with
    * `noindex` / `nofollow` booleans read from the page's own
    * `<meta name="robots" content="…">` directive — flags, NOT filters
    * (the x73/x108 routing doctrine: a noindex page exits the training
    * corpus and the link graph keeps or drops its edges per `nofollow`;
    * the pipeline OWNER applies the verdict). The directive every polite
    * crawl pipeline honors BEFORE any content judgement.
    *
    * Policy (explicit, shared with the oracle): comments stripped first
    * (a commented-out directive is not a directive); attribute order free
    * (name-first and content-first both read, name-first wins when both
    * match); tag, attribute names, `robots`, and the directives
    * case-insensitive; either quote style on `name`, double quotes on
    * `content` (an unquoted content value is not read — documented);
    * directives split on commas, whitespace-trimmed; `noindex` ⟸
    * `noindex` or `none`, `nofollow` ⟸ `nofollow` or `none`; no
    * directive ⟹ both false (index,follow is the web default). One
    * directive per page is read (the FIRST match — duplicate meta-robots
    * tags are malformed input and first-wins is the documented
    * degradation).
    *
    * Scale shape: two anchored regexes + array ops per row, staged as
    * real columns — narrow, stateless, streaming-composable. */
  def robotsGate(docs: DataFrame, htmlCol: String = "html"): DataFrame = {
    val nameFirst = "(?i)<meta\\b[^>]*name[ \\t\\n\\r]*=[ \\t\\n\\r]*" +
      "[\"']robots[\"'][^>]*content[ \\t\\n\\r]*=[ \\t\\n\\r]*\"([^\"]*)\""
    val contentFirst = "(?i)<meta\\b[^>]*content[ \\t\\n\\r]*=" +
      "[ \\t\\n\\r]*\"([^\"]*)\"[^>]*name[ \\t\\n\\r]*=[ \\t\\n\\r]*" +
      "[\"']robots[\"']"
    val staged = docs
      .withColumn("__g_nc",
        regexp_replace(col(htmlCol), "(?s)<!--.*?-->", " "))
      .withColumn("__g_c1", regexp_extract(col("__g_nc"), nameFirst, 1))
      .withColumn("__g_c2", regexp_extract(col("__g_nc"), contentFirst, 1))
      .withColumn("__g_dirs", transform(
        split(lower(when(col("__g_c1") =!= "", col("__g_c1"))
          .otherwise(col("__g_c2"))), ","),
        d => trim(d)))
    staged
      .withColumn("noindex", array_contains(col("__g_dirs"), "noindex") ||
        array_contains(col("__g_dirs"), "none"))
      .withColumn("nofollow", array_contains(col("__g_dirs"), "nofollow") ||
        array_contains(col("__g_dirs"), "none"))
      .drop("__g_nc", "__g_c1", "__g_c2", "__g_dirs")
  }

  /** X115 — the declared-canonical identity key: every row comes back
    * with `canonical_key` (the [[Curation.normalizeUrl]]-canonical form
    * of the page's `<link rel="canonical" href="…">` target when the page
    * declares an ABSOLUTE http(s) one, else of its own fetch URL) and
    * `canonical_src` (`declared` / `fetch`). THE production URL-dedup
    * refinement x107 alone cannot see: mirrors, mobile subdomains, and
    * parameterized variants of one page declare a COMMON canonical that
    * no fetch-URL normalization can recover — dedup keyed on
    * `canonical_key` merges them ([[TextDedup.urlDedup]]'s keep-min
    * convention applies downstream, x115's driver row).
    *
    * Policy: comments stripped first; attribute order free (rel-first
    * wins), tag/attributes/`canonical` case-insensitive, either quote
    * style on `rel`, double quotes on `href`; a RELATIVE declared
    * canonical is ignored (resolution needs a base the row may not carry
    * — the fetch-URL fallback is the honest verdict, pinned by the
    * fixture); a page whose declared target and fetch URL are BOTH
    * unparseable gets NULL `canonical_key` (no identity — x107's
    * malformed rule).
    *
    * Scale shape: two anchored regexes + one [[graft.functions
    * .UrlNormalize]] kernel call per row — narrow, stateless,
    * streaming-composable. */
  def canonicalKey(docs: DataFrame, urlCol: String = "url",
      htmlCol: String = "html"): DataFrame = {
    import org.apache.spark.sql.GraftExpressionBridge.{column => c, expression => x}
    val relFirst = "(?i)<link\\b[^>]*rel[ \\t\\n\\r]*=[ \\t\\n\\r]*" +
      "[\"']canonical[\"'][^>]*href[ \\t\\n\\r]*=[ \\t\\n\\r]*\"([^\"]*)\""
    val hrefFirst = "(?i)<link\\b[^>]*href[ \\t\\n\\r]*=[ \\t\\n\\r]*" +
      "\"([^\"]*)\"[^>]*rel[ \\t\\n\\r]*=[ \\t\\n\\r]*[\"']canonical[\"']"
    val staged = docs
      .withColumn("__g_nc",
        regexp_replace(col(htmlCol), "(?s)<!--.*?-->", " "))
      .withColumn("__g_r1", regexp_extract(col("__g_nc"), relFirst, 1))
      .withColumn("__g_r2", regexp_extract(col("__g_nc"), hrefFirst, 1))
      .withColumn("__g_decl", when(col("__g_r1") =!= "", col("__g_r1"))
        .otherwise(col("__g_r2")))
      .withColumn("__g_abs", col("__g_decl").rlike("^(?i)https?://"))
      .withColumn("__g_eff",
        when(col("__g_abs"), col("__g_decl")).otherwise(col(urlCol)))
    staged
      .withColumn("canonical_src",
        when(col("__g_abs"), "declared").otherwise("fetch"))
      .withColumn("canonical_key", c(graft.functions.UrlNormalize(
        x(col("__g_eff")), Curation.TrackingParamPattern)))
      .drop("__g_nc", "__g_r1", "__g_r2", "__g_decl", "__g_abs", "__g_eff")
  }

  /** Deterministic HTML fixture for the x110/x111 driver rows (the
    * x28/x58/x106 fixture pattern — the synthetic corpus carries no HTML;
    * one is built from `doc_id` arithmetic and the document's own words,
    * replayed byte-for-byte by the oracle generator). Every policy stage
    * is exercised NON-VACUOUSLY, so any stage failing open breaks the
    * hash:
    *
    *  - body paragraphs: the document's words re-chunked 7 to a `<p>`
    *    (attribute-bearing tags — stage 4 must eat attributes);
    *  - a `<script>` block on even ids whose body contains `<`, `"` and
    *    braces (stage 2 must remove CONTENT, and before stage 4 — a bare
    *    tag-strip would leak `if (1 < 2) { track(…); }` into text);
    *  - a `<style>` block on `id % 3 == 0` (stage 3);
    *  - a comment on `id % 4 == 1` WRAPPING AN ANCHOR to a domain that
    *    appears nowhere else (`evil.example`) — stage 1 before stages
    *    4/link-extraction: one leaked comment edge poisons x111's hash;
    *  - an entity paragraph on `id % 5 == 0` covering all six
    *    [[EntityDecodes]] including double-escaping (`&amp;` decodes
    *    last);
    *  - 1–3 absolute nav links with urlFixture-style arithmetic (same
    *    Brand/tld branch values, so link domains COLLIDE with page
    *    domains in x111's edge space), one per-link uppercase
    *    `HREF`/`HTTPS` variant, tracking params and fragments for
    *    [[Curation.normalizeUrl]] to strip;
    *  - a single-quoted absolute link on `id % 7 == 0` (the second
    *    extraction pass);
    *  - a RICH anchor on `id % 8 == 3` whose text carries a nested
    *    `<b>` tag and `&amp;` ([[anchorTerms]]'s inner content stages
    *    fire under the oracle hash);
    *  - a `lang` attribute on the `<html>` tag by `id % 9` — plain,
    *    UPPERCASE with a region subtag, single-quoted, `pt-BR`, and a
    *    not-first-attribute placement; `id % 9 ≥ 5` declares nothing
    *    ([[declaredLanguage]]'s NULL branch);
    *  - a RELATIVE link on every doc (`/local/…`) that extraction must
    *    ignore;
    *  - a meta-robots directive on `id % 6 == 2` (`noindex, follow`) and
    *    `id % 6 == 5` (UPPERCASE, content-before-name attribute order) —
    *    both [[robotsGate]] patterns exercised;
    *  - a `rel=canonical` link on `id % 3 == 0`, pointing at a
    *    `brandc{(k DIV 2) % 23}.com` target so NEIGHBORING 125-classes
    *    declare one canonical ([[canonicalKey]]'s cross-class merges are
    *    engineered); the `id % 9 == 6` subset uses href-before-rel order
    *    with a single-quoted `rel`, and the `id % 21 == 9` subset
    *    declares a RELATIVE canonical that must fall back to the fetch
    *    URL. */
  def htmlFixture(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    def s(c: Column): Column = c.cast("string")
    val ws = split(col("text"), " ")
    val nChunks = ceil(size(ws).cast("double") / 7).cast("int")
    val paras = array_join(transform(sequence(lit(0), nChunks - 1),
      i => concat(lit("<p class=\"c"), s(i % 3), lit("\">"),
        array_join(slice(ws, i * 7 + 1, lit(7)), " "), lit("</p>"))), "")
    val navLinks = array_join(transform(sequence(lit(0), (d % 3).cast("int")),
      i => {
        val j = d * 3 + i
        val schemeB = when(j % 2 === 0, "https").otherwise("http")
        val upperV = j % 11 === 5
        val anchor = concat(
          when(upperV, "HREF").otherwise("href"), lit("=\""),
          when(upperV, upper(schemeB)).otherwise(schemeB), lit("://"),
          when(j % 3 === 0, "www.").otherwise(""),
          lit("Brand"), s(j % 23),
          when(j % 5 === 0, ".CO.UK").when(j % 5 === 1, ".com.au")
            .otherwise(".COM"),
          lit("/l/"), s(j % 9),
          when(j % 4 === 0, "?utm_source=nav")
            .when(j % 4 === 2, concat(lit("?id="), s(j % 7)))
            .otherwise(""),
          when(j % 3 === 1, "#f").otherwise(""),
          lit("\">more "), s(i), lit("</a>"))
        concat(lit("<a "), anchor)
      }), "")
    val squoted = when(d % 7 === 0, concat(lit("<a href='http://Brand"),
      s(d % 23), lit(".COM/s'>q</a>"))).otherwise(lit(""))
    // an anchor whose TEXT carries markup and an entity (x118's inner
    // content stages must fire under the oracle hash, not just in specs)
    val richAnchor = when(d % 8 === 3, concat(
      lit("<a href=\"https://Brand"), s(d % 23), lit(".COM/t/"), s(d % 6),
      lit("\"><b>Great &amp; cheap</b> deal "), s(d % 4), lit("</a>")))
      .otherwise(lit(""))
    val script = when(d % 2 === 0, concat(
      lit("<script type=\"text/javascript\">if (1 < 2) { track(\"d"),
      s(d), lit("\"); }</script>"))).otherwise(lit(""))
    val style = when(d % 3 === 0, lit("<style>.c0 { color: #111; }</style>"))
      .otherwise(lit(""))
    val comment = when(d % 4 === 1,
      lit("<!-- hidden <a href=\"https://evil.example/x\">spam</a> -->"))
      .otherwise(lit(""))
    val entities = when(d % 5 === 0, lit(
      "<p>Tom &amp; Jerry say &quot;hi&quot; &lt;here&gt;&nbsp;&#39;now&#39; &amp;lt;twice&amp;gt;</p>"))
      .otherwise(lit(""))
    val metaRobots = when(d % 6 === 2,
        lit("<meta name=\"robots\" content=\"noindex, follow\">"))
      .when(d % 6 === 5, lit("<META CONTENT=\"NOFOLLOW\" NAME=\"ROBOTS\">"))
      .otherwise(lit(""))
    // integer halving: Column./ on longs is DOUBLE division ("3.0" in the
    // rendered URL); DIV is the integral one. BOTH target components key
    // on k DIV 2 — neighboring classes (2j, 2j+1) must declare ONE
    // identical target or the engineered cross-class merge never fires
    val canonTarget = concat(lit("https://brandc"),
      s(expr("(doc_id % 125) DIV 2 % 23")),
      lit(".com/c/"), s(expr("(doc_id % 125) DIV 2 % 5")))
    val canonLink = when(d % 21 === 9,
        lit("<link rel=\"canonical\" href=\"/c/rel\">"))
      .when(d % 9 === 6, concat(lit("<link href=\""), canonTarget,
        lit("\" rel='canonical'>")))
      .when(d % 3 === 0, concat(lit("<link rel=\"canonical\" href=\""),
        canonTarget, lit("\">")))
      .otherwise(lit(""))
    // the declared-language attribute (x122): both quote styles, a case
    // variant, a region subtag, a not-first-attribute placement, and the
    // no-declaration default
    val langAttr = when(d % 9 === 0, " lang=\"en\"")
      .when(d % 9 === 1, " LANG=\"EN-US\"")
      .when(d % 9 === 2, " lang='fr'")
      .when(d % 9 === 3, " lang=\"pt-BR\"")
      .when(d % 9 === 4, " class=\"x\" lang=\"de\"")
      .otherwise("")
    docs.withColumn("html", concat(
      lit("<html"), langAttr, lit("><head><title>Doc "), s(d),
      lit("</title>"), style, script,
      metaRobots, canonLink,
      lit("</head><body>"), comment, lit("<nav>"), navLinks, squoted,
      richAnchor, lit("</nav>"), paras, entities,
      lit("<a href=\"/local/"), s(d % 5), lit("\">rel</a></body></html>")))
  }
}

package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy / normalization passes a training-data pipeline runs before
  * release: PII detection + redaction, and canonical text normalization.
  *
  * Both are NARROW per-document operators — pure column expressions, zero
  * shuffles at any corpus size, fully inside whole-stage codegen. The regex
  * constants live here and the DuckDB oracle SQL is generated from the SAME
  * values ([[graft.oracle.CorpusOracleSql]]), so engine and oracle cannot
  * drift. Patterns deliberately use only syntax Java regex and RE2 (DuckDB)
  * interpret identically: explicit character classes, bounded repetition, and
  * `\b` — no lookaround, no backreferences (RE2 has neither), and no `\s`
  * shorthand (Java's includes U+000B, RE2's does not — see
  * [[WhitespaceClass]]).
  */
object Privacy {

  /** RFC-5322-lite: the pragmatic email shape PII scrubbers match. */
  val EmailPattern = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""

  /** Dotted-quad IPv4 (no octet-range check — scrubbers over-match on
    * purpose; a false redaction is cheap, a leak is not). */
  val Ipv4Pattern = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""

  /** NANP-style dashed phone number. */
  val PhonePattern = """\b\d{3}-\d{3}-\d{4}\b"""

  /** Explicit whitespace class shared by [[normalizeText]] and its oracle.
    * Java's `\s` includes vertical tab (U+000B) but RE2's does not, so the
    * shorthand would let engine and oracle diverge on text containing `\x0B`
    * — both dialects interpret this explicit class identically. */
  val WhitespaceClass = """[ \t\n\x0B\f\r]"""

  /** Redaction tags, applied email → phone → ipv4. Counts are computed on the
    * ORIGINAL text (each pattern independently), so redaction order can never
    * change a reported count. NOTE: because counts are per-pattern on the raw
    * text, overlapping matches double-count — a digit-only email local part
    * like `555-123-4567@x.co` counts as one email AND one phone, while the
    * redacted text carries only the `<EMAIL>` tag (email wins by application
    * order email → phone → ip). Counts answer "how many of each shape were
    * seen", not "how many tags were written". */
  val Redactions: Seq[(String, String)] = Seq(
    EmailPattern -> "<EMAIL>",
    PhonePattern -> "<PHONE>",
    Ipv4Pattern -> "<IP>")

  /** PII scan + scrub: per-document match counts for each pattern (on the raw
    * text) and the redacted text. One projection, no shuffle. */
  def piiScrub(docs: DataFrame): DataFrame = {
    val redacted = Redactions.foldLeft(col("text")) { case (c, (pat, tag)) =>
      regexp_replace(c, pat, tag)
    }
    docs.select(col("doc_id"),
      regexp_count(col("text"), lit(EmailPattern)).as("n_emails"),
      regexp_count(col("text"), lit(PhonePattern)).as("n_phones"),
      regexp_count(col("text"), lit(Ipv4Pattern)).as("n_ipv4"),
      redacted.as("redacted"))
  }

  /** Canonical text normalization — the first pass of every corpus build:
    * lowercase, collapse any whitespace run to one space, trim. Reports
    * before/after char counts and a changed flag so the pipeline can audit
    * how much the pass touched. */
  def normalizeText(docs: DataFrame): DataFrame = {
    val norm = lower(trim(regexp_replace(col("text"), WhitespaceClass + "+", " ")))
    docs.select(col("doc_id"),
      norm.as("normalized"),
      length(col("text")).as("n_chars_raw"),
      length(norm).as("n_chars_norm"),
      when(norm === col("text"), 0).otherwise(1).as("changed"))
  }

  /** Deterministic PII fixture — the synthetic corpus carries no organic PII,
    * so the driver gate on the raw `documents` table would count zeros and
    * prove nothing. This appends doc_id-derived emails / phones / IPs to a
    * deterministic subset of documents; the oracle SQL replays the identical
    * arithmetic, so the x28 hash check exercises real matches. The FORMULA is
    * part of the x28 contract (mirrored in CorpusOracleSql.piiFixtureSql). */
  def syntheticPiiFixture(docs: DataFrame): DataFrame = {
    def s(c: Column): Column = c.cast("string")
    docs.withColumn("text", concat(col("text"),
      when(col("doc_id") % 7 === 0,
        concat(lit(" reach user"), s(col("doc_id")), lit("@data.example.com")))
        .otherwise(""),
      when(col("doc_id") % 11 === 0,
        concat(lit(" node 10."), s(col("doc_id") % 200 + 1), lit(".0."),
          s(col("doc_id") % 250 + 1))).otherwise(""),
      when(col("doc_id") % 13 === 0, lit(" call 555-867-5309"))
        .otherwise("")))
  }

  /** Deterministic messy-text fixture for [[normalizeText]] (same rationale as
    * [[syntheticPiiFixture]]): upper-cases every third document, doubles the
    * spaces of every fifth, pads every second with leading/trailing blanks,
    * and appends a vertical-tab-separated tail to every seventh — the U+000B
    * case where Java `\s` and RE2 `\s` disagree, so the oracle hash check
    * exercises the explicit [[WhitespaceClass]]. */
  def messyTextFixture(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      when(col("doc_id") % 2 === 0, concat(lit("  "), col("text"), lit(" ")))
        .otherwise(col("text")))
      .withColumn("text",
        when(col("doc_id") % 3 === 0, upper(col("text"))).otherwise(col("text")))
      .withColumn("text",
        when(col("doc_id") % 5 === 0, regexp_replace(col("text"), " ", "  "))
          .otherwise(col("text")))
      .withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit("\u000Bvt")))
          .otherwise(col("text")))
}

package graft.corpus

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators: deterministic domain-mixing (quota sampling) and
  * per-domain quality selection — the two decision steps a training-data
  * pipeline runs after scoring/dedup to assemble the final mix.
  */
object Curation {

  /** Tier thresholds for [[quotaSample]], indexed by `source suffix mod 3`:
    * a doc survives iff its 8-hex-digit gate is lexicographically below the
    * threshold ('g' > every hex digit = keep all; '8' ≈ 1/2; '4' ≈ 1/4).
    * Shared with the x23 oracle generator so the two cannot drift. */
  val TierThresholds: Seq[String] = Seq("g", "8", "4")

  /** Deterministic quota sampling — domain-mixing weights applied with a
    * reproducible content-hash gate instead of RNG: a document is kept iff the
    * first 8 hex digits of `md5(text)` are lexicographically below its
    * source's threshold (lowercase hex compares lexicographically exactly as
    * it compares numerically, so a threshold string IS the keep-rate). Tiers
    * here fan out by the numeric source suffix mod 3: 0 → keep all, 1 → keep
    * ~1/2 (`"8"`), 2 → keep ~1/4 (`"4"`). Reproducible end-to-end: re-running
    * the pipeline, or re-sampling after adding documents, never flips a
    * previously-kept document — the property RNG sampling cannot give.
    * Narrow, codegen'd, zero shuffles at any corpus size. */
  def quotaSample(docs: DataFrame, passthrough: String*): DataFrame = {
    // 2-arg substring (position to end), same parse window as the oracle's
    // substr(source, 4) — a bounded third argument would silently truncate
    // long suffixes to a DIFFERENT tier than the oracle computes
    // fail loudly on an unparseable suffix, exactly like the oracle's raising
    // CAST — a silent NULL would fall through the when-chain to the LAST
    // threshold and diverge from DuckDB without a red row to show for it
    val parsed = expr("try_cast(substring(source, 4) as int)")
    val tier = when(parsed.isNull, raise_error(concat(
        lit("quotaSample: source has no numeric tier suffix: "), col("source")))
        .cast("int"))
      .otherwise(parsed) % TierThresholds.size
    val threshold = TierThresholds.init.zipWithIndex.reverse
      .foldLeft(lit(TierThresholds.last)) { case (rest, (th, i)) =>
        when(tier === i, th).otherwise(rest)
      }
    docs.select(col("doc_id") +: col("source") +:
        substring(md5(encode(col("text"), "UTF-8")), 1, 8).as("gate") +:
        threshold.as("th") +: passthrough.map(col): _*)
      .filter(col("gate") < col("th"))
      .select(col("doc_id") +: col("source") +: col("gate") +:
        passthrough.map(col): _*)
  }

  /** Mix report — the composition audit every mixing run produces to confirm
    * the weights landed: per source, how many documents and tokens survived
    * [[quotaSample]]. Composes the sampler (narrow) with one map-side-partial
    * aggregate keyed on the domain; nothing corpus-sized ever moves. */
  def mixReport(docs: DataFrame): DataFrame =
    quotaSample(docs.withColumn("n_tokens", size(split(col("text"), " "))),
        "n_tokens")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))

  /** Per-domain quality selection: the `k` highest-quality documents of each
    * source (quality desc, doc_id asc tiebreak — fully deterministic). The
    * `source` column rides through the quality projection itself, so the ONLY
    * shuffle is the window's partition-by-source (a corpus self-join to
    * restore it would have doubled the data moved); skew is bounded by the
    * largest domain, with each domain's sort local to its partition. */
  def topKByQuality(docs: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id"))
    TextStats.quality(docs, "source")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("source"), col("doc_id"), col("quality"), col("rank"))
  }
}

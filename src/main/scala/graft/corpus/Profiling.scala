package graft.corpus

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling — the pre-training sanity pass over a table: per
  * column, its non-null count, null count, distinct cardinality, and numeric
  * min/max. ONE scan and one aggregate for every column together (distinct
  * counts share the shuffle via grouping-set expansion), then the single
  * result row is pivoted to one output row per column — profiling N columns
  * must never cost N table scans at 100 TB. */
object Profiling {

  /** Profile numeric columns: one row per column with
    * (column, n_values, n_nulls, n_distinct, min_value, max_value). */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}__n"),
      // count(1) - count(c), not sum(when(isNull)): sum over ZERO rows is
      // NULL, which would poison every profile row of an empty table
      (count(lit(1)) - count(col(c))).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__d"),
      min(col(c)).cast("double").as(s"${c}__min"),
      max(col(c)).cast("double").as(s"${c}__max")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col(s"${c}__n").as("n_values"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__d").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"))): _*)).as("p"))
      .select(col("p.*"))
  }

  /** Per-source document-length profile — the curation dashboard's first
    * chart: doc count, token-count min/max/quartiles, and total tokens per
    * source. Exact `percentile` matches DuckDB's `quantile_cont` bit for bit
    * (the q11 parity fact); at 100 TB you'd swap in `percentile_approx`
    * (t-digest sketch state instead of a per-group sorted buffer), which no
    * longer oracle-matches by design. One map-side-partial aggregate keyed on
    * the domain; nothing corpus-sized moves beyond the usual group shuffle. */
  def lengthProfile(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        size(split(col("text"), " ")).as("n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_tokens")).cast("long").as("min_tokens"),
        max(col("n_tokens")).cast("long").as("max_tokens"),
        percentile(col("n_tokens"), lit(0.25)).as("p25_tokens"),
        percentile(col("n_tokens"), lit(0.5)).as("p50_tokens"),
        percentile(col("n_tokens"), lit(0.75)).as("p75_tokens"),
        sum(col("n_tokens")).cast("long").as("sum_tokens"))

  /** Dataset card — the one-row release artifact summarizing a curated
    * corpus: document/source/language cardinalities, token and char totals,
    * exact-duplicate count (docs minus distinct content digests — X1's
    * definition), and mean quality score (X9's formula, mean via
    * round-then-DECIMAL-sum so aggregation order cannot move the hash).
    * Every number is a corpus-level scalar a dataset README quotes.
    *
    * Scale shape: one corpus scan into a global aggregate (map-side partial;
    * the three exact distinct counts expand the aggregate — the price of
    * exact cardinalities; a 100 TB run swaps `approx_count_distinct` (HLL)
    * and documents the estimate, no longer oracle-exact by design). */
  def datasetCard(docs: DataFrame): DataFrame =
    // ONE corpus scan: quality's projection already carries n_tokens/n_chars
    // (identical expressions to the ones the card sums), and text/source/lang
    // ride through as passthrough columns, so every card scalar — the
    // distinct counts, the token/char sums, the dup count, and mean quality —
    // is an aggregate of the same narrow pass (a counts ⨯ meanQ crossJoin of
    // two separate aggregations scanned the corpus twice)
    graft.corpus.TextStats.quality(docs, "source", "lang", "text").agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"),
      sum(col("n_tokens")).cast("long").as("n_tokens"),
      sum(col("n_chars")).cast("long").as("n_chars"),
      (count(lit(1)) - countDistinct(md5(encode(col("text"), "UTF-8"))))
        .as("n_dup_docs"),
      round(sum(round(col("quality"), 6).cast("decimal(18,6)")).cast("double")
        / count(lit(1)), 6).as("mean_quality"))

  /** X49 extended — the dataset card plus the audit planes a release
    * README actually quotes alongside the cardinalities (each as ONE
    * corpus-level scalar, so the card stays one row):
    *
    *  - `pack_split_frac` — the fraction of documents x31's
    *    concat-then-chunk packing would truncate mid-document at the
    *    shared budget (x95's split audit, corpus rollup);
    *  - `pack_padding_frac` — the per-tail padding fraction x97's
    *    boundary-respecting layout pays instead (the other side of the
    *    packing trade; together the two scalars ARE the packer decision);
    *  - `dense_recall_at_k` — mean recall@k of the default IVF candidate
    *    generator vs the exact baseline over the x94 audit slice
    *    (total hits / (slice × k) — an integer ratio, so aggregation
    *    order cannot move the hash);
    *  - `hardneg_yield` — the fraction of x93's requested negative slots
    *    actually filled (emitted negatives / (non-degenerate queries × k)):
    *    the margin-suppression audit — a near-dup-heavy corpus suppresses
    *    top candidates as unlabeled positives and the yield drops.
    *
    * Each plane is a one-row aggregate cross-joined (broadcast) onto the
    * base card; this self-contained form recomputes the planes from the raw
    * tables (the driver-query contract) by delegating to
    * [[datasetCardFrom]] with freshly built plane frames — a deployment
    * that has already materialized x93–x97 passes its persisted outputs to
    * [[datasetCardFrom]] directly and pays only the bounded rollups (the
    * `rm3TopKAgainst` persisted-artifact discipline). Construction is EAGER
    * (packNextFit's chain and hardNegatives' pool collect at build — their
    * documented snapshot semantics); treat the card as single-shot over an
    * immutable input. */
  def datasetCard(docs: DataFrame, emb: DataFrame): DataFrame = {
    // the four planes are INDEPENDENT and their construction is eager
    // (packNextFit's doubling chain, hardNegatives' pool checkpoint, the
    // recall generator's centroid collect) — build them on concurrent
    // DEDICATED driver threads (graft.util.DriverPar: never the shared
    // global fork-join pool, whose CPU-sized capacity blocking Spark
    // actions can starve — r17 advice; all four settle before any failure
    // rethrows, since Spark jobs can't be cancelled through a thread
    // handle — r17 review find). Each plane is the exact frame the
    // sequential form built, so the spec-pinned bit-equality to
    // datasetCardFrom is untouched.
    val Seq(p31, p97, rec, neg) = graft.util.DriverPar.settleAll(Seq(
      () => graft.corpus.Curation.packEfficiencyReport(docs),
      () => graft.corpus.Curation.packNextFit(docs),
      () => Similarity.denseRecallEval(emb),
      () => Similarity.hardNegatives(emb)))
    datasetCardFrom(docs, emb, p31, p97, rec, neg)
  }

  /** [[datasetCard]]'s persisted-plane form — build the extended card FROM
    * already-materialized audit-plane outputs instead of recomputing them:
    *
    *  - `pack31Report` — [[Curation.packEfficiencyReport]]'s per-source
    *    rows (the x95 audit over the x31 layout);
    *  - `pack97Layout` — [[Curation.packNextFit]]'s per-document layout
    *    rows (the x97 artifact a packer run writes anyway; the per-tail
    *    padding rollup [[Curation.packEfficiencyOf]] runs here is a
    *    layout-sized aggregate, not a re-pack);
    *  - `recallReport` — [[Similarity.denseRecallEval]]'s per-query rows
    *    (x94/x98);
    *  - `negPool` — [[Similarity.hardNegatives]]' emitted rows (x93).
    *
    * `emb` is still taken for the ONE scalar not derivable from any plane
    * output: the non-degenerate query count `n_q` (x93 emits only queries
    * that yielded negatives, x94's universe keeps degenerate vectors — so
    * neither frame can reconstruct it). That pass is `vec_id < numQueries`
    * over a narrow projection — parquet min/max pruning territory, not a
    * corpus pass. Everything else is a bounded rollup of the given frames
    * plus the base card's single docs scan; at 100 TB the packing chain and
    * the two embedding passes the self-contained form pays are NOT re-run.
    * Spec-pinned bit-equal to the self-contained [[datasetCard]] through a
    * parquet round-trip of every plane (`ProfilingSpec`). Plane/constant
    * mismatches are on the caller: pass planes built with the same budget /
    * k / numQueries you pass here. */
  def datasetCardFrom(docs: DataFrame, emb: DataFrame,
      pack31Report: DataFrame, pack97Layout: DataFrame,
      recallReport: DataFrame, negPool: DataFrame,
      budget: Int = graft.corpus.Curation.PackBudget,
      k: Int = Similarity.DefaultTopK,
      numQueries: Int = Similarity.DefaultTopKQueries): DataFrame = {
    val pack31 = pack31Report.agg(
      (sum(col("n_split_docs")).cast("double") / sum(col("n_docs")))
        .as("pack_split_frac"))
    val pack97 = graft.corpus.Curation.packEfficiencyOf(pack97Layout, budget)
      .agg(coalesce(sum(col("padding_tokens")).cast("double") /
          (sum(col("n_seqs")) * lit(budget.toLong)), lit(0.0))
        .as("pack_padding_frac"))
    val recall = recallReport.agg(
      (sum(col("hits")).cast("double") / (count(lit(1)) * lit(k)))
        .as("dense_recall_at_k"))
    val negs = negPool.agg(count(lit(1)).as("n_negs"))
    val nQ = Similarity.normalizedCorpus(emb)
      .filter(col("e").isNotNull && col("vec_id") < numQueries)
      .agg(count(lit(1)).as("n_q"))
    // zero-guarded like pack_padding_frac: a corpus with no non-degenerate
    // audit queries reports yield 0.0, never IEEE NaN/Infinity (which the
    // DuckDB oracle's division need not reproduce)
    val yld = negs.crossJoin(broadcast(nQ)).select(
      when(col("n_q") > 0,
        col("n_negs").cast("double") / (col("n_q") * lit(k)))
        .otherwise(lit(0.0)).as("hardneg_yield"))
    datasetCard(docs)
      .crossJoin(broadcast(pack31))
      .crossJoin(broadcast(pack97))
      .crossJoin(broadcast(recall))
      .crossJoin(broadcast(yld))
  }

  /** The 100 TB variants of [[lengthProfile]] and [[datasetCard]]: sketches
    * instead of exact state. `percentile_approx` keeps t-digest sketch state
    * per group instead of a sorted buffer of every value;
    * `approx_count_distinct` keeps an HLL register set instead of the exact
    * distinct expansion. Neither is oracle-exact BY DESIGN — the spec pins
    * them within tolerance of the exact operators on the fixture corpus, the
    * correct contract for a sketch. Same aggregate shapes otherwise. */
  def lengthProfileApprox(docs: DataFrame, accuracy: Int = 10000): DataFrame =
    docs.select(col("source"),
        size(split(col("text"), " ")).as("n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_tokens")).cast("long").as("min_tokens"),
        max(col("n_tokens")).cast("long").as("max_tokens"),
        percentile_approx(col("n_tokens"), lit(0.25), lit(accuracy)).as("p25_tokens"),
        percentile_approx(col("n_tokens"), lit(0.5), lit(accuracy)).as("p50_tokens"),
        percentile_approx(col("n_tokens"), lit(0.75), lit(accuracy)).as("p75_tokens"),
        sum(col("n_tokens")).cast("long").as("sum_tokens"))

  /** Sketch-based [[datasetCard]] — see [[lengthProfileApprox]]. */
  def datasetCardApprox(docs: DataFrame, rsd: Double = 0.02): DataFrame =
    // same single-scan shape as the exact card (see [[datasetCard]])
    graft.corpus.TextStats.quality(docs, "source", "lang", "text").agg(
      count(lit(1)).as("n_docs"),
      approx_count_distinct(col("source"), rsd).as("n_sources"),
      approx_count_distinct(col("lang"), rsd).as("n_langs"),
      sum(col("n_tokens")).cast("long").as("n_tokens"),
      sum(col("n_chars")).cast("long").as("n_chars"),
      // HLL can OVERestimate distinct on a near-unique corpus; clamp so the
      // release artifact never reports a negative duplicate count.
      greatest(lit(0L), count(lit(1)) - approx_count_distinct(
        md5(encode(col("text"), "UTF-8")), rsd)).as("n_dup_docs"),
      round(sum(round(col("quality"), 6).cast("decimal(18,6)")).cast("double")
        / count(lit(1)), 6).as("mean_quality"))

  /** Embedding QA profile — [[numericProfile]]'s counterpart for the vector
    * plane, the sanity gate run before any similarity/clustering job trusts
    * an embedding delivery: per label, vector count, dimension bounds (a
    * min ≠ max pair is a ragged delivery), zero-norm count (unnormalizable —
    * they silently NaN every cosine downstream), and norm min/max/mean.
    *
    * Parity: the norm is the identical `sqrt(dot(raw, raw))` the similarity
    * operators use; the mean is round-then-DECIMAL-sum (x19's
    * order-independence pattern) divided as a double. Scale shape: one
    * narrow projection + one map-side-partial aggregate keyed on the label —
    * the standard profile shape, nothing corpus-sized moves. */
  def embeddingProfile(emb: DataFrame): DataFrame =
    emb.select(col("label"),
        col("embedding").cast("array<double>").as("raw"))
      .withColumn("nrm", graft.functions.VectorOps.norm(col("raw")))
      .withColumn("dim", size(col("raw")).cast("long"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("dim")).as("min_dim"), max(col("dim")).as("max_dim"),
        sum(when(col("nrm") === 0.0, 1L).otherwise(0L)).as("n_zero"),
        round(min(col("nrm")), 6).as("min_norm"),
        round(max(col("nrm")), 6).as("max_norm"),
        round(sum(round(col("nrm"), 8).cast("decimal(20,8)")).cast("double")
          / count(lit(1)), 6).as("mean_norm"))

  /** x57 — embedding drift: per label, how far the MEAN embedding moved
    * between two snapshots — the embedding-plane member of the drift triad
    * (x53 documents, x56 token distributions, x57 vector space). An
    * embedding-model upgrade, a re-crawl, or a curation change can leave
    * token statistics flat while relocating whole regions of embedding
    * space, silently invalidating persisted centroids, IVF cells, and
    * SemDeDup blocking — this is the gate a deployment runs before reusing
    * a semantic index against a new snapshot. Emits
    * `(label, n_old, n_new, dim_old, dim_new, mean_shift, cos_means)`: the
    * Euclidean displacement of the label's mean vector and the cosine
    * between the two means (1 = direction preserved, the displacement is
    * pure magnitude). Labels present in only one snapshot are absent (no
    * drift is defined). A DIMENSIONALITY change — the embedding-model
    * upgrade case — must fail the gate loudly, not truncate to the shared
    * prefix of dimensions: when `dim_old != dim_new` the metrics are NULL
    * and the dim columns name the mismatch (within-side raggedness is
    * [[embeddingProfile]]'s job — run it first).
    *
    * Parity: per-dimension means are round-then-DECIMAL-sum over 9-dp
    * coordinates (`Semantic.MeanRoundDp`'s pattern) divided as doubles;
    * the per-dimension squared-difference / product terms are 12-dp rounded
    * and DECIMAL-summed, so neither engine's aggregation order matters.
    * Scale shape: one posexplode (dim fan-out, narrow) and a
    * (label × dim)-keyed map-side-partial aggregate per side — the only
    * corpus-sized motion is that one posting reduce; everything after is
    * label×dim-bounded (KBs at any corpus size). */
  def embeddingDrift(oldEmb: DataFrame, newEmb: DataFrame): DataFrame = {
    def dimMeans(emb: DataFrame, p: String): DataFrame =
      emb.select(col("label"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("d", "v")))
        .groupBy(col("label"), col("d"))
        .agg((sum(round(col("v"), 9).cast("decimal(28,9)")).cast("double")
          / count(lit(1))).as(s"${p}m"))
    def counts(emb: DataFrame, p: String): DataFrame =
      emb.groupBy(col("label")).agg(count(lit(1)).as(s"n_$p"),
        max(size(col("embedding"))).cast("long").as(s"dim_$p"))
    val terms = dimMeans(oldEmb, "o").join(dimMeans(newEmb, "n"), Seq("label", "d"))
      .select(col("label"),
        round((col("nm") - col("om")) * (col("nm") - col("om")), 12).as("sq"),
        round(col("om") * col("nm"), 12).as("pp"),
        round(col("om") * col("om"), 12).as("oo"),
        round(col("nm") * col("nm"), 12).as("nn"))
      .groupBy(col("label"))
      .agg(
        sum(col("sq").cast("decimal(28,12)")).cast("double").as("sumsq"),
        sum(col("pp").cast("decimal(28,12)")).cast("double").as("sp"),
        sum(col("oo").cast("decimal(28,12)")).cast("double").as("so"),
        sum(col("nn").cast("decimal(28,12)")).cast("double").as("sn"))
    val sameDim = col("dim_old") === col("dim_new")
    // label presence is decided by the COUNT tables (every row counts, even
    // one whose embedding array is empty), with terms joined LEFT: a label
    // whose vectors on one side are all empty arrays produces no (label, d)
    // mean rows, and an inner join on terms would silently DROP it — the
    // exact loud-gate violation the dim columns exist to surface (it shows
    // up as dim 0 vs dim N with NULL metrics instead)
    counts(oldEmb, "old")
      .join(counts(newEmb, "new"), "label")
      .join(terms, Seq("label"), "left")
      .select(col("label"), col("n_old"), col("n_new"),
        col("dim_old"), col("dim_new"),
        when(sameDim, round(sqrt(col("sumsq")), 6)).as("mean_shift"),
        when(sameDim && col("so") > 0 && col("sn") > 0,
          round(col("sp") / (sqrt(col("so")) * sqrt(col("sn"))), 6))
          .as("cos_means"))
  }

  /** x53 — snapshot diff: the dataset-versioning report between two corpus
    * snapshots (a monthly crawl refresh, a re-run of the curation pipeline):
    * per source, how many documents were added, removed, changed (same
    * doc_id, different content digest), or untouched, and the net token
    * delta. This is what a release note diffs two dataset versions with, and
    * what regression-gates a pipeline change ("the new filter dropped 40% of
    * source X" should fail loudly, not surface in training).
    *
    * A document whose doc_id appears in both snapshots is compared by
    * md5 content digest; its row counts under the NEW snapshot's source (a
    * doc that moved source with identical text therefore counts as
    * unchanged under the new source — identity is the doc_id, placement is
    * metadata). `token_delta` is (new-side tokens) − (old-side tokens) over
    * every document the source touches, so adds/removals contribute too —
    * the number a capacity plan wants.
    *
    * Scale shape: digests and token counts are NARROW projections, then ONE
    * full-outer shuffle join keyed on doc_id (linear, no skew risk — doc_id
    * is unique per side) and a source-cardinality aggregate. Nothing
    * quadratic, nothing corpus-sized on the driver, and the two snapshot
    * scans prune to (doc_id, source, text). */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    def side(df: DataFrame, p: String): DataFrame =
      df.select(col("doc_id"), col("source").as(s"${p}_source"),
        md5(encode(col("text"), "UTF-8")).as(s"${p}_digest"),
        size(split(col("text"), " ")).cast("long").as(s"${p}_tokens"))
    side(oldDocs, "o").join(side(newDocs, "n"), Seq("doc_id"), "full_outer")
      .groupBy(coalesce(col("n_source"), col("o_source")).as("source"))
      .agg(
        sum(when(col("o_digest").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("n_digest").isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("o_digest").isNotNull && col("n_digest").isNotNull &&
          col("o_digest") =!= col("n_digest"), 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("o_digest") === col("n_digest"), 1L).otherwise(0L))
          .as("n_unchanged"),
        (sum(coalesce(col("n_tokens"), lit(0L)))
          - sum(coalesce(col("o_tokens"), lit(0L)))).as("token_delta"))
  }

  /** x56 — unigram distribution drift: per source, the Jensen–Shannon
    * divergence (bits) between two snapshots' unigram distributions — the
    * DISTRIBUTION-level drift gate complementing [[snapshotDiff]]'s
    * document-level counts. A source can churn many documents with near-zero
    * JSD (re-crawl of the same domain) or keep every doc_id and still drift
    * hard (a boilerplate-stripping change) — release gates want both
    * signals. JSD over KL because it is symmetric, bounded ([0, 1] bit), and
    * defined without smoothing when a token exists on only one side
    * (0·log 0 = 0 by convention, applied per side).
    *
    * A source present in only one snapshot gets the one-sided sum, 0.5 bits
    * — deterministic and distinct from both "identical" (0) and "fully
    * disjoint but both present" (1).
    *
    * Parity: probabilities are exact-BIGINT counts divided as doubles; each
    * side's per-token term `0.5·p·log₂(2p/(p+q))` is assembled in the same
    * association order in both engines, rounded to 12 dp per term, and
    * DECIMAL-summed (x19's pattern). Scale shape: two (source, token)
    * map-side-partial aggregates, one vocab-sized full-outer join on
    * (source, token), a broadcast source-cardinality totals table, and a
    * source-cardinality final aggregate — the corpus never moves unreduced. */
  def unigramDrift(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    def counts(df: DataFrame, p: String): DataFrame =
      df.select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("source"), col("w"))
        .agg(count(lit(1)).as(s"${p}c"))
    val oCnt = counts(oldDocs, "o")
    val nCnt = counts(newDocs, "n")
    val j = oCnt.join(nCnt, Seq("source", "w"), "full_outer")
      .select(col("source"),
        coalesce(col("oc"), lit(0L)).as("oc"),
        coalesce(col("nc"), lit(0L)).as("nc"))
    // totals from the per-side counts (whose exchanges the vocab join reuses)
    // — deriving them from `j` would execute the vocab-sized full-outer join
    // TWICE (once under the broadcast build, once under the probe)
    val tot = oCnt.groupBy(col("source"))
      .agg(sum(col("oc")).cast("long").as("ot"))
      .join(nCnt.groupBy(col("source"))
        .agg(sum(col("nc")).cast("long").as("nt")), Seq("source"), "full_outer")
      .select(col("source"),
        coalesce(col("ot"), lit(0L)).as("ot"),
        coalesce(col("nt"), lit(0L)).as("nt"))
    val p = when(col("nt") > 0,
      col("nc").cast("double") / col("nt").cast("double")).otherwise(lit(0.0))
    val q = when(col("ot") > 0,
      col("oc").cast("double") / col("ot").cast("double")).otherwise(lit(0.0))
    def side(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      when(a > 0,
        round(lit(0.5) * (a * log2((lit(2.0) * a) / (a + b))), 12))
        .otherwise(lit(0.0))
    j.join(broadcast(tot), "source")
      .select(col("source"), col("ot"), col("nt"), col("oc"), col("nc"),
        (side(p, q) + side(q, p)).as("term"))
      .groupBy(col("source"))
      .agg(max(col("ot")).as("n_tokens_old"),
        max(col("nt")).as("n_tokens_new"),
        sum(when(col("oc") > 0, 1L).otherwise(0L)).as("vocab_old"),
        sum(when(col("nc") > 0, 1L).otherwise(0L)).as("vocab_new"),
        round(sum(col("term").cast("decimal(28,12)")).cast("double"), 6)
          .as("jsd_bits"))
  }

  /** x55 — source-concentration report: ONE row auditing how concentrated
    * the corpus's token mass is across sources — the mix-health scalar
    * companion to [[lengthProfile]] (per-source detail) and
    * `Curation.mixReport` (what survived curation). `hhi` is the
    * Herfindahl–Hirschman index Σ share² of token share (1/n_sources when
    * perfectly balanced, →1 when one source dominates), `entropy_bits` the
    * Shannon entropy of the share distribution (log₂ n_sources when
    * balanced), `top_share` the largest single source's share. A training
    * run gates on these before burning compute: a corpus at hhi 0.5 is one
    * domain wearing a trench coat.
    *
    * Parity: shares are exact-BIGINT token counts divided as doubles; the
    * share² / −share·log₂(share) terms are rounded to 12 dp and summed as
    * DECIMAL (x19's order-independence pattern) so the cross-engine sum
    * cannot drift with aggregation order. Scale shape: one map-side-partial
    * aggregate to source cardinality, a broadcast one-row total, then a
    * source-cardinality aggregate — nothing corpus-sized shuffles. */
  def concentrationReport(docs: DataFrame): DataFrame = {
    val per = docs
      .select(col("source"), size(split(col("text"), " ")).as("nt"))
      .groupBy(col("source")).agg(sum(col("nt")).cast("long").as("nt"))
    val tot = per.agg(sum(col("nt")).cast("long").as("tot"))
    per.crossJoin(broadcast(tot))
      .select((col("nt").cast("double") / col("tot").cast("double")).as("share"))
      .agg(count(lit(1)).as("n_sources"),
        round(max(col("share")), 6).as("top_share"),
        round(sum(round(col("share") * col("share"), 12)
          .cast("decimal(28,12)")).cast("double"), 6).as("hhi"),
        round(sum(round(lit(0.0) - col("share") * log2(col("share")), 12)
          .cast("decimal(28,12)")).cast("double"), 6).as("entropy_bits"))
  }
}

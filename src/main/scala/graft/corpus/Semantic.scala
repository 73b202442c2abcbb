package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic (embedding-space) curation: deterministic k-means clustering, the
  * SemDeDup-style within-cluster near-duplicate prune built on it, and
  * embedding-space benchmark decontamination.
  *
  * These are the embedding-side counterparts of the lexical dedup ladder
  * ([[TextDedup]]): k-means is the blocking step that turns the O(N²) pairwise
  * problem into Σ n_c² within-cluster work (the SemDeDup recipe — Abbas et al.
  * 2023, arXiv:2303.09540), and decontamination screens the corpus against a
  * benchmark set the way [[TextDedup.decontaminationReport]] does lexically.
  *
  * Determinism/oracle parity: all scoring is unit-vector dot products with the
  * exact operation sequence of [[Similarity]] (normalize once, codegen'd
  * left-to-right [[graft.functions.DotProduct]] — bit-identical to DuckDB's
  * `list_dot_product`). Centroid means are the one place aggregation order
  * could leak in: member coordinates are rounded to [[MeanRoundDp]] dp and
  * summed as DECIMAL (associative, order-independent — the x19 pattern), so a
  * re-run or a different partitioning can never flip an assignment.
  */
object Semantic {

  /** k-means geometry for the x44/x45 driver queries — shared with the oracle
    * generator so the two cannot drift. Iterations are FIXED (not
    * run-to-convergence): a pinned iteration count is what makes the result
    * reproducible and oracle-checkable, and in practice curation pipelines fix
    * it too (SemDeDup uses a small constant budget). */
  val KmeansK: Int = 4
  val KmeansIters: Int = 2

  /** Decimal places member coordinates and centroid means are rounded to.
    * 9 dp on unit-norm coordinates keeps ~7 significant digits — far below
    * any cluster-boundary gap — while making the DECIMAL sums exact. */
  val MeanRoundDp: Int = 9

  /** Within-cluster near-dup threshold for [[semanticDedup]] (x45). This
    * corpus's max pairwise cosine is ~0.6, so 0.4 sits in its meaningful
    * range; production text dedup runs nearer 0.9+. */
  val SemDedupTau: Double = 0.4

  /** Benchmark slice + flag threshold for [[embedDecontam]] (x42): vectors
    * with `vec_id % DecontamBenchMod == 0` play the benchmark set. */
  val DecontamBenchMod: Int = 25
  val DecontamTau: Double = 0.3

  private def dotp(a: Column, b: Column): Column =
    graft.functions.VectorOps.dotp(a, b)

  /** One Lloyd's round: assign every vector to its max-cosine centroid (ties
    * to the lowest cid). Centroids are K rows — ALWAYS broadcast, so
    * assignment is one narrow pass over the corpus (no shuffle). */
  private def assign(base: DataFrame, cent: DataFrame): DataFrame =
    base.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("e"), col("cid"),
        dotp(col("e"), col("ce")).as("ac"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("ac").desc, col("cid"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("e"), col("cid"), col("ac"))

  /** Recompute centroids from an assignment: per-dimension mean via
    * round-then-DECIMAL-sum (order-independent), mean re-rounded to
    * [[MeanRoundDp]] dp (both engines divide the identical DECIMAL total as
    * doubles), then re-normalized to unit length so the next round's scoring
    * stays a plain dot product. A cluster that loses every member simply
    * drops out (standard k-means empty-cluster behavior); k can only shrink,
    * never misalign, and the fixed tie-break keeps the run deterministic.
    *
    * Scale shape: posexplode fans each vector into `dim` rows, but the
    * (cid, p) aggregate is map-side partial — what shuffles is k × dim
    * partial sums per task, not the corpus. */
  private def recompute(assigned: DataFrame): DataFrame =
    assigned.select(col("cid"), posexplode(col("e")).as(Seq("p", "v")))
      .groupBy(col("cid"), col("p"))
      .agg(sum(round(col("v"), MeanRoundDp).cast("decimal(28,12)")).as("s"),
        count(lit(1)).as("n"))
      .groupBy(col("cid"))
      .agg(transform(
        array_sort(collect_list(struct(col("p").as("p"),
          round(col("s").cast("double") / col("n"), MeanRoundDp).as("m")))),
        x => x.getField("m")).as("m"))
      .withColumn("nm", graft.functions.VectorOps.norm(col("m")))
      .select(col("cid"), transform(col("m"), x => x / col("nm")).as("ce"))

  /** Final (vec_id, e, cluster, cosine-to-centroid) assignment after
    * [[KmeansIters]] Lloyd's rounds from the deterministic seed (centroids =
    * the k lowest vec_ids, normalized — the same stand-in convention as
    * [[Similarity.annIvf]], which is exactly the consumer a trained version
    * of these centroids would feed). */
  private[corpus] def kmeansFinal(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    val base = Similarity.normalizedBase(emb)
    var cent = base.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("e").as("ce"))
    for (_ <- 1 to iters)
      cent = recompute(assign(base, cent))
    // tiny k-row lineage, but each round stacks a join + two aggregates on
    // it; localCheckpoint would sever it for big iteration counts (the x20
    // treatment) — at the pinned small count the plain plan is cheaper
    assign(base, cent)
  }

  /** x44 — deterministic k-means cluster assignment over the embedding
    * corpus: `(vec_id, cluster, cosine)` with cosine the similarity to the
    * winning centroid. This is the blocking structure every embedding-side
    * curation step downstream reuses (x45; IVF cells in [[Similarity.annIvf]]).
    *
    * Scale shape per round: one narrow broadcast-assign pass + one map-side
    * partial (cid, dim) aggregate; nothing corpus-sized shuffles, nothing is
    * quadratic in N. Iterations multiply cost linearly, k and dim bound the
    * aggregate state. */
  def kmeansAssign(emb: DataFrame, k: Int = KmeansK,
      iters: Int = KmeansIters): DataFrame =
    kmeansFinal(emb, k, iters)
      .select(col("vec_id"), col("cid").as("cluster"),
        round(col("ac"), 6).as("cosine"))

  /** x45 — SemDeDup-style semantic prune: within each k-means cluster, a
    * vector is DROPPED iff some lower-id cluster-mate sits within cosine ≥
    * `tau`; the emitted keeper is that mate with the highest cosine (ties to
    * the lowest id). Output `(vec_id, cluster, keeper_id, cosine)` — one row
    * per dropped vector, the exact survivors-list complement a curation run
    * applies. Keep-lowest-id mirrors [[TextDedup.dedupClusters]]' canonical
    * choice on the lexical side.
    *
    * Scale shape: the pair join is keyed on the cluster id, so pair work is
    * Σ n_c² (bounded by the largest cluster), not N² — the SemDeDup paper's
    * entire point; k grows with the corpus to hold n_c flat. */
  def semanticDedup(emb: DataFrame, k: Int = KmeansK, iters: Int = KmeansIters,
      tau: Double = SemDedupTau): DataFrame = {
    val fin = kmeansFinal(emb, k, iters)
      .select(col("vec_id"), col("e"), col("cid"))
    val pairs = fin.as("a").join(fin.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .select(col("b.vec_id").as("vec_id"), col("b.cid").as("cluster"),
        col("a.vec_id").as("keeper_id"),
        dotp(col("a.e"), col("b.e")).as("cos"))
      .filter(col("cos") >= tau)
    pairs.withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("cos").desc, col("keeper_id"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cluster"), col("keeper_id"),
        round(col("cos"), 6).as("cosine"))
  }

  /** x42 — embedding-space benchmark decontamination: flag every corpus
    * vector whose cosine to ANY benchmark vector reaches `tau`, reporting its
    * best benchmark match `(vec_id, bench_id, cosine)`. The semantic
    * counterpart of the lexical [[TextDedup.decontaminationReport]] — catches
    * paraphrased benchmark leakage that shares no n-gram. The benchmark slice
    * is the deterministic `vec_id % benchMod == 0` stand-in, same convention
    * as x22's doc_id slice.
    *
    * Scale shape: benchmark sets are small by nature — broadcast — so the
    * corpus streams through ONE narrow pass (score all bench vectors, keep
    * the max) with zero shuffles: the same shape as
    * [[Similarity.cosineTopK]], which is the right one at any corpus size. */
  def embedDecontam(emb: DataFrame, benchMod: Int = DecontamBenchMod,
      tau: Double = DecontamTau): DataFrame = {
    val base = Similarity.normalizedBase(emb)
    val bench = base.filter(col("vec_id") % benchMod === 0)
      .select(col("vec_id").as("bench_id"), col("e").as("be"))
    base.filter(col("vec_id") % benchMod =!= 0)
      .crossJoin(broadcast(bench))
      .select(col("vec_id"), col("bench_id"), dotp(col("e"), col("be")).as("cos"))
      .filter(col("cos") >= tau)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("cos").desc, col("bench_id"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("bench_id"), round(col("cos"), 6).as("cosine"))
  }
}

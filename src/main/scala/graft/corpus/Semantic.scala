package graft.corpus

import org.apache.spark.sql.{Column, DataFrame, Row}
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

  /** Cluster-count sizing guide for the semantic suite ([[kmeansAssign]] /
    * [[semanticDedup]] / [[incrementalSemanticDedup]]) — the k-side mirror of
    * `Similarity.bitsFor`: within-cluster pair work is Σ n_c² with n_c ≈ N/k,
    * so `k` must grow LINEARLY with N to hold the per-cluster occupancy (and
    * thus both pair cost and SemDeDup recall) constant — k ≈ N / occupancy.
    * The fixed default ([[KmeansK]] = 4) suits the test corpus only; a
    * deployment sizes k from the corpus count, e.g. `kFor(n, 1024)` for
    * ~1k-vector cells (the SemDeDup paper's regime at LAION scale). Floor of
    * [[KmeansK]] keeps tiny corpora from degenerating to one cluster. */
  def kFor(corpusSize: Long, targetOccupancy: Int = 1024): Int =
    math.max(KmeansK,
      math.ceil(corpusSize.toDouble / math.max(1, targetOccupancy)).toInt)

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

  /** One Lloyd's assignment with DRIVER-HELD centroids (k × dim doubles —
    * control-plane, the MLlib convention): every vector picks its max-cosine
    * centroid (ties to the lowest cid) in a single narrow per-row expression —
    * k codegen'd dot products + a greatest/when argmax — so assignment never
    * shuffles and never materializes the N × k crossing a join-then-window
    * formulation would push through an exchange. */
  private def assign(base: DataFrame, cents: Seq[(Long, Seq[Double])]): DataFrame =
    // base columns (vec_id, e, any passthrough) ride along the narrow pass
    withBestMatch(base, cents, "cid", "ac")

  /** Append (argmax-id, max-score) columns scoring `e` against a driver-held
    * reference set — the shared narrow kernel of [[assign]] and
    * [[embedDecontam]]: one codegen'd dot per reference into an array of
    * `(cos, -id)` structs, ONE linear `array_max` (struct comparison is
    * lexicographic, so max cosine wins and ties go to the LOWEST id via the
    * negated id), fields extracted in a separate projection so the array is
    * built exactly once per row (a greatest + per-id when-chain formulation
    * re-evaluated the dots per branch — quadratic in the reference count).
    * Width grows with the reference count; fine for k-means ks and
    * eval-suite-sized benchmarks, not for reference sets of many thousands
    * (those want [[Similarity.cosineTopK]]'s broadcast-join shape). */
  private def withBestMatch(base: DataFrame, refs: Seq[(Long, Seq[Double])],
      idName: String, scoreName: String): DataFrame = {
    if (refs.isEmpty)
      // zero-reference contract, mirroring [[Similarity.annIvf]]'s empty
      // branch: with nothing to score against no row can match, so return
      // EMPTY rather than crash — this is the documented first-increment /
      // empty-benchmark / empty-corpus shape for every caller (kmeansAssign,
      // incrementalSemanticDedup, embedDecontam...). Schema comes from the
      // real plan built with a dummy reference (analyzed, never executed),
      // so the branches cannot drift apart
      return base.sparkSession.createDataFrame(
        java.util.Collections.emptyList[Row](),
        withBestMatch(base, Seq(0L -> Seq(1.0)), idName, scoreName).schema)
    val sorted = refs.sortBy(_._1)
    // Two formulations of the SAME struct (spec-pinned equal): unrolled
    // array_max for small reference sets (one codegen'd dot per ref), and
    // the loop-codegen'd BestMatch expression past the unroll limit — a
    // single k-wide expression tree cannot be split by codegen, so beyond
    // ~32 refs (dim 64) the generated method crosses the JVM's
    // HugeMethodLimit and the stage drops to the bytecode interpreter
    // (measured 33 s vs 4 s at k=59 vs 32 over 60 k vectors, SCALING.md).
    // kFor grows k with the corpus, so the large-k path is the 100 TB path.
    // A NULL embedding NULLs the whole struct on BOTH paths (BestMatch is
    // null-intolerant by construction; the unrolled branch needs the
    // explicit guard — without it, every entry's cos is NULL and the
    // lexicographic array_max would "assign" the lowest ref id): a missing
    // vector must surface as id NULL, never as a silent deterministic
    // assignment that changes with the reference count.
    val bm =
      if (sorted.size <= BestMatchUnrollLimit) {
        val entries = sorted.map { case (id, re) =>
          struct(dotp(col("e"), typedLit(re)).as("cos"), lit(-id).as("nid"))
        }
        // the size guard mirrors BestMatch's dimension check: a vector whose
        // dimension differs from the references NULLs every dot product, and
        // an array_max over all-NULL-cos structs would otherwise "assign"
        // the lowest ref id — the whole struct must be NULL instead, on both
        // formulations identically
        when(col("e").isNotNull &&
            size(col("e")) === lit(sorted.head._2.length),
          array_max(array(entries: _*)))
      } else graft.functions.VectorOps.bestMatch(col("e"), sorted)
    base.withColumn("__bm", bm)
      .select(base.columns.toIndexedSeq.map(col) :+
        (-col("__bm").getField("nid")).as(idName) :+
        col("__bm").getField("cos").as(scoreName): _*)
  }

  /** Reference-count ceiling for the unrolled argmax formulation in
    * [[withBestMatch]]; above it the loop-codegen'd [[graft.functions.BestMatch]]
    * takes over (same output, JIT-compilable at any k). */
  private[corpus] val BestMatchUnrollLimit = 16

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
      // a zero-norm mean (antipodal members cancelling exactly) would
      // normalize to an all-NaN centroid, and NaN orders GREATEST in Spark —
      // the next round's argmax would assign the ENTIRE corpus to it. Such a
      // cluster drops out instead, the same doctrine as losing every member
      .filter(col("nm") > 0)
      .select(col("cid"), transform(col("m"), x => x / col("nm")).as("ce"))

  /** Collect a (cid, ce) centroid table to the driver — k × dim doubles, the
    * per-round control-plane sync every distributed k-means does (Spark
    * MLlib's runs collect exactly this). Also severs the iteration lineage:
    * each round's plan starts from literal centroids, not a growing DAG. */
  private def collectCents(cent: DataFrame): Seq[(Long, Seq[Double])] =
    cent.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq

  /** Final (vec_id, e, cluster, cosine-to-centroid) assignment after
    * [[KmeansIters]] Lloyd's rounds from the deterministic seed (centroids =
    * the k lowest vec_ids, normalized — the same stand-in convention as
    * [[Similarity.annIvf]], which is exactly the consumer a trained version
    * of these centroids would feed). Each round is ONE Spark job: a narrow
    * assignment pass fused into the (cid, dim)-keyed mean aggregate. */
  private[corpus] def kmeansFinal(emb: DataFrame, k: Int, iters: Int): DataFrame =
    kmeansFinalOn(Similarity.normalizedBase(emb), k, iters)

  /** [[kmeansFinal]] over a pre-normalized base — extra base columns (e.g. a
    * label or source carried via `normalizedBase(emb, "label")`) ride along
    * the narrow assignment, so downstream consumers never join back to the
    * corpus for them. */
  private[corpus] def kmeansFinalOn(base: DataFrame, k: Int, iters: Int): DataFrame =
    assign(base, trainOn(base, k, iters))

  /** The Lloyd's loop over a pre-normalized base: seed from the k lowest
    * vec_ids, then `iters` rounds of narrow-assign + decimal-mean recompute,
    * centroids synced to the driver each round.
    *
    * The base is PERSISTED from the SEED scan through the last round
    * (spill-tolerant MEMORY_AND_DISK): every Lloyd's round re-reads the
    * full corpus, and without the cache an `iters`-round training pays
    * `iters + 1` source scans — at 100 TB that is the dominant cost, which
    * is why MLlib's k-means caches its input the same way. The seed collect
    * populates the cache as its side effect; the cache is released when
    * training returns. The final assignment pass (a caller concern) then
    * re-reads the source ONCE — the cache cannot safely outlive this
    * method, because callers return LAZY frames and there is no
    * materialization point after which the library could release it; the
    * trade is one extra scan for a leak-free contract. */
  private def trainOn(base: DataFrame, k: Int, iters: Int): Seq[(Long, Seq[Double])] = {
    val cached =
      base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try
      // degenerate vectors (e NULL) cannot seed: a NULL centroid could never
      // win an assignment anyway (annIvf's doctrine for caller-supplied
      // centroids), and collecting one would poison the driver-held seed set
      trainFrom(cached, collectCents(cached
        .filter(col("vec_id") < k && col("e").isNotNull)
        .select(col("vec_id").as("cid"), col("e").as("ce"))), iters)
    finally cached.unpersist(blocking = false)
  }

  /** The iteration body of [[trainOn]], from explicit seeds — also the entry
    * for corpora whose ids are not contiguous from 0 (incremental dedup's
    * old-side slice seeds from its k lowest PRESENT ids instead). Callers
    * own the base's persistence — see [[trainOn]]. */
  private def trainFrom(base: DataFrame, seeds: Seq[(Long, Seq[Double])],
      iters: Int): Seq[(Long, Seq[Double])] = {
    var cents = seeds
    // `nonEmpty` guard: zero seeds (empty corpus, or every candidate vector
    // degenerate) stay zero — don't run `iters` empty Spark jobs to learn it
    for (_ <- 1 to iters if cents.nonEmpty)
      cents = collectCents(recompute(assign(base, cents)))
    cents
  }

  /** x44 — deterministic k-means cluster assignment over the embedding
    * corpus: `(vec_id, cluster, cosine)` with cosine the similarity to the
    * winning centroid. This is the blocking structure every embedding-side
    * curation step downstream reuses (x45; IVF cells in [[Similarity.annIvf]]).
    *
    * Scale shape per round: one narrow driver-held-centroid assignment pass
    * fused into one map-side partial (cid, dim) aggregate; nothing
    * corpus-sized shuffles, nothing is quadratic in N. Iterations multiply
    * cost linearly, k and dim bound the aggregate state. */
  def kmeansAssign(emb: DataFrame, k: Int = KmeansK,
      iters: Int = KmeansIters): DataFrame =
    kmeansFinal(emb, k, iters)
      .select(col("vec_id"), col("cid").as("cluster"),
        round(col("ac"), 6).as("cosine"))

  /** Assign a (possibly streaming) embedding frame to FIXED, caller-supplied
    * centroids — the online counterpart of [[kmeansAssign]]: train offline
    * (x44, or any external k-means), then route each arriving vector to its
    * cluster at ingest with the same narrow stateless kernel as
    * [[embedDecontamAgainst]] (no join, no window, no state). Emits
    * `(vec_id, cluster, cosine)`; input must carry `vec_id` and a raw
    * `embedding` array (normalized here, same operation sequence as batch). */
  def assignAgainst(emb: DataFrame, centroids: Seq[(Long, Seq[Double])]): DataFrame =
    withBestMatch(Similarity.normalizedBase(emb), centroids, "cluster", "ac")
      .select(col("vec_id"), col("cluster"), round(col("ac"), 6).as("cosine"))

  /** The trained centroids themselves, collected — what a deployment persists
    * after an x44 run to feed [[assignAgainst]] (and IVF's coarse quantizer). */
  def trainCentroids(emb: DataFrame, k: Int = KmeansK,
      iters: Int = KmeansIters): Seq[(Long, Seq[Double])] =
    trainOn(Similarity.normalizedBase(emb), k, iters)

  /** x46 — cluster profile: per (cluster, label) member count and
    * within-cluster share — the clustering-quality audit (label purity) every
    * semantic-curation run checks before trusting x44's blocking for x45's
    * dedup decisions or for stratified sampling. Any categorical column works
    * as the label (here the embeddings' `label`; at corpus scale, `source`).
    *
    * Scale shape: the label rides ALONG the narrow assignment pass
    * ([[kmeansFinalOn]] passthrough) — no join back to the corpus; the only
    * shuffle is the (cluster, label) aggregate (map-side partial, k × labels
    * result rows) plus a window over that tiny result. */
  def clusterProfile(emb: DataFrame, k: Int = KmeansK,
      iters: Int = KmeansIters): DataFrame =
    kmeansFinalOn(Similarity.normalizedBase(emb, "label"), k, iters)
      .groupBy(col("cid").as("cluster"), col("label"))
      .agg(count(lit(1)).as("n_vecs"))
      .withColumn("share", round(col("n_vecs").cast("double") /
        sum(col("n_vecs")).over(Window.partitionBy(col("cluster"))), 6))

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
    // the self-join below evaluates `fin` TWICE — persist so the corpus is
    // scanned and scored once, not two times. The cache is released BEFORE
    // returning: Dataset.persist entries live in the session CacheManager,
    // which holds them strongly (the ContextCleaner never reclaims them), so
    // a lazy return would leak corpus-scale MEMORY_AND_DISK storage per call
    // in a long-lived session. Instead the RESULT — one slim row per dropped
    // vector, no embedding column, far smaller than `fin` — is materialized
    // with an eager localCheckpoint while `fin` is hot, and `fin` is
    // unpersisted in the finally. The checkpointed blocks ARE
    // ContextCleaner-reclaimed once the returned frame goes unreachable
    // (RDD-level storage, not CacheManager). Trade: the returned frame's
    // lineage is truncated, so an executor lost AFTER this call requires the
    // caller to re-run — the price of a leak-free contract (deployments that
    // must survive that swap in reliable checkpoint outside the library).
    val fin = kmeansFinal(emb, k, iters)
      .select(col("vec_id"), col("e"), col("cid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
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
        .localCheckpoint(true)
    } finally fin.unpersist(blocking = false)
  }

  /** x51 — incremental semantic dedup: flag NEW vectors that near-duplicate
    * an EXISTING corpus in embedding space — [[TextDedup.incrementalDedup]]'s
    * twin on the semantic side, and the SemDeDup blocking discipline applied
    * to the daily-increment shape: the cluster structure is trained on the
    * OLD corpus only (k lowest old ids seed; the increment must never move
    * the index's centroids), both sides are assigned to those fixed
    * centroids, and each new vector is compared ONLY against old members of
    * its own cluster. Emits the best old match
    * `(vec_id, cluster, matched_vec_id, cosine)` per flagged new vector;
    * never compares new-vs-new or old-vs-old.
    *
    * Scale shape: training touches only the old side (in production the
    * centroids are the persisted [[trainCentroids]] output — recomputed here
    * so the driver query stays self-contained); both assignments are narrow;
    * the only join is cluster-keyed new×old, Σ |new_c|·|old_c| work, never
    * |new|×|old|. */
  def incrementalSemanticDedup(newEmb: DataFrame, oldEmb: DataFrame,
      k: Int = KmeansK, iters: Int = KmeansIters,
      tau: Double = SemDedupTau): DataFrame = {
    // ONE cache of the old side carries seed collect, every training round,
    // AND the final assignment join — the old corpus is scanned and
    // normalized exactly once however many times the plan walks it (it is
    // the big side: at deployment scale the increment is small and the index
    // is the 100 TB half). Released before returning via [[semanticDedup]]'s
    // discipline: the RESULT (one slim row per flagged new vector) is
    // materialized with an eager localCheckpoint while the cache is hot,
    // then the cache is dropped — a lazy return would leak corpus-scale
    // storage per call (CacheManager holds persists strongly). The returned
    // frame's lineage is truncated, same documented trade as x45.
    val cachedOld = Similarity.normalizedBase(oldEmb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // k lowest HEALTHY old ids seed (degenerate e-NULL rows can't seed —
      // trainOn's doctrine, filter-then-limit so a degenerate low id doesn't
      // shrink the seed set)
      val seeds = collectCents(cachedOld.filter(col("e").isNotNull)
        .orderBy(col("vec_id")).limit(k)
        .select(col("vec_id").as("cid"), col("e").as("ce")))
      val cents = trainFrom(cachedOld, seeds, iters)
      val oldAsg = assign(cachedOld, cents)
        .select(col("vec_id").as("old_id"), col("e").as("oe"), col("cid"))
      val newAsg = assign(Similarity.normalizedBase(newEmb), cents)
        .select(col("vec_id"), col("e"), col("cid"))
      bestOldMatch(newAsg, oldAsg, tau).localCheckpoint(true)
    } finally cachedOld.unpersist(blocking = false)
  }

  /** The persisted form of the semantic dedup index: every OLD vector with
    * its unit-normalized embedding and its FIXED-centroid cluster id —
    * [[TextDedup.dedupIndex]]'s role on the embedding plane. Build it once
    * per index refresh from [[trainCentroids]]' output, persist with
    * [[writeAssignedIndex]], and probe increments with
    * [[incrementalSemanticDedupAgainst]] — the increment never pays the
    * corpus-side assignment again. Degenerate (e-NULL) vectors keep a row
    * with cid NULL (the x44 contract); they can never match a probe. */
  def assignedIndex(emb: DataFrame, centroids: Seq[(Long, Seq[Double])]): DataFrame =
    assign(Similarity.normalizedBase(emb), centroids)
      .select(col("vec_id"), col("e"), col("cid"))

  /** Persist [[assignedIndex]] BUCKETED on the cluster id —
    * [[TextDedup.writeDedupIndex]]'s layout discipline on the semantic
    * plane: every future increment's cluster join re-shuffles ONLY the
    * increment's assignments; the corpus-scale index reads in place,
    * pre-sorted for the merge join. At 100 TB size buckets to the cluster,
    * not this test default. */
  def writeAssignedIndex(index: DataFrame, tableName: String,
      buckets: Int = 16): Unit =
    graft.util.BucketedTable.write(index, tableName, buckets, "cid")

  /** [[incrementalSemanticDedup]] against a pre-built (typically persisted,
    * bucketed) index and its FROZEN centroids — the production probe shape:
    * only the increment is normalized, assigned, and shuffled; the index
    * side joins in place. `centroids` must be the set the index was
    * assigned with ([[trainCentroids]] at index-build time) — probing with
    * different centroids routes increments into clusters the index never
    * populated. Lazy return, like [[TextDedup.noveltyScoreAgainst]]. */
  def incrementalSemanticDedupAgainst(newEmb: DataFrame, index: DataFrame,
      centroids: Seq[(Long, Seq[Double])],
      tau: Double = SemDedupTau): DataFrame =
    bestOldMatch(
      assign(Similarity.normalizedBase(newEmb), centroids)
        .select(col("vec_id"), col("e"), col("cid")),
      index.select(col("vec_id").as("old_id"), col("e").as("oe"), col("cid")),
      tau)

  /** Shared probe tail of [[incrementalSemanticDedup]] and
    * [[incrementalSemanticDedupAgainst]]: cluster-keyed new×old join,
    * threshold, best-match window (ties to the lowest old id). */
  private def bestOldMatch(newAsg: DataFrame, oldAsg: DataFrame,
      tau: Double): DataFrame =
    newAsg.join(oldAsg, "cid")
      .select(col("vec_id"), col("cid").as("cluster"), col("old_id"),
        dotp(col("e"), col("oe")).as("cos"))
      .filter(col("cos") >= tau)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("cos").desc, col("old_id"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cluster"),
        col("old_id").as("matched_vec_id"), round(col("cos"), 6).as("cosine"))

  /** x42 — embedding-space benchmark decontamination: flag every corpus
    * vector whose cosine to ANY benchmark vector reaches `tau`, reporting its
    * best benchmark match `(vec_id, bench_id, cosine)`. The semantic
    * counterpart of the lexical [[TextDedup.decontaminationReport]] — catches
    * paraphrased benchmark leakage that shares no n-gram. The benchmark slice
    * is the deterministic `vec_id % benchMod == 0` stand-in, same convention
    * as x22's doc_id slice.
    *
    * Scale shape: benchmark sets are bounded by the EVAL SUITE, so they live
    * on the driver ([[withBestMatch]]) and the corpus streams through ONE narrow
    * codegen'd pass — zero shuffles, no join, no window; the per-vector
    * argmax is an expression, so the same operator composes unchanged onto a
    * stream ([[embedDecontamAgainst]]). A benchmark too wide for expression
    * form would fall back to [[Similarity.cosineTopK]]'s broadcast-join
    * shape. */
  def embedDecontam(emb: DataFrame, benchMod: Int = DecontamBenchMod,
      tau: Double = DecontamTau): DataFrame = {
    val base = Similarity.normalizedBase(emb)
    embedDecontamAgainst(base.filter(col("vec_id") % benchMod =!= 0),
      decontamBench(emb, benchMod), tau)
  }

  /** The driver-held benchmark reference set [[embedDecontam]] screens
    * against — the eval-suite-bounded (bench_id, unit-vector) list, also the
    * dense half of [[Retrieval.hybridIngestGate]]'s frozen models. A
    * degenerate benchmark vector (e NULL) is droppable by the same doctrine
    * as degenerate seeds: nothing can score against it, and collecting it
    * would put a null vector in the driver-held reference set. */
  def decontamBench(emb: DataFrame,
      benchMod: Int = DecontamBenchMod): Seq[(Long, Seq[Double])] =
    collectCents(Similarity.normalizedBase(emb)
      .filter(col("vec_id") % benchMod === 0 && col("e").isNotNull)
      .select(col("vec_id").as("bench_id"), col("e").as("be")))

  /** [[embedDecontam]]'s narrow kernel over a pre-normalized corpus and a
    * driver-held benchmark — stateless and shuffle-free, so it runs
    * unchanged on a streaming DataFrame (the production shape: screen each
    * ingest micro-batch against the frozen benchmark set). */
  def embedDecontamAgainst(base: DataFrame, bench: Seq[(Long, Seq[Double])],
      tau: Double = DecontamTau): DataFrame =
    withBestMatch(base.select(col("vec_id"), col("e")), bench, "bench_id", "cos")
      .filter(col("cos") >= tau)
      .select(col("vec_id"), col("bench_id"), round(col("cos"), 6).as("cosine"))

  /** Outliers reported per cluster. */
  val OutliersPerCluster: Int = 3

  /** X64 — embedding outlier report: per k-means cluster, the `m` members
    * FARTHEST from their own centroid (lowest assignment cosine; rank ties
    * to the smaller vec_id), with the cluster's size and mean assignment
    * cosine for context and `gap` = mean − member cosine as the outlier
    * magnitude. The embedding-space noise detector run before the space is
    * trusted for SemDeDup blocking, stratified mixing, or label transfer:
    * encoder glitches, mis-embedded modalities, and topic strays all
    * surface as members far from every centroid including their own.
    * Rank-based by construction — no variance/σ arithmetic to drift between
    * engines; the mean is the x44 discipline (6-dp-rounded members
    * DECIMAL-summed, the identical total divided as DOUBLE in both
    * engines). Degenerate (zero-norm/NULL) vectors are x47's signal, not
    * distance outliers — they have no centroid and are excluded (the NULL
    * cluster the assignment already gives them).
    *
    * Scale: everything downstream of the x44 assignment (whose own scale
    * story this inherits) is one (cluster)-keyed map-side-partial aggregate
    * of k rows broadcast back onto a cluster-partitioned bottom-m window —
    * nothing corpus-pairwise anywhere. */
  def outlierReport(emb: DataFrame, k: Int = KmeansK, iters: Int = KmeansIters,
      m: Int = OutliersPerCluster): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // both the stats aggregate and the bottom-m window consume the
    // assignment — semanticDedup's persist/localCheckpoint/unpersist
    // discipline keeps the corpus-scale normalize-and-assign pass to ONE
    // scan and the session CacheManager leak-free (see that method's note)
    val assigned = kmeansAssign(emb, k, iters).filter(col("cluster").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val stats = assigned.groupBy(col("cluster")).agg(
        count(lit(1)).as("n_members"),
        round(sum(col("cosine").cast("decimal(10,6)")).cast("double") /
          count(lit(1)), 6).as("mean_cosine"))
      assigned
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("cluster"))
            .orderBy(col("cosine"), col("vec_id"))))
        .filter(col("rank") <= m)
        .join(broadcast(stats), "cluster")
        .select(col("cluster"), col("vec_id"), col("cosine"), col("rank"),
          col("n_members"), col("mean_cosine"),
          round(col("mean_cosine") - col("cosine"), 6).as("gap"))
        .localCheckpoint(true)
    } finally assigned.unpersist(false)
  }
}

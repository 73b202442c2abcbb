package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall/nprobe audit sweep — x94's generator audit
  * ([[graft.corpus.Similarity.denseRecallEval]]) run across probe budgets
  * for BOTH scale-tier generators: IVF over recomputed cells
  * ([[graft.corpus.Retrieval.ivfDenseCandidates]]) and IVF-PQ ADC over a
  * PERSISTED cid-partitioned code index
  * ([[graft.corpus.Retrieval.ivfAdcDenseCandidates]], x93's deployment
  * generator). One line per (generator, nprobe) with mean/min recall@k
  * over the audit slice — the table a deployment reads before turning the
  * nprobe knob, recorded in SCALING.md. At full probe the IVF tier is
  * exact by construction (spec-pinned); the ADC tier is NOT (codes
  * approximate the geometry), which is exactly what the sweep prices.
  *
  * Usage: `runMain graft.RecallSweep [sfDir] [nprobesCsv]`
  * (defaults `/root/testdata/sf0.1` and `1,2,4,8,16`). */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nprobes = (if (args.length > 1) args(1) else "1,2,4,8,16")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cbs = graft.corpus.Quantization.sliceCodebooks(e)
    val cents = graft.corpus.Quantization.centroidSeeds(e)
    // TRAINED codebooks alongside the deterministic stand-in: the stand-in
    // is the oracle-reproducible fixture, not a deployment artifact — the
    // sweep prices exactly what k-means training buys the ADC tier
    val tcbs = graft.corpus.Quantization.trainedCodebooks(e)
    // the persisted shape, deliberately: the sweep audits the artifact a
    // deployment actually probes, not an in-memory twin
    def persist(cb: Array[Array[Array[Double]]]): org.apache.spark.sql.DataFrame = {
      val idxDir = java.nio.file.Files
        .createTempDirectory("recall_sweep_idx").toString
      graft.corpus.Quantization.writeIvfPqIndex(
        graft.corpus.Quantization.ivfPqIndex(e, cb, cents), idxDir)
      spark.read.parquet(idxDir)
    }
    val index = persist(cbs)
    val tindex = persist(tcbs)
    // each cell re-runs the exact baseline inside denseRecallEval -- at
    // audit scale (sf0.1, 20 queries) that redundancy is cheaper than a
    // precomputed-exact API variant; a deployment sweeping a big corpus
    // should add one (the exact side depends on neither generator nor
    // nprobe)
    def cell(gen: graft.corpus.Retrieval.DenseCandidates): (Double, Double) = {
      val r = graft.corpus.Similarity.denseRecallEval(e, dense = gen)
        .agg(avg(col("recall")), min(col("recall"))).collect()(0)
      (r.getDouble(0), r.getDouble(1))
    }
    // the number SPI consumers actually need: every consumer re-scores
    // fetched vectors EXACTLY (x89/x93's discipline), so what matters is
    // whether the exact top-k SURVIVES the generator's PROPOSAL SET — the
    // kCand+1 ids it fetches (one slot for self, x89's argument; when self
    // is absent from the proposals the pool is kCand+1 deep, and that IS
    // what the consumer exact-reranks — a true top-k member in the pool
    // always outranks the consumer's cut, so pool membership equals
    // survival). The exact baseline, normalized corpus, and query slice
    // are nprobe-invariant — built once, not per sweep row.
    val kCand = graft.corpus.Similarity.HardNegCandidates
    val sweepK = graft.corpus.Similarity.DefaultTopK
    val sweepNq = graft.corpus.Similarity.DefaultTopKQueries
    val exactTop = graft.corpus.Similarity.cosineTopK(e, sweepNq, sweepK)
      .select(col("qid"), col("neighbor_id")).localCheckpoint()
    val nzBase = graft.corpus.Similarity.normalizedCorpus(e)
      .filter(col("e").isNotNull).localCheckpoint()
    val sweepQueries = nzBase.filter(col("vec_id") < sweepNq)
      .select(col("vec_id").as("query_id"), col("e").as("qe"))
    def poolCell(gen: graft.corpus.Retrieval.DenseCandidates): Double = {
      val pool = gen(nzBase, sweepQueries, kCand + 1)
        .filter(col("doc_id") =!= col("query_id"))
        .select(col("query_id").as("qid"), col("doc_id").as("neighbor_id"))
      val hits = exactTop.join(pool, Seq("qid", "neighbor_id")).count()
      hits.toDouble / (sweepNq.toLong * sweepK)
    }
    nprobes.foreach { np =>
      val (ivfMean, ivfMin) = cell(
        graft.corpus.Retrieval.ivfDenseCandidates(nprobe = np))
      val (adcMean, adcMin) = cell(
        graft.corpus.Retrieval.ivfAdcDenseCandidates(index, cbs, cents, np))
      val (tMean, tMin) = cell(
        graft.corpus.Retrieval.ivfAdcDenseCandidates(tindex, tcbs, cents, np))
      val adcPool = poolCell(
        graft.corpus.Retrieval.ivfAdcDenseCandidates(index, cbs, cents, np))
      def f(v: Double): String = graft.util.JsonNum.fixed(v, 3)
      println(s"""{"nprobe":$np,"ivf_mean":${f(ivfMean)},""" +
        s""""ivf_min":${f(ivfMin)},"adc_mean":${f(adcMean)},""" +
        s""""adc_min":${f(adcMin)},"adc_trained_mean":${f(tMean)},""" +
        s""""adc_trained_min":${f(tMin)},""" +
        s""""adc_pool${kCand + 1}_rerank_mean":${f(adcPool)}}""")
    }
    spark.stop()
  }
}

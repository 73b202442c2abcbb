package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical retrieval over the corpus: Okapi BM25 top-k ranking of corpus
  * documents against a bounded query set. The retrieval twin of the embedding
  * plane's [[Similarity.cosineTopK]] — together they are the two halves of a
  * hybrid (lexical + semantic) retrieval stack, and BM25 is also the standard
  * relevance filter a training-data pipeline runs to mine task-relevant
  * documents out of a web crawl (quality-targeted selection à la importance
  * sampling, but query-driven).
  *
  * Scale design (the part that must survive 100 TB): the query set is bounded
  * by construction (an eval suite, a task description sheet, a handful of
  * seed documents — X22's broadcast justification), so its DISTINCT term
  * vocabulary broadcasts. The corpus pass prunes postings to that vocabulary
  * with a broadcast semi-join BEFORE any shuffle — the per-(doc, term)
  * term-frequency aggregate, the document-frequency table, and the final
  * per-(query, doc) score sum all operate on the ~|query-vocab| slice of the
  * postings, never the full corpus token stream. The only corpus-sized work
  * is the narrow tokenize + length projection feeding that semi-join; corpus
  * statistics (N, avgdl) collapse to one broadcast row. Nothing is quadratic
  * in the corpus; candidate fan-out is bounded by how many documents share a
  * query term (the classic inverted-index posting-list bound).
  *
  * Determinism / oracle parity: per-term BM25 contributions are rounded to
  * 6 dp then DECIMAL-summed (x19's order-independence trick), so the two
  * engines' aggregation orders cannot produce different scores; ranking ties
  * break on doc_id. All constants are interpolated into the oracle SQL from
  * the Scala values below (Double.toString round-trips bit-exactly), so the
  * engines cannot drift on e.g. `k1 + 1`.
  */
object Retrieval {

  /** Query slice: the first [[QueryCount]] documents with doc_id % QueryMod
    * == 0 play the query set, everything else is the searched corpus (X22's
    * slice convention, BOUNDED). The cap is semantic, not cosmetic: a query
    * sheet is a fixed eval artifact — growing the corpus must grow the
    * postings searched, never the number of queries — so retrieval work
    * scales with the corpus, linearly, at a fixed query budget. */
  val QueryMod: Long = 50L

  /** Fixed query-sheet size (see [[QueryMod]]). */
  val QueryCount: Long = 32L

  /** Okapi BM25 term-saturation constant. */
  val BM25K1: Double = 1.2

  /** Okapi BM25 length-normalization constant. */
  val BM25B: Double = 0.75

  /** Results per query. */
  val DefaultTopK: Int = 5

  // pre-computed in Scala so the oracle interpolates the SAME doubles
  private[graft] val K1Plus1: Double = BM25K1 + 1.0
  private[graft] val OneMinusB: Double = 1.0 - BM25B

  private def ws: Column = split(col("text"), " ")

  /** BM25 top-`k` corpus documents for each query document.
    *
    * Query q's terms are its DISTINCT whitespace tokens (bag-of-words queries
    * count a repeated term once — the standard short-query convention; the
    * corpus side's tf still counts every occurrence). Scores:
    *
    *   idf(w)  = ln((N - df + 0.5) / (df + 0.5) + 1)          [Lucene shape,
    *             always positive — no negative-idf common terms]
    *   s(q,d)  = Σ_w round(idf · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)), 6)
    *
    * Output: (query_id, doc_id, n_terms, score, rank), rank 1..k per query by
    * (score desc, doc_id asc); queries whose terms match nothing emit no rows.
    */
  def bm25TopK(docs: DataFrame, queryMod: Long = QueryMod,
      k: Int = DefaultTopK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val isQuery = col("doc_id") % queryMod === 0 &&
      col("doc_id") < queryMod * QueryCount

    // (qid, w) distinct query terms — eval-suite-bounded, broadcast everywhere
    val qterms = docs.filter(isQuery)
      .select(col("doc_id").as("qid"), explode(ws).as("w")).distinct()

    // narrow corpus pass: doc length + tokens, pruned to the query vocabulary
    // by a broadcast semi-join BEFORE the tf shuffle. The semi-join probes
    // `qterms` WHOLE, not a projected vocabulary: a LEFT-SEMI ignores
    // duplicate build-side rows anyway, and keeping the build side
    // byte-identical to the scoring join's lets ReuseExchange fold the two
    // broadcast builds into one (a projected copy is a different exchange —
    // measured as a full recompute of the query-side tokenize+distinct)
    val ctoks = docs.filter(!isQuery)
      .select(col("doc_id"), size(ws).as("dl"), explode(ws).as("w"))
      .join(broadcast(qterms), Seq("w"), "left_semi")
    val tf = ctoks.groupBy(col("doc_id"), col("dl"), col("w"))
      .agg(count(lit(1)).as("tf"))
    // df over the pruned postings = df of exactly the query terms — computed
    // as a COUNT window over the tf stream itself, not a groupBy+join back:
    // the join form duplicates the whole tokenize→semi→tf subtree into a
    // second physical pipeline (measured 2× the query's cost; exchange reuse
    // does not rescue it through AQE), while the window re-shuffles only the
    // already-aggregated per-(doc, term) rows on the term key
    val tfd = tf.withColumn("df", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("w"))))

    // corpus-wide stats: one broadcast row (avgdl = sum(dl)/count over BIGINTs,
    // the same exact-integer division DuckDB's avg performs)
    val stats = docs.filter(!isQuery)
      .select(size(ws).as("dl"))
      .agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))

    val idf = log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val norm = (col("tf") * K1Plus1) /
      (col("tf") + lit(BM25K1) * (lit(OneMinusB) +
        lit(BM25B) * (col("dl") / col("avgdl"))))
    val term = round(idf * norm, 6)

    // the qterms join EXPANDS each posting by the number of queries sharing
    // its term (~|queries| on a dense vocabulary) and the score expression +
    // partial aggregate run in the same stage — compute-bound work that AQE
    // sizes by the tiny pre-join byte count, coalescing the stage to ONE task
    // (measured: the whole query serialized through it). An explicit
    // round-robin repartition to the cluster's core count pins the fan-out
    // stage at compute parallelism; its input is the already-aggregated
    // per-(doc, term) table, so the extra exchange is a rounding error at
    // any scale next to the expansion it parallelizes
    val fanIn = tfd.repartition(
      docs.sparkSession.sparkContext.defaultParallelism)
    val scored = fanIn
      .join(broadcast(qterms), "w")
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("doc_id"), term.as("t"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("t").cast("decimal(14,6)")).cast("double").as("score"))

    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("doc_id"), col("n_terms"),
        col("score"), col("rank"))
  }
}

package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

import graft.corpus.Retrieval
import graft.corpus.Retrieval.Bm25Model

/** The x65 ingest gate's whole per-row kernel as ONE codegen'd expression:
  * given the `ARRAY<STRING>` token column and the driver-held (sheet-bounded)
  * [[Bm25Model]], returns `STRUCT<query_id BIGINT, score DOUBLE, n_terms
  * BIGINT>` — the document's best query-sheet match under the frozen index
  * (highest BM25 score, ties to the smaller query id).
  *
  * WHY one expression rather than a declarative tree: the gate row must BOTH
  * be scored and be filtered on `n_terms > 0`, and Catalyst pushes that
  * filter through the scoring projection by SUBSTITUTING the full scoring
  * expression into the predicate (deterministic aliases always inline on
  * pushdown — all the way into the parquet scan's DataFilters). With the
  * score spelled as a per-(query, term) `size(filter(tokens, _ = w))` tree,
  * the pushed copy re-scanned the token array once per sheet term per row
  * (~190 scans; x65 was the bench's slowest query at 3.9 s) — and hoisting
  * the tf counts into their own projection layer just moved the same
  * duplication into the substituted predicate (measured WORSE, 8.7 s: ~600
  * embedded copies of the counter). Fusing the whole kernel makes duplicated
  * evaluation harmless: each evaluation is one O(|tokens|) counting pass
  * (hash probe per token into the sheet's term→slot map) plus Σ_q |q terms|
  * scalar ops, so even filter + project evaluating it twice costs two token
  * scans, not hundreds (measured 13×: 3.9 s → 0.3 s gate pass at sf0.1).
  *
  * Exactness (the documented bit-equality with the batch scorer
  * [[Retrieval.bm25TopKAgainst]], spec-pinned): every arithmetic step
  * replicates the Catalyst expression it fuses, literally —
  *   - norm and idf·norm multiply in the identical IEEE operation order;
  *   - `round(x, 6)` is `BigDecimal.valueOf(x).setScale(6, HALF_UP)
  *     .doubleValue()` — the exact HALF_UP kernel Catalyst's `Round`
  *     compiles to for doubles;
  *   - the 6-dp double casts back to an exact decimal via the same
  *     shortest-string `valueOf` path Catalyst's double→decimal cast uses;
  *   - per-query sums accumulate as exact decimal adds (order-free), and
  *     the final decimal→double is `doubleValue()`, Catalyst's cast.
  * idf itself arrives PRECOMPUTED from the model via `StrictMath.log` — the
  * same `ln` Catalyst's `Log` compiles to (see [[Retrieval.bm25IngestGate]]).
  *
  * Stays a narrow stateless projection: streaming-safe, no join, no state,
  * bounded by the sheet regardless of corpus scale. NULL token array → NULL
  * struct (no-text documents emit no gate row). */
case class Bm25GateScore(child: Expression, model: Bm25Model)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bm25_gate_score expects an ARRAY<STRING> input, got ${t.sql}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("n_terms", LongType, nullable = false)))
  override def prettyName: String = "bm25_gate_score"

  // ---- driver-precomputed scoring tables (sheet-bounded) ----------------
  // distinct sheet vocabulary → tf slot; per query, its terms as slot
  // indices with their idf. All transient-lazy: rebuilt once per executor
  // deserialization from the (serializable) model.
  @transient private lazy val sheetTerms: Array[String] =
    model.queries.flatMap(_._2.map(_._1)).distinct.sorted.toArray
  @transient private lazy val slotOf: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](sheetTerms.length * 2)
    var i = 0
    while (i < sheetTerms.length) {
      m.put(UTF8String.fromString(sheetTerms(i)), Integer.valueOf(i))
      i += 1
    }
    m
  }
  @transient private lazy val qids: Array[Long] =
    model.queries.map(_._1).toArray
  @transient private lazy val qSlots: Array[Array[Int]] = {
    val slotIdx = sheetTerms.zipWithIndex.toMap
    model.queries.map(_._2.map(t => slotIdx(t._1)).toArray).toArray
  }
  @transient private lazy val qIdfs: Array[Array[Double]] =
    model.queries.map(_._2.map { case (_, df) =>
      // StrictMath, not Math: catalyst's Log compiles to StrictMath.log —
      // Math.log differs by 1 ulp on a measurable fraction of inputs,
      // enough to flip a 6-dp rounding boundary
      StrictMath.log((model.n - df + 0.5) / (df + 0.5) + 1.0)
    }.toArray).toArray

  /** The fused per-row kernel; also the body generated code calls into.
    * Public-to-codegen, not API. */
  def compute(a: ArrayData): InternalRow = {
    // one counting pass over the tokens
    val counts = new Array[Int](sheetTerms.length)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val slot = slotOf.get(a.getUTF8String(i))
        if (slot != null) counts(slot.intValue()) += 1
      }
      i += 1
    }
    val dlTerm = Retrieval.BM25K1 *
      (Retrieval.OneMinusB + Retrieval.BM25B * (n.toDouble / model.avgdl))
    // per-query exact-decimal score sums; best by (score desc, qid asc)
    var bestQ = 0; var bestScore: JBigDecimal = null; var bestM = 0L
    var q = 0
    while (q < qids.length) {
      val slots = qSlots(q); val idfs = qIdfs(q)
      var sum = JBigDecimal.ZERO
      var m = 0L
      var t = 0
      while (t < slots.length) {
        val tf = counts(slots(t))
        if (tf > 0) {
          val norm = (tf * Retrieval.K1Plus1) / (tf + dlTerm)
          val r6 = JBigDecimal.valueOf(idfs(t) * norm)
            .setScale(6, RoundingMode.HALF_UP).doubleValue()
          sum = sum.add(
            JBigDecimal.valueOf(r6).setScale(6, RoundingMode.HALF_UP))
          m += 1L
        }
        t += 1
      }
      // ties prefer a MATCHFUL query (m > 0) over a matchless one, then the
      // smaller qid. Matters only when a matching contribution rounds to
      // 0.000000 (reachable at df≈N corpus scale, or a hand-built model):
      // the batch scorer ranks over matching rows ONLY, so a matchless
      // query winning a zero-score tie here would make the gate drop a
      // document the batch path emits — breaking the pinned bit-equality.
      // qids ascend (bm25Model sorts), so the qid tiebreak is the iteration
      // order itself.
      val cmp = if (bestScore == null) 1 else sum.compareTo(bestScore)
      if (cmp > 0 || (cmp == 0 && m > 0 && bestM == 0L)) {
        bestQ = q; bestScore = sum; bestM = m
      }
      q += 1
    }
    new GenericInternalRow(
      Array[Any](qids(bestQ), bestScore.doubleValue(), bestM))
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("bm25Gate", this,
        classOf[Bm25GateScore].getName)
      s"${ev.value} = $self.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Bm25GateScore =
    copy(child = newChild)
}

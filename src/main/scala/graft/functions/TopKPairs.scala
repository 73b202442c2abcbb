package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types._

/** Bounded buffer for [[TopKPairs]]: at most `k` (score, id) entries kept in
  * rank order — (score DESC NULLS LAST, id ASC), the exact ordering of the
  * `row_number().over(orderBy(col.desc, id))` windows it replaces (desc
  * defaults to NULLS LAST; double comparison via [[SQLOrderingUtil]], the
  * SQL total order the windows sort with, so −0.0/NaN edge ranks cannot
  * drift between the two plans). Insertion is an O(k) shift — k is a result
  * size (5–100), not a corpus size — and entries past rank k are dropped at
  * INSERT time, which is the whole point: state per group is O(k) no matter
  * how many rows the group scans. */
final class TopKBuffer(val k: Int) {
  var n: Int = 0
  val nulls = new Array[Boolean](k)
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)

  /** < 0 ⇒ (aNull, aScore, aId) ranks BEFORE entry i. */
  private def cmp(aNull: Boolean, aScore: Double, aId: Long, i: Int): Int =
    if (!aNull && !nulls(i)) {
      val c = -SQLOrderingUtil.compareDoubles(aScore, scores(i))
      if (c != 0) c else java.lang.Long.compare(aId, ids(i))
    } else if (aNull && nulls(i)) java.lang.Long.compare(aId, ids(i))
    else if (aNull) 1
    else -1

  def insert(isNull: Boolean, score: Double, id: Long): Unit = {
    var pos = n
    while (pos > 0 && cmp(isNull, score, id, pos - 1) < 0) pos -= 1
    if (pos < k) {
      val last = math.min(n, k - 1)
      var i = last
      while (i > pos) {
        nulls(i) = nulls(i - 1); scores(i) = scores(i - 1); ids(i) = ids(i - 1)
        i -= 1
      }
      nulls(pos) = isNull; scores(pos) = score; ids(pos) = id
      if (n < k) n += 1
    }
  }
}

/** One-pass bounded top-k aggregate: per group, the k best (score, id)
  * pairs in (score DESC NULLS LAST, id ASC) order — the aggregate form of
  * the `row_number().over(Window.partitionBy(g).orderBy(s.desc, id))
  * .filter(rank <= k)` plan shape used across the similarity plane. The
  * window form SORTS every group's full candidate list to keep k rows; this
  * aggregate keeps O(k) state per group and drops losers at scan time, so
  * a 100 TB candidate stream needs no per-group sort at all — and because
  * Spark executes it with hash aggregation (ObjectHashAggregate), partial
  * aggregation runs map-side: each input partition ships at most k entries
  * per group to the shuffle instead of its whole candidate list. It is
  * also the piece that makes STREAMING per-query top-k possible with
  * bounded state (a streaming aggregation's state store holds exactly the
  * buffer, never the candidate history).
  *
  * Contract details, all pinned in `TopKPairsSpec`:
  *  - ordering ties break on the id, matching the window's `(desc, id)`
  *    orderBy; NULL scores rank last (desc's NULLS LAST default), ordered
  *    among themselves by id — bit-for-bit the x6 degenerate contract;
  *  - rows with a NULL id are SKIPPED (an unkeyed candidate cannot be
  *    ranked deterministically);
  *  - output is `ARRAY<STRUCT<score DOUBLE, id BIGINT>>` in rank order
  *    (element 0 = rank 1), at most k elements, possibly fewer — callers
  *    `posexplode` it into flat (rank, id, score) rows.
  *
  * SQL: `topk_pairs(score, id, k)` (k an INTEGER literal), registered with
  * the other kernels in [[GraftFunctions]]. */
case class TopKPairs(scoreExpr: Expression, idExpr: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k > 0, s"topk_pairs: k must be positive, got $k")

  override def left: Expression = scoreExpr
  override def right: Expression = idExpr
  override def nullable: Boolean = false
  override def dataType: DataType = TopKPairs.resultType
  override def prettyName: String = "topk_pairs"

  // fail at ANALYSIS, not with an executor-side ClassCastException: the
  // registered SQL form accepts arbitrary expressions (callers CAST)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (scoreExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_pairs: score must be DOUBLE, got ${scoreExpr.dataType.sql}")
    else if (idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_pairs: id must be BIGINT, got ${idExpr.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val id = idExpr.eval(input)
    if (id != null) {
      val s = scoreExpr.eval(input)
      if (s == null) b.insert(isNull = true, 0.0, id.asInstanceOf[Long])
      else b.insert(isNull = false, s.asInstanceOf[Double],
        id.asInstanceOf[Long])
    }
    b
  }

  override def merge(b: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.n) {
      b.insert(other.nulls(i), other.scores(i), other.ids(i))
      i += 1
    }
    b
  }

  override def eval(b: TopKBuffer): Any = {
    val rows = new Array[Any](b.n)
    var i = 0
    while (i < b.n) {
      rows(i) = new GenericInternalRow(Array[Any](
        if (b.nulls(i)) null else b.scores(i), b.ids(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 + b.n * 17)
    buf.putInt(b.k).putInt(b.n)
    var i = 0
    while (i < b.n) {
      buf.put(if (b.nulls(i)) 1.toByte else 0.toByte)
        .putDouble(b.scores(i)).putLong(b.ids(i))
      i += 1
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val b = new TopKBuffer(buf.getInt())
    val n = buf.getInt()
    var i = 0
    // entries arrive in rank order, so re-inserting preserves it exactly
    while (i < n) {
      b.insert(buf.get() == 1, buf.getDouble(), buf.getLong())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairs =
    copy(scoreExpr = newLeft, idExpr = newRight)
}

object TopKPairs {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = true),
    StructField("id", LongType, nullable = false))), containsNull = false)

  /** DataFrame-API entry: `groupBy(g).agg(TopKPairs.topK(score, id, k))`. */
  def topK(score: Column, id: Column, k: Int): Column =
    GraftExpressionBridge.column(
      TopKPairs(GraftExpressionBridge.expression(score),
        GraftExpressionBridge.expression(id), k).toAggregateExpression())
}

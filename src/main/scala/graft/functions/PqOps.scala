package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd product-quantization encoder: given an `ARRAY<DOUBLE>` vector
  * and a driver-held codebook set (m subspaces × ksub codewords × dsub
  * dims), emits `ARRAY<INT>` — per subspace, the codeword index minimizing
  * squared L2 distance to the vector's slice (ties to the smaller index).
  *
  * The [[BestMatch]] family's narrow-stateless-projection member for the
  * compression plane: one pass per row, no join, no state, streaming-safe.
  * At deployment scale this is what makes a re-rankable ANN index fit in
  * memory — m codes (one byte each at ksub ≤ 256) stand in for the full
  * float vector, an 32×-plus compression of a 64-dim float corpus.
  *
  * Oracle parity: squared distance is computed in the EXPANDED form
  * `(‖x‖² + ‖c‖²) − 2·⟨x,c⟩` with each inner product folding left-to-right
  * — the exact operation sequence of DuckDB's `(list_dot_product(x,x) +
  * list_dot_product(c,c)) - 2*list_dot_product(x,c)` — NOT the fused
  * `Σ(x−c)²` loop, whose different rounding could flip an argmin on a
  * near-tie. ‖c‖² is precomputed per codeword with the same fold.
  *
  * NULL input → NULL; dimension mismatch (vector length ≠ m·dsub) → NULL —
  * the [[DotProduct]] contract: a silently truncated encoding would be a
  * plausible-looking wrong code. Assumes non-null elements (embedding
  * vectors). */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "PqEncode needs at least one codeword per subspace")
  require(codebooks.forall(_.forall(_.length == codebooks(0)(0).length)),
    "PqEncode codewords must share one sub-dimension")

  private def m: Int = codebooks.length
  private def dsub: Int = codebooks(0)(0).length

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects an ARRAY<DOUBLE> input, got ${t.sql}")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  // ‖c‖² per (subspace, codeword), left-to-right fold — same op sequence as
  // the oracle's list_dot_product(c, c)
  @transient private lazy val cNormSq: Array[Array[Double]] =
    codebooks.map(_.map { c =>
      var s = 0.0; var j = 0
      while (j < c.length) { s += c(j) * c(j); j += 1 }
      s
    })

  /** The per-row kernel; public-to-codegen, not API. */
  def compute(a: ArrayData): ArrayData = {
    if (a.numElements() != m * dsub) return null
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val off = s * dsub
      // ‖x_s‖², the oracle's list_dot_product(slice, slice)
      var xx = 0.0
      var j = 0
      while (j < dsub) {
        val x = a.getDouble(off + j); xx += x * x; j += 1
      }
      val cbs = codebooks(s); val nsq = cNormSq(s)
      var best = 0; var bestD = Double.NaN
      var c = 0
      while (c < cbs.length) {
        val cb = cbs(c)
        var dot = 0.0
        j = 0
        while (j < dsub) { dot += a.getDouble(off + j) * cb(j); j += 1 }
        val d = (xx + nsq(c)) - 2.0 * dot
        // strictly-less keeps the FIRST (smallest) code on exact ties —
        // the oracle's ORDER BY dist, code
        if (c == 0 || d < bestD) { best = c; bestD = d }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("pqEncode", this,
        classOf[PqEncode].getName)
      val res = ctx.freshName("codes")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res = $self.compute($a);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  // contents-based equality/hashing (the [[BestMatch]] rationale)
  override def equals(other: Any): Boolean = other match {
    case PqEncode(c, ocb) =>
      child == c && codebooks.length == ocb.length &&
        codebooks.indices.forall(i => java.util.Arrays.deepEquals(
          codebooks(i).asInstanceOf[Array[AnyRef]],
          ocb(i).asInstanceOf[Array[AnyRef]]))
    case _ => false
  }
  override def hashCode(): Int =
    codebooks.foldLeft(child.hashCode()) { (h, sub) =>
      31 * h + java.util.Arrays.deepHashCode(sub.asInstanceOf[Array[AnyRef]])
    }
}

/** Codegen'd asymmetric-distance (ADC) scorer: given a row's `ARRAY<INT>` PQ
  * codes and a query's flattened lookup table (`ARRAY<BIGINT>`, laid out
  * `lut[s·ksub + c]` in 6-dp micro-units), returns the BIGINT micro-score
  * `Σ_s lut[s·ksub + codes[s]]` — the PQ approximation of the query-document
  * cosine, exact-integer so ranking needs no float comparison and the
  * DuckDB oracle's DECIMAL sum matches term-for-term.
  *
  * One O(m) loop per pair — this is the whole point of PQ search: the
  * per-pair work is m table lookups instead of a dim-length dot product,
  * and the corpus side streams as codes, never as vectors.
  *
  * NULL on either side → NULL. A code outside the LUT's range (mismatched
  * ksub between encode and LUT build) → NULL, the [[DotProduct]] mismatch
  * contract — a silent modulo/clamp would produce a plausible wrong score. */
case class AdcScoreMicro(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  require(ksub > 0, "AdcScoreMicro needs a positive codebook size")

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_score expects (ARRAY<INT> codes, ARRAY<BIGINT> lut), " +
          s"got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "adc_score"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (lut.numElements() != m * ksub) return null
    var s = 0L
    var i = 0
    while (i < m) {
      val c = codes.getInt(i)
      if (c < 0 || c >= ksub) return null
      s += lut.getLong(i * ksub + c)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      s"""
         |int $m = $a.numElements();
         |if ($b.numElements() != $m * $ksub) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $m && !${ev.isNull}; $i++) {
         |    int $c = $a.getInt($i);
         |    if ($c < 0 || $c >= $ksub) { ${ev.isNull} = true; }
         |    else { $s += $b.getLong($i * $ksub + $c); }
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScoreMicro =
    copy(left = newLeft, right = newRight)
}

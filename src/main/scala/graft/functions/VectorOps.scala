package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types._

/** Codegen'd dot product over two `ARRAY<DOUBLE>` columns.
  *
  * The `zip_with` + `aggregate` higher-order formulation allocates an
  * intermediate array and walks interpreted lambda closures per element — fine
  * for per-row use, ruinous inside an O(N²) pair join (measured ~60 µs/pair vs
  * ~0.1 µs here). This expression stays inside whole-stage codegen: a tight
  * primitive loop over `ArrayData`, no allocation, no virtual calls.
  *
  * Accumulation is left-to-right (`s += x(i) * y(i)`), the exact operation
  * sequence of the `aggregate` fold it replaces AND of DuckDB's
  * `list_dot_product` — so oracle comparisons stay bit-identical.
  *
  * MISMATCHED lengths yield NULL, also matching the declarative fold:
  * `zip_with` pads the shorter side with null and the `aggregate` sum
  * propagates it. A silent min-length truncation instead returned a partial,
  * plausible-looking dot product for e.g. a 512-dim vector scored against a
  * 768-dim one (a mixed-model backfill) — corrupting every best-match
  * downstream rather than surfacing the bad pair.
  *
  * Assumes non-null array elements (embedding vectors); a null element reads as
  * 0.0, matching the SQL fold's null-propagation-free arithmetic on this data.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // NULL on length mismatch, independent of child nullability
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product expects two ARRAY<DOUBLE> inputs, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Loop-codegen'd argmax of a vector against a DRIVER-HELD reference matrix —
  * the large-k twin of the unrolled `array_max(array(struct(dotp(e, ref_i),
  * -id_i)…))` kernel in `Semantic.withBestMatch`. Returns the identical
  * `STRUCT<cos: DOUBLE, nid: BIGINT>` (max cosine; ties to the LOWEST id via
  * the negated id), with Spark's exact double ordering (NaN greatest, -0.0 <
  * 0.0) via `SQLOrderingUtil.compareDoubles`.
  *
  * WHY this exists: the unrolled formulation materializes k dot products as
  * ONE expression tree. A single expression cannot be split by codegen's
  * `splitExpressions`, so past k ≈ 32 (dim 64) the generated method crosses
  * the JVM's HugeMethodLimit, HotSpot refuses to JIT it, and the whole stage
  * runs in the bytecode interpreter — measured 33 s vs 4 s for k = 59 vs 32
  * over the same 60 k vectors (SCALING.md). This expression instead emits a
  * tiny k-independent LOOP over a referenced `double[][]` — same flops, same
  * left-to-right accumulation as [[DotProduct]] (`s += e(i) * ref(i)`, IEEE
  * multiply is commutative, so oracle parity is preserved bit-for-bit), and
  * the JIT compiles it at any k. Matters because `Semantic.kFor` grows k
  * linearly with the corpus — at 100 TB, k is in the tens of thousands and
  * the unrolled kernel is not an option.
  *
  * Stays a narrow stateless projection: streaming-safe (assignAgainst /
  * embedDecontamAgainst route arriving vectors with it), no join, no state. */
case class BestMatch(child: Expression, ids: Array[Long],
    refs: Array[Array[Double]]) extends UnaryExpression {

  require(ids.nonEmpty && ids.length == refs.length,
    "BestMatch needs one id per reference vector")
  require(refs.forall(_.length == refs(0).length),
    "BestMatch reference vectors must share one dimension")

  // NULL struct when the input's dimension doesn't match the references —
  // the [[DotProduct]] mismatch contract lifted to the argmax: a truncated
  // partial score would pick a plausible-but-wrong winner silently
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"best_match expects an ARRAY<DOUBLE> input, got ${t.sql}")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("cos", DoubleType, nullable = false),
    StructField("nid", LongType, nullable = false)))
  override def prettyName: String = "best_match"

  private def dot(e: ArrayData, ref: Array[Double]): Double = {
    val n = ref.length
    var s = 0.0
    var i = 0
    while (i < n) { s += e.getDouble(i) * ref(i); i += 1 }
    s
  }

  override protected def nullSafeEval(a: Any): Any = {
    val e = a.asInstanceOf[ArrayData]
    if (e.numElements() != refs(0).length) return null
    var bestCos = dot(e, refs(0))
    var bestNid = -ids(0)
    var j = 1
    while (j < refs.length) {
      val c = dot(e, refs(j))
      val cmp = org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles(c, bestCos)
      if (cmp > 0 || (cmp == 0 && -ids(j) > bestNid)) { bestCos = c; bestNid = -ids(j) }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestCos, bestNid))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val refsRef = ctx.addReferenceObj("bmRefs", refs, "double[][]")
      val idsRef = ctx.addReferenceObj("bmIds", ids, "long[]")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val bc = ctx.freshName("bestCos")
      val bn = ctx.freshName("bestNid")
      val cmp = ctx.freshName("cmp")
      s"""
         |if ($e.numElements() != $refsRef[0].length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $bc = 0.0; long $bn = 0L;
         |  for (int $j = 0; $j < $refsRef.length; $j++) {
         |    int $n = $refsRef[$j].length;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $e.getDouble($i) * $refsRef[$j][$i];
         |    }
         |    int $cmp = org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles($s, $bc);
         |    if ($j == 0 || $cmp > 0 || ($cmp == 0 && -$idsRef[$j] > $bn)) {
         |      $bc = $s; $bn = -$idsRef[$j];
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{ $bc, $bn });
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BestMatch =
    copy(child = newChild)

  // The generated case-class equality compares the Array fields by REFERENCE,
  // so two bestMatch columns built from the same reference set would never
  // compare equal — silently defeating common-subexpression elimination,
  // exchange/subquery reuse, and cached-plan matching (all go through
  // semanticEquals, which canonicalizes then uses ==). Compare and hash the
  // array CONTENTS instead.
  override def equals(other: Any): Boolean = other match {
    case BestMatch(c, oids, orefs) =>
      child == c && java.util.Arrays.equals(ids, oids) &&
        java.util.Arrays.deepEquals(refs.asInstanceOf[Array[AnyRef]],
          orefs.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = {
    var h = child.hashCode()
    h = 31 * h + java.util.Arrays.hashCode(ids)
    h = 31 * h + java.util.Arrays.deepHashCode(refs.asInstanceOf[Array[AnyRef]])
    h
  }
}

/** Codegen'd unit-length normalization of an `ARRAY<DOUBLE>` — the fused twin
  * of `when(norm(raw) > 0, transform(raw, x => x / norm(raw)))`.
  *
  * WHY an expression and not the declarative form: `transform` is a
  * higher-order function, which Spark evaluates as an INTERPRETED lambda
  * (CodegenFallback — per-element closure calls and boxed doubles). That is
  * tolerable when the normalization runs once per row — but Catalyst does not
  * promise once. Every equi-join downstream of the normalized column infers
  * `IsNotNull` on its (nullable) join key, and predicate pushdown rewrites
  * that constraint through the projection stack down to the scan,
  * re-evaluating the ENTIRE normalization inside a Filter and then AGAIN in
  * the Project above it (measured: 2× on the ANN suite, round 11 → 12). A
  * plan-shape fix (blocking the pushdown) would trade away real pruning;
  * instead this expression makes re-evaluation CHEAP: one tight codegen'd
  * loop, no lambda, no boxing, primitive `double[]` output.
  *
  * Semantics are bit-identical to the declarative form it replaces:
  * sum-of-squares folds left-to-right (the [[DotProduct]] order), the norm is
  * `sqrt` of that sum, each element divides by the norm in array order.
  * Degenerate inputs — NULL, empty, zero-norm, or NaN-poisoned (NaN sum fails
  * `> 0`) — yield NULL, never a NaN vector: Spark orders NaN GREATEST, so one
  * NaN vector would win every max-cosine contest downstream and silently
  * absorb the corpus. */
case class NormalizeVector(child: Expression) extends UnaryExpression {

  // NULL on zero-norm/empty input, independent of child nullability
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"normalize_vector expects an ARRAY<DOUBLE> input, got ${t.sql}")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "normalize_vector"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); ss += v * v; i += 1 }
    val norm = math.sqrt(ss)
    if (!(norm > 0)) null
    else {
      val out = new Array[Double](n)
      i = 0
      while (i < n) { out(i) = x.getDouble(i) / norm; i += 1 }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ss = ctx.freshName("ss")
      val nm = ctx.freshName("nm")
      val out = ctx.freshName("out")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i);
         |  $ss += $v * $v;
         |}
         |double $nm = java.lang.Math.sqrt($ss);
         |if (!($nm > 0)) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $out = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = $a.getDouble($i) / $nm;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormalizeVector =
    copy(child = newChild)
}

/** Column-level vector math built on [[DotProduct]]. */
object VectorOps {

  def dotp(a: Column, b: Column): Column =
    GraftExpressionBridge.column(DotProduct(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))

  /** L2 norm — `sqrt(dotp(a, a))`: same sum-of-squares fold order as the
    * higher-order formulation it replaces. */
  def norm(a: Column): Column = sqrt(dotp(a, a))

  /** Unit-length normalization with NULL-on-degenerate — see
    * [[NormalizeVector]]. */
  def normalizeVec(a: Column): Column =
    GraftExpressionBridge.column(NormalizeVector(
      GraftExpressionBridge.expression(a)))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column = dotp(a, b) / (norm(a) * norm(b))

  /** Loop-codegen'd argmax against a driver-held reference matrix — see
    * [[BestMatch]]. `refs` must be (id, vector) pairs; emits
    * `STRUCT<cos, nid>` with nid = -id of the best match. */
  def bestMatch(e: Column, refs: Seq[(Long, Seq[Double])]): Column =
    GraftExpressionBridge.column(BestMatch(
      GraftExpressionBridge.expression(e),
      refs.map(_._1).toArray, refs.map(_._2.toArray).toArray))
}

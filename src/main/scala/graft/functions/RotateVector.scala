package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd fixed-matrix vector rotation: given an `ARRAY<DOUBLE>` vector
  * and a driver-held square matrix R (dim × dim), emits `ARRAY<DOUBLE>`
  * `y_i = Σ_j R[i][j]·x[j]` — the pre-encode transform of the OPQ tier
  * (Ge et al. 2013: product quantization after a learned orthogonal
  * rotation; [[graft.corpus.Quantization.opqRotation]] trains R, this
  * applies it).
  *
  * The [[BestMatch]] family's narrow-stateless-projection discipline: one
  * dim² fused multiply-add loop per row, no join, no state,
  * streaming-safe — at 100 TB the rotation rides the same scan that
  * encodes, never a separate pass. The matrix broadcasts as a plan
  * literal (dim² doubles — 32 KB at dim 64, the codebook-broadcast rule).
  *
  * NULL input → NULL; dimension mismatch (vector length ≠ matrix order) →
  * NULL — the [[DotProduct]] contract: a silently truncated rotation would
  * be a plausible-looking wrong vector. Assumes non-null elements
  * (embedding vectors). */
case class RotateVector(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression {

  require(matrix.nonEmpty && matrix.forall(_.length == matrix.length),
    "RotateVector needs a square, non-empty matrix")

  private def dim: Int = matrix.length

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"rotate_vector expects an ARRAY<DOUBLE> input, got ${t.sql}")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "rotate_vector"

  /** The per-row kernel; public-to-codegen, not API. */
  def compute(a: ArrayData): ArrayData = {
    if (a.numElements() != dim) return null
    val x = new Array[Double](dim)
    var j = 0
    while (j < dim) { x(j) = a.getDouble(j); j += 1 }
    val y = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      val row = matrix(i)
      var s = 0.0
      j = 0
      while (j < dim) { s += row(j) * x(j); j += 1 }
      y(i) = s
      i += 1
    }
    new GenericArrayData(y)
  }

  override protected def nullSafeEval(a: Any): Any =
    compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val self = ctx.addReferenceObj("rotateVector", this,
        classOf[RotateVector].getName)
      val res = ctx.freshName("rotated")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res = $self.compute($a);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RotateVector =
    copy(child = newChild)

  // contents-based equality/hashing (the [[BestMatch]] rationale)
  override def equals(other: Any): Boolean = other match {
    case RotateVector(c, om) =>
      child == c && java.util.Arrays.deepEquals(
        matrix.asInstanceOf[Array[AnyRef]], om.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(matrix.asInstanceOf[Array[AnyRef]])
}

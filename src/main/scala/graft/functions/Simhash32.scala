package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 32-bit SimHash of a token array in one pass per document.
  *
  * Replaces the explode → md5 → 32-conditional-sums → groupBy formulation: that
  * shape shuffles one row PER TOKEN and re-aggregates, while the signature is a
  * per-document scalar — computable with no shuffle at all. Semantics are
  * identical to the declarative version (and to the DuckDB oracle): bit i of
  * the signature is the sign of the token-frequency-weighted sum of the high
  * bit of the i-th hex nibble of md5(token); duplicate tokens weigh by
  * occurrence. Hex nibble i is the {high, low} half of digest byte i/2, so the
  * "high bit of nibble i" is digest-bit `7 - 4*(i%2)` of that byte — no hex
  * string is materialized.
  *
  * `doGenCode` emits a call to [[kernel]] on the referenced expression
  * instance: under CodegenFallback the WHOLE subtree — including the
  * `split(text, ' ')` child — evaluated interpreted per row; this keeps the
  * child inside whole-stage codegen and pays one virtual call for the kernel.
  * eval and codegen paths are pinned equal by `EquivalenceSpec`.
  */
case class Simhash32(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash32 expects ARRAY<STRING>, got ${t.sql}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  /** The per-document signature loop — shared verbatim by the interpreted and
    * generated paths (the generated code calls this method). */
  def kernel(ws: ArrayData): Long = {
    val md = Digests.md5.get()
    val counts = new Array[Int](32)
    var t = 0
    val n = ws.numElements()
    while (t < n) {
      val tok = ws.getUTF8String(t)
      if (tok != null) {
        md.reset()
        val digest = md.digest(tok.getBytes)
        var i = 0
        while (i < 32) {
          // high bit of hex nibble i: bit 7 (even i) or bit 3 (odd i) of byte i/2
          val bit = (digest(i >> 1) >> (7 - 4 * (i & 1))) & 1
          counts(i) += (if (bit == 1) 1 else -1)
          i += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 32) {
      if (counts(i) > 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val self = ctx.addReferenceObj("simhash", this, classOf[Simhash32].getName)
      s"${ev.value} = $self.kernel($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Simhash32 =
    copy(child = newChild)
}

object Simhash32 {
  def apply(tokens: Column): Column =
    GraftExpressionBridge.column(Simhash32(GraftExpressionBridge.expression(tokens)))
}

/** Per-thread digest instances for the hot expression eval paths —
  * `MessageDigest.getInstance` per row would pay a JCA provider lookup plus an
  * allocation per document, and expression instances may be shared across task
  * threads, so a plain field would race. */
private[functions] object Digests {
  val md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}

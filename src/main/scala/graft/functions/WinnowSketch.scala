package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint sketch (Schleimer et al., SIGMOD'03 shape) of a text
  * column in one pass per document: hash every char k-gram (md5 hex), slide a
  * w-position window keeping each window's minimum, and emit the selected set's
  * size and lexicographic minimum as a struct.
  *
  * Replaces the posexplode → per-gram md5 → window-min → groupBy(countDistinct)
  * pipeline, which shuffled one row PER CHARACTER-GRAM for a per-document
  * scalar result. Exact-equivalence notes:
  *  - grams are code-point windows via `UTF8String.substringSQL` — the same
  *    indexing `substr(text, i, k)` uses, so multi-byte text matches;
  *  - window minima are lexicographic on lowercase md5 hex, identical to the
  *    SQL `min(gh)` ordering; partial tail windows are kept (the
  *    `rowsBetween(0, w-1)` contract);
  *  - documents shorter than k code points yield null (the `length >= k`
  *    filter's row-drop, applied by the caller).
  *
  * `doGenCode` emits a call to [[kernel]] on the referenced expression
  * instance: under CodegenFallback the whole subtree evaluated interpreted per
  * row; this keeps the surrounding projection inside whole-stage codegen and
  * pays one virtual call for the kernel. eval and codegen paths are pinned
  * equal by `EquivalenceSpec`.
  */
case class WinnowSketch(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1 && w >= 1, "gram width and window size must be >= 1")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_sketch expects STRING, got ${t.sql}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_fingerprints", LongType, nullable = false),
    StructField("min_fingerprint", StringType, nullable = false)))
  // docs shorter than k yield null EVEN for a non-nullable child — without this
  // override the optimizer would fold the caller's isNotNull filter away and
  // downstream field access would skip its null check
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_sketch"

  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest, bytes: Array[Byte]): String = {
    md.reset()
    val d = md.digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    kernel(input.asInstanceOf[UTF8String])

  /** The per-document sketch loop — shared verbatim by the interpreted and
    * generated paths (the generated code calls this method). Returns null for
    * texts shorter than k code points. */
  def kernel(text: UTF8String): InternalRow = {
    val nChars = text.numChars()
    if (nChars < k) return null
    val n = nChars - k + 1
    val md = Digests.md5.get()
    val hashes = new Array[String](n)
    var i = 0
    while (i < n) {
      // substringSQL is 1-based and code-point-indexed, exactly like substr()
      hashes(i) = md5Hex(md, text.substringSQL(i + 1, k).getBytes)
      i += 1
    }
    val selected = new java.util.HashSet[String]()
    var globalMin: String = null
    var p = 0
    while (p < n) {
      var m = hashes(p)
      var j = p + 1
      val end = math.min(p + w, n)
      while (j < end) {
        if (hashes(j).compareTo(m) < 0) m = hashes(j)
        j += 1
      }
      selected.add(m)
      if (globalMin == null || m.compareTo(globalMin) < 0) globalMin = m
      p += 1
    }
    InternalRow(selected.size.toLong, UTF8String.fromString(globalMin))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val self = ctx.addReferenceObj("winnow", this, classOf[WinnowSketch].getName)
    val rowCls = classOf[InternalRow].getName
    val resultCode =
      code"""
         |${childGen.code}
         |boolean ${ev.isNull} = true;
         |$rowCls ${ev.value} = null;
         |if (!${childGen.isNull}) {
         |  ${ev.value} = $self.kernel(${childGen.value});
         |  ${ev.isNull} = (${ev.value} == null);
         |}
       """.stripMargin
    ev.copy(code = resultCode)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowSketch =
    copy(child = newChild)
}

object WinnowSketch {
  def apply(text: Column, k: Int, w: Int): Column =
    GraftExpressionBridge.column(
      WinnowSketch(GraftExpressionBridge.expression(text), k, w))
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the custom [[DotProduct]] Catalyst expression: value parity with the
  * higher-order-function formulation it replaced (bit-exact, same fold order),
  * null propagation, and analysis-time type rejection. */
class VectorOpsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (2L, Seq(0.1, 0.2), Seq(0.3, 0.4))).toDF("id", "a", "b")
  }

  test("dot_product equals the aggregate/zip_with fold bit-for-bit") {
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val rows = df.select(VectorOps.dotp(col("a"), col("b")).as("fast"), hof.as("slow"))
      .collect()
    rows.foreach { r =>
      java.lang.Double.doubleToLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToLongBits(r.getDouble(1))
    }
    rows.head.getDouble(0) shouldBe 32.0
  }

  test("dot_product survives both codegen and interpreted evaluation") {
    val out = df.select(VectorOps.dotp(col("a"), col("b")).as("d")).collect().map(_.getDouble(0))
    val expr = DotProduct(
      org.apache.spark.sql.GraftExpressionBridge.expression(col("a")),
      org.apache.spark.sql.GraftExpressionBridge.expression(col("b")))
    // interpreted path directly (eval over literal arrays)
    val lit = DotProduct(
      Literal.create(Array(1.0, 2.0, 3.0), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)),
      Literal.create(Array(4.0, 5.0, 6.0), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)))
    lit.eval(null) shouldBe 32.0
    expr.dataType shouldBe org.apache.spark.sql.types.DoubleType
    out should contain(32.0)
  }

  test("null array input and mismatched lengths both yield null") {
    import spark.implicits._
    val d = Seq((Seq(1.0, 2.0), null.asInstanceOf[Seq[Double]])).toDF("a", "b")
    d.select(VectorOps.dotp(col("a"), col("b"))).collect().head.isNullAt(0) shouldBe true
    // a 512-vs-768-dim pair (mixed-model backfill) must SURFACE, not produce
    // a plausible partial score over the shared prefix — and the declarative
    // fold agrees: zip_with pads with null and the aggregate sum propagates
    val m = Seq((Seq(1.0, 2.0, 9.0), Seq(3.0, 4.0))).toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val r = m.select(VectorOps.dotp(col("a"), col("b")).as("f"), hof.as("s"))
      .collect().head
    r.isNullAt(0) shouldBe true
    r.isNullAt(1) shouldBe true
  }

  test("BestMatch NULLs the whole struct on a dimension mismatch (both paths)") {
    import spark.implicits._
    val refs = Seq(1L -> Seq(1.0, 0.0, 0.0), 2L -> Seq(0.0, 1.0, 0.0))
    val d = Seq((1L, Seq(1.0, 0.0, 0.0)), (2L, Seq(1.0, 0.0))).toDF("id", "e")
    val out = d.select(col("id"), VectorOps.bestMatch(col("e"), refs).as("bm"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    out shouldBe Map(1L -> false, 2L -> true)
    // interpreted eval agrees with codegen
    val expr = BestMatch(
      Literal.create(Array(1.0, 0.0), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)),
      Array(1L, 2L), Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0)))
    (expr.eval(null) == null) shouldBe true
  }

  test("normalize_vector equals the when/transform formulation bit-for-bit") {
    import spark.implicits._
    val vecs = Seq(
      Seq(1.0, 2.0, 3.0), Seq(0.1, -0.2, 0.3), Seq(1e-30, 0.0, 0.0),
      Seq(3.0, 4.0, 0.0)).map(Tuple1(_)).toDF("raw")
    val slow = vecs
      .withColumn("n", VectorOps.norm(col("raw")))
      .select(when(col("n") > 0, transform(col("raw"), x => x / col("n"))).as("e"))
      .collect().map(_.getSeq[Double](0))
    val fast = vecs.select(VectorOps.normalizeVec(col("raw")).as("e"))
      .collect().map(_.getSeq[Double](0))
    fast.zip(slow).foreach { case (f, s) =>
      f.map(java.lang.Double.doubleToLongBits) shouldBe
        s.map(java.lang.Double.doubleToLongBits)
    }
  }

  test("normalize_vector NULLs degenerate inputs on codegen and interpreted paths") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Seq(0.0, 0.0, 0.0)),        // zero norm
      (2L, Seq.empty[Double]),          // empty
      (3L, Seq(Double.NaN, 1.0, 0.0)), // NaN-poisoned: sum fails > 0
      (4L, Seq(1.0, 0.0, 0.0))).toDF("id", "raw")
      .union(Seq((5L, null.asInstanceOf[Seq[Double]])).toDF("id", "raw"))
    val rows = vecs.select(col("id"), VectorOps.normalizeVec(col("raw")).as("e"))
      .collect().sortBy(_.getLong(0))
    rows.map(r => r.isNullAt(1)) shouldBe Seq(true, true, true, false, true)
    rows(3).getSeq[Double](1) shouldBe Seq(1.0, 0.0, 0.0)
    // interpreted eval directly (Literal child, no codegen)
    val expr = NormalizeVector(Literal.create(Array(3.0, 4.0),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    expr.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toDoubleArray().toSeq shouldBe Seq(0.6, 0.8)
    assert(NormalizeVector(Literal.create(Array(0.0, 0.0),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
      .eval(null) == null)
  }

  test("non-ARRAY<DOUBLE> inputs are rejected at analysis time") {
    import spark.implicits._
    val d = Seq(("x", 1)).toDF("a", "b")
    an[Exception] should be thrownBy
      d.select(VectorOps.dotp(col("a"), col("b"))).collect()
  }

  test("cosine of parallel vectors is 1") {
    import spark.implicits._
    val d = Seq((Seq(1.0, 2.0), Seq(2.0, 4.0))).toDF("a", "b")
    d.select(VectorOps.cosine(col("a"), col("b"))).collect()
      .head.getDouble(0) shouldBe 1.0 +- 1e-12
  }

  test("bestMatch columns built from equal reference sets are semantically equal") {
    // two separately-built columns carry DISTINCT Array instances; the
    // default case-class equality (reference identity on arrays) would call
    // them different expressions, and CSE / exchange reuse / cached-plan
    // matching — all routed through semanticEquals — would silently miss
    // unit level: equal-content, distinct-instance arrays under an
    // identical (literal) child
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def mk(last: Double) = BestMatch(
      Literal.create(Array(1.0, 0.0), ArrayType(DoubleType)),
      Array(1L, 2L), Array(Array(1.0, 0.0), Array(0.0, last)))
    val (a, b) = (mk(1.0), mk(1.0))
    (a == b) shouldBe true
    a.hashCode() shouldBe b.hashCode()
    a.semanticEquals(b) shouldBe true
    // different contents still differ
    val c = mk(0.5)
    (a == c) shouldBe false
    a.semanticEquals(c) shouldBe false
    // plan level: in two analyses of the same query (children resolved to
    // AttributeReferences), the bestMatch projections are semantically equal
    // — the property CSE / exchange reuse / cached-plan matching relies on
    import spark.implicits._
    val refs = Seq(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0))
    val d = Seq(Tuple1(Seq(1.0, 0.0))).toDF("e")
    def analyzedBm() = d.select(VectorOps.bestMatch(col("e"), refs).as("bm"))
      .queryExecution.analyzed.expressions.flatMap(_.collect {
        case x: BestMatch => x
      }).head
    analyzedBm().semanticEquals(analyzedBm()) shouldBe true
  }
}

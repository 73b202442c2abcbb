package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Randomized equivalence: each custom codegen expression must reproduce the
  * declarative Spark formulation it replaced, row for row, over generated
  * corpora that include empty strings, short docs, duplicate grams, and
  * surrogate-pair text (emoji) — the case where byte- vs code-point indexing
  * diverge. Seeded, so failures replay. */
class EquivalenceSpec extends AnyFunSuite with SparkSpec with Matchers {

  /** Collect with codegen made MANDATORY: factoryMode=CODEGEN_ONLY and
    * whole-stage fallback off, plus an assert that the plan actually contains
    * a WholeStageCodegen span. Without this, a generated-code compile failure
    * silently falls back to interpreted eval and the eval==codegen pins pass
    * vacuously — the exact failure they exist to catch. */
  private def collectCodegenOnly(df: DataFrame): Array[org.apache.spark.sql.Row] = {
    assert(df.queryExecution.executedPlan.collectFirst {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, "plan has no WholeStageCodegen span — the codegen pin would be vacuous")
    val conf = spark.conf
    val prevFallback = conf.get("spark.sql.codegen.fallback", "true")
    val prevMode = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try df.collect()
    finally {
      conf.set("spark.sql.codegen.fallback", prevFallback)
      conf.set("spark.sql.codegen.factoryMode", prevMode)
    }
  }

  private def corpus(seed: Int, n: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("the", "cat", "sat", "on", "mat", "a", "中文", "données", "😀ok", "x")
    (0L until n).map { i =>
      val len = rnd.nextInt(12) // includes 0..2-token docs (below shingle width)
      i -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }.toDF("doc_id", "text")
  }

  test("NGramShingles == array_distinct(transform(sequence...)) on random corpora") {
    val d = corpus(seed = 1, n = 200)
    val ws = split(col("text"), " ")
    val n = 3
    val gram = (i: org.apache.spark.sql.Column) =>
      concat_ws(" ", (0 until n).map(k => element_at(ws, i + lit(k + 1))): _*)
    val declarative = when(F.size(ws) >= n,
      array_distinct(transform(sequence(lit(0), F.size(ws) - n), gram)))
      .otherwise(array().cast("array<string>"))
    val rows = d.select(NGramShingles(ws, n).as("fast"), declarative.as("slow")).collect()
    rows.foreach { r => r.getSeq[String](0) shouldBe r.getSeq[String](1) }
  }

  /** [[corpus]] backed by an RDD: a LocalRelation-based plan would be folded
    * by ConvertToLocalRelation with INTERPRETED eval, leaving no
    * WholeStageCodegen span for the codegen-only pins. */
  private def rddCorpus(seed: Int, n: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("the", "cat", "sat", "on", "mat", "a", "中文", "données", "😀ok", "x")
    val rows = (0L until n).map { i =>
      val len = rnd.nextInt(12)
      i -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows))
      .toDF("doc_id", "text")
  }

  test("MinHashSig == explode/xxhash64/min-groupBy on random corpora") {
    val d = rddCorpus(seed = 5, n = 200)
    val sh = NGramShingles(split(col("text"), " "), 3)
    val fast = collectCodegenOnly(
      d.select(col("doc_id"), MinHashSig(sh, 64).as("sig"))
        .filter(F.size(col("sig")) > 0))
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val post = d.select(col("doc_id"), explode(sh).as("s"))
      .withColumn("h", xxhash64(col("s")))
    val mins = (0 until 64).map(i => min(xxhash64(lit(i), col("h"))).as(s"m$i"))
    val slow = post.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until 64).map(i => col(s"m$i")): _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // same doc set (no-shingle docs absent from both) and identical signatures
    fast shouldBe slow
    fast should not be empty
  }

  test("MinHashSig interpreted eval matches its codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val d = rddCorpus(seed = 6, n = 120)
    val sh = NGramShingles(split(col("text"), " "), 3)
    val gen = collectCodegenOnly(
      d.select(col("doc_id"), MinHashSig(sh, 16).as("sig")))
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val interp = d.collect().map { r =>
      val ws = Literal.create(r.getString(1).split(" ", -1).toSeq,
        ArrayType(StringType))
      val shingled = graft.functions.NGramShingles(ws, 3).eval(null)
      val sig = graft.functions.MinHashSig(
        Literal(shingled, ArrayType(StringType)), 16).eval(null)
      r.getLong(0) -> sig
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray.toSeq
    }.toMap
    gen shouldBe interp
  }

  test("MinHashSig null elements are seed-passthrough, not an NPE") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    // SQL callers can hand minhash_sig a containsNull array; a null shingle
    // must behave like xxhash64's null (hash stays at its seed, 42), on BOTH
    // execution paths
    val d = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Tuple1(Seq[String]("a", null, "b")), Tuple1(Seq[String](null, null)))))
      .toDF("sh")
    val viaCodegen = collectCodegenOnly(
        d.select(MinHashSig(col("sh"), 8).as("sig")))
      .map(_.getSeq[Long](0))
    val viaEval = Seq(Seq("a", null, "b"), Seq(null, null)).map { ws =>
      MinHashSig(Literal.create(ws, ArrayType(StringType)), 8).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray.toSeq
    }
    viaCodegen.toSeq shouldBe viaEval
    // passthrough semantics: (null) contributes base 42, same as an all-null
    // array of any length — pin that equivalence
    val oneNull = MinHashSig(
      Literal.create(Seq[String](null), ArrayType(StringType)), 8).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq
    viaEval(1) shouldBe oneNull
  }

  test("Simhash32 == explode/md5/32-sums/groupBy on random corpora") {
    val d = corpus(seed = 2, n = 200).filter(F.length(col("text")) >= 0)
    val fast = d.select(col("doc_id"), Simhash32(split(col("text"), " ")).as("sig"))
    val tok = d.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("hx", md5(encode(col("w"), "UTF-8")))
    val highBit = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val sums = (0 until 32).map { i =>
      sum(when(substring(col("hx"), i + 1, 1).isin(highBit: _*), 1L).otherwise(-1L)).as(s"s$i")
    }
    val slow = tok.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(i =>
          when(col(s"s$i") > 0, shiftleft(lit(1L), i)).otherwise(0L)).reduce(_ + _).as("sig"))
    val f = fast.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s = slow.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the declarative form drops docs whose token explode is empty; ours keeps
    // them with signature 0 — split("", " ") yields [""], so both always agree
    s.keySet.foreach { k => f(k) shouldBe s(k) }
    f.keySet shouldBe s.keySet
  }

  test("WinnowSketch == posexplode/window-min/countDistinct on random corpora") {
    import org.apache.spark.sql.expressions.Window
    val (k, w) = (5, 8)
    val d = corpus(seed = 3, n = 200)
    val fast = graft.corpus.TextStats.winnowFingerprint(d, k, w)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val grams = d.filter(F.length(col("text")) >= k)
      .select(col("doc_id"),
        posexplode(expr(s"transform(sequence(1, length(text) - ${k - 1}), i -> substr(text, i, $k))"))
          .as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"), md5(encode(col("gram"), "UTF-8")).as("gh"))
    val sel = grams.select(col("doc_id"),
      min(col("gh")).over(Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(0, w - 1)).as("sel"))
    val slow = sel.groupBy(col("doc_id"))
      .agg(countDistinct(col("sel")).as("n"), min(col("sel")).as("m"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    fast shouldBe slow
  }

  test("NGramShingles interpreted eval == codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val rnd = new scala.util.Random(8)
    val vocab = Vector("a", "b", "c", "dd", "😀ok", "", "the")
    val rows = (0 until 150).map { _ =>
      Seq.fill(rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
    }
    // parallelize (not Seq.toDF): an RDD-backed plan survives to whole-stage
    // codegen; a LocalRelation would be folded with INTERPRETED eval (see the
    // DotProduct pin below)
    val viaCodegen = collectCodegenOnly(spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(Tuple1(_))))
      .toDF("ws")
      .select(NGramShingles(col("ws"), 3)))
      .map(_.getSeq[String](0))
    val viaEval = rows.map { ws =>
      NGramShingles(Literal.create(ws, ArrayType(StringType)), 3).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(StringType).map(_.toString).toSeq
    }
    viaCodegen.zip(viaEval).foreach { case (c, e) => c shouldBe e }
  }

  test("BandedLevenshtein == the built-in 3-arg levenshtein (random pairs " +
      "incl. surrogate pairs and empty strings); eval == codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(31)
    val alphabet = "abca 中😀"
    def word(n: Int) =
      Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    val rows = (0 until 300).map { _ =>
      val base = word(rnd.nextInt(30))
      // near pairs (a few edits), far pairs, and identical pairs all occur
      val other = rnd.nextInt(3) match {
        case 0 => base
        case 1 => base.patch(rnd.nextInt(base.length + 1),
          word(1 + rnd.nextInt(3)), rnd.nextInt(3))
        case _ => word(rnd.nextInt(30))
      }
      (base, other, rnd.nextInt(12) - 1) // thresholds include -1 and 0
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows))
      .toDF("a", "b", "t")
    val got = collectCodegenOnly(df.select(
      org.apache.spark.sql.GraftExpressionBridge.column(BandedLevenshtein(
        org.apache.spark.sql.GraftExpressionBridge.expression(col("a")),
        org.apache.spark.sql.GraftExpressionBridge.expression(col("b")),
        org.apache.spark.sql.GraftExpressionBridge.expression(col("t"))))))
      .map(_.getInt(0))
    val want = df.select(org.apache.spark.sql.GraftExpressionBridge.column(
      org.apache.spark.sql.catalyst.expressions.Levenshtein(
        org.apache.spark.sql.GraftExpressionBridge.expression(col("a")),
        org.apache.spark.sql.GraftExpressionBridge.expression(col("b")),
        Some(org.apache.spark.sql.GraftExpressionBridge.expression(col("t"))))))
      .collect().map(_.getInt(0))
    got.toSeq shouldBe want.toSeq
    // interpreted eval == codegen
    val viaEval = rows.map { case (a, b, t) =>
      BandedLevenshtein(Literal(UTF8String.fromString(a)),
        Literal(UTF8String.fromString(b)), Literal(t)).eval(null)
        .asInstanceOf[Int]
    }
    got.toSeq shouldBe viaEval
    // a "no limit" sentinel threshold must behave as unlimited, never
    // overflow the band arithmetic into a negative edge (i + t wrapped
    // before the clamp) — agree with the UNBOUNDED built-in
    for ((a, b) <- Seq(("ab", "a"), ("", ""), ("中😀x", "yz"),
        (word(25), word(7)))) {
      BandedLevenshtein(Literal(UTF8String.fromString(a)),
        Literal(UTF8String.fromString(b)), Literal(Int.MaxValue))
        .eval(null) shouldBe
        UTF8String.fromString(a).levenshteinDistance(
          UTF8String.fromString(b))
    }
  }

  test("Simhash32 interpreted eval == codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val rnd = new scala.util.Random(21)
    val vocab = Vector("the", "cat", "中文", "😀ok", "x", "")
    val rows = (0 until 150).map { _ =>
      Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
    }
    val viaCodegen = collectCodegenOnly(spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(Tuple1(_))))
      .toDF("ws")
      .select(Simhash32(col("ws")))).map(_.getLong(0))
    val viaEval = rows.map { ws =>
      Simhash32(Literal.create(ws, ArrayType(StringType))).eval(null)
        .asInstanceOf[Long]
    }
    viaCodegen.toSeq shouldBe viaEval
  }

  test("WinnowSketch interpreted eval == codegen path (incl. short-doc nulls)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val rnd = new scala.util.Random(22)
    val alphabet = "abc d😀"
    val rows = (0 until 150).map { _ =>
      Seq.fill(rnd.nextInt(20))(alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val (k, w) = (5, 8)
    val viaCodegen = collectCodegenOnly(spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(Tuple1(_))))
      .toDF("text")
      .select(WinnowSketch(col("text"), k, w).as("s")))
      .map { r =>
        if (r.isNullAt(0)) None
        else Some((r.getStruct(0).getLong(0), r.getStruct(0).getString(1)))
      }
    val viaEval = rows.map { t =>
      val v = WinnowSketch(Literal(t), k, w).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      if (v == null) None
      else Some((v.getLong(0), v.getUTF8String(1).toString))
    }
    viaCodegen.toSeq shouldBe viaEval
    viaEval.count(_.isEmpty) should be > 0 // the short-doc null path was hit
  }

  test("DotProduct interpreted eval == codegen path, bit for bit") {
    // every custom expression has a real doGenCode, so both execution paths
    // are pinned equal (this one bit-for-bit: double arithmetic)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    import spark.implicits._
    val rnd = new scala.util.Random(6)
    val vecs = (0 until 50).map { _ =>
      val dim = 1 + rnd.nextInt(40)
      (Seq.fill(dim)(rnd.nextDouble() * 2 - 1), Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    }
    // parallelize (not Seq.toDF): a LocalRelation input lets the
    // ConvertToLocalRelation optimizer rule fold the projection with
    // INTERPRETED eval at optimization time, and doGenCode never runs —
    // an RDD-backed plan survives to whole-stage codegen
    val viaCodegen = collectCodegenOnly(
      spark.createDataFrame(spark.sparkContext.parallelize(vecs))
        .toDF("a", "b")
        .select(VectorOps.dotp(col("a"), col("b")))).map(_.getDouble(0))
    val viaEval = vecs.map { case (a, b) =>
      DotProduct(
        Literal.create(a, ArrayType(DoubleType)),
        Literal.create(b, ArrayType(DoubleType))).eval(null).asInstanceOf[Double]
    }
    viaCodegen.zip(viaEval).foreach { case (c, e) =>
      java.lang.Double.doubleToLongBits(c) shouldBe java.lang.Double.doubleToLongBits(e)
    }
  }

  test("DotProduct == aggregate/zip_with fold on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(4)
    val d = (0 until 200).map { _ =>
      val dim = 1 + rnd.nextInt(80)
      (Seq.fill(dim)(rnd.nextDouble() * 2 - 1), Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    }.toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    d.select(VectorOps.dotp(col("a"), col("b")).as("f"), hof.as("s")).collect().foreach { r =>
      java.lang.Double.doubleToLongBits(r.getDouble(0)) shouldBe
        java.lang.Double.doubleToLongBits(r.getDouble(1))
    }
  }

  test("BpeSegment == the declarative fold segmentation; eval == codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(33)
    // cascading merges (t+h then th+e), repeats (a+a on "aa a aaa"),
    // empty words (double spaces), multi-byte and surrogate-pair text
    // (code-point symbol units), and an embedded newline (a word, not a
    // separator — and the class the oracle's [\s\S] wrap exists for)
    val vocab = Vector("abab", "banana", "aa", "", "中文中", "x", "the",
      "thee", "aaa", "a\nb", "😀ok")
    val rows = (0 until 120).map { _ =>
      Seq.fill(rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val merges = Seq("a" -> "b", "b" -> "a", "t" -> "h", "th" -> "e", "a" -> "a")
    val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map(Tuple1(_)))).toDF("text")
    val viaCodegen = collectCodegenOnly(
      df.select(BpeSegment(col("text"), merges).as("s")))
      .map(r => (r.getStruct(0).getInt(0), r.getStruct(0).getInt(1),
        r.getStruct(0).getString(2)))
    // the declarative transform/aggregate formulation the kernel replaced
    def mergePassDecl(syms: org.apache.spark.sql.Column, l: String, r: String) =
      aggregate(syms, array().cast("array<string>"), (acc, x) =>
        when(get(acc, F.size(acc) - 1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), F.size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))
    val nonEmpty = filter(split(col("text"), " "), w => w =!= lit(""))
    val segmented = transform(nonEmpty, w =>
      merges.foldLeft(split(w, ""))((s, m) => mergePassDecl(s, m._1, m._2)))
    val viaDecl = df.select(F.size(nonEmpty), F.size(flatten(segmented)),
        array_join(flatten(segmented), " ")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    viaCodegen.toSeq shouldBe viaDecl.toSeq
    // interpreted eval == codegen
    val viaEval = rows.map { t =>
      val row = BpeSegment(Literal(UTF8String.fromString(t), StringType),
        merges).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      (row.getInt(0), row.getInt(1), row.getUTF8String(2).toString)
    }
    viaCodegen.toSeq shouldBe viaEval
  }
}

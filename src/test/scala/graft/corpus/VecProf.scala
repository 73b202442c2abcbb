package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling harness for the vector-plane regression bisect (round 12).
  * Run: sbt "Test/runMain graft.corpus.VecProf". Not part of the test suite. */
object VecProf {

  def time(name: String, reps: Int = 3)(f: => Long): Unit = {
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e6, n)
    }
    println(f"PROF $name%-28s min=${ts.map(_._1).min}%8.1f ms  all=${ts.map(t => f"${t._1}%.0f").mkString(",")}  rows=${ts.head._2}")
  }

  // r10 normalizedBase: no zero-norm guard
  def normBaseOld(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("raw"))
      .withColumn("n", graft.functions.VectorOps.norm(col("raw")))
      .select(col("vec_id"), transform(col("raw"), x => x / col("n")).as("e"))

  // r11 normalizedBase (current)
  def normBaseNew(emb: DataFrame): DataFrame =
    Similarity.normalizedBase(emb)

  def lshBucketOld(e: org.apache.spark.sql.Column, bits: Int, dim: Int) = {
    val rnd = new scala.util.Random(42)
    val hp = Array.fill(bits, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
    (0 until bits).map { b =>
      val proj = graft.functions.VectorOps.dotp(e, typedLit(hp(b).toSeq))
      when(proj > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
  }

  // variant A: old unconditional sum + NULL-propagating zero term
  def lshBucketA(e: org.apache.spark.sql.Column, bits: Int, dim: Int) =
    lshBucketOld(e, bits, dim) + when(e.isNotNull, lit(0L))

  // variant B: (proj > 0) cast — NULL propagates through cast/multiply/sum
  def lshBucketB(e: org.apache.spark.sql.Column, bits: Int, dim: Int) = {
    val rnd = new scala.util.Random(42)
    val hp = Array.fill(bits, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
    (0 until bits).map { b =>
      val proj = graft.functions.VectorOps.dotp(e, typedLit(hp(b).toSeq))
      (proj > 0).cast("long") * (1L << b)
    }.reduce(_ + _)
  }

  def annLshVariant(emb: DataFrame, base: DataFrame, bucketKind: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = base.withColumn("bucket", bucketKind match {
      case "new" => Similarity.lshBucket(col("e"), 6, 64)
      case "old" => lshBucketOld(col("e"), 6, 64)
      case "A"   => lshBucketA(col("e"), 6, 64)
      case "B"   => lshBucketB(col("e"), 6, 64)
    })
    val pairs = bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("a.bucket").as("bucket"),
        col("b.vec_id").as("neighbor_id"),
        graft.functions.VectorOps.dotp(col("a.e"), col("b.e")).as("cos"))
    pairs
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rank") === 1)
      .select(col("vec_id"), col("bucket"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }

  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    // Isolate normalizedBase cost alone
    time("normBase-old count") { normBaseOld(emb).agg(sum(element_at(col("e"), 1))).collect(); 1L }
    time("normBase-new count") { normBaseNew(emb).agg(sum(element_at(col("e"), 1))).collect(); 1L }

    // x7 variants: bucket formulations over the new (guarded) norm base
    time("x7 bucket=old") { annLshVariant(emb, normBaseNew(emb), "old").count() }
    time("x7 bucket=new") { annLshVariant(emb, normBaseNew(emb), "new").count() }
    time("x7 bucket=A") { annLshVariant(emb, normBaseNew(emb), "A").count() }
    time("x7 bucket=B") { annLshVariant(emb, normBaseNew(emb), "B").count() }
    time("x7 current api") { Similarity.annLsh(emb).count() }

    // x13 and x44 / x51 as-is for reference
    time("x13 current api") { Similarity.annIvf(emb).count() }
    time("x44 current api") { Semantic.kmeansAssign(emb).count() }
    time("x51 current api") {
      Semantic.incrementalSemanticDedup(
        emb.filter(col("vec_id") % 2 === 1), emb.filter(col("vec_id") % 2 === 0)).count()
    }
    time("x45 current api") { Semantic.semanticDedup(emb).count() }
    spark.stop()
  }
}

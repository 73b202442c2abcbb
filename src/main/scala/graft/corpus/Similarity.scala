package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`embeddings(vec_id BIGINT,
  * embedding ARRAY<FLOAT>, label INT)`).
  *
  * Two tiers, mirroring how an ANN service is actually built:
  *  - [[cosineTopK]] — brute-force exact top-k: the correctness baseline. The query
  *    side is broadcast, so the big side streams through one narrow pass (no
  *    shuffle of the corpus); cost is O(|queries| x |corpus| x dim).
  *  - [[annLsh]] — the scale path: random-hyperplane (sign) LSH buckets the corpus,
  *    then searches only within buckets. The cross join disappears; the join is
  *    bucket-equality, fan-out bounded by bucket occupancy. Hyperplanes come from a
  *    fixed-seed generator so results are deterministic.
  *
  * All arithmetic is promoted to double BEFORE multiplying (`cast array<double>`),
  * both for accuracy and so the DuckDB oracle (which computes in double) matches
  * bit-for-bit; sums fold left-to-right in array order in both engines.
  */
object Similarity {

  private def toDouble(c: Column): Column = c.cast("array<double>")

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def norm(a: Column): Column =
    sqrt(aggregate(transform(a, v => v * v), lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector (vec_id < numQueries),
    * excluding self; rank ties broken by neighbor id. */
  def cosineTopK(emb: DataFrame, numQueries: Int = 20, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = emb.select(col("vec_id"), toDouble(col("embedding")).as("e"))
    val queries = base.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val pairs = base.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("neighbor_id"),
        cosine(col("qe"), col("e")).as("cos"))
    pairs
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("neighbor_id"), col("rank"),
        round(col("cos"), 6).as("cosine"))
  }

  /** Deterministic +-1 hyperplane matrix: `bits` hyperplanes x `dim` components. */
  private def hyperplanes(bits: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(bits, dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** Sign-LSH bucket id for an embedding: bit b = [dot(e, H_b) > 0]. */
  def lshBucket(e: Column, bits: Int, dim: Int): Column = {
    val hp = hyperplanes(bits, dim)
    (0 until bits).map { b =>
      val proj = aggregate(
        zip_with(e, typedLit(hp(b).toSeq), (x, h) => x * h), lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
  }

  /** Approximate nearest neighbor via sign-LSH: bucket the corpus, then for every
    * vector return its best same-bucket neighbor (exact cosine within the bucket).
    * Vectors alone in their bucket produce no row — the recall/efficiency trade
    * a real ANN index makes. */
  def annLsh(emb: DataFrame, bits: Int = 6, dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = emb.select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("bucket", lshBucket(col("e"), bits, dim))
    val pairs = base.as("a")
      .join(base.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("a.bucket").as("bucket"),
        col("b.vec_id").as("neighbor_id"),
        cosine(col("a.e"), col("b.e")).as("cos"))
    pairs
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rank") === 1)
      .select(col("vec_id"), col("bucket"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }
}

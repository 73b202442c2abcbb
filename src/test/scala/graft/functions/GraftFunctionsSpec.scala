package graft.functions

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class GraftFunctionsSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("registered SQL functions expose the codegen kernels to spark.sql") {
    GraftFunctions.register(spark)
    spark.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0) shouldBe 11.0
    spark.sql("SELECT ngram_shingles(array('a','b','c'), 2) AS s")
      .collect().head.getSeq[String](0) shouldBe Seq("a b", "b c")
    spark.sql(
      "SELECT size(minhash_sig(ngram_shingles(split('a b c d', ' '), 3), 16)) AS n")
      .collect().head.getInt(0) shouldBe 16
    // SQL and DataFrame paths are the SAME expression → identical values
    val sqlSig = spark.sql(
      "SELECT minhash_sig(ngram_shingles(split('a b c d', ' '), 3), 16) AS s")
      .collect().head.getSeq[Long](0)
    import spark.implicits._
    val dfSig = Seq("a b c d").toDF("text")
      .select(MinHashSig(NGramShingles(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " "), 3), 16))
      .collect().head.getSeq[Long](0)
    sqlSig shouldBe dfSig
    spark.sql("SELECT simhash32(split('the cat', ' ')) AS h")
      .collect().head.getLong(0) should be >= 0L
    spark.sql("SELECT winnow_sketch('abcdefghij', 5, 4).n_fingerprints AS n")
      .collect().head.getLong(0) should be > 0L
  }

  test("geometry arguments must be integer literals, refused loudly otherwise") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array('a'), CAST(id AS INT)) FROM range(1)")
        .collect()
    }
    e.getMessage should include("INTEGER literal")
  }
}

package graft.corpus

import graft.SparkSpec
import graft.multimodal.{FakeCodec, Media}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class CorpusSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact dedup groups byte-identical texts under the min doc_id") {
    val d = docs(1L -> "a b c", 2L -> "a b c", 3L -> "x y z")
    val out = TextDedup.exact(d).collect().map(r =>
      (r.getAs[Long]("canonical_doc_id"), r.getAs[Long]("n_copies"))).toSet
    out shouldBe Set((1L, 2L), (3L, 1L))
  }

  test("3-gram shingles are distinct, ordered windows; short docs get none") {
    import org.apache.spark.sql.functions.col
    val d = docs(1L -> "a b c d", 2L -> "a b")
    val sh = d.select(col("doc_id"),
      TextDedup.shingles(TextDedup.tokens(col("text")), 3).as("s"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    sh(1L) shouldBe Seq("a b c", "b c d")
    sh(2L) shouldBe Seq.empty
  }

  test("ngram Jaccard finds near-dups and skips dissimilar pairs") {
    // doc1/doc2 share 9 of 10 shingle positions (J = 9/11 ≈ 0.818); doc3 disjoint
    val t1 = (1 to 12).map(i => s"w$i").mkString(" ")
    val t2 = (1 to 12).map(i => if (i == 12) "zz" else s"w$i").mkString(" ")
    val d = docs(1L -> t1, 2L -> t2, 3L -> "q r s t u v")
    val pairs = TextDedup.ngramJaccardPairs(d, n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldBe Set((1L, 2L))
  }

  test("minhash+LSH (exact-verified) matches exact Jaccard on a small corpus") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val d = docs(
      1L -> base,
      2L -> base.replace("tok30", "other"),
      3L -> (31 to 60).map(i => s"tok$i").mkString(" "),
      4L -> base.replace("tok1", "alt"))
    val exact = TextDedup.ngramJaccardPairs(d, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextDedup.minhashPairs(d, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    exact should not be empty
    lsh shouldBe exact
  }

  test("dedup clusters: transitive chains merge, min id is canonical, clusters isolate") {
    import spark.implicits._
    // chain 1-2, 2-3 merges into one cluster; 5-9 separate
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.85), (5L, 9L, 0.95))
      .toDF("doc_id_1", "doc_id_2", "jaccard")
    val out = TextDedup.dedupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 9L -> 5L)
  }

  test("repetition stats: degenerate repetition maxes the fractions, varied text zeroes them") {
    val d = docs(1L -> "a a a a", 2L -> "a b", 3L -> "w x y z")
    val rows = TextStats.repetitionStats(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_tokens"), r.getAs[Double]("top_token_frac"),
          r.getAs[Double]("dup_2gram_frac"), r.getAs[Double]("dup_3gram_frac")))).toMap
    rows(1L) shouldBe ((4, 1.0, 0.666667, 0.5))
    rows(2L) shouldBe ((2, 0.5, 0.0, 0.0))
    rows(3L) shouldBe ((4, 0.25, 0.0, 0.0))
  }

  test("decontamination: only train docs sharing a benchmark shingle are flagged") {
    val d = docs(0L -> "a b c d", 1L -> "a b c x", 2L -> "q r s t")
    val rows = TextDedup.decontaminationReport(d, n = 3, benchMod = 50).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_shingles"),
        r.getAs[Long]("n_contaminated"), r.getAs[Double]("contaminated_frac")))
    rows.toSeq shouldBe Seq((1L, 2, 1L, 0.5))
  }

  test("quota sampling: tier-0 keeps everything, gates honor thresholds, and re-runs agree") {
    import spark.implicits._
    val d = (0L until 60L).map(i => (i, s"doc number $i words", s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    val kept = Curation.quotaSample(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // tier 0 (src0): threshold 'g' admits every hex gate
    kept.count(_._2 == "src0") shouldBe 20
    // every surviving gate is below its tier threshold
    kept.filter(_._2 == "src1").foreach(_._3 should be < "8")
    kept.filter(_._2 == "src2").foreach(_._3 should be < "4")
    // the gate is content-derived: a second run keeps the identical set
    Curation.quotaSample(d).collect().map(_.getLong(0)).sorted shouldBe
      kept.map(_._1).sorted
  }

  test("PII scrub counts each pattern on raw text and redacts all occurrences") {
    val d = docs(
      1L -> "mail a@b.org and c.d+x@e-f.co now",
      2L -> "call 555-123-4567 or 555-999-0000 from 10.0.3.77",
      3L -> "no pii here at all",
      4L -> "ip 192.168.0.1 twice 192.168.0.1")
    val r = Privacy.piiScrub(d).collect()
      .map(x => x.getLong(0) -> x).toMap
    (r(1L).getInt(1), r(1L).getInt(2), r(1L).getInt(3)) shouldBe ((2, 0, 0))
    r(1L).getString(4) shouldBe "mail <EMAIL> and <EMAIL> now"
    (r(2L).getInt(1), r(2L).getInt(2), r(2L).getInt(3)) shouldBe ((0, 2, 1))
    r(2L).getString(4) shouldBe "call <PHONE> or <PHONE> from <IP>"
    (r(3L).getInt(1), r(3L).getInt(2), r(3L).getInt(3)) shouldBe ((0, 0, 0))
    r(3L).getString(4) shouldBe "no pii here at all"
    r(4L).getInt(3) shouldBe 2
    r(4L).getString(4) shouldBe "ip <IP> twice <IP>"
  }

  test("text normalization is idempotent and flags exactly the changed docs") {
    val d = docs(
      1L -> "Already Messy  TEXT \t here ",
      2L -> "clean lowercase text",
      3L -> "  padded  ",
      4L -> "a\u000Bb") // vertical tab: in the explicit class, not RE2's \s
    val r = Privacy.normalizeText(d).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getInt(2), x.getInt(3), x.getInt(4)))
      .sortBy(_._1)
    r(0) shouldBe ((1L, "already messy text here", 27, 23, 1))
    r(1) shouldBe ((2L, "clean lowercase text", 20, 20, 0))
    r(2) shouldBe ((3L, "padded", 10, 6, 1))
    r(3) shouldBe ((4L, "a b", 3, 3, 1))
    // a second pass over its own output changes nothing
    val again = Privacy.normalizeText(
      Privacy.normalizeText(d).select(col("doc_id"), col("normalized").as("text")))
    again.filter(col("changed") =!= 0).count() shouldBe 0L
  }

  test("quota sampling fails loudly on a source with no numeric tier suffix") {
    // the DuckDB oracle's CAST raises on the same input — both engines must
    // refuse rather than silently routing the doc to an arbitrary tier
    import spark.implicits._
    val d = Seq((0L, "some text", "web-crawl")).toDF("doc_id", "text", "source")
    val e = intercept[Exception] { Curation.quotaSample(d).collect() }
    e.getMessage should include("no numeric tier suffix")
  }

  test("mix report aggregates exactly the quota sampler's survivors") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, split}
    import org.apache.spark.sql.{functions => F}
    val d = (0L until 60L).map(i => (i, s"doc number $i words", s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    val survivors = Curation.quotaSample(d).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val expected: Map[String, (Long, Long)] = d
      .filter(col("doc_id").isInCollection(survivors))
      .select(col("source"), F.size(split(col("text"), " ")).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
      .groupBy(_._1).map { case (s, xs) =>
        s -> ((xs.size.toLong, xs.map(_._2.toLong).sum))
      }
    val got = Curation.mixReport(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got shouldBe expected
  }

  test("bigram log-prob: MLE conditionals from the corpus; short docs absent") {
    val d = docs(1L -> "x y", 2L -> "x z", 3L -> "solo")
    // c(x ·) = 2, c(x y) = c(x z) = 1 -> each doc scores log10(1/2)
    val rows = TextStats.bigramLogProb(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("sum_logprob")))).toMap
    rows.keySet shouldBe Set(1L, 2L) // doc 3 has no bigrams
    rows(1L) shouldBe ((1L, -0.30103))
    rows(2L) shouldBe ((1L, -0.30103))
  }

  test("DSIR importance weights match a driver-side reference; short docs absent") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    // sources src0..src6: src0-src4 are DsirTargetSources, src5/src6 are not;
    // lengths 0..7 include the <2-token docs the absence pin needs
    val rows = (0L until 40L).map { i =>
      val len = rnd.nextInt(8)
      (i, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "), s"src${i % 7}")
    }
    val d = rows.toDF("doc_id", "text", "source")
    val targets = TextStats.DsirTargetSources.toSet
    val buckets = 256
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // (doc_id, source, bucket) per bigram occurrence — the operator's `occ`
    val occ = rows.flatMap { case (id, text, src) =>
      val ws = text.split(" ", -1) // "" splits to [""], matching Spark's split
      if (ws.length >= 2)
        ws.sliding(2).map(p =>
          (id, src, Integer.parseInt(md5hex(p.mkString(" ")).take(4), 16) % buckets)).toSeq
      else Seq.empty
    }
    val cr = occ.groupBy(_._3).view.mapValues(_.size).toMap
    val ct = occ.filter(o => targets(o._2)).groupBy(_._3).view.mapValues(_.size).toMap
    val tr = occ.size
    val tt = occ.count(o => targets(o._2))
    def lr(b: Int): BigDecimal = {
      val ratio = ((ct.getOrElse(b, 0) + 1).toDouble / (tt + buckets).toDouble) /
        ((cr(b) + 1).toDouble / (tr + buckets).toDouble)
      BigDecimal(java.math.BigDecimal.valueOf(math.log10(ratio))
        .setScale(8, java.math.RoundingMode.HALF_UP)) // Spark round() is HALF_UP
    }
    val expected = occ.groupBy(_._1).map { case (id, os) =>
      id -> ((os.size.toLong, os.map(o => lr(o._3)).sum.toDouble))
    }
    val got = TextStats.importanceWeights(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    got shouldBe expected
    // absence pin: docs with fewer than two tokens have no bigrams and no row
    val shortIds = rows.filter(_._2.split(" ", -1).length < 2).map(_._1).toSet
    shortIds should not be empty
    shortIds.intersect(got.keySet) shouldBe empty
  }

  test("sequence packing: chunk boundaries, offsets, and per-source isolation") {
    import spark.implicits._
    val d = Seq(
      (1L, Seq.fill(300)("t").mkString(" "), "srcA"), // starts at 0   -> seq 0, off 0
      (2L, Seq.fill(300)("t").mkString(" "), "srcA"), // starts at 300 -> seq 0, off 300
      (3L, Seq.fill(10)("t").mkString(" "), "srcA"),  // starts at 600 -> seq 1, off 88
      (4L, Seq.fill(5)("t").mkString(" "), "srcB"))   // own source    -> seq 0, off 0
      .toDF("doc_id", "text", "source")
    val out = Curation.packSequences(d).collect()
      .map(r => r.getLong(1) ->
        ((r.getString(0), r.getInt(2), r.getLong(3), r.getLong(4)))).toMap
    out(1L) shouldBe (("srcA", 300, 0L, 0L))
    out(2L) shouldBe (("srcA", 300, 0L, 300L))
    out(3L) shouldBe (("srcA", 10, 1L, 88L))
    out(4L) shouldBe (("srcB", 5, 0L, 0L))
  }

  test("packing-efficiency report: splits, padding, and NULL-text riders") {
    import spark.implicits._
    // srcA, budget 5: lengths 3,4,2 -> starts 0,3,7; doc 2 crosses the
    // boundary (3+4 > 5); total 9 -> 2 seqs, padding 1.
    // srcB: one NULL-text doc + one 5-token doc: NULL rides in n_docs only,
    // total 5 -> 1 seq, padding 0, no splits.
    val d = Seq(
      (1L, Option("a b c"), "srcA"),
      (2L, Option("a b c d"), "srcA"),
      (3L, Option("a b"), "srcA"),
      (4L, Option.empty[String], "srcB"),
      (5L, Option("a b c d e"), "srcB"))
      .toDF("doc_id", "text", "source")
    val got = Curation.packEfficiencyReport(d, budget = 5).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getLong(6), r.getDouble(7)))).toMap
    //               n_docs total n_seqs n_split split_frac  pad pad_frac
    got("srcA") shouldBe ((3L, 9L, 2L, 1L, 1.0 / 3, 1L, 0.1))
    got("srcB") shouldBe ((2L, 5L, 1L, 0L, 0.0, 0L, 0.0))
  }

  test("packing-efficiency report matches a driver-side replay on random " +
      "corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val rows = (0L until 60L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(30))("w").mkString(" "), s"s${i % 3}"))
    val d = rows.toDF("doc_id", "text", "source")
    val budget = 16
    val expected = rows.groupBy(_._3).map { case (src, ds) =>
      var cum = 0L; var splits = 0L
      ds.sortBy(_._1).foreach { case (_, text, _) =>
        val n = text.split(" ", -1).length
        if (cum % budget + n > budget) splits += 1
        cum += n
      }
      val nSeqs = (cum + budget - 1) / budget
      src -> ((ds.size.toLong, cum, nSeqs, splits,
        splits.toDouble / ds.size, nSeqs * budget - cum))
    }
    val got = Curation.packEfficiencyReport(d, budget).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getLong(6)))).toMap
    got shouldBe expected
  }

  test("sequence packing matches a driver-side running-sum reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (0L until 50L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(20))("w").mkString(" "), s"s${i % 4}"))
    val d = rows.toDF("doc_id", "text", "source")
    val budget = 16
    val expected = rows.groupBy(_._3).flatMap { case (_, docsOfSrc) =>
      var cum = 0L
      docsOfSrc.sortBy(_._1).map { case (id, text, _) =>
        val st = cum
        cum += text.split(" ", -1).length
        id -> ((st / budget, st % budget))
      }
    }
    val got = Curation.packSequences(d, budget).collect()
      .map(r => r.getLong(1) -> ((r.getLong(3), r.getLong(4)))).toMap
    got shouldBe expected
  }

  test("quality gate: each rule flags independently and keep is their conjunction") {
    val good = "the cat sat on a mat and the dog is here" // 11 tokens, stopwords, alpha
    val d = docs(
      1L -> good,
      2L -> "a b",                                   // too short -> r_len 0
      3L -> "1 2 3 4 5 6 7 8 9 10",                  // digits: no stopword, no alpha
      4L -> ("the " + "abcdefghijklmnopqrstuvwxyz " * 9).trim) // cpt > 12
    val r = TextStats.qualityGate(d).collect()
      .map(x => x.getLong(0) ->
        ((x.getInt(2), x.getInt(3), x.getInt(4), x.getInt(5), x.getInt(6)))).toMap
    r(1L) shouldBe ((1, 1, 1, 1, 1))
    r(2L)._1 shouldBe 0 // token count below GateMinTokens
    r(2L)._5 shouldBe 0
    r(3L)._3 shouldBe 0 // no stopwords
    r(3L)._4 shouldBe 0 // no alphabetic tokens
    r(3L)._5 shouldBe 0
    r(4L)._2 shouldBe 0 // mean chars per token beyond GateMaxCharsPerToken
    r(4L)._5 shouldBe 0
  }

  test("cross-source overlap: pairs aggregate under name-ordered source pairs") {
    import spark.implicits._
    val pairs = Seq(
      (1L, 2L, 0.9),  // srcB-srcA -> (srcA, srcB)
      (3L, 4L, 0.85), // srcA-srcB -> (srcA, srcB)
      (5L, 6L, 0.95)) // srcC-srcC
      .toDF("doc_id_1", "doc_id_2", "jaccard")
    val d = Seq(
      (1L, "srcB"), (2L, "srcA"), (3L, "srcA"), (4L, "srcB"),
      (5L, "srcC"), (6L, "srcC"))
      .map { case (id, s) => (id, "text", s) }.toDF("doc_id", "text", "source")
    val out = TextDedup.crossSourceOverlap(pairs, d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    out shouldBe Map(
      ("srcA", "srcB") -> ((2L, 0.9)),
      ("srcC", "srcC") -> ((1L, 0.95)))
  }

  test("tfidf keywords: rare tokens outrank ubiquitous ones, ties break on token") {
    val d = docs(
      1L -> "apple apple banana shared",
      2L -> "cherry shared shared common",
      3L -> "shared kiwi")
    val rows = TextStats.tfidfKeywords(d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rank")) ->
        ((r.getAs[String]("token"), r.getAs[Double]("score")))).toMap
    rows((1L, 1)) shouldBe (("apple", 0.954243))  // tf 2 × log10(3/1)
    rows((1L, 2)) shouldBe (("banana", 0.477121))
    rows((1L, 3)) shouldBe (("shared", 0.0))      // df = N ⇒ idf 0
    rows((3L, 1)) shouldBe (("kiwi", 0.477121))
    rows.keys.count(_._1 == 3L) shouldBe 2        // only 2 distinct tokens
  }

  test("per-domain quality top-k: highest quality wins per source, doc_id breaks ties") {
    import spark.implicits._
    val long = (1 to 100).map(_ => "the").mkString(" ") // max length + stopword score
    val d = Seq(
      (1L, long, "srcA"), (2L, "tiny", "srcA"), (3L, long, "srcA"),
      (4L, "x y", "srcB"))
      .toDF("doc_id", "text", "source")
    val out = Curation.topKByQuality(d, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(3)))
    out.toSet shouldBe Set(("srcA", 1L, 1), ("srcA", 3L, 2), ("srcB", 4L, 1))
  }

  test("verifyJaccard's hot join engages AQE skew-split under a viral-document skew") {
    import spark.implicits._
    // production shape: one viral doc_id_1 carries most of the candidate set,
    // so its key lands a corpus-scale slice on ONE reducer of the first join.
    // Thresholds are scaled down so the sf-test fixture crosses the same
    // trigger the real 256MB default guards at cluster scale.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val hot = 0L
      val candidates = ((1L to 20000L).map(i => (hot, i)) ++
        (1L to 200L).map(i => (i, i + 30000L))).toDF("doc_id_1", "doc_id_2")
      // sizedPostings shape: each doc's shingle-set size rides its rows
      val post = ((0L to 20200L) ++ (30001L to 30200L))
        .flatMap(id => Seq((id, 2, "sh_a"), (id, 2, s"sh_$id")))
        .toDF("doc_id", "n_shingles", "s")
      val verified = TextDedup.verifyJaccard(
        candidates, post, post, threshold = 0.0)
      // collect() (not count()) so the SAME query execution finalizes its
      // adaptive plan — count() would spawn a separate QueryExecution
      verified.collect().length shouldBe 20200 // every pair shares sh_a: J > 0
      val plan = verified.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-split in the verify join, plan was:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("two-phase top-k equals the one-window referee on a skewed corpus") {
    import spark.implicits._
    // one mega-domain (180 docs), two small ones — the shape that serializes
    // a single partition-by-source window through one task
    val rows = (1 to 180).map(i => (i.toLong, ("w " * (i % 37 + 1)).trim, "mega")) ++
      (181 to 190).map(i => (i.toLong, ("v " * (i % 7 + 1)).trim, "small")) ++
      Seq((191L, "solo doc", "one"))
    val d = rows.toDF("doc_id", "text", "source")
    val twoPhase = Curation.topKByQuality(d, k = 3, salts = 8)
    // referee: the direct single-window plan the salted shape must equal
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("quality").desc, col("doc_id"))
    val referee = graft.corpus.TextStats.quality(d, "source")
      .withColumn("rank",
        org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("source"), col("doc_id"), col("quality"), col("rank"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    twoPhase.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet shouldBe referee.toSet
    // and the plan really is two-phase: a (source, salt) window feeding a
    // constant-bounded per-source re-rank — two Window operators
    val plan = twoPhase.queryExecution.executedPlan.toString
    "(?s)Window.*Window".r.findFirstIn(plan) should not be empty
    plan should include("salt")
  }

  test("applyDedup keeps canonical survivors and untouched docs, drops the rest") {
    import spark.implicits._
    val d = docs(1L -> "a", 2L -> "b", 3L -> "c", 9L -> "z")
    // clusters: {1,2,3} canonical 1; 9 never paired (absent from the table)
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("doc_id", "cluster_id")
    val kept = TextDedup.applyDedup(d, clusters).collect().map(_.getLong(0)).toSet
    kept shouldBe Set(1L, 9L)
  }

  test("dedup clusters: an empty pair set yields an empty cluster table") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Double)].toDF("doc_id_1", "doc_id_2", "jaccard")
    TextDedup.dedupClusters(empty).count() shouldBe 0
  }

  test("dedup clusters match a reference union-find on randomized pair graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7) // fixed seed — deterministic test
    for (_ <- 1 to 3) {
      val n = 40
      val pairs = Seq.fill(30)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b), 0.9) }
        .distinct
      // reference: driver-side union-find with min-id roots
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b, _) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
      }
      val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        .map(x => x -> find(x)).toMap
      val got = TextDedup.dedupClusters(
        pairs.toDF("doc_id_1", "doc_id_2", "jaccard")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      got shouldBe expected
    }
  }

  test("simhash: identical docs collide, near-identical docs are Hamming-close") {
    val t = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = docs(1L -> t, 2L -> t, 3L -> t.replace("w40", "x"))
    val sig = TextDedup.simhash(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    sig(1L) shouldBe sig(2L)
    val pairs = TextDedup.simhashPairs(d, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("hamming"))).toSet
    pairs.map(p => (p._1, p._2)) should contain((1L, 2L))
    pairs.collectFirst { case (1L, 2L, h) => h }.get shouldBe 0
  }

  test("cosine top-k ranks an exact duplicate vector first with cosine 1") {
    import spark.implicits._
    val e = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f)),
      (3L, Array(0.9f, 0.1f, 0f))).toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(e, numQueries = 1, k = 3).collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank"),
        r.getAs[Double]("cosine")))
    top.head shouldBe ((1L, 1, 1.0))
    top.map(_._1) shouldBe Array(1L, 3L, 2L)
  }

  test("sign-LSH buckets duplicates together; lone vectors produce no row") {
    import spark.implicits._
    val e = Seq(
      (0L, Array.fill(64)(1f)),
      (1L, Array.fill(64)(1f)),
      (2L, Array.tabulate(64)(i => if (i % 2 == 0) 1f else -1f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.annLsh(e).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("neighbor_id")).toMap
    out.get(0L) shouldBe Some(1L)
    out.get(1L) shouldBe Some(0L)
  }

  test("zero-norm vectors cannot poison similarity search or near-dup pairs") {
    import spark.implicits._
    // normalizing a zero vector is 0/0 = NaN per element, and Spark orders
    // NaN GREATEST — unguarded, the NaN row would take rank 1 in every
    // cos-desc window it joins. normalizedBase NULLs it instead; the NULL
    // bucket/cosine then loses everywhere by SQL semantics
    val zero = (9L, Array.fill(64)(0f))
    val e = Seq(
      (0L, Array.fill(64)(1f)),
      (1L, Array.fill(64)(1f)),
      zero).toDF("vec_id", "embedding")
    val lsh = Similarity.annLsh(e).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("neighbor_id")).toMap
    // the duplicates still find each other; the zero vector produces no row
    // (NULL bucket joins nothing) and displaces nobody's true neighbor
    lsh shouldBe Map(0L -> 1L, 1L -> 0L)
    // near-dup pairs: nothing near-duplicates the zero vector (NULL cosine
    // fails the >= threshold filter), the real pair survives
    val pairs = Similarity.cosineNearDupPairs(e, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldBe Set((0L, 1L))
    // a caller-supplied zero-norm IVF centroid is dropped (ce NULL), so the
    // index behaves exactly as if only the healthy centroid existed
    val cents = Seq((0L, Array.fill(64)(0f)), (1L, Array.fill(64)(1f)))
      .toDF("vec_id", "embedding")
    val healthyOnly = Seq((1L, Array.fill(64)(1f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (0L, Array.fill(64)(1f)),
      (1L, Array.tabulate(64)(i => if (i < 32) 1f else 0.5f)),
      (2L, Array.tabulate(64)(i => 0.1f * (i % 5)))).toDF("vec_id", "embedding")
    val withZeroCent = Similarity.annIvf(corpus, numQueries = 3, k = 2,
        centroids = Some(cents)).collect().map(_.toSeq).toSet
    val withHealthy = Similarity.annIvf(corpus, numQueries = 3, k = 2,
        centroids = Some(healthyOnly)).collect().map(_.toSeq).toSet
    withZeroCent shouldBe withHealthy
    withZeroCent should not be empty
  }

  test("truncated ANN: the shortlist bounds what re-rank can recover; full-prefix degenerates to exact") {
    import spark.implicits._
    // q = [0.8, 0, 0.6, 0]; prefix (d'=2) scores = 0.8·x1, full = exact cos.
    // B is the TRUE best (0.96) but its prefix score (0.48) is the worst —
    // with shortlist=2 it is missed (the approximation trade, visible), with
    // shortlist=3 stage 2 recovers it to rank 1
    val e = Seq(
      (0L, Array(0.8f, 0f, 0.6f, 0f)),     // query
      (1L, Array(1f, 0f, 0f, 0f)),         // A: prefix 0.8, full 0.8
      (2L, Array(0.6f, 0f, 0.8f, 0f)),     // B: prefix 0.48, full 0.96
      (3L, Array(0.9f, 0.43588989f, 0f, 0f)), // C: prefix 0.72, full 0.72
      (9L, Array(0f, 0f, 0f, 0f)))         // zero-norm: no rows either side
      .toDF("vec_id", "embedding")
    val narrow = Similarity.annTruncated(e, dPrefix = 2, shortlist = 2,
      numQueries = 1, k = 3).collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank")))
    narrow.toSeq shouldBe Seq((1L, 1), (3L, 2))
    val wide = Similarity.annTruncated(e, dPrefix = 2, shortlist = 3,
      numQueries = 1, k = 3).collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank")))
    wide.toSeq shouldBe Seq((2L, 1), (1L, 2), (3L, 3))
    // dPrefix = dim, shortlist ≥ corpus ⇒ bit-identical to the exact top-k
    // (cosineTopK keeps degenerate-query rows; restrict to the healthy query)
    val exact = Similarity.cosineTopK(e, numQueries = 1, k = 3).collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank"),
        r.getAs[Double]("cosine")))
    val full = Similarity.annTruncated(e, dPrefix = 4, shortlist = 10,
      numQueries = 1, k = 3).collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank"),
        r.getAs[Double]("cosine")))
    full.toSeq shouldBe exact.toSeq
  }

  test("minhashPairs rejects banding geometry that breaks the LSH math") {
    val d = docs(1L -> "a b c d e f", 2L -> "a b c d e g")
    // bands > numHashes: every slice would be empty — one constant bucket,
    // i.e. the full N² cross product banding exists to prevent
    an[IllegalArgumentException] should be thrownBy
      TextDedup.minhashPairs(d, numHashes = 64, bands = 128)
    // non-divisor: trailing signature rows silently dropped from every band
    an[IllegalArgumentException] should be thrownBy
      TextDedup.minhashPairs(d, numHashes = 64, bands = 12)
  }

  test("langId picks the dominant stopword language, und when none") {
    val d = docs(
      1L -> "the cat and the dog is a pet of mine",
      2L -> "el perro y la casa de que y el",
      3L -> "zzz qqq www")
    val out = TextStats.langId(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang")).toMap
    out shouldBe Map(1L -> "en", 2L -> "es", 3L -> "und")
  }

  test("quality is in [0,1] and rewards length + stopword density") {
    val good = "the " * 60 + "end"
    val d = docs(1L -> good.trim, 2L -> "zz")
    val q = TextStats.quality(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    q(1L) should be > q(2L)
    q.values.foreach { v => v should (be >= 0.0 and be <= 1.0) }
  }

  test("token stats: whitespace vs BPE-ish regex tokens") {
    val d = docs(1L -> "ab1 c2, d!")
    val r = TextStats.tokenStats(d).collect().head
    r.getAs[Int]("ws_tokens") shouldBe 3
    // ab,1 | c,2,"," | d,"!"
    r.getAs[Int]("bpe_tokens") shouldBe 7
    // vertical tab is whitespace to the tokenizer — TokenPattern spells the
    // class out because Java \s includes U+000B while RE2/DuckDB \s does
    // not, and the x10 oracle interpolates the pattern verbatim: with the
    // shorthand the two engines would count this text differently
    val vt = docs(1L -> "a\u000Bb")
    TextStats.tokenStats(vt).collect().head.getAs[Int]("bpe_tokens") shouldBe 2
  }

  test("winnowing fingerprints: deterministic, absent below k chars") {
    val d = docs(1L -> "abcdefghijklmnop", 2L -> "abc")
    val out = TextStats.winnowFingerprint(d).collect()
    out.map(_.getAs[Long]("doc_id")) shouldBe Array(1L)
    val again = TextStats.winnowFingerprint(d).collect()
    out.head.getAs[Long]("n_fingerprints") shouldBe
      again.head.getAs[Long]("n_fingerprints")
  }

  test("media metadata matches FakeCodec's digest arithmetic") {
    val d = docs(3L -> "hello")
    val m = Media.mediaMeta(d).collect().head
    val dec = FakeCodec.decode("hello".getBytes("UTF-8"))
    m.getAs[Int]("width") shouldBe dec.width
    m.getAs[Int]("height") shouldBe dec.height
    m.getAs[Int]("n_frames") shouldBe dec.nFrames
    m.getAs[Int]("n_bytes") shouldBe 5
    m.getAs[String]("mime") shouldBe "image/png"
  }

  test("media feature extraction is batch-size invariant") {
    val d = docs((0L until 10L).map(i => i -> s"payload-$i-${"x" * i.toInt}"): _*)
    def run(bs: Int) = Media.mediaFeatures(spark, d, FakeCodec, batchSize = bs)
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    run(2) shouldBe run(64)
  }

  test("frame sampling tiles the blob: contiguous exact ranges when all frames kept") {
    val d = docs(5L -> "some video-ish payload bytes here")
    val meta = Media.mediaMeta(d).collect().head
    val frames = Media.frameSample(d).collect().sortBy(_.getAs[Int]("sample_idx"))
    frames.length shouldBe meta.getAs[Int]("sampled_frames")
    frames.map(_.getAs[Long]("frame_no")).toSeq shouldBe
      frames.map(_.getAs[Long]("frame_no")).toSeq.sorted
    frames.foreach { f =>
      f.getAs[Long]("frame_offset") should be >= 0L
      f.getAs[Long]("frame_offset") + f.getAs[Long]("frame_len") should
        be <= meta.getAs[Int]("n_bytes").toLong
    }
    if (meta.getAs[Int]("n_frames") <= 4) {
      // all frames sampled -> ranges tile [0, n_bytes) with no gap or overlap
      val sorted = frames.sortBy(_.getAs[Long]("frame_offset"))
      sorted.head.getAs[Long]("frame_offset") shouldBe 0L
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          a.getAs[Long]("frame_offset") + a.getAs[Long]("frame_len") shouldBe
            b.getAs[Long]("frame_offset")
        case _ =>
      }
      val last = sorted.last
      last.getAs[Long]("frame_offset") + last.getAs[Long]("frame_len") shouldBe
        meta.getAs[Int]("n_bytes").toLong
    }
  }

  test("resize plan fits the box, preserves aspect direction, never upscales") {
    val d = docs((0L until 30L).map(i => i -> s"doc number $i with text ${"y" * i.toInt}"): _*)
    val rows = Media.resizePlan(d).collect()
    rows.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (ow, oh) = (r.getAs[Long]("out_width"), r.getAs[Long]("out_height"))
      ow should be <= 128L
      oh should be <= 96L
      ow should be <= w.toLong // never upscale
      oh should be <= h.toLong
      if (w <= 128 && h <= 96) { ow shouldBe w.toLong; oh shouldBe h.toLong }
      else {
        // one dimension is pinned to its bound (integer-floor aspect fit)
        (ow == 128L || oh == 96L) shouldBe true
      }
      r.getAs[Long]("out_pixels") shouldBe ow * oh
    }
  }

  test("stopword scrub removes all stoplist words and counts them") {
    val d = docs(1L -> "the cat sat on a mat", 2L -> "no stops here")
    val out = TextStats.stopwordScrub(d).collect()
      .map(r => r.getLong(0) -> (r.getAs[Int]("n_removed"), r.getString(2))).toMap
    out(1L) shouldBe (2, "cat sat on mat")
    out(2L) shouldBe (0, "no stops here")
  }

  test("vocabulary: occurrence-ranked tokens with doc frequency, lexicographic ties") {
    val d = docs(1L -> "b a a c", 2L -> "a b b")
    val v = TextStats.vocabulary(d, topK = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // a and b both occur 3x -> tie broken lexicographically
    v shouldBe Array(("a", 3L, 2L), ("b", 3L, 2L))
  }

  test("unigram log-prob: common-token docs score higher; probabilities from the corpus") {
    val d = docs(1L -> "a a a a", 2L -> "a a a z")
    val out = TextStats.unigramLogProb(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    out(1L)._1 shouldBe 4L
    // doc 1 is all 'a' (p = 7/8); doc 2 has one rare 'z' (p = 1/8) -> lower score
    out(1L)._2 should be > out(2L)._2
    out(1L)._2 shouldBe (4 * math.round(math.log10(7.0 / 8) * 1e8) / 1e8) +- 1e-9
  }

  test("numeric profile: one row per column with exact counts and bounds") {
    import spark.implicits._
    val d = Seq((1, Some(2.0)), (1, None), (3, Some(8.0))).toDF("a", "b")
    val out = Profiling.numericProfile(d, Seq("a", "b")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    out("a") shouldBe (3L, 0L, 2L, 1.0, 3.0)
    out("b") shouldBe (2L, 1L, 2L, 2.0, 8.0)
  }

  test("numeric profile of an EMPTY table reports zeros, not nulls") {
    import spark.implicits._
    val d = Seq.empty[(Int, Double)].toDF("a", "b")
    val out = Profiling.numericProfile(d, Seq("a", "b")).collect()
    out should have size 2
    out.foreach { r =>
      r.getLong(1) shouldBe 0L // n_values
      r.getLong(2) shouldBe 0L // n_nulls — NOT null
      r.getLong(3) shouldBe 0L // n_distinct
    }
  }

  test("numeric profile is ONE scan: a single aggregate, no per-column unions") {
    import spark.implicits._
    val d = Seq((1, 2.0)).toDF("a", "b")
    val plan = Profiling.numericProfile(d, Seq("a", "b")).queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.Union
    plan.collect { case u: Union => u } shouldBe empty
  }

  private def emb(rows: (Long, Seq[Float])*): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("cosine near-dup pairs: parallel vectors pair, orthogonal ones don't") {
    val e = emb(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(2f, 0f, 0f, 0f),   // parallel to 0 -> cosine 1
      2L -> Seq(0f, 1f, 0f, 0f),   // orthogonal
      3L -> Seq(1f, 0.1f, 0f, 0f)) // nearly parallel
    val pairs = Similarity.cosineNearDupPairs(e, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldBe Set((0L, 1L), (0L, 3L), (1L, 3L))
  }

  test("IVF with full probing (nprobe = K) reproduces exact brute-force top-k") {
    val rnd = new scala.util.Random(7)
    val e = emb((0L until 40L).map(i => i -> Seq.fill(8)(rnd.nextFloat() - 0.5f)): _*)
    val exact = Similarity.cosineTopK(e, numQueries = 5, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ivf = Similarity.annIvf(e, numCentroids = 4, nprobe = 4, numQueries = 5, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    ivf shouldBe exact
  }

  test("IVF drops a NULL-embedding centroid instead of NPE-ing; full probing still matches exact") {
    val rnd = new scala.util.Random(13)
    import spark.implicits._
    // vec_id 1 sits INSIDE the default-centroid id range with a NULL
    // embedding: the centroid collect must drop it (a null centroid loses
    // every cosine contest anyway), not NPE at plan-construction time
    val e = (0L until 40L)
      .map(i => (i, if (i == 1L) null else Seq.fill(8)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val exact = Similarity.cosineTopK(e, numQueries = 5, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ivf = Similarity.annIvf(e, numCentroids = 4, nprobe = 4, numQueries = 5, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    ivf shouldBe exact
  }

  test("IVF partial probing searches a subset: results are a (possibly partial) top-k") {
    val rnd = new scala.util.Random(11)
    val e = emb((0L until 60L).map(i => i -> Seq.fill(8)(rnd.nextFloat() - 0.5f)): _*)
    val ivf = Similarity.annIvf(e, numCentroids = 8, nprobe = 2, numQueries = 3, k = 3)
      .collect()
    // per query at most k rows, ranks contiguous from 1
    ivf.groupBy(_.getLong(0)).values.foreach { rows =>
      rows.length should be <= 3
      rows.map(_.getInt(2)).sorted shouldBe (1 to rows.length)
    }
  }

  test("IVF corpus assignment is a narrow BestMatch pass (probe/result windows only)") {
    val rnd = new scala.util.Random(13)
    // parquet round-trip: a LocalRelation corpus would let the optimizer
    // constant-fold the whole assignment at planning time (ConvertToLocal-
    // Relation evaluates the projection), hiding the operator under test
    val dir = java.nio.file.Files.createTempDirectory("ivf-plan").toString
    emb((0L until 40L).map(i => i -> Seq.fill(8)(rnd.nextFloat() - 0.5f)): _*)
      .write.parquet(s"$dir/emb.parquet")
    val e = spark.read.parquet(s"$dir/emb.parquet")
    val ivf = Similarity.annIvf(e, numCentroids = 20, nprobe = 2, numQueries = 3, k = 3)
    val lp = ivf.queryExecution.optimizedPlan
    // the N-scale assignment half scores with the loop-codegen argmax —
    // no crossJoin + partition-by-vec_id window over N × K rows
    lp.exists(_.expressions.exists(_.exists {
      case _: graft.functions.BestMatch => true
      case _ => false
    })) shouldBe true
    // exactly two Window operators survive: probe ranking (numQueries × K
    // input) and final top-k (bounded candidates) — the corpus-wide third
    // one is gone
    lp.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    } should have size 2
    // and the probe side's centroid table is the already-COLLECTED local
    // relation: the centroid sub-plan (scan + normalize + train) runs once,
    // in the collect — the query re-scans the corpus only for assignment
    // and probe selection (a recomputed centroid branch doubled x13's
    // bench time before this was pinned)
    lp.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    } should have size 2
    lp.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    } should have size 1
  }

  test("bitsFor scales ~log2(corpus) and never drops below the test default") {
    Similarity.bitsFor(100) shouldBe 6
    Similarity.bitsFor(64L << 20) shouldBe 20          // 64M vectors / 64 per bucket
    Similarity.bitsFor(64L << 20, targetOccupancy = 1024) shouldBe 16
  }

  test("kFor scales linearly with corpus size and never drops below KmeansK") {
    Semantic.kFor(100) shouldBe Semantic.KmeansK       // tiny corpus → floor
    Semantic.kFor(1L << 20) shouldBe 1024              // 1M vectors / 1k per cell
    Semantic.kFor(1L << 20, targetOccupancy = 64) shouldBe (1 << 14)
    Semantic.kFor(1000, targetOccupancy = 100) shouldBe 10
    Semantic.kFor(1001, targetOccupancy = 100) shouldBe 11 // ceil, not floor
  }

  test("x2/x3 plans carry no hand-placed broadcast hints (per-document tables must shuffle)") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val d = docs(1L -> "a b c d e", 2L -> "a b c d f")
    Seq(TextDedup.ngramJaccardPairs(d), TextDedup.minhashPairs(d),
      TextDedup.crossDocSpans(d, spanTokens = 2)).foreach { q =>
      // hints are eliminated during optimization, so inspect the analyzed plan
      q.queryExecution.analyzed.collect { case h: ResolvedHint => h } shouldBe empty
    }
  }

  test("narrow per-document operators compile to shuffle-free physical plans") {
    import org.apache.spark.sql.execution.exchange.Exchange
    import spark.implicits._
    val d = (0L until 20L).map(i => (i, s"some text number $i", s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    val narrowOps = Seq(
      "langId" -> TextStats.langId(d),
      "quality" -> TextStats.quality(d),
      "tokenStats" -> TextStats.tokenStats(d),
      "stopwordScrub" -> TextStats.stopwordScrub(d),
      "simhash" -> TextDedup.simhash(d),
      "quotaSample" -> Curation.quotaSample(d),
      "chunkDocuments" -> Curation.chunkDocuments(d),
      "assignSplits" -> Curation.assignSplits(d),
      "charClassEntropy" -> TextStats.charClassEntropy(d),
      "qualityGate" -> TextStats.qualityGate(d))
    narrowOps.foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan
      // a shuffling plan would be wrapped in a LEAF AdaptiveSparkPlanExec,
      // hiding its Exchange from collect — assert the wrapper's absence too,
      // or this pin passes vacuously on exactly the regression it's for
      withClue(s"$name should not shuffle: ") {
        plan.isInstanceOf[
          org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec] shouldBe false
        plan.collect { case e: Exchange => e } shouldBe empty
      }
    }
  }

  test("PMI top-k plans as a bounded TakeOrdered, never a global sort materialization") {
    import spark.implicits._
    val d = (0L until 20L).map(i => (i, "aa bb cc dd aa bb")).toDF("doc_id", "text")
    val q = TextStats.pmiCollocations(d)
    q.collect() // materialize so AQE's final plan is decided
    // the plan root is a leaf AdaptiveSparkPlanExec; its rendered final plan
    // must show the bounded top-k operator and no global Sort above it
    val rendered = q.queryExecution.executedPlan.toString
    rendered should include("TakeOrderedAndProject")
  }

  test("chunking matches a brute-force referee on random doc lengths (incl. boundary sizes)") {
    import spark.implicits._
    val (cs, st) = (4, 3)
    val rnd = new scala.util.Random(17)
    // boundary lengths pinned explicitly: 1 token, exactly one window, one
    // over a window, exact multi-window fit — plus random fill
    val lens = Seq(1, cs, cs + 1, cs + 2 * st) ++ Seq.fill(30)(1 + rnd.nextInt(15))
    val rows = lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, (0 until n).map(j => s"t$j").mkString(" "))
    } :+ (99L, "") // empty text splits to [""] in Spark AND DuckDB: one "" chunk
    val out = Curation.chunkDocuments(rows.toDF("doc_id", "text"), cs, st)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    val expected = rows.flatMap { case (id, text) =>
      val ws = text.split(" ", -1)
      val n = ws.length
      val nChunks = if (n <= cs) 1 else 1 + (n - cs + st - 1) / st
      (0 until nChunks).map { c =>
        val start = c * st
        val len = math.min(cs, n - start)
        (id, c.toLong) -> (start.toLong, len.toLong,
          ws.slice(start, start + len).mkString(" "))
      }
    }.toMap
    out shouldBe expected
    // every document's final chunk reaches its last token
    rows.foreach { case (id, text) =>
      val n = text.split(" ", -1).length
      val (start, len, _) = out.filter(_._1._1 == id).toSeq.maxBy(_._1._2)._2
      (start + len) shouldBe n.toLong
    }
  }

  test("split assignment matches an md5-referee, is id-keyed, and hits every split") {
    import spark.implicits._
    val d = (0L until 400L).map(i => (i, s"text $i", s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    val out = Curation.assignSplits(d).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getString(3))).toMap
    def refGate(id: Long): String = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      f"${dig(0) & 0xff}%02x"
    }
    (0L until 400L).foreach { id =>
      val gate = refGate(id)
      val split = Curation.SplitThresholds.collectFirst {
        case (name, th) if gate < th => name
      }.getOrElse(Curation.SplitFallback)
      out(id) shouldBe (gate, split)
    }
    out.values.map(_._2).toSet shouldBe Set("train", "val", "test")
    // identity-keyed: changing the TEXT must not move a document's split
    val moved = Curation.assignSplits(
      d.withColumn("text", org.apache.spark.sql.functions.lit("rewritten")))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    moved shouldBe out.map { case (k, v) => k -> v._2 }
  }

  test("PMI ranks an engineered collocation first and matches a brute-force referee") {
    import spark.implicits._
    // "aa bb" always adjacent (perfect collocation); "cc"/"dd" frequent but
    // independent; floor excludes pairs seen < 2 times
    val texts = (0 until 8).map(i => s"aa bb cc x$i dd cc dd")
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextStats.pmiCollocations(d, minCount = 2, k = 5).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // referee: count unigrams/bigrams per doc, PMI over corpus MLE
    val uni = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val big = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    texts.foreach { t =>
      val ws = t.split(" ")
      ws.foreach(w => uni(w) += 1)
      ws.sliding(2).foreach(p => big((p(0), p(1))) += 1)
    }
    val nU = uni.values.sum.toDouble
    val nB = big.values.sum.toDouble
    val expected = big.toSeq.filter(_._2 >= 2).map { case ((a, b), c) =>
      val pmi = BigDecimal(math.log((c / nB) / ((uni(a) / nU) * (uni(b) / nU))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (a, b, c, pmi)
    }.sortBy { case (a, b, _, p) => (-p, a, b) }.take(5)
    out.toSeq shouldBe expected
    out.head._1 -> out.head._2 shouldBe ("aa" -> "bb") // the engineered pair wins
  }

  test("cross-doc spans: df-based (intra-doc repeats don't count), matches a referee") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g")
    val shared = "s1 s2 s3 s4 s5" // a 5-token run planted in docs 0 and 1
    val texts = Seq(
      s"$shared ${Seq.fill(6)(vocab(rnd.nextInt(vocab.size))).mkString(" ")}",
      s"${Seq.fill(4)(vocab(rnd.nextInt(vocab.size))).mkString(" ")} $shared",
      // doc 2 repeats ITS OWN 5-gram twice — df stays 1, must not count
      "z1 z2 z3 z4 z5 z1 z2 z3 z4 z5",
      "q r s" // below one window: absent from the output
    ) ++ (3 until 20).map(_ =>
      Seq.fill(5 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextDedup.crossDocSpans(d, spanTokens = 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // referee: position-multiplicity grams, duplication by distinct-doc count
    val grams = texts.zipWithIndex.flatMap { case (t, i) =>
      t.split(" ").sliding(5).filter(_.length == 5)
        .map(w => (i.toLong, w.mkString(" "))).toSeq
    }
    val dfByGram = grams.distinct.groupBy(_._2).view.mapValues(_.size).toMap
    val expected = grams.groupBy(_._1).map { case (id, gs) =>
      val dup = gs.count(g => dfByGram(g._2) >= 2).toLong
      id -> (gs.size.toLong, dup,
        BigDecimal(dup.toDouble / gs.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    out shouldBe expected
    out(0L)._2 should be >= 1L // the planted run was flagged in doc 0
    out(2L)._2 shouldBe 0L // self-repetition alone never counts
    out.contains(3L) shouldBe false // 3-token doc has no 5-token window
  }

  test("length profile: exact quartiles with linear interpolation, per source") {
    import spark.implicits._
    // src0 has token counts 1,2,3,4 -> p25 = 1.75, p50 = 2.5, p75 = 3.25
    val d = Seq(
      (0L, "a", "src0"), (1L, "a b", "src0"),
      (2L, "a b c", "src0"), (3L, "a b c d", "src0"),
      (4L, "x y z", "src1")
    ).toDF("doc_id", "text", "source")
    val out = graft.corpus.Profiling.lengthProfile(d).collect()
      .map(r => r.getString(0) -> r).toMap
    val s0 = out("src0")
    (s0.getLong(1), s0.getLong(2), s0.getLong(3)) shouldBe ((4L, 1L, 4L))
    (s0.getDouble(4), s0.getDouble(5), s0.getDouble(6)) shouldBe ((1.75, 2.5, 3.25))
    s0.getLong(7) shouldBe 10L
    val s1 = out("src1")
    (s1.getLong(1), s1.getDouble(5), s1.getLong(7)) shouldBe ((1L, 3.0, 3L))
  }

  test("curation stages compose: gate -> quota -> split -> pack conserves and partitions") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{countDistinct, max}
    val rnd = new scala.util.Random(31)
    val vocab = Vector("the", "and", "data", "spark", "row", "batch", "x", "of")
    val d = (0L until 120L).map { i =>
      (i, Seq.fill(3 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" "),
        s"src${i % 3}")
    }.toDF("doc_id", "text", "source")
    // the pipeline a real curation run wires: quality gate, then quota
    // sampling, then split assignment, then per-source sequence packing of
    // the train split only
    val kept = TextStats.qualityGate(d).filter(col("keep") === 1).select("doc_id")
      .join(d, "doc_id")
    val sampled = Curation.quotaSample(kept, "text")
    val splits = Curation.assignSplits(sampled)
    val train = splits.filter(col("split") === "train").select("doc_id")
      .join(d, "doc_id")
    val packed = Curation.packSequences(train, budget = 64).cache()
    // every train doc packs exactly once, budget respected, offsets in range
    packed.count() shouldBe train.count()
    packed.filter(col("offset") < 0 || col("offset") >= 64).count() shouldBe 0L
    // within a source, seq_ids are dense from 0 (no empty sequences)
    val bySrc = packed.groupBy("source")
      .agg(max(col("seq_id")).as("mx"), countDistinct(col("seq_id")).as("d"))
      .collect()
    bySrc.foreach { r => r.getLong(2) shouldBe (r.getLong(1) + 1) }
    // each stage only ever narrows the doc set (they compose as filters)
    sampled.count() should be <= kept.count()
    train.count() should be <= sampled.count()
    packed.unpersist()
  }

  test("boilerplate report matches a brute-force referee on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val rows = (0L until 60L).map { i =>
      (i, Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "), s"src${i % 4}")
    }
    val (span, topK) = (3, 2)
    val got = TextDedup.boilerplateReport(
        rows.toDF("doc_id", "text", "source"), spanTokens = span, topK = topK)
      .collect()
      .map(r => (r.getString(0), r.getInt(3)) -> ((r.getString(1), r.getLong(2))))
      .toMap
    val expected = rows.groupBy(_._3).flatMap { case (src, ds) =>
      val df = ds.flatMap { case (_, text, _) =>
        text.split(" ", -1).sliding(span).filter(_.length == span)
          .map(_.mkString(" ")).toSeq.distinct
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      df.filter(_._2 >= 2).toSeq
        .sortBy { case (g, n) => (-n, g) }.take(topK).zipWithIndex
        .map { case ((g, n), i) => (src, i + 1) -> ((g, n)) }
    }.toMap
    got shouldBe expected
  }

  test("applyMixWeights matches a referee and preserves kept docs across re-runs") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val rows = (0L until 90L).map { i =>
      (i, (0 until (2 + rnd.nextInt(25))).map(j => s"t${rnd.nextInt(40)}")
        .mkString(" "), s"src${i % 3}")
    }
    val d = rows.toDF("doc_id", "text", "source")
    val budget = 300L // well under the corpus token count → real downsampling
    val kept = Curation.applyMixWeights(d, budget).collect()
      .map(_.getLong(0)).toSet
    // referee: same rate formula, gate from md5 prefix
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val tokens = rows.groupBy(_._3).view
      .mapValues(_.map(_._2.split(" ", -1).length.toLong).sum).toMap
    val s = tokens.view.mapValues(t => r6(math.sqrt(t.toDouble))).toMap
    val tot = s.values.map(BigDecimal(_)).sum.toDouble
    val expected = rows.filter { case (_, text, src) =>
      val rate = math.min(1.0, (s(src) / tot) * budget / tokens(src))
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) < math.floor(rate * 4294967296.0).toLong
    }.map(_._1).toSet
    kept shouldBe expected
    kept.size should (be > 0 and be < rows.size) // actually downsampled
    // determinism: a re-run keeps the identical set
    Curation.applyMixWeights(d, budget).collect()
      .map(_.getLong(0)).toSet shouldBe kept
  }

  test("mixWeights matches a referee: sqrt-temperature normalization on random sources") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    val rows = (0L until 80L).map { i =>
      (i, (0 until (1 + rnd.nextInt(30))).map(j => s"w$j").mkString(" "),
        s"src${i % 6}")
    }
    val got = Curation.mixWeights(rows.toDF("doc_id", "text", "source"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val tokens = rows.groupBy(_._3).view
      .mapValues(_.map(_._2.split(" ", -1).length.toLong).sum).toMap
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s = tokens.view.mapValues(t => r6(math.sqrt(t.toDouble))).toMap
    val tot = s.values.map(BigDecimal(_)).sum.toDouble
    tokens.keys.foreach { src =>
      got(src) shouldBe (s(src) / tot) +- 1e-7
    }
    got.values.sum shouldBe 1.0 +- 1e-6
  }

  test("dedup ladder composes end to end: near-dup families collapse to their canonicals") {
    val base1 = (1 to 30).map(i => s"tok$i").mkString(" ")
    val base2 = (31 to 60).map(i => s"tok$i").mkString(" ")
    val d = docs(
      1L -> base1,
      2L -> base1.replace("tok30", "zz"), // family A: {1, 2}
      3L -> base2,
      4L -> base2.replace("tok31", "yy"), // family B: {3, 4, 5}
      5L -> base2, // exact dup of 3
      9L -> "totally different text altogether now") // untouched
    val survivors = TextDedup.applyDedup(d,
      TextDedup.dedupClusters(TextDedup.minhashPairs(d)))
    survivors.collect().map(_.getLong(0)).toSet shouldBe Set(1L, 3L, 9L)
  }

  test("sequence assembly matches a referee: ordered text, straddlers keep their sequence") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val rows = (0L until 40L).map { i =>
      val n = 1 + rnd.nextInt(9)
      (i, (0 until n).map(j => s"d${i}t$j").mkString(" "), s"src${i % 2}")
    }
    val budget = 10
    val out = Curation.assembleSequences(rows.toDF("doc_id", "text", "source"), budget)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // referee: per-source doc_id-ordered exclusive cumsum -> seq of first token
    val expected = rows.groupBy(_._3).flatMap { case (src, ds) =>
      var cum = 0L
      ds.sortBy(_._1).map { case (_, text, _) =>
        val n = text.split(" ").length
        val seq = cum / budget
        cum += n
        (src, seq, n, text)
      }.groupBy { case (_, seq, _, _) => seq }.map { case (seq, members) =>
        (src, seq) -> (members.size.toLong, members.map(_._3).sum.toLong,
          members.map(_._4).mkString(" "))
      }
    }
    out shouldBe expected
    // a straddling document keeps its whole text in ONE sequence, so some
    // sequence must exceed the budget (the greedy-without-splitting contract)
    out.values.map(_._2).max should be > budget.toLong
  }

  test("incremental dedup flags new-vs-old only; best match is deterministic on ties") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val other = (31 to 60).map(i => s"b$i").mkString(" ")
    val d = docs(
      2L -> base, 4L -> base, // old twins: old-vs-old is never compared
      1L -> base.replace("tok30", "zzz"), // near-dups BOTH old twins
      // "tok15" is not a prefix of any other token ("tok1" would also hit
      // tok10..tok19 and sink J below the threshold)
      5L -> base.replace("tok15", "aaa"),
      3L -> other, // unlike any old doc
      7L -> other.replace("b60", "x"), // new twins near-dup each OTHER only:
      9L -> other.replace("b60", "x")) //   new-vs-new must stay unreported
    val out = TextDedup.incrementalDedup(
      d.filter(col("doc_id") % 2 === 1), d.filter(col("doc_id") % 2 === 0))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    out.keySet shouldBe Set(1L, 5L)
    out(1L)._1 shouldBe 2L // identical old twins tie on J -> min old id wins
    out(1L)._3 shouldBe 2L // ...but both count as matches
    // referee: the (independently referee-tested) exact pair op on the union,
    // filtered to cross-side pairs and aggregated the same way
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cross = TextDedup.ngramJaccardPairs(d, threshold = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .flatMap { case (a, b, j) => Seq((a, b, j), (b, a, j)) }
      .filter { case (x, y, _) => x % 2 == 1 && y % 2 == 0 }
    val expected = cross.groupBy(_._1).map { case (id, ms) =>
      val sorted = ms.map { case (_, o, j) => (o, r6(j)) }
        .sortBy { case (o, j) => (-j, o) }
      id -> (sorted.head._1, sorted.head._2, ms.size.toLong)
    }
    out shouldBe expected
  }

  test("mixWeights: sqrt-temperature weights normalize to 1, epochs fill the budget") {
    import spark.implicits._
    // source A: 9 tokens, source B: 1 token → s = 3 vs 1 → weights 0.75 / 0.25
    val d = Seq(
      (1L, (1 to 9).map(i => s"w$i").mkString(" "), "A"),
      (2L, "only", "B")).toDF("doc_id", "text", "source")
    val out = Curation.mixWeights(d, budgetTokens = 100L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    out("A") shouldBe ((1L, 9L, 0.75, 8.333333))
    out("B") shouldBe ((1L, 1L, 0.25, 25.0))
    out.values.map(_._3).sum shouldBe 1.0 +- 1e-9
  }

  test("charClassEntropy: degenerate text scores 0, a uniform class mix scores ~log2(5)") {
    val d = docs(1L -> "aaaa", 2L -> "aA1 ?")
    val out = TextStats.charClassEntropy(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    out(1L).getAs[Double]("entropy_bits") shouldBe 0.0
    out(1L).getAs[Int]("n_lower") shouldBe 4
    val mixed = out(2L)
    Seq("n_lower", "n_upper", "n_digit", "n_space", "n_other")
      .foreach(c => mixed.getAs[Int](c) shouldBe 1)
    // five equal classes: H = log2 5, built from 8-dp-rounded terms
    mixed.getAs[Double]("entropy_bits") shouldBe 2.3219281 +- 1e-7
  }

  test("hashGrams=true reproduces the string-keyed output exactly (x37 + x48)") {
    // the 100 TB shuffle-width switch must be a pure plan change: same rows,
    // same ranks, same fractions — including doc-frequency TIES, where the
    // hashed path's rank()-candidate recovery has to preserve the string
    // tiebreak (a row_number cutoff over hashes would get ties wrong)
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val vocab = Vector("a", "b", "c", "d", "e")
    val rows = (0L until 80L).map { i =>
      (i, Seq.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "), s"src${i % 3}")
    }
    val d = rows.toDF("doc_id", "text", "source")
    val spansStr = TextDedup.crossDocSpans(d, spanTokens = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val spansHash = TextDedup.crossDocSpans(d, spanTokens = 3, hashGrams = true)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    spansHash shouldBe spansStr
    spansStr should not be empty
    val bpStr = TextDedup.boilerplateReport(d, spanTokens = 3, topK = 4)
      .collect().map(r => (r.getString(0), r.getInt(3)) ->
        ((r.getString(1), r.getLong(2), r.getDouble(4)))).toMap
    val bpHash = TextDedup.boilerplateReport(d, spanTokens = 3, topK = 4,
        hashGrams = true)
      .collect().map(r => (r.getString(0), r.getInt(3)) ->
        ((r.getString(1), r.getLong(2), r.getDouble(4)))).toMap
    bpHash shouldBe bpStr
    bpStr should not be empty
    // the tie scenario explicitly: rank-4 cut with >4 grams at the same df
    val tieRows = (0L until 12L).map { i =>
      // every doc carries the same 6 three-token windows → 6-way tie at df=12
      (i, "t1 t2 t3 t4 t5 t6 t7 t8", "s0")
    }
    val td = tieRows.toDF("doc_id", "text", "source")
    val tieStr = TextDedup.boilerplateReport(td, spanTokens = 3, topK = 4)
      .collect().map(r => (r.getInt(3), r.getString(1), r.getLong(2))).toSet
    val tieHash = TextDedup.boilerplateReport(td, spanTokens = 3, topK = 4,
        hashGrams = true)
      .collect().map(r => (r.getInt(3), r.getString(1), r.getLong(2))).toSet
    tieHash shouldBe tieStr
    tieStr.size shouldBe 4
  }

  test("boilerplate report: shared spans rank by doc frequency, singletons drop") {
    import spark.implicits._
    val footer = "c1 c2 c3 c4 c5"
    val d = Seq(
      (1L, s"a b $footer", "s0"),
      (2L, s"x y $footer", "s0"),
      (3L, s"p q $footer", "s0"), // footer in 3/3 docs of s0
      (4L, "unique text one two three", "s1")) // nothing shared in s1
      .toDF("doc_id", "text", "source")
    val rows = TextDedup.boilerplateReport(d, spanTokens = 5, topK = 3).collect()
    rows.map(_.getString(0)).toSet shouldBe Set("s0")
    val top = rows.filter(r => r.getInt(3) == 1).head
    top.getString(1) shouldBe footer
    top.getLong(2) shouldBe 3L
    top.getDouble(4) shouldBe 1.0 // every s0 page carries it
  }

  test("approx variants track the exact operators within sketch tolerance") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val d = (0L until 300L).map { i =>
      (i, (0 until (1 + rnd.nextInt(40))).map(j => s"w${rnd.nextInt(50)}")
        .mkString(" "), s"lang${i % 3}", s"src${i % 5}")
    }.toDF("doc_id", "text", "lang", "source")
    // length profile: high-accuracy t-digest == exact percentile on ints
    val exactP = Profiling.lengthProfile(d).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    // percentile_approx keeps the input's integer type (exact percentile
    // interpolates to double)
    val approxP = Profiling.lengthProfileApprox(d).collect()
      .map(r => r.getString(0) -> r.getInt(4).toLong).toMap
    approxP.foreach { case (src, p50) =>
      math.abs(p50 - exactP(src)) should be <= 1.0
    }
    // dataset card: HLL at 2% rsd lands on the exact small cardinalities
    val exact = Profiling.datasetCard(d).collect().head
    val approx = Profiling.datasetCardApprox(d).collect().head
    approx.getAs[Long]("n_docs") shouldBe exact.getAs[Long]("n_docs")
    approx.getAs[Long]("n_sources") shouldBe exact.getAs[Long]("n_sources")
    approx.getAs[Long]("n_langs") shouldBe exact.getAs[Long]("n_langs")
    approx.getAs[Double]("mean_quality") shouldBe exact.getAs[Double]("mean_quality")
    // dup count via HLL: within rsd of the exact answer on 300 docs
    math.abs(approx.getAs[Long]("n_dup_docs") - exact.getAs[Long]("n_dup_docs"))
      .toDouble should be <= math.max(3.0, 0.05 * 300)
  }

  test("dataset card: one row of exact corpus scalars") {
    import spark.implicits._
    val d = Seq(
      (1L, "the cat sat", "en", "s0"),
      (2L, "the cat sat", "en", "s0"), // exact dup of 1
      (3L, "le chat", "fr", "s1")).toDF("doc_id", "text", "lang", "source")
    val r = Profiling.datasetCard(d).collect()
    r should have size 1
    val c = r.head
    c.getAs[Long]("n_docs") shouldBe 3L
    c.getAs[Long]("n_sources") shouldBe 2L
    c.getAs[Long]("n_langs") shouldBe 2L
    c.getAs[Long]("n_tokens") shouldBe 8L
    c.getAs[Long]("n_dup_docs") shouldBe 1L
    // quality: docs 1/2: 3 tokens, 2 en-stopword hits ("the" + "a"? no — "the")
    c.getAs[Double]("mean_quality") should (be > 0.0 and be <= 1.0)
    // single-scan shape: every card scalar (incl. mean_quality) aggregates
    // the same pass — the old counts ⨯ meanQ crossJoin read the corpus twice
    val dir = java.nio.file.Files.createTempDirectory("card1scan").toString
    d.write.mode("overwrite").parquet(dir)
    val plan = Profiling.datasetCard(spark.read.parquet(dir))
      .queryExecution.executedPlan.toString
    plan.split("Scan parquet").length - 1 shouldBe 1
  }

  test("column pruning reaches the parquet scan (a 100 TB table must not read unused columns)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("prune").toString
    // five columns on disk; each operator should scan only what it uses
    Seq((1L, "the cat sat on the mat", "en", "src0", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir)
    def readSchemas(df: org.apache.spark.sql.DataFrame): Seq[String] =
      "ReadSchema: struct<([^>]*)>".r
        .findAllMatchIn(df.queryExecution.executedPlan.toString)
        .map(_.group(1)).toSeq
    val t = spark.read.parquet(dir)
    readSchemas(TextStats.charClassEntropy(t)) shouldBe Seq("doc_id:bigint,text:string")
    // mixWeights scans twice (per-source aggregate + its one-row total) —
    // both scans pruned to the same two columns
    readSchemas(Curation.mixWeights(t)).toSet shouldBe Set("text:string,source:string")
    // boilerplate scans twice (grams + per-source totals) — both pruned
    readSchemas(TextDedup.boilerplateReport(t)).toSet shouldBe
      Set("text:string,source:string", "source:string")
    // snapshot diff: both snapshot scans pruned to (doc_id, source, text)
    readSchemas(Profiling.snapshotDiff(t, t)).toSet shouldBe
      Set("doc_id:bigint,text:string,source:string")
    // novelty: both sides pruned — the reference side's doc_id is dropped
    // before its distinct, so only the gram column survives its shuffle
    readSchemas(TextDedup.noveltyScore(t, t)).toSet shouldBe
      Set("doc_id:bigint,text:string", "text:string")
    // concentration scans twice (per-source + the one-row total)
    readSchemas(Profiling.concentrationReport(t)).toSet shouldBe
      Set("text:string,source:string")
  }

  test("bucketed dedup index: the probe join re-shuffles ONLY the increment side") {
    val oldDocs = docs(
      100L -> (1 to 30).map(i => s"tok$i").mkString(" "),
      101L -> (31 to 60).map(i => s"tok$i").mkString(" "))
    TextDedup.writeDedupIndex(TextDedup.dedupIndex(oldDocs), "dedup_idx_spec",
      buckets = 4)
    try {
      val idx = spark.table("dedup_idx_spec")
      val probe = TextDedup.dedupIndex(docs(
        1L -> (1 to 30).map(i => if (i == 30) "zz" else s"tok$i").mkString(" ")))
      // disable broadcast: a broadcast join would skip shuffles for size
      // reasons and prove nothing about the bucketing
      val conf = spark.conf
      val prev = conf.get("spark.sql.autoBroadcastJoinThreshold")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = probe.join(idx, Seq("band", "bucket"))
        joined.collect()
        val finalPlan = joined.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan
          case p => p
        }
        // AQE hides executed exchanges inside LEAF query-stage nodes, opaque
        // to TreeNode.collect — count them in the rendered final plan instead
        val rendered = finalPlan.toString
        "Exchange hashpartitioning".r.findAllIn(rendered).size shouldBe 1
        rendered should not include "BroadcastExchange"
        rendered should include("Bucketed: true")
      } finally {
        conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    } finally spark.sql("DROP TABLE IF EXISTS dedup_idx_spec")
  }

  test("snapshotDiff classifies added/removed/changed/unchanged and attributes moves to the new source") {
    import spark.implicits._
    val oldSnap = Seq(
      (1L, "alpha beta", "s0"),   // unchanged
      (2L, "gamma delta", "s0"),  // changed in new
      (3L, "kept text", "s0"),    // removed (absent from new)
      (5L, "mover text", "s1"))   // same text, source moves s1 -> s2
      .toDF("doc_id", "text", "source")
    val newSnap = Seq(
      (1L, "alpha beta", "s0"),
      (2L, "gamma delta EDITED", "s0"),
      (4L, "brand new doc", "s0"), // added
      (5L, "mover text", "s2"))
      .toDF("doc_id", "text", "source")
    val out = Profiling.snapshotDiff(oldSnap, newSnap).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // s0: added=1 (doc 4), removed=1 (doc 3), changed=1 (doc 2), unchanged=1
    // (doc 1); token_delta = new(2+3+3) - old(2+2+2) = +2
    out("s0") shouldBe ((1L, 1L, 1L, 1L, 2L))
    // the mover counts once, under its NEW source, as unchanged; its old-side
    // tokens land on s2's delta too (old row joined to the new placement)
    out("s2") shouldBe ((0L, 0L, 0L, 1L, 0L))
    out.contains("s1") shouldBe false
  }

  test("noveltyScore matches a brute-force referee; hashGrams is plan-only") {
    import spark.implicits._
    val rnd = new scala.util.Random(71)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g")
    val rows = (0L until 60L).map { i =>
      (i, Seq.fill(2 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    val d = rows.toDF("doc_id", "text")
    val newSide = d.filter(col("doc_id") % 2 === 1)
    val refSide = d.filter(col("doc_id") % 2 === 0)
    val got = TextDedup.noveltyScore(newSide, refSide).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    def sh(t: String): Seq[String] =
      t.split(" ", -1).sliding(3).filter(_.length == 3).map(_.mkString(" "))
        .toSeq.distinct
    val refVocab = rows.filter(_._1 % 2 == 0).flatMap(r => sh(r._2)).toSet
    val expected = rows.filter(_._1 % 2 == 1)
      .map { case (id, t) => id -> sh(t) }
      .filter(_._2.nonEmpty)
      .map { case (id, gs) =>
        val novel = gs.count(g => !refVocab.contains(g)).toLong
        id -> ((gs.size.toLong, novel,
          BigDecimal(novel.toDouble / gs.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }.toMap
    got shouldBe expected
    got.values.map(_._2).sum should be > 0L // some novelty on this corpus
    // the 64-bit gram-key path is a pure plan change
    val hashed = TextDedup.noveltyScore(newSide, refSide, hashGrams = true)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    hashed shouldBe got
  }

  test("unigramDrift: closed forms (identical=0, disjoint=1 bit, one-sided=0.5) and a referee") {
    import spark.implicits._
    def df(rows: (Long, String, String)*) = rows.toDF("doc_id", "text", "source")
    // s0 identical across snapshots; s1 fully disjoint vocab; s2 new-only
    val oldSnap = df((1L, "a b c", "s0"), (2L, "x x y", "s1"))
    val newSnap = df((1L, "a b c", "s0"), (2L, "p q r", "s1"), (3L, "m n", "s2"))
    val out = Profiling.unigramDrift(oldSnap, newSnap).collect()
      .map(r => r.getString(0) -> r.getDouble(5)).toMap
    out("s0") shouldBe 0.0
    out("s1") shouldBe 1.0
    out("s2") shouldBe 0.5
    // referee: random two-source corpora vs a direct JSD computation
    val rnd = new scala.util.Random(83)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    def corpus(n: Int) = (0L until n).map { i =>
      (i, Seq.fill(2 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "), s"s${i % 2}")
    }
    val co = corpus(40)
    val cn = corpus(40)
    val got = Profiling.unigramDrift(
        co.toDF("doc_id", "text", "source"), cn.toDF("doc_id", "text", "source"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    def dist(c: Seq[(Long, String, String)], src: String): Map[String, Long] =
      c.filter(_._3 == src).flatMap(_._2.split(" ", -1))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    Seq("s0", "s1").foreach { src =>
      val (po, pn) = (dist(co, src), dist(cn, src))
      val (ot, nt) = (po.values.sum, pn.values.sum)
      val terms = (po.keySet ++ pn.keySet).toSeq.map { w =>
        val q = po.getOrElse(w, 0L).toDouble / ot
        val p = pn.getOrElse(w, 0L).toDouble / nt
        def s(a: Double, b: Double) = if (a > 0)
          BigDecimal(0.5 * (a * (math.log((2.0 * a) / (a + b)) / math.log(2.0))))
            .setScale(12, BigDecimal.RoundingMode.HALF_UP) else BigDecimal(0)
        s(p, q) + s(q, p)
      }
      val expected = terms.sum.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gotOt, gotNt, vo, vn, jsd) = got(src)
      gotOt shouldBe ot
      gotNt shouldBe nt
      vo shouldBe po.size.toLong
      vn shouldBe pn.size.toLong
      jsd shouldBe expected +- 1e-9
      jsd should be > 0.0
      jsd should be < 1.0
    }
  }

  test("embeddingDrift: identical snapshots are zero-shift, known moves hit closed forms") {
    import spark.implicits._
    def e(rows: (Long, Seq[Float], Int)*) =
      rows.toDF("vec_id", "embedding", "label")
    val same = e((1L, Seq(1f, 2f), 0), (2L, Seq(3f, 4f), 0), (3L, Seq(0f, 1f), 1))
    val zero = Profiling.embeddingDrift(same, same).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(5), r.getDouble(6))))
      .toMap
    zero(0) shouldBe ((2L, 2L, 0.0, 1.0))
    zero(1) shouldBe ((1L, 1L, 0.0, 1.0))
    // label 0 mean rotates (1,0) -> (0,1): shift sqrt(2), cos 0; label 2 is
    // new-only -> absent (no drift defined)
    val oldSnap = e((1L, Seq(1f, 0f), 0))
    val newSnap = e((2L, Seq(0f, 1f), 0), (3L, Seq(5f, 5f), 2))
    val moved = Profiling.embeddingDrift(oldSnap, newSnap).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(5), r.getDouble(6)))).toMap
    moved(0)._1 shouldBe BigDecimal(math.sqrt(2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    moved(0)._2 shouldBe 0.0
    moved.contains(2) shouldBe false
    // an embedding-model upgrade (384 -> 768 style dim change) must fail the
    // gate LOUDLY: dims surfaced, metrics null — never a silent truncation
    // to the shared prefix of dimensions
    val upgraded = Profiling.embeddingDrift(
        e((1L, Seq(1f, 0f), 0)), e((2L, Seq(1f, 0f, 0f), 0)))
      .collect().head
    upgraded.getLong(3) shouldBe 2L
    upgraded.getLong(4) shouldBe 3L
    upgraded.isNullAt(5) shouldBe true
    upgraded.isNullAt(6) shouldBe true
    // a label whose new-side rows are all EMPTY arrays must still surface
    // (dim 0 vs 2, null metrics) — a silently-dropped label would read as
    // "not present" and pass the gate
    val broken = Profiling.embeddingDrift(
        e((1L, Seq(1f, 0f), 0)), e((2L, Seq.empty[Float], 0)))
      .collect().head
    broken.getLong(1) shouldBe 1L
    broken.getLong(2) shouldBe 1L
    broken.getLong(3) shouldBe 2L
    broken.getLong(4) shouldBe 0L
    broken.isNullAt(5) shouldBe true
    broken.isNullAt(6) shouldBe true
  }

  test("concentrationReport: balanced corpus hits the closed forms, single source degenerates") {
    import spark.implicits._
    // two sources, exactly equal token mass -> share 0.5 each:
    // hhi = 0.5, entropy = 1 bit, top_share = 0.5
    val balanced = Seq(
      (1L, "a b c d", "s0"), (2L, "e f g h", "s1"))
      .toDF("doc_id", "text", "source")
    val b = Profiling.concentrationReport(balanced).collect().head
    b.getLong(0) shouldBe 2L
    b.getDouble(1) shouldBe 0.5
    b.getDouble(2) shouldBe 0.5
    b.getDouble(3) shouldBe 1.0
    // one source wearing the whole corpus: hhi 1, entropy 0
    val mono = Seq((1L, "a b", "s0"), (2L, "c d e", "s0"))
      .toDF("doc_id", "text", "source")
    val m = Profiling.concentrationReport(mono).collect().head
    m.getLong(0) shouldBe 1L
    m.getDouble(1) shouldBe 1.0
    m.getDouble(2) shouldBe 1.0
    m.getDouble(3) shouldBe 0.0
  }

  test("bucketed vocabulary: the novelty probe re-shuffles ONLY the increment side") {
    import spark.implicits._
    val ref = Seq((100L, (1 to 30).map(i => s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
    TextDedup.writeVocabulary(TextDedup.vocabulary(ref), "novelty_vocab_spec",
      buckets = 4)
    val conf = spark.conf
    val prev = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = Seq(
          (1L, (1 to 10).map(i => s"tok$i").mkString(" ")),
          (2L, "all novel text here"))
        .toDF("doc_id", "text")
      val scored = TextDedup.noveltyScoreAgainst(
        probe, spark.table("novelty_vocab_spec"))
      val out = scored.collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      out(1L) shouldBe 0.0 // every gram known to the reference
      out(2L) shouldBe 1.0 // fully novel
      val finalPlan = scored.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val rendered = finalPlan.toString
      // two exchanges, BOTH increment-side (postings into the gram key, then
      // the per-doc aggregate); a vocab-side exchange would make it three
      "Exchange hashpartitioning".r.findAllIn(rendered).size shouldBe 2
      rendered should not include "BroadcastExchange"
      rendered should include("Bucketed: true")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS novelty_vocab_spec")
    }
  }

  test("bloom-gated decontamination is exact: false positives die in the verify join") {
    import spark.implicits._
    val rnd = new scala.util.Random(73)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val d = (0L until 120L).map { i =>
      (i, Seq.fill(4 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    def collect(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val exact = collect(TextDedup.decontaminationReport(d, benchMod = 10))
    exact should not be empty
    // normal fpp: identical result, and the gate is IN the plan
    val gated = TextDedup.decontaminationReportBloom(d, benchMod = 10)
    collect(gated) shouldBe exact
    gated.queryExecution.executedPlan.toString should include("might_contain")
    // pathological fpp (0.9): the bloom passes nearly everything — the
    // exact join must still reduce it to the identical answer
    collect(TextDedup.decontaminationReportBloom(d, benchMod = 10, fpp = 0.9)) shouldBe exact
    // BloomGate primitives: no false negatives at any fpp
    val items = (0 until 50).map(i => s"item$i").toDF("s")
    val bloom = graft.functions.BloomGate.build(items, "s", 50, 0.05)
    val flags = items
      .filter(graft.functions.BloomGate.mightContain(bloom, col("s")))
      .count()
    flags shouldBe 50L
    // an EMPTY blocklist gates nothing: the aggregate evals to SQL NULL on
    // zero items, and a null filter blob would make mightContain NULL for
    // every row — filter(!mightContain) then drops the whole stream. build
    // must hand back a real zero-item filter instead
    val emptyBloom = graft.functions.BloomGate.build(
      items.filter(col("s") === "no-such-item"), "s", 50, 0.05)
    emptyBloom should not be null
    items.filter(graft.functions.BloomGate.mightContain(emptyBloom, col("s")))
      .count() shouldBe 0L
    items.filter(!graft.functions.BloomGate.mightContain(emptyBloom, col("s")))
      .count() shouldBe 50L
  }

  test("BloomGate.build runs cap-isolated: the caller's session conf is never touched") {
    import spark.implicits._
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val (prevItems, prevBits) = (spark.conf.get(itemsKey), spark.conf.get(bitsKey))
    try {
      // simulate the default-caps-too-small regime without a 4M-item build:
      // drop the caller's caps below this filter's needs — build() must
      // succeed anyway (it analyzes in an isolated child session), because
      // the analysis check under THIS session would throw
      spark.conf.set(itemsKey, "10")
      spark.conf.set(bitsKey, "64")
      val items = (0 until 500).map(i => s"item$i").toDF("s")
      val bloom = graft.functions.BloomGate.build(items, "s", 500, 0.01)
      bloom.length should be > 8 // a real filter, not a degenerate blob
      // the caller's confs are EXACTLY as set — not restored-after-a-raise,
      // never raised: these same caps size Spark's InjectRuntimeFilter, and
      // a shared-conf raise would leak into any query analyzing inside the
      // build window (concurrent queries, not just later ones)
      spark.conf.get(itemsKey) shouldBe "10"
      spark.conf.get(bitsKey) shouldBe "64"
      // and the filter built under the isolated caps has no false negatives
      items.filter(graft.functions.BloomGate.mightContain(bloom, col("s")))
        .count() shouldBe 500L
    } finally {
      spark.conf.set(itemsKey, prevItems)
      spark.conf.set(bitsKey, prevBits)
    }
  }

  test("BloomGate.build analyzes under the caller's session semantics") {
    import spark.implicits._
    // newSession() starts from the BASE conf — without the explicit carry, a
    // semantic conf the caller set at runtime (here: case sensitivity) would
    // silently not apply inside the isolated build. Pin that build() behaves
    // exactly as the caller's session would: wrong-case column rejected,
    // right-case accepted.
    val prev = spark.conf.get("spark.sql.caseSensitive")
    try {
      spark.conf.set("spark.sql.caseSensitive", "true")
      val items = (0 until 10).map(i => s"i$i").toDF("S")
      an[org.apache.spark.sql.AnalysisException] should be thrownBy
        graft.functions.BloomGate.build(items, "s", 10, 0.01)
      graft.functions.BloomGate.build(items, "S", 10, 0.01).length should be > 8
    } finally spark.conf.set("spark.sql.caseSensitive", prev)
  }

  test("lineScrub removes cross-document lines, keeps order, and matches a referee") {
    import spark.implicits._
    val rows = Seq(
      (1L, "HEADER\nalpha beta\ngamma\nFOOTER"),
      (2L, "HEADER\ndelta epsilon\nFOOTER"),
      (3L, "unique one\nunique two"),
      (4L, "HEADER\nFOOTER"), // pure boilerplate -> empty text, row kept
      (5L, "self\nself\nother")) // self-repetition: df=1, must survive
    val d = rows.toDF("doc_id", "text")
    val got = TextDedup.lineScrub(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    got(1L) shouldBe ((4L, 2L, "alpha beta\ngamma"))
    got(2L) shouldBe ((3L, 2L, "delta epsilon"))
    got(3L) shouldBe ((2L, 0L, "unique one\nunique two"))
    got(4L) shouldBe ((2L, 2L, ""))
    got(5L) shouldBe ((3L, 0L, "self\nself\nother"))
    // brute-force referee on a random multi-line corpus + hashKeys parity
    val rnd = new scala.util.Random(67)
    val vocab = Vector("a", "b", "c", "d")
    val rand = (0L until 50L).map { i =>
      val nLines = 1 + rnd.nextInt(6)
      (i, Seq.fill(nLines)(
        Seq.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")).mkString("\n"))
    }
    val rd = rand.toDF("doc_id", "text")
    val out = TextDedup.lineScrub(rd).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    val dfByLine = rand.flatMap { case (id, t) => t.split("\n", -1).distinct.map((id, _)) }
      .groupBy(_._2).view.mapValues(_.size).toMap
    val expected = rand.map { case (id, t) =>
      val ls = t.split("\n", -1)
      val surviving = ls.filter(l => dfByLine(l) < 2)
      id -> ((ls.length.toLong, ls.count(l => dfByLine(l) >= 2).toLong,
        surviving.mkString("\n")))
    }.toMap
    out shouldBe expected
    out.values.map(_._2).sum should be > 0L // removal actually happened
    val hashed = TextDedup.lineScrub(rd, hashKeys = true).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    hashed shouldBe out
  }

  test("lineScrub never scrubs blank paragraph separators") {
    import spark.implicits._
    // blank and whitespace-only lines reach minDf in any corpus that uses
    // blank-line paragraph breaks; scrubbing them would collapse paragraph
    // structure corpus-wide and inflate n_removed with formatting artifacts
    val d = Seq(
      (1L, "alpha\n\nbeta"),
      (2L, "gamma\n\ndelta"),
      (3L, "x\n \ny"),
      (4L, "z\n \nw"),
      (5L, "SPAM\n\nfoo"),
      (6L, "SPAM\n\nbar")).toDF("doc_id", "text")
    val got = TextDedup.lineScrub(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    got(1L) shouldBe ((0L, "alpha\n\nbeta"))
    got(2L) shouldBe ((0L, "gamma\n\ndelta"))
    got(3L) shouldBe ((0L, "x\n \ny"))
    got(4L) shouldBe ((0L, "z\n \nw"))
    // real boilerplate still goes; the separator stays
    got(5L) shouldBe ((1L, "\nfoo"))
    got(6L) shouldBe ((1L, "\nbar"))
    // hashKeys path agrees (the exemption reads the line, not the key)
    TextDedup.lineScrub(d, hashKeys = true).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3))))
      .toMap shouldBe got
  }

  test("charClassEntropy: empty text yields zero counts and zero entropy, never NaN") {
    val d = docs(1L -> "")
    val r = TextStats.charClassEntropy(d).collect().head
    Seq("n_lower", "n_upper", "n_digit", "n_space", "n_other")
      .foreach(c => r.getAs[Int](c) shouldBe 0)
    r.getAs[Double]("entropy_bits") shouldBe 0.0
  }

  test("decontamination broadcasts the benchmark side (bounded by the eval suite, not the corpus)") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val d = docs(0L -> "a b c d", 1L -> "a b c x")
    val hints = TextDedup.decontaminationReport(d).queryExecution.analyzed
      .collect { case h: ResolvedHint => h }
    hints should have size 1 // exactly one: the benchmark shingle set
  }

  test("drift/report plans broadcast only their bounded sides") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    import spark.implicits._
    val d = Seq((1L, "a b c", "s0"), (2L, "d e f", "s1"))
      .toDF("doc_id", "text", "source")
    // x56: exactly one hint — the source-cardinality totals table; the
    // vocab-sized (source, token) join must stay a shuffle join
    Profiling.unigramDrift(d, d).queryExecution.analyzed
      .collect { case h: ResolvedHint => h } should have size 1
    // x55: one hint — the one-row grand total
    Profiling.concentrationReport(d).queryExecution.analyzed
      .collect { case h: ResolvedHint => h } should have size 1
    // x57: NO hints — every joined table is label(-×dim)-bounded post
    // aggregation, so AQE's runtime sizing picks the broadcast; a forced
    // hint would add nothing and assume sizes before they exist
    val e = Seq((1L, Seq(1f, 2f), 0)).toDF("vec_id", "embedding", "label")
    Profiling.embeddingDrift(e, e).queryExecution.analyzed
      .collect { case h: ResolvedHint => h } shouldBe empty
    // x53: NO hints — both sides of the full-outer join are corpus-sized
    Profiling.snapshotDiff(d, d).queryExecution.analyzed
      .collect { case h: ResolvedHint => h } shouldBe empty
    // x54: no hints — the reference vocabulary is corpus-vocab-sized (AQE
    // may still choose a broadcast at runtime when it fits; the plan must
    // not FORCE one against a 100 TB reference)
    TextDedup.noveltyScore(d, d).queryExecution.analyzed
      .collect { case h: ResolvedHint => h } shouldBe empty
  }

  test("assignShards snake-deals per-source token ranks; NULL text ranks last") {
    import spark.implicits._
    // source s: token counts 7,6,5,4,4,2,1 (doc4/doc5 tie → doc_id order),
    // plus a NULL-text doc ranked last; source t independent
    def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    val d = Seq(
      (1L, words(7), "s"), (2L, words(6), "s"), (3L, words(5), "s"),
      (4L, words(4), "s"), (5L, words(4), "s"), (6L, words(2), "s"),
      (7L, words(1), "s"), (8L, null: String, "s"),
      (10L, words(9), "t"), (11L, words(1), "t"))
      .toDF("doc_id", "text", "source")
    val out = Curation.assignShards(d, shards = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (Option(r.get(r.fieldIndex("n_tokens"))), r.getAs[Long]("shard"))).toMap
    // ranks 0..7 fold 0,1,2,2,1,0,0,1 across 3 shards
    out(1L) shouldBe ((Some(7L), 0L))
    out(2L) shouldBe ((Some(6L), 1L))
    out(3L) shouldBe ((Some(5L), 2L))
    out(4L) shouldBe ((Some(4L), 2L))
    out(5L) shouldBe ((Some(4L), 1L))
    out(6L) shouldBe ((Some(2L), 0L))
    out(7L) shouldBe ((Some(1L), 0L))
    out(8L) shouldBe ((None, 1L)) // assigned, never dropped
    out(10L) shouldBe ((Some(9L), 0L))
    out(11L) shouldBe ((Some(1L), 1L))
    // the balance the snake buys: source s token sums land 10/10/9
    // (docs {1,6,7} / {2,5,8-null} / {3,4})
    val sums = Curation.assignShards(d.filter(col("source") === "s"), shards = 3)
      .groupBy(col("shard"))
      .agg(org.apache.spark.sql.functions.sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getAs[Long]("shard") -> r.getAs[Long]("t")).toMap
    sums shouldBe Map(0L -> 10L, 1L -> 10L, 2L -> 9L)
  }

  test("editVerify: order-sensitive verdicts with the integer is_dup boundary") {
    import spark.implicits._
    // lev*5 <= max_len at the exact boundary: max_len 10, lev 2 → dup;
    // lev 3 → not. Pair (5,6): same vocabulary, shuffled order — a
    // bag-of-tokens signal (simhash) cannot tell them apart, edit distance can.
    val d = Seq(
      (1L, "aaaaaaaaaa"), (2L, "aaaaaaaabb"), (3L, "aaaaaaabbb"),
      (5L, "alpha beta gamma delta"), (6L, "delta gamma beta alpha"))
      .toDF("doc_id", "text")
    val cand = Seq((1L, 2L, 1), (1L, 3L, 1), (5L, 6L, 0))
      .toDF("doc_id_1", "doc_id_2", "hamming")
    val out = TextDedup.editVerify(cand, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("max_len"), r.getAs[Long]("lev"),
          r.getAs[Boolean]("is_dup"))).toMap
    out((1L, 2L)) shouldBe ((10L, 2L, true))   // 2*5 = 10 <= 10
    out((1L, 3L)) shouldBe ((10L, 3L, false))  // 3*5 = 15 > 10
    out((5L, 6L))._3 shouldBe false            // reordering is not duplication
    // end-to-end: identical docs pass through simhash candidates with lev 0
    val dd = docs(7L -> "x y z w v", 8L -> "x y z w v")
    val e2e = TextDedup.editVerifyPairs(dd).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("lev"),
        r.getAs[Boolean]("is_dup")))
    e2e should contain((7L, 8L, 0L, true))
    // a candidate id absent from the corpus fails loudly (a stale persisted
    // pair silently dropping would be a silent dedup miss)
    val stale = Seq((1L, 9999L, 0)).toDF("doc_id_1", "doc_id_2", "hamming")
    val ex = intercept[Exception] {
      TextDedup.editVerify(stale, d).collect()
    }
    Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ") should
      include("editVerify")
  }

  test("containment flags a quoted document that Jaccard misses") {
    // doc 2 is doc 1 quoted whole inside a much longer wrapper: J is tiny
    // (|A|/|B|), C(A→B) is exactly 1 — the relationship x82 exists for
    val quote = (1 to 10).map(i => s"q$i").mkString(" ")
    val wrapper = (1 to 60).map(i => s"w$i").mkString(" ") + " " + quote +
      " " + (61 to 120).map(i => s"w$i").mkString(" ")
    val d = docs(1L -> quote, 2L -> wrapper, 3L -> "x y z unrelated text")
    val pairs = TextDedup.containmentPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Double]("containment_1"), r.getAs[Double]("containment_2")))
    pairs.map(p => (p._1, p._2)) shouldBe Array((1L, 2L))
    pairs.head._3 shouldBe 1.0 // every shingle of the quote is in the wrapper
    pairs.head._4 should be < 0.1 // the wrapper is NOT contained in the quote
    // and Jaccard at its default threshold rightly does not pair them
    TextDedup.ngramJaccardPairs(d).collect() shouldBe empty
  }

  test("containmentVerify equals containmentPairs on the candidate subset; misses stay misses") {
    import spark.implicits._
    // a corpus with containment structure: doc 2 wraps doc 1, doc 4 wraps
    // doc 3, docs 5/6 overlap partially, doc 7 is unrelated
    val q1 = (1 to 8).map(i => s"a$i").mkString(" ")
    val q3 = (1 to 8).map(i => s"b$i").mkString(" ")
    val d = docs(
      1L -> q1, 2L -> ((1 to 30).map(i => s"w$i").mkString(" ") + " " + q1),
      3L -> q3, 4L -> (q3 + " " + (1 to 30).map(i => s"v$i").mkString(" ")),
      5L -> "c1 c2 c3 c4 c5 c6", 6L -> "c1 c2 c3 c4 d5 d6",
      7L -> "x y z p q r")
    val exhaustive = TextDedup.containmentPairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Double]("containment_1"), r.getAs[Double]("containment_2"))))
      .toMap
    // candidates: the true pairs PLUS pairs the exhaustive pass rejects —
    // the verifier must reproduce the exhaustive verdict on each (identical
    // ratios on hits via the shared intersection core, no row on misses)
    val cand = Seq((1L, 2L), (3L, 4L), (5L, 6L), (1L, 3L), (5L, 7L))
      .toDF("doc_id_1", "doc_id_2")
    val verified = TextDedup.containmentVerify(cand, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Double]("containment_1"), r.getAs[Double]("containment_2"))))
      .toMap
    verified.keySet shouldBe exhaustive.keySet.intersect(
      Set((1L, 2L), (3L, 4L), (5L, 6L), (1L, 3L), (5L, 7L)))
    verified.foreach { case (k, v) => exhaustive(k) shouldBe v }
    // the wrap pairs made it with an exact 1.0 on the contained side
    verified((1L, 2L))._1 shouldBe 1.0
    verified((3L, 4L))._1 shouldBe 1.0
    // a candidate pair the sketch proposed but containment rejects is ABSENT
    verified.keySet should not contain ((1L, 3L))
    verified.keySet should not contain ((5L, 7L))
    // sketch tiers propose the same pair once per colliding band: duplicate
    // candidate rows must NOT multiply the intersection count (which would
    // report containment > 1 and admit false dups) — duplicated input
    // verifies identically to distinct input
    val dupCand = cand.unionAll(cand).unionAll(cand)
    val verifiedDup = TextDedup.containmentVerify(dupCand, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Double]("containment_1"), r.getAs[Double]("containment_2"))))
      .toMap
    verifiedDup shouldBe verified
  }

  test("spanScrub: keep-one-copy removal, canonical doc intact, full-copy" +
      " scrubs to empty, short/whitespace/NULL conventions") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e"),     // canonical home of every shared gram
      (2L, "x y a b c d z"), // quotes doc 1's span mid-document
      (3L, "a b c d e"),     // verbatim copy: pure duplicated span
      (4L, "p q"),           // shorter than one span: passthrough
      (5L, "m  n"),          // empty token from a space run: lossless rebuild
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextDedup.spanScrub(d, spanTokens = 3).collect()
      .map(r => r.getLong(0) -> ((r.getAs[String]("scrubbed"),
        r.getAs[Any]("n_tokens"), r.getAs[Any]("n_removed")))).toMap
    out(1L) shouldBe (("a b c d e", 5L, 0L)) // canonical keeps every copy's home
    // doc 2: grams "a b c"@3 and "b c d"@4 are duplicated with min_doc 1 —
    // coverage {3,4,5,6}, survivors x y z
    out(2L) shouldBe (("x y z", 7L, 4L))
    out(3L) shouldBe (("", 5L, 5L)) // fully covered: scrubs to empty
    out(4L) shouldBe (("p q", 2L, 0L))
    out(5L) shouldBe (("m  n", 3L, 0L)) // split/join round-trips the run
    out(6L) shouldBe ((null, null, null)) // NULL text: NULL outputs
    out should have size 6
    // the 100 TB shuffle-width switch: hashed gram keys, identical verdicts
    val hashed = TextDedup.spanScrub(d, spanTokens = 3, hashGrams = true)
      .collect()
      .map(r => r.getLong(0) -> ((r.getAs[String]("scrubbed"),
        r.getAs[Any]("n_tokens"), r.getAs[Any]("n_removed")))).toMap
    hashed shouldBe out
    // position-coverage semantics pinned: overlapping removals from
    // DIFFERENT gram families can clip a canonical occurrence — "a b"
    // (canonical doc 101) is removed in 102 covering its "b", so 102's
    // canonical "b c" loses a token and "b c" survives nowhere whole.
    // This is the documented ExactSubstr behavior, not a bug; uniqueness
    // ("x") always survives.
    val overlap = Seq((101L, "a b"), (102L, "a b c"), (103L, "x b c"))
      .toDF("doc_id", "text")
    val ov = TextDedup.spanScrub(overlap, spanTokens = 2).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("scrubbed")).toMap
    ov shouldBe Map(101L -> "a b", 102L -> "c", 103L -> "x")
  }

  test("spanScrubAgainst: decomposition equals the self-contained scrub on" +
      " the increment; increment-internal dups wait for the next snapshot;" +
      " hashGrams identical") {
    import spark.implicits._
    val old = Seq((2L, "a b c d e"), (4L, "f g h i j")).toDF("doc_id", "text")
    val incr = Seq(
      (11L, "x y a b c z"),  // quotes an old span
      (13L, "f g h q r"),    // quotes the other old span
      (15L, "u v w"),        // short: passthrough
      (17L, null.asInstanceOf[String]),
      (19L, "k l m n o"),    // duplicated only WITHIN the increment
      (21L, "k l m n p"))
      .toDF("doc_id", "text")
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> ((r.getAs[String]("scrubbed"),
        r.getAs[Any]("n_tokens"), r.getAs[Any]("n_removed")))).toMap
    val vocab = TextDedup.spanVocabulary(old, spanTokens = 3)
    val against = keyed(TextDedup.spanScrubAgainst(incr, vocab, spanTokens = 3))
    val full = keyed(TextDedup.spanScrub(old.unionAll(incr), spanTokens = 3))
    // reference doc_ids precede the increment's, so for every span shared
    // with the REFERENCE the keep-one-copy verdict is identical
    for (id <- Seq(11L, 13L, 15L, 17L)) against(id) shouldBe full(id)
    against(11L)._1 shouldBe "x y z"
    against(13L)._1 shouldBe "q r"
    // "k l m n" is duplicated only inside the increment: the frozen
    // vocabulary doesn't know it (untouched here — it is the NEXT
    // snapshot's keep-one-copy problem), while the self-contained scrub
    // already removes the non-canonical copy
    against(19L) shouldBe (("k l m n o", 5L, 0L))
    against(21L) shouldBe (("k l m n p", 5L, 0L))
    full(21L)._1 shouldBe "p"
    // the 100 TB shuffle-width switch cannot change a verdict
    val hashed = keyed(TextDedup.spanScrubAgainst(incr,
      TextDedup.spanVocabulary(old, spanTokens = 3, hashGrams = true),
      spanTokens = 3, hashGrams = true))
    hashed shouldBe against
    // a probe-mode/vocabulary mismatch is loud at construction — under ANSI
    // it would otherwise surface as a cast error deep in the query, and
    // with ANSI off as a silent zero-match no-op scrub
    intercept[IllegalArgumentException] {
      TextDedup.spanScrubAgainst(incr,
        TextDedup.spanVocabulary(old, spanTokens = 3, hashGrams = true),
        spanTokens = 3) // string probes against a hashed vocabulary
    }.getMessage should include("probe mode")
  }

  test("x79/x80 plan shapes: one window exchange; no corpus-side broadcast") {
    import spark.implicits._
    val d = (1L to 50L).map(i => (i, s"w$i a b c", s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    // x79: the per-source rank window's hash exchange is the ONLY exchange
    val shardPlan = Curation.assignShards(d)
      .queryExecution.executedPlan.toString
    "Exchange hashpartitioning".r.findAllIn(shardPlan).length shouldBe 1
    shardPlan should not include "BroadcastExchange"
    // x80: both text fetches are shuffled-hash with the CANDIDATE side as
    // build (never a broadcast of the corpus-text scan — compressed parquet
    // stats understate a text corpus far past any sane broadcast size)
    val cand = Seq((1L, 2L, 0)).toDF("doc_id_1", "doc_id_2", "hamming")
    val verifyPlan = TextDedup.editVerify(cand, d)
      .queryExecution.executedPlan.toString
    "ShuffledHashJoin .*BuildLeft".r.findAllIn(verifyPlan).length shouldBe 2
    verifyPlan should not include "BroadcastHashJoin"
  }
}

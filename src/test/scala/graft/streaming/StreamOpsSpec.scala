package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, posexplode, round}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import java.sql.Timestamp

/** Event-time semantics of the streaming operators: append-mode window
  * finalization under the watermark, and first-occurrence-wins streaming
  * dedup with bounded state. */
class StreamOpsSpec extends AnyFunSuite with SparkSpec with Matchers {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming top-k neighbors: bounded per-query state, result equals " +
      "the same operator run on the batched input (x96 twin)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rnd = new scala.util.Random(61L)
    // static corpus (ids >= 100, incl. a zero-norm row the NULL contract
    // ranks last by id)
    val corpus = ((100L until 130L).map(i =>
      i -> Seq.fill(4)((rnd.nextDouble() * 2 - 1).toFloat)) :+
      (130L -> Seq(0f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val arriving = (0L until 6L).map(i =>
      i -> Seq.fill(4)((rnd.nextDouble() * 2 - 1).toFloat))
    val input = MemoryStream[(Long, Seq[Float])]
    val out = StreamOps.topKNeighbors(
      input.toDF().toDF("vec_id", "embedding"), corpus, k = 3)
    val sink = s"topk_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("complete")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("streamops_tk").toString)
      .start()
    try {
      input.addData(arriving.take(3): _*)
      q.processAllAvailable()
      input.addData(arriving.drop(3): _*)
      q.processAllAvailable()
      val got = s.table(sink)
        .selectExpr("qid", "inline(top)")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .toSet
      // the batch twin is the SAME operator over the batched input
      val want = StreamOps.topKNeighbors(
        arriving.toDF("vec_id", "embedding"), corpus, k = 3)
        .selectExpr("qid", "inline(top)")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .toSet
      got shouldBe want
      got.map(_._1) shouldBe (0L until 6L).toSet
    } finally q.stop()
  }

  test("streaming top-k candidate SPI: the IVF and persisted-index " +
      "generators at FULL probe equal the exact default and the batch x96 " +
      "aggregate, live") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rnd = new scala.util.Random(67L)
    // the corpus frame CONTAINS the query vectors (ids 0..5), so the
    // operator's =!= self-exclusion makes its candidate universe identical
    // to cosineTopKAgg's (queries = the vec_id < 6 prefix); no degenerate
    // rows — the IVF generators drop them by contract, the exact path ranks
    // them last, and this test pins the EQUALITY regime
    val all = ((0L until 6L) ++ (100L until 130L)).map(i =>
      i -> Seq.fill(4)((rnd.nextDouble() * 2 - 1).toFloat))
    val corpus = all.toDF("vec_id", "embedding")
    val arriving = all.take(6)
    val cents = graft.corpus.Similarity.normalizedCorpus(corpus)
      .filter(col("vec_id") >= 100 && col("vec_id") < 104)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toSeq
    // a persisted cid-partitioned cell-membership table (the ivfPqIndex
    // layout; only vec_id/cid are read by the generator)
    val idxDir = java.nio.file.Files
      .createTempDirectory("streamops_idx").toString
    graft.corpus.Similarity.normalizedCorpus(corpus)
      .withColumn("__bm",
        graft.functions.VectorOps.bestMatch(col("e"), cents))
      .select(col("vec_id"), (-col("__bm").getField("nid")).as("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(idxDir)
    val index = s.read.parquet(idxDir)
    val gens: Seq[(String, StreamOps.StreamCandidates)] = Seq(
      "exact" -> StreamOps.exactStreamCandidates,
      "ivf_full" -> StreamOps.ivfStreamCandidates(cents, nprobe = cents.size),
      "index_full" -> StreamOps.ivfIndexStreamCandidates(index, cents,
        nprobe = cents.size))
    // the batch referee: x96's bounded aggregate over the same frame
    val want = graft.corpus.Similarity.cosineTopKAgg(corpus, 6, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3))).toSet
    for ((gname, gen) <- gens) {
      val input = MemoryStream[(Long, Seq[Float])]
      val out = StreamOps.topKNeighbors(
        input.toDF().toDF("vec_id", "embedding"), corpus, k = 3,
        candidates = gen)
      val sink = s"topk_spi_${gname}_${System.nanoTime}"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("streamops_spi").toString)
        .start()
      try {
        input.addData(arriving.take(2): _*)
        q.processAllAvailable()
        input.addData(arriving.drop(2): _*)
        q.processAllAvailable()
        val got = s.table(sink)
          .select(col("qid"), posexplode(col("top")))
          .select(col("qid"), col("col.id"),
            (col("pos") + 1).cast("int"), round(col("col.score"), 6))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
            r.getDouble(3))).toSet
        withClue(s"generator=$gname: ") { got shouldBe want }
      } finally q.stop()
    }
  }

  test("streaming top-k IVF generator at partial probe: scores are exact " +
      "on the restricted pool (a member of the exact top list, never a " +
      "new score)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rnd = new scala.util.Random(71L)
    val corpus = (100L until 140L).map(i =>
      i -> Seq.fill(4)((rnd.nextDouble() * 2 - 1).toFloat))
      .toDF("vec_id", "embedding")
    val cents = graft.corpus.Similarity.normalizedCorpus(corpus)
      .filter(col("vec_id") < 108)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toSeq
    val arriving = (0L until 4L).map(i =>
      i -> Seq.fill(4)((rnd.nextDouble() * 2 - 1).toFloat))
    val input = MemoryStream[(Long, Seq[Float])]
    val out = StreamOps.topKNeighbors(
      input.toDF().toDF("vec_id", "embedding"), corpus, k = 5,
      candidates = StreamOps.ivfStreamCandidates(cents, nprobe = 2))
    val sink = s"topk_np_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("complete")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("streamops_np").toString)
      .start()
    try {
      input.addData(arriving: _*)
      q.processAllAvailable()
      val got = s.table(sink)
        .select(col("qid"), posexplode(col("top")))
        .select(col("qid"), col("col.id"), round(col("col.score"), 6))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // exact full-scan scores for every (query, candidate) pair: the
      // probe restriction may change MEMBERSHIP, never a score
      val exact = StreamOps.topKNeighbors(
        arriving.toDF("vec_id", "embedding"), corpus, k = 40)
        .select(col("qid"), posexplode(col("top")))
        .select(col("qid"), col("col.id"), round(col("col.score"), 6))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      got.foreach { row => exact should contain(row) }
      got.map(_._1).distinct.sorted shouldBe (0L until 4L)
    } finally q.stop()
  }

  test("streaming IVF generators propose the SAME pool as the batch " +
      "ivfDenseCandidates at every nprobe on frozen centroids (x94's " +
      "membership discipline, stream side)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(79L)
    val corpus = (100L until 140L).map(i =>
      i -> Seq.fill(4)((rnd.nextDouble() * 2 - 1).toFloat))
      .toDF("vec_id", "embedding")
    val base = graft.corpus.Similarity.normalizedCorpus(corpus)
    val cents = base.filter(col("vec_id") < 108)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toSeq
    // query ids disjoint from the corpus range, so self-exclusion never
    // fires on either side and the comparison is pure pool membership
    val queries = (0L until 5L).map(i =>
      i -> Seq.fill(4)((rnd.nextDouble() * 2 - 1).toFloat))
      .toDF("vec_id", "embedding")
    val qStream = graft.corpus.Similarity.normalizedCorpus(queries)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val qBatch = qStream.select(col("qid").as("query_id"),
      col("qe"))
    // persisted cid-partitioned cell membership for the index generator
    val idxDir = java.nio.file.Files
      .createTempDirectory("streamops_member").toString
    base.withColumn("__bm",
        graft.functions.VectorOps.bestMatch(col("e"), cents))
      .select(col("vec_id"), (-col("__bm").getField("nid")).as("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(idxDir)
    val index = s.read.parquet(idxDir)
    def pool(df: org.apache.spark.sql.DataFrame, q: String, d: String) =
      df.select(col(q), col(d)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (np <- Seq(1, 2, 4, cents.size)) withClue(s"nprobe=$np: ") {
      // batch referee at an uncut kCand: proposals ARE the probed cells
      val want = pool(graft.corpus.Retrieval.ivfDenseCandidates(
          nprobe = np, centroids = Some(cents))(base, qBatch, 40),
        "query_id", "doc_id")
      // the generators are restriction-only stateless transforms, so the
      // same code path that runs per trigger runs on the static frames
      pool(StreamOps.ivfStreamCandidates(cents, np)(base, qStream),
        "qid", "vec_id") shouldBe want
      pool(StreamOps.ivfIndexStreamCandidates(index, cents, np)(
        base, qStream), "qid", "vec_id") shouldBe want
    }
  }

  test("streaming increment exact-substring spans: batch-equal through a " +
      "live query; no-hit/span-less/NULL docs absent; probe-mode guard " +
      "loud") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val shared = (1 to 9).map(i => s"s$i").mkString(" ")
    val ref = Seq((2L, s"head1 $shared tail1")).toDF("doc_id", "text")
    val vocab = graft.corpus.TextDedup.spanVocabulary(ref, spanTokens = 3)
    val rows = Seq(
      (ts("2024-01-01 10:00:00"), 11L, s"x y $shared z"), // one 9-token run
      (ts("2024-01-01 10:00:01"), 13L, "no match in here at all today"),
      (ts("2024-01-01 10:00:02"), 15L, "p q"), // span-less
      (ts("2024-01-01 10:00:03"), 17L, null.asInstanceOf[String]))
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamOps.duplicatedSpansAgainst(
      input.toDF().toDF("ts", "doc_id", "text"), vocab, spanTokens = 3,
      minTokens = 8, watermarkDelay = "10 minutes")
    val sink = s"substr_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("streamops_substr").toString)
      .start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      // two watermark-advancing records, each GRAMFUL (>= spanTokens
      // tokens, zero vocabulary hits, so they emit nothing themselves):
      // a span-less closer would be filtered before the aggregation and
      // the stateful operator would see an empty batch — eviction then
      // waits on the engine's optional no-data micro-batch, which
      // processAllAvailable does not wait for. The first record moves the
      // watermark past 10:00, the second drives the evicting batch.
      input.addData((ts("2024-01-01 11:00:00"), 99L, "za zb zc"))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 12:00:00"), 98L, "zd ze zf"))
      q.processAllAvailable()
      val streamed = s.table(sink)
        .select("doc_id", "start_pos", "n_span_tokens", "span_text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSet
      val batch = graft.corpus.TextDedup.duplicatedSpansAgainst(
        rows.map(r => (r._2, r._3)).toDF("doc_id", "text"), vocab,
        spanTokens = 3, minTokens = 8).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).toSet
      streamed shouldBe batch
      streamed.map(_._1) shouldBe Set(11L) // only the overlapping doc
      streamed.head._4 shouldBe shared
    } finally q.stop()
    intercept[IllegalArgumentException] {
      StreamOps.duplicatedSpansAgainst(
        input.toDF().toDF("ts", "doc_id", "text"),
        graft.corpus.TextDedup.spanVocabulary(ref, spanTokens = 3,
          hashGrams = true), spanTokens = 3)
    }.getMessage should include("probe mode")
  }

  test("hourly windows emit once, finalized, when the watermark passes their end") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val out = StreamOps.hourlyEventCounts(
      input.toDF().toDF("ts", "event_type", "value"), watermarkDelay = "10 minutes")
    val sink = s"hourly_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("streamops1").toString)
      .start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:40:00"), "click", 2.0),
        (ts("2024-01-01 10:50:00"), "view", 5.0))
      q.processAllAvailable()
      // watermark still inside the 10:00 window -> nothing finalized yet
      s.table(sink).count() shouldBe 0
      // an 11:20 event pushes the watermark past 11:00 -> 10:00 windows close
      input.addData((ts("2024-01-01 11:20:00"), "click", 9.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 12:30:00"), "click", 0.0))
      q.processAllAvailable()
      val rows = s.table(sink).collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      rows should contain(("2024-01-01 10:00:00.0", "click", 2L, 3.0))
      rows should contain(("2024-01-01 10:00:00.0", "view", 1L, 5.0))
    } finally q.stop()
  }

  test("session windows merge within the gap and emit once closed by the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val out = StreamOps.userSessions(
      input.toDF().toDF("ts", "user_id", "event_type", "value"),
      gap = "10 minutes", watermarkDelay = "5 minutes")
    val sink = s"sessions_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("streamops3").toString)
      .start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
        (ts("2024-01-01 10:05:00"), 1L, "click", 1.0), // same session (gap 10m)
        (ts("2024-01-01 10:30:00"), 1L, "click", 1.0)) // new session (25m silence)
      q.processAllAvailable()
      // advance the watermark far past both sessions' closes
      input.addData((ts("2024-01-01 12:00:00"), 2L, "click", 1.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 14:00:00"), 2L, "click", 1.0))
      q.processAllAvailable()
      val u1 = s.table(sink).collect().filter(_.getLong(0) == 1L)
        .map(r => (r.getTimestamp(1).toString, r.getLong(3))).sortBy(_._1)
      u1 shouldBe Array(
        ("2024-01-01 10:00:00.0", 2L), // two events merged into one session
        ("2024-01-01 10:30:00.0", 1L))
    } finally q.stop()
  }

  test("streaming dedup keeps the first arrival per content digest") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamOps.dedupByContent(
      input.toDF().toDF("ts", "doc_id", "text"), watermarkDelay = "1 hour")
    val sink = s"dedup_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("streamops2").toString)
      .start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, "same text"),
        (ts("2024-01-01 10:01:00"), 2L, "same text"),   // dup within watermark
        (ts("2024-01-01 10:02:00"), 3L, "other text"),
        // null text = unknown content, NOT mutual duplicates: state-store
        // dedup compares null digests equal, so a bare md5 key would keep 5
        // and silently drop 6
        (ts("2024-01-01 10:02:30"), 5L, null),
        (ts("2024-01-01 10:02:45"), 6L, null))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 10:03:00"), 4L, "same text")) // still dup
      q.processAllAvailable()
      val ids = s.table(sink).collect().map(_.getLong(1)).toSet
      ids shouldBe Set(1L, 3L, 5L, 6L)
    } finally q.stop()
  }

  test("streaming decontamination flags only docs sharing a benchmark shingle, once each") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val bench = Seq("a b c").toDF("s") // static benchmark 3-gram set
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamOps.flagContaminated(
      input.toDF().toDF("ts", "doc_id", "text"), bench)
    val sink = s"decon_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("streamops3").toString)
      .start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, "a b c d"),  // contaminated (shares "a b c")
        (ts("2024-01-01 10:01:00"), 2L, "x y z w"),  // clean
        (ts("2024-01-01 10:02:00"), 3L, "q a b c"))  // contaminated
      q.processAllAvailable()
      val rows = s.table(sink).collect().map(_.getLong(0)).toSeq
      rows.sorted shouldBe Seq(1L, 3L) // flagged once each, despite per-shingle fanout
    } finally q.stop()
  }

  test("streaming near-dup flagging: index bucket collisions flag, novel docs pass") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // the persisted index over the EXISTING corpus (static side)
    val oldDocs = Seq(
      (100L, (1 to 30).map(i => s"tok$i").mkString(" ")),
      (101L, (31 to 60).map(i => s"tok$i").mkString(" "))).toDF("doc_id", "text")
    val index = graft.corpus.TextDedup.dedupIndex(oldDocs)
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamOps.flagNearDupCandidates(
      input.toDF().toDF("ts", "doc_id", "text"), index)
    val sink = s"neardup_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("streamops4").toString)
      .start()
    try {
      input.addData(
        // near-dup of old 100 (one token changed) → some band must collide
        (ts("2024-01-01 10:00:00"), 1L,
          (1 to 30).map(i => if (i == 30) "zz" else s"tok$i").mkString(" ")),
        // novel text → no bucket collision
        (ts("2024-01-01 10:01:00"), 2L,
          (61 to 90).map(i => s"new$i").mkString(" ")),
        // too short for a shingle → silently passes (no signature)
        (ts("2024-01-01 10:02:00"), 3L, "a b"))
      q.processAllAvailable()
      val rows = s.table(sink).collect().map(_.getLong(0)).toSeq
      rows shouldBe Seq(1L) // flagged ONCE despite 16 banded rows
    } finally q.stop()
  }

  test("streaming flagging probes the PERSISTED bucketed index with no index-side shuffle") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val oldDocs = Seq(
      (100L, (1 to 30).map(i => s"tok$i").mkString(" ")),
      (101L, (31 to 60).map(i => s"tok$i").mkString(" "))).toDF("doc_id", "text")
    graft.corpus.TextDedup.writeDedupIndex(
      graft.corpus.TextDedup.dedupIndex(oldDocs), "stream_dedup_idx", buckets = 4)
    val conf = s.conf
    val prevB = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val idx = s.table("stream_dedup_idx")
      val input = MemoryStream[(Timestamp, Long, String)]
      val out = StreamOps.flagNearDupCandidates(
        input.toDF().toDF("ts", "doc_id", "text"), idx)
      val sink = s"neardup_disk_${System.nanoTime}"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("streamops5").toString)
        .start()
      try {
        input.addData(
          (ts("2024-01-01 10:00:00"), 1L,
            (1 to 30).map(i => if (i == 30) "zz" else s"tok$i").mkString(" ")),
          (ts("2024-01-01 10:01:00"), 2L,
            (61 to 90).map(i => s"new$i").mkString(" ")))
        q.processAllAvailable()
        // same candidates as the in-memory-index variant pinned above
        s.table(sink).collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
        // plan shape THROUGH the streaming join: the bucketed scan feeds the
        // semi-join in bucket layout, so the only hash exchanges are the
        // STREAM side's two (into the join key, then into the dedup state
        // operator's doc_id partitioning) — an index-side re-shuffle would
        // make it three and void the whole point of persisting bucketed
        val plan = q.asInstanceOf[
            org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
          .streamingQuery.lastExecution.executedPlan.toString
        plan should include("Bucketed: true")
        "Exchange hashpartitioning".r.findAllIn(plan).size shouldBe 2
        plan should not include "BroadcastExchange"
      } finally q.stop()
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      s.sql("DROP TABLE IF EXISTS stream_dedup_idx")
    }
  }

  test("the bloom gate composes onto a stream as a stateless narrow filter") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // blocklist folded to driver-held bytes once (batch side)
    val blocked = Seq("bad line one", "bad line two").toDF("s")
    val bloom = graft.functions.BloomGate.build(blocked, "s", 2, 0.01)
    val input = MemoryStream[(Long, String)]
    val out = input.toDF().toDF("doc_id", "text")
      .filter(!graft.functions.BloomGate.mightContain(bloom,
        org.apache.spark.sql.functions.col("text")))
    out.isStreaming shouldBe true // a literal-foldable gate needs no state
    val sink = s"bloomgate_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("bloomgate").toString)
      .start()
    try {
      input.addData((1L, "bad line one"), (2L, "clean text"), (3L, "bad line two"))
      q.processAllAvailable()
      s.table(sink).collect().map(_.getLong(0)).toSeq shouldBe Seq(2L)
    } finally q.stop()
  }

  test("per-epoch drift monitoring: unigramDrift runs unchanged in foreachBatch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // frozen reference snapshot (in production: the persisted current release)
    val ref = Seq((1L, "a b c", "s0")).toDF("doc_id", "text", "source")
    val input = MemoryStream[(Long, String, String)]
    val epochs =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Map[String, Double])]
    val q = input.toDF().toDF("doc_id", "text", "source").writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("driftmon").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, epochId: Long) =>
        epochs += epochId -> graft.corpus.Profiling.unigramDrift(ref, df)
          .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
        ()
      }
      .start()
    try {
      input.addData((10L, "a b c", "s0")) // identical distribution
      q.processAllAvailable()
      input.addData((11L, "x y z", "s0")) // fully disjoint vocabulary
      q.processAllAvailable()
      val bySrc = epochs.toMap
      bySrc(0L)("s0") shouldBe 0.0
      bySrc(1L)("s0") shouldBe 1.0
    } finally q.stop()
  }

  test("streaming mix sampling: frozen rates gate an ingest stream deterministically") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rates = Seq(("s0", 1.0), ("s1", 0.0)).toDF("source", "rate")
    val input = MemoryStream[(Long, String, String)]
    val out = graft.corpus.Curation.applyMixRates(
      input.toDF().toDF("doc_id", "text", "source")
        .join(org.apache.spark.sql.functions.broadcast(rates), "source"))
    out.isStreaming shouldBe true
    val sink = s"mixgate_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("mixgate").toString)
      .start()
    try {
      input.addData((1L, "keep me", "s0"), (2L, "drop me", "s1"))
      q.processAllAvailable()
      // rate 1.0 keeps everything, rate 0.0 drops everything
      s.table(sink).collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
    } finally q.stop()
  }

  test("stateless curation ops run unchanged on a stream (chunk -> split, append mode)") {
    // chunkDocuments and assignSplits are narrow, stateless transforms — the
    // SAME operator code must compose onto a streaming DataFrame with no
    // adaptation and no state store. This pins that property: a regression
    // that introduces an aggregate/sort into them would fail analysis here.
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val chunked = graft.corpus.Curation.chunkDocuments(
      input.toDF().toDF("doc_id", "text", "source"), chunkTokens = 3, stride = 2)
    val split = graft.corpus.Curation.assignSplits(
      input.toDF().toDF("doc_id", "text", "source"))
    val entropy = graft.corpus.TextStats.charClassEntropy(
      input.toDF().toDF("doc_id", "text", "source"))
    val gate = graft.corpus.TextStats.qualityGate(
      input.toDF().toDF("doc_id", "text", "source"))
    chunked.isStreaming shouldBe true
    split.isStreaming shouldBe true
    entropy.isStreaming shouldBe true
    gate.isStreaming shouldBe true
    val sink = s"curation_${System.nanoTime}"
    val q = chunked.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("streamops3").toString)
      .start()
    try {
      input.addData((1L, "a b c d e", "src0"), (2L, "x y", "src1"))
      q.processAllAvailable()
      val rows = s.table(sink).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(4))).toSet
      // doc 1 (5 tokens, window 3 stride 2): chunks at 0, 2 -> "a b c", "c d e"
      rows shouldBe Set((1L, 0L, "a b c"), (1L, 1L, "c d e"), (2L, 0L, "x y"))
    } finally q.stop()
  }

  test("streaming relevance gate keeps task-relevant docs with batch-equal scores") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val corpus = Seq((10L, "alpha beta gamma"), (11L, "beta beta delta"),
      (12L, "gamma delta")).toDF("doc_id", "text")
    val queries = Seq((0L, "alpha"), (1L, "delta")).toDF("doc_id", "text")
    val model = graft.corpus.Retrieval.bm25Model(
      graft.corpus.Retrieval.bm25Index(corpus), queries)
    val input = MemoryStream[(Long, String, String)]
    val out = StreamOps.gateByRelevance(
      input.toDF().toDF("doc_id", "text", "source"), model, "source")
    out.isStreaming shouldBe true
    val sink = s"relevance_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("streamops4").toString)
      .start()
    try {
      input.addData(
        (7L, "alpha alpha", "src0"),     // matches query 0
        (8L, "unrelated text", "src1"),  // gated out
        (9L, "alpha delta", "src2"))     // matches both; best wins
      q.processAllAvailable()
      val rows = s.table(sink).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("source"), r.getAs[Long]("query_id"),
            r.getAs[Double]("score")))).toMap
      rows.keySet shouldBe Set(7L, 9L)
      rows(7L)._1 shouldBe "src0"
      rows(7L)._2 shouldBe 0L
      // the streaming score equals the BATCH gate's score bit-for-bit
      val batch = graft.corpus.Retrieval.bm25IngestGate(
        Seq((7L, "alpha alpha"), (9L, "alpha delta")).toDF("doc_id", "text"),
        model).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("query_id"), r.getAs[Double]("score")))).toMap
      (rows(7L)._2, rows(7L)._3) shouldBe batch(7L)
      (rows(9L)._2, rows(9L)._3) shouldBe batch(9L)
    } finally q.stop()
  }

  test("streaming hybrid ingest screen decides batch-equal over a live query") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val corpus = Seq((10L, "alpha beta"), (11L, "beta gamma"))
      .toDF("doc_id", "text")
    val model = graft.corpus.Retrieval.bm25Model(
      graft.corpus.Retrieval.bm25Index(corpus),
      Seq((50L, "alpha")).toDF("doc_id", "text"))
    val bench = Seq(100L -> Seq(1.0, 0.0))
    val input = MemoryStream[(Long, String, Array[Float])]
    val out = StreamOps.screenIngest(
      input.toDF().toDF("doc_id", "text", "embedding"), model, bench,
      tau = 0.3)
    out.isStreaming shouldBe true
    val sink = s"screen_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("streamops7").toString)
      .start()
    try {
      val batchIn = Seq(
        (7L, "alpha alpha", Array(0.1f, 1f)),   // keep
        (8L, "alpha", Array(1f, 0.1f)),         // contaminated
        (9L, "nothing", Array(0f, 1f)),         // irrelevant
        (6L, "alpha", Array(0f, 0f)))           // unscreenable
      input.addData(batchIn: _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) = r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("query_id"), r.getAs[Double]("score"),
          r.getAs[Long]("bench_id"), r.getAs[Double]("bench_cosine"),
          r.getAs[Boolean]("relevant"), r.getAs[Boolean]("contaminated"),
          r.getAs[Boolean]("screenable"), r.getAs[Boolean]("keep")))
      val streamed = s.table(sink).collect().map(key).toMap
      val batch = graft.corpus.Retrieval.hybridIngestGate(
        batchIn.toDF("doc_id", "text", "embedding"), model, bench,
        tau = 0.3).collect().map(key).toMap
      streamed shouldBe batch
      streamed(7L)._8 shouldBe true
      streamed.filterNot(_._1 == 7L).values.map(_._8).toSet shouldBe Set(false)
    } finally q.stop()
  }

  test("streaming SQ8 encoding emits batch-equal codes and drops degenerates") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val corpus = (0L until 12L).map { i =>
      (i, Array.tabulate(8)(j => (1.0 + ((i + j) % 5)).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    val (mins, diffs) = graft.corpus.Quantization.sq8Stats(corpus, 8)
    val input = MemoryStream[(Long, Array[Float], String)]
    val out = StreamOps.encodeSq8(
      input.toDF().toDF("vec_id", "embedding", "source"), mins, diffs, 8,
      Seq("source"))
    out.isStreaming shouldBe true
    val sink = s"sq8enc_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("streamops8").toString)
      .start()
    try {
      input.addData(
        (100L, Array.tabulate(8)(j => (2.0 + j % 3).toFloat), "srcA"),
        (101L, Array.fill(8)(0.0f), "srcB"),      // zero norm → dropped
        (102L, Array.fill(4)(1.0f), "srcC"),      // wrong dim → dropped
        (103L, Array.tabulate(8)(j => (1.0 + j % 5).toFloat), "srcD"))
      q.processAllAvailable()
      val rows = s.table(sink).collect()
        .map(r => r.getAs[Long]("vec_id") ->
          ((r.getAs[String]("source"), r.getSeq[Long](r.fieldIndex("codes")))))
        .toMap
      rows.keySet shouldBe Set(100L, 103L)
      rows(100L)._1 shouldBe "srcA"
      // streaming codes equal the BATCH encoder's bit-for-bit
      val batch = graft.corpus.Quantization.sq8Encoded(
        Seq((100L, Array.tabulate(8)(j => (2.0 + j % 3).toFloat), 0),
          (103L, Array.tabulate(8)(j => (1.0 + j % 5).toFloat), 0))
          .toDF("vec_id", "embedding", "label"), mins, diffs, 8).collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1)).toMap
      rows(100L)._2 shouldBe batch(100L)
      rows(103L)._2 shouldBe batch(103L)
      // codes must be in byte range — the storage contract
      rows.values.flatMap(_._2).foreach { c =>
        c should be >= 0L; c should be <= 255L }
    } finally q.stop()
  }

  test("streaming PQ encoding emits batch-equal codes and drops degenerates") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val corpus = (0L until 12L).map { i =>
      (i, Array.tabulate(8)(j => (1.0 + ((i + j) % 5)).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    val cbs = graft.corpus.Quantization.sliceCodebooks(corpus, 2, 4, 8)
    val input = MemoryStream[(Long, Array[Float], String)]
    val out = StreamOps.encodeEmbeddings(
      input.toDF().toDF("vec_id", "embedding", "source"), cbs, 8, Seq("source"))
    out.isStreaming shouldBe true
    val sink = s"pqenc_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("streamops5").toString)
      .start()
    try {
      input.addData(
        (100L, Array.tabulate(8)(j => (2.0 + j % 3).toFloat), "srcA"),
        (101L, Array.fill(8)(0.0f), "srcB"),      // zero norm → dropped
        (102L, Array.fill(4)(1.0f), "srcC"),      // wrong dim → dropped
        (103L, Array.tabulate(8)(j => (1.0 + j % 5).toFloat), "srcD"))
      q.processAllAvailable()
      val rows = s.table(sink).collect()
        .map(r => r.getAs[Long]("vec_id") ->
          ((r.getAs[String]("source"), r.getSeq[Int](r.fieldIndex("codes")))))
        .toMap
      rows.keySet shouldBe Set(100L, 103L)
      rows(100L)._1 shouldBe "srcA"
      // streaming codes equal the BATCH encoder's bit-for-bit
      val batch = graft.corpus.Quantization.encoded(
        Seq((100L, Array.tabulate(8)(j => (2.0 + j % 3).toFloat), 0),
          (103L, Array.tabulate(8)(j => (1.0 + j % 5).toFloat), 0))
          .toDF("vec_id", "embedding", "label"), cbs, 8).collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Int](1)).toMap
      rows(100L)._2 shouldBe batch(100L)
      rows(103L)._2 shouldBe batch(103L)
    } finally q.stop()
  }

  test("streaming IVF-PQ index maintenance emits batch-equal (cid, codes) rows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val corpus = (0L until 12L).map { i =>
      (i, Array.tabulate(8)(j => (1.0 + ((i + 2 * j) % 5)).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    val Q = graft.corpus.Quantization
    val cbs = Q.sliceCodebooks(corpus, 2, 4, 8)
    val cents = Q.centroidSeeds(corpus, numCentroids = 4, dim = 8)
    val input = MemoryStream[(Long, Array[Float])]
    val out = StreamOps.indexEmbeddings(
      input.toDF().toDF("vec_id", "embedding"), cbs, cents, 8)
    out.isStreaming shouldBe true
    val sink = s"pqidx_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("streamops6").toString)
      .start()
    try {
      val v200 = Array.tabulate(8)(j => (3.0 + j % 4).toFloat)
      val v201 = Array.tabulate(8)(j => (1.0 + (j * j) % 5).toFloat)
      input.addData((200L, v200), (201L, v201),
        (202L, Array.fill(8)(0.0f)))   // degenerate → dropped
      q.processAllAvailable()
      val rows = s.table(sink).collect()
        .map(r => r.getAs[Long]("vec_id") ->
          ((r.getAs[Long]("cid"), r.getSeq[Int](r.fieldIndex("codes")))))
        .toMap
      rows.keySet shouldBe Set(200L, 201L)
      val batch = Q.ivfPqIndex(
        Seq((200L, v200, 0), (201L, v201, 0))
          .toDF("vec_id", "embedding", "label"), cbs, cents, 8).collect()
        .map(r => r.getAs[Long]("vec_id") ->
          ((r.getAs[Long]("cid"), r.getSeq[Int](r.fieldIndex("codes")))))
        .toMap
      rows shouldBe batch
    } finally q.stop()
  }

  private def oldCorpus(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    Seq(
      (100L, (1 to 30).map(i => s"tok$i").mkString(" ")),
      (101L, (31 to 60).map(i => s"tok$i").mkString(" "))).toDF("doc_id", "text")
  }
  private val nearDupText =
    (1 to 30).map(i => if (i == 30) "zz" else s"tok$i").mkString(" ")
  private val oldText100 = (1 to 30).map(i => s"tok$i").mkString(" ")

  test("streaming span scrub: batch-equal verdicts through a live query;" +
      " span-less and NULL docs emit same-trigger; probe-mode guard loud") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val old = Seq((2L, "a b c d e"), (4L, "f g h i j")).toDF("doc_id", "text")
    val vocab = graft.corpus.TextDedup.spanVocabulary(old, spanTokens = 3)
    val rows = Seq(
      (ts("2024-01-01 10:00:00"), 11L, "x y a b c z"), // hits an old span
      (ts("2024-01-01 10:00:01"), 13L, "no match in here at all"),
      (ts("2024-01-01 10:00:02"), 15L, "p q"), // span-less: stateless branch
      (ts("2024-01-01 10:00:03"), 17L, null.asInstanceOf[String]))
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamOps.scrubSpansAgainst(
      input.toDF().toDF("ts", "doc_id", "text"), vocab, spanTokens = 3,
      watermarkDelay = "10 minutes")
    val sink = s"spanscrub_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("streamops_scrub").toString)
      .start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      // the stateless branch (span-less + NULL docs) needs no watermark
      s.table(sink).select("doc_id").collect().map(_.getLong(0)).toSet shouldBe
        Set(15L, 17L)
      // an 11:00 record pushes the watermark past 10:00 -> the aggregated
      // (gramful) rows finalize
      input.addData((ts("2024-01-01 11:00:00"), 99L, "zz"))
      q.processAllAvailable()
      val streamed = s.table(sink)
        .filter(org.apache.spark.sql.functions.col("doc_id") =!= 99L)
        .collect()
        .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[String]("scrubbed"),
          r.getAs[Any]("n_tokens"), r.getAs[Any]("n_removed")))).toMap
      val batch = graft.corpus.TextDedup.spanScrubAgainst(
        rows.map(r => (r._2, r._3)).toDF("doc_id", "text"), vocab,
        spanTokens = 3).collect()
        .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[String]("scrubbed"),
          r.getAs[Any]("n_tokens"), r.getAs[Any]("n_removed")))).toMap
      streamed shouldBe batch
      streamed(11L)._1 shouldBe "x y z" // the old span really came out
    } finally q.stop()
    intercept[IllegalArgumentException] { // hashed vocabulary, string probes
      StreamOps.scrubSpansAgainst(
        input.toDF().toDF("ts", "doc_id", "text"),
        graft.corpus.TextDedup.spanVocabulary(old, spanTokens = 3,
          hashGrams = true), spanTokens = 3)
    }.getMessage should include("probe mode")
  }

  test("streaming long-run span scrub (x102 twin): batch-equal through a " +
      "live query — long matched runs removed, short hits survive; guard " +
      "loud") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val long = (1 to 12).map(i => s"L$i").mkString(" ")
    val short = (1 to 5).map(i => s"S$i").mkString(" ")
    val old = Seq((2L, s"$long ref1 $short")).toDF("doc_id", "text")
    val vocab = graft.corpus.TextDedup.spanVocabulary(old, spanTokens = 3)
    val rows = Seq(
      (ts("2024-01-01 10:00:00"), 11L, s"x1 x2 $long x3"), // >= 10: scrubbed
      (ts("2024-01-01 10:00:01"), 13L, s"y1 $short y2 y3"), // 5 < 10: kept
      (ts("2024-01-01 10:00:02"), 15L, "p q"),              // span-less
      (ts("2024-01-01 10:00:03"), 17L, null.asInstanceOf[String]))
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamOps.scrubSpansLongAgainst(
      input.toDF().toDF("ts", "doc_id", "text"), vocab, spanTokens = 3,
      minTokens = 10, watermarkDelay = "10 minutes")
    val sink = s"spanscrublong_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("streamops_scrubl").toString)
      .start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData((ts("2024-01-01 11:00:00"), 99L, "zz"))
      q.processAllAvailable()
      val streamed = s.table(sink)
        .filter(org.apache.spark.sql.functions.col("doc_id") =!= 99L)
        .collect()
        .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[String]("scrubbed"),
          r.getAs[Any]("n_tokens"), r.getAs[Any]("n_removed")))).toMap
      val batch = graft.corpus.TextDedup.spanScrubLongAgainst(
        rows.map(r => (r._2, r._3)).toDF("doc_id", "text"), vocab,
        spanTokens = 3, minTokens = 10).collect()
        .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[String]("scrubbed"),
          r.getAs[Any]("n_tokens"), r.getAs[Any]("n_removed")))).toMap
      streamed shouldBe batch
      streamed(11L)._1 shouldBe "x1 x2 x3"      // the long run came out
      streamed(13L)._1 shouldBe s"y1 $short y2 y3" // the short hit did not
    } finally q.stop()
    intercept[IllegalArgumentException] { // hashed vocabulary, string probes
      StreamOps.scrubSpansLongAgainst(
        input.toDF().toDF("ts", "doc_id", "text"),
        graft.corpus.TextDedup.spanVocabulary(old, spanTokens = 3,
          hashGrams = true), spanTokens = 3)
    }.getMessage should include("probe mode")
    intercept[IllegalArgumentException] { // gate below the window width
      StreamOps.scrubSpansLongAgainst(
        input.toDF().toDF("ts", "doc_id", "text"), vocab, spanTokens = 3,
        minTokens = 2)
    }.getMessage should include("minTokens")
  }

  test("streaming line scrub (x109 twin): batch-equal through a live " +
      "query — vocabulary lines removed, blanks exempt, NULL-text docs " +
      "absent on both sides; guard loud") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val old = Seq((100L, "SUBSCRIBE\nref body a"), (101L, "SUBSCRIBE\nref b"))
      .toDF("doc_id", "text")
    val vocab = graft.corpus.TextDedup.lineVocabulary(old, hashKeys = true)
    val rows = Seq(
      (ts("2024-01-01 10:00:00"), 11L, "mine\nSUBSCRIBE\n\nkeep me"),
      (ts("2024-01-01 10:00:01"), 13L, "SUBSCRIBE\nref b"), // pure boiler
      (ts("2024-01-01 10:00:02"), 15L, "all fresh\nlines"),
      (ts("2024-01-01 10:00:03"), 17L, null.asInstanceOf[String]))
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamOps.scrubLinesAgainst(
      input.toDF().toDF("ts", "doc_id", "text"), vocab, hashKeys = true,
      watermarkDelay = "10 minutes")
    val sink = s"linescrub_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("streamops_lines").toString)
      .start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData((ts("2024-01-01 11:00:00"), 99L, "zz"))
      q.processAllAvailable()
      val streamed = s.table(sink)
        .filter(org.apache.spark.sql.functions.col("doc_id") =!= 99L)
        .collect()
        .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_lines"),
          r.getAs[Long]("n_removed"), r.getAs[String]("text")))).toMap
      val batch = graft.corpus.TextDedup.lineScrubAgainst(
        rows.map(r => (r._2, r._3)).toDF("doc_id", "text"), vocab,
        hashKeys = true).collect()
        .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_lines"),
          r.getAs[Long]("n_removed"), r.getAs[String]("text")))).toMap
      streamed shouldBe batch
      streamed(11L) shouldBe ((4L, 1L, "mine\n\nkeep me"))
      streamed(13L) shouldBe ((2L, 2L, "")) // pure boilerplate -> empty
      // NULL-text docs are absent on BOTH sides (the batch contract: a
      // line explode has nothing to rebuild from)
      streamed.keySet shouldBe Set(11L, 13L, 15L)
    } finally q.stop()
    intercept[IllegalArgumentException] { // string vocabulary, hashed probes
      StreamOps.scrubLinesAgainst(
        input.toDF().toDF("ts", "doc_id", "text"),
        graft.corpus.TextDedup.lineVocabulary(old), hashKeys = true)
    }.getMessage should include("probe mode")
  }

  test("streaming verified near-dups: capChars without banded is rejected" +
      " at construction, not silently dropped") {
    val s = spark
    val old = oldCorpus(s)
    // the exact kernel has no cap: accepting capChars with banded=false
    // would hand the hot path the unbounded full-text DP the caller
    // configured against
    intercept[IllegalArgumentException] {
      StreamOps.verifyNearDupsAgainst(old.withColumn("ts",
          org.apache.spark.sql.functions.current_timestamp()),
        graft.corpus.TextDedup.dedupIndex(old), old, capChars = 1000)
    }.getMessage should include("requires banded")
  }

  test("streaming verified near-dups: per-record verdicts through a live query") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val old = oldCorpus(s)
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamOps.verifyNearDupsAgainst(
      input.toDF().toDF("ts", "doc_id", "text"),
      graft.corpus.TextDedup.dedupIndex(old), old)
    val sink = s"verifydup_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("streamops6").toString)
      .start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, nearDupText), // near-dup of old 100
        (ts("2024-01-01 10:01:00"), 2L,
          (61 to 90).map(i => s"new$i").mkString(" "))) // novel → absent
      q.processAllAvailable()
      val rows = s.table(sink).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("matched_doc_id"),
          r.getAs[Long]("max_len"), r.getAs[Long]("lev"),
          r.getAs[Boolean]("is_dup")))
      // exactly one verified pair: suffix "tok30"→"zz" has no common char,
      // so lev is the full 5; dedup'd despite the 16-band fanout
      rows.toSeq shouldBe Seq((1L, 100L,
        math.max(nearDupText.length, oldText100.length).toLong, 5L, true))
    } finally q.stop()
  }

  test("streaming verified near-dups: banded mode emits the same verdicts through a live query") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val old = oldCorpus(s)
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamOps.verifyNearDupsAgainst(
      input.toDF().toDF("ts", "doc_id", "text"),
      graft.corpus.TextDedup.dedupIndex(old), old, banded = true)
    val sink = s"verifydup_banded_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("streamops6b").toString)
      .start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, nearDupText),
        (ts("2024-01-01 10:01:00"), 2L,
          (61 to 90).map(i => s"new$i").mkString(" ")))
      q.processAllAvailable()
      val rows = s.table(sink).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("matched_doc_id"),
          r.getAs[Long]("max_len"), r.getAs[Long]("lev"),
          r.getAs[Boolean]("is_dup")))
      // identical to the exact kernel's verdict: the pair IS a dup, so the
      // banded DP materializes the exact lev (refuted pairs would carry NULL)
      rows.toSeq shouldBe Seq((1L, 100L,
        math.max(nearDupText.length, oldText100.length).toLong, 5L, true))
    } finally q.stop()
  }

  test("streaming verified near-dups: index doc without a text row fails loudly") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val old = oldCorpus(s)
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamOps.verifyNearDupsAgainst(
      input.toDF().toDF("ts", "doc_id", "text"),
      graft.corpus.TextDedup.dedupIndex(old),
      old.filter($"doc_id" =!= 100L)) // text table missing the indexed doc
    val sink = s"verifydup_stale_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("streamops7").toString)
      .start()
    try {
      input.addData((ts("2024-01-01 10:00:00"), 1L, nearDupText))
      val ex = intercept[Exception] { q.processAllAvailable() }
      Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ") should
        include("verifyNearDupsAgainst")
    } finally q.stop()
  }

  test("streaming verified near-dups: a since-NULLed text row yields NULL verdicts") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val old = oldCorpus(s)
    // the index was built when doc 100 had text; the text was since NULLed —
    // the pair is still reported, verifiable-in-principle, verdict NULL
    val nulled = Seq((100L, null: String),
      (101L, (31 to 60).map(i => s"tok$i").mkString(" "))).toDF("doc_id", "text")
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamOps.verifyNearDupsAgainst(
      input.toDF().toDF("ts", "doc_id", "text"),
      graft.corpus.TextDedup.dedupIndex(old), nulled)
    val sink = s"verifydup_null_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("streamops8").toString)
      .start()
    try {
      input.addData((ts("2024-01-01 10:00:00"), 1L, nearDupText))
      q.processAllAvailable()
      val r = s.table(sink).collect().toSeq
      r should have size 1
      r.head.getAs[Long]("doc_id") shouldBe 1L
      r.head.getAs[Long]("matched_doc_id") shouldBe 100L
      r.head.getAs[Long]("max_len") shouldBe nearDupText.length.toLong
      r.head.isNullAt(r.head.fieldIndex("lev")) shouldBe true
      r.head.isNullAt(r.head.fieldIndex("is_dup")) shouldBe true
    } finally q.stop()
  }

  test("streaming BPE segmentation is batch-equal through a live query") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val merges = Seq("t" -> "o", "to" -> "k") // frozen cascading list
    val data = Seq(
      (ts("2024-01-01 10:00:00"), 1L, "tok tokto  x"), // cascades + empty word
      (ts("2024-01-01 10:01:00"), 2L, ""),
      (ts("2024-01-01 10:02:00"), 3L, null: String))
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamOps.segmentBpe(
      input.toDF().toDF("ts", "doc_id", "text"), merges)
    val sink = s"bpeseg_${System.nanoTime}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("streamops9").toString)
      .start()
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) = r.getAs[Long]("doc_id") ->
        ((Option(r.get(r.fieldIndex("n_tokens"))),
          Option(r.get(r.fieldIndex("n_subwords"))),
          Option(r.get(r.fieldIndex("subword_text")))))
      val streamed = s.table(sink).collect().map(key).toMap
      val batch = graft.corpus.TextStats.applyBpe(
        data.toDF("ts", "doc_id", "text"), merges).collect().map(key).toMap
      streamed shouldBe batch
      // and the cascade actually merged: "tok" → one subword
      streamed(1L)._3.get.asInstanceOf[String] should startWith("tok ")
    } finally q.stop()
  }
}

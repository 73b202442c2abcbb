package graft.corpus

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** End-to-end composition of the curation ladder on one corpus:
  * near-dup pairs → editVerify → clusters → applyDedup → qualityGate filter →
  * applyMixWeights keep-list → packSequences → assembleSequences →
  * assignShards.
  * Every stage is referee-tested alone; THIS spec pins that their column
  * contracts actually compose, and that global conservation invariants hold
  * across the chain — the properties a production pipeline silently loses
  * when one stage's rename or filter semantics shift:
  *  - monotone shrinkage: each stage's survivors are a subset of the prior
  *    stage's (no stage resurrects a dropped document);
  *  - candidate verification only ever REMOVES pairs, and the planted
  *    dups all survive it;
  *  - dedup keeps exactly one canonical doc per near-dup cluster;
  *  - every surviving document is packed exactly once, and the packed token
  *    counts equal the surviving documents' own token counts (packing
  *    reorganizes, never drops or double-counts text mass);
  *  - sharding assigns every survivor exactly once, with balanced
  *    per-shard token mass. */
class CurationPipelineSpec extends AnyFunSuite with SparkSpec with Matchers {

  test("the dedup→gate→mix→pack ladder composes with conservation invariants") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val vocab = Vector("the", "cat", "sat", "on", "a", "mat", "dog", "ran",
      "far", "too", "and", "then", "some", "more", "words", "here")
    def sentence(n: Int) =
      Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    // 40 base docs + 8 planted near-dups (one token changed) + 2 exact dups
    val base = (0L until 40L).map(i => (i, sentence(8 + rnd.nextInt(30)), s"src${i % 4}"))
    val nearDups = base.take(8).map { case (id, t, s) =>
      (100L + id, t.replaceFirst("\\w+$", "zzz"), s)
    }
    val exactDups = base.slice(8, 10).map { case (id, t, s) => (200L + id, t, s) }
    val docs = (base ++ nearDups ++ exactDups)
      .toDF("doc_id", "text", "source")

    // 1. dedup: pairs → edit-distance verification → connected components →
    // surviving corpus. Verification is subtractive only, and the planted
    // one-token near-dups + exact dups all clear the 0.8 edit-sim bar.
    val pairs = TextDedup.minhashPairs(docs, threshold = 0.5)
    val verified = TextDedup.editVerify(pairs, docs)
    val pairKeys = pairs.select("doc_id_1", "doc_id_2").as[(Long, Long)]
      .collect().toSet
    val verifiedRows = verified.collect()
    verifiedRows.map(r => (r.getAs[Long]("doc_id_1"),
      r.getAs[Long]("doc_id_2"))).toSet shouldBe pairKeys // evidence per pair
    val survivors = verified.filter(col("is_dup"))
    survivors.count() shouldBe pairs.count() // this corpus: all candidates real
    // the banded verifier drops into the same slot with the same verdicts:
    // identical is_dup set, lev materialized exactly on the dups
    val banded = TextDedup.editVerifyBanded(pairs, docs).collect()
    banded.map(r => (r.getAs[Long]("doc_id_1"), r.getAs[Long]("doc_id_2"),
      r.getAs[Boolean]("is_dup"))).toSet shouldBe
      verifiedRows.map(r => (r.getAs[Long]("doc_id_1"),
        r.getAs[Long]("doc_id_2"), r.getAs[Boolean]("is_dup"))).toSet
    banded.filter(_.getAs[Boolean]("is_dup"))
      .forall(!_.isNullAt(banded.head.fieldIndex("lev"))) shouldBe true
    // the containment verifier is subtractive on the same candidates (a
    // different measure: one-token near-dups have high containment too)
    val contained = TextDedup.containmentVerify(pairs, docs).collect()
      .map(r => (r.getAs[Long]("doc_id_1"), r.getAs[Long]("doc_id_2"))).toSet
    contained.subsetOf(pairKeys) shouldBe true
    val clusters = TextDedup.dedupClusters(survivors)
    val deduped = TextDedup.applyDedup(docs, clusters)
    val allIds = docs.select("doc_id").as[Long].collect().toSet
    val dedupedIds = deduped.select("doc_id").as[Long].collect().toSet
    dedupedIds.subsetOf(allIds) shouldBe true
    // each cluster keeps exactly its canonical minimum
    val clusterRows = clusters.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
    clusterRows.groupBy(_._2).foreach { case (canon, members) =>
      val ids = members.map(_._1).toSet
      (ids & dedupedIds) shouldBe Set(canon)
    }
    // the planted exact dups were caught by the near-dup ladder
    dedupedIds.intersect(Set(208L, 209L)) shouldBe empty

    // 2. quality gate on the deduped corpus (keep == 1)
    val gated = deduped.join(
      TextStats.qualityGate(deduped).filter(col("keep") === 1)
        .select("doc_id"), Seq("doc_id"), "left_semi")
    val gatedIds = gated.select("doc_id").as[Long].collect().toSet
    gatedIds.subsetOf(dedupedIds) shouldBe true
    gatedIds should not be empty

    // 3. temperature mix, materialized through the provided helper (the
    // keep-list-applied-back contract), with a budget that forces real
    // downsampling
    val mixed = Curation.materializeMix(gated, budgetTokens = 300L)
    val mixedIds = mixed.select("doc_id").as[Long].collect().toSet
    mixedIds.subsetOf(gatedIds) shouldBe true
    mixedIds.size should be < gatedIds.size // the budget actually bit
    mixedIds should not be empty

    // 4. pack + assemble: every surviving doc lands in exactly one sequence,
    // token mass conserved
    val packed = Curation.packSequences(mixed, budget = 32)
    val packedRows = packed.collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Number]("n_tokens").longValue()))
    packedRows.map(_._1).toSet shouldBe mixedIds
    packedRows.length shouldBe mixedIds.size // exactly once each
    val expectedTokens = mixed.select(col("text")).as[String].collect()
      .map(_.split(" ", -1).length.toLong).sum
    packedRows.map(_._2).sum shouldBe expectedTokens
    // assembled sequences carry the same membership and token mass
    val assembled = Curation.assembleSequences(mixed, budget = 32).collect()
    assembled.map(_.getAs[Long]("n_docs")).sum shouldBe mixedIds.size.toLong
    assembled.map(_.getAs[Long]("seq_tokens")).sum shouldBe expectedTokens

    // 5. shard assignment over the final survivors: every doc exactly once,
    // token mass conserved across shards, and the snake's balance beats the
    // worst case — no shard holds more than half the total token mass
    val sharded = Curation.assignShards(mixed, shards = 4).collect()
    sharded.map(_.getAs[Long]("doc_id")).toSet shouldBe mixedIds
    sharded.length shouldBe mixedIds.size
    val perShard = sharded.groupBy(_.getAs[Long]("shard"))
      .view.mapValues(_.map(_.getAs[Long]("n_tokens")).sum).toMap
    perShard.values.sum shouldBe expectedTokens
    perShard.values.max should be < expectedTokens / 2
  }
}

package graft

import graft.queries.{CorpusQueries => C, PipelineQueries => P, RelationalQueries => R}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has a batch-expressible query here;
  * keys present in [[oracleSql]] are hash-checked against DuckDB by the driver, the
  * rest get a rows-only check (non-SQL-expressible ops).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full pipeline: dress → validate (V1-V11) → track (T1-T8) → decisions. */
  def entry(spark: SparkSession): DataFrame =
    P.t4CompleteDecision(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.2 serialization + §2.6 utility
    "d1_record_projection" -> (P.d1RecordProjection _),
    "d2_notification_parse" -> (P.d2NotificationParse _),
    "d5_invalid_json" -> (P.d5InvalidJson _),
    "u1_topic_derivation" -> (P.u1TopicDerivation _),
    // §2.3 validation
    "v1_extract_batch_id" -> (P.v1ExtractBatchId _),
    "v2_latest_notification" -> (P.v2LatestNotification _),
    "v3_batch_lookup_join" -> (P.v3BatchLookupJoin _),
    "v4_missing_batch_id" -> (P.v4MissingBatchId _),
    "v5_unknown_batch_id" -> (P.v5UnknownBatchId _),
    "v6_dropped_statuses" -> (P.v6DroppedStatuses _),
    "v7_late_after_complete" -> (P.v7LateAfterComplete _),
    "v8_json_validity" -> (P.v8JsonValidity _),
    "v10_invalid_records" -> (P.v10InvalidRecords _),
    "v11_counts_stream" -> (P.v11CountsStream _),
    // §2.4 tracker
    "t1_batch_counts" -> (P.t1BatchCounts _),
    "t2_counts_with_meta" -> (P.t2CountsWithMeta _),
    "t3_threshold_fail" -> (P.t3ThresholdFail _),
    "t4_complete_decision" -> (P.t4CompleteDecision _),
    "t6_overflow_fail" -> (P.t6OverflowFail _),
    // relational coverage
    "q1_agg" -> (R.q1Agg _),
    "q2_topk_revenue" -> (R.q2TopkRevenue _),
    "q3_nation_revenue" -> (R.q3NationRevenue _),
    "q4_customers_no_orders" -> (R.q4CustomersNoOrders _),
    "q5_latest_order_per_customer" -> (R.q5LatestOrderPerCustomer _),
    "q6_events_hourly" -> (R.q6EventsHourly _),
    "q7_sessions" -> (R.q7Sessions _),
    "q8_asof_last_order" -> (R.q8AsofLastOrder _),
    "q9_range_followups" -> (R.q9RangeFollowups _),
    "q10_rollup" -> (R.q10Rollup _),
    "q11_percentiles" -> (R.q11Percentiles _),
    // training-data pipeline: dedup, similarity, text analysis, multimodal
    "x1_dedup_exact" -> (C.x1DedupExact _),
    "x2_ngram_jaccard" -> (C.x2NgramJaccard _),
    "x3_minhash_lsh" -> (C.x3MinhashLsh _),
    "x4_simhash" -> (C.x4Simhash _),
    "x5_simhash_pairs" -> (C.x5SimhashPairs _),
    "x6_cosine_topk" -> (C.x6CosineTopk _),
    "x7_ann_lsh" -> (C.x7AnnLsh _),
    "x8_lang_id" -> (C.x8LangId _),
    "x9_quality" -> (C.x9Quality _),
    "x10_token_stats" -> (C.x10TokenStats _),
    "x11_winnow" -> (C.x11Winnow _),
    "x12_cosine_neardup" -> (C.x12CosineNearDup _),
    "x13_ann_ivf" -> (C.x13AnnIvf _),
    "x16_stopword_scrub" -> (C.x16StopwordScrub _),
    "x17_profile" -> (C.x17Profile _),
    "x18_vocabulary" -> (C.x18Vocabulary _),
    "x19_unigram_score" -> (C.x19UnigramScore _),
    "x20_dedup_clusters" -> (C.x20DedupClusters _),
    "x21_repetition" -> (C.x21RepetitionStats _),
    "x22_decontamination" -> (C.x22Decontamination _),
    "x23_quota_sample" -> (C.x23QuotaSample _),
    "x24_topk_quality" -> (C.x24TopkQuality _),
    "x25_mix_report" -> (C.x25MixReport _),
    "x26_tfidf_keywords" -> (C.x26TfidfKeywords _),
    "x27_bigram_score" -> (C.x27BigramScore _),
    "x28_pii_scrub" -> (C.x28PiiScrub _),
    "x30_dsir_weights" -> (C.x30DsirWeights _),
    "x31_pack_sequences" -> (C.x31PackSequences _),
    "x32_quality_gate" -> (C.x32QualityGate _),
    "x33_source_overlap" -> (C.x33SourceOverlap _),
    "x34_chunk_docs" -> (C.x34ChunkDocuments _),
    "x35_split_assign" -> (C.x35SplitAssign _),
    "x36_pmi_collocations" -> (C.x36PmiCollocations _),
    "x37_cross_doc_spans" -> (C.x37CrossDocSpans _),
    "x38_length_profile" -> (C.x38LengthProfile _),
    "x39_assemble_seqs" -> (C.x39AssembleSequences _),
    "x40_incr_dedup" -> (C.x40IncrementalDedup _),
    "x41_mix_weights" -> (C.x41MixWeights _),
    "x42_embed_decontam" -> (C.x42EmbedDecontam _),
    "x43_char_entropy" -> (C.x43CharEntropy _),
    "x44_kmeans" -> (C.x44Kmeans _),
    "x45_semantic_dedup" -> (C.x45SemanticDedup _),
    "x46_cluster_profile" -> (C.x46ClusterProfile _),
    "x47_embedding_profile" -> (C.x47EmbeddingProfile _),
    "x48_boilerplate" -> (C.x48Boilerplate _),
    "x49_dataset_card" -> (C.x49DatasetCard _),
    "x50_dedup_apply" -> (C.x50DedupApply _),
    "x51_incr_semantic" -> (C.x51IncrementalSemantic _),
    "x52_apply_mix" -> (C.x52ApplyMix _),
    "x53_snapshot_diff" -> (C.x53SnapshotDiff _),
    "x54_novelty" -> (C.x54Novelty _),
    "x55_concentration" -> (C.x55Concentration _),
    "x56_unigram_drift" -> (C.x56UnigramDrift _),
    "x57_embedding_drift" -> (C.x57EmbeddingDrift _),
    "x58_line_scrub" -> (C.x58LineScrub _),
    "x59_bloom_decontam" -> (C.x59BloomDecontam _),
    "x29_normalize" -> (C.x29Normalize _),
    "x60_bm25" -> (C.x60Bm25 _),
    "x61_bpe_pairs" -> (C.x61BpePairs _),
    "x62_stratified_sample" -> (C.x62StratifiedSample _),
    "x63_knn_labels" -> (C.x63KnnLabels _),
    "x64_embedding_outliers" -> (C.x64EmbeddingOutliers _),
    "x65_relevance_gate" -> (C.x65RelevanceGate _),
    "x66_pq_codes" -> (C.x66PqCodes _),
    "x67_pq_ann" -> (C.x67PqAnn _),
    "x68_pq_recall" -> (C.x68PqRecall _),
    "x69_pq_rerank" -> (C.x69PqRerank _),
    "x70_ivf_pq" -> (C.x70IvfPq _),
    "x71_hybrid_rrf" -> (C.x71HybridRrf _),
    "x72_trunc_ann" -> (C.x72TruncAnn _),
    "x73_hybrid_gate" -> (C.x73HybridGate _),
    "x74_sq8_codes" -> (C.x74Sq8Codes _),
    "x75_sq8_ann" -> (C.x75Sq8Ann _),
    "x76_quality_lr" -> (C.x76QualityLr _),
    "x77_classifier_resample" -> (C.x77ClassifierResample _),
    "x78_calibration" -> (C.x78Calibration _),
    "x79_shard_assign" -> (C.x79ShardAssign _),
    "x80_edit_verify" -> (C.x80EditVerify _),
    "x81_bpe_segment" -> (C.x81BpeSegment _),
    "x82_containment" -> (C.x82Containment _),
    "x83_span_scrub" -> (C.x83SpanScrub _),
    "x84_incr_span_scrub" -> (C.x84IncrSpanScrub _),
    "x85_ccnet_buckets" -> (C.x85CcnetBuckets _),
    "x86_incr_ccnet_buckets" -> (C.x86IncrCcnetBuckets _),
    "x87_rm3" -> (C.x87Rm3 _),
    "x88_tokenizer_fertility" -> (C.x88TokenizerFertility _),
    "x89_mmr" -> (C.x89Mmr _),
    "x90_training_order" -> (C.x90TrainingOrder _),
    "x91_fertility_drift" -> (C.x91FertilityDrift _),
    "x92_rm3_against" -> (C.x92Rm3Against _),
    "x93_hard_negatives" -> (C.x93HardNegatives _),
    "x94_dense_recall" -> (C.x94DenseRecall _),
    "x95_pack_efficiency" -> (C.x95PackEfficiency _),
    "x96_topk_agg" -> (C.x96TopkAgg _),
    "x97_pack_nextfit" -> (C.x97PackNextFit _),
    "x98_adc_recall" -> (C.x98AdcRecall _),
    "x99_exact_substr_spans" -> (C.x99ExactSubstrSpans _),
    "x100_incr_substr_spans" -> (C.x100IncrSubstrSpans _),
    "x101_span_scrub_long" -> (C.x101SpanScrubLong _),
    "x102_incr_scrub_long" -> (C.x102IncrScrubLong _),
    "x103_decontam_spans" -> (C.x103DecontamSpans _),
    "x104_rotate_encode" -> (C.x104RotateEncode _),
    "x105_decontam_spans_bloom" -> (C.x105DecontamSpansBloom _),
    "m1_media_meta" -> (C.m1MediaMeta _),
    "m2_media_features" -> (C.m2MediaFeatures _),
    "m3_frame_sample" -> (C.m3FrameSample _),
    "m4_resize_plan" -> (C.m4ResizePlan _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.oracle.OracleSql.sql ++ graft.oracle.CorpusOracleSql.sql
}

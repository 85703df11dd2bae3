package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2b is a named entry in `queries`;
  * entries with cross-engine-deterministic output carry DuckDB oracle SQL
  * in `oracleSql` (exact-decimal aggregation + epoch-micros timestamps, see
  * engine/Exact.scala); the rest (sketches, LSH signatures, our own hash
  * functions) get the rows-only check.
  */
object SparkEntry {

  /** Flagship on sf0.001: the reference's full data path (window → order →
    * page → key → enrich → route) as one DataFrame expression. */
  def entry(spark: SparkSession): DataFrame =
    Envelope.flagship(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // reference fidelity (SURVEY §2a)
    "q_scan_project"      -> (Relational.qScanProject _),
    "q_filter_range"      -> (Incremental.qFilterRange _),
    "q_incremental_pages" -> (Incremental.qIncrementalPages _),
    "q_key_route"         -> (Envelope.qKeyRoute _),
    "q_string_cast"       -> (Cast.qStringCast _),
    // relational core (§2b)
    "q_expand_join"       -> (Relational.qExpandJoin _),
    "q_join_multiway"     -> (Relational.qJoinMultiway _),
    "q_sql_multiway"      -> (Relational.qSqlMultiway _),
    "q_paged_source"      -> (Relational.qPagedSource _),
    "q_join_outer"        -> (Relational.qJoinOuter _),
    "q_join_semi_anti"    -> (Relational.qJoinSemiAnti _),
    "q_join_asof_range"   -> (Relational.qJoinAsofRange _),
    "q_asof_join"         -> (Relational.qAsofJoin _),
    "q_agg_hash"          -> (Relational.qAggHash _),
    "q_agg_distinct"      -> (Relational.qAggDistinct _),
    "q_agg_approx"        -> (Relational.qAggApprox _),
    "q_agg_kmv"           -> (Sketches.qAggKmv _),
    "q_grouping_sets"     -> (Relational.qGroupingSets _),
    "q_cube"              -> (Relational.qCube _),
    "q_percentile_disc"   -> (Relational.qPercentileDisc _),
    "q_percentile_exact"  -> (Relational.qPercentileExact _),
    "q_multimodal_resize" -> (Multimodal.qMultimodalResize _),
    "q_multimodal_embed"  -> (Multimodal.qMultimodalEmbed _),
    "q_unpivot"           -> (Relational.qUnpivot _),
    "q_window_rank"       -> (Relational.qWindowRank _),
    "q_window_frame"      -> (Relational.qWindowFrame _),
    "q_window_range"      -> (Relational.qWindowRange _),
    "q_window_misc"       -> (Relational.qWindowMisc _),
    "q_subquery_scalar"   -> (Relational.qSubqueryScalar _),
    "q_lateral_topk"      -> (Relational.qLateralTopk _),
    "q_sessionize"        -> (Relational.qSessionize _),
    "q_sample_stratified" -> (Relational.qSampleStratified _),
    "q_topk"              -> (Relational.qTopk _),
    "q_set_ops"           -> (Relational.qSetOps _),
    "q_scalar_funcs"      -> (Relational.qScalarFuncs _),
    "q_dedup_latest"      -> (Incremental.qDedupLatest _),
    // LLM-pipeline north-star
    "q_dedup_exact_text"  -> (LlmOps.qDedupExactText _),
    "q_bpe_merges"        -> (LlmOps.qBpeMerges _),
    "q_bpe_encode"        -> (LlmOps.qBpeEncode _),
    "q_dedup_minhash"     -> (LlmOps.qDedupMinhash _),
    "q_dedup_simhash"     -> (LlmOps.qDedupSimhash _),
    "q_ngram_jaccard"     -> (LlmOps.qNgramJaccard _),
    "q_lsh_recall"        -> (LlmOps.qLshRecall _),
    "q_span_dedup"        -> (LlmOps.qSpanDedup _),
    "q_span_scrub"        -> (LlmOps.qSpanScrub _),
    "q_corpus_delta"      -> (LlmOps.qCorpusDelta _),
    "q_corpus_absorb"     -> (LlmOps.qCorpusAbsorb _),
    "q_corpus_bloom"      -> (LlmOps.qCorpusBloom _),
    "q_corpus_compact"    -> (LlmOps.qCorpusCompact _),
    "q_corpus_gc"         -> (LlmOps.qCorpusGc _),
    "q_stream_delta"      -> (Streaming.qStreamDelta _),
    "q_stream_absorb"     -> (Streaming.qStreamAbsorb _),
    "q_dedup_embedding"   -> (LlmOps.qDedupEmbedding _),
    "q_dedup_groups"      -> (LlmOps.qDedupGroups _),
    "q_sim_topk"          -> (LlmOps.qSimTopk _),
    "q_sim_ivf"           -> (LlmOps.qSimIvf _),
    "q_quantize_embed"    -> (Quantize.qQuantizeEmbed _),
    "q_sim_ivf_quant"     -> (Quantize.qSimIvfQuant _),
    "q_ivf_absorb"        -> (Quantize.qIvfAbsorb _),
    "q_ivf_gc"            -> (Quantize.qIvfGc _),
    "q_ivf_serve"         -> (Quantize.qIvfServe _),
    "q_ann_recall"        -> (Quantize.qAnnRecall _),
    "q_text_analysis"     -> (LlmOps.qTextAnalysis _),
    "q_token_count"       -> (LlmOps.qTokenCount _),
    "q_text_quality"      -> (LlmOps.qTextQuality _),
    "q_lang_id"           -> (LlmOps.qLangId _),
    "q_fingerprint"       -> (LlmOps.qFingerprint _),
    "q_bm25_topk"         -> (LlmOps.qBm25Topk _),
    "q_stream_join"       -> (Streaming.qStreamJoin _),
    "q_multimodal_meta"   -> (Multimodal.qMultimodalMeta _),
    // corpus curation (repetition gate, PII scrub, URL extract, decontamination)
    "q_repetition"        -> (Curation.qRepetition _),
    "q_pii_scrub"         -> (Curation.qPiiScrub _),
    "q_url_extract"       -> (Curation.qUrlExtract _),
    "q_decontaminate"     -> (Curation.qDecontaminate _),
    "q_pack_sequences"    -> (Curation.qPackSequences _),
    "q_chunk_docs"        -> (Curation.qChunkDocs _),
    // the curation production path (dedup → gate → chunk) as ONE oracle
    "q_curation_pipeline" -> (Curation.qCurationPipeline _),
    // streaming window algebra (batch-checkable)
    "q_stream_tumbling"   -> (Streaming.qStreamTumbling _),
    "q_stream_session"    -> (Streaming.qStreamSession _),
    "q_stream_upsert"     -> (Streaming.qStreamUpsert _),
    // genuine MicroBatchStream drain of the paged CDC source
    "q_paged_stream"      -> (Streaming.qPagedStream _),
    // the reference's whole production path composed end to end:
    // changelog stream drain → StringCast SMT → envelope/routing →
    // upsert compaction, one oracle over the lot
    "q_cdc_pipeline"      -> (Cdc.qCdcPipeline _),
    // SCD2 history — the other canonical changelog consumption
    "q_scd2"              -> (Cdc.qScd2 _),
    // bounded-state exact analytics: MG heavy hitters, bloom join pruning
    "q_heavy_hitters"     -> (HeavyHitters.qHeavyHitters _),
    "q_stream_heavy"      -> (HeavyHitters.qStreamHeavy _),
    "q_bloom_join"        -> (Bloom.qBloomJoin _),
    // sequential-pattern funnel over the event stream
    "q_funnel"            -> (Funnel.qFunnel _),
    // Morton clustering key for multi-dimensional data skipping
    "q_zorder"            -> (ZOrder.qZorder _),
    // skew-mitigated salted join (result == the plain join)
    "q_skew_join"         -> (Skew.qSkewJoin _),
    // data-quality audit gate (rows/nulls/dup-pk/orphans/domains)
    "q_dq_audit"          -> (Quality.qDqAudit _),
    // time-series regularization: bucket, spine, carry-forward fill
    "q_resample"          -> (Resample.qResample _),
    // …and the linear-interpolation dual, exact-integer lerp
    "q_interpolate"       -> (Resample.qInterpolate _),
    // materialized-view upkeep: base+delta partial merge == full recompute
    "q_incr_agg"          -> (Materialize.qIncrAgg _),
    // snapshot differencing: derive the changelog from two table versions
    "q_snapshot_diff"     -> (Cdc.qSnapshotDiff _),
    // training-set assembly: stable hash split + weighted source mixing
    "q_split_assign"      -> (Mixture.qSplitAssign _),
    "q_mixture"           -> (Mixture.qMixture _),
    "q_sample_exact"      -> (Mixture.qSampleExact _),
    // trailing-window anomaly gate, integer-exact decision rule
    "q_anomaly"           -> (Anomaly.qAnomaly _),
    // weekly cohort retention matrix
    "q_cohort"            -> (Cohort.qCohort _),
    // ordered string aggregation (LISTAGG with an ORDER BY key)
    "q_listagg"           -> (Relational.qListagg _),
    // all-pairs rare-term cosine after exact dedup (prefix-filter shape)
    "q_cosine_pairs"      -> (LlmOps.qCosinePairs _),
    // integer-exact damped PageRank, 3 unrolled message-passing rounds
    "q_pagerank"          -> (Graph.qPagerank _),
    // sink frame + control plane + typed aggregation
    "q_kafka_frame"       -> (Sink.qKafkaFrame _),
    "q_incremental_batch" -> (Sink.qIncrementalBatch _),
    "q_topk_group"        -> (Aggregators.qTopkGroup _),
    // nested denormalization, sketches, multimodal frames
    "q_expand_nested"     -> (Relational.qExpandNested _),
    "q_percentile"        -> (Relational.qPercentile _),
    "q_multimodal_frames" -> (Multimodal.qMultimodalFrames _),
    // typed Dataset surface
    "q_typed_revenue"     -> (Typed.qTypedRevenue _),
    // pivot, array catalog, sliding windows
    "q_pivot"             -> (Relational.qPivot _),
    "q_array_funcs"       -> (Relational.qArrayFuncs _),
    "q_map_funcs"         -> (Relational.qMapFuncs _),
    "q_string_funcs"      -> (Functions.qStringFuncs _),
    "q_datetime_funcs"    -> (Functions.qDatetimeFuncs _),
    "q_conditional_funcs" -> (Functions.qConditionalFuncs _),
    "q_regex_funcs"       -> (Functions.qRegexFuncs _),
    "q_stream_sliding"    -> (Streaming.qStreamSliding _),
  )

  def oracleSql: Map[String, String] = Map(
    "q_scan_project"      -> Relational.qScanProjectSql,
    "q_filter_range"      -> Incremental.qFilterRangeSql,
    "q_incremental_pages" -> Incremental.qIncrementalPagesSql,
    "q_key_route"         -> Envelope.qKeyRouteSql,
    "q_string_cast"       -> Cast.qStringCastSql,
    "q_expand_join"       -> Relational.qExpandJoinSql,
    "q_join_multiway"     -> Relational.qJoinMultiwaySql,
    "q_sql_multiway"      -> Relational.qSqlMultiwaySql,
    "q_join_outer"        -> Relational.qJoinOuterSql,
    "q_join_semi_anti"    -> Relational.qJoinSemiAntiSql,
    "q_join_asof_range"   -> Relational.qJoinAsofRangeSql,
    "q_asof_join"         -> Relational.qAsofJoinSql,
    "q_agg_hash"          -> Relational.qAggHashSql,
    "q_agg_distinct"      -> Relational.qAggDistinctSql,
    "q_grouping_sets"     -> Relational.qGroupingSetsSql,
    "q_cube"              -> Relational.qCubeSql,
    "q_percentile_disc"   -> Relational.qPercentileDiscSql,
    "q_percentile_exact"  -> Relational.qPercentileExactSql,
    "q_kafka_frame"       -> Sink.qKafkaFrameSql,
    "q_multimodal_frames" -> Multimodal.qMultimodalFramesSql,
    "q_multimodal_resize" -> Multimodal.qMultimodalResizeSql,
    "q_multimodal_embed"  -> Multimodal.qMultimodalEmbedSql,
    "q_expand_nested"     -> Relational.qExpandNestedSql,
    "q_ngram_jaccard"     -> LlmOps.qNgramJaccardSql,
    "q_lsh_recall"        -> LlmOps.qLshRecallSql,
    "q_span_dedup"        -> LlmOps.qSpanDedupSql,
    "q_span_scrub"        -> LlmOps.qSpanScrubSql,
    "q_corpus_delta"      -> LlmOps.qCorpusDeltaSql,
    "q_corpus_absorb"     -> LlmOps.qCorpusAbsorbSql,
    "q_corpus_bloom"      -> LlmOps.qCorpusDeltaSql,
    "q_corpus_compact"    -> LlmOps.qCorpusDeltaSql,
    "q_corpus_gc"         -> LlmOps.qCorpusGcSql,
    // the streaming drain is batching-invariant — same oracle as the batch query
    "q_stream_delta"      -> LlmOps.qCorpusDeltaSql,
    "q_stream_absorb"     -> LlmOps.qStreamAbsorbSql,
    "q_lang_id"           -> LlmOps.qLangIdSql,
    "q_topk_group"        -> Aggregators.qTopkGroupSql,
    "q_dedup_groups"      -> LlmOps.qDedupGroupsSql,
    "q_dedup_embedding"   -> LlmOps.qDedupEmbeddingSql,
    "q_paged_source"      -> Relational.qPagedSourceSql,
    "q_map_funcs"         -> Relational.qMapFuncsSql,
    "q_incremental_batch" -> Sink.qIncrementalBatchSql,
    "q_unpivot"           -> Relational.qUnpivotSql,
    "q_window_rank"       -> Relational.qWindowRankSql,
    "q_window_frame"      -> Relational.qWindowFrameSql,
    "q_window_range"      -> Relational.qWindowRangeSql,
    "q_window_misc"       -> Relational.qWindowMiscSql,
    "q_subquery_scalar"   -> Relational.qSubqueryScalarSql,
    "q_lateral_topk"      -> Relational.qLateralTopkSql,
    "q_sessionize"        -> Relational.qSessionizeSql,
    "q_topk"              -> Relational.qTopkSql,
    "q_set_ops"           -> Relational.qSetOpsSql,
    "q_scalar_funcs"      -> Relational.qScalarFuncsSql,
    "q_dedup_latest"      -> Incremental.qDedupLatestSql,
    "q_dedup_exact_text"  -> LlmOps.qDedupExactTextSql,
    "q_bpe_merges"        -> LlmOps.qBpeMergesSql,
    "q_bpe_encode"        -> LlmOps.qBpeEncodeSql,
    "q_sim_topk"          -> LlmOps.qSimTopkSql,
    "q_text_analysis"     -> LlmOps.qTextAnalysisSql,
    "q_token_count"       -> LlmOps.qTokenCountSql,
    "q_text_quality"      -> LlmOps.qTextQualitySql,
    "q_multimodal_meta"   -> Multimodal.qMultimodalMetaSql,
    "q_repetition"        -> Curation.qRepetitionSql,
    "q_pii_scrub"         -> Curation.qPiiScrubSql,
    "q_url_extract"       -> Curation.qUrlExtractSql,
    "q_decontaminate"     -> Curation.qDecontaminateSql,
    "q_pack_sequences"    -> Curation.qPackSequencesSql,
    "q_stream_tumbling"   -> Streaming.qStreamTumblingSql,
    "q_stream_session"    -> Streaming.qStreamSessionSql,
    "q_stream_upsert"     -> Streaming.qStreamUpsertSql,
    "q_paged_stream"      -> Streaming.qPagedStreamSql,
    "q_cdc_pipeline"      -> Cdc.qCdcPipelineSql,
    "q_scd2"              -> Cdc.qScd2Sql,
    "q_heavy_hitters"     -> HeavyHitters.qHeavyHittersSql,
    "q_stream_heavy"      -> HeavyHitters.qHeavyHittersSql,
    "q_bloom_join"        -> Bloom.qBloomJoinSql,
    "q_funnel"            -> Funnel.qFunnelSql,
    "q_zorder"            -> ZOrder.qZorderSql,
    "q_skew_join"         -> Skew.qSkewJoinSql,
    "q_dq_audit"          -> Quality.qDqAuditSql,
    "q_resample"          -> Resample.qResampleSql,
    "q_interpolate"       -> Resample.qInterpolateSql,
    "q_incr_agg"          -> Materialize.qIncrAggSql,
    "q_snapshot_diff"     -> Cdc.qSnapshotDiffSql,
    "q_split_assign"      -> Mixture.qSplitAssignSql,
    "q_mixture"           -> Mixture.qMixtureSql,
    "q_sample_exact"      -> Mixture.qSampleExactSql,
    "q_anomaly"           -> Anomaly.qAnomalySql,
    "q_cohort"            -> Cohort.qCohortSql,
    "q_listagg"           -> Relational.qListaggSql,
    "q_cosine_pairs"      -> LlmOps.qCosinePairsSql,
    "q_pagerank"          -> Graph.qPagerankSql,
    "q_typed_revenue"     -> Typed.qTypedRevenueSql,
    "q_pivot"             -> Relational.qPivotSql,
    "q_array_funcs"       -> Relational.qArrayFuncsSql,
    "q_string_funcs"      -> Functions.qStringFuncsSql,
    "q_datetime_funcs"    -> Functions.qDatetimeFuncsSql,
    "q_conditional_funcs" -> Functions.qConditionalFuncsSql,
    "q_regex_funcs"       -> Functions.qRegexFuncsSql,
    "q_stream_sliding"    -> Streaming.qStreamSlidingSql,
    "q_fingerprint"       -> LlmOps.qFingerprintSql,
    "q_sample_stratified" -> Relational.qSampleStratifiedSql,
    "q_dedup_simhash"     -> LlmOps.qDedupSimhashSql,
    "q_dedup_minhash"     -> LlmOps.qDedupMinhashSql,
    "q_bm25_topk"         -> LlmOps.qBm25TopkSql,
    "q_stream_join"       -> Streaming.qStreamJoinSql,
    "q_agg_kmv"           -> Sketches.qAggKmvSql,
    "q_quantize_embed"    -> Quantize.qQuantizeEmbedSql,
    "q_sim_ivf_quant"     -> Quantize.qSimIvfQuantSql,
    "q_ivf_absorb"        -> Quantize.qIvfAbsorbSql,
    "q_ivf_gc"            -> Quantize.qIvfGcSql,
    "q_ivf_serve"         -> Quantize.qIvfServeSql,
    "q_ann_recall"        -> Quantize.qAnnRecallSql,
    "q_chunk_docs"        -> Curation.qChunkDocsSql,
    "q_curation_pipeline" -> Curation.qCurationPipelineSql,
  )
}

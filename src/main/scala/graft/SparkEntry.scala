package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, unix_timestamp}
import graft.engine._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in `queries` is an operator from SURVEY.md §2c; every key
  * that is ANSI-SQL-expressible has a matching DuckDB oracle in
  * `oracleSql` (same column names, same ORDER BY, doubles rounded —
  * the driver hash-compares values after sorting columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1-shaped multi-measure aggregation — the canonical
    * scale-proof plan (map-side partial agg, 6-row shuffle). */
  def entry(spark: SparkSession): DataFrame =
    Relational.qAggHash(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_project"       -> (Relational.qScanProject _),
    "q_filter_predicate"   -> (Relational.qFilterPredicate _),
    "q_limit_topn"         -> (Relational.qLimitTopN _),
    "q_join_broadcast"     -> (Relational.qJoinBroadcast _),
    "q_join_smj"           -> (Relational.qJoinSmj _),
    "q_join_semi_anti"     -> (Relational.qJoinSemiAnti _),
    "q_agg_hash"           -> (Relational.qAggHash _),
    "q_agg_distinct"       -> (Relational.qAggDistinct _),
    "q_agg_approx_distinct" -> (Relational.qAggApproxDistinct _),
    "q_agg_rollup"         -> (Relational.qAggRollup _),
    "q_agg_cube"           -> (Relational.qAggCube _),
    "q_pivot"              -> (Relational.qPivot _),
    "q_corr_subquery"      -> (Relational.qCorrSubquery _),
    "q_asof_join"          -> (Relational.qAsofJoin _),
    "q_range_join_bucketed" -> (Relational.qRangeJoinBucketed _),
    "q_quantiles"          -> (Relational.qQuantiles _),
    "q_string_agg"         -> (Relational.qStringAgg _),
    "q_window_rank"        -> (Relational.qWindowRank _),
    "q_window_frame"       -> (Relational.qWindowFrame _),
    "q_window_lead"        -> (Relational.qWindowLead _),
    "q_setops"             -> (Relational.qSetOps _),
    "q_scalar_funcs"       -> (Relational.qScalarFuncs _),
    "q_json_infer"         -> (IngestQueries.qJsonInfer _),
    "q_kafka_meta"         -> (IngestQueries.qKafkaMeta _),
    "q_type_promotion"     -> (IngestQueries.qTypePromotion _),
    "q_dedup_exact"        -> (TextOps.qDedupExact _),
    "q_dedup_minhash"      -> ((s, d) => TextOps.qDedupMinhash(s, d)),
    "q_dedup_simhash"      -> ((s, d) => TextOps.qDedupSimhash(s, d)),
    "q_dedup_ngram_jaccard" -> ((s, d) => TextOps.qDedupNgramJaccard(s, d)),
    "q_text_stats"         -> (TextOps.qTextStats _),
    "q_token_count"        -> (TextOps.qTokenCount _),
    "q_quality_score"      -> (TextOps.qQualityScore _),
    "q_lang_id"            -> (TextOps.qLangId _),
    "q_doc_chunking"       -> ((s, d) => TextOps.qDocChunking(s, d)),
    "q_dataset_split"      -> (TextOps.qDatasetSplit _),
    "q_text_clean"         -> (TextOps.qTextClean _),
    "q_doc_fingerprint"    -> (TextOps.qDocFingerprint _),
    "q_vector_topk"        -> ((s, d) => VectorOps.qVectorTopK(s, d)),
    "q_ann_lsh"            -> ((s, d) => VectorOps.qAnnLsh(s, d)),
    "q_ann_beam"           -> ((s, d) => VectorOps.qAnnBeam(s, d)),
    "q_ann_beam_clustered" -> ((s, d) => VectorOps.qAnnBeamClustered(s, d)),
    "q_stream_ann_ingest"  -> ((s, d) => VectorOps.qStreamAnnIngest(s, d)),
    "q_stream_ann_ingest_part" -> ((s, d) =>
      VectorOps.qStreamAnnIngest(s, d, nPlanes = 16,
        bucketPartitioned = true, probeEvery = 10)),
    "q_ann_ivf"            -> ((s, d) => VectorOps.qAnnIvf(s, d)),
    "q_embed_cosine_dup"   -> ((s, d) => VectorOps.qEmbedCosineDup(s, d)),
    "q_grouping_sets"      -> (Relational.qGroupingSets _),
    "q_join_outer"         -> (Relational.qJoinOuter _),
    "q_conditional_funcs"  -> (Relational.qConditionalFuncs _),
    "q_histogram"          -> ((s, d) => Relational.qHistogram(s, d)),
    "q_date_buckets"       -> (Relational.qDateBuckets _),
    "q_first_last"         -> (Relational.qFirstLast _),
    "q_sample_hash"        -> (Relational.qSampleHash _),
    "q_scalar_subquery"    -> (Relational.qScalarSubquery _),
    "q_stats_moments"      -> (Relational.qStatsMoments _),
    "q_array_agg"          -> (Relational.qArrayAgg _),
    "q_salted_agg"         -> (Relational.qSaltedAgg _),
    "q_stopword_filter"    -> (TextOps.qStopwordFilter _),
    "q_ngram_freq"         -> ((s, d) => TextOps.qNgramFreq(s, d)),
    "q_pii_redact"         -> (TextOps.qPiiRedact _),
    "q_sequence_pack"      -> ((s, d) => TextOps.qSequencePack(s, d)),
    "q_format_sniff"       -> (IngestQueries.qFormatSniff _),
    "q_vector_norm"        -> (VectorOps.qVectorNorm _),
    "q_stream_sliding"     -> (StreamingOps.qStreamSliding _),
    "q_stream_late_drop"   -> ((s, d) => StreamingOps.qStreamLateDrop(s, d)),
    "q_stream_dedup"       -> (StreamingOps.qStreamDedup _),
    "q_resample_ffill"     -> (StreamingOps.qResampleFfill _),
    "q_tfidf"              -> ((s, d) => TextOps.qTfidf(s, d)),
    "q_window_ntile"       -> (Relational.qWindowNtile _),
    "q_unpivot"            -> (Relational.qUnpivot _),
    "q_date_arith"         -> (Relational.qDateArith _),
    "q_exists_subquery"    -> (Relational.qExistsSubquery _),
    "q_regex_extract"      -> (TextOps.qRegexExtract _),
    "q_json_funcs"         -> (IngestQueries.qJsonFuncs _),
    "q_schema_evolution"   -> (IngestQueries.qSchemaEvolution _),
    "q_partition_prune"    -> (Sinks.qPartitionPrune _),
    "q_stream_join"        -> (StreamingOps.qStreamJoin _),
    "q_stream_tumbling"    -> (StreamingOps.qStreamTumbling _),
    "q_stream_session_ttl" -> (StreamingOps.qStreamSessionTtl _),
    "q_buffer_eviction"    -> (StreamingOps.qBufferEviction _),
    "q_csv_roundtrip"      -> (Sinks.qCsvRoundtrip _),
    "q_multimodal_meta"    -> (MultimodalOps.qMultimodalMeta _),
    "q_media_codecs"       -> (MultimodalOps.qMediaCodecs _),
    "q_audio_pcm_stats"    -> (MultimodalOps.qAudioPcmStats _),
    "q_audio_adpcm_stats"  -> (MultimodalOps.qAudioAdpcmStats _),
    "q_audio_ulaw_stats"   -> (MultimodalOps.qAudioUlawStats _),
    "q_blocklist_scan"     -> (TextOps.qBlocklistScan _),
    "q_pq_adc_scan"        -> ((s, d) => VectorOps.qPqAdcScan(s, d)),
    "q_gif_pixel_stats"    -> (MultimodalOps.qGifPixelStats _),
    "q_hll_union_md5"      -> (ScaleOps.qHllUnionMd5 _),
    "q_phrase_query"       -> ((s, d) => TextOps.qPhraseQuery(s, d)),
    "q_join_shuffle_hash"  -> (Relational.qJoinShuffleHash _),
    "q_collocation_g2"     -> (TextOps.qCollocationG2 _),
    "q_merkle_diff"        -> (ScaleOps.qMerkleDiff _),
    "q_point_in_polygon"   -> (StatsOps.qPointInPolygon _),
    "q_shapley_attribution" -> (AnalyticsOps.qShapleyAttribution _),
    "q_unigram_segment"    -> (TextOps.qUnigramSegment _),
    "q_randomized_response" -> (CurationOps.qRandomizedResponse _),
    "q_ransac_line"        -> ((s, d) => MiningOps.qRansacLine(s, d)),
    "q_permutation_test"   -> ((s, d) => StatsOps.qPermutationTest(s, d)),
    "q_lsh_recall_audit"   -> ((s, d) => TextOps.qLshRecallAudit(s, d)),
    "q_uplift_segments"    -> (StatsOps.qUpliftSegments _),
    "q_prefix_autocomplete" -> (TextOps.qPrefixAutocomplete _),
    "q_pixel_dedup"        -> (MultimodalOps.qPixelDedup _),
    "q_zone_map"           -> (ScaleOps.qZoneMap _),
    "q_mv_rewrite"         -> (ScaleOps.qMvRewrite _),
    "q_frame_sample"       -> (MultimodalOps.qFrameSample _),
    "q_media_embed"        -> ((s, d) => MultimodalOps.qMediaEmbed(s, d)),
    "q_window_range_frame" -> (Relational.qWindowRangeFrame _),
    "q_grouping_id"        -> (Relational.qGroupingId _),
    "q_setops_all"         -> (Relational.qSetOpsAll _),
    "q_argmax"             -> (Relational.qArgmax _),
    "q_bitwise_funcs"      -> (Relational.qBitwiseFuncs _),
    "q_interval_arith"     -> (Relational.qIntervalArith _),
    "q_decimal_arith"      -> (Relational.qDecimalArith _),
    "q_fuzzy_match"        -> (Relational.qFuzzyMatch _),
    "q_funnel"             -> (AnalyticsOps.qFunnel _),
    "q_retention_cohort"   -> (AnalyticsOps.qRetentionCohort _),
    "q_cumulative_distinct" -> (AnalyticsOps.qCumulativeDistinct _),
    "q_cdc_upsert"         -> (AnalyticsOps.qCdcUpsert _),
    "q_map_funcs"          -> (AnalyticsOps.qMapFuncs _),
    "q_higher_order_funcs" -> (TextOps.qHigherOrderFuncs _),
    "q_posexplode"         -> (TextOps.qPosexplode _),
    "q_char_ngram"         -> (TextOps.qCharNgram _),
    "q_url_parse"          -> (IngestQueries.qUrlParse _),
    "q_stream_outer_join"  -> (StreamingOps.qStreamOuterJoin _),
    "q_array_setops"       -> (TextOps.qArraySetops _),
    "q_string_funcs2"      -> (Relational.qStringFuncs2 _),
    "q_try_arith"          -> (Relational.qTryArith _),
    "q_json_array_explode" -> (IngestQueries.qJsonArrayExplode _),
    "q_lag_ignore_nulls"   -> (Relational.qLagIgnoreNulls _),
    "q_cross_join"         -> (Relational.qCrossJoin _),
    "q_quantile_disc"      -> (Relational.qQuantileDisc _),
    "q_bool_aggs"          -> (Relational.qBoolAggs _),
    "q_regression"         -> (Relational.qRegression _),
    "q_skew_kurt"          -> (Relational.qSkewKurt _),
    "q_variant_json"       -> (IngestQueries.qVariantJson _),
    "q_lateral_topk"       -> (Relational.qLateralTopk _),
    "q_star_join_having"   -> (Relational.qStarJoinHaving _),
    "q_collation_group"    -> (Relational.qCollationGroup _),
    "q_null_ordering"      -> (Relational.qNullOrdering _),
    "q_pagination"         -> (Relational.qPagination _),
    "q_null_aware_anti"    -> (Relational.qNullAwareAnti _),
    "q_relational_division" -> (Relational.qRelationalDivision _),
    "q_window_cume"        -> (Relational.qWindowCume _),
    "q_recursive_cte"      -> (Relational.qRecursiveCte _),
    "q_gaps_islands"       -> (AnalyticsOps.qGapsIslands _),
    "q_sessionize_batch"   -> (AnalyticsOps.qSessionizeBatch _),
    "q_math_funcs"         -> (Relational.qMathFuncs _),
    "q_hash_funcs"         -> (Relational.qHashFuncs _),
    "q_binary_funcs"       -> (Relational.qBinaryFuncs _),
    "q_array_gen"          -> (Relational.qArrayGen _),
    "q_inverted_index"     -> ((s, d) => TextOps.qInvertedIndex(s, d)),
    "q_corpus_filter"      -> (TextOps.qCorpusFilter _),
    "q_orc_roundtrip"      -> (Sinks.qOrcRoundtrip _),
    "q_sample_stratified"  -> (TextOps.qSampleStratified _),
    "q_stack_values"       -> (Relational.qStackValues _),
    "q_dedup_minhash_md5"  -> (TextOps.qDedupMinhashMd5 _),
    "q_scd2_history"       -> (AnalyticsOps.qScd2History _),
    "q_interp_linear"      -> (AnalyticsOps.qInterpLinear _),
    "q_bucket_join"        -> (ScaleOps.qBucketJoin _),
    "q_explode_outer"      -> (Relational.qExplodeOuter _),
    "q_pivot_dynamic"      -> (Relational.qPivotDynamic _),
    "q_approx_topk"        -> (Relational.qApproxTopk _),
    "q_fuzzy_join"         -> (Relational.qFuzzyJoin _),
    "q_hll_sketch"         -> (Relational.qHllSketch _),
    "q_group_sample"       -> ((s, d) => TextOps.qGroupSample(s, d)),
    "q_snowflake_join"     -> (Relational.qSnowflakeJoin _),
    "q_snapshot_diff"      -> (Relational.qSnapshotDiff _),
    "q_table_checksum"     -> (Relational.qTableChecksum _),
    "q_topk_agg"           -> ((s, d) => Relational.qTopkAgg(s, d)),
    "q_salted_join"        -> (ScaleOps.qSaltedJoin _),
    "q_decontaminate"      -> (TextOps.qDecontaminate _),
    "q_dsir_select"        -> (CurationOps.qDsirSelect _),
    "q_percent_total"      -> (Relational.qPercentTotal _),
    "q_entropy"            -> (AnalyticsOps.qEntropy _),
    "q_chi2"               -> (AnalyticsOps.qChi2 _),
    "q_markov_transitions" -> (AnalyticsOps.qMarkovTransitions _),
    "q_outlier_iqr"        -> (AnalyticsOps.qOutlierIqr _),
    "q_time_weighted_avg"  -> (AnalyticsOps.qTimeWeightedAvg _),
    "q_bm25"               -> ((s, d) => TextOps.qBm25(s, d)),
    "q_dedup_cluster"      -> (TextOps.qDedupCluster _),
    "q_zorder_layout"      -> (ScaleOps.qZorderLayout _),
    "q_bitmap_distinct"    -> (ScaleOps.qBitmapDistinct _),
    "q_merge_upsert"       -> (AnalyticsOps.qMergeUpsert _),
    "q_stream_full_outer"  -> (StreamingOps.qStreamFullOuter _),
    "q_json_roundtrip"     -> (Sinks.qJsonRoundtrip _),
    "q_kmeans_assign"      -> ((s, d) => VectorOps.qKmeansAssign(s, d)),
    "q_zscore"             -> (StatsOps.qZscore _),
    "q_autocorr"           -> (StatsOps.qAutocorr _),
    "q_gini"               -> (StatsOps.qGini _),
    "q_ttest"              -> (StatsOps.qTtest _),
    "q_cooccur"            -> (StatsOps.qCooccur _),
    "q_moving_median"      -> (StatsOps.qMovingMedian _),
    "q_rfm"                -> (StatsOps.qRfm _),
    "q_skyline"            -> (StatsOps.qSkyline _),
    "q_geo_distance"       -> (StatsOps.qGeoDistance _),
    "q_vocab_build"        -> ((s, d) => CurationOps.qVocabBuild(s, d)),
    "q_length_buckets"     -> (CurationOps.qLengthBuckets _),
    "q_class_weights"      -> (CurationOps.qClassWeights _),
    "q_dict_encode"        -> (CurationOps.qDictEncode _),
    "q_multi_distinct"     -> (RelationalExt.qMultiDistinct _),
    "q_copurchase"         -> (RelationalExt.qCopurchase _),
    "q_nested_struct"      -> (RelationalExt.qNestedStruct _),
    "q_weighted_median"    -> (RelationalExt.qWeightedMedian _),
    "q_stream_chained"     -> (StreamingOps.qStreamChained _),
    "q_pmi"                -> ((s, d) => CurationOps.qPmi(s, d)),
    "q_vector_quantize"    -> (VectorOps.qVectorQuantize _),
    "q_item_sim"           -> (RelationalExt.qItemSim _),
    "q_kcore"              -> (RelationalExt.qKcore _),
    "q_fd_audit"           -> (QualityOps.qFdAudit _),
    "q_acf_sweep"          -> (StatsOps.qAcfSweep _),
    "q_holt_linear"        -> (StatsOps.qHoltLinear _),
    "q_naive_bayes"        -> (MiningOps.qNaiveBayes _),
    "q_stream_store_source" -> (StreamingOps.qStreamStoreSource _),
    "q_silhouette"         -> ((s, dd) => VectorOps.qSilhouette(s, dd)),
    "q_fixed_width"        -> (Sinks.qFixedWidth _),
    "q_rake_keywords"      -> ((s, dd) => TextOps.qRakeKeywords(s, dd)),
    "q_entity_resolution"  -> (MiningOps.qEntityResolution _),
    "q_fellegi_sunter"     -> (MiningOps.qFellegiSunter _),
    "q_assortativity"      -> (RelationalExt.qAssortativity _),
    "q_lateness_audit"     -> (QualityOps.qLatenessAudit _),
    "q_recommender_eval"   -> (RelationalExt.qRecommenderEval _),
    "q_conformal_interval" -> (MiningOps.qConformalInterval _),
    "q_seasonal_decompose" -> (StatsOps.qSeasonalDecompose _),
    "q_hits_iter"          -> (RelationalExt.qHitsIter _),
    "q_geo_grid_join"      -> (RelationalExt.qGeoGridJoin _),
    "q_sprt"               -> (StatsOps.qSprt _),
    "q_bpe_apply"          -> (TextOps.qBpeApply _),
    "q_diff_in_diff"       -> (StatsOps.qDiffInDiff _),
    "q_cuped"              -> (StatsOps.qCuped _),
    "q_mann_whitney"       -> (MiningOps.qMannWhitney _),
    "q_graph_bfs"          -> (RelationalExt.qGraphBfs _),
    "q_arrow_roundtrip"    -> (FlightServe.qArrowRoundtrip _),
    "q_arrow_tcp_serve"    -> (ArrowTcpServer.qArrowTcpServe _),
    "q_arrow_tcp_put"      -> (ArrowTcpServer.qArrowTcpPut _),
    "q_triangle_count"     -> (RelationalExt.qTriangleCount _),
    "q_ewma"               -> (StatsOps.qEwma _),
    "q_mad"                -> (StatsOps.qMad _),
    "q_benford"            -> (StatsOps.qBenford _),
    "q_ab_test"            -> (StatsOps.qAbTest _),
    "q_pagerank_iter"      -> (RelationalExt.qPagerankIter _),
    "q_time_to_event"      -> (AnalyticsOps.qTimeToEvent _),
    "q_term_drift"         -> (CurationOps.qTermDrift _),
    "q_tpch_q1"            -> (TpchOps.qTpchQ1 _),
    "q_tpch_q3"            -> (TpchOps.qTpchQ3 _),
    "q_tpch_q6"            -> (TpchOps.qTpchQ6 _),
    "q_fk_audit"           -> (QualityOps.qFkAudit _),
    "q_key_uniqueness"     -> (QualityOps.qKeyUniqueness _),
    "q_null_profile"       -> (QualityOps.qNullProfile _),
    "q_range_audit"        -> (QualityOps.qRangeAudit _),
    "q_order_reconcile"    -> (QualityOps.qOrderReconcile _),
    "q_freshness"          -> (QualityOps.qFreshness _),
    "q_window_nth"         -> (RelationalExt.qWindowNth _),
    "q_stream_rate"        -> (StreamingOps.qStreamRate _),
    "q_tpch_q5"            -> (TpchOps.qTpchQ5 _),
    "q_tpch_q4"            -> (TpchOps.qTpchQ4 _),
    "q_tpch_q7"            -> (TpchOps.qTpchQ7 _),
    "q_tpch_q8"            -> (TpchOps.qTpchQ8 _),
    "q_tpch_q9"            -> (TpchOps.qTpchQ9 _),
    "q_tpch_q10"           -> (TpchOps.qTpchQ10 _),
    "q_tpch_q13"           -> (TpchOps.qTpchQ13 _),
    "q_tpch_q14"           -> (TpchOps.qTpchQ14 _),
    "q_tpch_q15"           -> (TpchOps.qTpchQ15 _),
    "q_tpch_q17"           -> (TpchOps.qTpchQ17 _),
    "q_tpch_q18"           -> (TpchOps.qTpchQ18 _),
    "q_tpch_q19"           -> (TpchOps.qTpchQ19 _),
    "q_tpch_q22"           -> (TpchOps.qTpchQ22 _),
    "q_tpch_q2"            -> (TpchOps.qTpchQ2 _),
    "q_tpch_q11"           -> (TpchOps.qTpchQ11 _),
    "q_tpch_q12"           -> (TpchOps.qTpchQ12 _),
    "q_tpch_q16"           -> (TpchOps.qTpchQ16 _),
    "q_tpch_q20"           -> (TpchOps.qTpchQ20 _),
    "q_tpch_q21"           -> (TpchOps.qTpchQ21 _),
    "q_interval_overlap"   -> (AnalyticsOps.qIntervalOverlap _),
    "q_langid_eval"        -> (TextOps.qLangidEval _),
    "q_attribution"        -> (AnalyticsOps.qAttribution _),
    "q_repetition_score"   -> (CurationOps.qRepetitionScore _),
    "q_char_dist"          -> (CurationOps.qCharDist _),
    "q_mix_weights"        -> (CurationOps.qMixWeights _),
    "q_zipf_slope"         -> (CurationOps.qZipfSlope _),
    "q_kl_divergence"      -> (CurationOps.qKlDivergence _),
    "q_unigram_logprob"    -> (TextOps.qUnigramLogprob _),
    "q_pq_assign"          -> ((s, d) => VectorOps.qPqAssign(s, d)),
    "q_shard_assign"       -> (CurationOps.qShardAssign _),
    "q_crossval_folds"     -> (CurationOps.qCrossvalFolds _),
    "q_prefix_dedup"       -> (TextOps.qPrefixDedup _),
    "q_bloom_join"         -> (ScaleOps.qBloomJoin _),
    "q_countmin"           -> ((s, d) => ScaleOps.qCountMin(s, d)),
    "q_dim_stats"          -> (VectorOps.qDimStats _),
    "q_bpe_merge"          -> (TextOps.qBpeMerge _),
    "q_bpe_train"          -> (TextOps.qBpeTrain _),
    "q_unigram_train"      -> (TextOps.qUnigramTrain _),
    "q_rank_fusion"        -> ((s, d) => VectorOps.qRankFusion(s, d)),
    "q_semdedup"           -> ((s, d) => VectorOps.qSemDedup(s, d)),
    "q_embed_covariance"   -> (VectorOps.qEmbedCovariance _),
    "q_quality_classifier" -> (TextOps.qQualityClassifier _),
    "q_minhash_jaccard_est" -> (TextOps.qMinhashJaccardEst _),
    "q_link_predict"       -> (RelationalExt.qLinkPredict _),
    "q_kmeans_iter"        -> ((s, d) => VectorOps.qKmeansIter(s, d)),
    "q_survival_km"        -> (AnalyticsOps.qSurvivalKm _),
    "q_dup_spans"          -> (TextOps.qDupSpans _),
    "q_late_interaction"   -> (TextOps.qLateInteraction _),
    "q_dup_substring"      -> (TextOps.qDupSubstring _),
    "q_dedup_canonical"    -> (TextOps.qDedupCanonical _),
    "q_kanonymity"         -> (StatsOps.qKanonymity _),
    "q_l_diversity"        -> (StatsOps.qLDiversity _),
    "q_tcloseness"         -> (StatsOps.qTcloseness _),
    "q_als_step"           -> (MiningOps.qAlsStep _),
    "q_textrank"           -> ((s, dd) => TextOps.qTextrank(s, dd)),
    "q_holt_winters"       -> (StatsOps.qHoltWinters _),
    "q_hilbert_layout"     -> (ScaleOps.qHilbertLayout _),
    "q_rle_audit"          -> (ScaleOps.qRleAudit _),
    "q_assoc_rules"        -> (RelationalExt.qAssocRules _),
    "q_assoc_rules_frac"   -> (RelationalExt.qAssocRulesFrac _),
    "q_front_coding"       -> ((s, dd) => TextOps.qFrontCoding(s, dd)),
    "q_kruskal_wallis"     -> (MiningOps.qKruskalWallis _),
    "q_soundex_blocking"   -> (MiningOps.qSoundexBlocking _),
    "q_cochran_q"          -> (MiningOps.qCochranQ _),
    "q_mcnemar"            -> (MiningOps.qMcnemar _),
    "q_winsorize"          -> (StatsOps.qWinsorize _),
    "q_oov_rate"           -> (CurationOps.qOovRate _),
    "q_negative_sample"    -> (CurationOps.qNegativeSample _),
    "q_containment_dedup"  -> ((s, d) => TextOps.qContainmentDedup(s, d)),
    "q_containment_hybrid" -> ((s, d) => TextOps.qContainmentHybrid(s, d)),
    "q_domain_cap"         -> (CurationOps.qDomainCap _),
    "q_dataset_card"       -> (CurationOps.qDatasetCard _),
    "q_quality_funnel"     -> (CurationOps.qQualityFunnel _),
    "q_gopher_rules"       -> (CurationOps.qGopherRules _),
    "q_url_dedup"          -> (CurationOps.qUrlDedup _),
    "q_feature_hashing"    -> (CurationOps.qFeatureHashing _),
    "q_dp_noise"           -> (StatsOps.qDpNoise _),
    "q_ips_eval"           -> (AnalyticsOps.qIpsEval _),
    "q_pseudonymize"       -> (StatsOps.qPseudonymize _),
    "q_geohash_encode"     -> (StatsOps.qGeohashEncode _),
    "q_lr_step"            -> (VectorOps.qLrStep _),
    "q_ctr_smoothing"      -> (AnalyticsOps.qCtrSmoothing _),
    "q_dpp_join"           -> (Sinks.qDppJoin _),
    "q_hll_md5"            -> (ScaleOps.qHllMd5 _),
    "q_store_meta_cols"    -> (StreamingOps.qStoreMetaCols _),
    "q_datetime_parse"     -> (IngestQueries.qDatetimeParse _),
    "q_ua_parse"           -> (IngestQueries.qUaParse _),
    "q_skipgram"           -> (TextOps.qSkipgram _),
    "q_mmr_rerank"         -> (VectorOps.qMmrRerank _),
    "q_entry_exit"         -> (AnalyticsOps.qEntryExit _),
    "q_unicode_fold"       -> (TextOps.qUnicodeFold _),
    "q_rate_limit"         -> (AnalyticsOps.qRateLimit _),
    "q_num_parse"          -> (IngestQueries.qNumParse _),
    "q_robots_filter"      -> (CurationOps.qRobotsFilter _),
    "q_pipeline_e2e"       -> (CurationOps.qPipelineE2e _),
    "q_bloom_fpr"          -> (TextOps.qBloomFpr _),
    "q_yule_k"             -> (TextOps.qYuleK _),
    "q_rendezvous_resize"  -> (CurationOps.qRendezvousResize _),
    "q_pinball_loss"       -> (StatsOps.qPinballLoss _),
    "q_removal_effect"     -> (AnalyticsOps.qRemovalEffect _),
    "q_word_analogy"       -> (VectorOps.qWordAnalogy _),
    "q_incremental_dedup"  -> (TextOps.qIncrementalDedup _),
    "q_stream_neardup_lsh" -> ((s, d) => TextOps.qStreamNeardupLsh(s, d)),
    "q_stream_neardup_part" -> ((s, d) => TextOps.qStreamNeardupPart(s, d)),
    "q_encoding_audit"     -> (TextOps.qEncodingAudit _),
    "q_gram_novelty"       -> (TextOps.qGramNovelty _),
    "q_bigram_logprob"     -> (TextOps.qBigramLogprob _),
    "q_kneser_ney"         -> (TextOps.qKneserNey _),
    "q_delta_varint"       -> (TextOps.qDeltaVarint _),
    "q_skew_audit"         -> (ScaleOps.qSkewAudit _),
    "q_skew_join_aqe"      -> (ScaleOps.qSkewJoinAqe _),
    "q_event_pattern"      -> (AnalyticsOps.qEventPattern _),
    "q_embed_health"       -> (VectorOps.qEmbedHealth _),
    "q_knn_eval"           -> ((s, d) => VectorOps.qKnnEval(s, d)),
    "q_random_projection"  -> ((s, d) => VectorOps.qRandomProjection(s, d)),
    "q_compaction_plan"    -> ((s, d) => ScaleOps.qCompactionPlan(s, d)),
    "q_compaction_exec"    -> (ScaleOps.qCompactionExec _),
    "q_quantile_sketch"    -> (ScaleOps.qQuantileSketch _),
    "q_quantile_sketch_sql" -> (ScaleOps.qQuantileSketchSql _),
    "q_join_card_est"      -> (ScaleOps.qJoinCardEst _),
    "q_bootstrap_ci"       -> ((s, d) => StatsOps.qBootstrapCi(s, d)),
    "q_seasonal_dow"       -> (AnalyticsOps.qSeasonalDow _),
    "q_cusum_drift"        -> (AnalyticsOps.qCusumDrift _),
    "q_rolling_corr"       -> (AnalyticsOps.qRollingCorr _),
    "q_calibration"        -> (TextOps.qCalibration _),
    "q_weighted_sample"    -> (CurationOps.qWeightedSample _),
    "q_target_encoding"    -> (StatsOps.qTargetEncoding _),
    "q_group_scale"        -> (StatsOps.qGroupScale _),
    "q_split_leakage"      -> (StatsOps.qSplitLeakage _),
    "q_dedup_simhash_md5"  -> (TextOps.qDedupSimhashMd5 _),
    "q_window_topk"        -> (AnalyticsOps.qWindowTopk _),
    "q_psi_drift"          -> (AnalyticsOps.qPsiDrift _),
    "q_burst_detect"       -> (AnalyticsOps.qBurstDetect _),
    "q_heldout_perplexity" -> (TextOps.qHeldoutPerplexity _),
    "q_dup_profile"        -> (TextOps.qDupProfile _),
    "q_optimizer_stats"    -> (ScaleOps.qOptimizerStats _),
    "q_ivm_audit"          -> (ScaleOps.qIvmAudit _),
    "q_tail_index"         -> ((s, d) => StatsOps.qTailIndex(s, d)),
    "q_churn_features"     -> (AnalyticsOps.qChurnFeatures _),
    "q_equiheight_hist"    -> (ScaleOps.qEquiheightHist _),
    "q_confusion_matrix"   -> (TextOps.qConfusionMatrix _),
    "q_auc"                -> (StatsOps.qAuc _),
    "q_ks_test"            -> (StatsOps.qKsTest _),
    "q_anova"              -> (StatsOps.qAnova _),
    "q_mutual_info"        -> (AnalyticsOps.qMutualInfo _),
    "q_woe_iv"             -> (AnalyticsOps.qWoeIv _),
    "q_user_path"          -> (AnalyticsOps.qUserPath _),
    "q_runs_test"          -> (AnalyticsOps.qRunsTest _),
    "q_cohort_ltv"         -> (AnalyticsOps.qCohortLtv _),
    "q_tokenizer_fertility" -> (TextOps.qTokenizerFertility _),
    "q_pca_iter"           -> (VectorOps.qPcaIter _),
    "q_data_contract"      -> (QualityOps.qDataContract _),
    "q_stats_merge"        -> (StatsOps.qStatsMerge _),
    // exercises the custom physical operator (TopKPerKeyExec) through
    // the driver's DuckDB differential
    "q_topk_plan"          -> ((s, d) => {
      val counts = Tables.events(s, d)
        .select(((unix_timestamp(col("ts")) / 21600).cast("long") * 21600)
          .as("window_start"), col("user_id"))
        .groupBy("window_start", "user_id")
        .agg(count(lit(1)).as("n"))
      graft.plans.TopKPerKey.topKPerKey(counts, Seq("window_start"),
        Seq(("n", false), ("user_id", true)), 3)
        .orderBy("window_start", "user_id")
    }),
    "q_decision_stump"     -> (MiningOps.qDecisionStump _),
    "q_mann_kendall"       -> (MiningOps.qMannKendall _),
    "q_spearman"           -> (MiningOps.qSpearman _),
    "q_hhi"                -> (MiningOps.qHhi _),
    "q_window_distinct"    -> (MiningOps.qWindowDistinct _),
    "q_xml_parse"          -> (MiningOps.qXmlParse _),
    "q_blocking_keys"      -> (MiningOps.qBlockingKeys _),
    "q_jaro_winkler"       -> (MiningOps.qJaroWinkler _),
    "q_components_ccf"     -> (GraphOps.qComponentsCcf _),
    "q_recall_at_k"        -> ((s, d) => VectorOps.qRecallAtK(s, d)),
    "q_matryoshka_eval"    -> ((s, d) => VectorOps.qMatryoshkaEval(s, d)),
    "q_pr_curve"           -> (VectorOps.qPrCurve _),
    "q_lorenz"             -> (MiningOps.qLorenz _),
    "q_session_window"     -> (AnalyticsOps.qSessionWindow _),
    "q_theil_sen"          -> (MiningOps.qTheilSen _),
    "q_avro_roundtrip"     -> (Sinks.qAvroRoundtrip _),
    "q_clustering_coeff"   -> (RelationalExt.qClusteringCoeff _),
    "q_modularity"         -> (RelationalExt.qModularity _),
    "q_cramers_v"          -> (AnalyticsOps.qCramersV _),
    "q_cohen_kappa"        -> (TextOps.qCohenKappa _),
    "q_ohlc_bars"          -> (AnalyticsOps.qOhlcBars _),
    "q_bollinger"          -> (StatsOps.qBollinger _),
    "q_mrr"                -> (RelationalExt.qMrrAt10 _),
    "q_stream_enrich"      -> (StreamingOps.qStreamEnrich _),
    "q_changepoint"        -> (StatsOps.qChangepoint _),
    "q_forecast_baseline"  -> (StatsOps.qForecastBaseline _),
    "q_brier"              -> (TextOps.qBrier _),
    "q_sql_native"         -> (VectorOps.qSqlNative _),
    "q_ndcg"               -> (RelationalExt.qNdcgAt10 _),
    "q_temperature_sampling" -> ((s, d) => CurationOps.qTemperatureSampling(s, d)),
    "q_dbscan_core"        -> ((s, d) => RelationalExt.qDbscanCore(s, d)),
    "q_isotonic"           -> (MiningOps.qIsotonic _),
    "q_store_agg_pushdown" -> (FlightServe.qStoreAggPushdown _),
    "q_label_propagation"  -> (RelationalExt.qLabelPropagation _),
    "q_kendall_tau"        -> (MiningOps.qKendallTau _),
    "q_jackknife"          -> (StatsOps.qJackknife _),
    "q_store_runtime_prune" -> (FlightServe.qStoreRuntimePrune _),
    "q_store_topn_pushdown" -> (FlightServe.qStoreTopNPushdown _),
    "q_store_ts_prune"     -> (FlightServe.qStoreTsPrune _),
    "q_store_str_prune"    -> (FlightServe.qStoreStrPrune _),
    "q_store_dbl_prune"    -> (FlightServe.qStoreDblPrune _),
    "q_levene"             -> (StatsOps.qLevene _),
    "q_fano"               -> (StatsOps.qFano _),
    "q_lift_gains"         -> (AnalyticsOps.qLiftGains _),
    "q_punchcard"          -> (AnalyticsOps.qPunchcard _),
    "q_simpson_diversity"  -> ((s, d) => CurationOps.qSimpsonDiversity(s, d)),
    "q_abc_class"          -> (AnalyticsOps.qAbcClass _),
    "q_audience_overlap"   -> (AnalyticsOps.qAudienceOverlap _),
    "q_gap_histogram"      -> (AnalyticsOps.qGapHistogram _),
  )

  /** Shared by q_dedup_cluster and q_components_ccf - two different
    * distributed algorithms (min-label propagation vs CCF
    * star-contraction) gated against ONE recursive-CTE closure. */
  private lazy val dedupClusterOracle: String =
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr FROM documents
        |), shd AS (
        |  SELECT DISTINCT doc_id,
        |    UNNEST(list_transform(range(1, len(arr) - 1),
        |      i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS shingle
        |  FROM toks WHERE len(arr) >= 3
        |), mh AS (
        |  SELECT doc_id, p,
        |    min(('0x' || substr(md5(CAST(p // 2 AS VARCHAR) || ':' || shingle),
        |                        CAST(1 + 15 * (p % 2) AS INTEGER), 15))::BIGINT) AS mv
        |  FROM shd, range(8) t(p) GROUP BY doc_id, p
        |), bands AS (
        |  SELECT doc_id, p // 2 AS band,
        |    string_agg(CAST(mv AS VARCHAR), ',' ORDER BY p) AS sig
        |  FROM mh GROUP BY doc_id, p // 2
        |), pairs AS (
        |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        |), edges AS (
        |  SELECT da AS a, db AS b FROM pairs
        |  UNION ALL SELECT db, da FROM pairs
        |), reach(node, r) AS (
        |  SELECT DISTINCT a, a FROM edges
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.node
        |), comp AS (
        |  SELECT node, MIN(r) AS comp FROM reach GROUP BY node
        |)
        |SELECT c.node AS doc_id, c.comp,
        |       CAST(COUNT(*) OVER (PARTITION BY c.comp) AS BIGINT) AS cluster_size
        |FROM comp c
        |ORDER BY doc_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag""".stripMargin,

    "q_filter_predicate" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_tax
        |FROM lineitem
        |WHERE (l_quantity > 30 AND l_discount BETWEEN 0.02 AND 0.06)
        |   OR (l_returnflag = 'R' AND l_tax <= 0.03)
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_tax""".stripMargin,

    "q_limit_topn" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q_join_broadcast" ->
      """SELECT r_name, n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |       ROUND(SUM(c_acctbal), 2) AS total_acctbal,
        |       ROUND(AVG(c_acctbal) + 1e-9, 2) AS avg_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q_join_smj" ->
      """SELECT o_orderpriority, CAST((_s4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue, n_items
        |FROM (SELECT o_orderpriority,
        |             SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS _s4,
        |             CAST(COUNT(*) AS BIGINT) AS n_items
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |      GROUP BY o_orderpriority) t
        |ORDER BY o_orderpriority""".stripMargin,

    "q_join_semi_anti" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n, 'has_order' AS kind
        |FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |GROUP BY c_mktsegment
        |UNION ALL
        |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n, 'no_order' AS kind
        |FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |GROUP BY c_mktsegment
        |ORDER BY kind, c_mktsegment""".stripMargin,

    "q_agg_hash" ->
      """SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price,
        |       CAST((_s4 + 50) // 100 AS DOUBLE) / 100.0 AS sum_disc_price,
        |       avg_qty, avg_price, avg_disc, count_order
        |FROM (SELECT l_returnflag, l_linestatus,
        |             ROUND(SUM(l_quantity), 2) AS sum_qty,
        |             ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
        |             SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS _s4,
        |             ROUND(AVG(l_quantity), 2) AS avg_qty,
        |             ROUND(AVG(l_extendedprice), 2) AS avg_price,
        |             ROUND(AVG(l_discount), 2) AS avg_disc,
        |             CAST(COUNT(*) AS BIGINT) AS count_order
        |      FROM lineitem GROUP BY l_returnflag, l_linestatus) t
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_distinct" ->
      """SELECT o_orderstatus, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
        |       CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_agg_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |       COALESCE(l_linestatus, 'ALL') AS ls,
        |       ROUND(SUM(l_quantity), 2) AS sum_qty,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    "q_agg_cube" ->
      """SELECT COALESCE(n_name, 'ALL') AS nation,
        |       COALESCE(c_mktsegment, 'ALL') AS segment,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(SUM(c_acctbal), 2) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE(n_name, c_mktsegment)
        |ORDER BY nation, segment""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |       ROUND(SUM(CASE WHEN event_type = 'click' THEN value END), 2) AS click,
        |       ROUND(SUM(CASE WHEN event_type = 'error' THEN value END), 2) AS error,
        |       ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
        |       ROUND(SUM(CASE WHEN event_type = 'signup' THEN value END), 2) AS signup,
        |       ROUND(SUM(CASE WHEN event_type = 'view' THEN value END), 2) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_corr_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |       ROUND(o_totalprice / cust_avg, 4) AS ratio
        |FROM (SELECT o_orderkey, o_custkey, o_totalprice,
        |             AVG(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
        |      FROM orders) t
        |WHERE o_totalprice > cust_avg * 1.5
        |ORDER BY o_orderkey""".stripMargin,

    "q_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |           FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |                  MAX(value) AS click_value
        |           FROM events WHERE event_type = 'click'
        |           GROUP BY user_id, CAST(ts AS TIMESTAMP))
        |SELECT p.event_id, p.user_id, c.click_value AS asof_click_value
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,

    "q_range_join_bucketed" ->
      """WITH e AS (SELECT event_id, user_id,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |           FROM events)
        |SELECT a.user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
        |FROM e a JOIN e b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        | AND ABS(a.us - b.us) <= 60000000
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,

    "q_quantiles" ->
      """SELECT o_orderstatus,
        |       ROUND(quantile_cont(o_totalprice, 0.25), 2) AS p25,
        |       ROUND(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |       ROUND(quantile_cont(o_totalprice, 0.75), 2) AS p75,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_string_agg" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
        |       STRING_AGG(c_name, ',' ORDER BY c_name) AS names
        |FROM customer WHERE c_custkey <= 100
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_window_rank" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal, rn, rk FROM (
        |  SELECT c_custkey, c_mktsegment, c_acctbal,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn,
        |         CAST(RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rk
        |  FROM customer) t
        |WHERE rn <= 5 ORDER BY c_mktsegment, rn""".stripMargin,

    "q_window_frame" ->
      """SELECT o_orderkey, o_custkey,
        |       ROUND(SUM(o_totalprice) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 2) AS running_sum
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_window_lead" ->
      """SELECT o_orderkey, o_custkey,
        |       ROUND(COALESCE(LAG(o_totalprice, 1) OVER w, 0.0), 2) AS prev_price,
        |       ROUND(COALESCE(LEAD(o_totalprice, 1) OVER w, 0.0), 2) AS next_price,
        |       CAST(NTILE(4) OVER w AS BIGINT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_setops" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 1000
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders
        |EXCEPT
        |SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |ORDER BY custkey""".stripMargin,

    "q_scalar_funcs" ->
      """SELECT o_orderkey,
        |       UPPER(o_orderstatus) AS status_u,
        |       SUBSTRING(o_orderpriority, 1, 3) AS prio3,
        |       CAST(LENGTH(o_orderpriority) AS BIGINT) AS prio_len,
        |       CONCAT_WS('-', o_orderstatus, o_orderpriority) AS cat,
        |       CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
        |       CAST(MONTH(o_orderdate) AS BIGINT) AS mo,
        |       CAST(DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
        |       ROUND(o_totalprice / 3.0, 2) AS price_div,
        |       ROUND(SQRT(ABS(o_totalprice)), 2) AS price_sqrt
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_json_infer" ->
      """SELECT event_id,
        |       CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q_kafka_meta" ->
      """SELECT CAST(user_id AS VARCHAR) AS kafka_key,
        |       epoch_us(CAST(ts AS TIMESTAMP)) AS kafka_timestamp_us,
        |       event_id AS kafka_offset,
        |       CAST(event_id % 32 AS INTEGER) AS kafka_partition,
        |       props AS value
        |FROM events ORDER BY kafka_offset""".stripMargin,

    "q_type_promotion" ->
      """SELECT event_id,
        |       CASE WHEN event_id % 2 = 0 THEN CAST(k AS DOUBLE)
        |            ELSE CAST(k AS DOUBLE) + 0.5 END AS k
        |FROM (SELECT event_id,
        |             CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS BIGINT) AS k
        |      FROM events) t
        |ORDER BY event_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_copies
        |FROM (SELECT doc_id, text FROM documents
        |      UNION ALL SELECT doc_id + 1000000, text FROM documents) t
        |GROUP BY text ORDER BY doc_id""".stripMargin,

    "q_text_stats" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |       ROUND(AVG(n_tokens), 2) AS avg_tokens,
        |       CAST(SUM(n_chars_actual) AS BIGINT) AS total_chars
        |FROM (SELECT lang,
        |             array_length(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |             length(text) AS n_chars_actual
        |      FROM documents) t
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        |       CAST(array_length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
        |       CAST(array_length(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS re_tokens,
        |       CAST(CEIL(length(text) / 4.0) AS BIGINT) AS subword_est
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_quality_score" ->
      """SELECT doc_id,
        |       CAST(array_length(toks) AS BIGINT) AS n_tokens,
        |       FLOOR((stop_hits / n_tok) * 10000.0 + 0.5) / 10000.0 AS stopword_ratio,
        |       FLOOR((punct / GREATEST(n_char, 1)) * 10000.0 + 0.5) / 10000.0 AS punct_ratio,
        |       FLOOR((array_length(list_distinct(toks)) / n_tok) * 10000.0 + 0.5) / 10000.0 AS ttr,
        |       FLOOR((LEAST(n_tok / 100.0, 1.0) * 0.4
        |             + LEAST(stop_hits / n_tok * 5.0, 1.0) * 0.3
        |             + (1.0 - LEAST(punct / GREATEST(n_char, 1) * 10.0, 1.0)) * 0.3) * 10000.0 + 0.5) / 10000.0 AS quality
        |FROM (SELECT doc_id, toks,
        |             CAST(array_length(toks) AS DOUBLE) AS n_tok,
        |             CAST(array_length(list_filter(toks,
        |               x -> x IN ('the','a','of','and','to','in','is','it','for','on'))) AS DOUBLE) AS stop_hits,
        |             CAST(array_length(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) AS punct,
        |             CAST(length(text) AS DOUBLE) AS n_char
        |      FROM (SELECT doc_id, text,
        |                   regexp_split_to_array(trim(text), '\s+') AS toks
        |            FROM documents) a) b
        |ORDER BY doc_id""".stripMargin,

    "q_doc_chunking" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |           FROM documents),
        |g AS (SELECT doc_id, toks,
        |             UNNEST(range(0, GREATEST(CAST(CEIL((array_length(toks) - 20) / 10.0) AS BIGINT), 0) + 1)) AS chunk_id
        |      FROM t)
        |SELECT doc_id, chunk_id,
        |       array_to_string(toks[chunk_id*10+1 : chunk_id*10+20], ' ') AS chunk_text,
        |       CAST(LEAST(array_length(toks) - chunk_id*10, 20) AS BIGINT) AS chunk_len
        |FROM g ORDER BY doc_id, chunk_id""".stripMargin,

    "q_dataset_split" ->
      """SELECT doc_id,
        |       CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1') THEN 'val'
        |            WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('2','3') THEN 'test'
        |            ELSE 'train' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_clean" ->
      """SELECT doc_id, clean_text, CAST(length(clean_text) AS BIGINT) AS clean_len
        |FROM (SELECT doc_id,
        |             regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |                            ' +', ' ', 'g') AS clean_text
        |      FROM documents) t
        |ORDER BY doc_id""".stripMargin,

    "q_grouping_sets" ->
      """SELECT CASE WHEN l_returnflag IS NOT NULL THEN 'by_returnflag'
        |            ELSE 'by_linestatus' END AS dim,
        |       COALESCE(l_returnflag, l_linestatus) AS key,
        |       ROUND(SUM(l_quantity), 2) AS sum_qty,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY dim, key""".stripMargin,

    "q_join_outer" ->
      """SELECT COALESCE(c_custkey, o_custkey) AS custkey,
        |       COALESCE(c_mktsegment, 'UNKNOWN') AS segment,
        |       COALESCE(n_orders, 0) AS n_orders,
        |       ROUND(COALESCE(total_spent, 0.0), 2) AS total_spent
        |FROM (SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 0) c
        |FULL OUTER JOIN (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |                        ROUND(SUM(o_totalprice), 2) AS total_spent
        |                 FROM orders WHERE o_totalprice > 300000
        |                 GROUP BY o_custkey) o
        |  ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,

    "q_conditional_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |       CASE WHEN NULLIF(l_discount, 0.0) IS NULL THEN 'none'
        |            WHEN NULLIF(l_discount, 0.0) < 0.03 THEN 'low'
        |            ELSE 'high' END AS disc_band,
        |       ROUND(COALESCE(NULLIF(l_discount, 0.0), -1.0), 2) AS disc_or_sentinel,
        |       ROUND(LEAST(l_quantity, 25.0), 2) AS qty_capped,
        |       ROUND(GREATEST(l_extendedprice, 10000.0), 2) AS price_floor,
        |       CAST(l_returnflag IS NOT DISTINCT FROM l_linestatus AS INTEGER) AS flag_eq_status
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, disc_band, disc_or_sentinel,
        |         qty_capped, price_floor, flag_eq_status""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(MIN(o_totalprice), 2) AS lo,
        |       ROUND(MAX(o_totalprice), 2) AS hi
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_date_buckets" ->
      """SELECT CAST(epoch(date_trunc('month', CAST(o_orderdate AS TIMESTAMP))) AS BIGINT) AS month_start,
        |       CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
        |       ROUND(SUM(o_totalprice), 2) AS total
        |FROM orders GROUP BY month_start ORDER BY month_start""".stripMargin,

    "q_first_last" ->
      """SELECT o_orderkey, o_custkey,
        |       FIRST_VALUE(o_orderkey) OVER w AS first_order,
        |       LAST_VALUE(o_orderkey) OVER w AS last_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,

    "q_sample_hash" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE substring(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
        |                    CAST(l_linenumber AS VARCHAR)), 1, 1) IN ('0', '1')
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,

    "q_scalar_subquery" ->
      """WITH g AS (SELECT ROUND(AVG(o_totalprice), 2) AS global_avg FROM orders)
        |SELECT o_orderkey, o_totalprice, global_avg,
        |       ROUND(o_totalprice / global_avg, 4) AS ratio
        |FROM orders, g
        |WHERE o_totalprice > global_avg * 1.5
        |ORDER BY o_orderkey""".stripMargin,

    "q_stats_moments" ->
      """SELECT l_returnflag,
        |       ROUND(var_samp(l_quantity), 2) AS qty_var,
        |       ROUND(stddev_samp(l_extendedprice), 2) AS price_stddev,
        |       ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS qty_price_covar,
        |       ROUND(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_array_agg" ->
      """SELECT o_orderstatus,
        |       array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',') AS priorities,
        |       CAST(len(list_distinct(list(o_orderpriority))) AS BIGINT) AS n_prio,
        |       CAST(list_contains(list_distinct(list(o_orderpriority)), '1-URGENT') AS INTEGER) AS has_urgent
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_salted_agg" ->
      """SELECT event_type,
        |       ROUND(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 2) AS total_value,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_stopword_filter" ->
      """SELECT doc_id,
        |       array_to_string(list_filter(toks,
        |         x -> x NOT IN ('the','a','of','and','to','in','is','it','for','on')), ' ') AS filtered_text,
        |       CAST(len(toks) - len(list_filter(toks,
        |         x -> x NOT IN ('the','a','of','and','to','in','is','it','for','on'))) AS BIGINT) AS n_removed
        |FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |      FROM documents) t
        |ORDER BY doc_id""".stripMargin,

    "q_ngram_freq" ->
      """WITH t AS (SELECT regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
        |b AS (SELECT toks[i] || ' ' || toks[i+1] AS bigram
        |      FROM t, UNNEST(range(1, len(toks))) AS u(i))
        |SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
        |FROM b GROUP BY bigram
        |ORDER BY n DESC, bigram LIMIT 50""".stripMargin,

    "q_pii_redact" ->
      """WITH a AS (SELECT doc_id,
        |                  text || ' contact user' || CAST(doc_id AS VARCHAR)
        |                       || '@example.org phone 555-0'
        |                       || CAST(doc_id % 10000 AS VARCHAR) AS aug
        |           FROM documents)
        |SELECT doc_id,
        |       regexp_replace(regexp_replace(aug,
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |         '555-[0-9]+', '<PHONE>', 'g') AS redacted,
        |       CAST(len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |            + len(regexp_extract_all(aug, '555-[0-9]+')) AS BIGINT) AS n_pii
        |FROM a ORDER BY doc_id""".stripMargin,

    "q_sequence_pack" ->
      """WITH t AS (SELECT doc_id, source,
        |                  regexp_split_to_array(trim(text), '\s+') AS toks
        |           FROM documents),
        |c AS (SELECT doc_id, source,
        |             UNNEST(range(0, GREATEST(CAST(CEIL((len(toks) - 20) / 10.0) AS BIGINT), 0) + 1)) AS chunk_id,
        |             toks
        |      FROM t),
        |l AS (SELECT doc_id, source, chunk_id,
        |             CAST(LEAST(len(toks) - chunk_id*10, 20) AS BIGINT) AS chunk_len
        |      FROM c),
        |p AS (SELECT source, chunk_len,
        |             CAST(FLOOR((SUM(chunk_len) OVER (PARTITION BY source
        |                    ORDER BY doc_id, chunk_id ROWS UNBOUNDED PRECEDING)
        |                  - chunk_len) / 512.0) AS BIGINT) AS pack_id
        |      FROM l)
        |SELECT source, pack_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |       CAST(SUM(chunk_len) AS BIGINT) AS pack_tokens
        |FROM p GROUP BY source, pack_id
        |ORDER BY source, pack_id""".stripMargin,

    "q_format_sniff" ->
      """SELECT event_id,
        |       CASE WHEN regexp_matches(payload, '^\s*[\[{]') AND json_valid(payload)
        |            THEN 'json' ELSE 'binary' END AS format
        |FROM (SELECT event_id,
        |             CASE WHEN event_id % 7 = 0 THEN 'x' || props
        |                  WHEN event_id % 11 = 0 THEN '{' || props
        |                  ELSE props END AS payload
        |      FROM events) t
        |ORDER BY event_id""".stripMargin,

    "q_vector_norm" ->
      """SELECT vec_id,
        |       ROUND(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                                   CAST(embedding AS DOUBLE[]))), 6) AS l2_norm,
        |       ROUND(CAST(embedding[1] AS DOUBLE) /
        |             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                                   CAST(embedding AS DOUBLE[]))), 6) AS unit0
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q_vector_topk" ->
      """SELECT e.vec_id, e.label,
        |       ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS cos_sim
        |FROM embeddings e,
        |     (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY cos_sim DESC, e.vec_id LIMIT 20""".stripMargin,

    // Generated SQL: the fixed-seed hyperplane constants are embedded,
    // so bucket assignment + multiprobe + top-k replay end-to-end.
    "q_ann_lsh" -> VectorOps.annLshOracleSql(),
    "q_recall_at_k" -> VectorOps.recallAtKOracleSql(),

    "q_matryoshka_eval" ->
      """WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |qs AS (SELECT vec_id AS q_id, v AS qv FROM t WHERE vec_id < 10),
        |dims AS (SELECT UNNEST([16, 32, 64]) AS dim),
        |sc AS (SELECT qs.q_id, dims.dim, t.vec_id,
        |         ROUND(list_cosine_similarity(qs.qv, t.v), 6) AS full_sim,
        |         ROUND(list_cosine_similarity(
        |           qs.qv[1:dims.dim], t.v[1:dims.dim]), 6) AS trunc_sim
        |       FROM qs, dims, t WHERE t.vec_id <> qs.q_id),
        |rk AS (SELECT q_id, dim, vec_id,
        |         ROW_NUMBER() OVER (PARTITION BY q_id, dim
        |           ORDER BY full_sim DESC, vec_id) AS rn_full,
        |         ROW_NUMBER() OVER (PARTITION BY q_id, dim
        |           ORDER BY trunc_sim DESC, vec_id) AS rn_trunc
        |       FROM sc)
        |SELECT q_id, CAST(dim AS BIGINT) AS dim,
        |       CAST(SUM(CASE WHEN rn_full <= 10 AND rn_trunc <= 10
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS overlap,
        |       FLOOR(SUM(CASE WHEN rn_full <= 10 AND rn_trunc <= 10
        |                      THEN 1 ELSE 0 END) * 1.0 / 10
        |             * 10000.0 + 0.5) / 10000.0 AS overlap_ratio
        |FROM rk GROUP BY q_id, dim ORDER BY q_id, dim""".stripMargin,

    "q_pr_curve" ->
      """WITH s AS (
        |  SELECT CASE WHEN label = 0 THEN 1 ELSE 0 END AS pos,
        |         CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1e6 + 0.5)
        |              AS BIGINT) AS score_u
        |  FROM embeddings),
        |g AS (SELECT (CAST(i AS BIGINT) - 5) * 100000 AS thresh_u
        |      FROM range(11) t(i)),
        |c AS (SELECT g.thresh_u,
        |             CASE WHEN s.score_u >= g.thresh_u THEN 1 ELSE 0 END AS pred,
        |             s.pos
        |      FROM s, g),
        |a AS (SELECT thresh_u,
        |             CAST(SUM(pred * pos) AS BIGINT) AS tp,
        |             CAST(SUM(pred * (1 - pos)) AS BIGINT) AS fp,
        |             CAST(SUM((1 - pred) * pos) AS BIGINT) AS fn
        |      FROM c GROUP BY thresh_u)
        |SELECT FLOOR(thresh_u / 1e6 * 10000.0 + 0.5) / 10000.0 AS threshold,
        |       tp, fp, fn,
        |       FLOOR(tp * 1.0 / GREATEST(tp + fp, 1) * 10000.0 + 0.5)
        |         / 10000.0 AS precision,
        |       FLOOR(tp * 1.0 / GREATEST(tp + fn, 1) * 10000.0 + 0.5)
        |         / 10000.0 AS recall,
        |       FLOOR(2 * tp * 1.0 / GREATEST(2 * tp + fp + fn, 1)
        |             * 10000.0 + 0.5) / 10000.0 AS f1
        |FROM a ORDER BY threshold""".stripMargin,
    "q_ann_beam" -> VectorOps.annBeamOracleSql(),
    "q_ann_beam_clustered" -> VectorOps.annBeamClusteredOracleSql(),
    "q_stream_ann_ingest" -> VectorOps.annIngestOracleSql(),
    // the bucket-partitioned door at the 16-plane dial: the SAME
    // from-scratch replay algebra at nPlanes = 16 — the Spark side's
    // partition push must be invisible in the results
    "q_stream_ann_ingest_part" ->
      VectorOps.annIngestOracleSql(nPlanes = 16, probeEvery = 10),
    "q_ann_ivf" -> VectorOps.annIvfOracleSql(),
    "q_embed_cosine_dup" -> VectorOps.embedCosineDupOracleSql(),

    // The multimodal stub decoder is deterministic FNV-1a over the
    // payload bytes — and FNV-1a replays EXACTLY in DuckDB via
    // list_reduce over code points (fixture text is pure ASCII, so
    // code points == UTF-8 bytes) with HUGEINT mod-2^64 arithmetic
    // and explicit sign-extension for Scala's arithmetic >> shifts.
    // That turns the stub's determinism into a checkable contract.
    "q_media_codecs" -> MultimodalOps.mediaCodecsOracleSql,
    "q_audio_pcm_stats" -> MultimodalOps.audioPcmStatsOracleSql,
    "q_audio_adpcm_stats" -> MultimodalOps.audioAdpcmStatsOracleSql,
    "q_audio_ulaw_stats" -> MultimodalOps.audioUlawStatsOracleSql,
    "q_tcloseness" -> StatsOps.tclosenessOracleSql,
    "q_als_step" -> MiningOps.alsStepOracleSql,
    "q_textrank" -> TextOps.textrankOracleSql,
    "q_holt_winters" -> StatsOps.holtWintersOracleSql,
    "q_hilbert_layout" -> ScaleOps.hilbertLayoutOracleSql,
    "q_rle_audit" -> ScaleOps.rleAuditOracleSql,
    "q_assoc_rules" -> RelationalExt.assocRulesOracleSql,
    "q_assoc_rules_frac" -> RelationalExt.assocRulesFracOracleSql,
    "q_front_coding" -> TextOps.frontCodingOracleSql,
    "q_kruskal_wallis" -> MiningOps.kruskalWallisOracleSql,
    "q_soundex_blocking" -> MiningOps.soundexBlockingOracleSql,
    "q_cochran_q" -> MiningOps.cochranQOracleSql,
    "q_mcnemar" -> MiningOps.mcnemarOracleSql,
    "q_blocklist_scan" -> TextOps.blocklistScanOracleSql,
    "q_gif_pixel_stats" -> MultimodalOps.gifPixelStatsOracleSql,
    "q_hll_union_md5" -> ScaleOps.hllUnionMd5OracleSql,
    "q_phrase_query" -> TextOps.phraseQueryOracleSql,
    "q_collocation_g2" -> TextOps.collocationG2OracleSql,
    "q_merkle_diff" -> ScaleOps.merkleDiffOracleSql,
    "q_point_in_polygon" -> StatsOps.pointInPolygonOracleSql,
    "q_shapley_attribution" -> AnalyticsOps.shapleyAttributionOracleSql,
    "q_unigram_segment" -> TextOps.unigramSegmentOracleSql,
    "q_randomized_response" -> CurationOps.randomizedResponseOracleSql,
    "q_ransac_line" -> MiningOps.ransacLineOracleSql,
    "q_permutation_test" -> StatsOps.permutationTestOracleSql,
    "q_lsh_recall_audit" -> TextOps.lshRecallAuditOracleSql,
    "q_uplift_segments" -> StatsOps.upliftSegmentsOracleSql,
    "q_prefix_autocomplete" -> TextOps.prefixAutocompleteOracleSql,
    "q_join_shuffle_hash" ->
      """SELECT o_orderstatus,
        |  CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS price_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_pixel_dedup" -> MultimodalOps.pixelDedupOracleSql,

    "q_zone_map" ->
      """WITH priced AS (
        |  SELECT CAST(o_orderkey AS BIGINT) AS okey,
        |         CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |wz AS (SELECT okey // 1000 AS zone, MAX(cents) AS zmax,
        |              COUNT(*) AS zrows FROM priced GROUP BY 1),
        |cz AS (SELECT cents // 2500000 AS zone, MAX(cents) AS zmax,
        |              COUNT(*) AS zrows FROM priced GROUP BY 1),
        |g AS (SELECT (CAST(i AS BIGINT) + 1) * 5000000 AS thresh_cents
        |      FROM range(9) t(i)),
        |wa AS (SELECT thresh_cents,
        |         CAST(COUNT(*) AS BIGINT) AS write_zones,
        |         CAST(SUM(CASE WHEN zmax <= thresh_cents THEN 1 ELSE 0 END)
        |              AS BIGINT) AS write_zones_skipped,
        |         CAST(SUM(CASE WHEN zmax <= thresh_cents THEN zrows ELSE 0 END)
        |              AS BIGINT) AS write_rows_skipped,
        |         SUM(zrows) AS wr
        |       FROM wz, g GROUP BY 1),
        |ca AS (SELECT thresh_cents,
        |         CAST(COUNT(*) AS BIGINT) AS clustered_zones,
        |         CAST(SUM(CASE WHEN zmax <= thresh_cents THEN 1 ELSE 0 END)
        |              AS BIGINT) AS clustered_zones_skipped,
        |         CAST(SUM(CASE WHEN zmax <= thresh_cents THEN zrows ELSE 0 END)
        |              AS BIGINT) AS clustered_rows_skipped,
        |         SUM(zrows) AS cr
        |       FROM cz, g GROUP BY 1)
        |SELECT wa.thresh_cents,
        |       write_zones, write_zones_skipped, write_rows_skipped,
        |       FLOOR(write_rows_skipped * 1.0 / wr * 10000.0 + 0.5)
        |         / 10000.0 AS write_skip_ratio,
        |       clustered_zones, clustered_zones_skipped, clustered_rows_skipped,
        |       FLOOR(clustered_rows_skipped * 1.0 / cr * 10000.0 + 0.5)
        |         / 10000.0 AS clustered_skip_ratio
        |FROM wa JOIN ca USING (thresh_cents)
        |ORDER BY thresh_cents""".stripMargin,
    "q_multimodal_meta" -> (MultimodalOps.fnvOracleCommonSql +
      """
        |SELECT mime, CAST(COUNT(*) AS BIGINT) AS n_assets,
        |       CAST(SUM(byte_len) AS BIGINT) AS total_bytes,
        |       ROUND(AVG(w), 2) AS avg_width,
        |       ROUND(AVG(dur), 2) AS avg_duration_ms
        |FROM d GROUP BY mime ORDER BY mime""".stripMargin),

    "q_media_embed" -> MultimodalOps.mediaEmbedOracleSql,

    "q_frame_sample" -> (MultimodalOps.fnvOracleCommonSql +
      """,
        |f AS (SELECT asset_id, CAST(UNNEST(range(0, dur // 10000 + 1)) AS BIGINT) AS frame_no
        |      FROM d WHERE mime = 'video/mp4')
        |SELECT asset_id, frame_no, frame_no * 10000 AS ts_ms
        |FROM f ORDER BY asset_id, frame_no""".stripMargin),

    "q_ewma" ->
      """WITH t AS (SELECT event_id, user_id, value,
        |  LAG(value, 1) OVER w AS v1, LAG(value, 2) OVER w AS v2,
        |  LAG(value, 3) OVER w AS v3, LAG(value, 4) OVER w AS v4
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id))
        |SELECT event_id, user_id, ROUND(value, 2) AS value,
        |  ROUND((
        |     (CASE WHEN value IS NOT NULL THEN value * 1.0 ELSE 0.0 END
        |    + CASE WHEN v1 IS NOT NULL THEN v1 * 0.5 ELSE 0.0 END
        |    + CASE WHEN v2 IS NOT NULL THEN v2 * 0.25 ELSE 0.0 END
        |    + CASE WHEN v3 IS NOT NULL THEN v3 * 0.125 ELSE 0.0 END
        |    + CASE WHEN v4 IS NOT NULL THEN v4 * 0.0625 ELSE 0.0 END)
        |  / (CASE WHEN value IS NOT NULL THEN 1.0 ELSE 0.0 END
        |    + CASE WHEN v1 IS NOT NULL THEN 0.5 ELSE 0.0 END
        |    + CASE WHEN v2 IS NOT NULL THEN 0.25 ELSE 0.0 END
        |    + CASE WHEN v3 IS NOT NULL THEN 0.125 ELSE 0.0 END
        |    + CASE WHEN v4 IS NOT NULL THEN 0.0625 ELSE 0.0 END)), 4) AS ewma
        |FROM t ORDER BY event_id""".stripMargin,

    "q_mad" ->
      """WITH m AS (SELECT event_type, median(value) AS med FROM events GROUP BY 1),
        |a AS (SELECT e.event_type, m.med, abs(e.value - m.med) AS adev
        |      FROM events e JOIN m USING (event_type))
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(MAX(med), 4) AS median_value,
        |       ROUND(median(adev), 4) AS mad
        |FROM a GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_benford" ->
      """WITH d AS (SELECT substr(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), 1, 1) AS digit
        |           FROM orders),
        |t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM d)
        |SELECT digit, CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(COUNT(*) / total, 4) AS share,
        |       ROUND(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 4) AS benford
        |FROM d, t GROUP BY digit, total ORDER BY digit""".stripMargin,

    "q_ab_test" ->
      """WITH s AS (SELECT
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS DOUBLE) AS na,
        |  CAST(SUM(CASE WHEN event_type = 'click' AND value > 100 THEN 1 ELSE 0 END) AS DOUBLE) AS ca,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS DOUBLE) AS nb,
        |  CAST(SUM(CASE WHEN event_type = 'view' AND value > 100 THEN 1 ELSE 0 END) AS DOUBLE) AS cb
        |  FROM events WHERE event_type IN ('click', 'view'))
        |SELECT CAST(na AS BIGINT) AS n_click, CAST(ca AS BIGINT) AS conv_click,
        |       CAST(nb AS BIGINT) AS n_view, CAST(cb AS BIGINT) AS conv_view,
        |       ROUND(ca / na, 4) AS p_click,
        |       ROUND(cb / nb, 4) AS p_view,
        |       ROUND((ca / na - cb / nb) /
        |             sqrt(((ca + cb) / (na + nb)) * (1.0 - (ca + cb) / (na + nb)) *
        |                  (1.0 / na + 1.0 / nb)), 4) AS z
        |FROM s""".stripMargin,

    "q_pagerank_iter" ->
      """WITH e AS (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem),
        |o AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY 1)
        |SELECT e.dst AS suppkey, CAST(COUNT(*) AS BIGINT) AS in_deg,
        |       CAST(3000000 + 17 * SUM(1000000 // o.deg) AS BIGINT) AS rank_score
        |FROM e JOIN o USING (src)
        |GROUP BY e.dst
        |ORDER BY rank_score DESC, suppkey LIMIT 100""".stripMargin,

    "q_time_to_event" ->
      """WITH t AS (SELECT user_id,
        |  MIN(CASE WHEN event_type = 'signup' THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_s,
        |  MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_p
        |  FROM events GROUP BY user_id)
        |SELECT user_id, (t_p - t_s) AS micros_to_convert
        |FROM t
        |WHERE t_s IS NOT NULL AND t_p IS NOT NULL AND t_p >= t_s
        |ORDER BY user_id""".stripMargin,

    "q_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price,
        |       CAST((_s4 + 50) // 100 AS DOUBLE) / 100.0     AS sum_disc_price,
        |       CAST((_s6 + 5000) // 10000 AS DOUBLE) / 100.0 AS sum_charge,
        |       avg_qty, avg_price, avg_disc, count_order
        |FROM (SELECT l_returnflag, l_linestatus,
        |             CAST(SUM(l_quantity) AS BIGINT)  AS sum_qty,
        |             ROUND(SUM(l_extendedprice), 2)   AS sum_base_price,
        |             SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS _s4,
        |             SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) * (100 + CAST(ROUND(l_tax*100) AS BIGINT))) AS _s6,
        |             ROUND(AVG(l_quantity), 4)      AS avg_qty,
        |             ROUND(AVG(l_extendedprice), 4) AS avg_price,
        |             ROUND(AVG(l_discount), 4)      AS avg_disc,
        |             CAST(COUNT(*) AS BIGINT)       AS count_order
        |      FROM lineitem
        |      WHERE CAST(l_shipdate AS TIMESTAMP) <= TIMESTAMP '1998-09-02 00:00:00'
        |      GROUP BY l_returnflag, l_linestatus) t
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_tpch_q3" ->
      """SELECT l_orderkey,
        |       CAST((_s4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue,
        |       order_date
        |FROM (SELECT l_orderkey,
        |             SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS _s4,
        |             strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS order_date
        |      FROM customer
        |      JOIN orders   ON c_custkey = o_custkey
        |      JOIN lineitem ON l_orderkey = o_orderkey
        |      WHERE c_mktsegment = 'BUILDING'
        |        AND CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '1998-03-15 00:00:00'
        |        AND CAST(l_shipdate AS TIMESTAMP)  > TIMESTAMP '1998-03-15 00:00:00'
        |      GROUP BY l_orderkey, strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d')) t
        |ORDER BY revenue DESC, order_date, l_orderkey
        |LIMIT 10""".stripMargin,

    "q_tpch_q6" ->
      """SELECT CAST((_s4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue, n_lines
        |FROM (SELECT SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
        |                 * CAST(ROUND(l_discount*100) AS BIGINT)) AS _s4,
        |             CAST(COUNT(*) AS BIGINT) AS n_lines
        |      FROM lineitem
        |      WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01 00:00:00'
        |        AND CAST(l_shipdate AS TIMESTAMP) <  TIMESTAMP '1997-01-01 00:00:00'
        |        AND l_discount BETWEEN 0.03 AND 0.07
        |        AND l_quantity < 24) t""".stripMargin,

    "q_tpch_q5" ->
      """SELECT n_name, CAST((_s4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue, n_items
        |FROM (SELECT n_name,
        |             SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS _s4,
        |             CAST(COUNT(*) AS BIGINT) AS n_items
        |      FROM customer
        |      JOIN orders   ON c_custkey = o_custkey
        |      JOIN lineitem ON l_orderkey = o_orderkey
        |      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |      JOIN nation   ON c_nationkey = n_nationkey
        |      JOIN region   ON n_regionkey = r_regionkey
        |      WHERE r_name IN ('ASIA', 'EUROPE')
        |        AND CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01 00:00:00'
        |        AND CAST(o_orderdate AS TIMESTAMP) <  TIMESTAMP '1997-01-01 00:00:00'
        |      GROUP BY n_name) t
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q_tpch_q4" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND CAST(o_orderdate AS TIMESTAMP) <  TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND CAST(l_shipdate AS TIMESTAMP) > CAST(o_orderdate AS TIMESTAMP) + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
        |       CAST((_s4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue, n_items
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |             CAST(year(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT) AS l_year,
        |             SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS _s4,
        |             CAST(COUNT(*) AS BIGINT) AS n_items
        |      FROM supplier
        |      JOIN lineitem ON s_suppkey = l_suppkey
        |      JOIN orders   ON o_orderkey = l_orderkey
        |      JOIN customer ON c_custkey = o_custkey
        |      JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |      JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |      WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
        |          OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
        |        AND CAST(l_shipdate AS TIMESTAMP) BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                                              AND TIMESTAMP '1997-12-31 00:00:00'
        |      GROUP BY n1.n_name, n2.n_name, CAST(year(CAST(l_shipdate AS TIMESTAMP)) AS BIGINT)) t
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q_tpch_q8" ->
      """SELECT o_year, ROUND(CAST(nat_rev AS DOUBLE) / all_rev, 6) AS mkt_share, n_items
        |FROM (SELECT CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS o_year,
        |             SUM(CASE WHEN n2.n_name = 'NATION_1'
        |                 THEN CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
        |                 ELSE 0 END) AS nat_rev,
        |             SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS all_rev,
        |             CAST(COUNT(*) AS BIGINT) AS n_items
        |      FROM part
        |      JOIN lineitem ON p_partkey = l_partkey
        |      JOIN supplier ON s_suppkey = l_suppkey
        |      JOIN orders   ON l_orderkey = o_orderkey
        |      JOIN customer ON o_custkey = c_custkey
        |      JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |      JOIN region   ON n1.n_regionkey = r_regionkey
        |      JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |      WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
        |        AND CAST(o_orderdate AS TIMESTAMP) BETWEEN TIMESTAMP '1995-01-01 00:00:00'
        |                                               AND TIMESTAMP '1998-12-31 00:00:00'
        |      GROUP BY CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT)) t
        |ORDER BY o_year""".stripMargin,

    "q_tpch_q9" ->
      """SELECT nation, o_year,
        |       CAST((_s4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue, n_items
        |FROM (SELECT n_name AS nation,
        |             CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS o_year,
        |             SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS _s4,
        |             CAST(COUNT(*) AS BIGINT) AS n_items
        |      FROM part
        |      JOIN lineitem ON p_partkey = l_partkey
        |      JOIN supplier ON s_suppkey = l_suppkey
        |      JOIN orders   ON o_orderkey = l_orderkey
        |      JOIN nation   ON s_nationkey = n_nationkey
        |      WHERE p_name LIKE '%widget%'
        |      GROUP BY n_name, CAST(year(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT)) t
        |ORDER BY nation, o_year DESC""".stripMargin,

    "q_tpch_q10" ->
      """SELECT c_custkey, c_name,
        |       CAST((_s4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue,
        |       c_acctbal, n_name
        |FROM (SELECT c_custkey, c_name, c_acctbal, n_name,
        |             SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS _s4
        |      FROM customer
        |      JOIN orders   ON c_custkey = o_custkey
        |      JOIN lineitem ON l_orderkey = o_orderkey
        |      JOIN nation   ON c_nationkey = n_nationkey
        |      WHERE CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '1996-10-01 00:00:00'
        |        AND CAST(o_orderdate AS TIMESTAMP) <  TIMESTAMP '1997-01-01 00:00:00'
        |        AND l_returnflag = 'R'
        |      GROUP BY c_custkey, c_name, c_acctbal, n_name) t
        |ORDER BY _s4 DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q_tpch_q13" ->
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |      FROM customer
        |      LEFT JOIN orders ON c_custkey = o_custkey
        |                      AND o_orderpriority <> '5-LOW'
        |      GROUP BY c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_tpch_q14" ->
      """SELECT ROUND(100.0 * CAST(promo AS DOUBLE) / total, 4) AS promo_revenue,
        |       n_lines
        |FROM (SELECT SUM(CASE WHEN p_type = 'PROMO'
        |                 THEN CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
        |                 ELSE 0 END) AS promo,
        |             SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS total,
        |             CAST(COUNT(*) AS BIGINT) AS n_lines
        |      FROM lineitem
        |      JOIN part ON l_partkey = p_partkey
        |      WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1996-09-01 00:00:00'
        |        AND CAST(l_shipdate AS TIMESTAMP) <  TIMESTAMP '1996-10-01 00:00:00') t""".stripMargin,

    "q_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey AS supplier_no,
        |         SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS total
        |  FROM lineitem
        |  WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND CAST(l_shipdate AS TIMESTAMP) <  TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name,
        |       CAST((total + 50) // 100 AS DOUBLE) / 100.0 AS total_revenue
        |FROM supplier
        |JOIN rev ON s_suppkey = supplier_no
        |WHERE total = (SELECT MAX(total) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q_tpch_q17" ->
      """SELECT ROUND(CAST(_s AS DOUBLE) / 100.0 / 7.0, 2) AS avg_yearly, n_lines
        |FROM (SELECT SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS _s,
        |             CAST(COUNT(*) AS BIGINT) AS n_lines
        |      FROM lineitem
        |      JOIN part ON p_partkey = l_partkey
        |      JOIN (SELECT l_partkey AS pk, AVG(l_quantity) AS avg_qty
        |            FROM lineitem GROUP BY l_partkey) a ON pk = l_partkey
        |      WHERE p_brand = 'Brand#23'
        |        AND l_quantity < 0.2 * avg_qty) t""".stripMargin,

    "q_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey,
        |       strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS order_date,
        |       o_totalprice, sum_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN (SELECT l_orderkey AS lok, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING SUM(l_quantity) > 300) big ON o_orderkey = lok
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "q_tpch_q19" ->
      """SELECT CAST((_s4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue, n_lines
        |FROM (SELECT SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS _s4,
        |             CAST(COUNT(*) AS BIGINT) AS n_lines
        |      FROM lineitem
        |      JOIN part ON p_partkey = l_partkey
        |      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
        |         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
        |         OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)) t""".stripMargin,

    "q_tpch_q22" ->
      """SELECT n_name AS cntry, CAST(COUNT(*) AS BIGINT) AS numcust,
        |       CAST(SUM(cb) AS DOUBLE) / 100.0 AS totacctbal
        |FROM (SELECT c_custkey, c_nationkey,
        |             CAST(ROUND(c_acctbal*100) AS BIGINT) AS cb
        |      FROM customer) c
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE cb > (SELECT AVG(CAST(ROUND(c_acctbal*100) AS BIGINT))
        |            FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND CAST(o_orderdate AS TIMESTAMP) >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q_tpch_q2" ->
      """WITH ps AS (
        |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
        |         MIN(CAST(ROUND(l_extendedprice*100) AS BIGINT)
        |             // CAST(l_quantity AS BIGINT)) AS cost_c
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |eu AS (
        |  SELECT partkey, suppkey, cost_c, s_name, s_acctbal, n_name
        |  FROM ps JOIN supplier ON suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE')
        |SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name,
        |       p_partkey, p_brand,
        |       CAST(cost_c AS DOUBLE) / 100.0 AS supply_cost
        |FROM part JOIN eu ON p_partkey = partkey
        |WHERE p_size BETWEEN 10 AND 20
        |  AND cost_c = (SELECT MIN(e2.cost_c) FROM eu e2
        |                WHERE e2.partkey = p_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "q_tpch_q11" ->
      """WITH val AS (
        |  SELECT l_partkey AS partkey,
        |         SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
        |             * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS v
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation   ON s_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_3', 'NATION_7')
        |  GROUP BY l_partkey)
        |SELECT partkey, CAST((v + 50) // 100 AS DOUBLE) / 100.0 AS part_value
        |FROM val
        |WHERE v * 10000 > (SELECT SUM(v) FROM val)
        |ORDER BY part_value DESC, partkey""".stripMargin,

    "q_tpch_q12" ->
      """SELECT l_linestatus AS ship_class,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND CAST(l_shipdate AS TIMESTAMP) <  TIMESTAMP '1998-01-01 00:00:00'
        |  AND CAST(l_shipdate AS TIMESTAMP) >
        |      CAST(o_orderdate AS TIMESTAMP) + INTERVAL 30 DAY
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,

    "q_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#13'
        |  AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40, 45, 50)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q_tpch_q20" ->
      """WITH shipped AS (
        |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
        |         CAST(SUM(l_quantity) AS BIGINT) AS qty
        |  FROM lineitem
        |  WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND CAST(l_shipdate AS TIMESTAMP) <  TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY l_partkey, l_suppkey)
        |SELECT s_name, n_name, ROUND(s_acctbal, 2) AS s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (
        |  SELECT suppkey FROM shipped sh
        |  WHERE sh.qty * 2 > (SELECT SUM(t.qty) FROM shipped t
        |                      WHERE t.partkey = sh.partkey)
        |    AND (SELECT COUNT(*) FROM shipped c
        |         WHERE c.partkey = sh.partkey) >= 5)
        |ORDER BY s_name""".stripMargin,

    "q_tpch_q21" ->
      """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND CAST(l1.l_shipdate AS TIMESTAMP) >
        |      CAST(o_orderdate AS TIMESTAMP) + INTERVAL 30 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND CAST(l3.l_shipdate AS TIMESTAMP) >
        |                        CAST(l1.l_shipdate AS TIMESTAMP))
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin,

    "q_interval_overlap" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS s_us, event_id
        |           FROM events),
        |pts AS (SELECT user_id, s_us AS t, CAST(1 AS BIGINT) AS delta, event_id FROM e
        |        UNION ALL
        |        SELECT user_id, s_us + 300000000, CAST(-1 AS BIGINT), event_id FROM e),
        |c AS (SELECT user_id,
        |             SUM(delta) OVER (PARTITION BY user_id
        |               ORDER BY t, delta, event_id
        |               ROWS UNBOUNDED PRECEDING) AS conc
        |      FROM pts)
        |SELECT user_id, CAST(COUNT(*) / 2 AS BIGINT) AS n_events,
        |       CAST(MAX(conc) AS BIGINT) AS peak_concurrent
        |FROM c GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_fk_audit" ->
      """SELECT fk_edge, n_orphans, n_checked FROM (
        |  SELECT 'lineitem->orders' AS fk_edge,
        |         CAST((SELECT COUNT(*) FROM lineitem l
        |               WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                                 WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS n_orphans,
        |         CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_checked
        |  UNION ALL
        |  SELECT 'orders->customer',
        |         CAST((SELECT COUNT(*) FROM orders o
        |               WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                                 WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
        |         CAST((SELECT COUNT(*) FROM orders) AS BIGINT))
        |ORDER BY fk_edge""".stripMargin,

    "q_key_uniqueness" ->
      """WITH c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |                  CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
        |                  CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_dup_rows
        |           FROM (SELECT COUNT(*) AS n FROM customer GROUP BY c_custkey)),
        |l AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |             CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
        |             CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_dup_rows
        |      FROM (SELECT COUNT(*) AS n FROM lineitem GROUP BY l_orderkey, l_linenumber)),
        |o AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |             CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
        |             CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_dup_rows
        |      FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey))
        |SELECT 'customer.c_custkey' AS key, * FROM c
        |UNION ALL SELECT 'lineitem.(l_orderkey,l_linenumber)', * FROM l
        |UNION ALL SELECT 'orders.o_orderkey', * FROM o
        |ORDER BY key""".stripMargin,

    "q_null_profile" ->
      """WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_n,
        |  CAST(SUM(CASE WHEN trim(CAST(o_orderkey AS VARCHAR)) = '' THEN 1 ELSE 0 END) AS BIGINT) AS k_b,
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_n,
        |  CAST(SUM(CASE WHEN trim(CAST(o_custkey AS VARCHAR)) = '' THEN 1 ELSE 0 END) AS BIGINT) AS c_b,
        |  CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS s_n,
        |  CAST(SUM(CASE WHEN trim(CAST(o_orderstatus AS VARCHAR)) = '' THEN 1 ELSE 0 END) AS BIGINT) AS s_b,
        |  CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS t_n,
        |  CAST(SUM(CASE WHEN trim(CAST(o_totalprice AS VARCHAR)) = '' THEN 1 ELSE 0 END) AS BIGINT) AS t_b,
        |  CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS d_n,
        |  CAST(SUM(CASE WHEN trim(CAST(o_orderdate AS VARCHAR)) = '' THEN 1 ELSE 0 END) AS BIGINT) AS d_b,
        |  CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS p_n,
        |  CAST(SUM(CASE WHEN trim(CAST(o_orderpriority AS VARCHAR)) = '' THEN 1 ELSE 0 END) AS BIGINT) AS p_b
        |  FROM orders)
        |SELECT 'o_custkey' AS "column", c_n AS n_null, c_b AS n_blank, n_rows FROM a
        |UNION ALL SELECT 'o_orderdate', d_n, d_b, n_rows FROM a
        |UNION ALL SELECT 'o_orderkey', k_n, k_b, n_rows FROM a
        |UNION ALL SELECT 'o_orderpriority', p_n, p_b, n_rows FROM a
        |UNION ALL SELECT 'o_orderstatus', s_n, s_b, n_rows FROM a
        |UNION ALL SELECT 'o_totalprice', t_n, t_b, n_rows FROM a
        |ORDER BY "column"""".stripMargin,

    "q_range_audit" ->
      """WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS v0,
        |  CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
        |  CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
        |  CAST(SUM(CASE WHEN l_tax < 0 OR l_tax > 0.08 THEN 1 ELSE 0 END) AS BIGINT) AS v3,
        |  CAST(SUM(CASE WHEN CAST(l_shipdate AS DATE) < DATE '1995-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS v4
        |  FROM lineitem)
        |SELECT 'discount in [0,0.1]' AS rule, v2 AS n_violations, n_rows FROM a
        |UNION ALL SELECT 'price > 0', v1, n_rows FROM a
        |UNION ALL SELECT 'quantity in [1,50]', v0, n_rows FROM a
        |UNION ALL SELECT 'ship after 1994', v4, n_rows FROM a
        |UNION ALL SELECT 'tax in [0,0.08]', v3, n_rows FROM a
        |ORDER BY rule""".stripMargin,

    "q_order_reconcile" ->
      """WITH lt AS (SELECT l_orderkey AS o_orderkey,
        |                   SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) * (100 + CAST(ROUND(l_tax*100) AS BIGINT))) AS s6
        |            FROM lineitem GROUP BY 1)
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_orders FROM (
        |  SELECT CASE
        |    WHEN s6 IS NULL THEN 'no_lineitems'
        |    WHEN CAST(ROUND(o_totalprice * 100) AS BIGINT) = (s6 + 5000) // 10000
        |      THEN 'exact_cents'
        |    WHEN ABS(CAST(ROUND(o_totalprice * 100) AS BIGINT) * 10000 - s6)
        |         <= CAST(ROUND(o_totalprice * 100) AS BIGINT) * 100 THEN 'within_1pct'
        |    ELSE 'mismatch' END AS bucket
        |  FROM orders LEFT JOIN lt USING (o_orderkey))
        |GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_window_nth" ->
      """WITH t AS (SELECT c_mktsegment, c_custkey,
        |                  ROUND(c_acctbal, 2) AS acctbal,
        |                  ROUND(first_value(c_acctbal) OVER w, 2) AS top_bal,
        |                  ROUND(nth_value(c_acctbal, 2) OVER w, 2) AS second_bal,
        |                  CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |                    ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
        |           FROM customer
        |           WINDOW w AS (PARTITION BY c_mktsegment
        |                        ORDER BY c_acctbal DESC, c_custkey
        |                        ROWS UNBOUNDED PRECEDING))
        |SELECT c_mktsegment, c_custkey, acctbal, top_bal, second_bal, rn
        |FROM t WHERE rn <= 5
        |ORDER BY c_mktsegment, rn""".stripMargin,

    "q_stream_rate" ->
      """WITH h AS (SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS window_start,
        |                  event_type, CAST(COUNT(*) AS BIGINT) AS n
        |           FROM events GROUP BY 1, 2),
        |t AS (SELECT window_start, event_type, n,
        |             LAG(n) OVER (PARTITION BY event_type ORDER BY window_start) AS prev_n
        |      FROM h)
        |SELECT window_start, event_type, n, prev_n,
        |       CASE WHEN prev_n IS NOT NULL THEN n - prev_n END AS delta,
        |       CASE WHEN prev_n IS NOT NULL AND prev_n > 0
        |            THEN ROUND(CAST(n AS DOUBLE) / prev_n, 4) END AS rate_ratio
        |FROM t ORDER BY window_start, event_type""".stripMargin,

    "q_freshness" ->
      """WITH t AS (SELECT event_type,
        |                  MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS newest_us,
        |                  CAST(COUNT(*) AS BIGINT) AS n_events
        |           FROM events GROUP BY 1),
        |h AS (SELECT MAX(newest_us) AS hwm_us FROM t)
        |SELECT event_type, n_events, (hwm_us - newest_us) AS lag_us
        |FROM t, h ORDER BY event_type""".stripMargin,

    "q_term_drift" ->
      """WITH tok AS (SELECT doc_id % 2 = 0 AS half_a,
        |                    UNNEST(regexp_split_to_array(trim(text), '\s+')) AS w
        |             FROM documents),
        |f AS (SELECT w, CAST(SUM(CASE WHEN half_a THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
        |             CAST(SUM(CASE WHEN NOT half_a THEN 1 ELSE 0 END) AS BIGINT) AS c_b
        |      FROM tok GROUP BY w),
        |t AS (SELECT CAST(SUM(c_a) AS DOUBLE) AS n_a, CAST(SUM(c_b) AS DOUBLE) AS n_b FROM f)
        |SELECT w AS term, c_a, c_b,
        |       ROUND(LN(((c_a + 1.0) / (n_a + 1.0)) / ((c_b + 1.0) / (n_b + 1.0))), 4) AS drift
        |FROM f, t
        |WHERE c_a + c_b >= 10
        |ORDER BY abs(drift) DESC, term LIMIT 30""".stripMargin,

    "q_lang_id" ->
      """WITH t AS (SELECT doc_id, lang AS labeled_lang, text,
        |                  regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |           FROM documents),
        |s AS (SELECT doc_id, labeled_lang, text,
        |        CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','that','it','for'))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_en,
        |        CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein','mit','auf','zu'))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_de,
        |        CAST(len(list_filter(toks, x -> x IN ('le','la','les','et','est','un','une','dans','pour','que'))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_fr,
        |        CAST(len(list_filter(toks, x -> x IN ('el','la','los','y','es','un','una','en','por','que'))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_es
        |      FROM t),
        |u AS (SELECT doc_id, labeled_lang, text, sc['score'] AS score, sc['lang'] AS lng,
        |             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sc['score'] DESC, sc['lang'] DESC) AS rn
        |      FROM s, UNNEST([{'score': s_de, 'lang': 'de'}, {'score': s_en, 'lang': 'en'},
        |                      {'score': s_fr, 'lang': 'fr'}, {'score': s_es, 'lang': 'es'}]) AS z(sc))
        |SELECT doc_id, labeled_lang,
        |       CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |            WHEN score > 0 THEN lng ELSE 'und' END AS predicted_lang,
        |       ROUND(score, 4) AS confidence
        |FROM u WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q_langid_eval" ->
      """WITH t AS (SELECT doc_id, lang AS labeled_lang, text,
        |                  regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |           FROM documents),
        |s AS (SELECT doc_id, labeled_lang, text,
        |        CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','that','it','for'))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_en,
        |        CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein','mit','auf','zu'))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_de,
        |        CAST(len(list_filter(toks, x -> x IN ('le','la','les','et','est','un','une','dans','pour','que'))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_fr,
        |        CAST(len(list_filter(toks, x -> x IN ('el','la','los','y','es','un','una','en','por','que'))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_es
        |      FROM t),
        |u AS (SELECT doc_id, labeled_lang, text, sc['score'] AS score, sc['lang'] AS lng,
        |             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sc['score'] DESC, sc['lang'] DESC) AS rn
        |      FROM s, UNNEST([{'score': s_de, 'lang': 'de'}, {'score': s_en, 'lang': 'en'},
        |                      {'score': s_fr, 'lang': 'fr'}, {'score': s_es, 'lang': 'es'}]) AS z(sc)),
        |p AS (SELECT labeled_lang,
        |             CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |                  WHEN score > 0 THEN lng ELSE 'und' END AS predicted_lang
        |      FROM u WHERE rn = 1),
        |bl AS (SELECT labeled_lang AS lang, CAST(COUNT(*) AS BIGINT) AS n_labeled,
        |              CAST(SUM(CASE WHEN labeled_lang = predicted_lang THEN 1 ELSE 0 END) AS BIGINT) AS tp
        |       FROM p GROUP BY 1),
        |bp AS (SELECT predicted_lang AS lang, CAST(COUNT(*) AS BIGINT) AS n_predicted
        |       FROM p GROUP BY 1),
        |j AS (SELECT COALESCE(bl.lang, bp.lang) AS lang,
        |             COALESCE(n_labeled, 0) AS n_labeled,
        |             COALESCE(n_predicted, 0) AS n_predicted,
        |             COALESCE(tp, 0) AS tp
        |      FROM bl FULL OUTER JOIN bp ON bl.lang = bp.lang),
        |m AS (SELECT lang, n_labeled, n_predicted, tp,
        |             CASE WHEN n_predicted > 0 THEN FLOOR((tp / n_predicted) * 10000.0 + 0.5) / 10000.0 ELSE 0.0 END AS precision,
        |             CASE WHEN n_labeled > 0 THEN FLOOR((tp / n_labeled) * 10000.0 + 0.5) / 10000.0 ELSE 0.0 END AS recall
        |      FROM j)
        |SELECT lang, n_labeled, n_predicted, tp, precision, recall,
        |       CASE WHEN precision + recall > 0
        |            THEN FLOOR((2.0 * precision * recall / (precision + recall)) * 10000.0 + 0.5) / 10000.0
        |            ELSE 0.0 END AS f1
        |FROM m ORDER BY lang""".stripMargin,

    "q_repetition_score" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ts FROM documents),
        |g AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS gram
        |      FROM t, UNNEST(range(1, GREATEST(len(ts) - 2, 0) + 1)) AS u(i)),
        |a AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
        |             CAST(COUNT(DISTINCT gram) AS BIGINT) AS n_distinct
        |      FROM g GROUP BY doc_id)
        |SELECT doc_id, n_trigrams, n_distinct,
        |       FLOOR((1.0 - CAST(n_distinct AS DOUBLE) / n_trigrams) * 10000.0 + 0.5) / 10000.0 AS repetition
        |FROM a WHERE n_trigrams > 0 ORDER BY doc_id""".stripMargin,

    "q_char_dist" ->
      """WITH p AS (SELECT lang,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS alpha,
        |  CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS digit,
        |  CAST(len(regexp_extract_all(text, '\s')) AS BIGINT) AS ws
        |  FROM documents),
        |a AS (SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |             CAST(SUM(alpha) AS BIGINT) AS n_alpha,
        |             CAST(SUM(digit) AS BIGINT) AS n_digit,
        |             CAST(SUM(ws) AS BIGINT) AS n_ws
        |      FROM p GROUP BY lang)
        |SELECT lang, n_chars,
        |  FLOOR((CAST(n_alpha AS DOUBLE) / n_chars) * 10000.0 + 0.5) / 10000.0 AS alpha_share,
        |  FLOOR((CAST(n_digit AS DOUBLE) / n_chars) * 10000.0 + 0.5) / 10000.0 AS digit_share,
        |  FLOOR((CAST(n_ws AS DOUBLE) / n_chars) * 10000.0 + 0.5) / 10000.0 AS ws_share,
        |  FLOOR((CAST(n_chars - n_alpha - n_digit - n_ws AS DOUBLE) / n_chars) * 10000.0 + 0.5) / 10000.0 AS symbol_share
        |FROM a ORDER BY lang""".stripMargin,

    "q_mix_weights" ->
      """WITH b AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang),
        |t AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS total, CAST(COUNT(*) AS DOUBLE) AS k FROM b)
        |SELECT lang, n_docs,
        |  FLOOR((n_docs / total) * 10000.0 + 0.5) / 10000.0 AS actual_share,
        |  FLOOR((1.0 / k) * 10000.0 + 0.5) / 10000.0 AS target_share,
        |  FLOOR(((1.0 / k) / (n_docs / total)) * 10000.0 + 0.5) / 10000.0 AS weight
        |FROM b, t ORDER BY lang""".stripMargin,

    "q_attribution" ->
      """WITH t AS (SELECT user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts, event_id
        |           FROM events),
        |a AS (SELECT event_type, value,
        |             LAST_VALUE(CASE WHEN event_type IN ('click', 'view') THEN event_type END IGNORE NULLS)
        |               OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
        |      FROM t)
        |SELECT COALESCE(last_touch, 'none') AS channel,
        |       CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |       ROUND(SUM(value), 2) AS attributed_value
        |FROM a WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY channel""".stripMargin,

    "q_stream_sliding" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
        |x AS (SELECT (CAST(FLOOR(epoch(ts) / 1800) AS BIGINT) - i) * 1800 AS window_start,
        |             event_type, value
        |      FROM e, UNNEST([0, 1]) AS u(i))
        |SELECT window_start, event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(SUM(value), 2) AS total_value
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_stream_late_drop" ->
      """SELECT event_id, user_id,
        |       CAST(us < MAX(us) OVER (PARTITION BY user_id ORDER BY event_id
        |              ROWS UNBOUNDED PRECEDING) - 600000000 AS INTEGER) AS is_late
        |FROM (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |      FROM events) t
        |ORDER BY event_id""".stripMargin,

    "q_resample_ffill" ->
      """WITH e AS (SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, value
        |           FROM events),
        |h AS (SELECT user_id, hour, ROUND(SUM(value), 2) AS v FROM e GROUP BY 1, 2),
        |b AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM h GROUP BY 1),
        |g AS (SELECT user_id, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM b),
        |j AS (SELECT g.user_id, g.hour, h.v
        |      FROM g LEFT JOIN h ON g.user_id = h.user_id AND g.hour = h.hour)
        |SELECT user_id, CAST(epoch(hour) AS BIGINT) AS hour_start,
        |       LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hour
        |         ROWS UNBOUNDED PRECEDING) AS v_filled,
        |       CAST(v IS NULL AS INTEGER) AS is_gap
        |FROM j ORDER BY user_id, hour_start""".stripMargin,

    "q_tfidf" ->
      """WITH terms AS (SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\s+')) AS term
        |               FROM documents),
        |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM terms GROUP BY 1, 2),
        |df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM terms GROUP BY 1),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        |scored AS (SELECT doc_id, term,
        |                  ROUND(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 4) AS score
        |           FROM tf JOIN df USING (term), n),
        |ranked AS (SELECT doc_id, term, score,
        |                  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
        |                    ORDER BY score DESC, term) AS BIGINT) AS rn
        |           FROM scored)
        |SELECT doc_id, rn, term, score FROM ranked
        |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,

    "q_window_ntile" ->
      """WITH spend AS (SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS spend
        |               FROM orders GROUP BY 1),
        |j AS (SELECT c_custkey, c_nationkey, spend
        |      FROM customer JOIN spend ON c_custkey = o_custkey)
        |SELECT c_custkey, c_nationkey, spend,
        |       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        |       PERCENT_RANK() OVER w AS pr,
        |       CUME_DIST() OVER w AS cd
        |FROM j
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY spend, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_unpivot" ->
      """WITH long AS (
        |  SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem)
        |SELECT l_returnflag, measure, ROUND(SUM(val), 2) AS total,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM long GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_date_arith" ->
      """SELECT o_orderkey,
        |       strftime(dt, '%Y-%m-%d') AS d,
        |       CAST(year(dt) AS BIGINT) AS yr,
        |       CAST(quarter(dt) AS BIGINT) AS qtr,
        |       CAST((dayofweek(dt) + 6) % 7 AS BIGINT) AS dow_mon0,
        |       strftime(dt + 30, '%Y-%m-%d') AS plus30,
        |       strftime(last_day(dt), '%Y-%m-%d') AS eom,
        |       CAST(datediff('day', DATE '1995-01-01', dt) AS BIGINT) AS age_days
        |FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS dt FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "q_exists_subquery" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l2
        |                  WHERE l2.l_orderkey = o.o_orderkey AND l2.l_returnflag = 'R')
        |ORDER BY o_orderkey""".stripMargin,

    "q_regex_extract" ->
      """SELECT doc_id,
        |       regexp_extract(text, 's[a-z]+') AS first_s_word,
        |       regexp_replace(substr(text, 1, 40), '[aeiou]', '', 'g') AS devoweled,
        |       CAST((length(text) - length(replace(text, 'table', ''))) / 5 AS BIGINT) AS n_table
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_json_funcs" ->
      """SELECT event_id,
        |       json_extract_string(props, '$.k') AS k_str,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
        |       json_extract_string(props, '$.missing') AS absent,
        |       json_extract_string(props, '$.missing') IS NULL AS is_absent
        |FROM events ORDER BY event_id""".stripMargin,

    "q_schema_evolution" ->
      """SELECT event_id, user_id, value, NULL AS event_type
        |FROM events WHERE event_id % 2 = 0
        |UNION ALL
        |SELECT event_id, user_id, NULL, event_type
        |FROM events WHERE event_id % 2 = 1
        |ORDER BY event_id""".stripMargin,

    "q_partition_prune" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(SUM(value), 2) AS total_value,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events WHERE event_type IN ('click', 'purchase')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_stream_join" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
        |       CAST(floor(epoch(CAST(p.ts AS TIMESTAMP))) - floor(epoch(CAST(c.ts AS TIMESTAMP))) AS BIGINT) AS lag_secs
        |FROM events c
        |JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
        | AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
        |ORDER BY click_id, purchase_id""".stripMargin,

    "q_stream_dedup" ->
      """SELECT DISTINCT event_id, user_id, value
        |FROM (SELECT event_id, user_id, value FROM events
        |      UNION ALL SELECT event_id, user_id, value FROM events) t
        |ORDER BY event_id""".stripMargin,

    "q_stream_tumbling" ->
      """SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS window_start,
        |       event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(SUM(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_stream_session_ttl" ->
      """WITH t AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |         CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) IS NULL
        |                OR CAST(ts AS TIMESTAMP) - LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) >= INTERVAL 4 HOUR
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, value,
        |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM t)
        |SELECT user_id, CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS session_start,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       ROUND(SUM(value), 2) AS session_value
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin,

    "q_buffer_eviction" ->
      """SELECT event_id, user_id FROM (
        |  SELECT event_id, user_id,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |           ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn <= 50 ORDER BY event_id""".stripMargin,

    "q_window_range_frame" ->
      """SELECT o_orderkey, o_custkey,
        |       ROUND(SUM(o_totalprice) OVER w, 2) AS range_sum_30d,
        |       CAST(COUNT(*) OVER w AS BIGINT) AS n_in_range
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,

    "q_grouping_id" ->
      """SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       COALESCE(l_returnflag,'ALL') AS rf, COALESCE(l_linestatus,'ALL') AS ls,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, rf, ls""".stripMargin,

    "q_setops_all" ->
      """WITH a AS (SELECT o_custkey AS custkey FROM orders),
        |     x AS (SELECT custkey FROM a EXCEPT ALL SELECT c_custkey FROM customer),
        |     i AS (SELECT custkey FROM a INTERSECT ALL
        |           SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
        |SELECT 'except_all' AS kind, custkey, CAST(COUNT(*) AS BIGINT) AS n FROM x GROUP BY 2
        |UNION ALL
        |SELECT 'intersect_all' AS kind, custkey, CAST(COUNT(*) AS BIGINT) AS n FROM i GROUP BY 2
        |ORDER BY kind, custkey""".stripMargin,

    "q_argmax" ->
      """WITH r AS (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice,
        |         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |           ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
        |         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |           ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
        |  FROM orders),
        |am AS (SELECT o_orderstatus,
        |              MAX(CASE WHEN rmax=1 THEN o_orderkey END) AS max_price_order,
        |              MAX(CASE WHEN rmin=1 THEN o_orderkey END) AS min_price_order,
        |              ROUND(MAX(o_totalprice),2) AS max_price,
        |              ROUND(MIN(o_totalprice),2) AS min_price
        |       FROM r GROUP BY 1),
        |md AS (SELECT o_orderstatus, o_orderpriority AS top_prio FROM (
        |         SELECT o_orderstatus, o_orderpriority,
        |                ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |                  ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
        |         FROM orders GROUP BY 1,2) t WHERE rn=1)
        |SELECT am.o_orderstatus, max_price_order, min_price_order,
        |       max_price, min_price, top_prio
        |FROM am JOIN md USING (o_orderstatus) ORDER BY o_orderstatus""".stripMargin,

    "q_bitwise_funcs" ->
      """SELECT event_type,
        |       CAST(bit_and(user_id | 4096) AS BIGINT) AS band,
        |       CAST(bit_or(user_id) AS BIGINT) AS bor,
        |       CAST(bit_xor(user_id * event_id) AS BIGINT) AS bxor,
        |       CAST(SUM(bit_count(user_id)) AS BIGINT) AS total_bits,
        |       CAST(MAX(user_id << 2) AS BIGINT) AS max_shl
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_interval_arith" ->
      """SELECT o_orderkey,
        |       strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
        |       strftime(last_day(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH), '%Y-%m-%d') AS next_eom,
        |       CAST((year(CAST(o_orderdate AS DATE)) - 1995) * 12
        |            + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS months_since_1995,
        |       strftime(date_trunc('quarter', CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS qtr_start,
        |       CAST(datediff('day', CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE),
        |                     CAST(o_orderdate AS DATE)) AS BIGINT) AS day_in_qtr
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_decimal_arith" ->
      """SELECT l_returnflag,
        |       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |                      * (1 - CAST(l_discount AS DECIMAL(6,4)))
        |                      * (1 + CAST(l_tax AS DECIMAL(6,4)))) AS DOUBLE), 2) AS total_charge,
        |       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2) AS total_qty,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_fuzzy_match" ->
      """SELECT c_custkey,
        |       CAST(levenshtein(lower(c_name), 'customer#000000000') AS BIGINT) AS lev_canon,
        |       CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS lev_seg
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_funnel" ->
      """WITH v AS (SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t1
        |           FROM events WHERE event_type='view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t2
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type='click' AND CAST(e.ts AS TIMESTAMP) >= v.t1
        |        AND CAST(e.ts AS TIMESTAMP) <= v.t1 + INTERVAL 1 DAY GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t3
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type='purchase' AND CAST(e.ts AS TIMESTAMP) >= c.t2
        |        AND CAST(e.ts AS TIMESTAMP) <= c.t2 + INTERVAL 1 DAY GROUP BY 1)
        |SELECT CAST(1 AS BIGINT) AS stage, 'view' AS name,
        |       CAST(COUNT(*) AS BIGINT) AS n_users FROM v
        |UNION ALL SELECT 2, 'view>click', CAST(COUNT(*) AS BIGINT) FROM c
        |UNION ALL SELECT 3, 'view>click>purchase', CAST(COUNT(*) AS BIGINT) FROM p
        |ORDER BY stage""".stripMargin,

    "q_retention_cohort" ->
      """WITH e AS (SELECT DISTINCT user_id,
        |                  date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk FROM events),
        |c AS (SELECT user_id, MIN(wk) AS cohort FROM e GROUP BY 1)
        |SELECT CAST(epoch(cohort) AS BIGINT) AS cohort_start,
        |       CAST(datediff('day', CAST(cohort AS DATE), CAST(wk AS DATE)) / 7 AS BIGINT) AS week_offset,
        |       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
        |FROM e JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_cumulative_distinct" ->
      """WITH f AS (SELECT user_id, MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS first_day
        |           FROM events GROUP BY 1),
        |d AS (SELECT first_day, CAST(COUNT(*) AS BIGINT) AS n_new FROM f GROUP BY 1)
        |SELECT CAST(epoch(CAST(first_day AS TIMESTAMP)) AS BIGINT) AS day_start, n_new,
        |       CAST(SUM(n_new) OVER (ORDER BY first_day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        |FROM d ORDER BY day_start""".stripMargin,

    "q_cdc_upsert" ->
      """SELECT user_id, last_event_id, ROUND(last_value, 2) AS last_value
        |FROM (SELECT user_id, event_id AS last_event_id, value AS last_value, event_type,
        |             ROW_NUMBER() OVER (PARTITION BY user_id
        |               ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,

    "q_map_funcs" ->
      """WITH c AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
        |           FROM events GROUP BY 1,2)
        |SELECT user_id,
        |       string_agg(event_type, ',' ORDER BY event_type) AS types,
        |       CAST(COUNT(*) AS BIGINT) AS n_types,
        |       CAST(COALESCE(SUM(CASE WHEN event_type='click' THEN n END), 0) AS BIGINT) AS n_click,
        |       CAST(COALESCE(SUM(CASE WHEN event_type='purchase' THEN n END), 0) AS BIGINT) AS n_purchase
        |FROM c GROUP BY 1 ORDER BY user_id""".stripMargin,

    "q_higher_order_funcs" ->
      """SELECT doc_id,
        |       CAST(len(list_filter(toks, t -> length(t) > 4)) AS BIGINT) AS n_long,
        |       CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS total_len,
        |       CAST(list_contains(toks, 'the') AS INTEGER) AS has_the,
        |       array_to_string(list_transform(toks[1:3], t -> upper(t)), ' ') AS first3_upper
        |FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents) t
        |ORDER BY doc_id""".stripMargin,

    "q_posexplode" ->
      """SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS token
        |FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |      FROM documents WHERE doc_id < 50) t,
        |     UNNEST(range(1, LEAST(len(toks), 10) + 1)) AS u(i)
        |ORDER BY doc_id, pos""".stripMargin,

    "q_char_ngram" ->
      """WITH t AS (SELECT regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |                                 ' +', ' ', 'g') AS ct FROM documents),
        |g AS (SELECT substring(ct, i, 3) AS gram
        |      FROM t, UNNEST(range(1, GREATEST(length(ct) - 1, 1))) AS u(i))
        |SELECT gram, CAST(COUNT(*) AS BIGINT) AS n
        |FROM g WHERE length(gram) = 3
        |GROUP BY 1 ORDER BY n DESC, gram LIMIT 30""".stripMargin,

    "q_url_parse" ->
      """WITH u AS (SELECT event_id,
        |                  'https://analytics.example.com/t/' || event_type
        |                  || '?user=' || CAST(user_id AS VARCHAR)
        |                  || '&v=' || CAST(event_id % 100 AS VARCHAR) AS url
        |           FROM events)
        |SELECT event_id,
        |       regexp_extract(url, '^https?://([^/]+)', 1) AS host,
        |       regexp_extract(url, '^https?://[^/]+(/[^?]*)', 1) AS path,
        |       regexp_extract(url, '[?&]user=([^&]*)', 1) AS user_param,
        |       regexp_extract(url, '[?&]v=([^&]*)', 1) AS v_param
        |FROM u ORDER BY event_id""".stripMargin,

    "q_stream_outer_join" ->
      """SELECT c.event_id AS click_id, COALESCE(p.event_id, -1) AS purchase_id, c.user_id,
        |       CAST(CASE WHEN p.event_id IS NULL THEN -1
        |            ELSE floor(epoch(CAST(p.ts AS TIMESTAMP))) - floor(epoch(CAST(c.ts AS TIMESTAMP)))
        |            END AS BIGINT) AS lag_secs
        |FROM (SELECT * FROM events WHERE event_type='click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type='purchase') p
        |  ON c.user_id = p.user_id
        | AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
        | AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
        |ORDER BY click_id, purchase_id""".stripMargin,

    "q_array_setops" ->
      """WITH t AS (SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\s+')) AS toks
        |           FROM documents),
        |s AS (SELECT ['the','a','of','and','to','in','is','it','for','on'] AS sw)
        |SELECT doc_id,
        |       COALESCE(array_to_string(list_sort(list_intersect(toks, sw)), ','), '') AS common,
        |       CAST(len(list_intersect(toks, sw)) AS BIGINT) AS n_common,
        |       CAST(len(list_filter(toks, x -> NOT list_contains(sw, x))) AS BIGINT) AS n_only_doc,
        |       CAST(len(list_distinct(list_concat(toks, sw))) AS BIGINT) AS n_union
        |FROM t, s ORDER BY doc_id""".stripMargin,

    "q_string_funcs2" ->
      """SELECT c_custkey,
        |       split_part(c_name, '#', 1) AS name_head,
        |       split_part(c_name, '#', 2) AS name_num,
        |       CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
        |       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS id_pad,
        |       rpad(c_mktsegment, 12, '.') AS seg_pad,
        |       reverse(c_mktsegment) AS seg_rev,
        |       repeat('ab', 3) AS rep,
        |       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lowvowel
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_try_arith" ->
      """SELECT event_id,
        |       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_ok,
        |       TRY_CAST('x' || json_extract_string(props, '$.k') AS BIGINT) AS k_bad,
        |       ROUND(value / NULLIF(CAST(event_id % 5 AS DOUBLE), 0.0), 4) AS div_or_null,
        |       CAST(value / NULLIF(CAST(event_id % 5 AS DOUBLE), 0.0) IS NULL AS INTEGER) AS was_zero
        |FROM events ORDER BY event_id""".stripMargin,

    "q_json_array_explode" ->
      """WITH j AS (SELECT event_id,
        |                  '["' || event_type || '","u' || CAST(user_id AS VARCHAR) || '","v' ||
        |                  CAST(event_id % 7 AS VARCHAR) || '"]' AS payload
        |           FROM events WHERE event_id < 2000)
        |SELECT event_id, CAST(i - 1 AS BIGINT) AS pos,
        |       json_extract_string(payload, '$[' || CAST(i - 1 AS VARCHAR) || ']') AS tag
        |FROM j, UNNEST(range(1, 4)) AS u(i)
        |ORDER BY event_id, pos""".stripMargin,

    "q_lag_ignore_nulls" ->
      """SELECT event_id, user_id,
        |       ROUND(COALESCE(LAG(pval IGNORE NULLS) OVER (PARTITION BY user_id
        |         ORDER BY CAST(ts AS TIMESTAMP), event_id), -1.0), 2) AS prev_purchase
        |FROM (SELECT event_id, user_id, ts,
        |             CASE WHEN event_type = 'purchase' THEN value END AS pval
        |      FROM events) t
        |ORDER BY event_id""".stripMargin,

    "q_cross_join" ->
      """SELECT r.r_name, n.n_name,
        |       CAST(n.n_regionkey = r.r_regionkey AS INTEGER) AS is_member
        |FROM region r CROSS JOIN nation n
        |ORDER BY r_name, n_name""".stripMargin,

    "q_quantile_disc" ->
      """WITH r AS (SELECT o_orderstatus, o_totalprice,
        |                  ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |                    ORDER BY o_totalprice, o_orderkey) AS rn,
        |                  COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
        |           FROM orders)
        |SELECT o_orderstatus,
        |       ROUND(MAX(CASE WHEN rn = CAST(CEIL(0.25 * n) AS BIGINT) THEN o_totalprice END), 2) AS p25,
        |       ROUND(MAX(CASE WHEN rn = CAST(CEIL(0.50 * n) AS BIGINT) THEN o_totalprice END), 2) AS p50,
        |       ROUND(MAX(CASE WHEN rn = CAST(CEIL(0.75 * n) AS BIGINT) THEN o_totalprice END), 2) AS p75,
        |       CAST(MAX(n) AS BIGINT) AS n
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_bool_aggs" ->
      """SELECT l_returnflag,
        |       CAST(count_if(l_quantity > 25) AS BIGINT) AS n_bulk,
        |       CAST(bool_and(l_quantity > 0) AS INTEGER) AS all_positive,
        |       CAST(bool_or(l_discount > 0.09) AS INTEGER) AS any_deep_discount,
        |       CAST(bool_and(l_tax <= 0.08) AS INTEGER) AS all_low_tax
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_regression" ->
      """SELECT l_returnflag,
        |       ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |       ROUND(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
        |       ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_skew_kurt" ->
      """WITH mu AS (SELECT l_returnflag, AVG(l_extendedprice) AS m
        |            FROM lineitem GROUP BY 1)
        |SELECT l_returnflag,
        |       ROUND(AVG(POWER(l_extendedprice - m, 3))
        |             / POWER(AVG(POWER(l_extendedprice - m, 2)), 1.5), 4) AS skew,
        |       ROUND(AVG(POWER(l_extendedprice - m, 4))
        |             / POWER(AVG(POWER(l_extendedprice - m, 2)), 2) - 3, 4) AS kurt,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem JOIN mu USING (l_returnflag)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_variant_json" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
        |       json_extract_string(props, '$.k') AS k_str,
        |       CAST(json_extract(props, '$.k') IS NOT NULL AS INTEGER) AS has_k,
        |       CAST(json_extract(props, '$.zzz') IS NOT NULL AS INTEGER) AS has_zzz
        |FROM events ORDER BY event_id""".stripMargin,

    "q_lateral_topk" ->
      """SELECT r.r_name, t.n_name, t.rk
        |FROM region r, LATERAL (
        |  SELECT n_name, CAST(ROW_NUMBER() OVER (ORDER BY n_name) AS BIGINT) AS rk
        |  FROM nation WHERE n_regionkey = r.r_regionkey
        |  ORDER BY n_name LIMIT 2) t
        |ORDER BY r_name, rk""".stripMargin,

    "q_star_join_having" ->
      """SELECT n_name, CAST((_s4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue, n_items
        |FROM (SELECT n_name,
        |             SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS _s4,
        |             CAST(COUNT(*) AS BIGINT) AS n_items
        |      FROM lineitem
        |      JOIN orders   ON l_orderkey = o_orderkey
        |      JOIN customer ON o_custkey  = c_custkey
        |      JOIN nation   ON c_nationkey = n_nationkey
        |      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |      GROUP BY n_name) t
        |WHERE CAST((_s4 + 50) // 100 AS DOUBLE) / 100.0 > 10000000
        |ORDER BY n_name""".stripMargin,

    "q_collation_group" ->
      """WITH m AS (SELECT c_custkey,
        |                  CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
        |                       ELSE c_mktsegment END AS seg
        |           FROM customer)
        |SELECT lower(seg) AS seg_ci, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_case_variants
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_null_ordering" ->
      """SELECT o_orderkey, disc_price
        |FROM (SELECT o_orderkey,
        |             CASE WHEN o_orderkey % 13 = 0 THEN NULL
        |                  ELSE ROUND(o_totalprice, 2) END AS disc_price
        |      FROM orders)
        |ORDER BY disc_price DESC NULLS FIRST, o_orderkey
        |LIMIT 200""".stripMargin,

    "q_pagination" ->
      """SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 50 OFFSET 100""".stripMargin,

    "q_null_aware_anti" ->
      """SELECT
        |  (SELECT count(*) FROM part WHERE p_partkey NOT IN
        |     (SELECT l_partkey FROM lineitem
        |      WHERE l_shipdate < TIMESTAMP '1995-03-01')) AS n_never_early_shipped,
        |  (SELECT count(*) FROM part WHERE p_partkey NOT IN
        |     (SELECT CASE WHEN l_quantity > 49 THEN NULL ELSE l_partkey END
        |        FROM lineitem
        |       WHERE l_shipdate < TIMESTAMP '1995-03-01')) AS n_with_null_probe""".stripMargin,

    "q_relational_division" ->
      """WITH pr AS (SELECT count(DISTINCT o_orderpriority) AS np FROM orders)
        |SELECT o_custkey AS custkey,
        |       CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_prio
        |FROM orders GROUP BY 1
        |HAVING count(DISTINCT o_orderpriority) = (SELECT np FROM pr)
        |ORDER BY 1""".stripMargin,

    "q_window_cume" ->
      """SELECT o_orderkey,
        |  ROUND(cume_dist() OVER w, 4) AS cd,
        |  ROUND(percent_rank() OVER w, 4) AS pr,
        |  ROUND(nth_value(o_totalprice, 2) OVER
        |    (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey LIMIT 300""".stripMargin,

    "q_recursive_cte" ->
      """WITH RECURSIVE spine(m) AS (
        |  SELECT DATE '1995-01-01'
        |  UNION ALL
        |  SELECT m + INTERVAL 1 MONTH FROM spine WHERE m < DATE '1995-12-01'
        |)
        |SELECT strftime(m, '%Y-%m-%d') AS month_start,
        |       count(o_orderkey) AS n_orders
        |FROM spine LEFT JOIN orders
        |  ON o_orderdate >= m AND o_orderdate < m + INTERVAL 1 MONTH
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_gaps_islands" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS epoch_day
        |  FROM events
        |), grp AS (
        |  SELECT user_id, epoch_day,
        |    epoch_day - row_number() OVER (PARTITION BY user_id ORDER BY epoch_day) AS g
        |  FROM days
        |)
        |SELECT user_id, min(epoch_day) AS island_start,
        |       max(epoch_day) AS island_end, count(*) AS n_days
        |FROM grp GROUP BY user_id, g
        |HAVING count(*) >= 2
        |ORDER BY user_id, island_start""".stripMargin,

    "q_sessionize_batch" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(epoch_ms(ts)) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER
        |           (PARTITION BY user_id ORDER BY ts, event_id) > 1800000
        |    THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |), sess AS (
        |  SELECT user_id, ts,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_n
        |  FROM e
        |)
        |SELECT user_id, sess_n, count(*) AS n_events,
        |  ROUND((max(epoch_ms(ts)) - min(epoch_ms(ts))) / 1000.0, 3) AS dur_sec
        |FROM sess GROUP BY 1, 2 HAVING count(*) >= 3 ORDER BY 1, 2""".stripMargin,

    "q_math_funcs" ->
      """SELECT p_partkey,
        |  ROUND(sqrt(p_retailprice), 4) AS sq,
        |  ROUND(ln(p_retailprice), 4) AS lnp,
        |  ROUND(log10(p_retailprice), 4) AS l10,
        |  ROUND(exp(p_retailprice / 1000.0), 4) AS ex,
        |  CAST(floor(p_retailprice) AS BIGINT) AS fl,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS ce,
        |  CAST(sign(p_retailprice - 1000) AS BIGINT) AS sg,
        |  CAST(p_size % 7 AS BIGINT) AS md,
        |  CAST(((p_size - 10) % 7 + 7) % 7 AS BIGINT) AS pmd,
        |  ROUND(pow(p_size, 2.0), 1) AS p2
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_hash_funcs" ->
      """SELECT c_custkey, md5(c_name) AS h_md5, sha256(c_name) AS h_sha256
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_binary_funcs" ->
      """SELECT n_nationkey,
        |  to_base64(CAST(n_name AS BLOB)) AS b64,
        |  hex(n_name) AS hx,
        |  CAST(bit_length(n_name) AS BIGINT) AS bl,
        |  CAST(octet_length(CAST(n_name AS BLOB)) AS BIGINT) AS ol,
        |  CAST(ascii(n_name) AS BIGINT) AS first_cp
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "q_array_gen" ->
      """WITH g AS (
        |  SELECT p_partkey, range(1, p_size % 5 + 2) AS seq_a FROM part
        |)
        |SELECT p_partkey,
        |  array_to_string(seq_a, ',') AS seq_str,
        |  array_to_string(list_reverse(seq_a), ',') AS rev_str,
        |  COALESCE(array_to_string(seq_a[2:], ','), '') AS sliced,
        |  CAST(list_sum(list_transform(seq_a, x -> x * x)) AS BIGINT) AS sum_sq,
        |  array_to_string(flatten([seq_a, seq_a]), ',') AS doubled
        |FROM g ORDER BY p_partkey""".stripMargin,

    "q_inverted_index" ->
      """WITH terms AS (
        |  SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents
        |), post AS (
        |  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM terms GROUP BY 1, 2
        |)
        |SELECT term,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(tf) AS BIGINT) AS total_tf,
        |  array_to_string(list_sort(list(doc_id))[1:5], ',') AS posting_head
        |FROM post GROUP BY term
        |HAVING COUNT(*) >= 20
        |ORDER BY term""".stripMargin,

    "q_corpus_filter" ->
      """WITH feat AS (
        |  SELECT doc_id,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS n_words,
        |    length(regexp_replace(text, '[^aeiou]', '', 'g')) * 1.0
        |      / length(text) AS vowel_ratio
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST((CASE WHEN n_words < 40 THEN 1 ELSE 0 END)
        |     + (CASE WHEN n_words > 90 THEN 2 ELSE 0 END)
        |     + (CASE WHEN vowel_ratio < 0.27 THEN 4 ELSE 0 END)
        |     + (CASE WHEN vowel_ratio > 0.30 THEN 8 ELSE 0 END) AS BIGINT) AS rule_mask,
        |  CAST(n_words AS BIGINT) AS n_words,
        |  ROUND(vowel_ratio, 4) AS vowel_ratio
        |FROM feat ORDER BY doc_id""".stripMargin,

    "q_orc_roundtrip" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_price
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_sample_stratified" ->
      """SELECT doc_id, lang
        |FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT <
        |  CASE lang WHEN 'en' THEN 64 WHEN 'es' THEN 128 ELSE 256 END
        |ORDER BY doc_id""".stripMargin,

    "q_stack_values" ->
      """SELECT o_orderkey, metric, val FROM (
        |  SELECT o_orderkey, 'price' AS metric, ROUND(o_totalprice, 2) AS val FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'prio_len', CAST(length(o_orderpriority) AS DOUBLE) FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'status_f', CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END FROM orders
        |) ORDER BY o_orderkey, metric""".stripMargin,

    "q_dedup_minhash_md5" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr FROM documents
        |), shd AS (
        |  SELECT DISTINCT doc_id,
        |    UNNEST(list_transform(range(1, len(arr) - 1),
        |      i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS shingle
        |  FROM toks WHERE len(arr) >= 3
        |), mh AS (
        |  SELECT doc_id, p,
        |    min(('0x' || substr(md5(CAST(p // 2 AS VARCHAR) || ':' || shingle),
        |                        CAST(1 + 15 * (p % 2) AS INTEGER), 15))::BIGINT) AS mv
        |  FROM shd, range(8) t(p) GROUP BY doc_id, p
        |), bands AS (
        |  SELECT doc_id, p // 2 AS band,
        |    string_agg(CAST(mv AS VARCHAR), ',' ORDER BY p) AS sig
        |  FROM mh GROUP BY doc_id, p // 2
        |)
        |SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        |FROM bands a JOIN bands b
        |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        |ORDER BY da, db""".stripMargin,

    "q_scd2_history" ->
      """WITH ordered AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events
        |), changes AS (
        |  SELECT user_id, event_type, ts, event_id
        |  FROM ordered WHERE prev_type IS NULL OR prev_type <> event_type
        |), hist AS (
        |  SELECT user_id, event_type,
        |    epoch_ms(ts) AS valid_from_ms,
        |    lead(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_ms,
        |    event_id
        |  FROM changes
        |)
        |SELECT user_id, event_type, valid_from_ms,
        |  COALESCE(valid_to_ms, -1) AS valid_to_ms,
        |  CAST(valid_to_ms IS NULL AS INTEGER) AS is_current
        |FROM hist
        |ORDER BY user_id, valid_from_ms, event_id
        |LIMIT 2000""".stripMargin,

    "q_interp_linear" ->
      """WITH base AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
        |  FROM events
        |), ctx AS (
        |  SELECT user_id, event_id, ms, v,
        |    last_value(v IGNORE NULLS) OVER wp AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN ms END IGNORE NULLS) OVER wp AS pms,
        |    first_value(v IGNORE NULLS) OVER wf AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN ms END IGNORE NULLS) OVER wf AS nms
        |  FROM base
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY ms, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |         wf AS (PARTITION BY user_id ORDER BY ms, event_id
        |                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |)
        |SELECT user_id, event_id,
        |  ROUND(CASE WHEN v IS NOT NULL THEN v
        |             WHEN pv IS NULL THEN nv
        |             WHEN nv IS NULL THEN pv
        |             ELSE pv + (nv - pv) * (ms - pms) / (nms - pms) END, 3) AS vi,
        |  CAST(v IS NULL AS INTEGER) AS was_gap
        |FROM ctx ORDER BY user_id, event_id""".stripMargin,

    "q_bucket_join" ->
      """SELECT o_orderpriority, n_items, CAST((_s4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue
        |FROM (SELECT o_orderpriority,
        |             CAST(COUNT(*) AS BIGINT) AS n_items,
        |             SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS _s4
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |      GROUP BY o_orderpriority) t
        |ORDER BY o_orderpriority""".stripMargin,

    "q_explode_outer" ->
      """WITH src AS (
        |  SELECT p_partkey,
        |    CASE WHEN p_size > 10 THEN regexp_split_to_array(p_name, ' ') END AS arr
        |  FROM part
        |)
        |SELECT p_partkey, word
        |FROM src, UNNEST(arr) AS t(word) WHERE arr IS NOT NULL
        |UNION ALL
        |SELECT p_partkey, NULL FROM src WHERE arr IS NULL
        |ORDER BY p_partkey, word NULLS FIRST""".stripMargin,

    "q_pivot_dynamic" ->
      """SELECT o_orderstatus,
        |  ROUND(COALESCE(SUM(o_totalprice) FILTER (o_orderpriority = '1-URGENT'), 0), 2) AS "1-URGENT",
        |  ROUND(COALESCE(SUM(o_totalprice) FILTER (o_orderpriority = '2-HIGH'), 0), 2) AS "2-HIGH",
        |  ROUND(COALESCE(SUM(o_totalprice) FILTER (o_orderpriority = '3-MEDIUM'), 0), 2) AS "3-MEDIUM",
        |  ROUND(COALESCE(SUM(o_totalprice) FILTER (o_orderpriority = '4-NOT SPECIFIED'), 0), 2) AS "4-NOT SPECIFIED",
        |  ROUND(COALESCE(SUM(o_totalprice) FILTER (o_orderpriority = '5-LOW'), 0), 2) AS "5-LOW"
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_approx_topk" ->
      """WITH terms AS (
        |  SELECT UNNEST(regexp_split_to_array(trim(text), '\s+')) AS term FROM documents
        |)
        |SELECT term, CAST(COUNT(*) AS BIGINT) AS n
        |FROM terms GROUP BY term
        |ORDER BY n DESC, term LIMIT 8""".stripMargin,

    "q_fuzzy_join" ->
      """SELECT a.c_custkey AS custkey, CAST(count(*) AS BIGINT) AS n_neighbors,
        |       CAST(min(levenshtein(a.c_name, b.c_name)) AS BIGINT) AS min_lev
        |FROM customer a JOIN customer b
        |  ON a.c_custkey // 100 = b.c_custkey // 100 AND a.c_custkey <> b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the roundtrip is self-checking: the oracle pins the expected
    // shape — EVERY document must read back byte-identical, so a
    // quoting/null regression fails the driver's hash compare, not
    // just the local spec
    "q_csv_roundtrip" ->
      """SELECT doc_id, TRUE AS row_match
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_group_sample" ->
      """WITH ranked AS (
        |  SELECT doc_id, lang, source,
        |    row_number() OVER (PARTITION BY lang, source
        |                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents
        |)
        |SELECT lang, source, CAST(count(*) AS BIGINT) AS n_sampled,
        |  array_to_string(list_sort(list(doc_id)), ',') AS sample_ids
        |FROM ranked WHERE rk <= 5
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_snowflake_join" ->
      """SELECT r_name, p_brand, n_items, CAST((_s4 + 50) // 100 AS DOUBLE) / 100.0 AS revenue, n_suppliers
        |FROM (SELECT r_name, p_brand,
        |  CAST(COUNT(*) AS BIGINT) AS n_items,
        |  SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS _s4,
        |  CAST(COUNT(DISTINCT s_suppkey) AS BIGINT) AS n_suppliers
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |JOIN part     ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND p_size <= 25
        |GROUP BY 1, 2) t
        |ORDER BY 1, 2""".stripMargin,

    "q_snapshot_diff" ->
      """WITH v1 AS (
        |  SELECT o_orderkey AS k, ROUND(o_totalprice, 2) AS price
        |  FROM orders WHERE o_orderkey % 7 <> 0
        |), v2 AS (
        |  SELECT o_orderkey AS k,
        |    ROUND(CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
        |               ELSE o_totalprice END, 2) AS price
        |  FROM orders
        |)
        |SELECT COALESCE(v1.k, v2.k) AS k,
        |  CASE WHEN v1.k IS NULL THEN 'added'
        |       WHEN v2.k IS NULL THEN 'removed'
        |       WHEN v1.price <> v2.price THEN 'changed'
        |       ELSE 'same' END AS change
        |FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
        |WHERE NOT (v1.k IS NOT NULL AND v2.k IS NOT NULL AND v1.price = v2.price)
        |ORDER BY k""".stripMargin,

    "q_table_checksum" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  bit_xor(('0x' || substr(md5(
        |    CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)
        |      || '|' || l_linestatus), 1, 15))::BIGINT) AS checksum
        |FROM lineitem
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_percent_total" ->
      """WITH rev AS (
        |  SELECT n_name, ROUND(SUM(o_totalprice), 2) AS revenue
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1
        |)
        |SELECT n_name, revenue,
        |  ROUND(100.0 * revenue / SUM(revenue) OVER (), 4) AS pct_total,
        |  ROUND(SUM(revenue) OVER (ORDER BY revenue DESC, n_name
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    / SUM(revenue) OVER (), 4) AS cum_share
        |FROM rev ORDER BY revenue DESC, n_name""".stripMargin,

    "q_dsir_select" -> CurationOps.dsirSelectOracleSql,

    "q_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, doc_id % 97 = 0 AS is_bench,
        |    regexp_split_to_array(trim(text), '\s+') AS arr
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, is_bench,
        |    ('0x' || substr(md5(arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2]
        |      || ' ' || arr[i+3] || ' ' || arr[i+4]), 1, 15))::BIGINT AS h
        |  FROM toks, UNNEST(range(1, greatest(len(arr) - 3, 1))) AS t(i)
        |  WHERE len(arr) >= 5
        |)
        |SELECT c.doc_id, CAST(count(DISTINCT c.h) AS BIGINT) AS n_shared,
        |       CAST(min(b.doc_id) AS BIGINT) AS first_bench_doc
        |FROM sh c JOIN sh b ON c.h = b.h AND NOT c.is_bench AND b.is_bench
        |GROUP BY c.doc_id
        |ORDER BY c.doc_id""".stripMargin,

    "q_salted_join" ->
      """SELECT o_orderpriority,
        |  CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(MIN(l_quantity) AS BIGINT) AS min_qty,
        |  CAST(MAX(l_quantity) AS BIGINT) AS max_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_doc_fingerprint" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr FROM documents
        |), sh AS (
        |  SELECT doc_id,
        |    min(CASE WHEN len(arr) >= 3 THEN
        |      ('0x' || substr(md5('0:' || arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2]), 1, 15))::BIGINT
        |    END) AS winnow_fp
        |  FROM toks, UNNEST(range(1, greatest(len(arr) - 1, 1))) AS t(i)
        |  GROUP BY doc_id
        |), ord AS (
        |  SELECT doc_id,
        |    SUM((('0x' || substr(md5(arr[i]), 1, 15))::BIGINT % 1000000007) * i)
        |      % 1000000007 AS order_fp
        |  FROM toks, UNNEST(range(1, len(arr) + 1)) AS t(i)
        |  GROUP BY doc_id
        |)
        |SELECT d.doc_id, COALESCE(sh.winnow_fp, -1) AS winnow_fp,
        |       CAST(ord.order_fp AS BIGINT) AS order_fp
        |FROM documents d LEFT JOIN sh ON d.doc_id = sh.doc_id
        |LEFT JOIN ord ON d.doc_id = ord.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q_topk_agg" ->
      """SELECT o_orderpriority, rk, o_orderkey, price FROM (
        |  SELECT o_orderpriority,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY ROUND(o_totalprice, 2) DESC, o_orderkey) AS rk,
        |    o_orderkey, ROUND(o_totalprice, 2) AS price
        |  FROM orders)
        |WHERE rk <= 3
        |ORDER BY o_orderpriority, rk""".stripMargin,

    "q_entropy" ->
      """WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
        |           FROM events GROUP BY 1, 2),
        |     t AS (SELECT user_id, SUM(n) AS tot FROM c GROUP BY 1)
        |SELECT c.user_id,
        |       CAST(MAX(t.tot) AS BIGINT) AS n_events,
        |       CAST(COUNT(*) AS BIGINT) AS n_types,
        |       ROUND(-SUM((n * 1.0 / tot) * LN(n * 1.0 / tot)) / LN(2), 4) AS entropy_bits
        |FROM c JOIN t ON c.user_id = t.user_id
        |GROUP BY c.user_id
        |ORDER BY c.user_id""".stripMargin,

    "q_chi2" ->
      """WITH obs AS (
        |  SELECT n_name, o_orderpriority, COUNT(*) * 1.0 AS o
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |              JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |rt AS (SELECT n_name, SUM(o) AS r FROM obs GROUP BY 1),
        |ct AS (SELECT o_orderpriority, SUM(o) AS c FROM obs GROUP BY 1),
        |g  AS (SELECT SUM(o) AS t FROM obs),
        |cells AS (
        |  SELECT rt.n_name, ct.o_orderpriority, rt.r, ct.c, g.t,
        |         COALESCE(obs.o, 0.0) AS o
        |  FROM rt CROSS JOIN ct CROSS JOIN g
        |  LEFT JOIN obs ON obs.n_name = rt.n_name
        |              AND obs.o_orderpriority = ct.o_orderpriority)
        |SELECT n_name,
        |       CAST(SUM(o) AS BIGINT) AS n_orders,
        |       ROUND(SUM(POWER(o - r * c / t, 2) / (r * c / t)), 4) AS chi2_contrib
        |FROM cells
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q_markov_transitions" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |         LEAD(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS dst
        |  FROM events)
        |SELECT event_type AS src, dst,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY event_type), 4) AS p
        |FROM s WHERE dst IS NOT NULL
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q_outlier_iqr" ->
      """WITH r AS (SELECT event_type, value, event_id,
        |                  ROW_NUMBER() OVER (PARTITION BY event_type
        |                    ORDER BY value, event_id) AS rn,
        |                  COUNT(*) OVER (PARTITION BY event_type) AS n
        |           FROM events),
        |q AS (SELECT event_type,
        |             MAX(CASE WHEN rn = CAST(CEIL(0.25 * n) AS BIGINT) THEN value END) AS q1,
        |             MAX(CASE WHEN rn = CAST(CEIL(0.75 * n) AS BIGINT) THEN value END) AS q3
        |      FROM r GROUP BY 1)
        |SELECT e.event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n_outliers,
        |       ROUND(MIN(value), 4) AS min_outlier,
        |       ROUND(MAX(value), 4) AS max_outlier,
        |       ROUND(MAX(q3 + 1.5 * (q3 - q1)), 4) AS hi_fence
        |FROM events e JOIN q ON e.event_type = q.event_type
        |WHERE value > q3 + 1.5 * (q3 - q1) OR value < q1 - 1.5 * (q3 - q1)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_time_weighted_avg" ->
      """WITH s AS (
        |  SELECT user_id, value, CAST(ts AS TIMESTAMP) AS ts,
        |         LEAD(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
        |              ORDER BY CAST(ts AS TIMESTAMP), event_id) AS nxt
        |  FROM events)
        |SELECT user_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_segments,
        |       CAST(SUM(epoch_us(nxt) - epoch_us(ts)) AS BIGINT) AS total_us,
        |       ROUND(SUM(value * (epoch_us(nxt) - epoch_us(ts)))
        |             / SUM(epoch_us(nxt) - epoch_us(ts)), 4) AS twa
        |FROM s WHERE nxt IS NOT NULL
        |GROUP BY user_id
        |HAVING SUM(epoch_us(nxt) - epoch_us(ts)) > 0
        |ORDER BY user_id""".stripMargin,

    "q_bm25" ->
      """WITH terms AS (
        |  SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, COUNT(*) * 1.0 AS tf FROM terms GROUP BY 1, 2
        |), dl AS (
        |  SELECT doc_id, SUM(tf) AS len FROM tf GROUP BY 1
        |), stats AS (
        |  SELECT COUNT(*) * 1.0 AS n_docs, SUM(len) / COUNT(*) AS avgdl FROM dl
        |), df AS (
        |  SELECT term, COUNT(*) * 1.0 AS df FROM tf GROUP BY 1
        |), scored AS (
        |  SELECT tf.doc_id, tf.term,
        |    LN((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
        |      (tf * 2.2) / (tf + (0.25 + 0.75 * len / avgdl) * 1.2) AS score
        |  FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN stats
        |), ranked AS (
        |  SELECT doc_id, term, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
        |  FROM scored
        |)
        |SELECT doc_id, CAST(rn AS BIGINT) AS rn, term, ROUND(score, 4) AS score
        |FROM ranked WHERE rn <= 3
        |ORDER BY doc_id, rn""".stripMargin,

    "q_dedup_cluster" -> dedupClusterOracle,

    // identical oracle on purpose: q_components_ccf must produce the
    // SAME components from the same candidate edges via the O(log d)
    // CCF algorithm instead of min-label propagation
    "q_components_ccf" -> dedupClusterOracle,

    "q_zorder_layout" ->
      """WITH mx AS (SELECT MAX(l_orderkey) + 1 AS mo, MAX(l_partkey) + 1 AS mp FROM lineitem),
        |base AS (
        |  SELECT (l_orderkey * 256) // mo AS x,
        |         (l_partkey * 256) // mp AS y
        |  FROM lineitem CROSS JOIN mx),
        |sp1 AS (SELECT *, ((x | (x << 4)) & 3855) AS x1, ((y | (y << 4)) & 3855) AS y1 FROM base),
        |sp2 AS (SELECT *, ((x1 | (x1 << 2)) & 13107) AS x2, ((y1 | (y1 << 2)) & 13107) AS y2 FROM sp1),
        |z AS (SELECT *, (((x2 | (x2 << 1)) & 21845) |
        |     ((((y2 | (y2 << 1)) & 21845)) << 1)) AS zval FROM sp2)
        |SELECT zval // 1024 AS zrange,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(MIN(x) AS BIGINT) AS min_x, CAST(MAX(x) AS BIGINT) AS max_x,
        |       CAST(MIN(y) AS BIGINT) AS min_y, CAST(MAX(y) AS BIGINT) AS max_y
        |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_bitmap_distinct" ->
      """WITH b AS (
        |  SELECT event_type, user_id // 32 AS bucket,
        |         bit_or(1::BIGINT << CAST(user_id % 32 AS INTEGER)) AS bm
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type,
        |       CAST(SUM(bit_count(bm)) AS BIGINT) AS n_users,
        |       CAST(COUNT(*) AS BIGINT) AS n_buckets
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_merge_upsert" ->
      """WITH tgt AS (SELECT user_id, value FROM (
        |  SELECT user_id, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE user_id % 4 <> 0) WHERE rn = 1),
        |src AS (SELECT user_id, value, event_type FROM (
        |  SELECT user_id, value, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE user_id % 3 = 0) WHERE rn = 1)
        |SELECT COALESCE(t.user_id, s.user_id) AS user_id,
        |       CASE WHEN s.user_id IS NULL THEN 'keep'
        |            WHEN t.user_id IS NULL THEN 'insert'
        |            ELSE 'update' END AS action,
        |       ROUND(CASE WHEN s.user_id IS NULL THEN t.value ELSE s.value END, 2) AS value
        |FROM tgt t FULL OUTER JOIN src s ON t.user_id = s.user_id
        |WHERE NOT (t.user_id IS NOT NULL AND s.user_id IS NOT NULL AND s.event_type = 'error')
        |ORDER BY user_id""".stripMargin,

    "q_stream_full_outer" ->
      """WITH clicks AS (
        |  SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS click_ts
        |  FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id AS p_user_id, event_id AS p_event_id, CAST(ts AS TIMESTAMP) AS purchase_ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT COALESCE(click_id, -1) AS click_id,
        |       COALESCE(p_event_id, -1) AS purchase_id,
        |       COALESCE(c.user_id, p.p_user_id) AS uid,
        |       CASE WHEN click_id IS NULL THEN 'purchase_only'
        |            WHEN p_event_id IS NULL THEN 'click_only'
        |            ELSE 'matched' END AS side
        |FROM clicks c FULL OUTER JOIN purchases p
        |  ON c.user_id = p.p_user_id
        | AND purchase_ts >= click_ts
        | AND purchase_ts <= click_ts + INTERVAL 30 MINUTE
        |ORDER BY click_id, purchase_id, uid""".stripMargin,

    "q_json_roundtrip" ->
      """SELECT event_id, TRUE AS row_match
        |FROM events ORDER BY event_id""".stripMargin,

    "q_kmeans_assign" ->
      """WITH c AS (
        |  SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cvec
        |  FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT e.vec_id, c.centroid_id,
        |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) AS sim
        |  FROM embeddings e CROSS JOIN c),
        |r AS (
        |  SELECT vec_id, centroid_id, sim,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, centroid_id) AS rn
        |  FROM scored)
        |SELECT vec_id, centroid_id, ROUND(sim, 4) AS sim
        |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    "q_zscore" ->
      """WITH s AS (SELECT event_type, AVG(value) AS mu, stddev_samp(value) AS sigma
        |           FROM events GROUP BY 1)
        |SELECT event_id, event_type, ROUND(value, 2) AS value,
        |       ROUND((value - mu) / sigma, 3) AS z
        |FROM events JOIN s USING (event_type)
        |WHERE sigma > 0 AND ABS((value - mu) / sigma) > 3.0
        |ORDER BY event_id""".stripMargin,

    "q_autocorr" ->
      """WITH t AS (SELECT user_id, value,
        |                  LAG(value) OVER (PARTITION BY user_id
        |                    ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_v
        |           FROM events)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       ROUND(corr(value, prev_v), 4) AS lag1_corr
        |FROM t WHERE prev_v IS NOT NULL
        |GROUP BY user_id HAVING COUNT(*) >= 10
        |ORDER BY user_id""".stripMargin,

    "q_gini" ->
      """WITH spend AS (SELECT o_custkey, SUM(o_totalprice) AS spend
        |               FROM orders GROUP BY 1),
        |j AS (SELECT c_mktsegment, c_custkey, spend
        |      FROM spend JOIN customer ON o_custkey = c_custkey),
        |r AS (SELECT c_mktsegment, spend,
        |             CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |               ORDER BY spend, c_custkey) AS DOUBLE) AS i
        |      FROM j)
        |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |       ROUND(2.0 * SUM(i * spend) / (COUNT(*) * SUM(spend))
        |             - (COUNT(*) + 1.0) / COUNT(*), 4) AS gini
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_ttest" ->
      """WITH s AS (
        |  SELECT COUNT(CASE WHEN event_type = 'purchase' THEN value END) AS n1,
        |         AVG(CASE WHEN event_type = 'purchase' THEN value END) AS m1,
        |         var_samp(CASE WHEN event_type = 'purchase' THEN value END) AS v1,
        |         COUNT(CASE WHEN event_type = 'click' THEN value END) AS n2,
        |         AVG(CASE WHEN event_type = 'click' THEN value END) AS m2,
        |         var_samp(CASE WHEN event_type = 'click' THEN value END) AS v2
        |  FROM events)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
        |       ROUND(m1 - m2, 4) AS mean_diff,
        |       ROUND((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4) AS t_stat,
        |       ROUND(POW(v1 / n1 + v2 / n2, 2) /
        |             (POW(v1 / n1, 2) / (n1 - 1) + POW(v2 / n2, 2) / (n2 - 1)), 2) AS welch_df
        |FROM s""".stripMargin,

    "q_cooccur" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |n AS (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n_users FROM ut),
        |m AS (SELECT event_type, COUNT(*) AS n_t FROM ut GROUP BY 1),
        |p AS (SELECT a.event_type AS t_a, b.event_type AS t_b,
        |             CAST(COUNT(*) AS BIGINT) AS n_both
        |      FROM ut a JOIN ut b
        |        ON a.user_id = b.user_id AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT t_a, t_b, n_both,
        |       ROUND(n_both * n_users / (CAST(ma.n_t AS DOUBLE) * mb.n_t), 4) AS lift
        |FROM p CROSS JOIN n
        |JOIN m ma ON ma.event_type = p.t_a
        |JOIN m mb ON mb.event_type = p.t_b
        |ORDER BY t_a, t_b""".stripMargin,

    "q_moving_median" ->
      """SELECT event_id, user_id,
        |       ROUND(median(value) OVER (PARTITION BY user_id
        |         ORDER BY CAST(ts AS TIMESTAMP), event_id
        |         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 3) AS med5
        |FROM events ORDER BY event_id""".stripMargin,

    "q_rfm" ->
      """WITH per AS (SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_day,
        |                    CAST(COUNT(*) AS BIGINT) AS freq,
        |                    SUM(o_totalprice) AS monetary,
        |                    CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |                         // 100 AS BIGINT) AS mon_d
        |             FROM orders GROUP BY 1),
        |mx AS (SELECT MAX(last_day) AS max_day FROM per),
        |base AS (SELECT per.*,
        |                CAST(datediff('day', last_day, max_day) AS BIGINT) AS recency_days
        |         FROM per CROSS JOIN mx),
        |hr AS (SELECT recency_days AS v, COUNT(*) AS cnt FROM base GROUP BY 1),
        |hrc AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum, SUM(cnt) OVER () AS n FROM hr),
        |rb AS (SELECT MIN(CASE WHEN cum*4 >= n THEN v END) AS b1,
        |              MIN(CASE WHEN cum*4 >= n*2 THEN v END) AS b2,
        |              MIN(CASE WHEN cum*4 >= n*3 THEN v END) AS b3 FROM hrc),
        |hf AS (SELECT freq AS v, COUNT(*) AS cnt FROM base GROUP BY 1),
        |hfc AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum, SUM(cnt) OVER () AS n FROM hf),
        |fb AS (SELECT MIN(CASE WHEN cum*4 >= n THEN v END) AS b1,
        |              MIN(CASE WHEN cum*4 >= n*2 THEN v END) AS b2,
        |              MIN(CASE WHEN cum*4 >= n*3 THEN v END) AS b3 FROM hfc),
        |hm AS (SELECT mon_d AS v, COUNT(*) AS cnt FROM base GROUP BY 1),
        |hmc AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum, SUM(cnt) OVER () AS n FROM hm),
        |mb AS (SELECT MIN(CASE WHEN cum*4 >= n THEN v END) AS b1,
        |              MIN(CASE WHEN cum*4 >= n*2 THEN v END) AS b2,
        |              MIN(CASE WHEN cum*4 >= n*3 THEN v END) AS b3 FROM hmc),
        |t AS (SELECT o_custkey, recency_days, freq, monetary,
        |        5 - (1 + CASE WHEN recency_days > rb.b1 THEN 1 ELSE 0 END
        |               + CASE WHEN recency_days > rb.b2 THEN 1 ELSE 0 END
        |               + CASE WHEN recency_days > rb.b3 THEN 1 ELSE 0 END) AS r,
        |        1 + CASE WHEN freq > fb.b1 THEN 1 ELSE 0 END
        |          + CASE WHEN freq > fb.b2 THEN 1 ELSE 0 END
        |          + CASE WHEN freq > fb.b3 THEN 1 ELSE 0 END AS f,
        |        1 + CASE WHEN mon_d > mb.b1 THEN 1 ELSE 0 END
        |          + CASE WHEN mon_d > mb.b2 THEN 1 ELSE 0 END
        |          + CASE WHEN mon_d > mb.b3 THEN 1 ELSE 0 END AS m
        |      FROM base CROSS JOIN rb CROSS JOIN fb CROSS JOIN mb)
        |SELECT o_custkey AS custkey, recency_days, freq,
        |       ROUND(monetary, 2) AS monetary,
        |       CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f, CAST(m AS BIGINT) AS m,
        |       CAST(r * 100 + f * 10 + m AS BIGINT) AS rfm
        |FROM t ORDER BY custkey""".stripMargin,

    "q_skyline" ->
      """WITH t AS (SELECT o_orderkey,
        |                  CAST(datediff('day', DATE '1970-01-01',
        |                       CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
        |                  o_totalprice
        |           FROM orders),
        |r AS (SELECT o_orderkey, day, o_totalprice,
        |             MAX(o_totalprice) OVER (ORDER BY day) AS runmax
        |      FROM t)
        |SELECT o_orderkey, day, ROUND(o_totalprice, 2) AS price
        |FROM r WHERE o_totalprice = runmax
        |ORDER BY day, o_orderkey""".stripMargin,

    "q_geo_distance" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |t AS (SELECT user_id,
        |             (user_id % 180 - 89.5) * pi() / 180 AS lat,
        |             ((user_id * 7) % 360 - 179.5) * pi() / 180 AS lon
        |      FROM u),
        |d AS (SELECT user_id,
        |             2 * 6371 * asin(sqrt(POW(sin(lat / 2), 2)
        |               + cos(lat) * POW(sin(lon / 2), 2))) AS dist_km
        |      FROM t)
        |SELECT CAST(FLOOR(dist_km / 1000) AS BIGINT) AS ring,
        |       CAST(COUNT(*) AS BIGINT) AS n_users,
        |       ROUND(MIN(dist_km), 1) AS min_km,
        |       ROUND(MAX(dist_km), 1) AS max_km
        |FROM d GROUP BY ring ORDER BY ring""".stripMargin,

    "q_vocab_build" ->
      """WITH terms AS (SELECT UNNEST(regexp_split_to_array(trim(text), '\s+')) AS term
        |               FROM documents),
        |counts AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM terms GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM counts),
        |top AS (SELECT term, n FROM counts ORDER BY n DESC, term LIMIT 200),
        |r AS (SELECT term, n,
        |             CAST(ROW_NUMBER() OVER (ORDER BY n DESC, term) AS BIGINT) AS term_id,
        |             SUM(n) OVER (ORDER BY n DESC, term ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM top)
        |SELECT term_id, term, n, ROUND(cum / total, 4) AS cum_share
        |FROM r CROSS JOIN tot ORDER BY term_id""".stripMargin,

    "q_length_buckets" ->
      """WITH n AS (SELECT CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
        |           FROM documents
        |           WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 1),
        |a AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_total FROM n)
        |SELECT CAST(length(format('{:b}', n_tok)) - 1 AS BIGINT) AS bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       MIN(n_tok) AS min_tok, MAX(n_tok) AS max_tok,
        |       ROUND(AVG(n_tok), 2) AS avg_tok,
        |       ROUND(COUNT(*) / n_total, 4) AS share
        |FROM n CROSS JOIN a GROUP BY bucket, n_total ORDER BY bucket""".stripMargin,

    "q_class_weights" ->
      """WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        |           FROM documents GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS total,
        |             CAST(COUNT(*) AS DOUBLE) AS k FROM c)
        |SELECT lang, n_docs,
        |       ROUND(total / (k * n_docs), 4) AS inv_freq_w,
        |       ROUND((1.0 - 0.999) / (1.0 - POW(0.999, n_docs)), 6) AS cb_w
        |FROM c CROSS JOIN t ORDER BY lang""".stripMargin,

    "q_dict_encode" ->
      """SELECT doc_id, source,
        |       CAST(dense_rank() OVER (ORDER BY source) AS BIGINT) AS source_code,
        |       lang,
        |       CAST(dense_rank() OVER (ORDER BY lang) AS BIGINT) AS lang_code
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_multi_distinct" ->
      """SELECT o_orderstatus,
        |       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
        |       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_prio,
        |       CAST(COUNT(DISTINCT year(CAST(o_orderdate AS DATE))) AS BIGINT) AS n_years,
        |       CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_copurchase" ->
      """WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |li AS (SELECT l_orderkey, l_partkey FROM
        |         (SELECT *, COUNT(*) OVER (PARTITION BY l_orderkey) AS bsz FROM li0)
        |       WHERE bsz <= 120)
        |SELECT a.l_partkey AS p_a, b.l_partkey AS p_b,
        |       CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM li a JOIN li b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2
        |ORDER BY n_orders DESC, p_a, p_b LIMIT 50""".stripMargin,

    "q_nested_struct" ->
      """SELECT o_custkey AS custkey,
        |       CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       MIN(o_orderkey) AS first_orderkey,
        |       MAX(o_orderkey) AS last_orderkey,
        |       ROUND(SUM(o_totalprice), 2) AS arr_total
        |FROM orders GROUP BY o_custkey ORDER BY custkey""".stripMargin,

    "q_weighted_median" ->
      """WITH t AS (
        |  SELECT l_returnflag, l_extendedprice, l_quantity,
        |         SUM(l_quantity) OVER (PARTITION BY l_returnflag
        |           ORDER BY l_extendedprice, l_orderkey, l_linenumber
        |           ROWS UNBOUNDED PRECEDING) AS cumw,
        |         SUM(l_quantity) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM lineitem)
        |SELECT l_returnflag,
        |       CAST(MAX(tot) AS BIGINT) AS total_weight,
        |       ROUND(MIN(l_extendedprice), 2) AS wmedian
        |FROM t WHERE cumw >= tot / 2.0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_stream_chained" ->
      """WITH h AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr, event_type,
        |                  CAST(COUNT(*) AS BIGINT) AS n_events, SUM(value) AS v
        |           FROM events GROUP BY 1, 2)
        |SELECT CAST(epoch(date_trunc('day', hr)) AS BIGINT) AS day_start, event_type,
        |       CAST(SUM(n_events) AS BIGINT) AS n_events,
        |       CAST(MAX(n_events) AS BIGINT) AS peak_hour_events,
        |       CAST(COUNT(*) AS BIGINT) AS n_hours,
        |       ROUND(SUM(v), 2) AS total_value
        |FROM h GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_pmi" ->
      """WITH tok AS (SELECT regexp_split_to_array(trim(text), '\s+') AS ts FROM documents),
        |u AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c
        |      FROM (SELECT UNNEST(ts) AS w FROM tok) GROUP BY 1),
        |nu AS (SELECT CAST(SUM(c) AS DOUBLE) AS n_uni FROM u),
        |b AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_ab
        |      FROM (SELECT ts[i] AS w1, ts[i+1] AS w2
        |            FROM tok, UNNEST(range(1, len(ts))) AS t(i))
        |      GROUP BY 1, 2),
        |nb AS (SELECT CAST(SUM(c_ab) AS DOUBLE) AS n_bi FROM b)
        |SELECT w1 || ' ' || w2 AS bigram, c_ab,
        |       ROUND(LN((c_ab / n_bi) / ((ua.c / n_uni) * (ub.c / n_uni))), 4) AS pmi
        |FROM b JOIN u ua ON ua.w = b.w1 JOIN u ub ON ub.w = b.w2
        |CROSS JOIN nu CROSS JOIN nb
        |WHERE c_ab >= 5
        |ORDER BY pmi DESC, bigram LIMIT 30""".stripMargin,

    "q_vector_quantize" ->
      """WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id, v,
        |             list_max(list_transform(v, x -> abs(x))) AS max_abs,
        |             CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 THEN 1.0
        |                  ELSE 127.0 / list_max(list_transform(v, x -> abs(x))) END AS scale
        |      FROM t)
        |SELECT vec_id,
        |       CAST(len(v) AS BIGINT) AS n_dims,
        |       ROUND(max_abs, 6) AS max_abs,
        |       CAST(list_sum(list_transform(v,
        |            x -> CAST(abs(round(x * scale, 0)) AS BIGINT))) AS BIGINT) AS l1_quantized,
        |       ROUND(sqrt(list_sum(list_transform(v,
        |            x -> pow(x - round(x * scale, 0) / scale, 2)))), 6) AS recon_err
        |FROM q ORDER BY vec_id""".stripMargin,

    "q_zipf_slope" ->
      """WITH toks AS (SELECT UNNEST(regexp_split_to_array(trim(text), '\s+')) AS term
        |              FROM documents),
        |counts AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY 1),
        |top AS (SELECT term, n FROM counts ORDER BY n DESC, term LIMIT 200),
        |r AS (SELECT ln(CAST(row_number() OVER (ORDER BY n DESC, term) AS DOUBLE)) AS x,
        |             ln(CAST(n AS DOUBLE)) AS y FROM top),
        |s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k, SUM(x) AS sx, SUM(y) AS sy,
        |             SUM(x*y) AS sxy, SUM(x*x) AS sxx FROM r)
        |SELECT CAST(k AS BIGINT) AS n_terms,
        |       ROUND((k*sxy - sx*sy) / (k*sxx - sx*sx), 4) AS slope,
        |       ROUND((sy - (k*sxy - sx*sy) / (k*sxx - sx*sx) * sx) / k, 4) AS intercept
        |FROM s""".stripMargin,

    "q_kl_divergence" ->
      """WITH sw AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
        |            FROM (SELECT source, UNNEST(regexp_split_to_array(trim(text), '\s+')) AS w
        |                  FROM documents)
        |            GROUP BY 1, 2),
        |win AS (SELECT source, c, SUM(c) OVER (PARTITION BY w) AS cc FROM sw),
        |per_src AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ns,
        |                   SUM(c * ln(c)) AS a, SUM(c * ln(cc)) AS b
        |            FROM win GROUP BY source),
        |g AS (SELECT source, ns, a, b, SUM(ns) OVER () AS n FROM per_src)
        |SELECT source, ns AS n_tokens,
        |       ROUND((a - b)/CAST(ns AS DOUBLE) - ln(ns) + ln(n), 4) AS kl
        |FROM g ORDER BY source""".stripMargin,

    "q_unigram_logprob" ->
      """WITH dwc AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS cnt
        |             FROM (SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\s+')) AS w
        |                   FROM documents)
        |             GROUP BY 1, 2),
        |cw AS (SELECT doc_id, w, cnt, SUM(cnt) OVER (PARTITION BY w) AS c FROM dwc),
        |tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM dwc),
        |perdoc AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tok,
        |                  SUM(cnt * ln(c / n)) AS s
        |           FROM cw CROSS JOIN tot GROUP BY doc_id)
        |SELECT doc_id, n_tok, ROUND(s / n_tok, 4) AS avg_logprob
        |FROM perdoc ORDER BY avg_logprob ASC, doc_id LIMIT 100""".stripMargin,

    "q_pq_assign" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sub AS (SELECT vec_id, m, v[m*16+1 : m*16+16] AS sv
        |        FROM e CROSS JOIN (SELECT UNNEST([0,1,2,3]) AS m)),
        |cb AS (SELECT m, vec_id AS centroid_id, sv AS cv FROM sub WHERE vec_id < 8),
        |scored AS (SELECT s.vec_id, s.m, c.centroid_id,
        |  CAST(floor(list_sum(list_transform(range(1,17),
        |    i -> (s.sv[i]-c.cv[i])*(s.sv[i]-c.cv[i]))) * 1e6 + 0.5) AS BIGINT) AS d2u
        |  FROM sub s JOIN cb c ON s.m = c.m),
        |best AS (SELECT vec_id, m, centroid_id, d2u,
        |  row_number() OVER (PARTITION BY vec_id, m ORDER BY d2u, centroid_id) AS rn
        |  FROM scored)
        |SELECT vec_id,
        |  MAX(CASE WHEN m=0 THEN centroid_id END) AS code0,
        |  MAX(CASE WHEN m=1 THEN centroid_id END) AS code1,
        |  MAX(CASE WHEN m=2 THEN centroid_id END) AS code2,
        |  MAX(CASE WHEN m=3 THEN centroid_id END) AS code3,
        |  CAST(SUM(d2u) AS DOUBLE) / 1e6 AS quant_err
        |FROM best WHERE rn = 1 GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "q_pq_adc_scan" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |sub AS (SELECT vec_id, m, v[m*16+1 : m*16+16] AS sv
        |        FROM e CROSS JOIN (SELECT UNNEST([0,1,2,3]) AS m)),
        |cb AS (SELECT m, vec_id AS centroid_id, sv AS cv FROM sub WHERE vec_id < 8),
        |scored AS (SELECT s.vec_id, s.m, c.centroid_id,
        |  CAST(floor(list_sum(list_transform(range(1,17),
        |    i -> (s.sv[i]-c.cv[i])*(s.sv[i]-c.cv[i]))) * 1e6 + 0.5) AS BIGINT) AS d2u
        |  FROM sub s JOIN cb c ON s.m = c.m),
        |codes AS (SELECT vec_id, m, centroid_id AS code FROM (
        |  SELECT vec_id, m, centroid_id,
        |    row_number() OVER (PARTITION BY vec_id, m ORDER BY d2u, centroid_id) AS rn
        |  FROM scored) WHERE rn = 1),
        |q AS (SELECT m, sv AS qv FROM sub WHERE vec_id = 0),
        |lut AS (SELECT c.m, c.centroid_id,
        |  CAST(floor(list_sum(list_transform(range(1,17),
        |    i -> (q.qv[i]-c.cv[i])*(q.qv[i]-c.cv[i]))) * 1e6 + 0.5) AS BIGINT) AS lut_u
        |  FROM cb c JOIN q ON c.m = q.m)
        |SELECT cd.vec_id, CAST(SUM(l.lut_u) AS BIGINT) AS adc_u,
        |       CAST(SUM(l.lut_u) AS DOUBLE) / 1e6 AS adc_dist
        |FROM codes cd JOIN lut l ON cd.m = l.m AND cd.code = l.centroid_id
        |WHERE cd.vec_id <> 0
        |GROUP BY cd.vec_id ORDER BY adc_u, vec_id LIMIT 10""".stripMargin,

    "q_shard_assign" ->
      """WITH s AS (SELECT doc_id, n_chars,
        |   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 16 AS shard
        |   FROM documents),
        |tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM s)
        |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |       floor(COUNT(*) / (n / 16) * 10000 + 0.5) / 10000 AS balance
        |FROM s CROSS JOIN tot GROUP BY shard, n ORDER BY shard""".stripMargin,

    "q_crossval_folds" ->
      """SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT % 5 AS fold,
        |       lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM documents GROUP BY 1, 2 ORDER BY fold, lang""".stripMargin,

    "q_prefix_dedup" ->
      """WITH fp AS (SELECT doc_id,
        |   md5(array_to_string(regexp_split_to_array(trim(text), '\s+')[1:8], ' ')) AS f
        |   FROM documents)
        |SELECT f AS prefix_fp, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(MIN(doc_id) AS BIGINT) AS canonical_id
        |FROM fp GROUP BY f HAVING COUNT(*) > 1
        |ORDER BY n_docs DESC, prefix_fp LIMIT 50""".stripMargin,

    "q_bloom_join" ->
      """WITH b AS (SELECT CAST(doc_id AS VARCHAR) AS x FROM documents WHERE doc_id < 50),
        |pos AS (SELECT ('0x' || substr(md5(x), 1, 8))::BIGINT % 1008 AS p FROM b
        |        UNION ALL
        |        SELECT ('0x' || substr(md5(x), 9, 8))::BIGINT % 1008 AS p FROM b),
        |words AS (SELECT p // 63 AS w_idx, bit_or(1::BIGINT << CAST(p % 63 AS INT)) AS w
        |          FROM pos GROUP BY p // 63),
        |probe AS (SELECT doc_id,
        |          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1008 AS p1,
        |          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT % 1008 AS p2
        |          FROM documents),
        |hit AS (SELECT doc_id,
        |          CASE WHEN (w1.w >> CAST(p1 % 63 AS INT)) & 1 = 1
        |                AND (w2.w >> CAST(p2 % 63 AS INT)) & 1 = 1 THEN 1 ELSE 0 END AS cand
        |        FROM probe
        |        LEFT JOIN words w1 ON p1 // 63 = w1.w_idx
        |        LEFT JOIN words w2 ON p2 // 63 = w2.w_idx)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
        |       CAST(SUM(cand) AS BIGINT) AS n_candidates,
        |       CAST(SUM(CASE WHEN doc_id < 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
        |       CAST(SUM(CASE WHEN cand = 1 AND doc_id >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
        |       floor(SUM(CASE WHEN cand = 1 AND doc_id >= 50 THEN 1 ELSE 0 END)
        |             / (COUNT(*) - 50.0) * 10000 + 0.5) / 10000 AS fp_rate
        |FROM hit""".stripMargin,

    "q_countmin" ->
      """WITH cells AS (
        |  SELECT r, ('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
        |             CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 64 AS cell,
        |         CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events CROSS JOIN (SELECT UNNEST([0,1,2,3]) AS r)
        |  GROUP BY 1, 2),
        |exact AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c_exact
        |          FROM events GROUP BY 1
        |          ORDER BY c_exact DESC, user_id LIMIT 20),
        |h AS (SELECT user_id, c_exact, r,
        |      ('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
        |       CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 64 AS cell
        |      FROM exact CROSS JOIN (SELECT UNNEST([0,1,2,3]) AS r))
        |SELECT h.user_id, h.c_exact, MIN(c.cnt) AS c_est,
        |       CAST(MIN(c.cnt) - h.c_exact AS BIGINT) AS overcount
        |FROM h JOIN cells c ON h.r = c.r AND h.cell = c.cell
        |GROUP BY h.user_id, h.c_exact
        |ORDER BY c_exact DESC, user_id""".stripMargin,

    "q_dim_stats" ->
      """WITH u AS (SELECT UNNEST(CAST(embedding AS DOUBLE[])) AS x,
        |                  generate_subscripts(embedding, 1) AS dim
        |           FROM embeddings)
        |SELECT CAST(dim AS BIGINT) AS dim, CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(AVG(x), 4) AS mean, ROUND(STDDEV_POP(x), 4) AS std,
        |       ROUND(MIN(x), 4) AS min_x, ROUND(MAX(x), 4) AS max_x
        |FROM u GROUP BY dim ORDER BY dim""".stripMargin,

    "q_rank_fusion" ->
      """WITH tok AS (SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\s+')) AS ts
        |             FROM documents),
        |q AS (SELECT doc_id AS q_id, ts AS qts FROM tok WHERE doc_id < 3),
        |lex AS (SELECT q_id, t.doc_id AS cand,
        |               CAST(len(list_intersect(qts, t.ts)) AS BIGINT) AS overlap
        |        FROM q JOIN tok t ON t.doc_id <> q_id),
        |lexr AS (SELECT q_id, cand,
        |                row_number() OVER (PARTITION BY q_id ORDER BY overlap DESC, cand) AS r
        |         FROM lex QUALIFY r <= 20),
        |qe AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
        |       FROM embeddings WHERE vec_id < 3),
        |vec AS (SELECT q_id, e.vec_id AS cand,
        |               ROUND(list_cosine_similarity(qv, CAST(e.embedding AS DOUBLE[])), 6) AS cos
        |        FROM qe JOIN embeddings e ON e.vec_id <> q_id),
        |vecr AS (SELECT q_id, cand,
        |                row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand) AS r
        |         FROM vec QUALIFY r <= 20),
        |fused AS (SELECT COALESCE(l.q_id, v.q_id) AS q_id, COALESCE(l.cand, v.cand) AS cand,
        |                 l.r AS lex_rank, v.r AS vec_rank,
        |                 ROUND(COALESCE(1.0/(60+l.r), 0) + COALESCE(1.0/(60+v.r), 0), 6) AS rrf
        |          FROM lexr l FULL OUTER JOIN vecr v ON l.q_id = v.q_id AND l.cand = v.cand),
        |top AS (SELECT q_id, cand, CAST(COALESCE(lex_rank, 0) AS BIGINT) AS lex_rank,
        |               CAST(COALESCE(vec_rank, 0) AS BIGINT) AS vec_rank, rrf,
        |               row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, cand) AS rn
        |        FROM fused QUALIFY rn <= 10)
        |SELECT q_id, CAST(rn AS BIGINT) AS rank, cand, lex_rank, vec_rank, rrf
        |FROM top ORDER BY q_id, rank""".stripMargin,

    "q_semdedup" ->
      """WITH c AS (
        |  SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cvec
        |  FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT e.vec_id, c.centroid_id,
        |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) AS sim
        |  FROM embeddings e CROSS JOIN c),
        |asg AS (
        |  SELECT vec_id, centroid_id AS cluster FROM (
        |    SELECT vec_id, centroid_id,
        |           row_number() OVER (PARTITION BY vec_id
        |             ORDER BY sim DESC, centroid_id) AS rn
        |    FROM scored) WHERE rn = 1),
        |evict AS (
        |  SELECT hi.vec_id,
        |         MAX(ROUND(list_cosine_similarity(
        |           CAST(ea.embedding AS DOUBLE[]),
        |           CAST(eb.embedding AS DOUBLE[])), 6)) AS max_lower_cos
        |  FROM asg lo JOIN asg hi
        |    ON lo.cluster = hi.cluster AND lo.vec_id < hi.vec_id
        |  JOIN embeddings ea ON ea.vec_id = lo.vec_id
        |  JOIN embeddings eb ON eb.vec_id = hi.vec_id
        |  GROUP BY hi.vec_id)
        |SELECT g.vec_id, g.cluster,
        |       COALESCE(p.max_lower_cos, 0.0) AS max_lower_cos,
        |       CAST(COALESCE(p.max_lower_cos, 0.0) < 0.92 AS INTEGER) AS is_kept
        |FROM asg g LEFT JOIN evict p ON g.vec_id = p.vec_id
        |ORDER BY g.vec_id""".stripMargin,

    // Mirrors the micro-unit quantized sketch: per-row values/products
    // floor to exact integers, sums are order-independent, and the
    // final expression shape matches VectorCovariance.eval op-for-op
    // so every IEEE step is bit-identical across engines.
    "q_embed_covariance" ->
      """WITH u AS (SELECT vec_id, UNNEST(CAST(embedding AS DOUBLE[])) AS x,
        |                  generate_subscripts(embedding, 1) AS dim
        |           FROM embeddings),
        |a AS (SELECT dim, SUM(FLOOR(x * 1000000.0 + 0.5)) AS sq FROM u GROUP BY dim),
        |p AS (SELECT a.dim AS dim_i, b.dim AS dim_j,
        |             SUM(FLOOR(a.x * b.x * 1000000.0 + 0.5)) AS sp, COUNT(*) AS n
        |      FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.dim <= b.dim
        |      GROUP BY 1, 2)
        |SELECT CAST(dim_i AS BIGINT) AS dim_i, CAST(dim_j AS BIGINT) AS dim_j,
        |       FLOOR((sp / (1000000.0 * n)
        |              - (CAST(ai.sq AS DOUBLE) * aj.sq)
        |                / (1000000.0 * 1000000.0 * n * n)) * 1000000.0 + 0.5)
        |         / 1000000.0 AS cov
        |FROM p JOIN a ai ON ai.dim = p.dim_i JOIN a aj ON aj.dim = p.dim_j
        |ORDER BY dim_i, dim_j""".stripMargin,

    "q_quality_classifier" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ts
        |           FROM documents),
        |f AS (SELECT doc_id,
        |             UNNEST(ts || CASE WHEN len(ts) >= 2
        |               THEN list_transform(range(1, len(ts)),
        |                      i -> ts[i] || ' ' || ts[i+1])
        |               ELSE CAST([] AS VARCHAR[]) END) AS f
        |      FROM t),
        |w AS (SELECT doc_id,
        |             ('0x' || substr(md5(f), 1, 15))::BIGINT % 2001 - 1000 AS w
        |      FROM f)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
        |       CAST(SUM(w) AS BIGINT) AS score_sum,
        |       CAST(SUM(w) > 0 AS INTEGER) AS keep
        |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_minhash_jaccard_est" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
        |  FROM documents),
        |shd AS (
        |  SELECT DISTINCT doc_id,
        |    UNNEST(list_transform(range(1, len(arr) - 1),
        |      i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS shingle
        |  FROM toks WHERE len(arr) >= 3),
        |hset AS (
        |  SELECT doc_id, list_sort(list(DISTINCT
        |    ('0x' || substr(md5(shingle), 1, 15))::BIGINT)) AS hl
        |  FROM shd GROUP BY doc_id),
        |mh AS (
        |  SELECT doc_id, p,
        |    min(('0x' || substr(md5(CAST(p // 2 AS VARCHAR) || ':' || shingle),
        |                        CAST(1 + 15 * (p % 2) AS INTEGER), 15))::BIGINT) AS mv
        |  FROM shd, range(8) t(p) GROUP BY doc_id, p),
        |sig AS (SELECT doc_id, list(mv ORDER BY p) AS sg FROM mh GROUP BY doc_id),
        |bands AS (
        |  SELECT doc_id, p // 2 AS band,
        |    string_agg(CAST(mv AS VARCHAR), ',' ORDER BY p) AS s
        |  FROM mh GROUP BY doc_id, p // 2),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.s = b.s AND a.doc_id < b.doc_id),
        |sc AS (
        |  SELECT da, db,
        |    CAST(len(list_filter([1,2,3,4,5,6,7,8],
        |      i -> sa.sg[i] = sb.sg[i])) AS BIGINT) AS n_match,
        |    ROUND(CAST(len(list_intersect(ha.hl, hb.hl)) AS DOUBLE) /
        |          (len(ha.hl) + len(hb.hl) - len(list_intersect(ha.hl, hb.hl))),
        |          4) AS exact_jaccard
        |  FROM pairs
        |  JOIN sig sa ON sa.doc_id = da JOIN sig sb ON sb.doc_id = db
        |  JOIN hset ha ON ha.doc_id = da JOIN hset hb ON hb.doc_id = db)
        |SELECT da, db, n_match, n_match / 8.0 AS est_jaccard, exact_jaccard,
        |       ROUND(ABS(n_match / 8.0 - exact_jaccard), 4) AS abs_err
        |FROM sc ORDER BY da, db""".stripMargin,

    "q_link_predict" ->
      """WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |li AS (SELECT l_orderkey, l_partkey FROM
        |         (SELECT *, COUNT(*) OVER (PARTITION BY l_orderkey) AS bsz FROM li0)
        |       WHERE bsz <= 120),
        |e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
        |      FROM li a JOIN li b
        |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |adj0 AS (SELECT pa AS u, pb AS v FROM e
        |         UNION ALL SELECT pb, pa FROM e),
        |deg AS (SELECT u, COUNT(*) AS deg FROM adj0 GROUP BY u
        |        HAVING COUNT(*) <= 500),
        |adj AS (SELECT a.u, a.v FROM adj0 a
        |        JOIN deg du ON du.u = a.u JOIN deg dv ON dv.u = a.v),
        |cand AS (SELECT x.u AS a, y.v AS c, COUNT(*) AS cn
        |         FROM adj x JOIN adj y ON x.v = y.u AND x.u < y.v
        |         GROUP BY 1, 2),
        |ne AS (SELECT a, c, cn FROM cand
        |       WHERE NOT EXISTS (SELECT 1 FROM e WHERE pa = a AND pb = c))
        |SELECT a, c, CAST(cn AS BIGINT) AS cn,
        |       CAST(da.deg + dc.deg AS BIGINT) AS deg_sum,
        |       ROUND(CAST(cn AS DOUBLE) / (da.deg + dc.deg - cn), 4) AS jacc
        |FROM ne JOIN deg da ON da.u = a JOIN deg dc ON dc.u = c
        |ORDER BY cn DESC, a, c LIMIT 50""".stripMargin,

    "q_bpe_train" -> TextOps.bpeTrainOracleSql,
    "q_unigram_train" -> TextOps.unigramTrainOracleSql,

    "q_bpe_merge" ->
      """WITH w AS (SELECT UNNEST(regexp_split_to_array(trim(text), '\s+')) AS word
        |           FROM documents),
        |cp AS (SELECT substr(word, CAST(i AS INT), 2) AS pair
        |       FROM w, UNNEST(range(1, len(word))) AS t(i)
        |       WHERE len(word) >= 2)
        |SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
        |FROM cp GROUP BY 1 ORDER BY n DESC, pair LIMIT 20""".stripMargin,

    "q_triangle_count" ->
      """WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |li AS (SELECT l_orderkey, l_partkey FROM
        |         (SELECT *, COUNT(*) OVER (PARTITION BY l_orderkey) AS bsz FROM li0)
        |       WHERE bsz <= 120),
        |e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
        |      FROM li a JOIN li b
        |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2)
        |SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
        |FROM e e1
        |JOIN e e2 ON e1.pb = e2.pa
        |JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
        |ORDER BY a, b, c""".stripMargin,

    "q_kmeans_iter" ->
      """WITH c AS (
        |  SELECT vec_id AS centroid_id, CAST(embedding AS DOUBLE[]) AS cvec
        |  FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT e.vec_id, c.centroid_id,
        |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) AS sim
        |  FROM embeddings e CROSS JOIN c),
        |r AS (
        |  SELECT vec_id, centroid_id,
        |         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, centroid_id) AS rn
        |  FROM scored),
        |m AS (SELECT centroid_id, vec_id FROM r WHERE rn = 1),
        |nm AS (SELECT centroid_id, COUNT(*) AS n_members FROM m GROUP BY 1),
        |u AS (SELECT m.centroid_id,
        |             UNNEST(CAST(e.embedding AS DOUBLE[])) AS x,
        |             generate_subscripts(e.embedding, 1) AS dim
        |      FROM m JOIN embeddings e USING (vec_id)),
        |agg AS (SELECT centroid_id, dim, AVG(x) AS new_mu FROM u GROUP BY 1, 2)
        |SELECT a.centroid_id, CAST(a.dim AS BIGINT) AS dim,
        |       CAST(nm.n_members AS BIGINT) AS n_members,
        |       ROUND(a.new_mu, 6) AS new_mu,
        |       ROUND(c.cvec[CAST(a.dim AS INTEGER)], 6) AS seed_x,
        |       ROUND(a.new_mu - c.cvec[CAST(a.dim AS INTEGER)], 6) AS shift
        |FROM agg a JOIN nm USING (centroid_id) JOIN c USING (centroid_id)
        |ORDER BY centroid_id, dim""".stripMargin,

    "q_survival_km" ->
      """WITH per AS (
        |  SELECT user_id,
        |         MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS t0,
        |         MIN(CASE WHEN event_type = 'purchase'
        |                  THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS tp,
        |         MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS tlast
        |  FROM events GROUP BY user_id),
        |dur AS (
        |  SELECT CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS observed,
        |         (COALESCE(tp, tlast) - t0) // 86400000000 AS t
        |  FROM per),
        |byt AS (
        |  SELECT t, SUM(observed) AS n_event, SUM(1 - observed) AS n_censor
        |  FROM dur GROUP BY t),
        |km AS (
        |  SELECT t, n_event, n_censor,
        |         SUM(n_event + n_censor) OVER () -
        |           COALESCE(SUM(n_event + n_censor) OVER (ORDER BY t
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
        |  FROM byt),
        |f AS (
        |  SELECT t, n_risk, n_event, n_censor,
        |         1.0 - CAST(n_event AS DOUBLE) / CAST(n_risk AS DOUBLE) AS factor
        |  FROM km)
        |SELECT CAST(t AS BIGINT) AS duration_days,
        |       CAST(n_risk AS BIGINT) AS n_risk,
        |       CAST(n_event AS BIGINT) AS n_event,
        |       CAST(n_censor AS BIGINT) AS n_censor,
        |       CASE WHEN MIN(factor) OVER (ORDER BY t
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 0 THEN 0.0
        |            ELSE ROUND(EXP(SUM(LN(CASE WHEN factor = 0 THEN 1.0 ELSE factor END))
        |                OVER (ORDER BY t
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) END AS surv
        |FROM f ORDER BY duration_days""".stripMargin,

    "q_dup_spans" -> TextOps.dupSpansOracleSql,
    "q_late_interaction" -> TextOps.lateInteractionOracleSql,

    "q_dup_substring" ->
      """WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
        |              FROM documents),
        |base AS (SELECT doc_id,
        |                list_transform(range(1, len(arr) - 3),
        |                  i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] || ' ' ||
        |                       arr[i+3] || ' ' || arr[i+4]) AS w
        |         FROM toks WHERE len(arr) >= 5),
        |wins AS (SELECT doc_id, UNNEST(w) AS g FROM base),
        |dup AS (SELECT g FROM (SELECT g, COUNT(DISTINCT doc_id) AS nd
        |                       FROM wins GROUP BY g) WHERE nd >= 2),
        |dp AS (SELECT doc_id, COUNT(*) AS n_dup
        |       FROM wins JOIN dup USING (g) GROUP BY doc_id)
        |SELECT b.doc_id, CAST(len(b.w) AS BIGINT) AS n_windows,
        |       CAST(COALESCE(dp.n_dup, 0) AS BIGINT) AS n_dup_windows,
        |       FLOOR(COALESCE(dp.n_dup, 0) / len(b.w) * 10000.0 + 0.5) / 10000.0 AS dup_frac,
        |       CAST(FLOOR(COALESCE(dp.n_dup, 0) / len(b.w) * 10000.0 + 0.5) / 10000.0 >= 0.2
        |            AS INTEGER) AS flag_dup
        |FROM base b LEFT JOIN dp ON dp.doc_id = b.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    "q_dedup_canonical" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr FROM documents
        |), shd AS (
        |  SELECT DISTINCT doc_id,
        |    UNNEST(list_transform(range(1, len(arr) - 1),
        |      i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS shingle
        |  FROM toks WHERE len(arr) >= 3
        |), mh AS (
        |  SELECT doc_id, p,
        |    min(('0x' || substr(md5(CAST(p // 2 AS VARCHAR) || ':' || shingle),
        |                        CAST(1 + 15 * (p % 2) AS INTEGER), 15))::BIGINT) AS mv
        |  FROM shd, range(8) t(p) GROUP BY doc_id, p
        |), bands AS (
        |  SELECT doc_id, p // 2 AS band,
        |    string_agg(CAST(mv AS VARCHAR), ',' ORDER BY p) AS sig
        |  FROM mh GROUP BY doc_id, p // 2
        |), pairs AS (
        |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
        |), edges AS (
        |  SELECT da AS a, db AS b FROM pairs
        |  UNION ALL SELECT db, da FROM pairs
        |), reach(node, r) AS (
        |  SELECT DISTINCT a, a FROM edges
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.node
        |), comp AS (
        |  SELECT node, MIN(r) AS comp FROM reach GROUP BY node
        |), q AS (
        |  SELECT doc_id,
        |         FLOOR((LEAST(n_tok / 100.0, 1.0) * 0.4
        |               + LEAST(stop_hits / n_tok * 5.0, 1.0) * 0.3
        |               + (1.0 - LEAST(punct / GREATEST(n_char, 1) * 10.0, 1.0)) * 0.3)
        |               * 10000.0 + 0.5) / 10000.0 AS quality
        |  FROM (SELECT doc_id,
        |               CAST(array_length(ts) AS DOUBLE) AS n_tok,
        |               CAST(array_length(list_filter(ts,
        |                 x -> x IN ('the','a','of','and','to','in','is','it','for','on'))) AS DOUBLE) AS stop_hits,
        |               CAST(array_length(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) AS punct,
        |               CAST(length(text) AS DOUBLE) AS n_char
        |        FROM (SELECT doc_id, text,
        |                     regexp_split_to_array(trim(text), '\s+') AS ts
        |              FROM documents) a) b
        |), lab AS (
        |  SELECT q.doc_id, COALESCE(c.comp, q.doc_id) AS comp, q.quality
        |  FROM q LEFT JOIN comp c ON c.node = q.doc_id
        |)
        |SELECT doc_id, comp, quality,
        |       first_value(doc_id) OVER (PARTITION BY comp
        |         ORDER BY quality DESC, doc_id) AS canonical_doc_id,
        |       CAST(doc_id = first_value(doc_id) OVER (PARTITION BY comp
        |         ORDER BY quality DESC, doc_id) AS INTEGER) AS keep
        |FROM lab
        |ORDER BY doc_id""".stripMargin,

    "q_feature_hashing" ->
      """WITH tf AS (
        |  SELECT token, COUNT(*) AS occ FROM (
        |    SELECT UNNEST(regexp_split_to_array(trim(text), '\s+')) AS token
        |    FROM documents) GROUP BY token),
        |b AS (SELECT ('0x' || substr(md5(token), 1, 8))::BIGINT % 1024 AS bucket,
        |             occ
        |      FROM tf),
        |pb AS (SELECT bucket, COUNT(*) AS load, SUM(occ) AS occ
        |       FROM b GROUP BY bucket),
        |l AS (SELECT load,
        |             CAST(COUNT(*) AS BIGINT) AS n_buckets,
        |             CAST(SUM(load) AS BIGINT) AS n_token_types,
        |             CAST(SUM(occ) AS BIGINT) AS n_occurrences
        |      FROM pb GROUP BY load),
        |e AS (SELECT CAST(0 AS BIGINT) AS load,
        |             CAST(1024 - (SELECT COUNT(*) FROM pb) AS BIGINT) AS n_buckets,
        |             CAST(0 AS BIGINT) AS n_token_types,
        |             CAST(0 AS BIGINT) AS n_occurrences)
        |SELECT * FROM (SELECT * FROM l UNION ALL SELECT * FROM e)
        |WHERE n_buckets > 0 ORDER BY load""".stripMargin,

    "q_dp_noise" ->
      """WITH c AS (SELECT event_type, COUNT(*) AS true_n
        |           FROM events GROUP BY 1),
        |u AS (SELECT event_type, true_n,
        |        ((('0x' || substr(md5(event_type), 1, 8))::BIGINT % 999999)
        |         + 1 - 500000) / 1e6 AS u
        |      FROM c),
        |n AS (SELECT event_type, true_n, u,
        |        -1.0 * sign(u) * ln(1 - 2 * abs(u)) AS noise
        |      FROM u)
        |SELECT event_type, true_n,
        |       FLOOR(noise * 10000.0 + 0.5) / 10000.0 AS noise,
        |       CAST(FLOOR(true_n + noise + 0.5) AS BIGINT) AS released_n,
        |       CAST(1.0 AS DOUBLE) AS epsilon
        |FROM n ORDER BY event_type""".stripMargin,

    "q_ips_eval" ->
      """WITH e AS (
        |  SELECT CAST(user_id % 4 AS BIGINT) AS segment,
        |         event_type AS action,
        |         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS r_c
        |  FROM events),
        |xa AS (SELECT segment, action, COUNT(*) AS n_xa, SUM(r_c) AS rsum_c
        |       FROM e GROUP BY 1, 2),
        |t AS (SELECT segment, n_xa, rsum_c,
        |             CASE WHEN action = 'purchase' THEN 3 ELSE 1 END AS w
        |      FROM xa),
        |t2 AS (SELECT segment, n_xa, rsum_c, w,
        |              (rsum_c * w * 1000000) // n_xa AS term_u
        |       FROM t)
        |SELECT segment,
        |       CAST(SUM(n_xa) AS BIGINT) AS n_x,
        |       CAST(COUNT(*) AS BIGINT) AS n_actions,
        |       FLOOR(SUM(rsum_c) * 1.0 / SUM(n_xa) * 10000.0 + 0.5)
        |         / 10000.0 AS logged_avg_cents,
        |       FLOOR(SUM(term_u) * 1.0 / (SUM(w) * 1000000)
        |             * 10000.0 + 0.5) / 10000.0 AS ips_avg_cents
        |FROM t2 GROUP BY segment ORDER BY segment""".stripMargin,

    "q_geohash_encode" -> StatsOps.geohashEncodeOracleSql,
    "q_removal_effect" -> AnalyticsOps.removalEffectOracleSql,
    "q_rendezvous_resize" -> CurationOps.rendezvousResizeOracleSql,

    "q_hll_md5" ->
      """WITH h AS (
        |  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
        |           AS h
        |  FROM (SELECT DISTINCT user_id FROM events)),
        |rk AS (SELECT h % 256 AS j, h // 256 AS w FROM h),
        |regs AS (SELECT j, MAX(r) AS m FROM (
        |  SELECT j,
        |    LEAST(CAST(bit_count((w & -w) - 1) AS BIGINT) + 1, 52) AS r
        |  FROM rk) t GROUP BY j),
        |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_filled,
        |          CAST(SUM(CAST(1 AS BIGINT) << CAST(52 - m AS INTEGER))
        |               AS BIGINT) AS sum_filled_u
        |        FROM regs),
        |ex AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
        |       FROM events),
        |est AS (SELECT agg.n_filled, ex.n_exact,
        |          (0.7213 / (1.0 + 1.079 / 256)) * 65536.0
        |            * 4503599627370496.0 /
        |            (agg.sum_filled_u +
        |             (256 - agg.n_filled) * 4503599627370496) AS raw_est
        |        FROM agg, ex),
        |fin AS (SELECT n_filled, n_exact,
        |          CASE WHEN raw_est <= 640.0 AND n_filled < 256
        |               THEN 256.0 * ln(256.0 / (256 - n_filled))
        |               ELSE raw_est END AS e
        |        FROM est)
        |SELECT n_filled, n_exact,
        |       FLOOR(e * 10000.0 + 0.5) / 10000.0 AS hll_estimate,
        |       FLOOR((e - n_exact) / n_exact * 10000.0 + 0.5) / 10000.0
        |         AS rel_err
        |FROM fin""".stripMargin,

    "q_bloom_fpr" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents
        |  UNION ALL SELECT doc_id + 2000000,
        |    array_to_string(arr[1:greatest(len(arr) - 1, 1)], ' ')
        |  FROM (SELECT doc_id,
        |          regexp_split_to_array(trim(text), '\s+') AS arr
        |        FROM documents)),
        |hsh AS (SELECT doc_id, md5(text) AS h FROM corpus),
        |ex AS (SELECT DISTINCT h FROM hsh WHERE doc_id % 2 = 0),
        |pos AS (SELECT ex.h,
        |          ('0x' || substr(md5(ex.h || ':' || i.i), 1, 8))::BIGINT
        |            % 65536 AS pos
        |        FROM ex, (SELECT UNNEST([0, 1, 2]) AS i) i),
        |bits AS (SELECT DISTINCT pos FROM pos),
        |bp AS (SELECT DISTINCT h FROM hsh
        |       WHERE doc_id % 2 = 1
        |         AND h NOT IN (SELECT h FROM ex)),
        |pp AS (SELECT bp.h,
        |         ('0x' || substr(md5(bp.h || ':' || i.i), 1, 8))::BIGINT
        |           % 65536 AS pos
        |       FROM bp, (SELECT UNNEST([0, 1, 2]) AS i) i),
        |per AS (SELECT h, COUNT(DISTINCT pos) AS np,
        |          COUNT(DISTINCT CASE WHEN pos IN (SELECT pos FROM bits)
        |                              THEN pos END) AS nh
        |        FROM pp GROUP BY h),
        |s1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS bits_set FROM bits),
        |s2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_absent_probes,
        |         CAST(SUM(CASE WHEN nh = np THEN 1 ELSE 0 END) AS BIGINT)
        |           AS false_positives
        |       FROM per)
        |SELECT CAST(65536 AS BIGINT) AS m_bits, CAST(3 AS BIGINT) AS k_hashes,
        |       s1.bits_set,
        |       FLOOR(s1.bits_set * 1.0 / 65536.0 * 10000.0 + 0.5) / 10000.0
        |         AS load_factor,
        |       s2.n_absent_probes, s2.false_positives,
        |       FLOOR(s2.false_positives * 1.0 /
        |             GREATEST(s2.n_absent_probes, 1)
        |             * 10000.0 + 0.5) / 10000.0 AS fpr
        |FROM s1, s2""".stripMargin,

    "q_dpp_join" ->
      """WITH dim AS (
        |  SELECT * FROM (VALUES
        |    ('purchase', 'conversion'), ('signup', 'conversion'),
        |    ('click', 'engagement'), ('view', 'engagement'),
        |    ('error', 'ops')) AS t(event_type, category))
        |SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
        |       CAST(SUM(CAST(FLOOR(e.value * 100.0 + 0.5) AS BIGINT))
        |            AS BIGINT) AS value_c
        |FROM events e JOIN dim ON dim.event_type = e.event_type
        |WHERE dim.category = 'conversion'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_yule_k" ->
      """WITH tf AS (
        |  SELECT lang, token, COUNT(*) AS m FROM (
        |    SELECT lang, UNNEST(regexp_split_to_array(trim(text), '\s+'))
        |             AS token
        |    FROM documents) t GROUP BY 1, 2)
        |SELECT lang,
        |       CAST(SUM(m) AS BIGINT) AS n_tokens,
        |       CAST(COUNT(*) AS BIGINT) AS n_types,
        |       CAST(SUM(m * m) AS BIGINT) AS sum_m2vm,
        |       FLOOR(10000.0 * (SUM(m * m) - SUM(m)) /
        |             (SUM(m) * 1.0 * SUM(m)) * 10000.0 + 0.5) / 10000.0
        |         AS yule_k
        |FROM tf GROUP BY lang ORDER BY lang""".stripMargin,

    "q_ctr_smoothing" ->
      """WITH pu AS (
        |  SELECT user_id, COUNT(*) AS n,
        |         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS k
        |  FROM events GROUP BY user_id),
        |pq AS (SELECT user_id, n, k, (k * 10000) // n AS r_u FROM pu),
        |mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |              CAST(SUM(r_u) AS BIGINT) AS sr,
        |              CAST(SUM(r_u * r_u) AS BIGINT) AS srr
        |       FROM pq),
        |ab AS (SELECT n_users, sr, srr,
        |         sr / (n_users * 1e4) AS m,
        |         (srr * 1.0 / n_users -
        |          (sr * 1.0 / n_users) * (sr * 1.0 / n_users)) / 1e8 AS v
        |       FROM mo),
        |ab2 AS (SELECT *,
        |          CASE WHEN v > 0 THEN m * (1.0 - m) / v - 1.0
        |               ELSE 0.0 END AS common
        |        FROM ab)
        |SELECT pq.user_id, CAST(pq.n AS BIGINT) AS n, CAST(pq.k AS BIGINT) AS k,
        |       FLOOR(pq.k * 1.0 / pq.n * 10000.0 + 0.5) / 10000.0 AS raw_rate,
        |       FLOOR(CASE WHEN ab2.common > 0
        |               THEN (pq.k + ab2.m * ab2.common) /
        |                    (pq.n + ab2.m * ab2.common +
        |                     (1.0 - ab2.m) * ab2.common)
        |               ELSE pq.k * 1.0 / pq.n END
        |             * 10000.0 + 0.5) / 10000.0 AS shrunk_rate
        |FROM pq, ab2 ORDER BY pq.user_id""".stripMargin,

    "q_pinball_loss" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         epoch(date_trunc('day', CAST(ts AS TIMESTAMP))) AS day,
        |         CAST(SUM(ROUND(value * 100)) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |lagd AS (SELECT event_type, x,
        |           LAG(x, 7) OVER (PARTITION BY event_type ORDER BY day) AS f
        |         FROM daily),
        |e AS (SELECT event_type, x - f AS d FROM lagd WHERE f IS NOT NULL),
        |q AS (SELECT event_type, d, UNNEST([5, 9]) AS q10 FROM e),
        |p AS (SELECT event_type, q10,
        |             GREATEST(q10 * d, (q10 - 10) * d) AS pin10_c
        |      FROM q)
        |SELECT event_type,
        |       FLOOR(q10 / 10.0 * 10000.0 + 0.5) / 10000.0 AS quantile,
        |       CAST(COUNT(*) AS BIGINT) AS n_days,
        |       CAST(SUM(pin10_c) AS BIGINT) AS total_pin10_c,
        |       FLOOR(SUM(pin10_c) * 1.0 / (COUNT(*) * 10.0)
        |             * 10000.0 + 0.5) / 10000.0 AS mean_pinball_c
        |FROM p GROUP BY event_type, q10
        |ORDER BY event_type, quantile""".stripMargin,

    "q_lr_step" ->
      """WITH t AS (SELECT CASE WHEN label = 0 THEN 1 ELSE 0 END AS y,
        |                  CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |e AS (SELECT t.y, j.j AS dim, t.v[j.j] AS x
        |      FROM t, LATERAL (SELECT UNNEST(range(1, 65)) AS j) j),
        |g AS (SELECT dim,
        |        CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(CAST(FLOOR((0.5 - y) * x * 1000000.0 + 0.5)
        |                      AS BIGINT)) AS BIGINT) AS grad_u
        |      FROM e GROUP BY dim)
        |SELECT CAST(dim AS BIGINT) AS dim, n, grad_u,
        |       FLOOR(-0.1 * grad_u / (n * 1000000.0) * 1000000.0 + 0.5)
        |         / 1000000.0 AS w_new
        |FROM g ORDER BY dim""".stripMargin,

    "q_pseudonymize" ->
      """WITH t AS (
        |  SELECT user_id,
        |         substr(md5('graft-salt-v1:' || CAST(user_id AS VARCHAR)),
        |                1, 8) AS token
        |  FROM events),
        |u AS (SELECT user_id, MIN(token) AS token, COUNT(*) AS n_ev
        |      FROM t GROUP BY user_id),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        |             CAST(COUNT(DISTINCT token) AS BIGINT) AS n_tokens,
        |             CAST(COUNT(*) - COUNT(DISTINCT token) AS BIGINT)
        |               AS n_collisions,
        |             CAST(SUM(n_ev) AS BIGINT) AS n_events
        |      FROM u),
        |v AS (SELECT CAST(SUM(c) AS BIGINT) AS n_events_via_token
        |      FROM (SELECT COUNT(*) AS c FROM t GROUP BY token))
        |SELECT a.n_users, a.n_tokens, a.n_collisions, a.n_events,
        |       v.n_events_via_token,
        |       CASE WHEN a.n_events = v.n_events_via_token
        |            THEN 1 ELSE 0 END AS lossless
        |FROM a, v""".stripMargin,

    "q_word_analogy" ->
      """WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |p AS (SELECT probe, 3 * probe AS id_a, 3 * probe + 1 AS id_b,
        |             3 * probe + 2 AS id_c
        |      FROM (SELECT UNNEST(range(5)) AS probe)),
        |tri AS (SELECT p.probe, p.id_a, p.id_b, p.id_c,
        |          list_transform(range(1, 65),
        |            i -> a.v[i] - b.v[i] + c.v[i]) AS target
        |        FROM p JOIN t a ON a.vec_id = p.id_a
        |               JOIN t b ON b.vec_id = p.id_b
        |               JOIN t c ON c.vec_id = p.id_c),
        |sc AS (SELECT tri.probe, tri.id_a, tri.id_b, tri.id_c, t.vec_id,
        |         ROUND(
        |           list_sum(list_transform(range(1, 65),
        |             i -> tri.target[i] * t.v[i])) /
        |           (sqrt(list_sum(list_transform(range(1, 65),
        |              i -> tri.target[i] * tri.target[i]))) *
        |            sqrt(list_sum(list_transform(range(1, 65),
        |              i -> t.v[i] * t.v[i])))), 6) AS cos_sim
        |       FROM tri, t
        |       WHERE t.vec_id <> tri.id_a AND t.vec_id <> tri.id_b
        |         AND t.vec_id <> tri.id_c),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe
        |         ORDER BY cos_sim DESC, vec_id) AS rn FROM sc)
        |SELECT CAST(probe AS BIGINT) AS probe,
        |       CAST(id_a AS BIGINT) AS id_a,
        |       CAST(id_b AS BIGINT) AS id_b,
        |       CAST(id_c AS BIGINT) AS id_c,
        |       vec_id AS best_id,
        |       FLOOR(cos_sim * 10000.0 + 0.5) / 10000.0 AS cos_sim
        |FROM rk WHERE rn = 1 ORDER BY probe""".stripMargin,

    "q_stream_neardup_lsh" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents
        |  UNION ALL SELECT doc_id + 2000000,
        |    array_to_string(arr[1:greatest(len(arr) - 1, 1)], ' ')
        |  FROM (SELECT doc_id,
        |          regexp_split_to_array(trim(text), '\s+') AS arr
        |        FROM documents)),
        |toks AS (SELECT doc_id,
        |           regexp_split_to_array(trim(text), '\s+') AS arr
        |         FROM corpus),
        |shd AS (
        |  SELECT DISTINCT doc_id,
        |    UNNEST(list_transform(range(1, len(arr) - 1),
        |      i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS shingle
        |  FROM toks WHERE len(arr) >= 3),
        |mh AS (
        |  SELECT doc_id, p,
        |    min(('0x' || substr(md5(CAST(p // 2 AS VARCHAR) || ':' || shingle),
        |                        CAST(1 + 15 * (p % 2) AS INTEGER), 15))::BIGINT) AS mv
        |  FROM shd, range(8) t(p) GROUP BY doc_id, p),
        |bands AS (
        |  SELECT doc_id, p // 2 AS band,
        |    string_agg(CAST(mv AS VARCHAR), ',' ORDER BY p) AS sig
        |  FROM mh GROUP BY doc_id, p // 2),
        |ex AS (SELECT DISTINCT band, sig FROM bands
        |       WHERE doc_id < 1000000 AND doc_id % 2 = 0),
        |pb AS (SELECT doc_id, band, sig FROM bands WHERE doc_id >= 1000000),
        |de AS (SELECT DISTINCT pb.doc_id FROM pb JOIN ex USING (band, sig)),
        |fi AS (SELECT band, sig, MIN(doc_id) AS first_id
        |       FROM pb GROUP BY 1, 2),
        |dib AS (SELECT DISTINCT pb.doc_id FROM pb JOIN fi USING (band, sig)
        |        WHERE pb.doc_id > fi.first_id),
        |cls AS (
        |  SELECT c.doc_id,
        |    CASE WHEN c.doc_id IN (SELECT doc_id FROM de) THEN 'dup_of_existing'
        |         WHEN c.doc_id IN (SELECT doc_id FROM dib) THEN 'dup_in_batch'
        |         ELSE 'unique' END AS status
        |  FROM corpus c WHERE c.doc_id >= 1000000)
        |SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       FLOOR(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER ()
        |             * 10000.0 + 0.5) / 10000.0 AS share
        |FROM cls GROUP BY status ORDER BY status""".stripMargin,

    // the partitioned door's oracle replays the SAME flat banding
    // algebra as q_stream_neardup_lsh, restricted to the bounded
    // arriving batch (both copies of docs 0-24) and emitted per-doc —
    // the Spark side's bucket layout and partition push must be
    // invisible here
    "q_stream_neardup_part" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents
        |  UNION ALL SELECT doc_id + 2000000,
        |    array_to_string(arr[1:greatest(len(arr) - 1, 1)], ' ')
        |  FROM (SELECT doc_id,
        |          regexp_split_to_array(trim(text), '\s+') AS arr
        |        FROM documents)),
        |toks AS (SELECT doc_id,
        |           regexp_split_to_array(trim(text), '\s+') AS arr
        |         FROM corpus),
        |shd AS (
        |  SELECT DISTINCT doc_id,
        |    UNNEST(list_transform(range(1, len(arr) - 1),
        |      i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS shingle
        |  FROM toks WHERE len(arr) >= 3),
        |mh AS (
        |  SELECT doc_id, p,
        |    min(('0x' || substr(md5(CAST(p // 2 AS VARCHAR) || ':' || shingle),
        |                        CAST(1 + 15 * (p % 2) AS INTEGER), 15))::BIGINT) AS mv
        |  FROM shd, range(8) t(p) GROUP BY doc_id, p),
        |bands AS (
        |  SELECT doc_id, p // 2 AS band,
        |    string_agg(CAST(mv AS VARCHAR), ',' ORDER BY p) AS sig
        |  FROM mh GROUP BY doc_id, p // 2),
        |ex AS (SELECT DISTINCT band, sig FROM bands
        |       WHERE doc_id < 1000000 AND doc_id % 2 = 0),
        |pb AS (SELECT doc_id, band, sig FROM bands
        |       WHERE doc_id >= 1000000 AND doc_id % 1000000 < 25),
        |de AS (SELECT DISTINCT pb.doc_id FROM pb JOIN ex USING (band, sig)),
        |fi AS (SELECT band, sig, MIN(doc_id) AS first_id
        |       FROM pb GROUP BY 1, 2),
        |dib AS (SELECT DISTINCT pb.doc_id FROM pb JOIN fi USING (band, sig)
        |        WHERE pb.doc_id > fi.first_id)
        |SELECT c.doc_id,
        |  CASE WHEN c.doc_id IN (SELECT doc_id FROM de) THEN 'dup_of_existing'
        |       WHEN c.doc_id IN (SELECT doc_id FROM dib) THEN 'dup_in_batch'
        |       ELSE 'unique' END AS status
        |FROM corpus c
        |WHERE c.doc_id >= 1000000 AND c.doc_id % 1000000 < 25
        |ORDER BY c.doc_id""".stripMargin,

    "q_incremental_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents
        |  UNION ALL SELECT doc_id + 2000000,
        |    array_to_string(arr[1:greatest(len(arr) - 1, 1)], ' ')
        |  FROM (SELECT doc_id,
        |          regexp_split_to_array(trim(text), '\s+') AS arr
        |        FROM documents)),
        |h AS (SELECT doc_id, md5(text) AS h FROM corpus),
        |ex AS (SELECT DISTINCT h FROM h WHERE doc_id % 2 = 0),
        |b AS (SELECT doc_id, h FROM h WHERE doc_id % 2 = 1),
        |f AS (SELECT h, MIN(doc_id) AS first_id FROM b GROUP BY h),
        |cls AS (SELECT b.doc_id,
        |          CASE WHEN b.h IN (SELECT h FROM ex) THEN 'dup_of_existing'
        |               WHEN b.doc_id > f.first_id THEN 'dup_in_batch'
        |               ELSE 'unique' END AS status
        |        FROM b JOIN f USING (h))
        |SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       FLOOR(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER ()
        |             * 10000.0 + 0.5) / 10000.0 AS share
        |FROM cls GROUP BY status ORDER BY status""".stripMargin,

    "q_l_diversity" ->
      """WITH ps AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
        |         c_mktsegment AS segment,
        |         COUNT(*) AS seg_n
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT nation, bal_bucket,
        |       CAST(SUM(seg_n) AS BIGINT) AS n,
        |       CAST(COUNT(*) AS BIGINT) AS distinct_sensitive,
        |       CAST(MAX(seg_n) AS BIGINT) AS modal_count,
        |       CAST(COUNT(*) >= 3 AS INTEGER) AS l_diverse
        |FROM ps GROUP BY nation, bal_bucket
        |ORDER BY nation, bal_bucket""".stripMargin,

    "q_kanonymity" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |       c_mktsegment AS segment,
        |       CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
        |       COUNT(*) AS n,
        |       CAST(COUNT(*) >= 5 AS INTEGER) AS k_anonymous
        |FROM customer
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    "q_winsorize" ->
      """WITH cents AS (
        |  SELECT event_type, CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM events),
        |hist AS (SELECT event_type, c, COUNT(*) AS hn FROM cents GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, c,
        |         SUM(hn) OVER (PARTITION BY event_type ORDER BY c
        |           ROWS UNBOUNDED PRECEDING) AS cumn,
        |         SUM(hn) OVER (PARTITION BY event_type) AS n
        |  FROM hist),
        |th AS (
        |  SELECT event_type,
        |         MIN(CASE WHEN cumn >= CEIL(0.05 * n) THEN c END) AS lo,
        |         MIN(CASE WHEN cumn >= CEIL(0.95 * n) THEN c END) AS hi
        |  FROM cum GROUP BY 1)
        |SELECT cents.event_type, COUNT(*) AS n,
        |       MAX(lo) / 100.0 AS p05, MAX(hi) / 100.0 AS p95,
        |       FLOOR(SUM(c) / (COUNT(*) * 100.0) * 10000.0 + 0.5) / 10000.0
        |         AS mean_raw,
        |       FLOOR(SUM(LEAST(GREATEST(c, lo), hi)) / (COUNT(*) * 100.0)
        |             * 10000.0 + 0.5) / 10000.0 AS mean_winsor
        |FROM cents JOIN th USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_oov_rate" ->
      """WITH terms AS (
        |  SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |counts AS (SELECT term, COUNT(*) AS n FROM terms GROUP BY 1),
        |vocab AS (SELECT term FROM counts ORDER BY n DESC, term LIMIT 1000)
        |SELECT t.doc_id, COUNT(*) AS n_tokens,
        |       CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_oov,
        |       FLOOR(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
        |             / CAST(COUNT(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0
        |         AS oov_rate
        |FROM terms t LEFT JOIN vocab v ON t.term = v.term
        |GROUP BY t.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    "q_negative_sample" ->
      """WITH nn AS (SELECT COUNT(*) AS n_ids FROM documents),
        |draws AS (
        |  SELECT doc_id, lang AS lang_a, draw,
        |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
        |                             CAST(draw AS VARCHAR)), 1, 14))::BIGINT
        |           % n_ids AS h,
        |         n_ids
        |  FROM documents
        |  CROSS JOIN nn
        |  CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS draw) t),
        |neg AS (
        |  SELECT doc_id, lang_a, draw,
        |         CASE WHEN h = doc_id THEN (h + 1) % n_ids ELSE h END AS neg_id
        |  FROM draws)
        |SELECT g.doc_id, g.draw, g.neg_id,
        |       CAST(g.lang_a <> b.lang AS INTEGER) AS cross_lang
        |FROM neg g JOIN documents b ON g.neg_id = b.doc_id
        |ORDER BY g.doc_id, g.draw""".stripMargin,

    "q_containment_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |         array_to_string(arr[1:GREATEST(len(arr) - 1, 1)], ' ')
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
        |        FROM documents) t),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    UNNEST(list_transform(range(1, len(arr) - 3),
        |      i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] || ' ' ||
        |           arr[i+3] || ' ' || arr[i+4])) AS g
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
        |        FROM corpus) t2
        |  WHERE len(arr) >= 5),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
        |keep AS (
        |  SELECT sh.doc_id, sh.g FROM sh
        |  JOIN (SELECT g FROM sh GROUP BY g HAVING COUNT(*) <= 64) ok
        |    ON sh.g = ok.g),
        |inter AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS n_common
        |  FROM keep a JOIN keep b ON a.g = b.g AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT da, db, sa.n_sh AS n_a, sb.n_sh AS n_b, n_common,
        |       FLOOR(n_common / CAST(sa.n_sh AS DOUBLE) * 10000.0 + 0.5)
        |         / 10000.0 AS containment
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = da
        |JOIN sizes sb ON sb.doc_id = db
        |WHERE sa.n_sh <= sb.n_sh
        |  AND FLOOR(n_common / CAST(sa.n_sh AS DOUBLE) * 10000.0 + 0.5)
        |      / 10000.0 >= 0.8
        |ORDER BY da, db""".stripMargin,

    "q_containment_hybrid" -> TextOps.containmentHybridOracleSql,

    "q_domain_cap" ->
      """WITH r AS (SELECT source, doc_id,
        |             row_number() OVER (PARTITION BY source
        |               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |           FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(CASE WHEN rk <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       CAST(SUM(CASE WHEN rk <= 10 THEN doc_id END) AS BIGINT) AS kept_id_sum
        |FROM r GROUP BY source ORDER BY source""".stripMargin,

    "q_dataset_card" ->
      """WITH base AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
        |         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |         CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique
        |  FROM documents),
        |tok AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |         CAST(COUNT(DISTINCT w) AS BIGINT) AS vocab_size
        |  FROM (SELECT UNNEST(regexp_split_to_array(trim(text), '\s+')) AS w
        |        FROM documents)),
        |tl AS (
        |  SELECT lang AS top_lang, CAST(COUNT(*) AS BIGINT) AS top_lang_n
        |  FROM documents GROUP BY lang
        |  ORDER BY COUNT(*) DESC, lang LIMIT 1)
        |SELECT n_docs, n_sources, n_langs, n_tokens, vocab_size,
        |       ROUND(CAST(n_tokens AS DOUBLE) / n_docs, 4) AS mean_tokens,
        |       top_lang,
        |       ROUND(CAST(top_lang_n AS DOUBLE) / n_docs, 4) AS top_lang_share,
        |       ROUND(1.0 - CAST(n_unique AS DOUBLE) / n_docs, 4) AS dup_rate
        |FROM base, tok, tl""".stripMargin,

    "q_gopher_rules" ->
      """WITH f AS (
        |  SELECT lang,
        |         len(t) AS n,
        |         length(regexp_replace(trim(text), '\s+', '', 'g')) AS wchars,
        |         len(list_distinct(t)) AS ndistinct,
        |         list_sum(list_transform(t, w ->
        |           CASE WHEN w IN ('the','a','and','of','to','in','is')
        |                THEN 1 ELSE 0 END)) AS nstop,
        |         list_max(list_transform(t, w -> length(w))) AS maxwl
        |  FROM (SELECT lang, text,
        |               regexp_split_to_array(trim(text), '\s+') AS t
        |        FROM documents)),
        |r AS (
        |  SELECT lang,
        |         CASE WHEN n BETWEEN 30 AND 90 THEN 1 ELSE 0 END AS r1,
        |         CASE WHEN wchars >= 3 * n AND wchars <= 10 * n
        |              THEN 1 ELSE 0 END AS r2,
        |         CASE WHEN 2 * ndistinct >= n THEN 1 ELSE 0 END AS r3,
        |         CASE WHEN nstop >= 2 THEN 1 ELSE 0 END AS r4,
        |         CASE WHEN maxwl <= 15 THEN 1 ELSE 0 END AS r5
        |  FROM f)
        |SELECT lang,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(r1) AS BIGINT) AS word_count_pass,
        |       CAST(SUM(r2) AS BIGINT) AS mean_word_len_pass,
        |       CAST(SUM(r3) AS BIGINT) AS ttr_pass,
        |       CAST(SUM(r4) AS BIGINT) AS stopword_pass,
        |       CAST(SUM(r5) AS BIGINT) AS max_word_len_pass,
        |       CAST(SUM(r1 * r2 * r3 * r4 * r5) AS BIGINT) AS all_pass,
        |       FLOOR(SUM(r1 * r2 * r3 * r4 * r5) * 1.0 / COUNT(*)
        |             * 10000.0 + 0.5) / 10000.0 AS keep_rate
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin,

    "q_url_dedup" ->
      """WITH raw AS (
        |  SELECT 'https://' ||
        |         CASE WHEN event_id % 2 = 0 THEN 'Shop.Example.COM'
        |              ELSE 'shop.example.com' END ||
        |         '/p/' || event_type ||
        |         CASE WHEN event_id % 3 = 0 THEN '/' ELSE '' END ||
        |         '?id=' || CAST(user_id % 50 AS VARCHAR) ||
        |         CASE WHEN event_id % 4 = 0
        |              THEN '&utm_source=mail&utm_campaign=x' ELSE '' END ||
        |         CASE WHEN event_id % 5 = 0 THEN '#frag' ELSE '' END AS url
        |  FROM events),
        |c AS (
        |  SELECT url,
        |         'https://' ||
        |         lower(regexp_extract(url, 'https://([^/]+)', 1)) ||
        |         rtrim(regexp_extract(url, 'https://[^/]+([^?#]*)', 1), '/') ||
        |         '?id=' || regexp_extract(url, '[?&]id=([^&#]*)', 1)
        |           AS canonical_url
        |  FROM raw)
        |SELECT canonical_url,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_variants
        |FROM c GROUP BY canonical_url
        |ORDER BY canonical_url""".stripMargin,

    "q_encoding_audit" ->
      """WITH inj AS (
        |  SELECT lang,
        |         text ||
        |         CASE WHEN doc_id % 7 = 0 THEN ' �你好' ELSE '' END ||
        |         CASE WHEN doc_id % 11 = 0 THEN chr(7) ELSE '' END AS txt
        |  FROM documents),
        |m AS (
        |  SELECT lang,
        |         length(txt) AS nc,
        |         strlen(txt) AS nb,
        |         length(txt) - length(regexp_replace(txt,
        |           '[^\x00-\x7F]', '', 'g')) AS non_ascii,
        |         CASE WHEN contains(txt, '�') THEN 1 ELSE 0 END AS has_repl,
        |         CASE WHEN regexp_matches(txt,
        |           '[\x00-\x08\x0B\x0C\x0E-\x1F]') THEN 1 ELSE 0 END AS has_ctrl
        |  FROM inj)
        |SELECT lang,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(nc) AS BIGINT) AS total_chars,
        |       CAST(SUM(nb) AS BIGINT) AS total_bytes,
        |       CAST(SUM(non_ascii) AS BIGINT) AS non_ascii_chars,
        |       CAST(SUM(has_repl) AS BIGINT) AS docs_with_replacement,
        |       CAST(SUM(has_ctrl) AS BIGINT) AS docs_with_control,
        |       FLOOR((SUM(nc) - SUM(non_ascii)) * 1.0 / SUM(nc)
        |             * 10000.0 + 0.5) / 10000.0 AS ascii_ratio
        |FROM m GROUP BY lang ORDER BY lang""".stripMargin,

    "q_quality_funnel" ->
      """WITH f AS (
        |  SELECT CASE WHEN n_tok >= 20 THEN 1 ELSE 0 END AS g1,
        |         CASE WHEN n_tok >= 20 AND mwl >= 2.0 AND mwl <= 10.0
        |              THEN 1 ELSE 0 END AS g2,
        |         CASE WHEN n_tok >= 20 AND mwl >= 2.0 AND mwl <= 10.0
        |                   AND sr >= 0.02 THEN 1 ELSE 0 END AS g3
        |  FROM (SELECT len(t) AS n_tok,
        |               CAST(length(regexp_replace(trim(text), '\s+', '', 'g'))
        |                    AS DOUBLE) / len(t) AS mwl,
        |               CAST(list_sum(list_transform(t,
        |                 w -> CASE WHEN w IN ('a','the','and','of','to')
        |                      THEN 1 ELSE 0 END)) AS DOUBLE) / len(t) AS sr
        |        FROM (SELECT regexp_split_to_array(trim(text), '\s+') AS t, text
        |              FROM documents))),
        |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_in,
        |               CAST(SUM(g1) AS BIGINT) AS s1,
        |               CAST(SUM(g2) AS BIGINT) AS s2,
        |               CAST(SUM(g3) AS BIGINT) AS s3 FROM f)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS stage, 'min_length' AS gate, n_in, s1 AS n_out,
        |         ROUND(CAST(s1 AS DOUBLE) / n_in, 4) AS pass_rate FROM agg
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), 'word_shape', s1, s2,
        |         ROUND(CAST(s2 AS DOUBLE) / s1, 4) FROM agg
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), 'stopword_floor', s2, s3,
        |         ROUND(CAST(s3 AS DOUBLE) / s2, 4) FROM agg)
        |ORDER BY stage""".stripMargin,

    "q_gram_novelty" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
        |           FROM documents),
        |g AS (SELECT DISTINCT doc_id, g FROM (
        |        SELECT doc_id,
        |               UNNEST(list_transform(generate_series(1, len(tk) - 2),
        |                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g
        |        FROM t WHERE len(tk) >= 3)),
        |f AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY g) AS first_doc
        |      FROM g)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |       CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_novel,
        |       FLOOR(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
        |             / CAST(COUNT(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0
        |         AS novelty
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_kneser_ney" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
        |           FROM documents),
        |b0 AS (SELECT doc_id,
        |              UNNEST(list_transform(generate_series(1, len(tk) - 1),
        |                i -> {'w1': tk[i], 'w2': tk[i+1]})) AS bg
        |       FROM t WHERE len(tk) >= 2),
        |b AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2,
        |             CAST(COUNT(*) AS BIGINT) AS cnt
        |      FROM b0 GROUP BY 1, 2, 3),
        |m AS (SELECT w1, w2, CAST(SUM(cnt) AS BIGINT) AS cb FROM b GROUP BY 1, 2),
        |l AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS cl,
        |             CAST(COUNT(*) AS BIGINT) AS nl FROM m GROUP BY 1),
        |r AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS nc FROM m GROUP BY 1),
        |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS nbt FROM m),
        |sc AS (SELECT b.doc_id, b.cnt,
        |         ln(((4.0 * m.cb - 3.0) * g.nbt + 3.0 * l.nl * r.nc)
        |            / (4.0 * l.cl * g.nbt)) AS lp
        |       FROM b JOIN m ON m.w1 = b.w1 AND m.w2 = b.w2
        |       JOIN l ON l.w1 = b.w1 JOIN r ON r.w2 = b.w2 CROSS JOIN g)
        |SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
        |       FLOOR(SUM(cnt * lp) / SUM(cnt) * 10000.0 + 0.5) / 10000.0
        |         AS avg_kn_logprob
        |FROM sc GROUP BY doc_id
        |ORDER BY avg_kn_logprob ASC, doc_id LIMIT 100""".stripMargin,

    "q_delta_varint" ->
      """WITH p AS (SELECT doc_id,
        |                  UNNEST(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS term
        |           FROM documents),
        |gp AS (SELECT term, doc_id,
        |         COALESCE(doc_id - LAG(doc_id) OVER (PARTITION BY term ORDER BY doc_id),
        |                  doc_id) AS gap
        |       FROM p),
        |v AS (SELECT term,
        |        CASE WHEN gap < 128 THEN 1
        |             WHEN gap < 16384 THEN 2
        |             WHEN gap < 2097152 THEN 3
        |             WHEN gap < 268435456 THEN 4
        |             ELSE 5 END AS vb
        |      FROM gp),
        |pt AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
        |              CAST(SUM(vb) AS BIGINT) AS vbytes
        |       FROM v GROUP BY 1)
        |SELECT CAST(length(format('{:b}', df)) - 1 AS BIGINT) AS df_bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n_terms,
        |       CAST(SUM(df) AS BIGINT) AS n_postings,
        |       CAST(SUM(df) * 8 AS BIGINT) AS raw_bytes,
        |       CAST(SUM(vbytes) AS BIGINT) AS varint_bytes,
        |       FLOOR(SUM(vbytes) / (SUM(df) * 8.0) * 10000.0 + 0.5) / 10000.0
        |         AS compress_ratio
        |FROM pt GROUP BY 1 ORDER BY df_bucket""".stripMargin,

    "q_mv_rewrite" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT))
        |            AS BIGINT) AS sum_price_cents,
        |       MIN(l_extendedprice) AS min_price,
        |       MAX(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY 1, 2
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_bigram_logprob" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
        |           FROM documents),
        |b0 AS (SELECT doc_id,
        |              UNNEST(list_transform(generate_series(1, len(tk) - 1),
        |                i -> {'w1': tk[i], 'w2': tk[i+1]})) AS bg
        |       FROM t WHERE len(tk) >= 2),
        |b AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2,
        |             CAST(COUNT(*) AS BIGINT) AS cnt
        |      FROM b0 GROUP BY 1, 2, 3),
        |c AS (SELECT doc_id, cnt,
        |             SUM(cnt) OVER (PARTITION BY w1, w2) AS cb,
        |             SUM(cnt) OVER (PARTITION BY w1) AS cl
        |      FROM b)
        |SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
        |       FLOOR(SUM(cnt * ln(CAST(cb AS DOUBLE) / cl)) / SUM(cnt)
        |             * 10000.0 + 0.5) / 10000.0 AS avg_logprob
        |FROM c GROUP BY doc_id
        |ORDER BY avg_logprob ASC, doc_id LIMIT 100""".stripMargin,

    "q_skew_audit" ->
      """WITH p1 AS (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
        |p2 AS (SELECT l_partkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
        |p3 AS (SELECT l_suppkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1)
        |SELECT * FROM (
        |  SELECT 'l_orderkey' AS key_col, CAST(COUNT(*) AS BIGINT) AS n_keys,
        |         CAST(SUM(c) AS BIGINT) AS n_rows, CAST(MAX(c) AS BIGINT) AS max_cnt,
        |         ROUND(MAX(c) * COUNT(*) / CAST(SUM(c) AS DOUBLE), 4) AS skew_ratio,
        |         ROUND(MAX(c) / CAST(SUM(c) AS DOUBLE), 6) AS top_key_share
        |  FROM p1
        |  UNION ALL
        |  SELECT 'l_partkey', CAST(COUNT(*) AS BIGINT), CAST(SUM(c) AS BIGINT),
        |         CAST(MAX(c) AS BIGINT),
        |         ROUND(MAX(c) * COUNT(*) / CAST(SUM(c) AS DOUBLE), 4),
        |         ROUND(MAX(c) / CAST(SUM(c) AS DOUBLE), 6)
        |  FROM p2
        |  UNION ALL
        |  SELECT 'l_suppkey', CAST(COUNT(*) AS BIGINT), CAST(SUM(c) AS BIGINT),
        |         CAST(MAX(c) AS BIGINT),
        |         ROUND(MAX(c) * COUNT(*) / CAST(SUM(c) AS DOUBLE), 4),
        |         ROUND(MAX(c) / CAST(SUM(c) AS DOUBLE), 6)
        |  FROM p3)
        |ORDER BY key_col""".stripMargin,

    "q_skew_join_aqe" -> ScaleOps.skewJoinAqeOracleSql,

    "q_event_pattern" ->
      """WITH s AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |                  string_agg(substr(event_type, 1, 1), ''
        |                    ORDER BY CAST(ts AS TIMESTAMP), event_id) AS seq
        |           FROM events GROUP BY user_id)
        |SELECT user_id, n_events,
        |       CAST(len(regexp_extract_all(seq, 'vc+p')) AS BIGINT)
        |         AS n_conversions,
        |       CAST(CASE WHEN len(regexp_extract_all(seq, 'vc+p')) > 0
        |            THEN 1 ELSE 0 END AS INTEGER) AS converted
        |FROM s ORDER BY user_id""".stripMargin,

    "q_embed_health" ->
      """WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (SELECT len(v) AS dim,
        |             list_sum(list_transform(v, x -> x * x)) AS ss,
        |             CASE WHEN len(list_filter(v,
        |               x -> isnan(x) OR isinf(x))) > 0 THEN 1 ELSE 0 END AS bad
        |      FROM e)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |       CAST(SUM(CASE WHEN dim <> 64 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_wrong_dim,
        |       CAST(SUM(CASE WHEN ss = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_zero,
        |       CAST(SUM(bad) AS BIGINT) AS n_nonfinite,
        |       FLOOR(MIN(sqrt(ss)) * 10000.0 + 0.5) / 10000.0 AS min_norm,
        |       FLOOR(MAX(sqrt(ss)) * 10000.0 + 0.5) / 10000.0 AS max_norm,
        |       FLOOR(AVG(sqrt(ss)) * 10000.0 + 0.5) / 10000.0 AS mean_norm
        |FROM s""".stripMargin,

    "q_knn_eval" ->
      """WITH q AS (SELECT vec_id AS qid, label AS qlabel,
        |                  CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id % 10 = 0),
        |c AS (SELECT vec_id AS cid, label AS clabel,
        |             CAST(embedding AS DOUBLE[]) AS cv
        |      FROM embeddings),
        |nn AS (SELECT qid, qlabel, clabel FROM (
        |         SELECT qid, qlabel, cid, clabel,
        |                row_number() OVER (PARTITION BY qid
        |                  ORDER BY ROUND(list_cosine_similarity(qv, cv), 6)
        |                    DESC, cid) AS rn
        |         FROM q JOIN c ON cid <> qid) t WHERE rn <= 10),
        |votes AS (SELECT qid, qlabel, clabel, COUNT(*) AS v
        |          FROM nn GROUP BY 1, 2, 3),
        |pred AS (SELECT qid, qlabel, clabel AS plabel FROM (
        |           SELECT qid, qlabel, clabel,
        |                  row_number() OVER (PARTITION BY qid
        |                    ORDER BY v DESC, clabel) AS rn
        |           FROM votes) t2 WHERE rn = 1)
        |SELECT qlabel AS label, CAST(COUNT(*) AS BIGINT) AS n_queries,
        |       CAST(SUM(CASE WHEN plabel = qlabel THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_correct,
        |       FLOOR(SUM(CASE WHEN plabel = qlabel THEN 1 ELSE 0 END)
        |             / CAST(COUNT(*) AS DOUBLE) * 10000.0 + 0.5) / 10000.0
        |         AS accuracy
        |FROM pred GROUP BY qlabel ORDER BY qlabel""".stripMargin,

    "q_random_projection" ->
      """WITH signs AS (
        |  SELECT j, k,
        |         CAST((('0x' || substr(md5(CAST(j AS VARCHAR) || ':' ||
        |             CAST(k AS VARCHAR)), 1, 8))::BIGINT % 2) * 2 - 1
        |           AS DOUBLE) AS sgn
        |  FROM (SELECT UNNEST(generate_series(0, 63)) AS j) a
        |  CROSS JOIN (SELECT UNNEST(generate_series(0, 15)) AS k) b),
        |pos AS (SELECT vec_id,
        |               UNNEST(list_transform(range(1, len(v) + 1),
        |                 i -> {'j': i - 1, 'x': v[i]})) AS p
        |        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |              FROM embeddings) e)
        |SELECT vec_id, CAST(k AS BIGINT) AS out_dim,
        |       ROUND(SUM(p.x * sgn) / 4.0, 6) AS component
        |FROM pos JOIN signs ON p.j = signs.j
        |GROUP BY vec_id, k
        |ORDER BY vec_id, out_dim""".stripMargin,

    "q_compaction_plan" ->
      """WITH perday AS (
        |  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n_rows
        |  FROM events GROUP BY 1),
        |binned AS (
        |  SELECT day, n_rows,
        |         CAST(COALESCE(SUM(n_rows) OVER (ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           // 20000 AS BIGINT) AS file_id
        |  FROM perday)
        |SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_days,
        |       CAST(SUM(n_rows) AS BIGINT) AS n_rows,
        |       MIN(day) AS first_day, MAX(day) AS last_day
        |FROM binned GROUP BY file_id ORDER BY file_id""".stripMargin,

    "q_compaction_exec" -> ScaleOps.compactionExecOracleSql,
    "q_quantile_sketch" -> ScaleOps.quantileSketchOracleSql,
    "q_quantile_sketch_sql" -> ScaleOps.quantileSketchSqlOracleSql,

    "q_join_card_est" ->
      """WITH ol AS (SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1),
        |ll AS (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
        |cc AS (SELECT c_custkey AS k, COUNT(*) AS c FROM customer GROUP BY 1),
        |oc AS (SELECT o_custkey AS k, COUNT(*) AS c FROM orders GROUP BY 1),
        |j1 AS (SELECT a.k, a.c * b.c AS prod FROM ol a JOIN ll b ON a.k = b.k),
        |j2 AS (SELECT a.k, a.c * b.c AS prod FROM cc a JOIN oc b ON a.k = b.k),
        |r AS (
        |  SELECT 'orders_lineitem_on_orderkey' AS join_name,
        |         CAST(COALESCE((SELECT SUM(prod) * 20 FROM j1
        |           WHERE ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT
        |                 % 20 = 0), 0) AS BIGINT) AS est_rows,
        |         CAST((SELECT SUM(prod) FROM j1) AS BIGINT) AS actual_rows
        |  UNION ALL
        |  SELECT 'customer_orders_on_custkey',
        |         CAST(COALESCE((SELECT SUM(prod) * 20 FROM j2
        |           WHERE ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8))::BIGINT
        |                 % 20 = 0), 0) AS BIGINT),
        |         CAST((SELECT SUM(prod) FROM j2) AS BIGINT))
        |SELECT join_name, est_rows, actual_rows,
        |       ROUND((est_rows - actual_rows) / CAST(actual_rows AS DOUBLE), 4)
        |         AS rel_err
        |FROM r ORDER BY join_name""".stripMargin,

    "q_bootstrap_ci" ->
      """WITH base AS (SELECT event_id, value FROM events
        |              WHERE event_type = 'purchase'),
        |fan AS (SELECT event_id, value, r FROM base
        |        CROSS JOIN (SELECT UNNEST(generate_series(0, 49)) AS r) t),
        |wtab AS (SELECT r, value,
        |           CASE WHEN u < 0.3679 THEN 0 WHEN u < 0.7358 THEN 1
        |                WHEN u < 0.9197 THEN 2 WHEN u < 0.9810 THEN 3
        |                WHEN u < 0.9963 THEN 4 WHEN u < 0.9994 THEN 5
        |                ELSE 6 END AS w
        |         FROM (SELECT r, value,
        |                 ('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':' ||
        |                   CAST(r AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0 AS u
        |               FROM fan) u0),
        |means AS (SELECT r, SUM(w * value) / SUM(w) AS m,
        |                 CAST(COUNT(*) AS BIGINT) AS n
        |          FROM wtab GROUP BY r),
        |ranked AS (SELECT m, n, row_number() OVER (ORDER BY m) AS rn FROM means)
        |SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
        |       CAST(COUNT(*) AS BIGINT) AS n_resamples,
        |       FLOOR(AVG(m) * 10000.0 + 0.5) / 10000.0 AS mean_of_means,
        |       FLOOR(MAX(CASE WHEN rn = 3 THEN m END) * 10000.0 + 0.5)
        |         / 10000.0 AS ci_lo,
        |       FLOOR(MAX(CASE WHEN rn = 48 THEN m END) * 10000.0 + 0.5)
        |         / 10000.0 AS ci_hi
        |FROM ranked""".stripMargin,

    "q_seasonal_dow" ->
      """WITH byd AS (
        |  SELECT event_type,
        |         CAST(strftime(CAST(ts AS TIMESTAMP), '%w') AS INTEGER) AS dow,
        |         CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_c
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT *, SUM(n) OVER (PARTITION BY event_type) AS tot_n,
        |             SUM(sum_c) OVER (PARTITION BY event_type) AS tot_c
        |      FROM byd)
        |SELECT event_type, dow, n,
        |       FLOOR(sum_c / (n * 100.0) * 10000.0 + 0.5) / 10000.0 AS dow_mean,
        |       FLOOR((CAST(sum_c AS DOUBLE) * tot_n)
        |             / (CAST(n AS DOUBLE) * tot_c)
        |             * 10000.0 + 0.5) / 10000.0 AS seasonal_idx
        |FROM t ORDER BY event_type, dow""".stripMargin,

    "q_cusum_drift" ->
      """WITH daily AS (
        |  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_c
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |t AS (SELECT *,
        |        CAST(SUM(sum_c) OVER () AS DOUBLE) / SUM(n) OVER () AS mu_c,
        |        SUM(sum_c) OVER (ORDER BY day
        |          ROWS UNBOUNDED PRECEDING) AS cum_c,
        |        SUM(n) OVER (ORDER BY day
        |          ROWS UNBOUNDED PRECEDING) AS cum_n
        |      FROM daily),
        |c AS (SELECT *, (cum_c - cum_n * mu_c) / 100.0 AS cusum FROM t)
        |SELECT day, n,
        |       FLOOR(sum_c / (n * 100.0) * 10000.0 + 0.5) / 10000.0 AS daily_mean,
        |       FLOOR(cusum * 10000.0 + 0.5) / 10000.0 AS cusum,
        |       CAST(CASE WHEN ABS(cusum) = MAX(ABS(cusum)) OVER ()
        |            THEN 1 ELSE 0 END AS INTEGER) AS is_peak
        |FROM c ORDER BY day""".stripMargin,

    "q_rolling_corr" ->
      """WITH daily AS (
        |  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS y
        |  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1),
        |wnd AS (SELECT day, x, y,
        |          row_number() OVER (ORDER BY day) AS rn,
        |          SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
        |          SUM(x*y) OVER w AS sxy, SUM(x*x) OVER w AS sx2,
        |          SUM(y*y) OVER w AS sy2
        |        FROM daily
        |        WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING
        |                     AND CURRENT ROW))
        |SELECT day, x AS n_click, y AS n_purchase,
        |       CASE WHEN den = 0 THEN NULL
        |            ELSE FLOOR(num / den * 10000.0 + 0.5) / 10000.0
        |       END AS roll_corr
        |FROM (SELECT day, x, y,
        |        7.0*sxy - CAST(sx AS DOUBLE)*sy AS num,
        |        sqrt((7.0*sx2 - CAST(sx AS DOUBLE)*sx)
        |             * (7.0*sy2 - CAST(sy AS DOUBLE)*sy)) AS den
        |      FROM wnd WHERE rn >= 7) q
        |ORDER BY day""".stripMargin,

    "q_calibration" ->
      """WITH t AS (SELECT doc_id, lang AS labeled_lang, text,
        |                  regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |           FROM documents),
        |s AS (SELECT doc_id, labeled_lang, text,
        |        CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','that','it','for'))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_en,
        |        CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein','mit','auf','zu'))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_de,
        |        CAST(len(list_filter(toks, x -> x IN ('le','la','les','et','est','un','une','dans','pour','que'))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_fr,
        |        CAST(len(list_filter(toks, x -> x IN ('el','la','los','y','es','un','una','en','por','que'))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_es
        |      FROM t),
        |u AS (SELECT doc_id, labeled_lang, text, sc['score'] AS score, sc['lang'] AS lng,
        |             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sc['score'] DESC, sc['lang'] DESC) AS rn
        |      FROM s, UNNEST([{'score': s_de, 'lang': 'de'}, {'score': s_en, 'lang': 'en'},
        |                      {'score': s_fr, 'lang': 'fr'}, {'score': s_es, 'lang': 'es'}]) AS z(sc)),
        |scored AS (
        |  SELECT doc_id, labeled_lang,
        |         CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |              WHEN score > 0 THEN lng ELSE 'und' END AS predicted_lang,
        |         ROUND(score, 4) AS confidence
        |  FROM u WHERE rn = 1),
        |b AS (SELECT LEAST(CAST(FLOOR(confidence * 20) AS BIGINT), 19) AS bin,
        |             CAST(ROUND(confidence * 10000) AS BIGINT) AS conf_i,
        |             CASE WHEN predicted_lang = labeled_lang
        |                  THEN 1 ELSE 0 END AS ok
        |      FROM scored)
        |SELECT bin,
        |       FLOOR(bin / 20.0 * 10000.0 + 0.5) / 10000.0 AS conf_lo,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       FLOOR(SUM(conf_i) / (COUNT(*) * 10000.0) * 10000.0 + 0.5)
        |         / 10000.0 AS mean_conf,
        |       CAST(SUM(ok) AS BIGINT) AS n_correct,
        |       FLOOR(SUM(ok) / CAST(COUNT(*) AS DOUBLE) * 10000.0 + 0.5)
        |         / 10000.0 AS accuracy
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,

    "q_weighted_sample" ->
      """WITH k AS (
        |  SELECT doc_id, n_chars,
        |         -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |              + 0.5) / 4294967296.0)
        |           / CAST(GREATEST(n_chars, 1) AS DOUBLE) AS key
        |  FROM documents),
        |top AS (SELECT * FROM k ORDER BY key, doc_id LIMIT 50)
        |SELECT CAST(row_number() OVER (ORDER BY key, doc_id) AS BIGINT) AS rank,
        |       doc_id, n_chars,
        |       FLOOR(key * 1000.0 * 1e6 + 0.5) / 1e6 AS key_x1000
        |FROM top ORDER BY rank""".stripMargin,

    "q_target_encoding" ->
      """WITH ev AS (SELECT event_id, event_type,
        |                   CAST(ROUND(value*100) AS BIGINT) AS c
        |            FROM events),
        |st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |              CAST(SUM(c) AS BIGINT) AS sum_c
        |       FROM ev GROUP BY 1)
        |SELECT event_id, ev.event_type, c / 100.0 AS value,
        |       CASE WHEN n > 1 THEN
        |         FLOOR((sum_c - c) / ((n - 1) * 100.0) * 10000.0 + 0.5) / 10000.0
        |       ELSE NULL END AS loo_mean
        |FROM ev JOIN st ON ev.event_type = st.event_type
        |ORDER BY event_id LIMIT 100""".stripMargin,

    "q_group_scale" ->
      """WITH ev AS (SELECT event_id, event_type,
        |                   CAST(ROUND(value*100) AS BIGINT) AS c
        |            FROM events),
        |st AS (SELECT event_type, MIN(c) AS mn, MAX(c) AS mx
        |       FROM ev GROUP BY 1)
        |SELECT event_id, ev.event_type, c / 100.0 AS value,
        |       CASE WHEN mx > mn THEN
        |         FLOOR((c - mn) / CAST(mx - mn AS DOUBLE) * 10000.0 + 0.5)
        |           / 10000.0
        |       ELSE NULL END AS scaled
        |FROM ev JOIN st ON ev.event_type = st.event_type
        |ORDER BY event_id LIMIT 100""".stripMargin,

    "q_split_leakage" ->
      """WITH tr AS (SELECT DISTINCT user_id FROM events
        |            WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-21 00:00:00'),
        |te AS (SELECT DISTINCT user_id FROM events
        |       WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-21 00:00:00'),
        |ov AS (SELECT tr.user_id FROM tr JOIN te ON tr.user_id = te.user_id)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM tr) AS n_train_users,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM te) AS n_test_users,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM ov) AS n_overlap,
        |       FLOOR((SELECT COUNT(*) FROM ov)
        |             / CAST((SELECT COUNT(*) FROM te) AS DOUBLE)
        |             * 10000.0 + 0.5) / 10000.0 AS leakage_rate""".stripMargin,

    "q_dedup_simhash_md5" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |         array_to_string(arr[1:GREATEST(len(arr) - 1, 1)], ' ')
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
        |        FROM documents) t0),
        |hs AS (SELECT doc_id,
        |         list_transform(regexp_split_to_array(trim(text), '\s+'),
        |           w -> ('0x' || substr(md5(w), 1, 14))::BIGINT) AS hs
        |       FROM corpus),
        |fps AS (SELECT doc_id,
        |          CAST(list_sum(list_transform(generate_series(0, 55),
        |            b -> CASE WHEN 2 * len(list_filter(hs,
        |                   h -> ((h >> b) & 1) = 1)) >= len(hs)
        |                 THEN (CAST(1 AS BIGINT) << b)
        |                 ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS fp
        |        FROM hs),
        |chunks0 AS (
        |  SELECT doc_id, fp, c AS chunk,
        |         (fp >> (c * 14)) & 16383 AS ch
        |  FROM fps CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS c) cc),
        |ok AS (SELECT chunk, ch FROM chunks0
        |       GROUP BY chunk, ch HAVING COUNT(*) <= 64),
        |chunks AS (SELECT c0.* FROM chunks0 c0
        |           JOIN ok ON c0.chunk = ok.chunk AND c0.ch = ok.ch)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
        |FROM chunks a JOIN chunks b
        |  ON a.chunk = b.chunk AND a.ch = b.ch AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 7
        |  AND NOT EXISTS (
        |    SELECT 1 FROM (SELECT UNNEST([0, 1, 2]) AS cp) p
        |    WHERE p.cp < a.chunk
        |      AND ((a.fp >> (p.cp * 14)) & 16383) =
        |          ((b.fp >> (p.cp * 14)) & 16383))
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q_window_topk" ->
      """WITH c AS (
        |  SELECT CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 21600) AS BIGINT)
        |           * 21600 AS window_start,
        |         user_id, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT window_start, rank, user_id, n FROM (
        |  SELECT window_start, user_id, n,
        |         CAST(row_number() OVER (PARTITION BY window_start
        |           ORDER BY n DESC, user_id) AS BIGINT) AS rank
        |  FROM c) t
        |WHERE rank <= 3
        |ORDER BY window_start, rank""".stripMargin,

    "q_psi_drift" ->
      """WITH b AS (
        |  SELECT event_type,
        |         LEAST(CAST(ROUND(value*100) AS BIGINT) // 1000, 9) AS bin,
        |         CASE WHEN CAST(ts AS TIMESTAMP) >=
        |                   TIMESTAMP '2024-01-16 00:00:00'
        |              THEN 1 ELSE 0 END AS late
        |  FROM events),
        |c AS (SELECT event_type, bin,
        |             CAST(SUM(1 - late) AS BIGINT) AS c0,
        |             CAST(SUM(late) AS BIGINT) AS c1
        |      FROM b GROUP BY 1, 2),
        |t AS (SELECT *, SUM(c0) OVER (PARTITION BY event_type) AS n0,
        |             SUM(c1) OVER (PARTITION BY event_type) AS n1
        |      FROM c),
        |s AS (SELECT event_type, n0, n1,
        |             ((c0 + 0.5) / (n0 + 5.0) - (c1 + 0.5) / (n1 + 5.0))
        |               * ln(((c0 + 0.5) / (n0 + 5.0))
        |                    / ((c1 + 0.5) / (n1 + 5.0))) AS term
        |      FROM t)
        |SELECT event_type, CAST(MAX(n0) AS BIGINT) AS n_before,
        |       CAST(MAX(n1) AS BIGINT) AS n_after,
        |       FLOOR(SUM(term) * 10000.0 + 0.5) / 10000.0 AS psi
        |FROM s GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_data_contract" ->
      """SELECT * FROM (
        |  SELECT 'positive_total' AS check_name,
        |         'orders.o_totalprice' AS target,
        |         CAST(COUNT(*) AS BIGINT) AS n_checked,
        |         CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_violations,
        |         CAST(CASE WHEN SUM(CASE WHEN o_totalprice <= 0 THEN 1
        |              ELSE 0 END) = 0 THEN 1 ELSE 0 END AS INTEGER) AS pass
        |  FROM orders
        |  UNION ALL
        |  SELECT 'unique_key', 'orders.o_orderkey',
        |         CAST(COUNT(*) AS BIGINT),
        |         CAST(SUM(CASE WHEN kn > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |         CAST(CASE WHEN SUM(CASE WHEN kn > 1 THEN 1 ELSE 0 END) = 0
        |              THEN 1 ELSE 0 END AS INTEGER)
        |  FROM (SELECT COUNT(*) AS kn FROM orders GROUP BY o_orderkey) k
        |  UNION ALL
        |  SELECT 'fk_lineitem_orders', 'lineitem.l_orderkey',
        |         CAST(COUNT(*) AS BIGINT),
        |         CAST(COALESCE(SUM(1), 0) AS BIGINT),
        |         CAST(CASE WHEN COUNT(*) = 0 THEN 1 ELSE 0 END AS INTEGER)
        |  FROM (SELECT l_orderkey FROM lineitem
        |        WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) f
        |  UNION ALL
        |  SELECT 'discount_range', 'lineitem.l_discount',
        |         CAST(COUNT(*) AS BIGINT),
        |         CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1
        |              THEN 1 ELSE 0 END) AS BIGINT),
        |         CAST(CASE WHEN SUM(CASE WHEN l_discount < 0 OR l_discount > 1
        |              THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END AS INTEGER)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'acctbal_not_null', 'customer.c_acctbal',
        |         CAST(COUNT(*) AS BIGINT),
        |         CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT),
        |         CAST(CASE WHEN SUM(CASE WHEN c_acctbal IS NULL THEN 1
        |              ELSE 0 END) = 0 THEN 1 ELSE 0 END AS INTEGER)
        |  FROM customer) t
        |ORDER BY check_name""".stripMargin,

    "q_stats_merge" ->
      """WITH halves AS (
        |  SELECT event_type,
        |         CASE WHEN CAST(ts AS TIMESTAMP) >=
        |                   TIMESTAMP '2024-01-16 00:00:00'
        |              THEN 1 ELSE 0 END AS h,
        |         CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS s,
        |         CAST(SUM(CAST(ROUND(value*100) AS BIGINT)
        |                  * CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS ss
        |  FROM events GROUP BY 1, 2),
        |hm AS (SELECT *, ss - CAST(s AS DOUBLE) * s / n AS m2 FROM halves),
        |m AS (SELECT event_type,
        |        CAST(SUM(n) AS BIGINT) AS n,
        |        CAST(SUM(s) AS BIGINT) AS s,
        |        CAST(SUM(ss) AS BIGINT) AS ss,
        |        SUM(m2) +
        |          (MAX(CASE WHEN h = 0 THEN s END) / CAST(MAX(CASE WHEN h = 0 THEN n END) AS DOUBLE)
        |           - MAX(CASE WHEN h = 1 THEN s END) / CAST(MAX(CASE WHEN h = 1 THEN n END) AS DOUBLE))
        |          * (MAX(CASE WHEN h = 0 THEN s END) / CAST(MAX(CASE WHEN h = 0 THEN n END) AS DOUBLE)
        |             - MAX(CASE WHEN h = 1 THEN s END) / CAST(MAX(CASE WHEN h = 1 THEN n END) AS DOUBLE))
        |          * MAX(CASE WHEN h = 0 THEN n END) * MAX(CASE WHEN h = 1 THEN n END)
        |          / CAST(SUM(n) AS DOUBLE) AS m2_merged
        |      FROM hm GROUP BY event_type)
        |SELECT event_type, n,
        |       FLOOR(s / (n * 100.0) * 10000.0 + 0.5) / 10000.0 AS mean,
        |       FLOOR((ss - CAST(s AS DOUBLE) * s / n) / ((n - 1) * 10000.0)
        |             * 10000.0 + 0.5) / 10000.0 AS var_direct,
        |       FLOOR(m2_merged / ((n - 1) * 10000.0) * 10000.0 + 0.5)
        |         / 10000.0 AS var_merged,
        |       FLOOR(ABS(m2_merged - (ss - CAST(s AS DOUBLE) * s / n))
        |             / ((n - 1) * 10000.0) * 1e6 + 0.5) / 1e6 AS merge_err
        |FROM m ORDER BY event_type""".stripMargin,

    "q_topk_plan" ->
      """WITH c AS (
        |  SELECT CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 21600) AS BIGINT)
        |           * 21600 AS window_start,
        |         user_id, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT window_start, user_id, n FROM (
        |  SELECT window_start, user_id, n,
        |         row_number() OVER (PARTITION BY window_start
        |           ORDER BY n DESC, user_id) AS rank
        |  FROM c) t
        |WHERE rank <= 3
        |ORDER BY window_start, user_id""".stripMargin,

    "q_burst_detect" ->
      """WITH hourly AS (
        |  SELECT event_type,
        |         CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT)
        |           * 3600 AS hour,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT *,
        |        CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE)
        |          / COUNT(*) OVER (PARTITION BY event_type) AS mu,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY n DESC, hour) AS rn
        |      FROM hourly)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
        |       FLOOR(MAX(mu) * 10000.0 + 0.5) / 10000.0 AS mu,
        |       CAST(SUM(CASE WHEN n > mu + 3.0 * sqrt(mu)
        |            THEN 1 ELSE 0 END) AS BIGINT) AS n_bursts,
        |       CAST(MAX(CASE WHEN rn = 1 THEN hour END) AS BIGINT)
        |         AS peak_hour,
        |       CAST(MAX(CASE WHEN rn = 1 THEN n END) AS BIGINT) AS peak_n
        |FROM t GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_heldout_perplexity" ->
      """WITH tk AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
        |            FROM documents),
        |bg AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2,
        |              CAST(COUNT(*) AS BIGINT) AS cnt
        |       FROM (SELECT doc_id,
        |               UNNEST(list_transform(generate_series(1, len(tk) - 1),
        |                 i -> {'w1': tk[i], 'w2': tk[i+1]})) AS bg
        |             FROM tk WHERE len(tk) >= 2) x
        |       GROUP BY 1, 2, 3),
        |train_bg AS (SELECT w1, w2, CAST(SUM(cnt) AS BIGINT) AS cb
        |             FROM bg WHERE doc_id % 2 = 0 GROUP BY 1, 2),
        |train_left AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS cl
        |               FROM train_bg GROUP BY 1),
        |train_uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cu FROM (
        |                SELECT UNNEST(regexp_split_to_array(trim(text), '\s+')) AS w
        |                FROM documents WHERE doc_id % 2 = 0) u GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cu) AS DOUBLE) AS t FROM train_uni),
        |scored AS (
        |  SELECT b.doc_id, b.cnt,
        |         CASE WHEN m.cb IS NOT NULL THEN ln(m.cb / CAST(l.cl AS DOUBLE))
        |              WHEN u.cu IS NOT NULL THEN ln(u.cu * 0.4 / t)
        |              ELSE ln(0.4 / t) END AS lp
        |  FROM bg b
        |  LEFT JOIN train_bg m ON b.w1 = m.w1 AND b.w2 = m.w2
        |  LEFT JOIN train_left l ON b.w1 = l.w1
        |  LEFT JOIN train_uni u ON b.w2 = u.w
        |  CROSS JOIN tot
        |  WHERE b.doc_id % 2 = 1)
        |SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
        |       FLOOR(SUM(cnt * lp) / SUM(cnt) * 10000.0 + 0.5) / 10000.0
        |         AS avg_logprob
        |FROM scored GROUP BY doc_id
        |ORDER BY avg_logprob ASC, doc_id LIMIT 100""".stripMargin,

    "q_dup_profile" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |         array_to_string(arr[1:GREATEST(len(arr) - 1, 1)], ' ')
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
        |        FROM documents) t0),
        |g AS (SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS g
        |      FROM corpus GROUP BY 1),
        |tot AS (SELECT CAST(SUM(g) AS DOUBLE) AS tot FROM g)
        |SELECT LEAST(g, 5) AS copy_bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n_groups,
        |       CAST(SUM(g) AS BIGINT) AS n_docs,
        |       FLOOR(SUM(g) / tot * 10000.0 + 0.5) / 10000.0 AS doc_share
        |FROM g CROSS JOIN tot
        |GROUP BY LEAST(g, 5), tot ORDER BY copy_bucket""".stripMargin,

    "q_optimizer_stats" ->
      """SELECT * FROM (
        |  SELECT 'orders' AS table_name, 'o_orderkey' AS column_name,
        |         CAST(COUNT(*) AS BIGINT) AS n_rows,
        |         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS ndv,
        |         CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_null,
        |         CAST(MIN(o_orderkey) AS BIGINT) AS min_v,
        |         CAST(MAX(o_orderkey) AS BIGINT) AS max_v
        |  FROM orders
        |  UNION ALL
        |  SELECT 'orders', 'o_custkey', CAST(COUNT(*) AS BIGINT),
        |         CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
        |         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |         CAST(MIN(o_custkey) AS BIGINT), CAST(MAX(o_custkey) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'lineitem', 'l_orderkey', CAST(COUNT(*) AS BIGINT),
        |         CAST(COUNT(DISTINCT l_orderkey) AS BIGINT),
        |         CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |         CAST(MIN(l_orderkey) AS BIGINT), CAST(MAX(l_orderkey) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem', 'l_partkey', CAST(COUNT(*) AS BIGINT),
        |         CAST(COUNT(DISTINCT l_partkey) AS BIGINT),
        |         CAST(SUM(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |         CAST(MIN(l_partkey) AS BIGINT), CAST(MAX(l_partkey) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem', 'l_suppkey', CAST(COUNT(*) AS BIGINT),
        |         CAST(COUNT(DISTINCT l_suppkey) AS BIGINT),
        |         CAST(SUM(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |         CAST(MIN(l_suppkey) AS BIGINT), CAST(MAX(l_suppkey) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'customer', 'c_custkey', CAST(COUNT(*) AS BIGINT),
        |         CAST(COUNT(DISTINCT c_custkey) AS BIGINT),
        |         CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |         CAST(MIN(c_custkey) AS BIGINT), CAST(MAX(c_custkey) AS BIGINT)
        |  FROM customer) t
        |ORDER BY table_name, column_name""".stripMargin,

    "q_ivm_audit" ->
      """WITH full_v AS (
        |  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n_full
        |  FROM events GROUP BY 1),
        |old_v AS (
        |  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE CAST(ts AS TIMESTAMP) <
        |        TIMESTAMP '2024-01-26 00:00:00' GROUP BY 1),
        |delta_v AS (
        |  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events WHERE CAST(ts AS TIMESTAMP) >=
        |        TIMESTAMP '2024-01-26 00:00:00' GROUP BY 1),
        |merged AS (
        |  SELECT day, CAST(SUM(n) AS BIGINT) AS n_merged
        |  FROM (SELECT * FROM old_v UNION ALL SELECT * FROM delta_v) u
        |  GROUP BY day)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
        |       CAST(SUM(CASE WHEN COALESCE(n_full, -1) <> COALESCE(n_merged, -2)
        |            THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
        |       CAST(SUM(n_full) AS BIGINT) AS total_rows
        |FROM full_v FULL OUTER JOIN merged USING (day)""".stripMargin,

    "q_tail_index" ->
      """WITH top AS (
        |  SELECT CAST(ROUND(value*100) AS BIGINT) AS c, event_id
        |  FROM events WHERE event_type = 'purchase'
        |  ORDER BY c DESC, event_id LIMIT 101),
        |b AS (SELECT MIN(c) AS ck1 FROM top)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_top,
        |       MAX(ck1) / 100.0 AS x_boundary,
        |       FLOOR(COUNT(*) / SUM(ln(c / CAST(ck1 AS DOUBLE)))
        |             * 10000.0 + 0.5) / 10000.0 AS alpha
        |FROM top CROSS JOIN b
        |WHERE c > ck1""".stripMargin,

    "q_churn_features" ->
      """WITH p AS (
        |  SELECT user_id,
        |         CAST(MAX(d) - MIN(d) AS BIGINT) AS tenure_days,
        |         CAST(COUNT(*) AS BIGINT) AS n_events,
        |         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_purchases,
        |         CAST(SUM(CASE WHEN event_type = 'purchase'
        |                  THEN CAST(ROUND(value*100) AS BIGINT)
        |                  ELSE 0 END) AS BIGINT) / 100.0 AS monetary,
        |         CAST(MAX(d) AS BIGINT) AS last_day,
        |         CAST(SUM(CASE WHEN late = 1 THEN 1 ELSE -1 END) AS BIGINT)
        |           AS trend
        |  FROM (SELECT user_id, event_type, value,
        |          CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
        |            AS d,
        |          CASE WHEN CAST(ts AS TIMESTAMP) >=
        |                    TIMESTAMP '2024-01-16 00:00:00'
        |               THEN 1 ELSE 0 END AS late
        |        FROM events) e
        |  GROUP BY user_id),
        |h AS (SELECT MAX(last_day) AS hwm FROM p)
        |SELECT user_id, tenure_days, n_events, n_purchases, monetary,
        |       CAST(hwm - last_day AS BIGINT) AS recency_days, trend
        |FROM p CROSS JOIN h
        |ORDER BY user_id LIMIT 100""".stripMargin,

    "q_equiheight_hist" ->
      """WITH hist AS (
        |  SELECT CAST(FLOOR(l_extendedprice) AS BIGINT) AS c,
        |         CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY 1),
        |cum AS (SELECT c,
        |          SUM(cnt) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cum,
        |          SUM(cnt) OVER () AS n
        |        FROM hist)
        |SELECT CAST(decile AS BIGINT) AS decile,
        |       CAST(MIN(c) AS BIGINT) AS boundary_dollars
        |FROM cum CROSS JOIN (SELECT UNNEST(generate_series(1, 9)) AS decile) z
        |WHERE cum >= (n * decile + 9) // 10
        |GROUP BY decile ORDER BY decile""".stripMargin,

    "q_confusion_matrix" ->
      """WITH t AS (SELECT doc_id, lang AS labeled_lang, text,
        |                  regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |           FROM documents),
        |s AS (SELECT doc_id, labeled_lang, text,
        |        CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','that','it','for'))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_en,
        |        CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein','mit','auf','zu'))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_de,
        |        CAST(len(list_filter(toks, x -> x IN ('le','la','les','et','est','un','une','dans','pour','que'))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_fr,
        |        CAST(len(list_filter(toks, x -> x IN ('el','la','los','y','es','un','una','en','por','que'))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_es
        |      FROM t),
        |u AS (SELECT doc_id, labeled_lang, text, sc['score'] AS score, sc['lang'] AS lng,
        |             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sc['score'] DESC, sc['lang'] DESC) AS rn
        |      FROM s, UNNEST([{'score': s_de, 'lang': 'de'}, {'score': s_en, 'lang': 'en'},
        |                      {'score': s_fr, 'lang': 'fr'}, {'score': s_es, 'lang': 'es'}]) AS z(sc)),
        |scored AS (
        |  SELECT labeled_lang,
        |         CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |              WHEN score > 0 THEN lng ELSE 'und' END AS predicted_lang
        |  FROM u WHERE rn = 1),
        |m AS (SELECT labeled_lang, predicted_lang,
        |             CAST(COUNT(*) AS BIGINT) AS n
        |      FROM scored GROUP BY 1, 2)
        |SELECT labeled_lang, predicted_lang, n,
        |       FLOOR(n / CAST(SUM(n) OVER (PARTITION BY labeled_lang)
        |             AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS row_share
        |FROM m ORDER BY labeled_lang, predicted_lang""".stripMargin,

    "q_auc" ->
      """WITH h AS (
        |  SELECT CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS c,
        |         COUNT(*) AS n,
        |         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np
        |  FROM events GROUP BY 1),
        |r AS (
        |  SELECT np,
        |         2 * (SUM(n) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) - n + 1)
        |           + n - 1 AS mr2
        |  FROM h),
        |a AS (SELECT SUM(np) AS n_pos, SUM(n) - SUM(np) AS n_neg
        |      FROM h),
        |s AS (SELECT SUM(np * mr2) AS r2 FROM r)
        |SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
        |       FLOOR((r2 - CAST(n_pos AS DOUBLE) * (n_pos + 1))
        |             / (2.0 * n_pos * n_neg) * 10000.0 + 0.5) / 10000.0 AS auc
        |FROM a, s""".stripMargin,

    "q_ks_test" ->
      """WITH h AS (
        |  SELECT CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS c,
        |         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n1,
        |         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n2
        |  FROM events WHERE event_type IN ('purchase', 'click') GROUP BY 1),
        |t AS (SELECT SUM(n1) AS t1, SUM(n2) AS t2 FROM h),
        |cum AS (
        |  SELECT c,
        |         SUM(n1) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cum1,
        |         SUM(n2) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cum2
        |  FROM h),
        |d AS (SELECT ABS(CAST(cum1 AS DOUBLE) * t2 - CAST(cum2 AS DOUBLE) * t1) AS dnum, c FROM cum, t),
        |m AS (SELECT dnum, c FROM d ORDER BY dnum DESC, c ASC LIMIT 1)
        |SELECT CAST(t1 AS BIGINT) AS n_purchase, CAST(t2 AS BIGINT) AS n_click,
        |       FLOOR(dnum / (CAST(t1 AS DOUBLE) * t2) * 10000.0 + 0.5) / 10000.0 AS ks_stat,
        |       c / 100.0 AS ks_at
        |FROM m, t""".stripMargin,

    "q_anova" ->
      """WITH g AS (
        |  SELECT event_type, COUNT(*) AS ng,
        |         SUM(c) AS sg, SUM(c * c) AS ssg
        |  FROM (SELECT event_type,
        |          CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS c
        |        FROM events) t GROUP BY 1),
        |a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(ng) AS BIGINT) AS n,
        |         SUM(CAST(sg AS DOUBLE) * sg / ng) AS between_raw,
        |         CAST(SUM(sg) AS BIGINT) AS stot,
        |         CAST(SUM(ssg) AS BIGINT) AS sstot
        |  FROM g)
        |SELECT k, n, k - 1 AS df_between, n - k AS df_within,
        |       FLOOR(((between_raw - CAST(stot AS DOUBLE) * stot / n) / (k - 1))
        |             / ((sstot - between_raw) / (n - k)) * 10000.0 + 0.5)
        |         / 10000.0 AS f_stat
        |FROM a""".stripMargin,

    "q_mutual_info" ->
      """WITH joint AS (
        |  SELECT l_returnflag, l_linestatus, COUNT(*) AS nij
        |  FROM lineitem GROUP BY 1, 2),
        |rm AS (SELECT l_returnflag, SUM(nij) AS ni FROM joint GROUP BY 1),
        |cm AS (SELECT l_linestatus, SUM(nij) AS nj FROM joint GROUP BY 1),
        |g AS (SELECT SUM(nij) AS n FROM joint)
        |SELECT joint.l_returnflag, joint.l_linestatus,
        |       CAST(nij AS BIGINT) AS n_lines,
        |       FLOOR(LN(CAST(nij AS DOUBLE) * n
        |                / (CAST(ni AS DOUBLE) * nj)) * 10000.0 + 0.5)
        |         / 10000.0 AS pmi,
        |       FLOOR((nij * 1.0 / n)
        |             * LN(CAST(nij AS DOUBLE) * n
        |                  / (CAST(ni AS DOUBLE) * nj)) * 10000.0 + 0.5)
        |         / 10000.0 AS mi_contrib
        |FROM joint
        |JOIN rm ON joint.l_returnflag = rm.l_returnflag
        |JOIN cm ON joint.l_linestatus = cm.l_linestatus
        |CROSS JOIN g
        |ORDER BY joint.l_returnflag, joint.l_linestatus""".stripMargin,

    "q_woe_iv" ->
      """WITH b AS (
        |  SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bin,
        |         COUNT(*) AS n,
        |         SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS g
        |  FROM orders GROUP BY 1),
        |t AS (SELECT SUM(g) AS gt, SUM(n) - SUM(g) AS bt FROM b)
        |SELECT bin, bin * 50000 AS lo_dollars,
        |       CAST(n AS BIGINT) AS n, CAST(g AS BIGINT) AS n_good,
        |       CAST(n - g AS BIGINT) AS n_bad,
        |       FLOOR((LN((g + 0.5) / (n - g + 0.5))
        |              - LN(gt * 1.0 / bt)) * 10000.0 + 0.5)
        |         / 10000.0 AS woe,
        |       FLOOR((g * 1.0 / gt - (n - g) * 1.0 / bt)
        |             * (LN((g + 0.5) / (n - g + 0.5))
        |                - LN(gt * 1.0 / bt)) * 10000.0 + 0.5)
        |         / 10000.0 AS iv_contrib
        |FROM b CROSS JOIN t
        |ORDER BY bin""".stripMargin,

    "q_user_path" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events),
        |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |      FROM r WHERE rn <= 3 GROUP BY 1)
        |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM p GROUP BY 1
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin,

    "q_runs_test" ->
      """WITH c AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM events),
        |d AS (
        |  SELECT user_id, ts, event_id,
        |         c - lag(c) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS delta
        |  FROM c),
        |s AS (SELECT user_id, ts, event_id,
        |             CASE WHEN delta > 0 THEN 1 ELSE 0 END AS up
        |      FROM d WHERE delta IS NOT NULL AND delta <> 0),
        |g AS (
        |  SELECT user_id, SUM(up) AS n_up, COUNT(*) - SUM(up) AS n_down,
        |         SUM(CASE WHEN prev IS NULL OR prev <> up THEN 1 ELSE 0 END) AS runs
        |  FROM (SELECT user_id, up,
        |          lag(up) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |        FROM s) t
        |  GROUP BY 1
        |  HAVING SUM(up) > 0 AND COUNT(*) - SUM(up) > 0)
        |SELECT user_id, CAST(n_up AS BIGINT) AS n_up,
        |       CAST(n_down AS BIGINT) AS n_down, CAST(runs AS BIGINT) AS runs,
        |       FLOOR((runs - (2.0 * n_up * n_down / (n_up + n_down) + 1.0))
        |             / SQRT(2.0 * n_up * n_down
        |                    * (2 * n_up * n_down - (n_up + n_down))
        |                    / (CAST((n_up + n_down) * (n_up + n_down) AS BIGINT)
        |                       * 1.0 * ((n_up + n_down) - 1)))
        |             * 10000.0 + 0.5) / 10000.0 AS z_runs
        |FROM g
        |WHERE 2 * n_up * n_down - (n_up + n_down) > 0
        |ORDER BY user_id""".stripMargin,

    "q_cohort_ltv" ->
      """WITH f AS (
        |  SELECT user_id,
        |         date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS cohort
        |  FROM events GROUP BY 1),
        |p AS (
        |  SELECT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk,
        |         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (SELECT cohort, wk, SUM(c) AS wk_cents
        |      FROM p JOIN f USING (user_id) GROUP BY 1, 2),
        |s AS (SELECT cohort, COUNT(*) AS n_users FROM f GROUP BY 1)
        |SELECT strftime(g.cohort, '%Y-%m-%d') AS cohort_week,
        |       CAST(date_diff('day', CAST(g.cohort AS DATE), CAST(wk AS DATE))
        |            // 7 AS BIGINT) AS week_index,
        |       CAST(n_users AS BIGINT) AS n_users,
        |       wk_cents / 100.0 AS wk_revenue,
        |       SUM(wk_cents) OVER (PARTITION BY g.cohort ORDER BY wk
        |         ROWS UNBOUNDED PRECEDING) / 100.0 AS cum_revenue
        |FROM g JOIN s ON g.cohort = s.cohort
        |ORDER BY cohort_week, week_index""".stripMargin,

    "q_tokenizer_fertility" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(array_length(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_words,
        |       CAST(SUM(array_length(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS n_tokens,
        |       FLOOR(SUM(array_length(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]'))) * 1.0
        |             / SUM(array_length(regexp_split_to_array(trim(text), '\s+')))
        |             * 10000.0 + 0.5) / 10000.0 AS fertility,
        |       FLOOR(SUM(length(text)) * 1.0
        |             / SUM(array_length(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')))
        |             * 10000.0 + 0.5) / 10000.0 AS chars_per_token
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_pca_iter" ->
      """WITH u AS (SELECT vec_id, UNNEST(CAST(embedding AS DOUBLE[])) AS x,
        |                  generate_subscripts(embedding, 1) AS dim
        |           FROM embeddings),
        |m AS (SELECT dim, AVG(x) AS mu FROM u GROUP BY dim),
        |p AS (SELECT a.dim AS i, b.dim AS j, SUM(a.x * b.x) AS sp, COUNT(*) AS n
        |      FROM u a JOIN u b ON a.vec_id = b.vec_id
        |      GROUP BY 1, 2),
        |c AS (SELECT i, j,
        |        CAST(FLOOR((sp / n - mi.mu * mj.mu) * 1000000.0 + 0.5) AS BIGINT) AS c6
        |      FROM p JOIN m mi ON mi.dim = p.i JOIN m mj ON mj.dim = p.j),
        |r AS (SELECT i, SUM(c6) AS u FROM c GROUP BY i),
        |nrm AS (SELECT SUM(u * u) AS ss FROM r)
        |SELECT CAST(i AS BIGINT) AS dim, CAST(u AS BIGINT) AS u_micro,
        |       FLOOR(u / SQRT(ss * 1.0) * 10000.0 + 0.5) / 10000.0 AS v1
        |FROM r CROSS JOIN nrm ORDER BY dim""".stripMargin,

    "q_decision_stump" ->
      """WITH g AS (
        |  SELECT CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) // 100000 AS bucket,
        |         COUNT(*) AS n,
        |         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS p
        |  FROM lineitem GROUP BY 1),
        |pre AS (
        |  SELECT bucket,
        |         CAST(SUM(n) OVER (ORDER BY bucket) AS BIGINT) AS n_l,
        |         CAST(SUM(p) OVER (ORDER BY bucket) AS BIGINT) AS pos_l,
        |         CAST(SUM(n) OVER () AS BIGINT) AS nt,
        |         CAST(SUM(p) OVER () AS BIGINT) AS pt
        |  FROM g),
        |sc AS (
        |  SELECT bucket, n_l, pos_l, nt - n_l AS n_r, pt - pos_l AS pos_r,
        |         CAST((pos_l * pos_l + (n_l - pos_l) * (n_l - pos_l)) * 1000000 // n_l
        |            + ((pt - pos_l) * (pt - pos_l)
        |               + ((nt - n_l) - (pt - pos_l)) * ((nt - n_l) - (pt - pos_l)))
        |              * 1000000 // (nt - n_l) AS BIGINT) AS purity_score
        |  FROM pre WHERE nt - n_l > 0)
        |SELECT CAST((bucket + 1) * 1000 AS BIGINT) AS threshold_dollars,
        |       n_l, pos_l, n_r, pos_r, purity_score,
        |       purity_score = MAX(purity_score) OVER () AS is_best
        |FROM sc ORDER BY threshold_dollars""".stripMargin,

    "q_mann_kendall" ->
      """WITH c AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM events),
        |k AS (
        |  SELECT * FROM (
        |    SELECT user_id, c,
        |           row_number() OVER (PARTITION BY user_id
        |             ORDER BY ts, event_id) AS rn
        |    FROM c) x WHERE rn <= 64),
        |nn AS (SELECT user_id, COUNT(*) AS n FROM k GROUP BY 1
        |       HAVING COUNT(*) >= 10),
        |s AS (
        |  SELECT a.user_id,
        |         CAST(SUM(CASE WHEN b.c > a.c THEN 1
        |                       WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        |  FROM k a JOIN k b ON a.user_id = b.user_id AND a.rn < b.rn
        |  GROUP BY 1),
        |t AS (
        |  SELECT user_id, CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
        |  FROM (SELECT user_id, c, COUNT(*) AS t FROM k GROUP BY 1, 2) x
        |  GROUP BY 1)
        |SELECT nn.user_id, CAST(nn.n AS BIGINT) AS n, s.s_stat,
        |       CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - t.tie18 AS BIGINT) AS var18,
        |       CASE WHEN s.s_stat > 0 THEN
        |              FLOOR((s.s_stat - 1)
        |                / SQRT((nn.n * (nn.n - 1) * (2 * nn.n + 5) - t.tie18) / 18.0)
        |                * 10000.0 + 0.5) / 10000.0
        |            WHEN s.s_stat < 0 THEN
        |              FLOOR((s.s_stat + 1)
        |                / SQRT((nn.n * (nn.n - 1) * (2 * nn.n + 5) - t.tie18) / 18.0)
        |                * 10000.0 + 0.5) / 10000.0
        |            ELSE 0.0 END AS z_mk
        |FROM nn JOIN s ON s.user_id = nn.user_id
        |        JOIN t ON t.user_id = nn.user_id
        |WHERE nn.n * (nn.n - 1) * (2 * nn.n + 5) - t.tie18 > 0
        |ORDER BY nn.user_id""".stripMargin,

    "q_spearman" ->
      """WITH base AS (
        |  SELECT event_type, strftime(CAST(ts AS TIMESTAMP), '%Y-%m') AS mon,
        |         CAST(props->>'$.k' AS BIGINT) AS k,
        |         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM events
        |  WHERE CAST(props->>'$.k' AS BIGINT) IS NOT NULL),
        |rk AS (
        |  SELECT event_type, mon,
        |         2 * rank() OVER (PARTITION BY event_type, mon ORDER BY k)
        |           + COUNT(*) OVER (PARTITION BY event_type, mon, k) - 1 AS rx,
        |         2 * rank() OVER (PARTITION BY event_type, mon ORDER BY c)
        |           + COUNT(*) OVER (PARTITION BY event_type, mon, c) - 1 AS ry
        |  FROM base),
        |m AS (
        |  SELECT event_type, mon, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
        |         CAST(SUM(rx * ry) AS BIGINT) AS sxy,
        |         CAST(SUM(rx * rx) AS BIGINT) AS sxx,
        |         CAST(SUM(ry * ry) AS BIGINT) AS syy
        |  FROM rk GROUP BY 1, 2 HAVING COUNT(*) >= 30)
        |SELECT event_type, mon, n,
        |       FLOOR((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |             / (SQRT(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |                * SQRT(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
        |             * 10000.0 + 0.5) / 10000.0 AS rho
        |FROM m
        |WHERE CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
        |  AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
        |ORDER BY event_type, mon""".stripMargin,

    "q_hhi" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |           // 100000 AS kd
        |  FROM orders GROUP BY 1),
        |seg AS (
        |  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |         CAST(SUM(kd) AS BIGINT) AS tot_kd,
        |         CAST(SUM(kd * kd) AS BIGINT) AS sq_kd,
        |         CAST(MAX(kd) AS BIGINT) AS max_kd
        |  FROM spend JOIN customer ON c_custkey = o_custkey
        |  GROUP BY 1)
        |SELECT c_mktsegment, n_customers, tot_kd,
        |       CAST(sq_kd * 1000000 // (tot_kd * tot_kd) AS BIGINT) AS hhi_micro,
        |       CAST(max_kd * 1000000 // tot_kd AS BIGINT) AS top_share_micro
        |FROM seg WHERE tot_kd > 0
        |ORDER BY c_mktsegment""".stripMargin,

    "q_window_distinct" ->
      """WITH f AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM (
        |    SELECT user_id, event_type, ts, event_id,
        |           row_number() OVER (PARTITION BY user_id, event_type
        |             ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |    FROM events) x WHERE rn = 1)
        |SELECT user_id, event_type,
        |       CAST(row_number() OVER (PARTITION BY user_id
        |         ORDER BY ts, event_id) AS BIGINT) AS seen_order,
        |       epoch_us(ts) AS ts_us
        |FROM f ORDER BY user_id, seen_order""".stripMargin,

    "q_xml_parse" ->
      """SELECT o_orderpriority AS priority,
        |       CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |         AS sum_cents,
        |       CAST(MIN(o_orderkey) AS BIGINT) AS min_key
        |FROM orders GROUP BY 1 ORDER BY priority""".stripMargin,

    "q_blocking_keys" ->
      """WITH s1 AS (SELECT split_part(p_name, ' ', 1) AS bk FROM part),
        |s2 AS (SELECT p_brand AS bk FROM part),
        |s3 AS (SELECT p_type || '|' || CAST(p_size AS VARCHAR) AS bk FROM part),
        |agg AS (
        |  SELECT 'name_token' AS scheme, COUNT(*) AS n_blocks, MAX(b) AS max_block,
        |         SUM(b * (b - 1) // 2) AS cand_pairs, SUM(b) AS nn
        |  FROM (SELECT bk, COUNT(*) AS b FROM s1 GROUP BY 1) x
        |  UNION ALL
        |  SELECT 'brand', COUNT(*), MAX(b), SUM(b * (b - 1) // 2), SUM(b)
        |  FROM (SELECT bk, COUNT(*) AS b FROM s2 GROUP BY 1) x
        |  UNION ALL
        |  SELECT 'type_size', COUNT(*), MAX(b), SUM(b * (b - 1) // 2), SUM(b)
        |  FROM (SELECT bk, COUNT(*) AS b FROM s3 GROUP BY 1) x)
        |SELECT scheme, CAST(n_blocks AS BIGINT) AS n_blocks,
        |       CAST(max_block AS BIGINT) AS max_block,
        |       CAST(cand_pairs AS BIGINT) AS cand_pairs,
        |       CAST((nn * (nn - 1) // 2 - cand_pairs) * 1000000
        |            // (nn * (nn - 1) // 2) AS BIGINT) AS reduction_micro
        |FROM agg ORDER BY scheme""".stripMargin,

    "q_jaro_winkler" ->
      """WITH n AS (SELECT DISTINCT p_name AS name FROM part),
        |p AS (
        |  SELECT a.name AS name_a, b.name AS name_b
        |  FROM n a JOIN n b
        |    ON substr(a.name, 1, 1) = substr(b.name, 1, 1)
        |   AND a.name < b.name)
        |SELECT name_a, name_b, jw
        |FROM (SELECT name_a, name_b,
        |        FLOOR(jaro_winkler_similarity(name_a, name_b) * 10000.0 + 0.5)
        |          / 10000.0 AS jw
        |      FROM p) s
        |WHERE jw >= 0.84
        |ORDER BY name_a, name_b""".stripMargin,

    "q_lorenz" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |           AS cents
        |  FROM orders GROUP BY 1),
        |grid AS (SELECT cents // 100 AS gv, COUNT(*) AS nc, SUM(cents) AS gc
        |         FROM spend GROUP BY 1),
        |d AS (SELECT gv, nc, gc,
        |        (SUM(nc) OVER (ORDER BY gv) * 10 + SUM(nc) OVER () - 1)
        |          // SUM(nc) OVER () AS decile
        |      FROM grid),
        |g AS (SELECT decile, SUM(nc) AS n_customers,
        |        SUM(gc) AS decile_cents
        |      FROM d GROUP BY 1),
        |c AS (SELECT decile, n_customers, decile_cents,
        |        SUM(decile_cents) OVER (ORDER BY decile) AS cum_cents,
        |        SUM(n_customers) OVER (ORDER BY decile) AS cum_customers,
        |        SUM(decile_cents) OVER () AS tc,
        |        SUM(n_customers) OVER () AS tn
        |      FROM g)
        |SELECT CAST(decile AS BIGINT) AS decile,
        |       CAST(n_customers AS BIGINT) AS n_customers,
        |       CAST(decile_cents AS BIGINT) AS decile_cents,
        |       CAST(cum_customers * 1000000 // tn AS BIGINT) AS cum_pop_micro,
        |       CAST(cum_cents * 1000000 // tc AS BIGINT) AS cum_spend_micro
        |FROM c ORDER BY decile""".stripMargin,

    "q_session_window" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |x AS (
        |  SELECT user_id, ts, event_id, us,
        |         CASE WHEN prev IS NULL OR us - prev >= 1800000000 THEN 1
        |              ELSE 0 END AS is_new
        |  FROM (SELECT *, lag(us) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id) AS prev FROM e) t),
        |s AS (
        |  SELECT user_id, us,
        |         SUM(is_new) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS sess_n
        |  FROM x)
        |SELECT user_id, CAST(MIN(us) AS BIGINT) AS start_us,
        |       CAST(MAX(us) + 1800000000 AS BIGINT) AS end_us,
        |       CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sess_n HAVING COUNT(*) >= 3
        |ORDER BY user_id, start_us""".stripMargin,

    "q_theil_sen" ->
      """WITH c AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM events),
        |k AS (
        |  SELECT * FROM (
        |    SELECT user_id, us, c,
        |           row_number() OVER (PARTITION BY user_id
        |             ORDER BY ts, event_id) AS rn
        |    FROM c) x WHERE rn <= 64),
        |nn AS (SELECT user_id, COUNT(*) AS n FROM k GROUP BY 1
        |       HAVING COUNT(*) >= 10),
        |p AS (
        |  SELECT a.user_id, b.c - a.c AS num, b.us - a.us AS den
        |  FROM k a JOIN k b ON a.user_id = b.user_id AND a.rn < b.rn
        |  JOIN nn ON nn.user_id = a.user_id
        |  WHERE b.us - a.us > 0),
        |sl AS (SELECT user_id, num, den,
        |         (num * 3600000000.0) / den AS slope FROM p),
        |r AS (
        |  SELECT user_id, num, den, slope,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY slope, num, den) AS rn,
        |         COUNT(*) OVER (PARTITION BY user_id) AS np
        |  FROM sl)
        |SELECT r.user_id, CAST(nn.n AS BIGINT) AS n,
        |       CAST(np AS BIGINT) AS n_pairs,
        |       CAST(num AS BIGINT) AS med_num, CAST(den AS BIGINT) AS med_den,
        |       FLOOR(slope * 10000.0 + 0.5) / 10000.0 AS slope_cph
        |FROM r JOIN nn ON nn.user_id = r.user_id
        |WHERE rn = (np + 1) // 2
        |ORDER BY r.user_id""".stripMargin,

    "q_avro_roundtrip" ->
      """SELECT o_orderpriority AS priority,
        |       CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |         AS sum_cents,
        |       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
        |FROM orders GROUP BY 1 ORDER BY priority""".stripMargin,

    "q_item_sim" ->
      """WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |li AS (SELECT l_orderkey, l_partkey FROM
        |         (SELECT *, COUNT(*) OVER (PARTITION BY l_orderkey) AS bsz FROM li0)
        |       WHERE bsz BETWEEN 2 AND 120),
        |p AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
        |             CAST(COUNT(*) AS BIGINT) AS n_ab
        |      FROM li a JOIN li b
        |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |s AS (SELECT l_partkey AS pk, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n
        |      FROM li GROUP BY 1),
        |j AS (SELECT p.pa, p.pb, p.n_ab, sa.n AS n_a, sb.n AS n_b,
        |             p.n_ab / sqrt(CAST(sa.n * sb.n AS DOUBLE)) AS sim
        |      FROM p JOIN s sa ON sa.pk = p.pa JOIN s sb ON sb.pk = p.pb)
        |SELECT pa AS p_a, pb AS p_b, n_ab, n_a, n_b, ROUND(sim, 6) AS cosine_sim
        |FROM j ORDER BY sim DESC, pa, pb LIMIT 50""".stripMargin,

    "q_kcore" ->
      """WITH li0 AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM
        |         (SELECT *, COUNT(*) OVER (PARTITION BY l_orderkey) AS bsz FROM li0)
        |       WHERE bsz <= 120),
        |e0 AS MATERIALIZED (SELECT a.l_partkey AS pa, b.l_partkey AS pb
        |       FROM li a JOIN li b
        |         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |d1 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM
        |         (SELECT pa AS node FROM e0 UNION ALL SELECT pb FROM e0) GROUP BY 1),
        |e1 AS MATERIALIZED (SELECT pa, pb FROM e0
        |       WHERE pa IN (SELECT node FROM d1 WHERE deg >= 3)
        |         AND pb IN (SELECT node FROM d1 WHERE deg >= 3)),
        |d2 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM
        |         (SELECT pa AS node FROM e1 UNION ALL SELECT pb FROM e1) GROUP BY 1),
        |e2 AS MATERIALIZED (SELECT pa, pb FROM e1
        |       WHERE pa IN (SELECT node FROM d2 WHERE deg >= 3)
        |         AND pb IN (SELECT node FROM d2 WHERE deg >= 3)),
        |d3 AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM
        |         (SELECT pa AS node FROM e2 UNION ALL SELECT pb FROM e2) GROUP BY 1),
        |e3 AS MATERIALIZED (SELECT pa, pb FROM e2
        |       WHERE pa IN (SELECT node FROM d3 WHERE deg >= 3)
        |         AND pb IN (SELECT node FROM d3 WHERE deg >= 3))
        |SELECT 1 AS round,
        |       (SELECT CAST(COUNT(DISTINCT node) AS BIGINT) FROM
        |          (SELECT pa AS node FROM e1 UNION ALL SELECT pb FROM e1)) AS n_nodes,
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM e1) AS n_edges
        |UNION ALL
        |SELECT 2,
        |       (SELECT CAST(COUNT(DISTINCT node) AS BIGINT) FROM
        |          (SELECT pa AS node FROM e2 UNION ALL SELECT pb FROM e2)),
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM e2)
        |UNION ALL
        |SELECT 3,
        |       (SELECT CAST(COUNT(DISTINCT node) AS BIGINT) FROM
        |          (SELECT pa AS node FROM e3 UNION ALL SELECT pb FROM e3)),
        |       (SELECT CAST(COUNT(*) AS BIGINT) FROM e3)
        |ORDER BY round""".stripMargin,

    "q_fd_audit" ->
      """WITH
        |a1 AS (SELECT o_orderkey AS lhs, o_custkey AS rhs FROM orders),
        |a2 AS (SELECT o_custkey AS lhs, o_orderpriority AS rhs FROM orders),
        |a3 AS (SELECT l_partkey AS lhs, l_suppkey AS rhs FROM lineitem),
        |g1 AS (SELECT lhs, SUM(c) AS n, MAX(c) AS mx, COUNT(*) AS n_rhs FROM
        |         (SELECT lhs, rhs, COUNT(*) AS c FROM a1 GROUP BY 1, 2) GROUP BY 1),
        |g2 AS (SELECT lhs, SUM(c) AS n, MAX(c) AS mx, COUNT(*) AS n_rhs FROM
        |         (SELECT lhs, rhs, COUNT(*) AS c FROM a2 GROUP BY 1, 2) GROUP BY 1),
        |g3 AS (SELECT lhs, SUM(c) AS n, MAX(c) AS mx, COUNT(*) AS n_rhs FROM
        |         (SELECT lhs, rhs, COUNT(*) AS c FROM a3 GROUP BY 1, 2) GROUP BY 1)
        |SELECT 'o_orderkey->o_custkey' AS fd,
        |       CAST(COUNT(*) AS BIGINT) AS lhs_groups,
        |       CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_groups,
        |       CAST(SUM(n) AS BIGINT) AS n_rows,
        |       ROUND(CAST(SUM(n - mx) AS DOUBLE) / SUM(n), 6) AS g3_rate,
        |       CAST(CASE WHEN SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0
        |            THEN 1 ELSE 0 END AS INTEGER) AS holds
        |FROM g1
        |UNION ALL
        |SELECT 'o_custkey->o_orderpriority',
        |       CAST(COUNT(*) AS BIGINT),
        |       CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |       CAST(SUM(n) AS BIGINT),
        |       ROUND(CAST(SUM(n - mx) AS DOUBLE) / SUM(n), 6),
        |       CAST(CASE WHEN SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0
        |            THEN 1 ELSE 0 END AS INTEGER)
        |FROM g2
        |UNION ALL
        |SELECT 'l_partkey->l_suppkey',
        |       CAST(COUNT(*) AS BIGINT),
        |       CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |       CAST(SUM(n) AS BIGINT),
        |       ROUND(CAST(SUM(n - mx) AS DOUBLE) / SUM(n), 6),
        |       CAST(CASE WHEN SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) = 0
        |            THEN 1 ELSE 0 END AS INTEGER)
        |FROM g3
        |ORDER BY fd""".stripMargin,

    "q_acf_sweep" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |         CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |           / COUNT(*) / 100.0 AS v
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, v,
        |        LAG(v, 1) OVER w AS v1, LAG(v, 2) OVER w AS v2,
        |        LAG(v, 3) OVER w AS v3, LAG(v, 4) OVER w AS v4,
        |        LAG(v, 5) OVER w AS v5
        |      FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |u AS (SELECT event_type, 1 AS lag_k, v, v1 AS vlag FROM l
        |      UNION ALL SELECT event_type, 2, v, v2 FROM l
        |      UNION ALL SELECT event_type, 3, v, v3 FROM l
        |      UNION ALL SELECT event_type, 4, v, v4 FROM l
        |      UNION ALL SELECT event_type, 5, v, v5 FROM l)
        |SELECT event_type, CAST(lag_k AS INTEGER) AS lag_k,
        |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       ROUND(corr(v, vlag), 4) AS acf
        |FROM u WHERE vlag IS NOT NULL
        |GROUP BY 1, 2 ORDER BY event_type, lag_k""".stripMargin,

    "q_holt_linear" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |         CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
        |           / 100.0 AS v
        |  FROM events GROUP BY 1, 2),
        |seq AS (SELECT event_type, v,
        |          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t,
        |          COUNT(*) OVER (PARTITION BY event_type) AS n
        |        FROM daily),
        |r(event_type, n, t, lvl, trd) AS (
        |  SELECT a.event_type, a.n, 2, b.v, b.v - a.v
        |  FROM seq a JOIN seq b ON b.event_type = a.event_type AND b.t = 2
        |  WHERE a.t = 1 AND a.n >= 3
        |  UNION ALL
        |  SELECT r.event_type, r.n, r.t + 1,
        |         0.5 * s.v + 0.5 * (r.lvl + r.trd),
        |         0.25 * (0.5 * s.v + 0.5 * (r.lvl + r.trd) - r.lvl) + 0.75 * r.trd
        |  FROM r JOIN seq s ON s.event_type = r.event_type AND s.t = r.t + 1
        |  WHERE r.t < r.n)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days,
        |       FLOOR(lvl * 10000.0 + 0.5) / 10000.0 AS level,
        |       FLOOR(trd * 10000.0 + 0.5) / 10000.0 AS trend,
        |       FLOOR((lvl + 7.0 * trd) * 10000.0 + 0.5) / 10000.0 AS forecast_7d
        |FROM r WHERE t = n ORDER BY event_type""".stripMargin,

    "q_naive_bayes" ->
      """WITH docs AS (SELECT doc_id, lang,
        |                     regexp_split_to_array(trim(text), '\s+') AS toks
        |              FROM documents),
        |train AS (SELECT * FROM docs WHERE doc_id % 5 <> 0),
        |test AS (SELECT * FROM docs WHERE doc_id % 5 = 0),
        |twc AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
        |        FROM (SELECT lang, UNNEST(toks) AS w FROM train) GROUP BY 1, 2),
        |v AS (SELECT COUNT(DISTINCT w) AS v FROM twc),
        |nt AS (SELECT COUNT(*) AS n_train FROM train),
        |langs AS (SELECT l.lang,
        |    CAST(FLOOR(ln(CAST(p.nd AS DOUBLE) / nt.n_train) * 1e6 + 0.5) AS BIGINT) AS prior_u,
        |    CAST(FLOOR(ln(1.0 / CAST(l.tot + v.v AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS default_u,
        |    l.tot + v.v AS denom
        |  FROM (SELECT lang, SUM(c) AS tot FROM twc GROUP BY 1) l
        |  JOIN (SELECT lang, COUNT(*) AS nd FROM train GROUP BY 1) p USING (lang)
        |  CROSS JOIN nt CROSS JOIN v),
        |model AS (SELECT t.w, t.lang,
        |    CAST(FLOOR(ln(CAST(t.c + 1 AS DOUBLE) / CAST(g.denom AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
        |      - g.default_u AS delta_u
        |  FROM twc t JOIN langs g USING (lang)),
        |ttok AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS cnt
        |         FROM (SELECT doc_id, UNNEST(toks) AS w FROM test) GROUP BY 1, 2),
        |dl AS (SELECT tt.doc_id, m.lang, SUM(tt.cnt * m.delta_u) AS ds
        |       FROM ttok tt JOIN model m USING (w) GROUP BY 1, 2),
        |scored AS (SELECT d.doc_id, d.lang_true, g.lang,
        |    g.prior_u + d.n_tok * g.default_u + COALESCE(dl.ds, 0) AS score_u
        |  FROM (SELECT doc_id, lang AS lang_true, CAST(len(toks) AS BIGINT) AS n_tok
        |        FROM test) d
        |  CROSS JOIN langs g
        |  LEFT JOIN dl ON dl.doc_id = d.doc_id AND dl.lang = g.lang),
        |pred AS (SELECT doc_id, lang_true, lang AS lang_pred,
        |           ROW_NUMBER() OVER (PARTITION BY doc_id
        |                              ORDER BY score_u DESC, lang ASC) AS rn
        |         FROM scored)
        |SELECT lang_true, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
        |FROM pred WHERE rn = 1 GROUP BY 1, 2 ORDER BY lang_true, lang_pred""".stripMargin,

    "q_rate_limit" -> AnalyticsOps.rateLimitOracleSql,

    "q_mmr_rerank" -> VectorOps.mmrRerankOracleSql,

    "q_entry_exit" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id,
        |         epoch_ms(CAST(ts AS TIMESTAMP)) AS ms
        |  FROM events),
        |m AS (SELECT *, CASE WHEN lag(ms) OVER w IS NULL
        |                       OR ms - lag(ms) OVER w > 1800000
        |                     THEN 1 ELSE 0 END AS is_new
        |      FROM e WINDOW w AS (PARTITION BY user_id
        |        ORDER BY ms, event_id)),
        |s2 AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id
        |         ORDER BY ms, event_id ROWS UNBOUNDED PRECEDING) AS sess_n
        |       FROM m),
        |g AS (SELECT user_id, sess_n, COUNT(*) AS n_events,
        |        (MIN({'ms': ms, 'id': event_id, 't': event_type})).t AS entry,
        |        (MAX({'ms': ms, 'id': event_id, 't': event_type})).t AS exit
        |      FROM s2 GROUP BY 1, 2)
        |SELECT entry, exit,
        |       CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_bounces,
        |       FLOOR(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0
        |             / COUNT(*) * 10000.0 + 0.5) / 10000.0 AS bounce_share
        |FROM g GROUP BY 1, 2 ORDER BY entry, exit""".stripMargin,

    "q_skipgram" ->
      """WITH toks AS (
        |  SELECT regexp_split_to_array(trim(text), '\s+') AS tk
        |  FROM documents),
        |p AS (
        |  SELECT UNNEST(list_concat(
        |    list_transform(range(1, len(tk)),
        |      i -> {'w1': tk[i], 'w2': tk[i + 1], 'wt': 2}),
        |    list_transform(range(1, len(tk) - 1),
        |      i -> {'w1': tk[i], 'w2': tk[i + 2], 'wt': 1}))) AS s
        |  FROM toks WHERE len(tk) >= 3)
        |SELECT s.w1 AS w1, s.w2 AS w2,
        |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       CAST(SUM(s.wt) AS BIGINT) AS weight_halves
        |FROM p GROUP BY 1, 2
        |ORDER BY weight_halves DESC, w1, w2 LIMIT 50""".stripMargin,

    "q_unicode_fold" ->
      """WITH varied AS (
        |  SELECT doc_id, text AS vtext FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, translate(text, 'aeiou', 'áéíóú')
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, upper(text)
        |  FROM documents WHERE doc_id % 5 = 0 AND doc_id % 7 <> 0),
        |folded AS (
        |  SELECT translate(lower(vtext), 'áéíóú', 'aeiou') AS f, vtext
        |  FROM varied),
        |groups AS (
        |  SELECT f, CAST(COUNT(*) AS BIGINT) AS n_variants,
        |         CAST(COUNT(DISTINCT vtext) AS BIGINT) AS n_distinct_raw
        |  FROM folded GROUP BY f)
        |SELECT n_variants, n_distinct_raw,
        |       CAST(COUNT(*) AS BIGINT) AS n_groups
        |FROM groups GROUP BY 1, 2
        |ORDER BY n_variants, n_distinct_raw""".stripMargin,

    "q_ua_parse" ->
      """WITH ua AS (
        |  SELECT 'Mozilla/5.0 (' ||
        |         CASE user_id % 3
        |           WHEN 0 THEN 'Windows NT 10.0; Win64; x64'
        |           WHEN 1 THEN 'Macintosh; Intel Mac OS X 10_15_7'
        |           ELSE 'X11; Linux x86_64' END ||
        |         ') AppleWebKit/537.36 (KHTML, like Gecko) ' ||
        |         CASE event_id % 2
        |           WHEN 0 THEN 'Chrome/' || CAST(100 + event_id % 30 AS VARCHAR)
        |                       || '.0.0.0 Safari/537.36'
        |           ELSE 'Firefox/' || CAST(100 + event_id % 30 AS VARCHAR)
        |                || '.0' END AS ua
        |  FROM events)
        |SELECT regexp_extract(ua, '\((Windows|Macintosh|X11)[^)]*\)', 1)
        |         AS os_family,
        |       regexp_extract(ua, '(Chrome|Firefox)/', 1) AS browser,
        |       CAST(regexp_extract(ua, '(?:Chrome|Firefox)/(\d+)', 1)
        |            AS BIGINT) AS major,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM ua GROUP BY 1, 2, 3 ORDER BY os_family, browser, major""".stripMargin,

    "q_datetime_parse" ->
      """WITH f AS (
        |  SELECT event_id % 4 AS fmt, CAST(ts AS TIMESTAMP) AS t
        |  FROM events),
        |r AS (SELECT fmt, t,
        |        CASE fmt
        |          WHEN 0 THEN strftime(t, '%Y-%m-%dT%H:%M:%S')
        |          WHEN 1 THEN strftime(t, '%m/%d/%Y %H:%M:%S')
        |          WHEN 2 THEN strftime(t, '%Y%m%d%H%M%S')
        |          -- floor before the cast: CAST(DOUBLE AS BIGINT) rounds
        |          -- in DuckDB while Spark's unix_timestamp truncates
        |          ELSE CAST(CAST(floor(epoch(t)) AS BIGINT) AS VARCHAR)
        |          END AS raw
        |      FROM f),
        |p AS (SELECT fmt, t,
        |        CASE fmt
        |          WHEN 0 THEN strptime(raw, '%Y-%m-%dT%H:%M:%S')
        |          WHEN 1 THEN strptime(raw, '%m/%d/%Y %H:%M:%S')
        |          WHEN 2 THEN strptime(raw, '%Y%m%d%H%M%S')
        |          ELSE to_timestamp(CAST(raw AS BIGINT)) END AS parsed
        |      FROM r)
        |SELECT CAST(fmt AS BIGINT) AS fmt,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CASE WHEN CAST(epoch(parsed) AS BIGINT) =
        |                          CAST(epoch(date_trunc('second', t)) AS BIGINT)
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok,
        |       CAST(MIN(CAST(epoch(parsed) AS BIGINT)) AS BIGINT) AS min_epoch,
        |       CAST(MAX(CAST(epoch(parsed) AS BIGINT)) AS BIGINT) AS max_epoch
        |FROM p GROUP BY 1 ORDER BY fmt""".stripMargin,

    "q_num_parse" ->
      """WITH b AS (
        |  SELECT event_id % 5 AS shape,
        |         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM events),
        |r AS (SELECT shape, c,
        |        CAST(c // 100 AS VARCHAR) AS dollars,
        |        lpad(CAST(c % 100 AS VARCHAR), 2, '0') AS frac
        |      FROM b),
        |w AS (SELECT shape, c,
        |        dollars || '.' || frac AS plain,
        |        CASE WHEN length(dollars) > 3
        |             THEN substr(dollars, 1, length(dollars) - 3) || ',' ||
        |                  substr(dollars, length(dollars) - 2, 3) || '.' || frac
        |             ELSE dollars || '.' || frac END AS grouped
        |      FROM r),
        |raws AS (SELECT shape, c,
        |           CASE shape
        |             WHEN 0 THEN plain
        |             WHEN 1 THEN '$' || plain
        |             WHEN 2 THEN '  ' || plain || ' '
        |             WHEN 3 THEN '(' || plain || ')'
        |             ELSE grouped END AS raw
        |         FROM w),
        |parsed AS (SELECT shape, c,
        |             CASE WHEN contains(raw, '(') THEN 1 ELSE 0 END AS neg,
        |             regexp_replace(raw, '[$,()\s]', '', 'g') AS clean
        |           FROM raws),
        |fin AS (SELECT shape, c, neg,
        |          (1 - 2 * neg) *
        |          (CAST(string_split(clean, '.')[1] AS BIGINT) * 100 +
        |           CAST(string_split(clean, '.')[2] AS BIGINT)) AS parsed_c
        |        FROM parsed)
        |SELECT CAST(shape AS BIGINT) AS shape,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(parsed_c) AS BIGINT) AS sum_parsed_c,
        |       CAST(SUM(CASE WHEN parsed_c = (1 - 2 * neg) * c
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_exact
        |FROM fin GROUP BY 1 ORDER BY shape""".stripMargin,

    "q_pipeline_e2e" ->
      """WITH scored AS (
        |  SELECT doc_id, lang, text,
        |         len(t) AS n_tok,
        |         list_sum(list_transform(t, w ->
        |           CASE WHEN w IN ('the','a','and','of','to','in','is')
        |                THEN 1 ELSE 0 END)) AS n_stop
        |  FROM (SELECT doc_id, lang, text,
        |               regexp_split_to_array(trim(text), '\s+') AS t
        |        FROM documents)),
        |kept AS (SELECT * FROM scored
        |         WHERE n_tok BETWEEN 30 AND 90 AND n_stop >= 2),
        |dedup AS (
        |  SELECT (MIN({'d': doc_id, 'l': lang, 'n': n_tok})).d AS doc_id,
        |         (MIN({'d': doc_id, 'l': lang, 'n': n_tok})).l AS lang,
        |         (MIN({'d': doc_id, 'l': lang, 'n': n_tok})).n AS n_tok
        |  FROM kept GROUP BY text),
        |sharded AS (
        |  SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
        |           % 8 AS shard,
        |         lang, n_tok
        |  FROM dedup)
        |SELECT shard, lang,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        |FROM sharded GROUP BY 1, 2 ORDER BY shard, lang""".stripMargin,

    "q_robots_filter" ->
      """WITH rules AS (
        |  SELECT * FROM (VALUES
        |    ('/p', 0), ('/p/click', 1), ('/p/purchase', 1),
        |    ('/p/error', 0), ('/static', 1)) t(prefix, rule_allow)),
        |paths AS (
        |  SELECT '/p/' || event_type ||
        |         CASE WHEN event_id % 3 = 0 THEN '/' ELSE '' END AS path
        |  FROM events),
        |dp AS (SELECT DISTINCT path FROM paths),
        |m AS (SELECT dp.path, r.prefix, r.rule_allow
        |      FROM dp LEFT JOIN rules r ON dp.path LIKE r.prefix || '%'),
        |v AS (SELECT path,
        |        CAST(SUM(CASE WHEN prefix IS NOT NULL THEN 1 ELSE 0 END)
        |             AS BIGINT) AS n_rules_matched,
        |        CAST(COALESCE(
        |          (MAX({'l': length(prefix), 'a': rule_allow})).a, 1)
        |          AS BIGINT) AS allowed
        |      FROM m GROUP BY path)
        |SELECT p.path, v.n_rules_matched, v.allowed,
        |       CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM paths p JOIN v USING (path)
        |GROUP BY 1, 2, 3 ORDER BY p.path""".stripMargin,

    "q_store_meta_cols" ->
      """SELECT event_id // 1000 AS batch_offset,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       MIN(event_id) AS min_id, MAX(event_id) AS max_id
        |FROM events WHERE event_id % 20 = 0
        |GROUP BY 1 ORDER BY batch_offset""".stripMargin,

    "q_stream_store_source" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |         AS sum_cents
        |FROM events WHERE event_id % 20 = 0
        |GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q_silhouette" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 8),
        |dist AS (SELECT e.vec_id, c.centroid_id,
        |  CAST(FLOOR(list_sum(list_transform(range(1, len(e.v) + 1),
        |    i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))) * 1e6 + 0.5) AS BIGINT) AS d2u
        |  FROM e CROSS JOIN c),
        |rk AS (SELECT vec_id, centroid_id, d2u,
        |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2u ASC, centroid_id ASC) AS rn
        |  FROM dist),
        |per AS (SELECT vec_id,
        |  MAX(CASE WHEN rn = 1 THEN centroid_id END) AS centroid_id,
        |  sqrt(MAX(CASE WHEN rn = 1 THEN d2u END) / 1e6) AS a,
        |  sqrt(MAX(CASE WHEN rn = 2 THEN d2u END) / 1e6) AS b
        |  FROM rk WHERE rn <= 2 GROUP BY vec_id),
        |su AS (SELECT centroid_id,
        |  CASE WHEN greatest(a, b) = 0 THEN 0
        |       ELSE CAST(FLOOR((b - a) / greatest(a, b) * 1e6 + 0.5) AS BIGINT)
        |  END AS s_u
        |  FROM per)
        |SELECT centroid_id, CAST(COUNT(*) AS BIGINT) AS n_members,
        |       FLOOR(CAST(SUM(s_u) AS DOUBLE) / COUNT(*) + 0.5) / 1e6 AS mean_silhouette
        |FROM su GROUP BY 1 ORDER BY centroid_id""".stripMargin,

    "q_fixed_width" ->
      """SELECT o_orderstatus AS status,
        |       CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |         AS sum_cents,
        |       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
        |       MAX(strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')) AS max_date
        |FROM orders GROUP BY 1 ORDER BY status""".stripMargin,

    "q_rake_keywords" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
        |           FROM documents),
        |tok AS (SELECT doc_id, i AS pos, toks[i] AS w
        |        FROM t, UNNEST(range(1, len(toks) + 1)) AS u(i)),
        |m AS (SELECT doc_id, pos, w,
        |        w IN ('the','a','of','and','to','in','is','it','for','on') AS stop
        |      FROM tok),
        |isl AS (SELECT doc_id, pos, w, stop,
        |          SUM(CASE WHEN stop THEN 1 ELSE 0 END)
        |            OVER (PARTITION BY doc_id ORDER BY pos) AS isl
        |        FROM m),
        |ph AS (SELECT doc_id, isl, pos, w FROM isl WHERE NOT stop),
        |plen AS (SELECT doc_id, isl, COUNT(*) AS plen FROM ph GROUP BY 1, 2),
        |wsc AS (SELECT w, SUM(plen) * 1000000 // COUNT(*) AS wu
        |        FROM ph JOIN plen USING (doc_id, isl) GROUP BY w),
        |ptxt AS (SELECT p.doc_id, p.isl,
        |           string_agg(p.w, ' ' ORDER BY p.pos) AS phrase,
        |           CAST(SUM(wsc.wu) AS BIGINT) AS score_u
        |         FROM ph p
        |         JOIN plen USING (doc_id, isl)
        |         JOIN wsc ON wsc.w = p.w
        |         WHERE plen BETWEEN 2 AND 4
        |         GROUP BY 1, 2)
        |SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
        |       CAST(MAX(score_u) AS BIGINT) AS score_u
        |FROM ptxt GROUP BY 1
        |ORDER BY score_u DESC, phrase LIMIT 50""".stripMargin,

    "q_fellegi_sunter" -> MiningOps.fellegiSunterOracleSql,

    "q_entity_resolution" ->
      """WITH RECURSIVE
        |ids AS MATERIALIZED (SELECT p_name, MIN(p_partkey) AS nid,
        |                            CAST(COUNT(*) AS BIGINT) AS n_parts
        |                     FROM part GROUP BY 1),
        |m AS MATERIALIZED (
        |  SELECT a.nid AS da, b.nid AS db
        |  FROM ids a JOIN ids b
        |    ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
        |   AND a.p_name < b.p_name
        |  WHERE FLOOR(jaro_winkler_similarity(a.p_name, b.p_name) * 10000.0 + 0.5)
        |          / 10000.0 >= 0.88),
        |edges AS MATERIALIZED (
        |  SELECT da AS a, db AS b FROM m
        |  UNION ALL SELECT db, da FROM m),
        |reach(node, r) AS (
        |  SELECT DISTINCT a, a FROM edges
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.node
        |),
        |comp AS (SELECT node, MIN(r) AS comp FROM reach GROUP BY node)
        |SELECT c.comp AS entity_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_names,
        |       CAST(SUM(i.n_parts) AS BIGINT) AS n_parts
        |FROM comp c JOIN ids i ON i.nid = c.node
        |GROUP BY 1 HAVING COUNT(*) >= 2
        |ORDER BY entity_id""".stripMargin,

    "q_assortativity" ->
      """WITH li0 AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM
        |         (SELECT *, COUNT(*) OVER (PARTITION BY l_orderkey) AS bsz FROM li0)
        |       WHERE bsz <= 120),
        |e0 AS MATERIALIZED (SELECT a.l_partkey AS pa, b.l_partkey AS pb
        |       FROM li a JOIN li b
        |         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |bi AS MATERIALIZED (SELECT pa AS u, pb AS v FROM e0
        |                    UNION ALL SELECT pb, pa FROM e0),
        |deg AS MATERIALIZED (SELECT u, COUNT(*) AS deg FROM bi GROUP BY 1),
        |x AS (SELECT dx.deg AS dx, dy.deg AS dy
        |      FROM bi JOIN deg dx ON dx.u = bi.u JOIN deg dy ON dy.u = bi.v),
        |s AS (SELECT COUNT(*) AS m2, SUM(dx) AS sx, SUM(dy) AS sy,
        |             SUM(dx * dy) AS sxy, SUM(dx * dx) AS sxx, SUM(dy * dy) AS syy
        |      FROM x)
        |SELECT CAST(m2 // 2 AS BIGINT) AS n_edges,
        |       FLOOR((CAST(m2 AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |         / (sqrt(CAST(m2 AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |            * sqrt(CAST(m2 AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
        |         * 10000.0 + 0.5) / 10000.0 AS assortativity
        |FROM s""".stripMargin,

    "q_lateness_audit" ->
      """WITH e AS (SELECT user_id, event_id,
        |                  epoch_us(CAST(ts AS TIMESTAMP))
        |                    - (event_id % 10) * 90000000 AS us
        |           FROM events),
        |l AS (SELECT user_id, us,
        |        GREATEST(0, COALESCE(MAX(us) OVER (PARTITION BY user_id ORDER BY event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), us) - us) AS late_us
        |      FROM e)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
        |       CAST(MAX(late_us) AS BIGINT) AS max_late_us,
        |       CAST(SUM(late_us) AS BIGINT) AS total_late_us
        |FROM l GROUP BY 1
        |HAVING SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) > 0
        |ORDER BY user_id""".stripMargin,

    "q_recommender_eval" ->
      """WITH li0 AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |b AS MATERIALIZED (SELECT l_orderkey, list_sort(list(l_partkey)) AS ps
        |     FROM li0 GROUP BY 1 HAVING COUNT(*) BETWEEN 2 AND 120),
        |tr AS MATERIALIZED (SELECT * FROM b WHERE l_orderkey % 5 <> 0),
        |te AS MATERIALIZED (SELECT * FROM b WHERE l_orderkey % 5 = 0),
        |trli AS MATERIALIZED (SELECT l_orderkey, UNNEST(ps) AS pk FROM tr),
        |p AS MATERIALIZED (SELECT a.pk AS pa, c.pk AS pb, COUNT(*) AS n_ab
        |     FROM trli a JOIN trli c
        |       ON a.l_orderkey = c.l_orderkey AND a.pk < c.pk
        |     GROUP BY 1, 2),
        |s AS MATERIALIZED (SELECT pk, COUNT(*) AS n FROM trli GROUP BY 1),
        |sims AS MATERIALIZED (SELECT p.pa, p.pb,
        |     CAST(FLOOR(p.n_ab / sqrt(CAST(sa.n * sb.n AS DOUBLE)) * 1e6 + 0.5)
        |       AS BIGINT) AS sim_u
        |     FROM p JOIN s sa ON sa.pk = p.pa JOIN s sb ON sb.pk = p.pb),
        |bidir AS MATERIALIZED (SELECT pa, pb, sim_u FROM sims
        |     UNION ALL SELECT pb, pa, sim_u FROM sims),
        |pq AS MATERIALIZED (SELECT okey, target, qs, UNNEST(qs) AS q FROM
        |     (SELECT l_orderkey AS okey, ps[len(ps)] AS target,
        |             ps[1:len(ps)-1] AS qs FROM te)),
        |scored AS MATERIALIZED (SELECT pq.okey, pq.target, bd.pb,
        |     SUM(bd.sim_u) AS score_u
        |     FROM pq JOIN bidir bd ON bd.pa = pq.q
        |     WHERE bd.pb <> pq.q AND NOT list_contains(pq.qs, bd.pb)
        |     GROUP BY 1, 2, 3),
        |rk AS (SELECT okey, target, pb,
        |         ROW_NUMBER() OVER (PARTITION BY okey
        |                            ORDER BY score_u DESC, pb ASC) AS rnk
        |       FROM scored),
        |pb2 AS (SELECT okey, target,
        |          MAX(CASE WHEN rnk <= 10 AND pb = target THEN 1 ELSE 0 END) AS hit
        |        FROM rk GROUP BY 1, 2),
        |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_scored,
        |               CAST(SUM(hit) AS BIGINT) AS hits FROM pb2),
        |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_test FROM te)
        |SELECT nt.n_test, agg.n_scored, agg.hits,
        |       FLOOR(CAST(agg.hits AS DOUBLE) / agg.n_scored * 10000.0 + 0.5)
        |         / 10000.0 AS hit_rate_at_10
        |FROM agg CROSS JOIN nt""".stripMargin,

    "q_conformal_interval" ->
      """WITH o AS (SELECT o_orderpriority AS prio, o_orderkey AS okey,
        |                  CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
        |           FROM orders),
        |fit AS (SELECT prio, CAST(COUNT(*) AS BIGINT) AS n_train,
        |               CAST(SUM(c) // COUNT(*) AS BIGINT) AS mu_cents
        |        FROM o WHERE okey % 5 >= 2 GROUP BY 1),
        |cal AS (SELECT o.prio, o.okey, abs(o.c - fit.mu_cents) AS r
        |        FROM o JOIN fit USING (prio) WHERE okey % 5 = 1),
        |calr AS (SELECT prio, r,
        |           ROW_NUMBER() OVER (PARTITION BY prio ORDER BY r, okey) AS rk,
        |           COUNT(*) OVER (PARTITION BY prio) AS n_calib
        |         FROM cal),
        |qh AS (SELECT prio, CAST(n_calib AS BIGINT) AS n_calib,
        |              CAST(r AS BIGINT) AS qhat_cents
        |       FROM calr WHERE rk = ((n_calib + 1) * 9 + 9) // 10)
        |SELECT o.prio, fit.n_train, fit.mu_cents, qh.n_calib, qh.qhat_cents,
        |       CAST(COUNT(*) AS BIGINT) AS n_test,
        |       FLOOR(CAST(SUM(CASE WHEN abs(o.c - fit.mu_cents) <= qh.qhat_cents
        |                           THEN 1 ELSE 0 END) AS DOUBLE)
        |         / COUNT(*) * 10000.0 + 0.5) / 10000.0 AS coverage
        |FROM o JOIN fit USING (prio) JOIN qh USING (prio)
        |WHERE o.okey % 5 = 0
        |GROUP BY 1, 2, 3, 4, 5 ORDER BY prio""".stripMargin,

    "q_seasonal_decompose" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |         SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS cents
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, day, cents,
        |        COUNT(*) OVER w AS n7, SUM(cents) OVER w AS s7
        |      FROM daily
        |      WINDOW w AS (PARTITION BY event_type ORDER BY day
        |                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |detr AS (SELECT event_type, day, cents,
        |           cents - CAST(s7 // 7 AS BIGINT) AS detr,
        |           CAST(dayofweek(day) + 1 AS INTEGER) AS dow
        |         FROM t WHERE n7 = 7),
        |sea AS (SELECT event_type, dow,
        |          CAST(FLOOR(CAST(SUM(detr) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)
        |            AS seasonal_cents
        |        FROM detr GROUP BY 1, 2)
        |SELECT d.event_type, d.dow, CAST(COUNT(*) AS BIGINT) AS n_days,
        |       MAX(sea.seasonal_cents) AS seasonal_cents,
        |       CAST(FLOOR(CAST(SUM(abs(d.detr - sea.seasonal_cents)) AS DOUBLE)
        |         / COUNT(*) + 0.5) AS BIGINT) AS mean_abs_resid
        |FROM detr d JOIN sea USING (event_type, dow)
        |GROUP BY 1, 2 ORDER BY event_type, dow""".stripMargin,

    "q_hits_iter" ->
      """WITH e AS (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem),
        |a AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS auth FROM e GROUP BY 1)
        |SELECT e.src AS partkey, CAST(COUNT(*) AS BIGINT) AS out_deg,
        |       CAST(SUM(a.auth) AS BIGINT) AS hub_score
        |FROM e JOIN a USING (dst)
        |GROUP BY 1 ORDER BY hub_score DESC, partkey LIMIT 100""".stripMargin,

    "q_geo_grid_join" ->
      """WITH u AS MATERIALIZED (
        |  SELECT user_id,
        |         CAST(user_id % 40 AS DOUBLE) * 0.1 + 0.05 AS lat_deg,
        |         CAST(user_id // 40 AS DOUBLE) * 0.1 + 0.05 AS lon_deg
        |  FROM (SELECT DISTINCT user_id FROM events)),
        |r AS MATERIALIZED (SELECT user_id AS ub, lat_deg AS lat_b, lon_deg AS lon_b,
        |       CAST(FLOOR(lat_deg) AS BIGINT) AS cla,
        |       ((CAST(FLOOR(lon_deg + 180) AS BIGINT) % 360) + 360) % 360 AS clo
        |     FROM u),
        |l AS MATERIALIZED (SELECT user_id AS ua, lat_deg AS lat_a, lon_deg AS lon_a,
        |       CAST(FLOOR(lat_deg) AS BIGINT) + dx.dx AS cla,
        |       (((CAST(FLOOR(lon_deg + 180) AS BIGINT) % 360) + dy.dy) % 360 + 360) % 360 AS clo
        |     FROM u,
        |          (SELECT UNNEST([-1, 0, 1]) AS dx) dx,
        |          (SELECT UNNEST([-1, 0, 1]) AS dy) dy),
        |cand AS (SELECT l.ua, r.ub, l.lat_a, l.lon_a, r.lat_b, r.lon_b
        |         FROM l JOIN r USING (cla, clo) WHERE l.ua < r.ub),
        |dd AS (SELECT ua, ub,
        |         FLOOR(2 * 6371 * asin(sqrt(
        |           POW(sin((lat_b - lat_a) * pi() / 180 / 2), 2)
        |           + cos(lat_a * pi() / 180) * cos(lat_b * pi() / 180)
        |             * POW(sin((lon_b - lon_a) * pi() / 180 / 2), 2)))
        |           * 10000.0 + 0.5) / 10000.0 AS dist_r
        |       FROM cand)
        |SELECT CAST(FLOOR(dist_r / 25.0) AS BIGINT) AS band_25km,
        |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       CAST(COUNT(DISTINCT ua) AS BIGINT) AS n_users_a
        |FROM dd WHERE dist_r <= 100.0
        |GROUP BY 1 ORDER BY band_25km""".stripMargin,

    "q_sprt" ->
      """WITH c AS (SELECT user_id % 2 AS arm, event_id,
        |  CASE WHEN value > 100 THEN 405465 ELSE -57158 END AS inc_u
        |  FROM events WHERE event_type = 'click'),
        |l AS (SELECT arm, event_id, inc_u,
        |  SUM(inc_u) OVER (PARTITION BY arm ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr_u
        |  FROM c)
        |SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_obs,
        |  CAST(COALESCE(MIN(CASE WHEN llr_u >= 2944439 THEN event_id END), -1)
        |    AS BIGINT) AS first_cross_up,
        |  CAST(COALESCE(MIN(CASE WHEN llr_u <= -2944439 THEN event_id END), -1)
        |    AS BIGINT) AS first_cross_dn,
        |  CAST(SUM(inc_u) AS BIGINT) AS final_llr_u,
        |  CASE WHEN MIN(CASE WHEN llr_u >= 2944439 THEN event_id END) IS NOT NULL
        |        AND (MIN(CASE WHEN llr_u <= -2944439 THEN event_id END) IS NULL
        |             OR MIN(CASE WHEN llr_u >= 2944439 THEN event_id END)
        |                < MIN(CASE WHEN llr_u <= -2944439 THEN event_id END))
        |       THEN 'accept_h1'
        |       WHEN MIN(CASE WHEN llr_u <= -2944439 THEN event_id END) IS NOT NULL
        |       THEN 'accept_h0'
        |       ELSE 'continue' END AS decision
        |FROM l GROUP BY arm ORDER BY arm""".stripMargin,

    "q_bpe_apply" ->
      """WITH v AS MATERIALIZED (
        |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM
        |    (SELECT UNNEST(regexp_split_to_array(trim(text), '\s+')) AS word
        |     FROM documents)
        |  GROUP BY 1),
        |tp AS (SELECT pair,
        |         substr(pair, 1, 1) || ' ' || substr(pair, 2, 1) AS spaced
        |       FROM (SELECT substr(word, CAST(i AS INT), 2) AS pair, SUM(freq) AS n
        |             FROM v, UNNEST(range(1, len(word))) AS t(i)
        |             WHERE len(word) >= 2
        |             GROUP BY 1 ORDER BY n DESC, pair LIMIT 1))
        |SELECT v.word, v.freq, tp.pair AS merge_pair,
        |       replace(array_to_string(regexp_split_to_array(v.word, ''), ' '),
        |               tp.spaced, tp.pair) AS symbols_after,
        |       CAST(CASE WHEN replace(
        |           array_to_string(regexp_split_to_array(v.word, ''), ' '),
        |           tp.spaced, tp.pair)
        |         <> array_to_string(regexp_split_to_array(v.word, ''), ' ')
        |         THEN 1 ELSE 0 END AS INTEGER) AS changed
        |FROM v CROSS JOIN tp
        |ORDER BY v.freq DESC, v.word LIMIT 30""".stripMargin,

    "q_diff_in_diff" ->
      """WITH p AS (SELECT user_id % 2 AS arm,
        |             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |             CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS c
        |           FROM events WHERE event_type = 'purchase'),
        |b AS (SELECT CAST((MIN(us) + MAX(us)) // 2 AS BIGINT) AS mid FROM p),
        |m AS (SELECT arm, CASE WHEN us >= b.mid THEN 1 ELSE 0 END AS post,
        |        CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(c) AS DOUBLE) / COUNT(*) AS mean_c
        |      FROM p CROSS JOIN b GROUP BY 1, 2)
        |SELECT
        |  MAX(CASE WHEN arm = 1 AND post = 0 THEN n END) AS n_t_pre,
        |  MAX(CASE WHEN arm = 1 AND post = 1 THEN n END) AS n_t_post,
        |  MAX(CASE WHEN arm = 0 AND post = 0 THEN n END) AS n_c_pre,
        |  MAX(CASE WHEN arm = 0 AND post = 1 THEN n END) AS n_c_post,
        |  FLOOR(MAX(CASE WHEN arm = 1 AND post = 0 THEN mean_c END) * 100.0 + 0.5)
        |    / 100.0 AS mean_t_pre,
        |  FLOOR(MAX(CASE WHEN arm = 1 AND post = 1 THEN mean_c END) * 100.0 + 0.5)
        |    / 100.0 AS mean_t_post,
        |  FLOOR(MAX(CASE WHEN arm = 0 AND post = 0 THEN mean_c END) * 100.0 + 0.5)
        |    / 100.0 AS mean_c_pre,
        |  FLOOR(MAX(CASE WHEN arm = 0 AND post = 1 THEN mean_c END) * 100.0 + 0.5)
        |    / 100.0 AS mean_c_post,
        |  FLOOR(((MAX(CASE WHEN arm = 1 AND post = 1 THEN mean_c END)
        |          - MAX(CASE WHEN arm = 1 AND post = 0 THEN mean_c END))
        |         - (MAX(CASE WHEN arm = 0 AND post = 1 THEN mean_c END)
        |            - MAX(CASE WHEN arm = 0 AND post = 0 THEN mean_c END)))
        |        * 100.0 + 0.5) / 100.0 AS did_cents
        |FROM m""".stripMargin,

    "q_cuped" ->
      """WITH p AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |             CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS c
        |           FROM events WHERE event_type = 'purchase'),
        |b AS (SELECT CAST((MIN(us) + MAX(us)) // 2 AS BIGINT) AS mid FROM p),
        |pu AS (SELECT user_id,
        |         SUM(CASE WHEN us < b.mid THEN c ELSE 0 END) AS x,
        |         SUM(CASE WHEN us >= b.mid THEN c ELSE 0 END) AS y
        |       FROM p CROSS JOIN b GROUP BY 1),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |        CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |        CAST(SUM(x * y) AS DOUBLE) AS sxy,
        |        CAST(SUM(x * x) AS DOUBLE) AS sxx,
        |        CAST(SUM(y * y) AS DOUBLE) AS syy
        |      FROM pu)
        |SELECT n,
        |  FLOOR((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1e6 + 0.5) / 1e6
        |    AS theta,
        |  FLOOR((n * sxy - sx * sy) / sqrt(n * sxx - sx * sx)
        |        / sqrt(n * syy - sy * sy) * 1e6 + 0.5) / 1e6 AS rho,
        |  FLOOR((n * sxy - sx * sy) * (n * sxy - sx * sy)
        |        / ((n * sxx - sx * sx) * (n * syy - sy * sy)) * 1e4 + 0.5) / 1e4
        |    AS variance_reduction
        |FROM m""".stripMargin,

    "q_mann_whitney" ->
      """WITH base AS (SELECT o_orderstatus AS status,
        |    CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS yr,
        |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END
        |      AS grp_a,
        |    CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM orders),
        |rk AS (SELECT status, yr, grp_a,
        |    2 * RANK() OVER (PARTITION BY status, yr ORDER BY c)
        |      + COUNT(*) OVER (PARTITION BY status, yr, c) - 1 AS r2
        |  FROM base),
        |ties AS (SELECT status, yr, SUM(t * t * t - t) AS tsum FROM
        |    (SELECT status, yr, c, COUNT(*) AS t FROM base GROUP BY 1, 2, 3)
        |  GROUP BY 1, 2),
        |agg AS (SELECT status, yr, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(grp_a) AS BIGINT) AS na,
        |    CAST(SUM(CASE WHEN grp_a = 1 THEN r2 ELSE 0 END) AS BIGINT) AS sr2a
        |  FROM rk GROUP BY 1, 2)
        |SELECT a.status, a.yr, a.na, a.n - a.na AS nb,
        |  CAST(a.sr2a - a.na * (a.na + 1) AS BIGINT) AS u2,
        |  CAST(t.tsum AS BIGINT) AS tsum,
        |  FLOOR(CAST(a.sr2a - a.na * (a.na + 1) - a.na * (a.n - a.na) AS DOUBLE)
        |    / sqrt(CAST(a.na AS DOUBLE) * (a.n - a.na)
        |           * ((a.n + 1) - CAST(t.tsum AS DOUBLE) / a.n / (a.n - 1)) / 3.0)
        |    * 10000.0 + 0.5) / 10000.0 AS z_u
        |FROM agg a JOIN ties t USING (status, yr)
        |WHERE a.na >= 10 AND a.n - a.na >= 10
        |ORDER BY status, yr""".stripMargin,

    "q_graph_bfs" ->
      """WITH RECURSIVE
        |li0 AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM
        |         (SELECT *, COUNT(*) OVER (PARTITION BY l_orderkey) AS bsz FROM li0)
        |       WHERE bsz <= 120),
        |e0 AS MATERIALIZED (SELECT a.l_partkey AS pa, b.l_partkey AS pb
        |       FROM li a JOIN li b
        |         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |bi AS MATERIALIZED (SELECT pa AS u, pb AS v FROM e0
        |                    UNION ALL SELECT pb, pa FROM e0),
        |s AS MATERIALIZED (SELECT u FROM
        |       (SELECT u, COUNT(*) AS deg FROM bi GROUP BY 1)
        |     ORDER BY deg DESC, u ASC LIMIT 1),
        |walk(node, lvl) AS (
        |  SELECT u, 0 FROM s
        |  UNION
        |  SELECT bi.v, walk.lvl + 1
        |  FROM walk JOIN bi ON bi.u = walk.node
        |  WHERE walk.lvl < 10),
        |dist AS (SELECT node, MIN(lvl) AS lvl FROM walk GROUP BY 1)
        |SELECT CAST(lvl AS INTEGER) AS lvl,
        |       CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |       CAST(MIN(node) AS BIGINT) AS min_node
        |FROM dist GROUP BY 1 ORDER BY lvl""".stripMargin,

    "q_arrow_roundtrip" ->
      """SELECT o_orderstatus AS status, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |         AS sum_cents,
        |       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
        |       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
        |FROM orders WHERE o_orderkey % 50 = 0
        |GROUP BY 1 ORDER BY status""".stripMargin,

    // Same ground truth as q_arrow_roundtrip: the TCP path serves the
    // identical DoGet bytes over a real localhost socket, so any
    // framing/decode corruption diverges from this aggregate.
    "q_arrow_tcp_serve" ->
      """SELECT o_orderstatus AS status, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |         AS sum_cents,
        |       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
        |       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
        |FROM orders WHERE o_orderkey % 50 = 0
        |GROUP BY 1 ORDER BY status""".stripMargin,

    "q_arrow_tcp_put" ->
      """SELECT o_orderstatus AS status, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |         AS sum_cents,
        |       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
        |       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
        |FROM orders WHERE o_orderkey % 50 = 1
        |GROUP BY 1 ORDER BY status""".stripMargin,

    "q_clustering_coeff" ->
      """WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |li AS (SELECT l_orderkey, l_partkey FROM
        |         (SELECT *, COUNT(*) OVER (PARTITION BY l_orderkey) AS bsz FROM li0)
        |       WHERE bsz BETWEEN 2 AND 120),
        |e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
        |      FROM li a JOIN li b
        |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM
        |          (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
        |        GROUP BY 1),
        |tri AS (SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
        |        FROM e e1
        |        JOIN e e2 ON e1.pb = e2.pa
        |        JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
        |tpn AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM
        |          (SELECT a AS node FROM tri UNION ALL
        |           SELECT b FROM tri UNION ALL SELECT c FROM tri)
        |        GROUP BY 1)
        |SELECT deg.node AS part, deg.deg, COALESCE(tpn.n_tri, 0) AS n_tri,
        |       FLOOR(COALESCE(tpn.n_tri, 0) * 2.0
        |             / CAST(deg.deg * (deg.deg - 1) AS DOUBLE) * 1e6 + 0.5) / 1e6
        |         AS clustering_coeff
        |FROM deg LEFT JOIN tpn ON tpn.node = deg.node
        |WHERE deg.deg >= 2
        |ORDER BY part""".stripMargin,

    "q_modularity" ->
      """WITH li0 AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |li AS (SELECT l_orderkey, l_partkey FROM
        |         (SELECT *, COUNT(*) OVER (PARTITION BY l_orderkey) AS bsz FROM li0)
        |       WHERE bsz BETWEEN 2 AND 120),
        |e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
        |      FROM li a JOIN li b
        |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |eb AS (SELECT p1.p_brand AS ba, p2.p_brand AS bb
        |       FROM e JOIN part p1 ON p1.p_partkey = e.pa
        |              JOIN part p2 ON p2.p_partkey = e.pb),
        |mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM eb),
        |intra AS (SELECT ba AS brand, CAST(COUNT(*) AS BIGINT) AS e_c
        |          FROM eb WHERE ba = bb GROUP BY 1),
        |degs AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS d_c FROM
        |           (SELECT ba AS brand FROM eb UNION ALL SELECT bb FROM eb)
        |         GROUP BY 1)
        |SELECT degs.brand, COALESCE(intra.e_c, 0) AS e_c, degs.d_c,
        |       mm.m AS m_edges,
        |       FLOOR((4.0 * mm.m * COALESCE(intra.e_c, 0)
        |              - CAST(degs.d_c AS DOUBLE) * degs.d_c)
        |             / (4.0 * mm.m * mm.m) * 1e6 + 0.5) / 1e6 AS q_contrib
        |FROM degs LEFT JOIN intra ON intra.brand = degs.brand CROSS JOIN mm
        |ORDER BY degs.brand""".stripMargin,

    "q_cramers_v" ->
      """WITH obs AS (SELECT n_name, o_orderpriority,
        |                    CAST(COUNT(*) AS BIGINT) AS o
        |             FROM orders
        |             JOIN customer ON o_custkey = c_custkey
        |             JOIN nation ON c_nationkey = n_nationkey
        |             GROUP BY 1, 2),
        |rt AS (SELECT n_name, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY 1),
        |ct AS (SELECT o_orderpriority, CAST(SUM(o) AS BIGINT) AS c
        |       FROM obs GROUP BY 1),
        |g AS (SELECT CAST(SUM(o) AS BIGINT) AS t,
        |             CAST(COUNT(DISTINCT n_name) AS BIGINT) AS nr,
        |             CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS nc
        |      FROM obs),
        |cells AS (SELECT rt.r, ct.c, g.t, g.nr, g.nc, COALESCE(obs.o, 0) AS o0
        |          FROM rt CROSS JOIN ct CROSS JOIN g
        |          LEFT JOIN obs ON obs.n_name = rt.n_name
        |                       AND obs.o_orderpriority = ct.o_orderpriority),
        |u AS (SELECT t, nr, nc, CAST(COUNT(*) AS BIGINT) AS n_cells,
        |             CAST(SUM(CAST(FLOOR(
        |               (CAST(t AS DOUBLE) * o0 - CAST(r AS DOUBLE) * c)
        |               * (CAST(t AS DOUBLE) * o0 - CAST(r AS DOUBLE) * c)
        |               / (CAST(t AS DOUBLE) * r * c) * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
        |               AS chi2_u
        |      FROM cells GROUP BY 1, 2, 3)
        |SELECT t AS n_orders, n_cells, chi2_u / 1e6 AS chi2,
        |       FLOOR(SQRT(chi2_u / 1e6
        |             / CAST(t * (LEAST(nr, nc) - 1) AS DOUBLE)) * 1e6 + 0.5) / 1e6
        |         AS cramers_v
        |FROM u""".stripMargin,

    "q_cohen_kappa" ->
      """WITH t AS (SELECT doc_id, lang AS labeled_lang, text,
        |                  regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |           FROM documents),
        |s AS (SELECT doc_id, labeled_lang, text,
        |        CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','that','it','for'))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_en,
        |        CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein','mit','auf','zu'))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_de,
        |        CAST(len(list_filter(toks, x -> x IN ('le','la','les','et','est','un','une','dans','pour','que'))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_fr,
        |        CAST(len(list_filter(toks, x -> x IN ('el','la','los','y','es','un','una','en','por','que'))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_es
        |      FROM t),
        |u AS (SELECT doc_id, labeled_lang, text, sc['score'] AS score, sc['lang'] AS lng,
        |             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sc['score'] DESC, sc['lang'] DESC) AS rn
        |      FROM s, UNNEST([{'score': s_de, 'lang': 'de'}, {'score': s_en, 'lang': 'en'},
        |                      {'score': s_fr, 'lang': 'fr'}, {'score': s_es, 'lang': 'es'}]) AS z(sc)),
        |scored AS (
        |  SELECT labeled_lang,
        |         CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |              WHEN score > 0 THEN lng ELSE 'und' END AS predicted_lang
        |  FROM u WHERE rn = 1),
        |m AS (SELECT labeled_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM scored GROUP BY 1, 2),
        |rt AS (SELECT labeled_lang, CAST(SUM(n) AS BIGINT) AS r FROM m GROUP BY 1),
        |ct AS (SELECT predicted_lang, CAST(SUM(n) AS BIGINT) AS c FROM m GROUP BY 1),
        |pe AS (SELECT CAST(SUM(r * c) AS BIGINT) AS pe_num
        |       FROM rt JOIN ct ON labeled_lang = predicted_lang),
        |dg AS (SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
        |              CAST(SUM(CASE WHEN labeled_lang = predicted_lang THEN n
        |                            ELSE 0 END) AS BIGINT) AS n_agree
        |       FROM m)
        |SELECT n_docs, n_agree, pe_num,
        |       FLOOR(CAST(n_docs * n_agree - pe_num AS DOUBLE)
        |             / CAST(n_docs * n_docs - pe_num AS DOUBLE) * 1e6 + 0.5) / 1e6
        |         AS kappa
        |FROM dg CROSS JOIN pe""".stripMargin,

    "q_ohlc_bars" ->
      """WITH b AS (SELECT event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |                  CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS hour_ts,
        |                  CAST(ROUND(value * 100) AS BIGINT) AS cents
        |           FROM events),
        |r AS (SELECT *,
        |        ROW_NUMBER() OVER (PARTITION BY event_type, hour_ts
        |                           ORDER BY ts, event_id) AS rn_a,
        |        ROW_NUMBER() OVER (PARTITION BY event_type, hour_ts
        |                           ORDER BY ts DESC, event_id DESC) AS rn_d
        |      FROM b)
        |SELECT event_type, hour_ts, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(MAX(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_c,
        |       CAST(MAX(cents) AS BIGINT) AS high_c,
        |       CAST(MIN(cents) AS BIGINT) AS low_c,
        |       CAST(MAX(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_c,
        |       CAST(SUM(cents) AS BIGINT) AS total_c,
        |       CAST(FLOOR(CAST(SUM(cents) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)
        |         AS mean_c
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_bollinger" ->
      """WITH daily AS (SELECT event_type,
        |                      CAST(epoch(date_trunc('day', CAST(ts AS TIMESTAMP))) AS BIGINT) AS day,
        |                      CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
        |               FROM events GROUP BY 1, 2),
        |w AS (SELECT *,
        |        COUNT(*) OVER tw AS cnt,
        |        CAST(SUM(x) OVER tw AS BIGINT) AS sx,
        |        CAST(SUM(x * x) OVER tw AS BIGINT) AS sxx
        |      FROM daily
        |      WINDOW tw AS (PARTITION BY event_type ORDER BY day
        |                    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        |SELECT event_type, day, x AS close_c,
        |       FLOOR(sx / 20.0 * 1e4 + 0.5) / 1e4 AS mean_c,
        |       FLOOR(SQRT((20.0 * sxx - CAST(sx AS DOUBLE) * sx)
        |             / (20.0 * 19.0)) * 1e4 + 0.5) / 1e4 AS sigma_c,
        |       ((20.0 * x - sx) * (20.0 * x - sx) * 19.0 >
        |          1600.0 * (20.0 * sxx - CAST(sx AS DOUBLE) * sx))
        |         AND x * 20 > sx AS breach_hi,
        |       ((20.0 * x - sx) * (20.0 * x - sx) * 19.0 >
        |          1600.0 * (20.0 * sxx - CAST(sx AS DOUBLE) * sx))
        |         AND x * 20 < sx AS breach_lo
        |FROM w WHERE cnt = 20 ORDER BY 1, 2""".stripMargin,

    "q_mrr" ->
      """WITH li0 AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |b AS MATERIALIZED (SELECT l_orderkey, list_sort(list(l_partkey)) AS ps
        |     FROM li0 GROUP BY 1 HAVING COUNT(*) BETWEEN 2 AND 120),
        |tr AS MATERIALIZED (SELECT * FROM b WHERE l_orderkey % 5 <> 0),
        |te AS MATERIALIZED (SELECT * FROM b WHERE l_orderkey % 5 = 0),
        |trli AS MATERIALIZED (SELECT l_orderkey, UNNEST(ps) AS pk FROM tr),
        |p AS MATERIALIZED (SELECT a.pk AS pa, c.pk AS pb, COUNT(*) AS n_ab
        |     FROM trli a JOIN trli c
        |       ON a.l_orderkey = c.l_orderkey AND a.pk < c.pk
        |     GROUP BY 1, 2),
        |s AS MATERIALIZED (SELECT pk, COUNT(*) AS n FROM trli GROUP BY 1),
        |sims AS MATERIALIZED (SELECT p.pa, p.pb,
        |     CAST(FLOOR(p.n_ab / sqrt(CAST(sa.n * sb.n AS DOUBLE)) * 1e6 + 0.5)
        |       AS BIGINT) AS sim_u
        |     FROM p JOIN s sa ON sa.pk = p.pa JOIN s sb ON sb.pk = p.pb),
        |bidir AS MATERIALIZED (SELECT pa, pb, sim_u FROM sims
        |     UNION ALL SELECT pb, pa, sim_u FROM sims),
        |pq AS MATERIALIZED (SELECT okey, target, qs, UNNEST(qs) AS q FROM
        |     (SELECT l_orderkey AS okey, ps[len(ps)] AS target,
        |             ps[1:len(ps)-1] AS qs FROM te)),
        |scored AS MATERIALIZED (SELECT pq.okey, pq.target, bd.pb,
        |     SUM(bd.sim_u) AS score_u
        |     FROM pq JOIN bidir bd ON bd.pa = pq.q
        |     WHERE bd.pb <> pq.q AND NOT list_contains(pq.qs, bd.pb)
        |     GROUP BY 1, 2, 3),
        |rk AS (SELECT okey, target, pb,
        |         ROW_NUMBER() OVER (PARTITION BY okey
        |                            ORDER BY score_u DESC, pb ASC) AS rnk
        |       FROM scored),
        |pb2 AS (SELECT okey,
        |          MAX(CASE WHEN rnk <= 10 AND pb = target
        |                   THEN 2520 // rnk ELSE 0 END) AS rr_u
        |        FROM rk GROUP BY 1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_scored,
        |       CAST(SUM(CASE WHEN rr_u > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |       CAST(SUM(rr_u) AS BIGINT) AS rr_sum_u,
        |       FLOOR(CAST(SUM(rr_u) AS DOUBLE)
        |             / CAST(COUNT(*) * 2520 AS DOUBLE) * 1e6 + 0.5) / 1e6
        |         AS mrr_at_10
        |FROM pb2""".stripMargin,

    "q_stream_enrich" ->
      """SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT)
        |         AS window_start,
        |       COALESCE(c_mktsegment, 'UNKNOWN') AS segment,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events LEFT JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_changepoint" ->
      """WITH daily AS (SELECT event_type,
        |                      CAST(epoch(date_trunc('day', CAST(ts AS TIMESTAMP))) AS BIGINT) AS day,
        |                      CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
        |               FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day,
        |        CAST(ROW_NUMBER() OVER pw AS BIGINT) AS idx,
        |        CAST(SUM(x) OVER pw AS BIGINT) AS cs,
        |        CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        |        CAST(SUM(x) OVER (PARTITION BY event_type) AS BIGINT) AS st
        |      FROM daily
        |      WINDOW pw AS (PARTITION BY event_type ORDER BY day
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |gained AS (SELECT *,
        |        (CAST(cs AS DOUBLE) * cs) / CAST(idx AS DOUBLE)
        |          + (CAST(st - cs AS DOUBLE) * (st - cs)) / CAST(n - idx AS DOUBLE)
        |          - (CAST(st AS DOUBLE) * st) / CAST(n AS DOUBLE) AS gain
        |      FROM w WHERE idx < n),
        |best AS (SELECT *,
        |        ROW_NUMBER() OVER (PARTITION BY event_type
        |                           ORDER BY gain DESC, idx ASC) AS rk
        |      FROM gained)
        |SELECT event_type, day AS split_day, idx AS n_left,
        |       n - idx AS n_right,
        |       CAST(FLOOR(cs / CAST(idx AS DOUBLE) + 0.5) AS BIGINT) AS mean_left_c,
        |       CAST(FLOOR((st - cs) / CAST(n - idx AS DOUBLE) + 0.5) AS BIGINT)
        |         AS mean_right_c,
        |       CAST(FLOOR(gain / 100.0) AS BIGINT) AS gain_floor
        |FROM best WHERE rk = 1 ORDER BY event_type""".stripMargin,

    "q_forecast_baseline" ->
      """WITH daily AS (SELECT event_type,
        |                      CAST(epoch(date_trunc('day', CAST(ts AS TIMESTAMP))) AS BIGINT) AS day,
        |                      CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS x
        |               FROM events GROUP BY 1, 2),
        |lagged AS (SELECT event_type, x,
        |             LAG(x, 7) OVER (PARTITION BY event_type ORDER BY day) AS f
        |           FROM daily),
        |e AS (SELECT event_type, ABS(x - f) AS abs_err,
        |             CAST(FLOOR(ABS(x - f) / CAST(x AS DOUBLE) * 1e6 + 0.5)
        |               AS BIGINT) AS ape_u
        |      FROM lagged WHERE f IS NOT NULL AND x > 0)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |       CAST(SUM(abs_err) AS BIGINT) AS sum_abs_err_c,
        |       CAST((CAST(SUM(abs_err) AS BIGINT) + COUNT(*) // 2) // COUNT(*)
        |         AS BIGINT) AS mae_c,
        |       CAST((CAST(SUM(ape_u) AS BIGINT) + COUNT(*) // 2) // COUNT(*)
        |         AS BIGINT) AS mape_u
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_brier" ->
      """WITH t AS (SELECT doc_id, lang AS labeled_lang, text,
        |                  regexp_split_to_array(trim(lower(text)), '\s+') AS toks
        |           FROM documents),
        |s AS (SELECT doc_id, labeled_lang, text,
        |        CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','that','it','for'))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_en,
        |        CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht','ein','mit','auf','zu'))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_de,
        |        CAST(len(list_filter(toks, x -> x IN ('le','la','les','et','est','un','une','dans','pour','que'))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_fr,
        |        CAST(len(list_filter(toks, x -> x IN ('el','la','los','y','es','un','una','en','por','que'))) AS DOUBLE) / GREATEST(len(toks), 1) AS s_es
        |      FROM t),
        |u AS (SELECT doc_id, labeled_lang, text, sc['score'] AS score, sc['lang'] AS lng,
        |             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sc['score'] DESC, sc['lang'] DESC) AS rn
        |      FROM s, UNNEST([{'score': s_de, 'lang': 'de'}, {'score': s_en, 'lang': 'en'},
        |                      {'score': s_fr, 'lang': 'fr'}, {'score': s_es, 'lang': 'es'}]) AS z(sc)),
        |scored AS (
        |  SELECT labeled_lang,
        |         CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |              WHEN score > 0 THEN lng ELSE 'und' END AS predicted_lang,
        |         ROUND(score, 4) AS confidence
        |  FROM u WHERE rn = 1),
        |c AS (SELECT labeled_lang,
        |        CAST(FLOOR((confidence -
        |          CASE WHEN predicted_lang = labeled_lang THEN 1.0 ELSE 0.0 END)
        |          * (confidence -
        |          CASE WHEN predicted_lang = labeled_lang THEN 1.0 ELSE 0.0 END)
        |          * 1e6 + 0.5) AS BIGINT) AS c_u
        |      FROM scored)
        |SELECT labeled_lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST((CAST(SUM(c_u) AS BIGINT) + COUNT(*) // 2) // COUNT(*)
        |         AS BIGINT) AS brier_u
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_sql_native" ->
      """SELECT vec_id, label,
        |       ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
        |         (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings
        |          WHERE vec_id = 0)), 6) AS cos_sim
        |FROM embeddings
        |WHERE vec_id % 20 = 0 AND vec_id <> 0
        |ORDER BY vec_id""".stripMargin,

    "q_ndcg" ->
      """WITH li0 AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |b AS MATERIALIZED (SELECT l_orderkey, list_sort(list(l_partkey)) AS ps
        |     FROM li0 GROUP BY 1 HAVING COUNT(*) BETWEEN 2 AND 120),
        |tr AS MATERIALIZED (SELECT * FROM b WHERE l_orderkey % 5 <> 0),
        |te AS MATERIALIZED (SELECT * FROM b WHERE l_orderkey % 5 = 0),
        |trli AS MATERIALIZED (SELECT l_orderkey, UNNEST(ps) AS pk FROM tr),
        |p AS MATERIALIZED (SELECT a.pk AS pa, c.pk AS pb, COUNT(*) AS n_ab
        |     FROM trli a JOIN trli c
        |       ON a.l_orderkey = c.l_orderkey AND a.pk < c.pk
        |     GROUP BY 1, 2),
        |s AS MATERIALIZED (SELECT pk, COUNT(*) AS n FROM trli GROUP BY 1),
        |sims AS MATERIALIZED (SELECT p.pa, p.pb,
        |     CAST(FLOOR(p.n_ab / sqrt(CAST(sa.n * sb.n AS DOUBLE)) * 1e6 + 0.5)
        |       AS BIGINT) AS sim_u
        |     FROM p JOIN s sa ON sa.pk = p.pa JOIN s sb ON sb.pk = p.pb),
        |bidir AS MATERIALIZED (SELECT pa, pb, sim_u FROM sims
        |     UNION ALL SELECT pb, pa, sim_u FROM sims),
        |pq AS MATERIALIZED (SELECT okey, target, qs, UNNEST(qs) AS q FROM
        |     (SELECT l_orderkey AS okey, ps[len(ps)] AS target,
        |             ps[1:len(ps)-1] AS qs FROM te)),
        |scored AS MATERIALIZED (SELECT pq.okey, pq.target, bd.pb,
        |     SUM(bd.sim_u) AS score_u
        |     FROM pq JOIN bidir bd ON bd.pa = pq.q
        |     WHERE bd.pb <> pq.q AND NOT list_contains(pq.qs, bd.pb)
        |     GROUP BY 1, 2, 3),
        |rk AS (SELECT okey, target, pb,
        |         ROW_NUMBER() OVER (PARTITION BY okey
        |                            ORDER BY score_u DESC, pb ASC) AS rnk
        |       FROM scored),
        |pb2 AS (SELECT okey,
        |          MAX(CASE WHEN pb = target THEN
        |            CASE rnk WHEN 1 THEN 1000000 WHEN 2 THEN 630930
        |                     WHEN 3 THEN 500000 WHEN 4 THEN 430677
        |                     WHEN 5 THEN 386853 WHEN 6 THEN 356207
        |                     WHEN 7 THEN 333333 WHEN 8 THEN 315465
        |                     WHEN 9 THEN 301030 WHEN 10 THEN 289065
        |                     ELSE 0 END
        |          ELSE 0 END) AS gain_u
        |        FROM rk GROUP BY 1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_scored,
        |       CAST(SUM(CASE WHEN gain_u > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |       CAST(SUM(gain_u) AS BIGINT) AS gain_sum_u,
        |       FLOOR(CAST(SUM(gain_u) AS DOUBLE)
        |             / CAST(COUNT(*) * 1000000 AS DOUBLE) * 1e6 + 0.5) / 1e6
        |         AS ndcg_at_10
        |FROM pb2""".stripMargin,

    "q_temperature_sampling" ->
      """WITH bl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        |            FROM documents GROUP BY 1),
        |piv AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total,
        |          CAST(SUM(CASE WHEN lang = 'de' THEN n_docs ELSE 0 END) AS BIGINT) AS n_de,
        |          CAST(SUM(CASE WHEN lang = 'en' THEN n_docs ELSE 0 END) AS BIGINT) AS n_en,
        |          CAST(SUM(CASE WHEN lang = 'es' THEN n_docs ELSE 0 END) AS BIGINT) AS n_es,
        |          CAST(SUM(CASE WHEN lang = 'fr' THEN n_docs ELSE 0 END) AS BIGINT) AS n_fr,
        |          CAST(SUM(CASE WHEN lang = 'zh' THEN n_docs ELSE 0 END) AS BIGINT) AS n_zh
        |        FROM bl),
        |dn AS (SELECT total,
        |         SQRT(n_de / CAST(total AS DOUBLE)) + SQRT(n_en / CAST(total AS DOUBLE))
        |           + SQRT(n_es / CAST(total AS DOUBLE)) + SQRT(n_fr / CAST(total AS DOUBLE))
        |           + SQRT(n_zh / CAST(total AS DOUBLE)) AS denom
        |       FROM piv)
        |SELECT lang, n_docs,
        |       FLOOR(n_docs / CAST(total AS DOUBLE) * 1e6 + 0.5) / 1e6 AS p_natural,
        |       FLOOR(SQRT(n_docs / CAST(total AS DOUBLE)) / denom * 1e6 + 0.5) / 1e6
        |         AS p_sampled,
        |       FLOOR(SQRT(n_docs / CAST(total AS DOUBLE)) / denom
        |             / (n_docs / CAST(total AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS boost
        |FROM bl CROSS JOIN dn ORDER BY lang""".stripMargin,

    "q_dbscan_core" ->
      """WITH u AS MATERIALIZED (
        |  SELECT user_id,
        |         CAST(user_id % 40 AS DOUBLE) * 0.1 + 0.05 AS lat_deg,
        |         CAST(user_id // 40 AS DOUBLE) * 0.1 + 0.05 AS lon_deg
        |  FROM (SELECT DISTINCT user_id FROM events)),
        |r AS MATERIALIZED (SELECT user_id AS ub, lat_deg AS lat_b, lon_deg AS lon_b,
        |       CAST(FLOOR(lat_deg) AS BIGINT) AS cla,
        |       ((CAST(FLOOR(lon_deg + 180) AS BIGINT) % 360) + 360) % 360 AS clo
        |     FROM u),
        |l AS MATERIALIZED (SELECT user_id AS ua, lat_deg AS lat_a, lon_deg AS lon_a,
        |       CAST(FLOOR(lat_deg) AS BIGINT) + dx.dx AS cla,
        |       (((CAST(FLOOR(lon_deg + 180) AS BIGINT) % 360) + dy.dy) % 360 + 360) % 360 AS clo
        |     FROM u,
        |          (SELECT UNNEST([-1, 0, 1]) AS dx) dx,
        |          (SELECT UNNEST([-1, 0, 1]) AS dy) dy),
        |cand AS (SELECT l.ua, r.ub, l.lat_a, l.lon_a, r.lat_b, r.lon_b
        |         FROM l JOIN r USING (cla, clo) WHERE l.ua <> r.ub),
        |dd AS (SELECT ua, ub,
        |         FLOOR(2 * 6371 * asin(sqrt(
        |           POW(sin((lat_b - lat_a) * pi() / 180 / 2), 2)
        |           + cos(lat_a * pi() / 180) * cos(lat_b * pi() / 180)
        |             * POW(sin((lon_b - lon_a) * pi() / 180 / 2), 2)))
        |           * 10000.0 + 0.5) / 10000.0 AS dist_r
        |       FROM cand),
        |nb AS (SELECT ua AS user_id, CAST(COUNT(*) AS BIGINT) AS n_neighbors,
        |              MIN(dist_r) AS nearest_km
        |       FROM dd WHERE dist_r <= 15.0 GROUP BY 1)
        |SELECT u.user_id, COALESCE(nb.n_neighbors, 0) AS n_neighbors,
        |       COALESCE(nb.nearest_km, -1.0) AS nearest_km,
        |       COALESCE(nb.n_neighbors, 0) >= 3 AS is_core
        |FROM u LEFT JOIN nb ON nb.user_id = u.user_id
        |ORDER BY u.user_id""".stripMargin,

    "q_isotonic" ->
      """WITH ev AS (
        |  SELECT LEAST(CAST(FLOOR(value / 50) AS BIGINT), 19) AS bucket,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |bins AS (
        |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS w, CAST(SUM(y) AS BIGINT) AS s
        |  FROM ev GROUP BY 1),
        |base AS (
        |  SELECT 0 AS step,
        |         list({'lo': bucket, 'w': w, 's': s} ORDER BY bucket) AS st
        |  FROM bins),
        |it AS (
        |  WITH RECURSIVE r AS (
        |    SELECT step, st FROM base
        |    UNION ALL
        |    SELECT step + 1,
        |      CASE WHEN v IS NULL THEN st
        |           ELSE st[1:v-1] ||
        |                [{'lo': st[v].lo, 'w': st[v].w + st[v+1].w,
        |                  's': st[v].s + st[v+1].s}] ||
        |                st[v+2:]
        |      END
        |    FROM (
        |      SELECT step, st,
        |             list_filter(range(1, len(st)),
        |               i -> st[i].s * st[i+1].w > st[i+1].s * st[i].w)[1] AS v
        |      FROM r)
        |    WHERE step < 19)
        |  SELECT st FROM r WHERE step = 19),
        |pools AS (SELECT UNNEST(st) AS p FROM it),
        |fitted AS (SELECT p.lo AS pool_lo, p.w AS pool_w, p.s AS pool_s FROM pools)
        |SELECT b.bucket, b.w AS n, b.s AS n_pos,
        |       CAST(FLOOR(b.s / CAST(b.w AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
        |         AS raw_rate_u,
        |       CAST(FLOOR(f.pool_s / CAST(f.pool_w AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
        |         AS iso_rate_u
        |FROM bins b
        |JOIN fitted f
        |  ON f.pool_lo = (SELECT MAX(pool_lo) FROM fitted WHERE pool_lo <= b.bucket)
        |ORDER BY b.bucket""".stripMargin,

    "q_store_agg_pushdown" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(COUNT(o_orderstatus) AS BIGINT) AS n_status,
        |       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
        |       CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
        |       CAST(MIN(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |         AS min_cents,
        |       CAST(MAX(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |         AS max_cents
        |FROM orders WHERE o_orderkey % 50 = 0""".stripMargin,

    "q_label_propagation" ->
      """WITH li0 AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM
        |         (SELECT *, COUNT(*) OVER (PARTITION BY l_orderkey) AS bsz FROM li0)
        |       WHERE bsz BETWEEN 2 AND 120),
        |e AS MATERIALIZED (SELECT a.l_partkey AS pa, b.l_partkey AS pb
        |      FROM li a JOIN li b
        |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |bi AS MATERIALIZED (SELECT pa AS u, pb AS v FROM e
        |      UNION ALL SELECT pb, pa FROM e),
        |l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS lbl FROM bi),
        |l1 AS MATERIALIZED (SELECT node, lbl FROM (
        |      SELECT bi.u AS node, l.lbl,
        |             ROW_NUMBER() OVER (PARTITION BY bi.u
        |               ORDER BY COUNT(*) DESC, l.lbl ASC) AS rk
        |      FROM bi JOIN l0 l ON l.node = bi.v GROUP BY bi.u, l.lbl)
        |      WHERE rk = 1),
        |l2 AS MATERIALIZED (SELECT node, lbl FROM (
        |      SELECT bi.u AS node, l.lbl,
        |             ROW_NUMBER() OVER (PARTITION BY bi.u
        |               ORDER BY COUNT(*) DESC, l.lbl ASC) AS rk
        |      FROM bi JOIN l1 l ON l.node = bi.v GROUP BY bi.u, l.lbl)
        |      WHERE rk = 1),
        |l3 AS MATERIALIZED (SELECT node, lbl FROM (
        |      SELECT bi.u AS node, l.lbl,
        |             ROW_NUMBER() OVER (PARTITION BY bi.u
        |               ORDER BY COUNT(*) DESC, l.lbl ASC) AS rk
        |      FROM bi JOIN l2 l ON l.node = bi.v GROUP BY bi.u, l.lbl)
        |      WHERE rk = 1)
        |SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |       CAST(MIN(node) AS BIGINT) AS min_node,
        |       CAST(MAX(node) AS BIGINT) AS max_node
        |FROM l3 GROUP BY 1 HAVING COUNT(*) >= 2
        |ORDER BY community""".stripMargin,

    "q_kendall_tau" ->
      """WITH c AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |         CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM events),
        |k AS (
        |  SELECT * FROM (
        |    SELECT user_id, c,
        |           row_number() OVER (PARTITION BY user_id
        |             ORDER BY ts, event_id) AS rn
        |    FROM c) x WHERE rn <= 64),
        |nn AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM k GROUP BY 1
        |       HAVING COUNT(*) >= 10),
        |s AS (
        |  SELECT a.user_id,
        |         CAST(SUM(CASE WHEN b.c > a.c THEN 1
        |                       WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        |  FROM k a JOIN k b ON a.user_id = b.user_id AND a.rn < b.rn
        |  GROUP BY 1),
        |t AS (
        |  SELECT user_id, CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS n2
        |  FROM (SELECT user_id, c, COUNT(*) AS t FROM k GROUP BY 1, 2) x
        |  GROUP BY 1)
        |SELECT nn.user_id, nn.n, s.s_stat,
        |       CAST(nn.n * (nn.n - 1) // 2 AS BIGINT) AS n0, t.n2,
        |       FLOOR(s.s_stat / SQRT(CAST((nn.n * (nn.n - 1) // 2)
        |             * ((nn.n * (nn.n - 1) // 2) - t.n2) AS DOUBLE))
        |             * 1e6 + 0.5) / 1e6 AS tau_b
        |FROM nn JOIN s ON s.user_id = nn.user_id
        |        JOIN t ON t.user_id = nn.user_id
        |WHERE nn.n * (nn.n - 1) // 2 > t.n2
        |ORDER BY nn.user_id""".stripMargin,

    "q_jackknife" ->
      """WITH daily AS (
        |  SELECT CAST(epoch(date_trunc('day', CAST(ts AS TIMESTAMP))) AS BIGINT) AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           AS BIGINT) AS p
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(p) AS BIGINT) AS pp,
        |               CAST(COUNT(*) AS BIGINT) AS dd
        |        FROM daily),
        |x AS (SELECT CAST(FLOOR((pp - p) / CAST(nn - n AS DOUBLE) * 1e6 + 0.5)
        |        AS BIGINT) AS x
        |      FROM daily CROSS JOIN tot WHERE nn > n),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS d_days,
        |             CAST(SUM(x) AS BIGINT) AS sx,
        |             CAST(SUM(x * x) AS BIGINT) AS sxx
        |      FROM x)
        |SELECT m.d_days, tot.nn AS n_events, tot.pp AS n_purchases,
        |       CAST(FLOOR(tot.pp / CAST(tot.nn AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
        |         AS rate_u,
        |       CAST(FLOOR(SQRT(CAST(m.d_days - 1 AS DOUBLE)
        |             * (CAST(m.d_days AS DOUBLE) * m.sxx
        |                - CAST(m.sx AS DOUBLE) * m.sx))
        |             / m.d_days + 0.5) AS BIGINT) AS se_jack_u
        |FROM m CROSS JOIN tot""".stripMargin,

    "q_store_runtime_prune" -> FlightServe.storeRuntimePruneOracleSql,

    "q_store_ts_prune" -> FlightServe.storeTsPruneOracleSql,

    "q_store_str_prune" -> FlightServe.storeStrPruneOracleSql,

    "q_store_dbl_prune" -> FlightServe.storeDblPruneOracleSql,

    "q_store_topn_pushdown" ->
      """SELECT o_orderkey, o_orderstatus,
        |       CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        |FROM orders WHERE o_orderkey % 50 = 0
        |ORDER BY cents DESC, o_orderkey LIMIT 20""".stripMargin,

    "q_levene" ->
      """WITH c AS (SELECT event_type, event_id,
        |                  CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS c
        |           FROM events),
        |r AS (SELECT event_type, c,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |          ORDER BY c, event_id) AS BIGINT) AS rn,
        |        CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |      FROM c),
        |med AS (SELECT event_type,
        |          MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT)
        |                   THEN c END) AS med
        |        FROM r GROUP BY 1),
        |z AS (SELECT c.event_type, ABS(c.c - med.med) AS z
        |      FROM c JOIN med ON med.event_type = c.event_type),
        |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ni,
        |             CAST(SUM(z) AS BIGINT) AS si,
        |             CAST(SUM(z * z) AS BIGINT) AS qi
        |      FROM z GROUP BY 1),
        |tot AS (SELECT CAST(SUM(ni) AS BIGINT) AS nn,
        |               CAST(SUM(si) AS BIGINT) AS ss,
        |               CAST(COUNT(*) AS BIGINT) AS k
        |        FROM g),
        |cells AS (SELECT nn, k,
        |            CAST(FLOOR(ni
        |              * (si / CAST(ni AS DOUBLE) - ss / CAST(nn AS DOUBLE))
        |              * (si / CAST(ni AS DOUBLE) - ss / CAST(nn AS DOUBLE))
        |              * 1e2 + 0.5) AS BIGINT) AS b_c,
        |            CAST(FLOOR((qi - CAST(si AS DOUBLE) * si / CAST(ni AS DOUBLE))
        |              * 1e2 + 0.5) AS BIGINT) AS w_c
        |          FROM g CROSS JOIN tot),
        |u AS (SELECT nn, k, CAST(SUM(b_c) AS BIGINT) AS sb_c,
        |             CAST(SUM(w_c) AS BIGINT) AS sw_c
        |      FROM cells GROUP BY 1, 2)
        |SELECT k AS n_groups, nn AS n_events, sb_c, sw_c,
        |       FLOOR(CAST(nn - k AS DOUBLE) / (k - 1)
        |             * sb_c / sw_c * 1e4 + 0.5) / 1e4 AS bf_w
        |FROM u""".stripMargin,

    "q_fano" ->
      """WITH daily AS (SELECT event_type,
        |                      CAST(epoch(date_trunc('day', CAST(ts AS TIMESTAMP))) AS BIGINT) AS day,
        |                      CAST(COUNT(*) AS BIGINT) AS x
        |               FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS d_days,
        |             CAST(SUM(x) AS BIGINT) AS sx,
        |             CAST(SUM(x * x) AS BIGINT) AS sxx
        |      FROM daily GROUP BY 1)
        |SELECT event_type, d_days, sx AS n_events,
        |       FLOOR((CAST(d_days AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |             / CAST(d_days * (d_days - 1) AS DOUBLE)
        |             / (sx / CAST(d_days AS DOUBLE)) * 1e4 + 0.5) / 1e4 AS fano,
        |       FLOOR((CAST(d_days AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |             / CAST(d_days * (d_days - 1) AS DOUBLE)
        |             / (sx / CAST(d_days AS DOUBLE))
        |             * CAST(d_days - 1 AS DOUBLE) * 1e4 + 0.5) / 1e4
        |         AS dispersion_stat
        |FROM m WHERE d_days > 1 AND sx > 0
        |ORDER BY event_type""".stripMargin,

    "q_lift_gains" ->
      """WITH u AS (SELECT user_id,
        |             CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |               AS spend_c,
        |             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |               AS BIGINT) AS purchases
        |           FROM events GROUP BY 1),
        |grid AS (SELECT spend_c // 100 AS g, COUNT(*) AS nu, SUM(purchases) AS np
        |         FROM u GROUP BY 1),
        |r AS (SELECT g, nu, np,
        |        (SUM(nu) OVER (ORDER BY g DESC) * 10 + SUM(nu) OVER () - 1)
        |          // SUM(nu) OVER () AS decile
        |      FROM grid),
        |dec AS (SELECT CAST(decile AS BIGINT) AS decile,
        |               CAST(SUM(nu) AS BIGINT) AS n_users,
        |               CAST(SUM(np) AS BIGINT) AS n_purch
        |        FROM r GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_users) AS BIGINT) AS tu,
        |               CAST(SUM(n_purch) AS BIGINT) AS tp FROM dec),
        |cum AS (SELECT dec.*, tot.tu, tot.tp,
        |          CAST(SUM(n_purch) OVER (ORDER BY decile) AS BIGINT) AS cum_purch,
        |          CAST(SUM(n_users) OVER (ORDER BY decile) AS BIGINT) AS cum_users
        |        FROM dec CROSS JOIN tot)
        |SELECT decile, n_users, n_purch,
        |       CAST(FLOOR(cum_purch / CAST(tp AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
        |         AS cum_gain_u,
        |       CAST(FLOOR(cum_purch / CAST(tp AS DOUBLE)
        |             / (cum_users / CAST(tu AS DOUBLE)) * 1e4 + 0.5) AS BIGINT)
        |         AS lift_x10000
        |FROM cum ORDER BY decile""".stripMargin,

    "q_punchcard" ->
      """SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 4) % 7 AS dow,
        |       (epoch_us(CAST(ts AS TIMESTAMP)) % 86400000000) // 3600000000 AS hour,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |         AS cents
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_simpson_diversity" ->
      """WITH bs AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
        |            FROM documents GROUP BY 1, 2),
        |g AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sources,
        |             CAST(SUM(n) AS BIGINT) AS n_docs,
        |             CAST(SUM(n * (n - 1)) AS BIGINT) AS pairs_same
        |      FROM bs GROUP BY 1)
        |SELECT lang, n_sources, n_docs,
        |       FLOOR((1.0 - pairs_same
        |             / CAST(n_docs * (n_docs - 1) AS DOUBLE)) * 1e6 + 0.5) / 1e6
        |         AS simpson_d,
        |       CASE WHEN pairs_same > 0 THEN
        |         FLOOR(CAST(n_docs * (n_docs - 1) AS DOUBLE)
        |               / pairs_same * 1e4 + 0.5) / 1e4
        |       END AS effective_sources
        |FROM g WHERE n_docs > 1 ORDER BY lang""".stripMargin,

    "q_abc_class" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS u
        |  FROM lineitem GROUP BY 1),
        |grid AS (SELECT u // 10000 AS g, COUNT(*) AS np, SUM(u) AS gu
        |         FROM rev GROUP BY 1),
        |c AS (SELECT g, np, gu,
        |        CAST(SUM(gu) OVER (ORDER BY g DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |        CAST(SUM(gu) OVER () AS BIGINT) AS tot
        |      FROM grid),
        |k AS (SELECT CASE WHEN cum * 5 <= tot * 4 THEN 'A'
        |                  WHEN cum * 20 <= tot * 19 THEN 'B'
        |                  ELSE 'C' END AS cls, np, gu, tot
        |      FROM c)
        |SELECT cls, CAST(SUM(np) AS BIGINT) AS n_parts,
        |       CAST((CAST(SUM(gu) AS BIGINT) + 5000) // 10000 AS DOUBLE) / 100.0
        |         AS revenue,
        |       CAST(FLOOR(CAST(SUM(gu) AS BIGINT) / CAST(MAX(tot) AS DOUBLE)
        |             * 1e6 + 0.5) AS BIGINT) AS share_u
        |FROM k GROUP BY 1 ORDER BY cls""".stripMargin,

    "q_audience_overlap" ->
      """WITH au AS (SELECT DISTINCT event_type, user_id FROM events),
        |sz AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM au GROUP BY 1),
        |iv AS (SELECT a.event_type AS ta, b.event_type AS tb,
        |              CAST(COUNT(*) AS BIGINT) AS n_common
        |       FROM au a JOIN au b
        |         ON a.user_id = b.user_id AND a.event_type < b.event_type
        |       GROUP BY 1, 2)
        |SELECT iv.ta, iv.tb, sa.n AS n_a, sb.n AS n_b, iv.n_common,
        |       FLOOR(iv.n_common
        |             / CAST(sa.n + sb.n - iv.n_common AS DOUBLE) * 1e6 + 0.5)
        |         / 1e6 AS jaccard
        |FROM iv JOIN sz sa ON sa.event_type = iv.ta
        |        JOIN sz sb ON sb.event_type = iv.tb
        |ORDER BY iv.ta, iv.tb""".stripMargin,

    "q_gap_histogram" ->
      """WITH e AS (SELECT user_id, event_type,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |                  CAST(ts AS TIMESTAMP) AS ts, event_id
        |           FROM events),
        |g AS (SELECT event_type,
        |        (us - LAG(us, 1) OVER (PARTITION BY user_id, event_type
        |                               ORDER BY ts, event_id)) // 1000000 AS gap_s
        |      FROM e)
        |SELECT event_type,
        |       CAST(length(format('{:b}', gap_s)) - 1 AS BIGINT) AS bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       MIN(gap_s) AS min_s, MAX(gap_s) AS max_s
        |FROM g WHERE gap_s IS NOT NULL AND gap_s >= 1
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}

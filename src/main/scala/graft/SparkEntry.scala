package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"       -> (Analytics.q1Agg _),
    "q3_join"      -> (Analytics.q3Join _),
    "q14_promo"    -> (Analytics.q14Promo _),
    "q2_mincost"   -> (Analytics.q2MinCost _),
    "q5_join"      -> (Analytics.q5Join _),
    "q_topk_window" -> (Analytics.qTopkWindow _),
    "q_rollup"     -> (Analytics.qRollup _),
    "q_grouping_sets" -> (Analytics.qGroupingSets _),
    "q_approx_distinct" -> (Analytics.qDistinct _),
    "q_hll_merge"  -> (Analytics.qHllMerge _),
    "q_quantile"   -> (Analytics.qQuantile _),
    "q_moving_window" -> (Analytics.qMovingWindow _),
    "q_cube"       -> (Analytics.qCube _),
    "q_semi_join"  -> (Analytics.qSemiJoin _),
    "q_anti_join"  -> (Analytics.qAntiJoin _),
    "q_asof_join"  -> (AsofJoin.clicksLastPurchase _),
    "q_range_join" -> (RangeJoin.errorClicksWithin5Min _),
    "q_salted_join" -> ((s: SparkSession, d: String) => SkewJoin.saltedJoin(s, d)),
    "q_setops"     -> (Behavior.qSetops _),
    "q_ntile"      -> (Behavior.qNtile _),
    "q_funnel"     -> (Behavior.qFunnel _),
    "q_retention"  -> (Behavior.qRetention _),
    "q_histogram"  -> (Behavior.qHistogram _),
    "q_transitions" -> (Behavior.qTransitions _),
    "q_session_paths" -> (Behavior.qSessionPaths _),
    "q_attribution"   -> (Behavior.qAttribution _),
    "stats_mad"       -> (Profile.statsMad _),
    "q_anomaly"    -> (Windows.anomaly _),
    "q_incidents"  -> (Windows.incidents _),
    "q_changepoint" -> (Windows.changepoint _),
    "q_rate_spikes" -> ((s: SparkSession, d: String) => Windows.rateSpikes(s, d)),
    "stats_corr"   -> (Profile.statsCorr _),
    "stats_ttest"  -> (Profile.statsTtest _),
    "stats_drift"  -> (Profile.statsDrift _),
    "stats_ks"     -> (Profile.statsKs _),
    "stats_ks_binned" -> ((s: SparkSession, d: String) => Profile.statsKsBinned(s, d)),
    "stats_auc"    -> (Profile.statsAuc _),
    "stats_calibration" -> (Profile.statsCalibration _),
    "stats_confusion" -> (Profile.statsConfusion _),
    "stats_pr_curve" -> (Profile.statsPrCurve _),
    // stats_chi2 / stats_mi are the suite's two EAGER entries: the
    // bounded lang×source grid is collected at frame-construction time
    // (documented in their scaladoc — r18 ADVICE).
    "stats_chi2"   -> (Profile.statsChi2 _),
    "stats_gini"   -> (Profile.statsGini _),
    "stats_mi"     -> (Profile.statsMi _),
    "text_ttr"     -> (TextAnalysis.ttr _),
    "text_hapax"   -> (TextAnalysis.hapax _),
    "text_zipf"    -> (TextAnalysis.zipf _),
    "embed_stats"  -> (Similarity.embedStats _),
    "q_tumble_count"   -> (Windows.tumbleCount _),
    "q_slide_count"    -> (Windows.slideCount _),
    "q_slide_distinct" -> (Windows.slideDistinct _),
    "q_session_window" -> (Windows.sessionWindow _),
    "q_events_parse"   -> (Windows.eventsParse _),
    "q_resample"       -> (Windows.resample _),
    "q_dgim_tumble"    -> (DgimQueries.dgimTumble _),
    "q_dgim_slide"     -> (DgimQueries.dgimSlide _),
    "q_dgim_sql"       -> (DgimQueries.sqlDgimTumble _),
    "q_dgim_sum"       -> (DgimQueries.dgimSumTumble _),
    "q_dgim_sum_slide" -> (DgimQueries.dgimSumSlide _),
    "q_stream_dgim_sum" -> (StreamQueries.streamDgimSum _),
    "q_pivot"          -> (Analytics.qPivot _),
    "q_stream_tumble"  -> (StreamQueries.streamTumbleCount _),
    "q_stream_dgim_tumble" -> (StreamQueries.streamDgimTumble _),
    "q_stream_dgim_slide"  -> (StreamQueries.streamDgimSlide _),
    "q_stream_slide"   -> (StreamQueries.streamSlideCount _),
    "q_stream_session" -> (StreamQueries.streamSessionWindow _),
    "q_stream_dedup"   -> (StreamQueries.streamDedup _),
    "q_stream_delta_dedup" -> (StreamQueries.streamDeltaDedup _),
    "q_stream_decontam" -> (StreamQueries.streamDecontam _),
    "q_stream_cms"     -> (StreamQueries.streamCms _),
    "q_stream_pii"     -> (StreamQueries.streamPii _),
    "q_stream_tokens_bpe" -> (StreamQueries.streamTokensBpe _),
    "q_stream_quality_model" -> (StreamQueries.streamQualityModel _),
    "q_stream_audit"   -> ((s: SparkSession, d: String) => StreamQueries.streamAudit(s, d)),
    "q_stream_mm_dedup" -> (StreamQueries.streamMmDedup _),
    "q_stream_calibration" -> (StreamQueries.streamCalibration _),
    "q_stream_confusion" -> (StreamQueries.streamConfusion _),
    "q_stream_semdedup" -> ((s: SparkSession, d: String) => StreamQueries.streamSemDedup(s, d)),
    "q_stream_substring" -> ((s: SparkSession, d: String) => StreamQueries.streamSubstring(s, d)),
    "q_stream_slide_distinct" -> (StreamQueries.streamSlideDistinct _),
    "q_stream_approx_distinct" -> (StreamQueries.streamApproxDistinct _),
    "q_stream_rate_spikes" -> (StreamQueries.streamRateSpikes _),
    "q_stream_session_paths" -> (StreamQueries.streamSessionPaths _),
    "q_stream_session_paths_capped" -> (StreamQueries.streamSessionPathsCapped _),
    "q_stream_range_join" -> (StreamQueries.streamRangeJoin _),
    "q_stream_range_join_outer" -> (StreamQueries.streamRangeJoinOuter _),
    "q_stream_hot_lines" -> ((s: SparkSession, d: String) => StreamQueries.streamHotLines(s, d)),
    "q_stream_ann_probe" -> ((s: SparkSession, d: String) => StreamQueries.streamAnnProbe(s, d)),
    "q_stream_delta_lsh" -> ((s: SparkSession, d: String) => StreamQueries.streamDeltaLsh(s, d)),
    "q_stream_attribution" -> (StreamQueries.streamAttribution _),
    "embed_mips"       -> (Similarity.embedMips _),
    "q_decay"          -> (Windows.decayScores _),
    "sink_delete"      -> (graft.sources.Sinks.deleteRewrite _),
    "sink_snapshot"    -> (graft.sources.Sinks.snapshotRead _),
    "q_outlier_mad"    -> ((s: SparkSession, d: String) => Profile.outliersMad(s, d)),
    "dedup_exact"      -> (Dedup.exact _),
    "dedup_ngram_jaccard" -> (Dedup.ngramJaccard _),
    "dedup_minhash"    -> (Dedup.minhashLsh _),
    "dedup_simhash"    -> (Dedup.simhash _),
    "dedup_chunks"     -> (Dedup.chunkDups _),
    "dedup_substring"  -> ((s: SparkSession, d: String) => Dedup.substringDedup(s, d)),
    "dedup_substring_delta" -> ((s: SparkSession, d: String) => Dedup.substringDeltaDedup(s, d)),
    "dedup_containment" -> ((s: SparkSession, d: String) => Dedup.containment(s, d)),
    "dedup_editdist"   -> (Dedup.editDistVerify _),
    "dedup_delta"      -> (Dedup.deltaDedup _),
    "dedup_delta_lsh"  -> (Dedup.deltaLshCandidates _),
    "dedup_delta_commit" -> (Dedup.deltaCommit _),
    "dedup_delta_lsh_commit" -> (Dedup.lshCommit _),
    "dedup_delta_bloom" -> ((s: SparkSession, d: String) => Dedup.deltaBloomDedup(s, d)),
    "dedup_clusters"   -> (Clusters.dedupClusters _),
    "dedup_clusters_delta" -> (Clusters.clustersDelta _),
    "q_stream_clusters_delta" -> (Clusters.streamClustersDelta _),
    "dedup_apply"      -> (Clusters.dedupApply _),
    "dedup_embed"      -> ((s: SparkSession, d: String) => Similarity.embedPairs(s, d)),
    "dedup_embed_lsh"  -> (Similarity.embedPairsLsh _),
    "ann_bruteforce"   -> (Similarity.annBruteforce _),
    "ann_lsh"          -> (Similarity.annLsh _),
    "embed_centroids"  -> (Similarity.embedCentroids _),
    "embed_quantize"   -> (Similarity.embedQuantize _),
    "ann_ivf"          -> ((s: SparkSession, d: String) => Similarity.annIvf(s, d)),
    "text_langid"      -> (TextAnalysis.langid _),
    "text_quality"     -> (TextAnalysis.quality _),
    "text_quality_model" -> ((s: SparkSession, d: String) => TextAnalysis.qualityModel(s, d)),
    "text_tokens"      -> (TextAnalysis.tokens _),
    "text_tokens_bpe"  -> (TextAnalysis.tokensBpe _),
    "text_bpe_train"   -> ((s: SparkSession, d: String) => TextAnalysis.bpeTrain(s, d)),
    "text_tokens_bpe_trained" -> ((s: SparkSession, d: String) => TextAnalysis.tokensBpeTrained(s, d)),
    "text_cms"         -> ((s: SparkSession, d: String) => TextAnalysis.cms(s, d)),
    "text_fingerprint" -> (TextAnalysis.fingerprint _),
    "text_rollhash"    -> (TextAnalysis.rollhash _),
    "text_boilerplate" -> ((s: SparkSession, d: String) => TextAnalysis.boilerplate(s, d)),
    "text_tfidf"       -> (TextAnalysis.tfidf _),
    "text_chunks"      -> (TextAnalysis.chunks _),
    "text_repetition"  -> (TextAnalysis.repetition _),
    "text_heavyhitters" -> ((s: SparkSession, d: String) => TextAnalysis.heavyHitters(s, d)),
    "text_search"      -> (TextAnalysis.search _),
    "text_cooccur"     -> (TextAnalysis.cooccur _),
    "stats_profile"    -> (Profile.statsProfile _),
    "embed_pca"        -> (Similarity.embedPca _),
    "embed_pca_k"      -> ((s: SparkSession, d: String) => Similarity.embedPcaK(s, d)),
    "embed_pca_delta"  -> ((s: SparkSession, d: String) => Similarity.embedPcaDelta(s, d)),
    "embed_knn_graph"  -> ((s: SparkSession, d: String) => Similarity.embedKnnGraph(s, d)),
    "embed_knn_graph_lsh" -> ((s: SparkSession, d: String) => Similarity.embedKnnGraphLsh(s, d)),
    "ann_pq"           -> ((s: SparkSession, d: String) => Pq.query(s, d)),
    "ann_ivfpq"        -> ((s: SparkSession, d: String) => Pq.annIvfPq(s, d)),
    "dedup_semdedup"   -> ((s: SparkSession, d: String) => Similarity.semDedup(s, d)),
    "dedup_semdedup_delta" -> ((s: SparkSession, d: String) => Similarity.semDedupDelta(s, d)),
    "text_lm_score"    -> (TextAnalysis.lmScore _),
    "text_pii"         -> (TextAnalysis.pii _),
    "text_decontam"    -> (Decontam.ngramCollisions _),
    "text_decontam_frac" -> (Decontam.fracDecontam _),
    "decontam_embed" -> ((s: SparkSession, d: String) => Decontam.embedDecontam(s, d)),
    "decontam_embed_lsh" -> ((s: SparkSession, d: String) => Decontam.embedDecontamLsh(s, d)),
    "q_stream_decontam_embed" -> ((s: SparkSession, d: String) => StreamQueries.streamEmbedDecontam(s, d)),
    "q_stream_decontam_embed_lsh" -> ((s: SparkSession, d: String) => StreamQueries.streamEmbedDecontamLsh(s, d)),
    "text_decontam_bloom" -> ((s: SparkSession, d: String) => Decontam.bloomDecontam(s, d)),
    "sink_partitioned" -> (graft.sources.Sinks.partitionedRoundTrip _),
    "sink_csv"         -> (graft.sources.Sinks.csvRoundTrip _),
    "sink_jsonl"       -> (graft.sources.Sinks.jsonlRoundTrip _),
    "sink_bucketed"    -> (graft.sources.Sinks.bucketedJoin _),
    "sink_zorder"      -> (graft.sources.Sinks.zorderRoundTrip _),
    "sink_manifest"    -> (graft.sources.Sinks.manifestPrune _),
    "sink_merge"       -> (graft.sources.Sinks.mergeUpsert _),
    "sink_compact"     -> (graft.sources.Sinks.compactRoundTrip _),
    "sink_dpp"         -> (graft.sources.Sinks.dppJoin _),
    "sink_evolve"      -> (graft.sources.Sinks.evolveRoundTrip _),
    "mm_meta"          -> (Multimodal.meta _),
    "mm_framesample"   -> (Multimodal.frameSample _),
    "mm_resize"        -> (Multimodal.resize _),
    "mm_features"      -> (Multimodal.features _),
    "mm_dedup"         -> (Multimodal.payloadDedup _),
    "sample_stratified" -> (Curation.sampleStratified _),
    "sample_stratified_topk" -> (Curation.sampleStratifiedThreshold _),
    "sample_weighted"  -> (Curation.sampleWeighted _),
    "sample_fixed"     -> ((s: SparkSession, d: String) => Curation.sampleFixed(s, d)),
    "pipeline_curate"  -> (Curation.curate _),
    "pipeline_audit"   -> (Audit.pipelineAudit _),
    "pipeline_split"   -> (Curation.trainValTestSplit _),
    "pipeline_corpus"  -> (Curation.corpusBuild _),
    "pipeline_pack"    -> (Curation.pack _),
    "pipeline_shuffle" -> (Curation.shuffleOrder _),
    "pipeline_budget"  -> ((s: SparkSession, d: String) => Curation.tokenBudget(s, d)),
    "pipeline_epochs"  -> ((s: SparkSession, d: String) => Curation.epochOrders(s, d)),
    "pipeline_budget_epochs" -> ((s: SparkSession, d: String) => Curation.budgetEpochs(s, d)),
    "pipeline_interleave" -> (Curation.interleave _),
    "mm_simhash"       -> (Multimodal.payloadSimhash _),
    "pipeline_mix"     -> (Curation.mixSources _),
    "sample_temperature" -> (Curation.sampleTemperature _),
    "pipeline_anneal"  -> (Curation.annealMix _),
    "pipeline_cluster_balance" -> ((s: SparkSession, d: String) => Curation.clusterBalance(s, d)),
    "graph_pagerank"   -> ((s: SparkSession, d: String) => Graph.pagerank(s, d)),
    "graph_triangles"  -> ((s: SparkSession, d: String) => Graph.triangles(s, d)),
    "sink_scd2"        -> (graft.sources.Sinks.scd2Build _),
  )

  /** DuckDB-equivalent SQL per query key (column names must match). */
  def oracleSql: Map[String, String] = Map(
    "q1_agg"       -> Analytics.q1AggSql,
    "q3_join"      -> Analytics.q3JoinSql,
    "q14_promo"    -> Analytics.q14PromoSql,
    "q2_mincost"   -> Analytics.q2MinCostSql,
    "q5_join"      -> Analytics.q5JoinSql,
    "q_topk_window" -> Analytics.qTopkWindowSql,
    "q_rollup"     -> Analytics.qRollupSql,
    "q_grouping_sets" -> Analytics.qGroupingSetsSql,
    "q_approx_distinct" -> Analytics.qDistinctSql,
    "q_quantile"   -> Analytics.qQuantileSql,
    "q_moving_window" -> Analytics.qMovingWindowSql,
    "q_cube"       -> Analytics.qCubeSql,
    "q_semi_join"  -> Analytics.qSemiJoinSql,
    "q_anti_join"  -> Analytics.qAntiJoinSql,
    "q_asof_join"  -> AsofJoin.clicksLastPurchaseSql,
    "q_range_join" -> RangeJoin.errorClicksWithin5MinSql,
    "q_salted_join" -> SkewJoin.saltedJoinSql,
    "q_setops"     -> Behavior.qSetopsSql,
    "q_ntile"      -> Behavior.qNtileSql,
    "q_funnel"     -> Behavior.qFunnelSql,
    "q_retention"  -> Behavior.qRetentionSql,
    "q_histogram"  -> Behavior.qHistogramSql,
    "q_transitions" -> Behavior.qTransitionsSql,
    "q_session_paths" -> Behavior.qSessionPathsSql,
    "q_attribution"   -> Behavior.qAttributionSql,
    "stats_mad"       -> Profile.statsMadSql,
    "q_anomaly"    -> Windows.anomalySql,
    "q_incidents"  -> Windows.incidentsSql,
    "q_changepoint" -> Windows.changepointSql,
    "q_rate_spikes" -> Windows.rateSpikesSql(),
    // q_hll_merge: DataSketches HLL estimates are not reproducible in
    // DuckDB (different sketch impl) → rows-only driver check; SketchSpec
    // pins merge==direct equality, error vs exact, byte-identical rebuild.
    "stats_corr"   -> Profile.statsCorrSql,
    "stats_ttest"  -> Profile.statsTtestSql,
    "stats_drift"  -> Profile.statsDriftSql,
    "stats_ks"     -> Profile.statsKsSql,
    "stats_ks_binned" -> Profile.statsKsBinnedSql(),
    "stats_auc"    -> Profile.statsAucSql,
    "stats_calibration" -> Profile.statsCalibrationSql,
    "stats_confusion" -> Profile.statsConfusionSql,
    "stats_pr_curve" -> Profile.statsPrCurveSql,
    "stats_chi2"   -> Profile.statsChi2Sql,
    "stats_gini"   -> Profile.statsGiniSql,
    "stats_mi"     -> Profile.statsMiSql,
    "text_ttr"     -> TextAnalysis.ttrSql,
    "text_hapax"   -> TextAnalysis.hapaxSql,
    "text_zipf"    -> TextAnalysis.zipfSql,
    "embed_stats"  -> Similarity.embedStatsSql,
    "q_tumble_count"   -> Windows.tumbleCountSql,
    "q_slide_count"    -> Windows.slideCountSql,
    "q_slide_distinct" -> Windows.slideDistinctSql,
    "q_session_window" -> Windows.sessionWindowSql,
    "q_events_parse"   -> Windows.eventsParseSql,
    "q_resample"       -> Windows.resampleSql,
    // q_dgim_tumble / q_dgim_slide / q_dgim_sum / q_dgim_sum_slide run
    // the DETERMINISTIC sort-then-fold execs, so a DuckDB recursive CTE
    // replays each fold exactly (hash oracles — the sum form is 17
    // per-bit instance folds + the 2^j-weighted rollup). q_dgim_sql and
    // the streaming DGIM rows go through the mergeable UDAF whose
    // canonical cross-partition bucket-merge is NOT associative with
    // the fold (estimates legally differ within the bound) →
    // rows-only + DgimSpec/DgimPlanSpec bound pins for those.
    "q_dgim_tumble"    -> DgimQueries.dgimTumbleSql,
    "q_dgim_slide"     -> DgimQueries.dgimSlideSql,
    "q_dgim_sum"       -> DgimQueries.dgimSumTumbleSql,
    "q_dgim_sum_slide" -> DgimQueries.dgimSumSlideSql,
    "q_pivot"          -> Analytics.qPivotSql,
    "q_stream_tumble"  -> Windows.tumbleCountSql, // streaming == batch
    "q_stream_slide"   -> Windows.slideCountSql,  // streaming == batch
    "q_stream_session" -> Windows.sessionWindowSql, // streaming == batch
    "q_stream_dedup"   -> StreamQueries.streamDedupSql,
    "q_stream_delta_dedup" -> StreamQueries.streamDeltaDedupSql,
    // q_stream_decontam probes gram64 FINGERPRINTS (8 B/gram broadcast,
    // the 10⁷-gram-suite scale form — r14); its oracle replays the same
    // roll61+mix64 fingerprints so both engines compare like with like
    "q_stream_decontam" -> Decontam.ngramCollisionsHashSql,
    // q_stream_tokens_bpe: stateless per-arrival application of the
    // STAGED trained merge table — emits the batch train+apply contract
    // verbatim, so the same full-replay oracle hash-checks it
    "q_stream_tokens_bpe" -> TextAnalysis.tokensBpeTrainedSql(),
    // q_stream_pii: stateless per-arrival scrub scoring, shared
    // expressions with the batch op -> same oracle, streaming = batch
    "q_stream_pii"     -> TextAnalysis.piiSql,
    // q_stream_quality_model: stateless per-arrival scoring against the
    // STAGED trained fixed-point weights — emits the batch train+score
    // contract verbatim, so the same full-replay oracle hash-checks it
    "q_stream_quality_model" -> TextAnalysis.qualityModelSql,
    // q_stream_calibration: the same staged-serving contract, folded into
    // the ≤10-row complete-mode reliability grid — same full train+
    // score+bin replay as the batch calibration row
    "q_stream_calibration" -> Profile.statsCalibrationSql,
    "q_stream_confusion" -> Profile.statsConfusionSql,
    // q_stream_semdedup: stateless admission gate vs the staged base
    // generation only — arrival-vs-arrival pairs are the compactor's
    // (dedup_semdedup_delta's) job, so the oracle restricts the EXISTS
    // witness to base members
    "q_stream_semdedup" -> Similarity.streamSemDedupSql(),
    // q_stream_cms: CMS counters are sum-mergeable streaming state —
    // streaming counters ≡ batch counters ≡ the same HUGEINT replay
    "q_stream_cms"     -> TextAnalysis.cmsCountersSql,
    // q_stream_substring: staged-index probe + string verify on the
    // ingest stream ≡ the batch delta-vs-base interval set
    "q_stream_substring" -> StreamQueries.streamSubstringSql(),
    "q_stream_slide_distinct" -> StreamQueries.streamSlideDistinctSql,
    "q_stream_rate_spikes" -> StreamQueries.streamRateSpikesSql,
    "q_stream_session_paths" -> StreamQueries.streamSessionPathsSql,
    "q_stream_session_paths_capped" -> StreamQueries.streamSessionPathsCappedSql,
    // q_stream_approx_distinct: HLL estimates are engine-specific →
    // rows-only driver check; StreamingSpec pins estimates within HLL
    // error of the exact batch distincts over the same window set.
    "q_stream_range_join" -> StreamQueries.streamRangeJoinSql,
    "q_stream_range_join_outer" -> StreamQueries.streamRangeJoinOuterSql,
    "q_stream_hot_lines" -> StreamQueries.streamHotLinesSql(),
    "q_stream_attribution" -> StreamQueries.streamAttributionSql,
    "embed_mips"       -> Similarity.embedMipsSql,
    "q_decay"          -> Windows.decayScoresSql,
    "sink_delete"      -> graft.sources.Sinks.deleteRewriteSql,
    "sink_snapshot"    -> graft.sources.Sinks.snapshotReadSql,
    "q_outlier_mad"    -> Profile.outliersMadSql(),
    // q_stream_dgim_tumble: rows-only; StreamingSpec asserts error bound.
    "dedup_exact"      -> Dedup.exactSql,
    "dedup_ngram_jaccard" -> Dedup.ngramJaccardSql,
    // dedup_minhash / dedup_simhash (round 10): the splitmix64 re-seed
    // made the full sketches DuckDB-replayable — hash-oracled; SketchSpec
    // still asserts recall/precision.
    "dedup_minhash"    -> Dedup.minhashLshSql,
    "dedup_simhash"    -> Dedup.simhashSql,
    "dedup_chunks"     -> Dedup.chunkDupsSql,
    "dedup_substring"  -> Dedup.substringDedupSql(),
    // dedup_substring_delta: from-scratch batch replay with base-first
    // keeper order, restricted to delta docs — index-probe ≡ recompute
    "dedup_substring_delta" -> Dedup.substringDeltaSql(),
    "dedup_containment" -> Dedup.containmentSql,
    "dedup_editdist"   -> Dedup.editDistVerifySql,
    "dedup_delta"      -> Dedup.deltaDedupSql,
    // dedup_delta_commit emits the SAME contract as dedup_exact, so the
    // from-scratch oracle proves incremental index merge ≡ recompute
    "dedup_delta_commit" -> Dedup.exactSql,
    "dedup_delta_lsh_commit" -> Dedup.lshCommitSql,
    // Bloom-gated ingest emits the SAME contract as the plain index
    // probe (exact verify behind the sketch) — same oracle as the
    // streaming delta dedup's left join
    "dedup_delta_bloom" -> StreamQueries.streamDeltaDedupSql,
    // dedup_delta_lsh (round 10): replayed like dedup_minhash, with the
    // delta side probing all bands — index probe ≡ recompute, now under
    // the hash gate (SketchSpec keeps the full-vs-delta equality proof)
    "dedup_delta_lsh"  -> Dedup.deltaLshSql,
    // q_stream_delta_lsh emits the SAME contract continuously (staged
    // band-index probe + per-bucket state for new-vs-new) — the batch
    // sketch replay hash-checks the streaming form too
    "q_stream_delta_lsh" -> Dedup.deltaLshSql,
    "dedup_clusters"   -> Clusters.dedupClustersSql,
    "dedup_clusters_delta" -> Clusters.clustersDeltaSql,
    // continuous maintenance ≡ batch merge ≡ from-scratch recompute:
    // the streaming fold emits the identical affected-rows contract
    "q_stream_clusters_delta" -> Clusters.clustersDeltaSql,
    "dedup_apply"      -> Clusters.dedupApplySql,
    "dedup_embed"      -> Similarity.embedPairsSql,
    // dedup_embed_lsh (round 10): recall < 1 vs the exact twin, but the
    // operator's OWN output is deterministic — the splitmix64 hyperplanes
    // replay in SQL, so the bucketed candidates + exact rescore hash-match.
    "dedup_embed_lsh"  -> Similarity.embedPairsLshSql,
    "ann_bruteforce"   -> Similarity.annBruteforceSql,
    // ann_ivf: deterministic Lloyd's means the WHOLE learned index is
    // replayable — DuckDB unrolls the 4 training iterations as chained
    // CTEs and hash-matches train→assign→probe→re-rank end to end.
    "ann_ivf"          -> Similarity.annIvfSql(),
    // q_stream_ann_probe emits ann_ivf's exact contract from the STAGED
    // index — the training-replay oracle proves staged online serving ≡
    // from-scratch batch train+probe
    "q_stream_ann_probe" -> Similarity.annIvfSql(),
    "dedup_semdedup"   -> Similarity.semDedupSql(),
    // dedup_semdedup_delta: frozen base-trained quantizer (training CTEs
    // restricted to the base slice), full-corpus assign + EXISTS verdict
    // — incremental affected-cell merge ≡ from-scratch recompute
    "dedup_semdedup_delta" -> Similarity.semDedupDeltaSql(),
    // ann_lsh (round 10): hyperplane replay → hash-oracled; SketchSpec
    // still measures recall vs brute force.
    "ann_lsh"          -> Similarity.annLshSql,
    "embed_centroids"  -> Similarity.embedCentroidsSql,
    "embed_quantize"   -> Similarity.embedQuantizeSql,
    "text_langid"      -> TextAnalysis.langidSql,
    "text_quality"     -> TextAnalysis.qualitySql,
    "text_quality_model" -> TextAnalysis.qualityModelSql,
    "text_tokens"      -> TextAnalysis.tokensSql,
    "text_tokens_bpe"  -> TextAnalysis.tokensBpeSql,
    // text_bpe_train: the FULL training run (pair counts, argmax, greedy
    // run-parity merge application) unrolled as chained CTEs — the
    // learned merge table hash-matches bit-for-bit
    "text_bpe_train"   -> TextAnalysis.bpeTrainSql(),
    // text_tokens_bpe_trained: the closed train+apply loop — the same
    // training CTE chain extended with the run-parity application
    // rewrite over every distinct corpus word
    "text_tokens_bpe_trained" -> TextAnalysis.tokensBpeTrainedSql(),
    // text_cms: the WHOLE 4x1024-counter sketch replayed (splitmix64
    // row seeds, gram64 word hashes, counters as group-bys) — the
    // overcount column is the sketch's measured error, hash-verified
    "text_cms"         -> TextAnalysis.cmsSql(),
    "text_fingerprint" -> TextAnalysis.fingerprintSql,
    "text_rollhash"    -> TextAnalysis.rollhashSql,
    "text_boilerplate" -> TextAnalysis.boilerplateSql(),
    "text_tfidf"       -> TextAnalysis.tfidfSql,
    "text_chunks"      -> TextAnalysis.chunksSql,
    "text_repetition"  -> TextAnalysis.repetitionSql,
    "text_heavyhitters" -> TextAnalysis.heavyHittersSql,
    "text_search"      -> TextAnalysis.searchSql,
    "text_cooccur"     -> TextAnalysis.cooccurSql,
    "stats_profile"    -> Profile.statsProfileSql,
    // embed_pca IS SQL-expressible after all: the training run is
    // deterministic IEEE arithmetic end-to-end, so a recursive CTE
    // replays all 100 power-iteration steps bit-exactly (see
    // Similarity.embedPcaSql); SketchSpec still pins the eigenpair
    // residual, variance capture, and bit-identical retrain.
    "embed_pca"        -> Similarity.embedPcaSql,
    "embed_pca_k"      -> Similarity.embedPcaKSql,
    // embed_pca_delta: staged-moments merge ≡ from-scratch retrain — the
    // oracle replays the FULL corpus training and projects the delta
    "embed_pca_delta"  -> Similarity.embedPcaDeltaSql,
    "text_pii"         -> TextAnalysis.piiSql,
    "embed_knn_graph"  -> Similarity.embedKnnGraphSql(),
    "embed_knn_graph_lsh" -> Similarity.embedKnnGraphLshSql(),
    // ann_pq / ann_ivfpq: hash-oracled after all — the per-subspace
    // Lloyd's and the coarse quantizer unroll as chained CTEs, the ADC
    // sum is an ordered list fold; SketchSpec still asserts retrain
    // determinism, monotone objectives, recall, reconstruction MSE.
    "ann_pq"           -> Pq.annPqSql(),
    "ann_ivfpq"        -> Pq.annIvfPqSql(),
    // dedup_semdedup: hash-oracled after all (the k-means replay above
    // + keep-first EXISTS); HygieneSpec still pins exact-witness
    // precision + co-celled-pair recall against embedPairs.
    "text_lm_score"    -> TextAnalysis.lmScoreSql,
    "text_decontam"    -> Decontam.ngramCollisionsSql,
    "text_decontam_frac" -> Decontam.fracDecontamSql,
    "decontam_embed" -> Decontam.embedDecontamSql,
    // decontam_embed_lsh: the prescreened form is approximate BY
    // CONTRACT (LSH has false negatives for a cosine threshold — no
    // Bloom-style no-FN sketch exists), so it hash-verifies against its
    // OWN full bucket replay, the embedPairsLsh device; HygieneSpec
    // pins precision 1.0 + recall vs the exact twin
    "decontam_embed_lsh" -> Decontam.embedDecontamLshSql(),
    // q_stream_decontam_embed: stateless per-arrival scoring against the
    // broadcast eval suite — same full replay oracle as the batch row
    "q_stream_decontam_embed" -> Decontam.embedDecontamSql,
    // q_stream_decontam_embed_lsh: staged-bucket online gating ≡ the
    // batch prescreen's replay (same planes/bits/tables by shared
    // code), so the batch LSH oracle hash-checks the streaming gate
    "q_stream_decontam_embed_lsh" -> Decontam.embedDecontamLshSql(),
    // identical output contract via the Bloom pre-filter path (exact
    // verify behind the sketch) — same oracle as text_decontam
    "text_decontam_bloom" -> Decontam.ngramCollisionsSql,
    "sink_partitioned" -> graft.sources.Sinks.partitionedRoundTripSql,
    "sink_csv"         -> graft.sources.Sinks.csvRoundTripSql,
    "sink_jsonl"       -> graft.sources.Sinks.jsonlRoundTripSql,
    "sink_bucketed"    -> graft.sources.Sinks.bucketedJoinSql,
    "sink_zorder"      -> graft.sources.Sinks.zorderRoundTripSql,
    "sink_manifest"    -> graft.sources.Sinks.manifestPruneSql,
    "sink_merge"       -> graft.sources.Sinks.mergeUpsertSql,
    "sink_compact"     -> graft.sources.Sinks.compactRoundTripSql,
    "sink_dpp"         -> graft.sources.Sinks.dppJoinSql,
    "sink_evolve"      -> graft.sources.Sinks.evolveRoundTripSql,
    "mm_meta"          -> Multimodal.metaSql,
    "mm_framesample"   -> Multimodal.frameSampleSql,
    "mm_resize"        -> Multimodal.resizeSql,
    "mm_features"      -> Multimodal.featuresSql,
    "mm_dedup"         -> Multimodal.payloadDedupSql,
    "sample_stratified" -> Curation.sampleStratifiedSql,
    // identical output contract, huge-strata plan — same oracle
    "sample_stratified_topk" -> Curation.sampleStratifiedSql,
    "sample_weighted"  -> Curation.sampleWeightedSql,
    "sample_fixed"     -> Curation.sampleFixedSql(),
    "pipeline_curate"  -> Curation.curateSql,
    // pipeline_audit: the composed gate ladder replays end-to-end —
    // training prefix + 7-gram eval CTEs + fingerprint keeper + PII flag
    "pipeline_audit"   -> Audit.pipelineAuditSql,
    // q_stream_audit: the same composed ladder per arrival; duplicate
    // stage = the base-index probe (streamDeltaDedup's rule)
    "q_stream_audit"   -> StreamQueries.streamAuditSql,
    // q_stream_mm_dedup: binary-payload gate vs the staged base index —
    // the streamDeltaDedup replay over payload bytes
    "q_stream_mm_dedup" -> StreamQueries.streamMmDedupSql,
    "pipeline_split"   -> Curation.trainValTestSplitSql,
    "pipeline_corpus"  -> Curation.corpusBuildSql,
    "pipeline_pack"    -> Curation.packSql,
    "pipeline_shuffle" -> Curation.shuffleOrderSql,
    "pipeline_budget"  -> Curation.tokenBudgetSql(),
    "pipeline_epochs"  -> Curation.epochOrdersSql(),
    "pipeline_budget_epochs" -> Curation.budgetEpochsSql(),
    "pipeline_interleave" -> Curation.interleaveSql,
    // mm_simhash: splitmix64 is plain 2^64 integer arithmetic (unlike
    // the xxhash64 text sketches) → the whole byte-level sketch replays
    // in HUGEINT; SketchSpec still plants a one-byte-flipped copy.
    "mm_simhash"       -> Multimodal.payloadSimhashSql,
    "pipeline_mix"     -> Curation.mixSourcesSql,
    "sample_temperature" -> Curation.sampleTemperatureSql,
    "pipeline_anneal"  -> Curation.annealMixSql,
    // pipeline_cluster_balance: the full Lloyd's replay (shared with
    // ann_ivf) + the capped per-cell pick -> train-assign-balance
    // hash-verified end to end
    "pipeline_cluster_balance" -> Curation.clusterBalanceSql(),
    "graph_pagerank"   -> Graph.pagerankSql(),
    "graph_triangles"  -> Graph.trianglesSql,
    "sink_scd2"        -> graft.sources.Sinks.scd2BuildSql,
  )
}

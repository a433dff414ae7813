package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.joinStar(spark, "/root/testdata/sf0.001")

  type Q = (SparkSession, String) => DataFrame

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, Q] = Map[String, Q](
    "q1_agg" -> (Relational.q1Agg _),
    "q_agg_stats" -> (Relational.aggStats _),
    "q_agg_uniq" -> (Relational.aggUniq _),
    "q_sketch_kmv" -> ((s: SparkSession, d: String) => Sketches.kmvUniq(s, d)),
    "q_sketch_ops" -> ((s: SparkSession, d: String) => Sketches.kmvSetOps(s, d)),
    "q_sketch_percentiles" -> (Sketches.histPercentiles _),
    "q_approx_percentile" -> (Sketches.approxPercentile _),
    "q_approx_percentile_cont" -> (Sketches.approxPercentileCont _),
    "q_sketch_cms" -> ((s: SparkSession, d: String) => Sketches.cmsWordFreq(s, d)),
    "q_sketch_window" -> ((s: SparkSession, d: String) =>
      graft.streaming.Windows.kmvSlidingWindows(s, d)),
    "q_sketch_cube" -> ((s: SparkSession, d: String) => Sketches.kmvCube(s, d)),
    "q_approx_distinct" -> ((s: SparkSession, d: String) => Sketches.approxDistinct(s, d)),
    "q_agg_histogram" -> (Relational.aggHistogram _),
    "q_agg_highcard" -> (Relational.aggHighcard _),
    "q_secondary_sort" -> (Relational.secondarySort _),
    "q_sort_global" -> (Relational.sortGlobal _),
    "q_sort_validate" -> (Relational.sortValidate _),
    "q_sample_interval" -> ((s: SparkSession, d: String) => Relational.intervalSample(s, d)),
    "q_reservoir_group" -> ((s: SparkSession, d: String) => Relational.reservoirPerGroup(s, d)),
    "q_reservoir_weighted" -> (Relational.weightedReservoirGate _),
    "q_total_order_bucket" -> (Relational.totalOrderBucket _),
    "q_shuffle_deterministic" -> (Relational.shuffleGate _),
    "q_shard_budget" -> (Relational.shardBudgetGate _),
    "q_zorder" -> (Relational.zOrderStats _),
    "q_topk_per_group" -> (Relational.topkPerGroup _),
    "q_join_star" -> (Relational.joinStar _),
    "q_join_bigbig" -> (Relational.joinBigBig _),
    "q_join_outer" -> (Relational.joinOuter _),
    "q_join_override" -> (Relational.joinOverride _),
    "q_join_bloom" -> (Relational.joinBloom _),
    "q_field_selection" -> (Relational.fieldSelection _),
    "q_chain" -> (Relational.chain _),
    "q_multi_input_union" -> (Relational.multiInputUnion _),
    "q_multi_output_assign" -> (Relational.multiOutputAssign _),
    "q_json_extract" -> (Relational.jsonExtract _),
    "q_set_ops" -> (Relational.setOps _),
    // text (§2.3, §2.6)
    "q_wordcount" -> (TextOps.wordcount _),
    "q_bpe_train" -> ((s: SparkSession, d: String) => TextOps.bpeTrain(s, d)),
    "q_bpe_encode" -> ((s: SparkSession, d: String) => TextOps.bpeEncode(s, d)),
    "q_grep" -> (TextOps.grep _),
    "q_inverted_index" -> (TextOps.invertedIndex _),
    "q_text_langid" -> (TextOps.langid _),
    "q_nb_langid" -> (TextOps.nbLangid _),
    "q_lm_perplexity" -> (TextOps.lmPerplexity _),
    "q_text_quality" -> (TextOps.quality _),
    "q_gopher_rules" -> (TextOps.gopherRules _),
    "q_text_tokens" -> (TextOps.tokenCounts _),
    "q_text_fingerprint" -> (TextOps.fingerprint _),
    "q_tfidf" -> (TextOps.tfidf _),
    "q_feature_hash" -> ((s: SparkSession, d: String) =>
      TextOps.featureHash(s, d)),
    "q_text_redact" -> (TextOps.redact _),
    "q_text_chunks" -> ((s: SparkSession, d: String) => TextOps.chunk(s, d)),
    "q_text_repetition" -> (TextOps.repetition _),
    "q_decontaminate" -> ((s: SparkSession, d: String) => TextOps.decontaminate(s, d)),
    "q_text_bigram_rarity" -> (TextOps.bigramRarity _),
    "q_dedup_spans" -> ((s: SparkSession, d: String) => TextOps.dupSpans(s, d)),
    "q_pagerank" -> ((s: SparkSession, d: String) => Dedup.sourceRank(s, d)),
    "q_communities" -> ((s: SparkSession, d: String) => Dedup.communities(s, d)),
    "q_bpe_merges" -> ((s: SparkSession, d: String) => TextOps.bpeMerges(s, d)),
    "q_dedup_containment" -> (Dedup.containment _),
    "q_pack_sequences" -> ((s: SparkSession, d: String) => TextOps.packSequences(s, d)),
    // oracle-gated via rank + integer surrogates (the ln() score
    // orders but is never hashed); ranking semantics also in TfIdfSpec
    "q_bm25" -> ((s: SparkSession, d: String) => TextOps.bm25(s, d)),
    // dedup (§2.6)
    "q_dedup_exact" -> (Dedup.exact _),
    "q_dedup_cascade" -> ((s: SparkSession, d: String) => Dedup.cascade(s, d)),
    "q_dedup_incremental" -> (Dedup.incremental _),
    "q_dedup_incremental_near" -> (Dedup.incrementalNear _),
    "q_dedup_incremental_indexed" -> (Dedup.incrementalNearIndexed _),
    "q_dedup_minhash" -> (Dedup.minhashBands _),
    "q_dedup_minhash_pairs" -> (Dedup.minhashPairs _),
    "q_dedup_simhash" -> (Dedup.simhash _),
    "q_dedup_simhash_pairs" -> ((s: SparkSession, d: String) => Dedup.simhashPairs(s, d)),
    "q_dedup_jaccard" -> (Dedup.ngramJaccard _),
    "q_dedup_clusters" -> ((s: SparkSession, d: String) => Dedup.dedupClusters(s, d)),
    "q_dedup_canonical" -> ((s: SparkSession, d: String) => Dedup.canonicalSelection(s, d)),
    "q_dedup_clusters_star" -> (Dedup.dedupClustersStar _),
    // similarity / ANN (§2.6)
    "q_dedup_embedding" -> (Similarity.embeddingNearDup _),
    "q_semdedup" -> ((s: SparkSession, d: String) => Similarity.semDedup(s, d)),
    "q_ann_bruteforce" -> ((s: SparkSession, d: String) => Similarity.annBruteForce(s, d)),
    "q_ann_int8" -> ((s: SparkSession, d: String) => Similarity.annInt8(s, d)),
    "q_knn_classify" -> ((s: SparkSession, d: String) => Similarity.knnClassify(s, d)),
    "q_ann_binary" -> ((s: SparkSession, d: String) => Similarity.annBinary(s, d)),
    "q_ann_lsh" -> ((s: SparkSession, d: String) => Similarity.annLsh(s, d)),
    "q_ann_multiprobe" -> ((s: SparkSession, d: String) => Similarity.annLshMultiProbe(s, d)),
    "q_ann_lsh_native" -> ((s: SparkSession, d: String) => Similarity.annLshNative(s, d)),
    "q_ann_recall" -> ((s: SparkSession, d: String) => Similarity.annRecall(s, d)),
    "q_ann_ivf" -> ((s: SparkSession, d: String) => Similarity.annIvf(s, d)),
    "q_ann_filtered" ->
      ((s: SparkSession, d: String) => Similarity.annIvfFiltered(s, d)),
    "q_hybrid_retrieval" ->
      ((s: SparkSession, d: String) => Similarity.hybridRetrieval(s, d)),
    "q_hybrid_retrieval_ivf" ->
      ((s: SparkSession, d: String) => Similarity.hybridRetrievalIvf(s, d)),
    "q_ann_ivf_indexed" -> ((s: SparkSession, d: String) => Similarity.annIvfIndexed(s, d)),
    "q_ann_ivf_incremental" -> ((s: SparkSession, d: String) => Similarity.annIvfIncremental(s, d)),
    "q_ann_pq" -> ((s: SparkSession, d: String) => Similarity.annPq(s, d)),
    "q_ann_pq_recall" -> ((s: SparkSession, d: String) => Similarity.annPqRecall(s, d)),
    "q_ann_ivfpq" -> ((s: SparkSession, d: String) => Similarity.annIvfPq(s, d)),
    "q_ann_ivfpq_res" -> ((s: SparkSession, d: String) => Similarity.annIvfPqResidual(s, d)),
    "q_ann_ivf_trained" -> ((s: SparkSession, d: String) => Similarity.annIvfTrained(s, d)),
    "q_ann_pq_trained" -> ((s: SparkSession, d: String) => Similarity.annPqTrained(s, d)),
    // streaming batch twins (§2.4) + external program + media
    "q_window_agg" -> (graft.streaming.Windows.windowAgg _),
    "q_sessionize" -> (graft.streaming.Windows.sessionize _),
    "q_session_window" -> (graft.streaming.Windows.sessionWindowAgg _),
    "q_pipe_upper" -> (graft.sources.Pipe.pipeUpper _),
    "q_pipe_reduce" -> (graft.sources.Pipe.pipeReduceSum _),
    "q_pipe_binary" -> (graft.sources.Pipe.pipeBinaryHash _),
    "q_txtable_mor" -> (graft.sources.TxTable.cdcGateQuery _),
    "q_txtable_zopt" -> (graft.sources.TxTable.zoptGateQuery _),
    "q_txtable_zopt3" -> (graft.sources.TxTable.zopt3GateQuery _),
    "q_txtable_zopt_incr" -> (graft.sources.TxTable.zoptIncrGateQuery _),
    "q_txtable_zorder_str" -> (graft.sources.TxTable.zorderStrGateQuery _),
    "q_txtable_changes" -> (graft.sources.TxTable.changesGateQuery _),
    "q_txtable_changes_sql" ->
      (graft.sources.TxTable.changesSqlGateQuery _),
    "q_txtable_string_prune" ->
      (graft.sources.TxTable.stringPruneGateQuery _),
    "q_txtable_optimize" -> (graft.sources.TxTable.optimizeGateQuery _),
    "q_txtable_stats_agg" -> (graft.sources.TxTable.statsAggGateQuery _),
    "q_txtable_analyze" -> (graft.sources.TxTable.analyzeGateQuery _),
    "q_txtable_count_distinct" ->
      (graft.sources.TxTable.countDistinctGateQuery _),
    "q_txtable_part_counts" ->
      (graft.sources.TxTable.partCountsGateQuery _),
    "q_txtable_part_counts_str" ->
      (graft.sources.TxTable.partCountsStrGateQuery _),
    "q_txtable_spj" -> (graft.sources.TxTable.spjGateQuery _),
    "q_txtable_bucket_spj" ->
      (graft.sources.TxTable.bucketSpjGateQuery _),
    "q_txtable_bucket_spj_shuffle" ->
      (graft.sources.TxTable.bucketSpjShuffleGateQuery _),
    "q_txtable_spj2" -> (graft.sources.TxTable.spj2GateQuery _),
    "q_txtable_spj_str" -> (graft.sources.TxTable.spjStrGateQuery _),
    "q_txtable_spj_str_range" ->
      (graft.sources.TxTable.spjStrRangeGateQuery _),
    "q_txtable_spj_value" ->
      (graft.sources.TxTable.spjValueGateQuery _),
    "q_txtable_timetravel_sql" ->
      (graft.sources.TxTable.timeTravelSqlGateQuery _),
    "q_txtable_overwrite_part" ->
      (graft.sources.TxTable.overwritePartGateQuery _),
    "q_txtable_overwrite_part_str" ->
      (graft.sources.TxTable.overwritePartStrGateQuery _),
    "q_txtable_show_parts" ->
      (graft.sources.TxTable.showPartsGateQuery _),
    "q_txtable_addcol" ->
      (graft.sources.TxTable.addColGateQuery _),
    "q_txtable_sql_maint" ->
      (graft.sources.TxTable.sqlMaintGateQuery _),
    "q_txtable_sql_spj" ->
      (graft.sources.TxTable.sqlPartSpjGateQuery _),
    "q_txtable_pdelete" ->
      (graft.sources.TxTable.pdeleteGateQuery _),
    "q_txtable_grouped_ndv" ->
      (graft.sources.TxTable.groupedNdvGateQuery _),
    "q_txtable_stream_part" ->
      (graft.sources.TxTable.streamPartGateQuery _),
    "q_txtable_cbo_join" -> (graft.sources.TxTable.cboJoinGateQuery _),
    "q_txtable_manifest" -> (graft.sources.TxTable.manifestGateQuery _),
    "q_txtable_aggview" -> (graft.sources.TxView.aggViewGateQuery _),
    "q_inverted_index_incremental" ->
      (graft.sources.InvertedIndex.gateQuery _),
    "q_inverted_index_lookup" ->
      (graft.sources.InvertedIndex.lookupGateQuery _),
    "q_txtable_rename" -> (graft.sources.TxTable.renameGateQuery _),
    "q_har_readall" -> (graft.sources.Compaction.harGateQuery _),
    "q_video_meta" -> (Media.videoMetaGateQuery _),
    "q_media_meta" -> (Media.mediaMeta _),
    // OLAP analytics (§2.1 extensions)
    "q_rollup" -> (Olap.rollup _),
    "q_cube" -> (Olap.cube _),
    "q_grouping_sets" -> (Olap.groupingSets _),
    "q_window_funcs" -> (Olap.windowFuncs _),
    "q_window_ranks" -> (Olap.windowRanks _),
    "q_corr_stats" -> (Olap.corrStats _),
    "q_pivot" -> (Olap.pivot _),
    "q_running_total" -> (Olap.runningTotal _),
    "q_percentiles" -> (Olap.percentiles _),
    "q_join_anti" -> (Olap.antiJoin _),
    "q_asof_join" -> (Olap.asofJoin _),
    "q_cdc_merge" -> (Olap.cdcMerge _),
    "q_scd2" -> (Olap.scd2 _),
    "q_range_join" -> ((s: SparkSession, d: String) => Olap.rangeJoinBinned(s, d)),
    "q_join_salted" -> (Olap.joinSalted _),
    "q_funnel" -> ((s: SparkSession, d: String) => Olap.funnel(s, d)),
    "q_itemsets" -> ((s: SparkSession, d: String) => Olap.itemsets(s, d)),
    "q_retention" -> (Olap.retention _),
    "q_gapfill" -> (Olap.gapfill _),
    "q_moving_avg" -> (Olap.movingAvg _),
    "q_incr_agg" -> ((s: SparkSession, d: String) => Olap.incrementalAgg(s, d)),
    "q_event_paths" -> ((s: SparkSession, d: String) => Olap.eventPaths(s, d)),
    "q_fuzzy_names" -> ((s: SparkSession, d: String) => Dedup.fuzzyNamePairs(s, d)),
    // data profiling / quality / reproducible sampling
    "q_profile" -> ((s: SparkSession, d: String) => DataQuality.profile(s, d)),
    "q_profile_exact" ->
      ((s: SparkSession, d: String) => DataQuality.profile(s, d, exact = true)),
    "q_dq_checks" -> (DataQuality.dqChecks _),
    "q_sample_hash" -> ((s: SparkSession, d: String) => DataQuality.hashSample(s, d)),
    "q_split_assign" -> ((s: SparkSession, d: String) => DataQuality.trainValTestSplit(s, d)),
    "q_mix_sample" -> ((s: SparkSession, d: String) => DataQuality.mixSample(s, d)),
    "q_mix_temperature" -> ((s: SparkSession, d: String) => DataQuality.mixTemperature(s, d)),
    "q_length_buckets" -> (DataQuality.lengthBuckets _),
    // round-8 additions: moment statistics, integer anomaly flags,
    // exact-count stratified sampling, entropy/PMI text scores,
    // triangle counting on the candidate graph
    "q_regression" -> (Olap.regression _),
    "q_join_semi" -> (Olap.semiJoin _),
    "q_anomaly" -> (Olap.anomaly _),
    "q_sample_stratified" -> ((s: SparkSession, d: String) =>
      DataQuality.stratifiedSample(s, d)),
    "q_text_entropy" -> (TextOps.tokenEntropy _),
    "q_text_pmi" -> ((s: SparkSession, d: String) => TextOps.pmiCollocations(s, d)),
    "q_triangles" -> (Dedup.triangles _),
    "q_moment_stats" -> (Olap.momentStats _),
    "q_chi2" -> (Olap.chi2 _),
    "q_jaccard_prefix" -> ((s: SparkSession, d: String) => Dedup.jaccardPrefix(s, d)),
    "q_bitmap_overlap" -> (Olap.bitmapOverlap _),
    // marketing attribution, Pareto frontier, association rules
    "q_attribution" -> (Olap.attribution _),
    "q_skyline" -> (Olap.skyline _),
    "q_assoc_rules" -> ((s: SparkSession, d: String) => Olap.assocRules(s, d)),
    "q_textrank" -> ((s: SparkSession, d: String) => TextOps.textrank(s, d)),
    "q_kcore" -> ((s: SparkSession, d: String) => Dedup.kcore(s, d)),
    "q_txtable_delete" -> ((s: SparkSession, d: String) =>
      graft.sources.TxTable.deleteGateQuery(s, d)),
    "q_txtable_update" -> ((s: SparkSession, d: String) =>
      graft.sources.TxTable.updateGateQuery(s, d)),
    "q_cusum" -> (Olap.cusum _),
    "q_ewma" -> (Olap.ewma _),
    "q_hits" -> ((s: SparkSession, d: String) => Dedup.hits(s, d)),
    "q_winsorize" -> (Olap.winsorize _),
    "q_mode" -> (Olap.modePerGroup _),
    // round-10 batch: Holt trend, robust MAD outliers, per-domain cap,
    // n-gram novelty, dedup cluster-size audit, conditional MERGE INTO
    "q_holt" -> (Olap.holt _),
    "q_mad" -> (Olap.madOutliers _),
    "q_domain_cap" -> (DataQuality.domainCap _),
    "q_ngram_novelty" -> ((s: SparkSession, d: String) =>
      TextOps.ngramNovelty(s, d)),
    "q_dedup_cluster_sizes" -> (Dedup.clusterSizes _),
    "q_txtable_merge" -> ((s: SparkSession, d: String) =>
      graft.sources.TxTable.mergeIntoGateQuery(s, d)),
    "q_txtable_sql_dml" -> ((s: SparkSession, d: String) =>
      graft.sources.TxTable.sqlDmlGateQuery(s, d)),
    "q_txtable_sql_dml_mor" -> ((s: SparkSession, d: String) =>
      graft.sources.TxTable.sqlDmlGateQuery(s, d, positional = true)),
    "q_txtable_merge_evolve" -> ((s: SparkSession, d: String) =>
      graft.sources.TxTable.mergeEvolveGateQuery(s, d)),
    "q_txtable_tag" -> ((s: SparkSession, d: String) =>
      graft.sources.TxTable.tagGateQuery(s, d)),
    "q_txtable_replace" -> ((s: SparkSession, d: String) =>
      graft.sources.TxTable.replaceGateQuery(s, d)),
    "q_txtable_addcol_default" -> ((s: SparkSession, d: String) =>
      graft.sources.TxTable.addColDefaultGateQuery(s, d)),
    "q_txtable_check" -> ((s: SparkSession, d: String) =>
      graft.sources.TxTable.checkConstraintGateQuery(s, d)),
    "q_txtable_bloom" -> ((s: SparkSession, d: String) =>
      graft.sources.TxTable.bloomGateQuery(s, d)),
    "q_bpe_fertility" -> ((s: SparkSession, d: String) =>
      TextOps.bpeFertility(s, d)),
    "q_asof_forward" -> ((s: SparkSession, d: String) =>
      Olap.asofForward(s, d)),
    "q_asof_nearest" -> ((s: SparkSession, d: String) =>
      Olap.asofNearest(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracles.all
}

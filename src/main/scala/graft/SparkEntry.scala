package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) + §7 (plan). */
object SparkEntry {

  /** Flagship on /root/testdata/sf0.001 (driver smoke-checks rows>0): the
    * full curation pipeline — exact dedup → MinHash-LSH near-dup decisions →
    * quality filter → per-language corpus stats. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.curate(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.A relational / OLAP core
    "q1_agg"            -> (Relational.q1Agg _),
    "q2_filter_project" -> (Relational.q2FilterProject _),
    "q3_join_agg"       -> (Relational.q3JoinAgg _),
    "q5_multi_join"     -> (Relational.q5MultiJoin _),
    "q6_selective_agg"  -> (Relational.q6SelectiveAgg _),
    "q_sort_limit"      -> (Relational.qSortLimit _),
    "q_distinct_agg"    -> (Relational.qDistinctAgg _),
    "q_approx_distinct" -> (Relational.qApproxDistinct _),
    "q_window_rank"     -> (Relational.qWindowRank _),
    "q_window_running"  -> (Relational.qWindowRunning _),
    "q_rollup"          -> (Relational.qRollup _),
    "q_grouping_sets"   -> (Relational.qGroupingSets _),
    "q_semi_join"       -> (Relational.qSemiJoin _),
    "q_anti_join"       -> (Relational.qAntiJoin _),
    "q_outer_join"      -> (Relational.qOuterJoin _),
    "q_union_all"       -> (Relational.qUnionAll _),
    "q_case_pivot"      -> (Relational.qCasePivot _),
    "q_having"          -> (Relational.qHaving _),
    "q_scalar_subquery" -> (Relational.qScalarSubquery _),
    "q_string_funcs"    -> (Relational.qStringFuncs _),
    "q_date_funcs"      -> (Relational.qDateFuncs _),
    "q_pivot"      -> (Relational2.qPivot _),
    "q_cube"       -> (Relational2.qCube _),
    "q_intersect"  -> (Relational2.qIntersect _),
    "q_except"     -> (Relational2.qExcept _),
    "q_percentile" -> (Relational2.qPercentile _),
    "q_histogram"  -> (Relational2.qHistogram _),
    "q_correlated" -> (Relational2.qCorrelated _),
    "q_range_join" -> (Relational2.qRangeJoin _),
    "q_salted_join" -> (Joins.qSaltedJoin _),
    "q_topk_group"  -> (TopK.qTopkGroup _),
    "q_approx_percentile" -> (Relational2.qApproxPercentile _),
    "q_sample_stratified" -> (Relational2.qSampleStratified _),
    // §2.B event-stream analytics
    "q_evt_tumbling"     -> (Events.qEvtTumbling _),
    "q_evt_sessionize"   -> (Events.qEvtSessionize _),
    "q_evt_asof"         -> (Events.qEvtAsof _),
    "q_evt_dedup_latest" -> (Events.qEvtDedupLatest _),
    "q_evt_json"         -> (Events.qEvtJson _),
    "q_evt_user_stats"   -> (Events.qEvtUserStats _),
    "q_evt_geo_enrich"   -> (Events.qEvtGeoEnrich _),
    "q_evt_checksum"     -> (Events.qEvtChecksum _),
    "q_evt_funnel"       -> (Events.qEvtFunnel _),
    "q_evt_session_window" -> (Events.qEvtSessionWindow _),
    "q_evt_sliding"      -> (Events.qEvtSliding _),
    "q_evt_moving_avg"   -> (Events.qEvtMovingAvg _),
    "q_evt_zscore"       -> (Events.qEvtZscore _),
    "q_evt_peaks"        -> (Events.qEvtPeaks _),
    // §2.C text analysis
    "q_doc_tokens"      -> (TextOps.qDocTokens _),
    "q_doc_quality"     -> (TextOps.qDocQuality _),
    "q_doc_langid"      -> (TextOps.qDocLangid _),
    "q_doc_fingerprint" -> (TextOps.qDocFingerprint _),
    "q_doc_ngrams"      -> (TextOps.qDocNgrams _),
    "q_doc_tfidf"       -> (TextOps.qDocTfidf _),
    // §2.D dedup family
    "q_dedup_exact"   -> (Dedup.qDedupExact _),
    "q_dedup_jaccard" -> (Dedup.qDedupJaccard _),
    "q_dedup_minhash" -> (Dedup.qDedupMinhash _),
    "q_dedup_simhash" -> (Dedup.qDedupSimhash _),
    "q_dedup_embed"   -> (Dedup.qDedupEmbed _),
    "q_dedup_clusters" -> (Dedup.dupClusters _),
    // §2.E similarity search
    "q_ann_brute" -> (Similarity.qAnnBrute _),
    "q_ann_lsh"   -> (Similarity.qAnnLsh _),
    "q_ann_ivf"   -> (Similarity.qAnnIvf _),
  )

  /** DuckDB-equivalent SQL for the driver's oracle compare. Keys omitted
    * here get a weaker rows-only check (see SURVEY.md §2 [rows] marks). */
  def oracleSql: Map[String, String] = Map(
    "q1_agg"            -> Relational.q1AggSql,
    "q2_filter_project" -> Relational.q2FilterProjectSql,
    "q3_join_agg"       -> Relational.q3JoinAggSql,
    "q5_multi_join"     -> Relational.q5MultiJoinSql,
    "q6_selective_agg"  -> Relational.q6SelectiveAggSql,
    "q_sort_limit"      -> Relational.qSortLimitSql,
    "q_distinct_agg"    -> Relational.qDistinctAggSql,
    "q_window_rank"     -> Relational.qWindowRankSql,
    "q_window_running"  -> Relational.qWindowRunningSql,
    "q_rollup"          -> Relational.qRollupSql,
    "q_grouping_sets"   -> Relational.qGroupingSetsSql,
    "q_semi_join"       -> Relational.qSemiJoinSql,
    "q_anti_join"       -> Relational.qAntiJoinSql,
    "q_outer_join"      -> Relational.qOuterJoinSql,
    "q_union_all"       -> Relational.qUnionAllSql,
    "q_case_pivot"      -> Relational.qCasePivotSql,
    "q_having"          -> Relational.qHavingSql,
    "q_scalar_subquery" -> Relational.qScalarSubquerySql,
    "q_string_funcs"    -> Relational.qStringFuncsSql,
    "q_date_funcs"      -> Relational.qDateFuncsSql,
    "q_pivot"      -> Relational2.qPivotSql,
    "q_cube"       -> Relational2.qCubeSql,
    "q_intersect"  -> Relational2.qIntersectSql,
    "q_except"     -> Relational2.qExceptSql,
    "q_percentile" -> Relational2.qPercentileSql,
    "q_histogram"  -> Relational2.qHistogramSql,
    "q_correlated" -> Relational2.qCorrelatedSql,
    "q_range_join" -> Relational2.qRangeJoinSql,
    "q_salted_join" -> Joins.qSaltedJoinSql,
    "q_topk_group"  -> TopK.qTopkGroupSql,
    "q_evt_tumbling"     -> Events.qEvtTumblingSql,
    "q_evt_sessionize"   -> Events.qEvtSessionizeSql,
    "q_evt_asof"         -> Events.qEvtAsofSql,
    "q_evt_dedup_latest" -> Events.qEvtDedupLatestSql,
    "q_evt_json"         -> Events.qEvtJsonSql,
    "q_evt_user_stats"   -> Events.qEvtUserStatsSql,
    "q_evt_geo_enrich"   -> Events.qEvtGeoEnrichSql,
    "q_evt_funnel"       -> Events.qEvtFunnelSql,
    "q_evt_session_window" -> Events.qEvtSessionWindowSql,
    "q_evt_sliding"      -> Events.qEvtSlidingSql,
    "q_evt_moving_avg"   -> Events.qEvtMovingAvgSql,
    "q_evt_zscore"       -> Events.qEvtZscoreSql,
    "q_evt_peaks"        -> Events.qEvtPeaksSql,
    "q_doc_tokens"      -> TextOps.qDocTokensSql,
    "q_doc_quality"     -> TextOps.qDocQualitySql,
    "q_doc_langid"      -> TextOps.qDocLangidSql,
    "q_doc_ngrams"      -> TextOps.qDocNgramsSql,
    "q_dedup_exact"   -> Dedup.qDedupExactSql,
    "q_dedup_jaccard" -> Dedup.qDedupJaccardSql,
    "q_dedup_embed"   -> Dedup.qDedupEmbedSql,
    "q_ann_brute"     -> Similarity.qAnnBruteSql,
  )
}

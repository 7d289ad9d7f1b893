package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1TopRated(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_top_rated" -> (RelationalQueries.q1TopRated _),
    "q2_top_genres" -> (RelationalQueries.q2TopGenres _),
    "q3_group_concat" -> (RelationalQueries.q3GroupConcat _),
    "q4_by_year" -> (RelationalQueries.q4ByYear _),
    "q5_title_clean" -> (TextQueries.q5TitleClean _),
    "q6_title_candidates" -> (TextQueries.q6TitleCandidates _),
    "q7_field_cleaning" -> (TextQueries.q7FieldCleaning _),
    "q8_strip_diacritics" -> (TextQueries.q8StripDiacritics _),
    "q9_token_explode" -> (EtlOps.q9TokenExplode _),
    "q10_token_dim" -> (EtlOps.q10TokenDim _),
    "q11_junction" -> (EtlOps.q11Junction _),
    "q12_upsert_latest" -> (EtlOps.q12UpsertLatest _),
    "q13_check_violations" -> (EtlOps.q13CheckViolations _),
    "q14_table_stats" -> (EtlOps.q14TableStats _),
    "q15_candidate_join" -> (CandidateJoin.q15CandidateJoin _),
    "q16_enrichment_join" -> (CandidateJoin.q16EnrichmentJoin _),
    "q17_dedup_exact" -> (Dedup.q17DedupExact _),
    "q18_dedup_minhash" -> (Dedup.q18DedupMinhash _),
    "q19_dedup_simhash" -> (Dedup.q19DedupSimhash _),
    "q20_ngram_jaccard" -> (Dedup.q20NgramJaccard _),
    "q21_embedding_neardup" -> (Dedup.q21EmbeddingNearDup _),
    "q22_cosine_topk" -> (Similarity.q22CosineTopK _),
    "q23_ann_lsh" -> (Similarity.q23AnnLsh _),
    "q24_text_stats" -> (TextAnalysis.q24TextStats _),
    "q25_lang_id" -> (TextAnalysis.q25LangId _),
    "q26_token_count" -> (TextAnalysis.q26TokenCount _),
    "q27_fingerprint" -> (TextAnalysis.q27Fingerprint _),
    "q28_multimodal_features" -> (Multimodal.q28MultimodalFeatures _),
    "q29_tumbling_window" -> (graft.streaming.StreamingOps.q29TumblingWindow _),
    "q30_sliding_window" -> (graft.streaming.StreamingOps.q30SlidingWindow _),
    "q31_session_window" -> (graft.streaming.StreamingOps.q31SessionWindow _),
    "q32_set_ops" -> (SetAndJsonQueries.q32SetOps _),
    "q33_json_extract" -> (SetAndJsonQueries.q33JsonExtract _),
    "q34_sql_surface" -> (SetAndJsonQueries.q34SqlSurface _),
    "q35_ivf_ann" -> (Similarity.q35IvfAnn _),
    "q36_approx_distinct" -> (SetAndJsonQueries.q36ApproxDistinct _),
    "q37_window_analytics" -> (SetAndJsonQueries.q37WindowAnalytics _),
    "q38_repetition" -> (TextAnalysis.q38Repetition _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_top_rated" -> RelationalQueries.q1OracleSql,
    "q2_top_genres" -> RelationalQueries.q2OracleSql,
    "q3_group_concat" -> RelationalQueries.q3OracleSql,
    "q4_by_year" -> RelationalQueries.q4OracleSql,
    "q5_title_clean" -> TextQueries.q5OracleSql,
    "q6_title_candidates" -> TextQueries.q6OracleSql,
    "q7_field_cleaning" -> TextQueries.q7OracleSql,
    "q8_strip_diacritics" -> TextQueries.q8OracleSql,
    "q9_token_explode" -> EtlOps.q9OracleSql,
    "q10_token_dim" -> EtlOps.q10OracleSql,
    "q11_junction" -> EtlOps.q11OracleSql,
    "q12_upsert_latest" -> EtlOps.q12OracleSql,
    "q13_check_violations" -> EtlOps.q13OracleSql,
    "q14_table_stats" -> EtlOps.q14OracleSql,
    "q15_candidate_join" -> CandidateJoin.q15OracleSql,
    "q16_enrichment_join" -> CandidateJoin.q16OracleSql,
    "q17_dedup_exact" -> Dedup.q17OracleSql,
    "q18_dedup_minhash" -> Dedup.q18OracleSql,
    "q19_dedup_simhash" -> Dedup.q19OracleSql,
    "q20_ngram_jaccard" -> Dedup.q20OracleSql,
    "q21_embedding_neardup" -> Dedup.q21OracleSql,
    "q22_cosine_topk" -> Similarity.q22OracleSql,
    "q23_ann_lsh" -> Similarity.q23OracleSql,
    "q24_text_stats" -> TextAnalysis.q24OracleSql,
    "q25_lang_id" -> TextAnalysis.q25OracleSql,
    "q26_token_count" -> TextAnalysis.q26OracleSql,
    "q27_fingerprint" -> TextAnalysis.q27OracleSql,
    // q28: mapPartitions decode stub not SQL-expressible -> rows-only.
    "q29_tumbling_window" -> graft.streaming.StreamingOps.q29OracleSql,
    "q30_sliding_window" -> graft.streaming.StreamingOps.q30OracleSql,
    "q31_session_window" -> graft.streaming.StreamingOps.q31OracleSql,
    "q32_set_ops" -> SetAndJsonQueries.q32OracleSql,
    "q33_json_extract" -> SetAndJsonQueries.q33OracleSql,
    "q34_sql_surface" -> SetAndJsonQueries.q34OracleSql,
    "q35_ivf_ann" -> Similarity.q35OracleSql,
    "q36_approx_distinct" -> SetAndJsonQueries.q36OracleSql,
    "q37_window_analytics" -> SetAndJsonQueries.q37OracleSql,
    "q38_repetition" -> TextAnalysis.q38OracleSql,
  )
}

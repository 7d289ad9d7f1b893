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
  )
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextNorm

/** Query entries exercising the title-normalization library (SURVEY.md
  * §2.7) against the DuckDB oracle. The `documents`/`part` tables carry no
  * movie-title markup, so each query first derives a deterministic
  * "title" column from table data (same construction on both sides) and
  * then runs the library over it — every F-function executes inside
  * whole-stage codegen, scan-pruned to the two columns used.
  */
object TextQueries {

  /** Deterministic synthetic title: text prefix + per-doc decoration that
    * exercises trailing-article move (doc_id%3==0), parenthetical
    * alternates (doc_id%3==1), and the trailing `(yyyy)` strip (all rows).
    */
  private[operators] def syntheticTitle(docId: Column, text: Column): Column = {
    val suffix = when(docId % 3 === 0, lit(", The"))
      .when(docId % 3 === 1, lit(" (a.k.a. alias)"))
      .otherwise(lit(""))
    concat(substring(text, 1, 40), suffix,
      lit(" ("), (lit(1970) + docId % 50).cast("string"), lit(")"))
  }

  private[operators] lazy val syntheticTitleSql: String =
    """substr(text, 1, 40) ||
      |       CASE WHEN doc_id % 3 = 0 THEN ', The'
      |            WHEN doc_id % 3 = 1 THEN ' (a.k.a. alias)'
      |            ELSE '' END ||
      |       ' (' || CAST(1970 + doc_id % 50 AS VARCHAR) || ')'""".stripMargin

  /** q5 — F2/F3/F4/F5/F6/F8/F9 composed: base-clean, full clean, year and
    * alternate extraction over every document (reference `etl.py:62-87`,
    * `etl.py:216-223`, `etl.py:162`).
    */
  def q5TitleClean(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documentsFanned(spark, dir)
    val title = syntheticTitle(d("doc_id"), d("text"))
    d.select(
        d("doc_id"),
        title.as("title"),
        TextNorm.baseClean(title).as("base_title"),
        TextNorm.fullTitleClean(title).as("clean_title"),
        TextNorm.extractYear(title).as("release_year"),
        TextNorm.extractParentheticalAlternate(TextNorm.baseClean(title))
          .as("alt_title"))
      .orderBy("doc_id")
  }

  lazy val q5OracleSql: String =
    s"""WITH t AS (
      |  SELECT doc_id, $syntheticTitleSql AS title FROM documents
      |), b AS (
      |  SELECT doc_id, title,
      |         trim(regexp_replace(
      |           regexp_replace(
      |             regexp_replace(
      |               regexp_replace(title, '\\s*\\(\\d{4}\\)\\s*$$', ''),
      |               '^\\s+|\\s+$$', '', 'g'),
      |             '^[ "'']+|[ "'']+$$', '', 'g'),
      |           '\\s+', ' ', 'g')) AS base_title
      |  FROM t
      |), m AS (
      |  SELECT doc_id, title, base_title,
      |         regexp_replace(
      |           CASE WHEN regexp_matches(base_title, '^(.*),\\s*(The|A|An)$$', 'i')
      |                THEN regexp_replace(base_title, '^(.*),\\s*(The|A|An)$$', '\\2 \\1', 'i')
      |                ELSE base_title END,
      |           '^\\s+|\\s+$$', '', 'g') AS moved
      |  FROM b
      |), p AS (
      |  SELECT doc_id, title, base_title,
      |         trim(regexp_replace(
      |           regexp_replace(
      |             regexp_replace(moved,
      |               '\\s*\\(.*?(a\\.k\\.a\\.|aka|original|original title|la|le|der|el|cite|cité|versión|version).*?\\)\\s*',
      |               ' ', 'ig'),
      |             '\\s*\\([^)]*\\)\\s*', ' ', 'g'),
      |           '\\s+', ' ', 'g')) AS noparen
      |  FROM m
      |)
      |SELECT doc_id, title, base_title,
      |       trim(regexp_replace(strip_accents(noparen), '\\s+', ' ', 'g')) AS clean_title,
      |       TRY_CAST(NULLIF(regexp_extract(title, '\\((\\d{4})\\)', 1), '') AS INTEGER) AS release_year,
      |       CASE WHEN regexp_matches(base_title, '\\([^)]+\\)')
      |             AND length(regexp_replace(regexp_extract(base_title, '\\(([^)]+)\\)', 1), '^\\s+|\\s+$$', '', 'g')) <= 30
      |             AND NOT contains(regexp_replace(regexp_extract(base_title, '\\(([^)]+)\\)', 1), '^\\s+|\\s+$$', '', 'g'), ',')
      |            THEN regexp_replace(regexp_extract(base_title, '\\(([^)]+)\\)', 1), '^\\s+|\\s+$$', '', 'g')
      |       END AS alt_title
      |FROM p ORDER BY doc_id""".stripMargin

  /** q6 — F7+G2: the candidate list exploded with its priority (reference
    * `etl.py:89-111`, consumed positionally by the enrichment loop at
    * `etl.py:123`). `posexplode` is the Spark-native `Generator` for the
    * reference's ordered-candidate iteration.
    */
  def q6TitleCandidates(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documentsFanned(spark, dir)
    val title = syntheticTitle(d("doc_id"), d("text"))
    d.select(d("doc_id"),
        posexplode(TextNorm.titleCandidates(title)))
      .withColumnRenamed("pos", "priority")
      .withColumnRenamed("col", "candidate")
      .orderBy("doc_id", "priority")
  }

  lazy val q6OracleSql: String =
    s"""WITH t AS (
      |  SELECT doc_id, $syntheticTitleSql AS title FROM documents
      |), b AS (
      |  SELECT doc_id,
      |         trim(regexp_replace(
      |           regexp_replace(
      |             regexp_replace(
      |               regexp_replace(title, '\\s*\\(\\d{4}\\)\\s*$$', ''),
      |               '^\\s+|\\s+$$', '', 'g'),
      |             '^[ "'']+|[ "'']+$$', '', 'g'),
      |           '\\s+', ' ', 'g')) AS base
      |  FROM t
      |), c AS (
      |  SELECT doc_id, base,
      |         regexp_replace(
      |           CASE WHEN regexp_matches(base, '^(.*),\\s*(The|A|An)$$', 'i')
      |                THEN regexp_replace(base, '^(.*),\\s*(The|A|An)$$', '\\2 \\1', 'i')
      |                ELSE base END,
      |           '^\\s+|\\s+$$', '', 'g') AS moved,
      |         trim(regexp_replace(
      |           regexp_replace(
      |             regexp_replace(base,
      |               '\\s*\\(.*?(a\\.k\\.a\\.|aka|original|original title|la|le|der|el|cite|cité|versión|version).*?\\)\\s*',
      |               ' ', 'ig'),
      |             '\\s*\\([^)]*\\)\\s*', ' ', 'g'),
      |           '\\s+', ' ', 'g')) AS removed_paren,
      |         CASE WHEN regexp_matches(base, '\\([^)]+\\)')
      |               AND length(regexp_replace(regexp_extract(base, '\\(([^)]+)\\)', 1), '^\\s+|\\s+$$', '', 'g')) <= 30
      |               AND NOT contains(regexp_replace(regexp_extract(base, '\\(([^)]+)\\)', 1), '^\\s+|\\s+$$', '', 'g'), ',')
      |              THEN regexp_replace(regexp_extract(base, '\\(([^)]+)\\)', 1), '^\\s+|\\s+$$', '', 'g')
      |         END AS alt
      |  FROM b
      |), e AS (
      |  SELECT doc_id,
      |         generate_subscripts([moved, removed_paren, alt, base], 1) AS ord,
      |         unnest([moved, removed_paren, alt, base]) AS cand
      |  FROM c
      |), f AS (
      |  SELECT doc_id, cand, MIN(ord) AS ord
      |  FROM e WHERE cand IS NOT NULL AND cand <> ''
      |  GROUP BY doc_id, cand
      |), h AS (
      |  SELECT doc_id, cand, ord, 0 AS phase FROM f
      |  UNION ALL
      |  SELECT doc_id, strip_accents(cand), ord, 1 AS phase FROM f
      |), i AS (
      |  SELECT doc_id, cand, phase, ord,
      |         row_number() OVER (PARTITION BY doc_id, cand ORDER BY phase, ord) AS rn
      |  FROM h
      |), k AS (
      |  SELECT doc_id, phase, ord,
      |         trim(regexp_replace(cand, '\\s+', ' ', 'g')) AS candidate
      |  FROM i WHERE rn = 1
      |)
      |SELECT doc_id,
      |       row_number() OVER (PARTITION BY doc_id ORDER BY phase, ord) - 1 AS priority,
      |       candidate
      |FROM k WHERE candidate <> ''
      |ORDER BY doc_id, priority""".stripMargin

  /** q7 — F10/F11/F13/F14: sentinel-laden formatted fields cleaned to
    * typed columns (reference `etl.py:238-248`, `etl.py:145`,
    * `etl.py:119-121`). Raw strings are built from integer columns only,
    * so both engines parse byte-identical inputs.
    */
  def q7FieldCleaning(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val key = p("p_partkey")
    val size = p("p_size").cast("string")
    val rawBox = when(key % 7 === 0, lit("N/A"))
      .otherwise(concat(lit("$"), key.cast("string"), lit(","), lpad(size, 3, "0")))
    val rawRuntime = when(key % 3 === 0, concat(size, lit(" min")))
      .when(key % 3 === 1, concat(size, lit(" mins")))
      .otherwise(lit("N/A"))
    val rawRating = when(key % 5 === 0, lit("N/A"))
      .otherwise(concat(size, lit("."), (key % 10).cast("string")))
    val rawDirector = when(key % 11 === 0, lit(null)).otherwise(p("p_brand"))
    p.select(
        key.as("partkey"),
        TextNorm.cleanBoxOffice(rawBox).as("box_office"),
        TextNorm.cleanRuntime(rawRuntime).as("runtime_mins"),
        TextNorm.parseRating(rawRating).as("rating"),
        TextNorm.defaultIfNull(rawDirector, "Unknown").as("director"))
      .orderBy("partkey")
  }

  lazy val q7OracleSql: String =
    """WITH raw AS (
      |  SELECT p_partkey AS partkey,
      |         CASE WHEN p_partkey % 7 = 0 THEN 'N/A'
      |              ELSE '$' || CAST(p_partkey AS VARCHAR) || ',' || lpad(CAST(p_size AS VARCHAR), 3, '0') END AS raw_box,
      |         CASE WHEN p_partkey % 3 = 0 THEN CAST(p_size AS VARCHAR) || ' min'
      |              WHEN p_partkey % 3 = 1 THEN CAST(p_size AS VARCHAR) || ' mins'
      |              ELSE 'N/A' END AS raw_runtime,
      |         CASE WHEN p_partkey % 5 = 0 THEN 'N/A'
      |              ELSE CAST(p_size AS VARCHAR) || '.' || CAST(p_partkey % 10 AS VARCHAR) END AS raw_rating,
      |         CASE WHEN p_partkey % 11 = 0 THEN NULL ELSE p_brand END AS raw_director
      |  FROM part
      |), s AS (
      |  SELECT partkey,
      |         regexp_replace(regexp_replace(raw_box, '[$,]', '', 'g'), '^\s+|\s+$', '', 'g') AS sbox,
      |         regexp_replace(raw_runtime, '^\s+|\s+$', '', 'g') AS srt,
      |         raw_rating, raw_director
      |  FROM raw
      |)
      |SELECT partkey,
      |       CASE WHEN regexp_matches(sbox, '^\d+$') THEN CAST(sbox AS BIGINT) END AS box_office,
      |       TRY_CAST(NULLIF(regexp_extract(srt, '^(\d+)', 1), '') AS INTEGER) AS runtime_mins,
      |       CASE WHEN regexp_matches(raw_rating, '^[0-9]+(\.[0-9]+)?$') THEN CAST(raw_rating AS DOUBLE) END AS rating,
      |       COALESCE(raw_director, 'Unknown') AS director
      |FROM s ORDER BY partkey""".stripMargin

  /** q8 — F1 round-trip: accent ASCII vowels via `translate`, strip with
    * the native [[graft.functions.StripDiacritics]] expression, and prove
    * the round-trip restores the original text (reference `etl.py:49-54`;
    * DuckDB counterpart `strip_accents`).
    */
  def q8StripDiacritics(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documentsFanned(spark, dir)
    val accented = translate(d("text"), "aeiou", "áéíóü")
    val stripped = TextNorm.stripDiacritics(accented)
    d.select(
        d("doc_id"),
        stripped.as("stripped"),
        (stripped === d("text")).as("roundtrip"))
      .orderBy("doc_id")
  }

  lazy val q8OracleSql: String =
    """SELECT doc_id,
      |       strip_accents(translate(text, 'aeiou', 'áéíóü')) AS stripped,
      |       strip_accents(translate(text, 'aeiou', 'áéíóü')) = text AS roundtrip
      |FROM documents ORDER BY doc_id""".stripMargin
}

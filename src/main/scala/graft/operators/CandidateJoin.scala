package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** J5 — the candidate-priority enrichment join, the one genuinely
  * non-trivial relational operator in the reference (SURVEY.md §2.3 J5).
  *
  * The reference enriches each movie by trying an *ordered* list of title
  * candidates against OMDb until the first hit (`etl.py:89-111` generates
  * the ordered list, `etl.py:123-150` walks it; a per-row, rate-limited
  * HTTP loop). Re-expressed as a dataflow:
  *
  *   probe(id, candidates[]) ──posexplode──▶ (id, priority, cand)
  *        ⋈ broadcast(lookup) on cand = key            (all hits at once)
  *        groupBy(id).agg(min(struct(priority, payload)))   (first wins)
  *        probe left-join best                     (miss ⇒ default record)
  *
  * `min(struct(...))` rather than `row_number`: a struct min is an
  * ordinary aggregate with map-side partial aggregation, so the
  * "first-hit-wins" reduction happens before the shuffle — at 100 TB the
  * explode's ×k rows never cross the network unreduced. The lookup side
  * broadcasts when it is dimension-sized (the metadata table analog);
  * Catalyst falls back to a shuffled hash join when it is not.
  */
object CandidateJoin {

  /** Resolve `probe` rows against `lookup` by candidate priority.
    *
    * @param probe         rows carrying `idCol` (unique id) and
    *                      `candidatesCol` (`array<string>`, highest
    *                      priority first — e.g. TextNorm.titleCandidates)
    * @param lookup        key column `keyCol` + payload columns; keys must
    *                      be unique (dedup upstream)
    * @return probe ids + `matched_priority` (null on miss) + lookup
    *         payload columns (null on miss, J4 left-outer semantics)
    */
  def resolve(probe: DataFrame, idCol: String, candidatesCol: String,
      lookup: DataFrame, keyCol: String): DataFrame = {
    val payloadCols = lookup.columns.filterNot(_ == keyCol)
    val exploded = probe.select(col(idCol),
      posexplode(col(candidatesCol)).as(Seq("__priority", "__cand")))
    val hits = exploded.join(broadcast(lookup),
      exploded("__cand") === lookup(keyCol))
    val packed = struct(
      col("__priority") +: payloadCols.toIndexedSeq.map(col): _*)
    val best = hits.groupBy(col(idCol))
      .agg(min(packed).as("__best"))
      .select((col(idCol) +: col("__best.__priority") +:
        payloadCols.map(c => col(s"__best.$c")).toSeq): _*)
      .withColumnRenamed("__priority", "matched_priority")
    probe.drop(candidatesCol).join(best, Seq(idCol), "left")
  }

  /** q15 — J5/J4 instantiation over `documents`: the lookup table is a
    * two-granularity key dictionary (2-word keys from even docs — the
    * "title+year" analog — and 1-word keys from every third doc — the
    * bare-"title" analog); every document probes with its own
    * [2-word, 1-word] candidate list, first hit wins, misses take the
    * default record (reference `etl.py:118-121`).
    */
  def q15CandidateJoin(spark: SparkSession, dir: String): DataFrame = {
    // NOT fanned: the per-doc work here is two anchored regex extracts —
    // too light to amortize the repartition (measured 0.36->1.5 s fanned)
    val d = Tables.documents(spark, dir)
    val w2key = regexp_extract(col("text"), "^(\\S+\\s+\\S+)", 1)
    val w1key = regexp_extract(col("text"), "^(\\S+)", 1)

    val lookup = d.filter(col("doc_id") % 2 === 0)
      .select(w2key.as("key"), col("doc_id"), col("source"))
      .unionByName(
        d.filter(col("doc_id") % 3 === 0)
          .select(w1key.as("key"), col("doc_id"), col("source")))
      .filter(col("key") =!= "")
      .groupBy("key")
      .agg(min(col("doc_id")).as("meta_id"),
        count(lit(1)).as("meta_n"))

    val probe = d.select(col("doc_id"),
      array(w2key, w1key).as("candidates"))

    resolve(probe, "doc_id", "candidates", lookup, "key")
      .select(col("doc_id"),
        col("matched_priority"),
        coalesce(col("meta_id"), lit(-1L)).as("meta_id"),
        coalesce(col("meta_n"), lit(0L)).as("meta_n"))
      .orderBy("doc_id")
  }

  lazy val q15OracleSql: String =
    """WITH keys AS (
      |  SELECT regexp_extract(text, '^(\S+\s+\S+)', 1) AS key, doc_id
      |  FROM documents WHERE doc_id % 2 = 0
      |  UNION ALL
      |  SELECT regexp_extract(text, '^(\S+)', 1) AS key, doc_id
      |  FROM documents WHERE doc_id % 3 = 0
      |), lookup AS (
      |  SELECT key, MIN(doc_id) AS meta_id, COUNT(*) AS meta_n
      |  FROM keys WHERE key <> '' GROUP BY key
      |), cand AS (
      |  SELECT doc_id,
      |         generate_subscripts([regexp_extract(text, '^(\S+\s+\S+)', 1),
      |                              regexp_extract(text, '^(\S+)', 1)], 1) - 1 AS priority,
      |         unnest([regexp_extract(text, '^(\S+\s+\S+)', 1),
      |                 regexp_extract(text, '^(\S+)', 1)]) AS c
      |  FROM documents
      |), hits AS (
      |  SELECT cand.doc_id, cand.priority, lookup.meta_id, lookup.meta_n,
      |         row_number() OVER (PARTITION BY cand.doc_id ORDER BY cand.priority) AS rn
      |  FROM cand JOIN lookup ON cand.c = lookup.key
      |)
      |SELECT d.doc_id,
      |       h.priority AS matched_priority,
      |       COALESCE(h.meta_id, -1) AS meta_id,
      |       COALESCE(h.meta_n, 0) AS meta_n
      |FROM documents d
      |LEFT JOIN (SELECT * FROM hits WHERE rn = 1) h ON d.doc_id = h.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** q16 — the complete reference enrichment path: F7's real candidate
    * generator feeding J5, against a metadata table keyed by the F8
    * normal form (reference `etl.py:164-171`: per-movie candidate loop →
    * OMDb; here the "OMDb" is a broadcast dictionary of cleaned titles
    * from even-numbered documents). Different documents match at different
    * priorities: moved-article titles hit at 0, a.k.a.-decorated ones at 1
    * — exactly the reference's fallback ladder.
    */
  def q16EnrichmentJoin(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextNorm
    val d = Tables.documentsFanned(spark, dir)
    val title = TextQueries.syntheticTitle(d("doc_id"), d("text"))
    val lookup = d.filter(col("doc_id") % 2 === 0)
      .select(TextNorm.fullTitleClean(title).as("key"), col("doc_id"))
      .groupBy("key").agg(min(col("doc_id")).as("meta_id"))
    val probe = d.select(col("doc_id"),
      TextNorm.titleCandidates(title).as("candidates"))
    resolve(probe, "doc_id", "candidates", lookup, "key")
      .select(col("doc_id"),
        col("matched_priority"),
        coalesce(col("meta_id"), lit(-1L)).as("meta_id"))
      .orderBy("doc_id")
  }

  lazy val q16OracleSql: String =
    s"""WITH t AS (
      |  SELECT doc_id, ${TextQueries.syntheticTitleSql} AS title FROM documents
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
      |), cands AS (
      |  SELECT doc_id,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY phase, ord) - 1 AS priority,
      |         candidate
      |  FROM k WHERE candidate <> ''
      |), mchain AS (
      |  SELECT doc_id, base,
      |         regexp_replace(
      |           CASE WHEN regexp_matches(base, '^(.*),\\s*(The|A|An)$$', 'i')
      |                THEN regexp_replace(base, '^(.*),\\s*(The|A|An)$$', '\\2 \\1', 'i')
      |                ELSE base END,
      |           '^\\s+|\\s+$$', '', 'g') AS moved
      |  FROM b
      |), pchain AS (
      |  SELECT doc_id,
      |         trim(regexp_replace(
      |           regexp_replace(
      |             regexp_replace(moved,
      |               '\\s*\\(.*?(a\\.k\\.a\\.|aka|original|original title|la|le|der|el|cite|cité|versión|version).*?\\)\\s*',
      |               ' ', 'ig'),
      |             '\\s*\\([^)]*\\)\\s*', ' ', 'g'),
      |           '\\s+', ' ', 'g')) AS noparen
      |  FROM mchain
      |), lookup AS (
      |  SELECT trim(regexp_replace(strip_accents(noparen), '\\s+', ' ', 'g')) AS key,
      |         MIN(doc_id) AS meta_id
      |  FROM pchain WHERE doc_id % 2 = 0
      |  GROUP BY 1
      |), hits AS (
      |  SELECT cands.doc_id, cands.priority, lookup.meta_id,
      |         row_number() OVER (PARTITION BY cands.doc_id ORDER BY cands.priority) AS rn
      |  FROM cands JOIN lookup ON cands.candidate = lookup.key
      |)
      |SELECT d.doc_id,
      |       h.priority AS matched_priority,
      |       COALESCE(h.meta_id, -1) AS meta_id
      |FROM documents d
      |LEFT JOIN (SELECT * FROM hits WHERE rn = 1) h ON d.doc_id = h.doc_id
      |ORDER BY d.doc_id""".stripMargin
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorOps.{round6, round6Sql}

/** Lexical retrieval — the keyword-search complement of the embedding
  * similarity family (q22/q23/q35): BM25-style scored top-k over an
  * inverted term index. What a corpus exploration UI or a hard-negative
  * mining job runs against the document store.
  */
object Search {

  /** The benchmark query terms (a fixed conjunction-free bag; a real
    * deployment parameterizes [[keywordSearch]]).
    */
  private val QueryTerms = Seq("data", "pipeline", "quality")

  /** Result count. */
  private val TopK = 20

  /** BM25 term-frequency saturation constant (k₁; no length
    * normalization — the corpus is near-uniform doc length, and dropping
    * the b-term keeps the score a pure rational function, bit-exact
    * across engines).
    */
  private val K1 = 1.5

  /** The corpus document count as a 1-row `(n_total)` frame: counted
    * over the standing digest artifact when fresh (doc-grain, no
    * documents scan — the lexical family's artifact-mode plans touch
    * the documents table zero times), else over the documents scan
    * (metadata-only count either way).
    */
  private def docCount(spark: SparkSession, dir: String): DataFrame =
    (if (graft.Artifacts.isMaterialized(spark, dir,
        graft.Artifacts.DocHashesName))
      graft.Artifacts.docHashes(spark, dir)
    else Tables.documents(spark, dir))
      .agg(count(lit(1)).as("n_total"))

  /** The FULL `(doc_id, token, tf)` postings frame — the standing
    * `token_postings` artifact when the corpus fingerprint resolves,
    * else ONE checkpointed corpus tokenize. The resolution point for
    * consumers that reference the whole frame more than once (q107's
    * three passes, q118's score + df sides): inline, the explode runs
    * once per query instead of once per reference. Term-bounded
    * single-pass consumers use [[restrictedTf]] instead, which keeps
    * the filter below the aggregate in its inline plan.
    */
  private[operators] def postingsOrInline(spark: SparkSession, dir: String): DataFrame =
    graft.Artifacts.tokenPostings(spark, dir).getOrElse(
      graft.Checkpoints.checkpoint(
        Tables.documentsFanned(spark, dir).select(col("doc_id"),
            explode(Dedup.tokens(col("text"))).as("token"))
          .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))))

  /** The `(doc_id, token, tf)` term-frequency rows restricted to
    * `restrict` — the standing `token_postings` inverted index when the
    * corpus fingerprint resolves (per-query work = a term-bounded
    * filter of the artifact), else the inline filter-before-aggregate
    * explode. The ONE resolution point for q66 and q102's lexical leg,
    * so artifact-vs-inline can never drift between them. `restrict`
    * must be applied before the aggregate in the inline form — it runs
    * against the exploded `(doc_id, token)` rows, tf not yet counted.
    */
  private def restrictedTf(spark: SparkSession, dir: String,
      restrict: DataFrame => DataFrame): DataFrame =
    graft.Artifacts.tokenPostings(spark, dir) match {
      case Some(p) => restrict(p).select("doc_id", "token", "tf")
      case None => restrict(
        Tables.documents(spark, dir).select(col("doc_id"),
          explode(Dedup.tokens(col("text"))).as("token")))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    }

  /** q66 — BM25-style keyword search: score =
    * Σ_terms idf(t) · tf/(tf + k₁) with the rational idf
    * `(N − df + 0.5)/(df + 0.5)` (Robertson–Sparck Jones without the
    * log: the log is a monotone reshaping of per-term weights that pure
    * double arithmetic reproduces bit-for-bit across engines, where
    * `ln` is only libm-identical by luck — determinism is worth more
    * here than the classical scale). Top-[[TopK]] by score, doc_id
    * tie-break.
    *
    * Scale shape: joins the standing `token_postings` inverted index
    * (`graft.Artifacts`) when materialized — per-query work is a
    * term-bounded filter of doc-grain state, zero documents scans
    * (plan-guarded) — and falls back to the filter-before-aggregate
    * explode inline, whose scan output is (docs containing a term) ×
    * (terms), never the corpus vocabulary. tf/df aggregates are
    * map-side partial; the ranking is `TakeOrderedAndProject`.
    */
  def q66KeywordSearch(spark: SparkSession, dir: String): DataFrame =
    keywordSearch(spark, dir, QueryTerms)

  /** q66 under caller-chosen terms. */
  def keywordSearch(spark: SparkSession, dir: String,
      terms: Seq[String]): DataFrame = {
    val tf = restrictedTf(spark, dir, _.filter(col("token").isin(terms: _*)))
    bm25Score(tf, docCount(spark, dir), Seq("doc_id"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(TopK)
  }

  /** The ONE BM25 scorer behind q66, q101, and q102's lexical leg: `tf`
    * is `(keys…, token, tf)`; df derives from it (result-set document
    * frequency), `nTotal` is a broadcast 1-row `(n_total)` frame, and
    * the output is `(keys…, score, n_terms_hit)` with the rational-idf
    * sum rounded for cross-engine hashing. A k₁ tweak or scoring fix
    * lands once.
    */
  private def bm25Score(tf: DataFrame, nTotal: DataFrame,
      keys: Seq[String]): DataFrame = {
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val idf = (col("n_total") - col("df") + 0.5) / (col("df") + 0.5)
    tf.join(broadcast(df), "token")
      .crossJoin(broadcast(nTotal))
      .withColumn("w",
        idf * (col("tf").cast("double") / (col("tf") + K1)))
      .groupBy(keys.map(col): _*)
      .agg(round6(sum(col("w"))).as("score"),
        count(lit(1)).as("n_terms_hit"))
  }

  /** The scorer's SUM expression as SQL — interpolated by all three
    * search oracles from the same [[K1]]. Margin bars are stripped by
    * the ENCLOSING oracle's `stripMargin`, so this fragment must embed
    * them raw (no stripMargin here).
    */
  private def bm25SumSql: String =
    s"""SUM(((n_total - df + 0.5) / (df + 0.5))
      |         * (CAST(tf AS DOUBLE) / (tf + $K1)))"""

  lazy val q66OracleSql: String = {
    val termList = QueryTerms.map(t => s"('$t')").mkString(", ")
    s"""WITH terms(token) AS (VALUES $termList),
      |tok AS (
      |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, t.token, COUNT(*) AS tf
      |  FROM tok JOIN terms t ON tok.token = t.token
      |  GROUP BY 1, 2
      |), df AS (
      |  SELECT token, COUNT(*) AS df FROM tf GROUP BY token
      |), n AS (
      |  SELECT COUNT(*) AS n_total FROM documents
      |)
      |SELECT tf.doc_id,
      |       ${round6Sql(bm25SumSql)} AS score,
      |       COUNT(*) AS n_terms_hit
      |FROM tf JOIN df ON tf.token = df.token, n
      |GROUP BY tf.doc_id, n_total
      |ORDER BY score DESC, doc_id LIMIT $TopK""".stripMargin
  }

  // ---- q101: passage (chunk) retrieval ------------------------------------

  /** q101 — BM25 top-k over CHUNKS instead of documents: the retrieval
    * grain a RAG pipeline actually serves (a 32-token passage, not a
    * whole document — context windows hold passages, and passage-grain
    * scores don't drown a sharp hit inside a long document). Same
    * rational-idf scoring as [[q66KeywordSearch]] with chunk-level
    * statistics (df = chunks containing the term, N = total chunks);
    * chunks come from `Segments.chunkTokenFrame` — the ONE chunk
    * definition shared with q64, scored on the sliced token arrays
    * themselves (never a re-split of joined chunk text).
    *
    * Scale shape: joins the standing `chunk_postings` passage index
    * (`graft.Artifacts`) when materialized — a term-bounded filter of
    * chunk-grain state, with the chunk COUNT derived from the standing
    * whitespace token-count artifact, zero documents scans
    * (plan-guarded). Inline, q64's map-only chunk explode feeds the
    * same filter-before-aggregate index shape as q66 — only (chunks
    * containing a query term) × (terms) survive the explode — and the
    * ranking is `TakeOrderedAndProject`.
    */
  def q101ChunkSearch(spark: SparkSession, dir: String): DataFrame = {
    // chunk COUNT by arithmetic (ceil(n_tok/stride) per doc), not a
    // second tokenize+posexplode of the corpus just to count rows —
    // equal to the chunk frame's cardinality by construction. The
    // arithmetic runs over the standing whitespace token counts when
    // fresh (whose n_tokens column is definitionally size(tokens)),
    // else over the documents scan.
    def chunksOf(nTok: Column): Column = when(nTok > 0,
      floor((nTok + lit(Segments.ChunkStride - 1)) /
        lit(Segments.ChunkStride.toDouble)).cast("long"))
      .otherwise(0L)
    val nChunks = graft.Artifacts.tokenCounts(spark, dir,
        graft.functions.Tokenizer.Whitespace) match {
      case Some(tc) => tc.agg(
        coalesce(sum(chunksOf(col("n_tokens"))), lit(0L)).as("n_total"))
      case None => Tables.documents(spark, dir).agg(
        coalesce(sum(chunksOf(size(Dedup.tokens(col("text"))))), lit(0L))
          .as("n_total"))
    }
    val tf = graft.Artifacts.chunkPostings(spark, dir) match {
      case Some(cp) => cp.filter(col("token").isin(QueryTerms: _*))
        .select("doc_id", "chunk_id", "token", "tf")
      case None => Segments.chunkTokenFrame(spark, dir)
        .select(col("doc_id"), col("chunk_id"),
          explode(col("ctoks")).as("token"))
        .filter(col("token").isin(QueryTerms: _*))
        .groupBy("doc_id", "chunk_id", "token").agg(count(lit(1)).as("tf"))
    }
    bm25Score(tf, nChunks, Seq("doc_id", "chunk_id"))
      .orderBy(desc("score"), asc("doc_id"), asc("chunk_id"))
      .limit(TopK)
  }

  /** q64's shared chunk CTEs + q66's scoring arithmetic at chunk grain.
    */
  lazy val q101OracleSql: String = {
    val termList = QueryTerms.map(t => s"('$t')").mkString(", ")
    s"""WITH terms(token) AS (VALUES $termList),
      |${Segments.chunkCtesSql},
      |tokc AS (
      |  SELECT doc_id, chunk_id, unnest(ctoks) AS token FROM chunkslice
      |), tf AS (
      |  SELECT doc_id, chunk_id, t.token, COUNT(*) AS tf
      |  FROM tokc JOIN terms t ON tokc.token = t.token
      |  GROUP BY 1, 2, 3
      |), df AS (
      |  SELECT token, COUNT(*) AS df FROM tf GROUP BY token
      |), n AS (
      |  SELECT COUNT(*) AS n_total FROM chunkslice
      |)
      |SELECT tf.doc_id, CAST(tf.chunk_id AS INTEGER) AS chunk_id,
      |       ${round6Sql(bm25SumSql)} AS score,
      |       COUNT(*) AS n_terms_hit
      |FROM tf JOIN df ON tf.token = df.token, n
      |GROUP BY tf.doc_id, tf.chunk_id, n_total
      |ORDER BY score DESC, doc_id, chunk_id LIMIT $TopK""".stripMargin
  }

  // ---- q102: hybrid lexical+dense retrieval (RRF) -------------------------

  /** RRF rank-discount constant (Cormack et al.'s published k = 60). */
  private val RrfK = 60.0

  /** The hybrid query's probe document (doc_id and vec_id — the
    * integrity contract keeps the two tables id-aligned).
    */
  private val HybridProbe = 0L

  /** Query terms mined from the probe: its [[HybridTerms]] corpus-rarest
    * tokens.
    */
  private val HybridTerms = 3

  /** Per-ranking candidate depth and fused result count. */
  private val HybridTopK = 10

  /** q102 — hybrid related-document retrieval: find documents similar to
    * a probe BOTH lexically and semantically, fused with reciprocal-rank
    * fusion. The production RAG serving pattern (dense-only retrieval
    * misses exact-term matches, lexical-only misses paraphrases; RRF is
    * the standard score-free fusion). The lexical leg mines the probe's
    * [[HybridTerms]] corpus-rarest tokens (rarity from the standing
    * token-frequency artifact when materialized) and runs q66's
    * rational-idf BM25 over them; the dense leg is q22's exact cosine
    * top-k for the same probe; fusion is
    * `Σ 1/(k + rank)` over both rank lists, top-[[HybridTopK]].
    *
    * Scale shape: the term-mining join is (probe's distinct tokens) ×
    * the token-frequency table — probe-bounded, artifact-backed; the
    * lexical leg inherits q66's filter-before-aggregate index shape
    * (only docs containing one of 3 RARE terms survive the explode, so
    * the ranked frame is naturally tiny — its global rank window runs
    * over that small survivor set, capped at [[HybridTopK]] before
    * fusion); the dense leg inherits q22's broadcast-probe scan. The
    * fusion joins two ≤[[HybridTopK]]-row frames.
    */
  def q102HybridSearch(spark: SparkSession, dir: String): DataFrame = {
    // probe-grain term counts, so mining can demand corpus mass BEYOND
    // the probe's own occurrences — without the n > n_probe guard the
    // "rarest" tokens are the probe's hapaxes, which appear in no other
    // document and silently empty the lexical leg. Artifact mode reads
    // the probe's postings row (tf IS the occurrence count); inline
    // explodes the one probe document.
    val probeCounts = graft.Artifacts.tokenPostings(spark, dir) match {
      case Some(p) => p.filter(col("doc_id") === HybridProbe)
        .select(col("token"), col("tf").as("n_probe"))
      case None => Tables.documents(spark, dir)
        .filter(col("doc_id") === HybridProbe)
        .select(explode(Dedup.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n_probe"))
    }
    val terms = probeCounts
      .join(graft.Artifacts.tokenTotals(spark, dir), "token")
      .filter(col("n") > col("n_probe"))
      .orderBy(col("n").asc, col("token").asc).limit(HybridTerms)
      .select("token")
    val nDocs = docCount(spark, dir)
    val tf = restrictedTf(spark, dir, _.filter(col("doc_id") =!= HybridProbe)
      .join(broadcast(terms), "token"))
    // top-k FIRST (TakeOrderedAndProject), then rank the ≤k survivors —
    // a mined term can be common, so the scored survivor set is not
    // guaranteed tiny and must never feed a global rank window directly
    val lexTop = bm25Score(tf, nDocs, Seq("doc_id"))
      .select(col("doc_id"), col("score").as("lex_score"))
      .orderBy(col("lex_score").desc, col("doc_id").asc)
      .limit(HybridTopK)
    val lexRanked = lexTop.withColumn("lex_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("lex_score").desc, col("doc_id").asc)))
      .select("doc_id", "lex_rank")
    val dense = Similarity.q22CosineTopK(spark, dir)
      .filter(col("probe_id") === HybridProbe)
      .select(col("neighbor_id").as("doc_id"), col("rank").as("dense_rank"))
    lexRanked.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf_score", round6(
        coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("dense_rank")), lit(0.0))))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
      .limit(HybridTopK)
      .select("doc_id", "lex_rank", "dense_rank", "rrf_score")
  }

  /** The term mining, q66's scoring arithmetic, q22's oracle verbatim
    * for the dense leg, and the same RRF formula.
    */
  lazy val q102OracleSql: String =
    s"""WITH pcounts AS (
      |  SELECT token, COUNT(*) AS n_probe FROM (
      |    SELECT unnest(string_split_regex(text, '\\s+')) AS token
      |    FROM documents WHERE doc_id = $HybridProbe
      |  ) GROUP BY token
      |), counts AS (
      |  SELECT token, COUNT(*) AS n FROM (
      |    SELECT unnest(string_split_regex(text, '\\s+')) AS token
      |    FROM documents
      |  ) GROUP BY token
      |), terms AS (
      |  SELECT p.token FROM pcounts p JOIN counts c USING (token)
      |  WHERE c.n > p.n_probe
      |  ORDER BY c.n ASC, p.token ASC LIMIT $HybridTerms
      |), tok AS (
      |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token
      |  FROM documents WHERE doc_id <> $HybridProbe
      |), tf AS (
      |  SELECT doc_id, t.token, COUNT(*) AS tf
      |  FROM tok JOIN terms t ON tok.token = t.token
      |  GROUP BY 1, 2
      |), dfc AS (
      |  SELECT token, COUNT(*) AS df FROM tf GROUP BY token
      |), n AS (
      |  SELECT COUNT(*) AS n_total FROM documents
      |), lex AS (
      |  SELECT tf.doc_id,
      |         ${round6Sql(bm25SumSql)} AS lex_score
      |  FROM tf JOIN dfc ON tf.token = dfc.token, n
      |  GROUP BY tf.doc_id, n_total
      |), lexk AS (
      |  SELECT doc_id, lex_rank FROM (
      |    SELECT doc_id, row_number() OVER (
      |      ORDER BY lex_score DESC, doc_id ASC) AS lex_rank
      |    FROM lex
      |  ) WHERE lex_rank <= $HybridTopK
      |), dense AS (
      |  SELECT neighbor_id AS doc_id, rank AS dense_rank FROM (
      |${graft.operators.Similarity.q22OracleSql}
      |  ) WHERE probe_id = $HybridProbe
      |), fused AS (
      |  SELECT COALESCE(l.doc_id, de.doc_id) AS doc_id,
      |         l.lex_rank, de.dense_rank,
      |         ${round6Sql(
             s"""COALESCE(1.0 / ($RrfK + l.lex_rank), 0)
      |           + COALESCE(1.0 / ($RrfK + de.dense_rank), 0)""")}
      |           AS rrf_score
      |  FROM lexk l FULL OUTER JOIN dense de ON l.doc_id = de.doc_id
      |)
      |SELECT doc_id, lex_rank, dense_rank, rrf_score
      |FROM fused ORDER BY rrf_score DESC, doc_id LIMIT $HybridTopK""".stripMargin

  // ---- q107: pseudo-relevance-feedback query expansion --------------------

  /** Feedback depth: how many top seed-query documents mine expansion
    * terms (RM3's fbDocs).
    */
  private val FeedbackK = 5

  /** How many expansion terms join the query (RM3's fbTerms). */
  private val ExpandK = 5

  /** q107 — pseudo-relevance-feedback expansion (the RM3 working point,
    * Lavrenko & Croft's relevance models as shipped in Indri/Anserini):
    * run the seed query ([[QueryTerms]], q66's scorer verbatim), treat
    * its top [[FeedbackK]] documents as pseudo-relevant, mine the
    * [[ExpandK]] most frequent non-seed terms from them (exact integer
    * occurrence counts — the tf-weighted degeneration of the relevance
    * model, order-free where RM3's score-weighted mixture would put a
    * float sum before the cutoff), and re-score the corpus over
    * seed ∪ expansion. The classic fix for vocabulary mismatch: a query
    * about "pipeline quality" pulls in the terms its best matches
    * actually use, finding documents that never contain the seed words.
    * Output shape is q66's (doc_id, score, n_terms_hit) over the
    * expanded query, so downstream consumers swap retrievers freely.
    *
    * Scale shape: all three passes (seed scoring, expansion mining,
    * expanded re-scoring) consume the SAME `(doc_id, token, tf)`
    * postings frame — the standing `token_postings` artifact when
    * materialized (each pass is then a term- or doc-bounded filter of
    * doc-grain state; the corpus text is never scanned, plan-guarded),
    * and ONE checkpointed tokenize pass inline (the explode runs once,
    * not once per pass). Between passes sit only broadcast-sized
    * frames: the [[FeedbackK]]-row feedback doc set and the
    * ≤[[ExpandK]]+|seed| term set; both cutoffs are
    * `TakeOrderedAndProject`. Expansion mining sums tf over the
    * feedback docs — identical to counting the exploded occurrences,
    * without re-deriving them.
    */
  def q107Rm3Expansion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nDocs = docCount(spark, dir)
    val postings = postingsOrInline(spark, dir)
    val seedTf = postings.filter(col("token").isin(QueryTerms: _*))
    val feedback = bm25Score(seedTf, nDocs, Seq("doc_id"))
      .orderBy(desc("score"), asc("doc_id")).limit(FeedbackK)
      .select("doc_id")
    val expansion = postings.join(broadcast(feedback), "doc_id")
      .filter(!col("token").isin(QueryTerms: _*))
      .groupBy("token").agg(sum("tf").as("fb_tf"))
      .orderBy(desc("fb_tf"), asc("token")).limit(ExpandK)
      .select("token")
    val allTerms = QueryTerms.toDF("token").unionByName(expansion)
    val tf2 = postings.join(broadcast(allTerms), "token")
      .select("doc_id", "token", "tf")
    bm25Score(tf2, nDocs, Seq("doc_id"))
      .orderBy(desc("score"), asc("doc_id")).limit(TopK)
  }

  /** q66's scoring CTEs twice over — seed pass, integer-count expansion
    * mining with the same (count desc, token asc) cutoff, expanded pass.
    */
  lazy val q107OracleSql: String = {
    val termList = QueryTerms.map(t => s"('$t')").mkString(", ")
    s"""WITH seedterms(token) AS (VALUES $termList),
      |tok AS (
      |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token
      |  FROM documents
      |), tf1 AS (
      |  SELECT doc_id, s.token, COUNT(*) AS tf
      |  FROM tok JOIN seedterms s ON tok.token = s.token
      |  GROUP BY 1, 2
      |), df1 AS (
      |  SELECT token, COUNT(*) AS df FROM tf1 GROUP BY token
      |), n AS (
      |  SELECT COUNT(*) AS n_total FROM documents
      |), seed_scores AS (
      |  SELECT tf1.doc_id, ${round6Sql(bm25SumSql)} AS score
      |  FROM tf1 JOIN df1 ON tf1.token = df1.token, n
      |  GROUP BY tf1.doc_id, n_total
      |), feedback AS (
      |  SELECT doc_id FROM seed_scores ORDER BY score DESC, doc_id
      |  LIMIT $FeedbackK
      |), fb_counts AS (
      |  SELECT token, COUNT(*) AS fb_tf
      |  FROM tok JOIN feedback USING (doc_id)
      |  WHERE token NOT IN (SELECT token FROM seedterms)
      |  GROUP BY token
      |), expansion AS (
      |  SELECT token FROM fb_counts ORDER BY fb_tf DESC, token
      |  LIMIT $ExpandK
      |), allterms AS (
      |  SELECT token FROM seedterms UNION SELECT token FROM expansion
      |), tf AS (
      |  SELECT doc_id, a.token, COUNT(*) AS tf
      |  FROM tok JOIN allterms a ON tok.token = a.token
      |  GROUP BY 1, 2
      |), df AS (
      |  SELECT token, COUNT(*) AS df FROM tf GROUP BY token
      |)
      |SELECT tf.doc_id,
      |       ${round6Sql(bm25SumSql)} AS score,
      |       COUNT(*) AS n_terms_hit
      |FROM tf JOIN df ON tf.token = df.token, n
      |GROUP BY tf.doc_id, n_total
      |ORDER BY score DESC, doc_id LIMIT $TopK""".stripMargin
  }

  // ---- q118: per-document TF-IDF keyterms ---------------------------------

  /** Keyterms surfaced per document by [[q118TfidfKeyterms]]. */
  private val KeytermK = 3

  /** q118 — per-document keyterm extraction: each document's
    * [[KeytermK]] highest-scoring terms under `tf · idf` with q66's
    * rational idf `(N − df + 0.5)/(df + 0.5)` (same
    * determinism-over-classical-scale argument — the log is a monotone
    * reshaping per fixed tf, but tf varies, so the weight itself must be
    * the committed formula). The corpus-wide tagging pass an
    * exploration UI, labeling queue, or topic drilldown runs per
    * snapshot: "what is this document about" as a first-class,
    * re-runnable product rather than a notebook one-off.
    *
    * Scale shape: the postings frame is the standing `token_postings`
    * artifact when materialized (zero documents scans — plan-guarded
    * with the rest of the lexical family), inline one checkpointed
    * tokenize otherwise; df is one vocabulary-grain aggregation OF the
    * postings (at production scale itself a standing artifact); the
    * per-doc top-k is a `WindowGroupLimit`-eligible window partitioned
    * by doc_id, so only ≤K rows per document survive its shuffle. The
    * output is doc-grain × K — a corpus-sized PRODUCT, as intended: at
    * 100 TB this query's output is itself a table a pipeline writes,
    * not a screenful.
    */
  def q118TfidfKeyterms(spark: SparkSession, dir: String): DataFrame = {
    val postings = postingsOrInline(spark, dir)
    // idf side from the standing token_df aggregate when fresh — the
    // per-query vocabulary-grain shuffle of the postings drops out —
    // else aggregated from the same postings frame the scoring joins
    val dfc = graft.Artifacts.tokenDf(spark, dir).getOrElse(
      CorpusOps.dfFromPostings(postings))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("token").asc)
    postings.join(dfc, "token")
      .crossJoin(broadcast(docCount(spark, dir)))
      .withColumn("score", round6(
        (col("n_total") - col("df") + 0.5) / (col("df") + 0.5)
          * col("tf").cast("double")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= KeytermK)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"),
        col("df"), col("score"))
      .orderBy("doc_id", "rank")
  }

  /** The same tf/df/N derivations and weight, ranked with the same
    * (score desc, token asc) tie order.
    */
  lazy val q118OracleSql: String =
    s"""WITH tok AS (
      |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2
      |), dfc AS (
      |  SELECT token, COUNT(*) AS df FROM tf GROUP BY token
      |), n AS (
      |  SELECT COUNT(*) AS n_total FROM documents
      |), scored AS (
      |  SELECT tf.doc_id, tf.token, tf.tf, dfc.df,
      |         ${round6Sql(
           """((n_total - df + 0.5) / (df + 0.5))
      |           * CAST(tf AS DOUBLE)""")} AS score
      |  FROM tf JOIN dfc USING (token), n
      |), ranked AS (
      |  SELECT doc_id, token, tf, df, score,
      |         row_number() OVER (PARTITION BY doc_id
      |           ORDER BY score DESC, token ASC) AS rank
      |  FROM scored
      |)
      |SELECT doc_id, rank, token, tf, df, score
      |FROM ranked WHERE rank <= $KeytermK
      |ORDER BY doc_id, rank""".stripMargin

  // ---- q121: full Okapi BM25 (length-normalized) --------------------------

  /** BM25 length-normalization strength (Robertson's published default). */
  private val B = 0.75

  /** q121 — FULL Okapi BM25 over the benchmark terms: q66's rational
    * idf with the complete saturation term
    * `tf·(k₁+1) / (tf + k₁·(1 − b + b·dl/avgdl))`, so long documents
    * stop winning on raw term count alone — the production scorer where
    * q66 is the uniform-length simplification. Stays fully
    * cross-engine-deterministic WITHOUT the classical log because every
    * new input is exact integer mass: `dl` is the document's whitespace
    * token count and `avgdl` is (total tokens)/(total docs) computed as
    * ONE division of two exact long sums — no float aggregation whose
    * partition order could drift between engines.
    *
    * Scale shape: the tf rows are the standing postings filtered to the
    * query's terms; `dl` joins from the standing per-doc token counts
    * (doc-grain, term-survivors only — the join is result-set-sized);
    * `avgdl`/N are two scalars off the count artifact, broadcast. Zero
    * documents scans in artifact mode (plan-guarded); ranking is
    * `TakeOrderedAndProject`.
    */
  def q121Bm25Full(spark: SparkSession, dir: String): DataFrame = {
    val tf = restrictedTf(spark, dir,
      _.filter(col("token").isin(QueryTerms: _*)))
    val ws = graft.functions.Tokenizer.Whitespace
    val dl = graft.Artifacts.tokenCounts(spark, dir, ws).getOrElse(
      graft.Artifacts.tokenCountsFrame(Tables.documents(spark, dir), ws))
    val totals = dl.agg(count(lit(1)).as("n_total"),
      sum("n_tokens").as("tok_total"))
    val dfc = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val idf = (col("n_total") - col("df") + 0.5) / (col("df") + 0.5)
    val norm = lit(1.0) - B + lit(B) *
      (col("n_tokens").cast("double") *
        (col("n_total").cast("double") / col("tok_total")))
    tf.join(broadcast(dfc), "token")
      .join(dl, "doc_id")
      .crossJoin(broadcast(totals))
      .withColumn("w", idf *
        (col("tf") * (K1 + 1.0) / (col("tf") + lit(K1) * norm)))
      .groupBy("doc_id")
      .agg(round6(sum(col("w"))).as("score"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(TopK)
  }

  /** The same tf/df/N derivations with the identical normalization
    * expression tree — `dl/avgdl` is written `dl · (N/tok_total)` on
    * BOTH engines (one tree, one rounding behavior).
    */
  lazy val q121OracleSql: String = {
    val termList = QueryTerms.map(t => s"('$t')").mkString(", ")
    s"""WITH terms(token) AS (VALUES $termList),
      |tok AS (
      |  SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS token
      |  FROM documents
      |), tf AS (
      |  SELECT doc_id, t.token, COUNT(*) AS tf
      |  FROM tok JOIN terms t ON tok.token = t.token
      |  GROUP BY 1, 2
      |), dfc AS (
      |  SELECT token, COUNT(*) AS df FROM tf GROUP BY token
      |), dl AS (
      |  SELECT doc_id, len(string_split_regex(text, '\\s+')) AS n_tokens
      |  FROM documents
      |), n AS (
      |  SELECT COUNT(*) AS n_total,
      |         CAST(SUM(n_tokens) AS BIGINT) AS tok_total
      |  FROM dl
      |)
      |SELECT tf.doc_id,
      |       ${round6Sql(
           s"""SUM(((n_total - df + 0.5) / (df + 0.5))
      |         * (tf * ($K1 + 1.0)
      |           / (tf + $K1 * (1.0 - $B + $B
      |             * (CAST(dl.n_tokens AS DOUBLE)
      |               * (CAST(n_total AS DOUBLE) / tok_total))))))""")}
      |         AS score,
      |       COUNT(*) AS n_terms_hit
      |FROM tf
      |JOIN dfc ON tf.token = dfc.token
      |JOIN dl ON dl.doc_id = tf.doc_id, n
      |GROUP BY tf.doc_id
      |ORDER BY score DESC, tf.doc_id LIMIT $TopK""".stripMargin
  }

  // ---- q126: exact-phrase search over positional postings -----------------

  /** The benchmark phrases. The third repeats a term — the repeated-term
    * branch of the adjacency join must count each offset separately, not
    * collapse the two `order` legs.
    */
  private val Phrases = Seq(
    Seq("order", "fast"),
    Seq("big", "order", "scan"),
    Seq("order", "order"))

  /** The `(doc_id, token, pos)` positional rows restricted to `restrict`
    * — the standing `token_positions` index when the corpus fingerprint
    * resolves (phrase work = a term-bounded filter of the artifact, and
    * a re-scan per reference keeps the artifact path visible to the
    * plan guards), else the inline filter-after-posexplode, checkpointed
    * because the phrase pipeline references the frame through two
    * aggregation legs.
    */
  private def restrictedPositions(spark: SparkSession, dir: String,
      restrict: DataFrame => DataFrame): DataFrame =
    graft.Artifacts.tokenPositions(spark, dir) match {
      case Some(p) => restrict(p).select("doc_id", "token", "pos")
      case None => graft.Checkpoints.checkpoint(restrict(
        Tables.documents(spark, dir).select(col("doc_id"),
          posexplode(Dedup.tokens(col("text"))).as(Seq("pos", "token"))))
        .select("doc_id", "token", "pos"))
    }

  /** q126 — exact-phrase search: each benchmark phrase matched as a
    * position-adjacency equi-join over the positional index, scored with
    * q121's full Okapi BM25 (phrase tf, phrase df, the identical
    * length-normalization expression tree), top-[[TopK]] per phrase.
    *
    * The adjacency join is offset arithmetic, not an n-way self-join:
    * every occurrence of a phrase term proposes a candidate start
    * (`pos − off`), and a start with ALL `plen` offsets present is a
    * match — one broadcast join against the (phrases × terms) spec and
    * two partial-aggregated groupBys, whatever the phrase length. The
    * index rows never leave (doc, start) grain, so the shuffle is
    * bounded by occurrences of the phrase's terms.
    *
    * Scale shape: term-bounded filter of the standing `token_positions`
    * artifact; `dl`/`avgdl`/N from the standing count artifacts — zero
    * documents scans in artifact mode (plan-guarded). Per-phrase ranking
    * is a window over result-set-sized rows.
    */
  def q126PhraseSearch(spark: SparkSession, dir: String): DataFrame =
    phraseSearch(spark, dir, Phrases)

  /** q126 under caller-chosen phrases. */
  def phraseSearch(spark: SparkSession, dir: String,
      phrases: Seq[Seq[String]]): DataFrame = {
    require(phrases.nonEmpty && phrases.forall(_.nonEmpty),
      "phrases must be non-empty")
    import spark.implicits._
    val spec = phrases.flatMap { p =>
      p.zipWithIndex.map { case (t, i) => (p.mkString(" "), p.length, t, i) }
    }.toDF("phrase", "plen", "term", "off")
    val allTerms = phrases.flatten.distinct
    val pos = restrictedPositions(spark, dir,
      _.filter(col("token").isin(allTerms: _*)))

    // (phrase, doc, start, off) is unique by construction — a token
    // occurrence matches one spec row per offset — so count(*) counts
    // distinct offsets present at the start
    def matches: DataFrame = pos
      .join(broadcast(spec), col("token") === col("term"))
      .select(col("phrase"), col("plen"), col("doc_id"),
        (col("pos") - col("off")).as("start"))
      .groupBy("phrase", "plen", "doc_id", "start")
      .agg(count(lit(1)).as("k"))
      .filter(col("k") === col("plen"))
      .groupBy("phrase", "doc_id").agg(count(lit(1)).as("tf"))

    val ws = graft.functions.Tokenizer.Whitespace
    val dl = graft.Artifacts.tokenCounts(spark, dir, ws).getOrElse(
      graft.Artifacts.tokenCountsFrame(Tables.documents(spark, dir), ws))
    val totals = dl.agg(count(lit(1)).as("n_total"),
      sum("n_tokens").as("tok_total"))
    val dfc = matches.groupBy("phrase").agg(count(lit(1)).as("df"))
    val idf = (col("n_total") - col("df") + 0.5) / (col("df") + 0.5)
    val norm = lit(1.0) - B + lit(B) *
      (col("n_tokens").cast("double") *
        (col("n_total").cast("double") / col("tok_total")))
    val rank = org.apache.spark.sql.expressions.Window
      .partitionBy("phrase").orderBy(desc("score"), asc("doc_id"))
    matches.join(broadcast(dfc), "phrase")
      .join(dl, "doc_id")
      .crossJoin(broadcast(totals))
      .withColumn("score", round6(idf *
        (col("tf") * (K1 + 1.0) / (col("tf") + lit(K1) * norm))))
      .withColumn("rank", row_number().over(rank))
      .filter(col("rank") <= TopK)
      .select(col("phrase"), col("rank"), col("doc_id"), col("tf"),
        col("score"))
      .orderBy("phrase", "rank")
  }

  // ---- q128: proximity (NEAR/slop) search over positional postings --------

  /** The benchmark proximity queries `(term_a, term_b, slop)`: docs where
    * an occurrence of `term_a` sits within `slop` tokens of an occurrence
    * of `term_b`.
    */
  private val ProxQueries = Seq(
    ("order", "scan", 5), ("hash", "join", 3), ("window", "batch", 4))

  /** q128 — proximity search: each `(a, b, slop)` query matched as a
    * doc-co-occurrence equi-join over the positional index with the slop
    * band as a post-join filter, ranked per query by within-slop pair
    * count then minimum gap. The first thing a RAG user asks for after
    * exact phrase: "these two terms, actually near each other".
    *
    * Scale shape: the positions frame is filtered to the queries' terms
    * BEFORE the self-join, and the join itself is an equi-join on
    * `doc_id` between the a-side and b-side occurrence sets — per-doc
    * fan-out is occ(a)·occ(b) for QUERY terms only, never a corpus
    * pairwise product (the q82 candidate-join discipline). Artifact mode
    * reads the standing `token_positions` index; zero documents scans
    * (plan-guarded with the lexical family).
    */
  def q128ProximitySearch(spark: SparkSession, dir: String): DataFrame =
    proximitySearch(spark, dir, ProxQueries)

  /** q128 under caller-chosen `(a, b, slop)` queries. */
  def proximitySearch(spark: SparkSession, dir: String,
      queries: Seq[(String, String, Int)]): DataFrame = {
    require(queries.nonEmpty, "queries must be non-empty")
    require(queries.forall { case (a, b, s) => a != b && s > 0 },
      "proximity queries need distinct terms and positive slop")
    import spark.implicits._
    val spec = queries.toDF("ta", "tb", "slop")
    val allTerms = queries.flatMap(q => Seq(q._1, q._2)).distinct
    val pos = restrictedPositions(spark, dir,
      _.filter(col("token").isin(allTerms: _*)))
    val pa = pos.select(col("doc_id"), col("token").as("ta_tok"),
      col("pos").as("pa"))
    val pb = pos.select(col("doc_id"), col("token").as("tb_tok"),
      col("pos").as("pb"))
    val rank = org.apache.spark.sql.expressions.Window
      .partitionBy("ta", "tb", "slop")
      .orderBy(desc("n_pairs"), asc("min_gap"), asc("doc_id"))
    pa.join(broadcast(spec), col("ta_tok") === col("ta"))
      .join(pb, Seq("doc_id"))
      .filter(col("tb_tok") === col("tb") &&
        abs(col("pa") - col("pb")) <= col("slop"))
      .groupBy("ta", "tb", "slop", "doc_id")
      .agg(count(lit(1)).as("n_pairs"),
        min(abs(col("pa") - col("pb"))).as("min_gap"))
      .withColumn("rank", row_number().over(rank))
      .filter(col("rank") <= TopK)
      .select(
        concat(col("ta"), lit(" NEAR/"), col("slop"), lit(" "), col("tb"))
          .as("query"),
        col("rank"), col("doc_id"), col("n_pairs"), col("min_gap"))
      .orderBy("query", "rank")
  }

  /** The identical co-occurrence/band/rank pipeline, query spec VALUES
    * generated from the same [[ProxQueries]] constant.
    */
  lazy val q128OracleSql: String = {
    val specValues = ProxQueries.map { case (a, b, s) =>
      s"('$a', '$b', $s)"
    }.mkString(", ")
    s"""WITH qp(ta, tb, slop) AS (VALUES $specValues),
      |tok AS (
      |  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
      |), pos AS (
      |  SELECT doc_id, generate_subscripts(t, 1) - 1 AS pos,
      |         unnest(t) AS token
      |  FROM tok
      |), m AS (
      |  SELECT qp.ta, qp.tb, qp.slop, a.doc_id,
      |         ABS(a.pos - b.pos) AS gap
      |  FROM pos a
      |  JOIN qp ON a.token = qp.ta
      |  JOIN pos b ON b.doc_id = a.doc_id AND b.token = qp.tb
      |  WHERE ABS(a.pos - b.pos) <= qp.slop
      |), g AS (
      |  SELECT ta, tb, slop, doc_id, COUNT(*) AS n_pairs,
      |         CAST(MIN(gap) AS INTEGER) AS min_gap
      |  FROM m GROUP BY 1, 2, 3, 4
      |), r AS (
      |  SELECT ta || ' NEAR/' || CAST(slop AS VARCHAR) || ' ' || tb AS query,
      |         doc_id, n_pairs, min_gap,
      |         row_number() OVER (PARTITION BY ta, tb, slop
      |           ORDER BY n_pairs DESC, min_gap ASC, doc_id ASC) AS rank
      |  FROM g
      |)
      |SELECT query, CAST(rank AS INTEGER) AS rank, doc_id, n_pairs, min_gap
      |FROM r WHERE rank <= $TopK
      |ORDER BY query, rank""".stripMargin
  }

  /** The identical adjacency/count/scoring pipeline, phrase spec VALUES
    * generated from the same [[Phrases]] constant.
    */
  lazy val q126OracleSql: String = {
    val specValues = Phrases.flatMap { p =>
      p.zipWithIndex.map { case (t, i) =>
        s"('${p.mkString(" ")}', ${p.length}, '$t', $i)"
      }
    }.mkString(", ")
    s"""WITH ph(phrase, plen, term, off) AS (VALUES $specValues),
      |tok AS (
      |  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
      |), pos AS (
      |  SELECT doc_id, generate_subscripts(t, 1) - 1 AS pos,
      |         unnest(t) AS token
      |  FROM tok
      |), cand AS (
      |  SELECT p.phrase, p.plen, pos.doc_id, pos.pos - p.off AS start
      |  FROM pos JOIN ph p ON pos.token = p.term
      |), starts AS (
      |  SELECT phrase, plen, doc_id, start, COUNT(*) AS k
      |  FROM cand GROUP BY 1, 2, 3, 4
      |), tf AS (
      |  SELECT phrase, doc_id, COUNT(*) AS tf
      |  FROM starts WHERE k = plen GROUP BY 1, 2
      |), dfc AS (
      |  SELECT phrase, COUNT(*) AS df FROM tf GROUP BY phrase
      |), dl AS (
      |  SELECT doc_id, len(string_split_regex(text, '\\s+')) AS n_tokens
      |  FROM documents
      |), n AS (
      |  SELECT COUNT(*) AS n_total,
      |         CAST(SUM(n_tokens) AS BIGINT) AS tok_total
      |  FROM dl
      |), scored AS (
      |  SELECT tf.phrase, tf.doc_id, tf.tf,
      |         ${round6Sql(
           s"""(((n_total - df + 0.5) / (df + 0.5))
      |           * (tf * ($K1 + 1.0)
      |             / (tf + $K1 * (1.0 - $B + $B
      |               * (CAST(dl.n_tokens AS DOUBLE)
      |                 * (CAST(n_total AS DOUBLE) / tok_total))))))""")}
      |           AS score
      |  FROM tf
      |  JOIN dfc ON tf.phrase = dfc.phrase
      |  JOIN dl ON dl.doc_id = tf.doc_id, n
      |), ranked AS (
      |  SELECT phrase, doc_id, tf, score,
      |         row_number() OVER (PARTITION BY phrase
      |           ORDER BY score DESC, doc_id ASC) AS rank
      |  FROM scored
      |)
      |SELECT phrase, CAST(rank AS INTEGER) AS rank, doc_id, tf, score
      |FROM ranked WHERE rank <= $TopK
      |ORDER BY phrase, rank""".stripMargin
  }

  // ---- q134: best-snippet window over positional postings -----------------

  /** Snippet window width in tokens. */
  private val SnippetWidth = 16

  /** q134 — snippet selection: for each document matching the query
    * ([[QueryTerms]], the q66 benchmark query), the [[SnippetWidth]]-token
    * window holding the most query-term occurrences (ties → earliest
    * start) — the passage a search UI highlights under each hit, and the
    * RAG answer-context chosen the way a lexical reader does it. Docs
    * ranked by their best window's hit count (ties → smaller id),
    * top-[[TopK]].
    *
    * The candidate starts are the HIT positions only (an optimal window
    * can always be anchored at a hit), so the window count is a
    * per-doc RANGE frame over the term-filtered positional index —
    * work is per-doc hits², bounded by query-term occurrences, never
    * doc length. Artifact mode reads the standing `token_positions`
    * index; zero documents scans (plan-guarded with the lexical
    * family).
    */
  def q134Snippet(spark: SparkSession, dir: String): DataFrame =
    snippetFrom(restrictedPositions(spark, dir,
      _.filter(col("token").isin(QueryTerms: _*))))

  /** [[q134Snippet]] over a caller-supplied `(doc_id, pos)` hit frame —
    * the spec's crafted-positions seam.
    */
  private[graft] def snippetFrom(pos: DataFrame): DataFrame = {
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rangeBetween(0, SnippetWidth - 1)
    val best = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(desc("n_hits"), asc("start"))
    pos
      .select(col("doc_id"), col("pos").as("start"),
        count(lit(1)).over(wnd).as("n_hits"))
      .withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("start"), col("n_hits"))
      .orderBy(desc("n_hits"), asc("doc_id"))
      .limit(TopK)
  }

  /** The identical hit-position/range-frame/argmax pipeline over the
    * same [[QueryTerms]].
    */
  lazy val q134OracleSql: String = {
    val termList = QueryTerms.map(t => s"('$t')").mkString(", ")
    s"""WITH qt(term) AS (VALUES $termList),
      |tok AS (
      |  SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents
      |), pos AS (
      |  SELECT doc_id, generate_subscripts(t, 1) - 1 AS pos,
      |         unnest(t) AS token
      |  FROM tok
      |), hit AS (
      |  SELECT doc_id, pos FROM pos JOIN qt ON pos.token = qt.term
      |), wnd AS (
      |  SELECT doc_id, pos AS start,
      |         COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos
      |           RANGE BETWEEN CURRENT ROW
      |             AND ${SnippetWidth - 1} FOLLOWING) AS n_hits
      |  FROM hit
      |), best AS (
      |  SELECT doc_id, start, n_hits,
      |         row_number() OVER (PARTITION BY doc_id
      |           ORDER BY n_hits DESC, start ASC) AS rn
      |  FROM wnd
      |)
      |SELECT doc_id, CAST(start AS INTEGER) AS start, n_hits
      |FROM best WHERE rn = 1
      |ORDER BY n_hits DESC, doc_id LIMIT $TopK""".stripMargin
  }
}

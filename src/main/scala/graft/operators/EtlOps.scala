package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextNorm

/** The reference's ETL dataflow operators (SURVEY.md §2.1, §2.9) as
  * composable DataFrame transforms: token explode (G1), dictionary encode
  * (S6 + J3), junction dedup (S7), last-write-wins upsert (S5), and CHECK
  * validation (P5). Each also ships as a `queries` entry with a DuckDB
  * oracle.
  */
object EtlOps {

  /** G1 — genre explode (reference `etl.py:186-200`): one (id, token) row
    * per delimiter-separated token, trimmed, with empty and sentinel
    * tokens dropped (`etl.py:196`). Fully parallel — a `Generator` inside
    * codegen, no shuffle.
    */
  def explodeTokens(df: DataFrame, idCol: Column, textCol: Column,
      delimiterRe: String = "\\|",
      sentinel: String = "(no genres listed)"): DataFrame =
    df.select(idCol.as("id"),
        explode(TextNorm.tokenize(textCol, delimiterRe)).as("token"))
      .filter(length(col("token")) > 0 && col("token") =!= sentinel)

  /** S6 + surrogate keys — dictionary-encode a token domain (reference
    * `genres` dim, `schema.sql:18-21`): distinct values with dense ids.
    *
    * `AUTOINCREMENT` has no distributed equivalent; dense ids need a
    * global `row_number`, i.e. a single-partition window — acceptable for
    * *dimension* domains (the reference's is 19 genres), never for facts
    * (SURVEY.md §7.4.7). The distinct() shuffle that precedes it is
    * map-side combined, so the single partition only ever sees the
    * (small) distinct set.
    */
  def dictionaryEncode(tokens: DataFrame, tokenCol: String = "token",
      maxDomain: Long = 1000000L): DataFrame =
    tokens.select(col(tokenCol).as("token")).distinct()
      .withColumn("token_id",
        row_number().over(Window.orderBy("token")).cast("long"))
      // Enforce the dimension-only contract at the API level: the global
      // row_number window above is single-partition by construction, so a
      // fact-scale domain here is a silent scale bug. The guard is a
      // distributed raise_error on the id itself (no extra pass, no
      // driver-side count) — exceeding maxDomain fails the job loudly.
      .withColumn("token_id",
        when(col("token_id") <= maxDomain, col("token_id"))
          .otherwise(raise_error(lit(
            s"dictionaryEncode: > $maxDomain distinct tokens — this is a " +
              "dimension-only operator (single-partition id window, SURVEY " +
              "§7.4.7); use hash-based surrogate keys for fact-scale domains"))
            .cast("long")))
      .select("token_id", "token")

  /** S7 + J3 — junction build (reference `etl.py:253-258`): resolve each
    * (id, token) pair against the dictionary — a broadcast-hash join,
    * replacing the reference's per-row `SELECT genre_id FROM genres` point
    * lookups — then dedup on the composite key (`INSERT OR IGNORE` on the
    * composite PK, `schema.sql:27`).
    */
  def junction(exploded: DataFrame, dictionary: DataFrame): DataFrame =
    exploded.join(broadcast(dictionary), "token")
      .select(col("id"), col("token_id"))
      .dropDuplicates("id", "token_id")

  /** S5 — last-write-wins upsert semantics (reference `INSERT OR REPLACE`,
    * `etl.py:238-244`): keep the newest row per key under `ordering`.
    * Single shuffle on the key; at scale this is the standard
    * dedup-before-merge shape (and the `foreachBatch` MERGE body in a
    * Delta/Iceberg environment).
    *
    * Skew caveat: `row_number` over a key window sends EVERY row of a key
    * to one reducer — a single user with 10⁸ events lands one partition.
    * When "newest" is expressible as a lexicographic max (the upsert
    * case), use [[latestByKeyAgg]] instead, which reduces map-side and is
    * immune to hot keys. This window form remains for arbitrary mixed
    * asc/desc orderings; `Skew.saltedAggregate` covers hand-salted
    * two-phase shapes for other aggregates.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame =
    df.withColumn("__rn",
        row_number().over(
          Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** Skew-immune [[latestByKey]] for "newest wins" orderings: the winner
    * per key is `max(struct(versionCols…, payload…))` — struct comparison
    * is lexicographic, so the row with the greatest version tuple wins,
    * and an ordinary hash aggregate gets map-side partial aggregation: a
    * hot key reduces to one candidate row per map task before the
    * shuffle, so no reducer ever sees a whole key's rows (the fix the
    * window form can't have).
    *
    * Deterministic when `versionCols` is a per-key unique tuple (the
    * upsert contract — e.g. (ts, event_id)); version columns must be
    * non-null (nulls sort first in struct comparison and would demote a
    * row). Trailing payload fields only break version ties.
    */
  def latestByKeyAgg(df: DataFrame, keys: Seq[String],
      versionCols: Seq[String]): DataFrame = {
    val payload = df.columns.filterNot(keys.contains)
    val packed = versionCols ++ payload.filterNot(versionCols.contains)
    df.groupBy(keys.map(col): _*)
      .agg(max(struct(packed.map(col): _*)).as("__latest"))
      .select(df.columns.toIndexedSeq.map(c =>
        if (keys.contains(c)) col(c) else col(s"__latest.$c").as(c)): _*)
  }

  /** S6/S7 — `INSERT OR IGNORE` as a dataflow op: incoming rows whose key
    * is absent from `existing` (left-anti join, broadcast when small).
    */
  def insertIfAbsent(existing: DataFrame, incoming: DataFrame,
      keys: Seq[String]): DataFrame =
    incoming.dropDuplicates(keys)
      .join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** P5 — CHECK-constraint validation (reference `schema.sql:37`):
    * per-group violation counts for a boolean constraint. SQLite rejects
    * the row; a dataflow engine reports and routes instead.
    */
  def checkViolations(df: DataFrame, groupCol: String, constraint: Column): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("row_count"),
        sum(when(constraint, 0L).otherwise(1L)).as("violations"))

  /** P5 alternate — SQLite-style hard enforcement: any row violating the
    * constraint aborts the job via `raise_error` (the reference's CHECK
    * rejects the offending INSERT, `schema.sql:37`). Use
    * [[checkViolations]] for the report-and-route flavor.
    */
  def enforceCheck(df: DataFrame, constraint: Column, message: String): DataFrame = {
    val guard = when(constraint, lit(true))
      .otherwise(raise_error(concat(lit(s"CHECK violated: $message; row="),
        to_json(struct(df.columns.toIndexedSeq.map(col): _*)))))
    df.withColumn("__check", guard).drop("__check")
  }

  /** DELETE ... WHERE as a dataflow op: the surviving rows. SQL deletes
    * rows where the predicate is TRUE; NULL predicates keep the row
    * (three-valued semantics), hence the coalesce.
    */
  def deleteWhere(df: DataFrame, pred: Column): DataFrame =
    df.filter(!coalesce(pred, lit(false)))

  /** FK `ON DELETE CASCADE` (reference `schema.sql:28-29,39`: deleting a
    * movie cascades to `ratings` and `movie_genres`) as delete
    * propagation: child rows survive iff their FK still resolves — a
    * left-semi join against the surviving parent keys. One shuffle on the
    * FK (or zero with broadcast/bucketing); no driver-side key list, so
    * the cascade scales with the child table like any other join.
    */
  def cascadeChildren(child: DataFrame, fk: String,
      survivingParent: DataFrame, pk: String): DataFrame = {
    val keys = survivingParent.select(col(pk).as("__cascade_pk")).distinct()
    child.join(keys, child(fk) === col("__cascade_pk"), "left_semi")
  }

  // ---- driver-contract query entries ----

  /** q9 — G1 over `part.p_name` (space-delimited tokens). */
  def q9TokenExplode(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    explodeTokens(p, p("p_partkey"), p("p_name"), "\\s+")
      .withColumnRenamed("id", "partkey")
      .orderBy("partkey", "token")
  }

  lazy val q9OracleSql: String =
    """WITH e AS (
      |  SELECT p_partkey AS partkey,
      |         trim(unnest(string_split_regex(p_name, '\s+'))) AS token
      |  FROM part
      |)
      |SELECT partkey, token FROM e
      |WHERE length(token) > 0 AND token <> '(no genres listed)'
      |ORDER BY partkey, token""".stripMargin

  /** q10 — S6 dictionary over the q9 token domain. */
  def q10TokenDim(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    dictionaryEncode(
      explodeTokens(p, p("p_partkey"), p("p_name"), "\\s+"))
      .orderBy("token_id")
  }

  lazy val q10OracleSql: String =
    """WITH e AS (
      |  SELECT trim(unnest(string_split_regex(p_name, '\s+'))) AS token FROM part
      |), d AS (
      |  SELECT DISTINCT token FROM e
      |  WHERE length(token) > 0 AND token <> '(no genres listed)'
      |)
      |SELECT row_number() OVER (ORDER BY token) AS token_id, token
      |FROM d ORDER BY token_id""".stripMargin

  /** q11 — S7/J3 junction: (partkey, token_id) via broadcast dictionary
    * join, composite-key dedup.
    */
  def q11Junction(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val exploded = explodeTokens(p, p("p_partkey"), p("p_name"), "\\s+")
    junction(exploded, dictionaryEncode(exploded))
      .withColumnRenamed("id", "partkey")
      .orderBy("partkey", "token_id")
  }

  lazy val q11OracleSql: String =
    """WITH e AS (
      |  SELECT p_partkey AS id,
      |         trim(unnest(string_split_regex(p_name, '\s+'))) AS token
      |  FROM part
      |), f AS (
      |  SELECT id, token FROM e
      |  WHERE length(token) > 0 AND token <> '(no genres listed)'
      |), d AS (
      |  SELECT row_number() OVER (ORDER BY token) AS token_id, token
      |  FROM (SELECT DISTINCT token FROM f)
      |)
      |SELECT DISTINCT f.id AS partkey, d.token_id
      |FROM f JOIN d USING (token)
      |ORDER BY partkey, token_id""".stripMargin

  /** q12 — S5 upsert: newest event per (user_id, event_type), ordered by
    * the lossless ns timestamp then event_id (reference `INSERT OR
    * REPLACE` last-write-wins, `README.md:157`).
    */
  def q12UpsertLatest(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    latestByKeyAgg(e, Seq("user_id", "event_type"), Seq("ts_ns", "event_id"))
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("value"), unix_micros(col("ts")).as("ts_us"))
      .orderBy("user_id", "event_type")
  }

  lazy val q12OracleSql: String =
    """SELECT user_id, event_type, event_id, value, epoch_us(ts) AS ts_us
      |FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY user_id, event_type
      |    ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events
      |)
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  /** q13 — P5 validation: per-type counts of rows violating the
    * reference-style range CHECK (reference `schema.sql:37`).
    */
  def q13CheckViolations(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    checkViolations(e, "event_type",
      e("value") >= 0.0 && e("value") <= 150.0)
      .orderBy("event_type")
  }

  lazy val q13OracleSql: String =
    """SELECT event_type, COUNT(*) AS row_count,
      |       COUNT(*) FILTER (WHERE (value >= 0.0 AND value <= 150.0) IS NOT TRUE) AS violations
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q14 — S12 stats probe (reference `etl.py:279-293`): one row per
    * table. Parquet row-group metadata makes these counts metadata-only
    * scans.
    */
  def q14TableStats(spark: SparkSession, dir: String): DataFrame = {
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    names.map { n =>
      val df = if (n == "events") Tables.events(spark, dir)
               else Tables.table(spark, dir, n)
      df.agg(count(lit(1)).as("row_count"))
        .select(lit(n).as("table_name"), col("row_count"))
    }.reduce(_ unionByName _).orderBy("table_name")
  }

  lazy val q14OracleSql: String =
    """SELECT * FROM (
      |  SELECT 'region' AS table_name, COUNT(*) AS row_count FROM region
      |  UNION ALL SELECT 'nation', COUNT(*) FROM nation
      |  UNION ALL SELECT 'customer', COUNT(*) FROM customer
      |  UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
      |  UNION ALL SELECT 'part', COUNT(*) FROM part
      |  UNION ALL SELECT 'orders', COUNT(*) FROM orders
      |  UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
      |  UNION ALL SELECT 'events', COUNT(*) FROM events
      |  UNION ALL SELECT 'documents', COUNT(*) FROM documents
      |  UNION ALL SELECT 'embeddings', COUNT(*) FROM embeddings
      |) ORDER BY table_name""".stripMargin

  /** q39 — FK ON DELETE CASCADE: delete finished orders
    * (`o_orderstatus = 'F'`), cascade to lineitem, and profile the
    * surviving children. Quantities are summed through decimal so the
    * result is independent of partial-aggregation order (double addition
    * is not associative).
    */
  def q39CascadeDelete(spark: SparkSession, dir: String): DataFrame = {
    val surviving = deleteWhere(Tables.orders(spark, dir),
      col("o_orderstatus") === "F")
    cascadeChildren(Tables.lineitem(spark, dir), "l_orderkey",
        surviving, "o_orderkey")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(20, 6)))
          .cast("double").as("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  lazy val q39OracleSql: String =
    """WITH surviving AS (
      |  SELECT o_orderkey FROM orders
      |  WHERE NOT COALESCE(o_orderstatus = 'F', FALSE)
      |)
      |SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty
      |FROM lineitem l
      |WHERE l.l_orderkey IN (SELECT o_orderkey FROM surviving)
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}

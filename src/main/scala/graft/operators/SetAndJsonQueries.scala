package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{GraftFunctions, Parity}

/** Set operations (SURVEY.md §2.6 — extension parity; the reference's
  * closest construct is `INSERT OR IGNORE`), JSON scalar extraction
  * (SURVEY.md §2.8 — `events.props`), and the registered-function SQL
  * surface (§2.11 + S11).
  */
object SetAndJsonQueries {

  /** q32 — union/intersect/except over customer key sets (customers with
    * finished vs open orders). Spark's set operators are distinct-based,
    * matching ANSI `UNION`/`INTERSECT`/`EXCEPT`.
    */
  def q32SetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey")).distinct()
    val p = o.filter(col("o_orderstatus") === "O").select(col("o_custkey")).distinct()
    def tagged(tag: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_customers")).select(lit(tag).as("op"), col("n_customers"))
    tagged("except", f.except(p))
      .unionByName(tagged("intersect", f.intersect(p)))
      .unionByName(tagged("union", f.union(p).distinct()))
      .orderBy("op")
  }

  lazy val q32OracleSql: String =
    """SELECT * FROM (
      |  SELECT 'except' AS op, COUNT(*) AS n_customers FROM (
      |    SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |    EXCEPT
      |    SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |  UNION ALL
      |  SELECT 'intersect', COUNT(*) FROM (
      |    SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |    INTERSECT
      |    SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |  UNION ALL
      |  SELECT 'union', COUNT(*) FROM (
      |    SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |    UNION
      |    SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |) ORDER BY op""".stripMargin

  /** q33 — JSON extraction from `events.props` (`{"k": <int>}`) and an
    * aggregate over the extracted key (the OMDb-JSON field-consumption
    * analog, reference `etl.py:135-145`, as a column op).
    */
  def q33JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val k = get_json_object(col("props"), "$.k").cast("int")
    e.select(k.as("k"), col("value"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_events"),
        Parity.round2(avg(col("value"))).as("avg_value"))
      .orderBy("k")
  }

  lazy val q33OracleSql: String =
    s"""SELECT CAST(json_extract_string(props, '$$.k') AS INTEGER) AS k,
      |       COUNT(*) AS n_events,
      |       ${Parity.round2Sql("AVG(value)")} AS avg_value
      |FROM events GROUP BY 1 ORDER BY k""".stripMargin

  /** q37 — windowed analytics over the order history (extension; the
    * reference's only window-shaped need is `row_number` for upsert):
    * per-customer order sequence, running spend, and inter-order delta.
    * One shuffle on the partition key; rows stay sorted within partitions
    * for all three frames.
    *
    * Hot-key story: running sequences are irreducibly per-key — every row
    * of a customer must meet in order, so a customer with 10⁸ rows owns
    * one task and no salt can fix that without changing the answer
    * (contrast `EtlOps.latestByKeyAgg`, where the reduction commutes and
    * the window is avoidable). The honest mitigations are upstream: bound
    * rows-per-key at ingest, or restate the metric per (key, time-bucket)
    * so the window key is composite. Here o_custkey is ~uniform
    * (TPC-H-shaped), so the plain window is the right plan.
    */
  def q37WindowAnalytics(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.filter(col("o_custkey") % 100 === 0)
      .select(
        col("o_custkey").as("custkey"),
        col("o_orderkey").as("orderkey"),
        row_number().over(w).as("order_seq"),
        Parity.round2(sum(col("o_totalprice")).over(running)).as("running_spend"),
        Parity.round2(col("o_totalprice") -
          coalesce(lag(col("o_totalprice"), 1).over(w), lit(0.0)))
          .as("delta_vs_prev"))
      .orderBy("custkey", "order_seq")
  }

  lazy val q37OracleSql: String = {
    val run = Parity.round2Sql(
      "SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    val delta = Parity.round2Sql(
      "o_totalprice - COALESCE(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 0.0)")
    s"""SELECT o_custkey AS custkey, o_orderkey AS orderkey,
      |       row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq,
      |       $run AS running_spend,
      |       $delta AS delta_vs_prev
      |FROM orders WHERE o_custkey % 100 = 0
      |ORDER BY custkey, order_seq""".stripMargin
  }

  /** q36 — A4's at-scale variant: exact `COUNT(DISTINCT)` beside
    * `approx_count_distinct` (HLL++). Both are computed over the
    * pre-deduplicated (group, key) pairs: a distinct aggregate beside a
    * non-distinct one otherwise plans Expand — every input row doubled
    * through the shuffle — and measured 5× slower than dedup-then-both.
    * The HLL estimate is unchanged by the dedup (a sketch is multiplicity
    * -insensitive), the exact count becomes a plain `count`, and the
    * distinct shuffle partial-aggregates map-side — the 100 TB shape.
    * Sketch estimates are engine-specific → the oracle checks the exact
    * column and bounds the estimate (rows-only is avoided by emitting the
    * estimate's relative error as a checked-range boolean instead of the
    * raw estimate).
    */
  def q36ApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    // NULL keys are excluded by the AGGREGATES, not by a row filter: a
    // pre-filter would also drop a status whose custkeys are ALL null,
    // where COUNT(DISTINCT) keeps the group with count 0. count(col)
    // skips the (status, NULL) row the distinct leaves behind, matching
    // COUNT(DISTINCT o_custkey) exactly; the sketch-check boolean
    // coalesces to true for the 0-customer group (0/0 is NULL) like the
    // oracle's constant.
    o.select("o_orderstatus", "o_custkey").distinct()
      .groupBy(col("o_orderstatus"))
      .agg(count(col("o_custkey")).as("exact_customers"),
        approx_count_distinct(col("o_custkey"), 0.02).as("approx_customers"))
      .select(col("o_orderstatus"), col("exact_customers"),
        coalesce(abs(col("approx_customers") - col("exact_customers"))
          .cast("double") / col("exact_customers") <= 0.1, lit(true))
          .as("approx_within_10pct"))
      .orderBy("o_orderstatus")
  }

  lazy val q36OracleSql: String =
    """SELECT o_orderstatus,
      |       COUNT(DISTINCT o_custkey) AS exact_customers,
      |       TRUE AS approx_within_10pct
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** q34 — the SQL surface end-to-end: temp views + the registered native
    * functions, executed through `spark.sql` (Catalyst's full parser →
    * analyzer → optimizer path, the reference's `run_queries` shape,
    * `etl.py:295-321`).
    */
  def q34SqlSurface(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    Tables.documents(spark, dir).createOrReplaceTempView("documents_v")
    spark.sql(
      """SELECT doc_id,
        |       strip_diacritics(translate(text, 'aeiou', 'áéíóü')) AS stripped,
        |       size(ngram_shingles(split(text, '\\s+'), 3)) AS n_shingles
        |FROM documents_v ORDER BY doc_id""".stripMargin)
  }

  lazy val q34OracleSql: String =
    """SELECT doc_id,
      |       strip_accents(translate(text, 'aeiou', 'áéíóü')) AS stripped,
      |       len(list_distinct(CASE WHEN len(string_split_regex(text, '\s+')) < 3 THEN []
      |             ELSE list_transform(generate_series(1, len(string_split_regex(text, '\s+')) - 2),
      |                    i -> string_split_regex(text, '\s+')[i] || ' ' ||
      |                         string_split_regex(text, '\s+')[i+1] || ' ' ||
      |                         string_split_regex(text, '\s+')[i+2]) END)) AS n_shingles
      |FROM documents ORDER BY doc_id""".stripMargin
}

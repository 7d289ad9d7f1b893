package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Parity.round2

/** The reference's four analytical queries (reference `queries.sql:5-58`),
  * re-expressed over the driver's star schema (SURVEY.md §7.1):
  * customer/orders stand in for movies/ratings, region⋈nation⋈customer⋈orders
  * for the 4-way genre join.
  *
  * Scale notes (100 TB north star): every query here groups/joins on the
  * natural key of the fact table's dimension. The dimension side is always
  * the small side — Catalyst auto-broadcasts it, so the only shuffle is the
  * hash-aggregate on the group key, with map-side partial aggregation. Top-k
  * (`orderBy().limit(k)`) plans as `TakeOrderedAndProject`: each partition
  * keeps k rows, no global sort.
  */
object RelationalQueries {

  /** Q1 analog — "highest average rating" (reference `queries.sql:5-14`):
    * top-1 customer by average order price, tie-broken by order count then
    * key (the reference leaves ties SQLite-arbitrary; SURVEY.md §7.4.1 adds
    * the total order).
    */
  def q1TopRated(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    // Aggregate the fact to the join key FIRST (avg ≡ sum/count,
    // map-side partials), then broadcast-join the customer dim onto one
    // row per customer: the join never carries individual orders and the
    // top-1 is a TakeOrdered over customers, not orders.
    val oagg = o.groupBy(o("o_custkey"))
      .agg(sum(o("o_totalprice")).as("price_sum"),
        count(o("o_totalprice")).as("order_count"))
    c.join(oagg, c("c_custkey") === oagg("o_custkey"))
      .select(c("c_custkey").as("custkey"), c("c_name").as("name"),
        round2(col("price_sum") / col("order_count")).as("avg_price"),
        col("order_count"))
      .orderBy(desc("avg_price"), desc("order_count"), asc("custkey"))
      .limit(1)
  }

  lazy val q1OracleSql: String =
    """SELECT c.c_custkey AS custkey, c.c_name AS name,
      |       CAST(ROUND(CAST(AVG(o.o_totalprice) AS DECIMAL(20,10)), 2) AS DOUBLE) AS avg_price,
      |       COUNT(o.o_totalprice) AS order_count
      |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      |GROUP BY c.c_custkey, c.c_name
      |ORDER BY avg_price DESC, order_count DESC, custkey ASC
      |LIMIT 1""".stripMargin

  /** Q2 analog — "top-5 genres by average rating" (reference
    * `queries.sql:19-30`): 4-way star join region⋈nation⋈customer⋈orders,
    * top-5 nations by rounded avg order price, with exact distinct-customer
    * count (A4, `queries.sql:22`).
    *
    * Scale: region/nation/customer are all dimension-side — Catalyst
    * broadcasts them, so the fact table never shuffles for the join. The
    * fact is PRE-AGGREGATED per customer before the join (map-side
    * partials), which (a) shrinks the join input to one row per ordering
    * customer and (b) turns the exact distinct-customer count into a
    * plain `count(*)` — the naive `countDistinct` would plan an Expand
    * that doubles the joined fact through the 25-group aggregate. Same
    * answer; at true 100 TB scale an `approx_count_distinct` variant
    * remains the opt-in for distinct counts that don't pre-group away.
    */
  def q2TopGenres(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir)
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val oagg = o.groupBy(o("o_custkey"))
      .agg(sum(o("o_totalprice")).as("price_sum"),
        count(o("o_totalprice")).as("n_orders"))
    r.join(n, r("r_regionkey") === n("n_regionkey"))
      .join(c, n("n_nationkey") === c("c_nationkey"))
      .join(oagg, c("c_custkey") === oagg("o_custkey"))
      .groupBy(n("n_nationkey").as("nationkey"), n("n_name").as("nation"),
        r("r_name").as("region"))
      .agg(
        round2(sum(col("price_sum")) / sum(col("n_orders"))).as("avg_price"),
        count(lit(1)).as("customer_count"),
        sum(col("n_orders")).as("order_count"))
      .orderBy(desc("avg_price"), desc("order_count"), asc("nation"))
      .limit(5)
  }

  lazy val q2OracleSql: String =
    """SELECT n.n_nationkey AS nationkey, n.n_name AS nation, r.r_name AS region,
      |       CAST(ROUND(CAST(AVG(o.o_totalprice) AS DECIMAL(20,10)), 2) AS DOUBLE) AS avg_price,
      |       COUNT(DISTINCT c.c_custkey) AS customer_count,
      |       COUNT(o.o_totalprice) AS order_count
      |FROM region r
      |JOIN nation n ON r.r_regionkey = n.n_regionkey
      |JOIN customer c ON n.n_nationkey = c.c_nationkey
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |GROUP BY n.n_nationkey, n.n_name, r.r_name
      |ORDER BY avg_price DESC, order_count DESC, nation ASC
      |LIMIT 5""".stripMargin

  /** Q3 analog — "most prolific director with GROUP_CONCAT" (reference
    * `queries.sql:35-44`): per-nation concatenated customer names, top-1 by
    * member count. The reference's `GROUP_CONCAT(title, ', ')` order is
    * SQLite-arbitrary; SURVEY.md §7.4.1 mandates a deterministic order, so
    * both sides sort the names (Spark `sort_array(collect_list(...))`,
    * DuckDB `string_agg(... ORDER BY ...)`).
    *
    * The P2/P3 predicates (`director IS NOT NULL AND director != 'N/A'`,
    * reference `queries.sql:40-41`) map to not-null + inequality filters on
    * the grouped rows. `collect_list` is bounded by group cardinality — a
    * presentation aggregate; at 100 TB you'd cap members per group first.
    *
    * Shape: the aggregate runs BELOW the join — customers partial-aggregate
    * map-side and shuffle as one row per nationkey; the broadcast nation
    * join then touches 25 aggregated rows instead of every joined customer
    * row. Catalyst does not push aggregates through joins itself; measured
    * ~2× on the warm-session floor, and at scale the shuffle shrinks from
    * the fact's row count to the dimension's. Identical semantics: nation
    * keys are the dimension's primary key (grouping by key ≡ grouping by
    * the name the key maps to), and the inner join drops keyless groups
    * either way.
    */
  def q3GroupConcat(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    c.filter(c("c_name").isNotNull && c("c_mktsegment") =!= "MACHINERY")
      .groupBy(c("c_nationkey"))
      .agg(
        count(lit(1)).as("customer_count"),
        concat_ws(", ", sort_array(collect_list(c("c_name")))).as("customers"))
      .join(n, col("c_nationkey") === n("n_nationkey"))
      .select(n("n_name").as("nation"), col("customer_count"), col("customers"))
      .orderBy(desc("customer_count"), asc("nation"))
      .limit(1)
  }

  lazy val q3OracleSql: String =
    """SELECT n.n_name AS nation,
      |       COUNT(*) AS customer_count,
      |       STRING_AGG(c.c_name, ', ' ORDER BY c.c_name) AS customers
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE c.c_name IS NOT NULL AND c.c_mktsegment <> 'MACHINERY'
      |GROUP BY n.n_name
      |ORDER BY customer_count DESC, nation ASC
      |LIMIT 1""".stripMargin

  /** Q4 analog — "average rating by release year" (reference
    * `queries.sql:49-58`): join fact to its parent, group by the year of
    * the dimension date, full DESC sort. The reference's year sort is a
    * string sort over TEXT-affinity years (SURVEY.md §1.2 wart); we use the
    * intended integer semantic — identical output for 4-digit years.
    *
    * Scale: orders⋈lineitem is the one genuinely large join in this family
    * — both sides big, equi-key `orderkey`. The fact side is PRE-AGGREGATED
    * to its join key before the join (sum/count per orderkey, map-side
    * partials): the join then carries one row per order instead of one per
    * line, and `order_count` becomes a plain `count(*)` — the naive form's
    * `countDistinct` would otherwise plan an Expand that DOUBLES the joined
    * fact rows through the year aggregate. Same answer (avg = Σsum/Σcount;
    * per-column null counts preserved), half the rows shuffled, no Expand —
    * the difference between "works at sf0.1" and "works at 100 TB".
    */
  def q4ByYear(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val lagg = l.groupBy(l("l_orderkey"))
      .agg(
        sum(l("l_extendedprice")).as("price_sum"),
        count(l("l_extendedprice")).as("n_price"),
        count(l("l_quantity")).as("n_qty"))
    o.filter(o("o_orderdate").isNotNull)
      .join(lagg, o("o_orderkey") === lagg("l_orderkey"))
      .groupBy(year(o("o_orderdate")).as("order_year"))
      .agg(
        round2(sum(col("price_sum")) / sum(col("n_price"))).as("avg_price"),
        count(lit(1)).as("order_count"),
        sum(col("n_qty")).as("line_count"))
      .orderBy(desc("order_year"))
  }

  lazy val q4OracleSql: String =
    """SELECT CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
      |       CAST(ROUND(CAST(AVG(l.l_extendedprice) AS DECIMAL(20,10)), 2) AS DOUBLE) AS avg_price,
      |       COUNT(DISTINCT o.o_orderkey) AS order_count,
      |       COUNT(l.l_quantity) AS line_count
      |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |WHERE o.o_orderdate IS NOT NULL
      |GROUP BY 1
      |ORDER BY order_year DESC""".stripMargin
}

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
    c.join(o, c("c_custkey") === o("o_custkey"))
      .groupBy(c("c_custkey").as("custkey"), c("c_name").as("name"))
      .agg(
        round2(avg(o("o_totalprice"))).as("avg_price"),
        count(o("o_totalprice")).as("order_count"))
      .orderBy(desc("avg_price"), desc("order_count"), asc("custkey"))
      .limit(1)
  }

  val q1OracleSql: String =
    """SELECT c.c_custkey AS custkey, c.c_name AS name,
      |       CAST(ROUND(CAST(AVG(o.o_totalprice) AS DECIMAL(20,10)), 2) AS DOUBLE) AS avg_price,
      |       COUNT(o.o_totalprice) AS order_count
      |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      |GROUP BY c.c_custkey, c.c_name
      |ORDER BY avg_price DESC, order_count DESC, custkey ASC
      |LIMIT 1""".stripMargin
}

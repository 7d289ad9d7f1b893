package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** As-of join — for each left row, the single right row with the greatest
  * timestamp at-or-before the left row's, per key. The canonical operator
  * Spark lacks natively (point-in-time feature lookups, price-at-trade).
  *
  * Implementation is the classic union composition, not a custom physical
  * operator (SURVEY §2 preference order: compose existing ops first):
  * tag both sides, union, ONE shuffle on the key, then an ordered
  * carry-forward of the latest right payload (`last(..., ignoreNulls)`
  * over rows-unbounded-preceding) and keep the left rows. The right
  * payload travels as one struct so a partially-null payload can never
  * mix fields from different right rows.
  *
  * Hot-key story: like every ordered-per-key computation (see
  * `SetAndJsonQueries.q37WindowAnalytics`), the carry is irreducibly
  * sequential within a key; skew mitigations are upstream (bound
  * rows-per-key or bucket time into the key).
  */
object AsofJoin {

  /** @param left         anchor rows; must carry `key` and `tsCol`
    * @param right        reference rows; reduced to one row per
    *                     (key, tsCol) first (greatest payload tuple wins)
    *                     so ties are deterministic on both engines
    * @param rightPayload right columns to carry (must not collide with
    *                     left's and must be non-null — `ignoreNulls`
    *                     carry-forward would otherwise reach past a null)
    * @return left rows + rightPayload of the latest right row with
    *         right.ts <= left.ts (nulls when none exists)
    */
  def asof(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      rightPayload: Seq[String]): DataFrame = {
    require(rightPayload.intersect(left.columns).isEmpty,
      s"right payload ${rightPayload.mkString(",")} collides with left columns")
    val rUnique = EtlOps.latestByKeyAgg(
      right.select((Seq(key, tsCol) ++ rightPayload).map(col): _*),
      Seq(key, tsCol), rightPayload)
    val leftOther = left.columns.filterNot(c => c == key || c == tsCol).toSeq
    val payloadStruct = struct(rightPayload.map(col): _*)
    val lT = left.select(Seq(col(key), col(tsCol), lit(1).as("__tag")) ++
      leftOther.map(col) :+
      lit(null).cast(rUnique.select(payloadStruct).schema.head.dataType)
        .as("__r"): _*)
    val rT = rUnique.select(Seq(col(key), col(tsCol), lit(0).as("__tag")) ++
      leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
      payloadStruct.as("__r"): _*)
    // right (tag 0) sorts before left (tag 1) at equal ts => "at-or-before"
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lT.unionByName(rT)
      .withColumn("__carried", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(Seq(col(key), col(tsCol)) ++ leftOther.map(col) ++
        rightPayload.map(c => col(s"__carried.$c").as(c)): _*)
  }

  /** q45 — point-in-time lookup over the events table: each purchase
    * paired with the user's most recent click at-or-before it, any age
    * (contrast q44's bounded window). DuckDB's native ASOF LEFT JOIN is
    * the oracle, which makes this a cross-engine semantic check of the
    * union-composition against a first-class implementation.
    */
  def q45AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id").as("purchase_id"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id").as("click_id"),
        unix_micros(col("ts")).as("click_ts"))
    asof(p, c, "user_id", "ts_us", Seq("click_id", "click_ts"))
      .select(col("purchase_id"), col("user_id"),
        col("ts_us").as("purchase_ts"), col("click_id"), col("click_ts"))
      .orderBy("purchase_id")
  }

  lazy val q45OracleSql: String =
    """WITH p AS (
      |  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS ts_us
      |  FROM events WHERE event_type = 'purchase'
      |), c AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, MAX(event_id) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2
      |)
      |SELECT p.purchase_id, p.user_id, p.ts_us AS purchase_ts,
      |       c.click_id, c.ts_us AS click_ts
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
      |ORDER BY purchase_id""".stripMargin
}

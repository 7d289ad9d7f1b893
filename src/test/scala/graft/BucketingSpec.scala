package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketing

/** Bucketed co-located join: same-bucketed tables must join without a
  * shuffle exchange on either side, and produce the same result as the
  * plain join.
  */
class BucketingSpec extends SparkSpec {

  test("same-bucketed orders/lineitem join plans without shuffle exchanges") {
    val o = graft.Tables.orders(spark, sf)
    val l = graft.Tables.lineitem(spark, sf)
    Bucketing.writeBucketed(o, "orders_b", "o_orderkey", 4)
    Bucketing.writeBucketed(
      l.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b",
      "o_orderkey", 4)

    val joined = Bucketing.table(spark, "orders_b")
      .join(Bucketing.table(spark, "lineitem_b"), "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString

    assert(!plan.contains("Exchange hashpartitioning"), plan.take(800))
    val expected = o.join(l, o("o_orderkey") === l("l_orderkey")).count()
    assert(joined.count() == expected)
  }
}

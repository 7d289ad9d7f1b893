package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.PartitionedLayout

class ScaleToolsSpec extends SparkSpec {
  import spark.implicits._

  test("date-partitioned layout prunes partitions for date predicates") {
    val dir = Files.createTempDirectory("graft_part").toString + "/events"
    val events = graft.Tables.events(spark, sf)
    PartitionedLayout.writeByDate(events, dir)

    val pruned = PartitionedLayout.read(spark, dir)
      .filter(col("event_date") === "2024-01-02")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(500))
    // pruning must not change results
    val expected = events.filter(to_date(col("ts")) === "2024-01-02").count()
    assert(pruned.count() == expected && expected > 0)
  }

  test("saltedJoin equals the plain join exactly") {
    val big = graft.Tables.orders(spark, sf)
    val small = graft.Tables.customer(spark, sf)
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = big.join(small, "o_custkey")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"), sum("o_totalprice").as("s"))
      .as[(Int, Long, Double)].collect().toSet
    val salted = Skew.saltedJoin(big, small, "o_custkey", saltFactor = 8)
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"), sum("o_totalprice").as("s"))
      .as[(Int, Long, Double)].collect().toSet
    assert(salted.map(t => (t._1, t._2)) == plain.map(t => (t._1, t._2)))
  }

  test("saltedAggregate composes partial+final sums exactly") {
    val e = graft.Tables.events(spark, sf)
    val plain = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("s"))
      .select("event_type", "n").as[(String, Long)].collect().toSet
    val salted = Skew.saltedAggregate(e, "event_type", 8,
        partial = Seq(count(lit(1)).as("pn"), sum("value").as("ps")),
        finalAgg = Seq(sum("pn").as("n"), sum("ps").as("s")))
      .select("event_type", "n").as[(String, Long)].collect().toSet
    assert(salted == plain)
  }
}

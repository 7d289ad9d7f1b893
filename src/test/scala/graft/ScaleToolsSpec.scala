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

  test("AQE splits a skewed join partition at runtime") {
    // the runtime half of the skew story (salting is the planned half):
    // one key owning most of a side must be split by AQE's skew-join
    // rule, visible as skew=true on the executed SortMergeJoin.
    // Thresholds are lowered to fire at test scale — production uses the
    // defaults (256 MB partitions).
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~90% of rows land on key 0; payload pads bytes so the skewed
      // partition crosses the lowered threshold
      val left = spark.range(200000)
        .select(when(col("id") % 10 === 0, col("id") % 100).otherwise(0L).as("k"),
          concat_ws("-", col("id"), lit("x" * 64)).as("payload"))
      val right = spark.range(100)
        .select(col("id").as("k"), col("id").as("dim"))
      val joined = left.join(right, "k")
      // act through the df's own query execution so AQE finalizes THIS
      // plan (a count() or sink write runs a separate QueryExecution)
      assert(joined.collect().length == 200000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        "AQE did not mark the skewed join:\n" + p.take(900))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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

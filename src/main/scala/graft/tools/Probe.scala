package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main for plan/behavior probes during development. Not part of
  * the driver contract.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.01"

    // partition-pruned layout
    val dir = java.nio.file.Files.createTempDirectory("probe_part").toString + "/e"
    val events = graft.Tables.events(spark, sf)
    graft.sources.PartitionedLayout.writeByDate(events, dir)
    val pruned = graft.sources.PartitionedLayout.read(spark, dir)
      .filter(col("event_date") === "2024-01-03")
    val scanLine = pruned.queryExecution.executedPlan.toString
      .linesIterator.find(l => l.contains("PartitionFilters")).getOrElse("NO PartitionFilters")
    println("[probe] scan: " + scanLine.trim.take(600))
    println(s"[probe] pruned rows: ${pruned.count()}, expected: " +
      events.filter(to_date(col("ts")) === "2024-01-03").count())
    val dirs = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("event_date")).sorted
    println(s"[probe] partition dirs: ${dirs.length} (first: ${dirs.headOption.getOrElse("")})")

    // salted join parity
    val big = graft.Tables.orders(spark, sf)
    val small = graft.Tables.customer(spark, sf).withColumnRenamed("c_custkey", "o_custkey")
    val plain = big.join(small, "o_custkey").count()
    val salted = graft.operators.Skew.saltedJoin(big, small, "o_custkey", 8).count()
    println(s"[probe] plain join rows: $plain, salted join rows: $salted")
    // probe: saltFactor = 1 degenerates to the plain join
    val salt1 = graft.operators.Skew.saltedJoin(big, small, "o_custkey", 1).count()
    println(s"[probe] saltFactor=1 rows: $salt1")

    // bucketed co-located join: shuffle-free plan at the library surface
    val ob = graft.Tables.orders(spark, sf)
    val lb = graft.Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey")
    graft.sources.Bucketing.writeBucketed(ob, "probe_orders_b", Seq("o_orderkey"), 4)
    graft.sources.Bucketing.writeBucketed(lb, "probe_lineitem_b", Seq("o_orderkey"), 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val bj = graft.sources.Bucketing.table(spark, "probe_orders_b")
      .join(graft.sources.Bucketing.table(spark, "probe_lineitem_b"), "o_orderkey")
    val bplan = bj.queryExecution.executedPlan.toString
    println("[probe] bucketed exchanges: " + bplan.linesIterator.count(_.contains("Exchange")))
    println("[probe] bucketed join node: " + bplan.linesIterator.find(_.contains("Join")).getOrElse("?").trim.take(120))
    println(s"[probe] bucketed rows: ${bj.count()} plain rows: ${ob.join(lb, "o_orderkey").count()}")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
    spark.stop()
  }
}

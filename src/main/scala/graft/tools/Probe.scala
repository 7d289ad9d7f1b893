package graft.tools

import org.apache.spark.sql.SparkSession

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
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    e.printSchema()
    e.selectExpr("event_id", "ts", "timestamp_micros(ts div 1000) AS ts_us")
      .show(3, truncate = false)
    spark.stop()
  }
}

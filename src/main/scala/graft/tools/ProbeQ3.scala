package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch main: dissect q3_group_concat's warm-session floor at sf0.1.
  * Not part of the driver contract.
  */
object ProbeQ3 {
  private def time(label: String, n: Int)(f: => Unit): Unit = {
    val times = (1 to n).map { _ =>
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e6
    }.sorted
    println(f"[probe] $label%-28s median=${times(n / 2)}%8.1f ms  min=${times.head}%8.1f ms")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tables

    def materialize(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def aggFirst(): DataFrame = {
      val n = Tables.nation(spark, dir)
      val c = Tables.customer(spark, dir)
      c.filter(c("c_name").isNotNull && c("c_mktsegment") =!= "MACHINERY")
        .groupBy(c("c_nationkey"))
        .agg(count(lit(1)).as("customer_count"),
          concat_ws(", ", sort_array(collect_list(c("c_name")))).as("customers"))
        .join(n, col("c_nationkey") === n("n_nationkey"))
        .select(n("n_name").as("nation"), col("customer_count"), col("customers"))
        .orderBy(desc("customer_count"), asc("nation"))
        .limit(1)
    }

    val q3 = graft.operators.RelationalQueries.q3GroupConcat _

    // warm everything
    (1 to 3).foreach { _ =>
      materialize(q3(spark, dir)); materialize(aggFirst())
    }

    time("q3 as-is (noop)", 11) { materialize(q3(spark, dir)) }
    time("q3 as-is (collect)", 11) { q3(spark, dir).collect() }
    time("agg-before-join (noop)", 11) { materialize(aggFirst()) }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    (1 to 2).foreach(_ => materialize(q3(spark, dir)))
    time("q3 AQE off (noop)", 11) { materialize(q3(spark, dir)) }
    time("agg-first AQE off (noop)", 11) { materialize(aggFirst()) }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // how much is pure planning + scheduling? an empty-result query
    time("floor: filter-false scan", 11) {
      materialize(Tables.customer(spark, dir).filter(lit(false))
        .groupBy("c_nationkey").agg(count(lit(1))))
    }
    spark.stop()
  }
}

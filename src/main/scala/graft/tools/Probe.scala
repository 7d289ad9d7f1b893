package graft.tools

import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.01"
    def exchanges(name: String): Unit = {
      val plan = graft.SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      val ex = plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("BroadcastHashJoin") ||
        l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")).toSeq
      println(s"[probe] $name: ${ex.size} join/exchange lines")
      ex.foreach(l => println("   " + l.trim.take(150)))
    }
    Seq("q18_dedup_minhash", "q19_dedup_simhash", "q41_corpus_select").foreach(exchanges)
  }
}

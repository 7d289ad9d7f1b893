package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main: print the executed (post-AQE) plan of named SparkEntry
  * queries after running them once. Not part of the driver contract.
  * Usage: runMain graft.tools.ExplainQ <sfDir> <name...>
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q1_top_rated")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.collect() // finalize AQE on THIS query execution
      println(s"==== $n ====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}

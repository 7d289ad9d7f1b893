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
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def summarize(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.executedPlan.toString
      val joins = plan.linesIterator.filter(_.contains("Join"))
        .map(_.trim.takeWhile(_ != '(')).toSeq.distinct
      val scans = plan.linesIterator.filter(_.contains("ReadSchema"))
        .map(_.trim.take(160)).toSeq
      val codegen = plan.linesIterator.count(_.contains("WholeStageCodegen"))
      println(s"== $name: joins=${joins.mkString("[", ", ", "]")} codegenSpans=$codegen")
      scans.foreach(s => println(s"   scan: $s"))
    }

    summarize("q2_top_genres", graft.operators.RelationalQueries.q2TopGenres(spark, dir))
    summarize("q4_by_year", graft.operators.RelationalQueries.q4ByYear(spark, dir))
    summarize("q16_enrichment", graft.operators.CandidateJoin.q16EnrichmentJoin(spark, dir))
    summarize("q22_cosine_topk", graft.operators.Similarity.q22CosineTopK(spark, dir))
    summarize("q24_text_stats", graft.operators.TextAnalysis.q24TextStats(spark, dir))
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main: isolate the per-task overhead of many-task SQL stages in
  * this sandbox. Times the same tiny aggregate over documents at 1 / 8 /
  * 32 partitions and prints per-stage CPU totals. Not driver contract.
  */
object FanProbe {
  private final class L extends SparkListener {
    @volatile var cpu = 0L
    @volatile var run = 0L
    @volatile var tasks = 0
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      cpu += sc.stageInfo.taskMetrics.executorCpuTime / 1000000L
      run += sc.stageInfo.taskMetrics.executorRunTime
      tasks += sc.stageInfo.numTasks
    }
    def reset(): Unit = { cpu = 0; run = 0; tasks = 0 }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val l = new L
    spark.sparkContext.addSparkListener(l)
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def round(tag: String, n: Int): Unit = {
      (1 to 4).foreach { i =>
        val df0 = if (n <= 1) d else d.repartition(n, col("doc_id"))
        val df = df0.select(col("doc_id"), length(col("text")).as("len"))
          .groupBy(col("doc_id") % 7).agg(sum("len"))
        if (i == 4) {
          Thread.sleep(200); l.reset()
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(200)
          println(f"[fanprobe] $tag%-6s wall=$dt%.3f s cpu=${l.cpu} ms run=${l.run} ms tasks=${l.tasks}")
        } else df.write.format("noop").mode("overwrite").save()
      }
    }
    round("p1", 1); round("p8", 8); round("p32", 32)
    // same but with a plain long column (no strings) to see if overhead
    // tracks row width
    def round2(tag: String, n: Int): Unit = {
      (1 to 4).foreach { i =>
        val df = d.select(col("doc_id")).repartition(n, col("doc_id"))
          .groupBy(col("doc_id") % 7).agg(count(lit(1)))
        if (i == 4) {
          Thread.sleep(200); l.reset()
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(200)
          println(f"[fanprobe] $tag%-6s wall=$dt%.3f s cpu=${l.cpu} ms run=${l.run} ms tasks=${l.tasks}")
        } else df.write.format("noop").mode("overwrite").save()
      }
    }
    round2("k8", 8); round2("k32", 32)
    spark.stop()
  }
}

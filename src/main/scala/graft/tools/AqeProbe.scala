package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main: time named queries under AQE on vs off in one JVM, to
  * attribute the inter-stage driver gap (AQE replanning vs scheduling).
  * Not part of the driver contract.
  */
object AqeProbe {
  private def sess(aqe: Boolean): SparkSession = {
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.adaptive.coalescePartitions.enabled", aqe.toString)
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.sql.optimizer.windowGroupLimitThreshold", "2048")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q157_packed_release", "q107_rm3_expansion")
    val spark = sess(aqe = true)
    if (graft.Artifacts.root.isEmpty)
      graft.Artifacts.setRoot(
        java.nio.file.Files.createTempDirectory("graft-aqe").toString)
    graft.Artifacts.materialize(spark, sfDir)
    graft.Artifacts.materializeEmbeddings(spark, sfDir)
    graft.Artifacts.materializeTrainedTokenCounts(spark, sfDir)
    graft.Artifacts.materializeNearDupTruth(spark, sfDir)
    graft.Artifacts.materializeLshCalibration(spark, sfDir)
    graft.Artifacts.materializeAnnEvals(spark, sfDir)
    graft.Artifacts.materializeEvalContamination(spark, sfDir)
    graft.sources.PackedExport.prepareStanding(spark, sfDir)
    graft.Checkpoints.releaseAll(blocking = true)
    def time(s: SparkSession, n: String): Double = {
      (1 to 2).foreach { _ =>
        graft.SparkEntry.queries(n)(s, sfDir).write.format("noop")
          .mode("overwrite").save()
        graft.Checkpoints.releaseAll(blocking = true)
      }
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(s, sfDir).write.format("noop")
          .mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.Checkpoints.releaseAll(blocking = true)
        dt
      }
      ts.sorted.apply(1)
    }
    names.foreach { n =>
      println(f"[aqe] on  $n%-26s ${time(spark, n)}%.3f s")
    }
    // same JVM, new session with AQE off (JIT already warm)
    spark.stop()
    val off = sess(aqe = false)
    names.foreach { n =>
      println(f"[aqe] off $n%-26s ${time(off, n)}%.3f s")
    }
    off.stop()
  }
}

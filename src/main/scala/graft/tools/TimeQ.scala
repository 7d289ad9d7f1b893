package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch main: time named SparkEntry queries (args: sfDir name...).
  * Not part of the driver contract. `SPARK_GRAFT_TIMEQ_ARTIFACTS=1`
  * materializes the corpus artifacts first (build time printed) and
  * times queries in artifact mode — the Bench posture; default stays
  * inline so both modes are one env var apart for adjudication.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q20_ngram_jaccard", "q40_dedup_keepers")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("SPARK_GRAFT_TIMEQ_ARTIFACTS")) {
      if (graft.Artifacts.root.isEmpty)
        graft.Artifacts.setRoot(
          java.nio.file.Files.createTempDirectory("graft-timeq-artifacts").toString)
      val t0 = System.nanoTime()
      graft.Artifacts.materialize(spark, sfDir)
      println(f"[timeq] artifact_build          ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm the JVM/codegen once: prefer the sibling smallest scale if the
    // standard layout is present, else warm on the target dir itself
    val warmDir = {
      val std = "/root/testdata/sf0.001"
      if (new java.io.File(std).isDirectory) std else sfDir
    }
    names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, warmDir).collect()
      graft.Checkpoints.releaseAll(blocking = true)
    }
    names.foreach { n =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).collect()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.Checkpoints.releaseAll(blocking = true)
        dt
      }
      println(f"[timeq] $n%-24s median=${times.sorted.apply(1)}%.3f  runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}

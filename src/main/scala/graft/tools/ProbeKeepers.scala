package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the INLINE keeper chain: times each phase
  * (exact edges, jaccard pairs, CC fixpoint, parquet write) of
  * `Dedup.keeperAssignmentFrom` in isolation. NOTE that
  * `Artifacts.materialize` no longer runs this chain — it builds
  * keepers from the committed digest + pair artifacts
  * (`keeperAssignmentFromParts`) and pays only the CC fixpoint; the
  * pair self-join profiled here now lives in the `dup_pairs` build.
  * Not part of the driver contract.
  */
object ProbeKeepers {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val root = java.nio.file.Files.createTempDirectory("probe-keepers").toString
    graft.Artifacts.setRoot(root)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // full materialize once — prints the breakdown we already know
    time("materialize (all)") { graft.Artifacts.materialize(spark, sf) }
    graft.Artifacts.lastBuildSeconds.toSeq.sortBy(-_._2).foreach { case (k, v) =>
      println(f"[probe]   build $k%-24s $v%.3f s")
    }

    // now phase-time the keepers build against the committed postings
    val docs = graft.Tables.documents(spark, sf)
    val postings = graft.Artifacts.ngramPostings(spark, sf)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (round <- 1 to 3) {
      println(s"[probe] --- pass $round ---")
      graft.Checkpoints.scoped {
        val hashed = docs.select(md5(col("text")).as("h"), col("doc_id"))
        val roots = hashed.groupBy("h").agg(min("doc_id").as("root"))
        val exactEdges = hashed.join(roots, "h")
          .filter(col("doc_id") =!= col("root"))
          .select(col("root").as("src"), col("doc_id").as("dst"))
        time("exact edges (md5 scan)")(noop(exactEdges))
        time("jaccard from postings")(
          noop(graft.operators.Dedup.jaccardPairs(postings)))
      }
      graft.Checkpoints.releaseAll(blocking = true)
      graft.Checkpoints.scoped {
        // construction is eager: sym-edge checkpoint (evaluates the whole
        // edge derivation) + fixpoint rounds all run here
        val full = time("keeperAssignmentFrom CONSTRUCT")(
          graft.operators.Dedup.keeperAssignmentFrom(docs, postings))
        time("keepers write") {
          full.write.mode("overwrite").parquet(s"$root/probe_keepers_out")
        }
      }
      graft.Checkpoints.releaseAll(blocking = true)
    }
    spark.stop()
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The standing near-dup ground truth (`neardup_truth`): artifact ≡
  * the guarded inline brute force, the O(n²) pass never reappears in
  * the artifact-mode plan, the over-cap no-op leaves q21's refusal
  * loud, and a mutated embeddings tree is never served stale pairs.
  */
class NearDupTruthArtifactSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("artifact ≡ inline, and the committed truth retires the cross join") {
    val inline = rows(Dedup.q21EmbeddingNearDup(spark, sf))
    val root = Files.createTempDirectory("graft-truth-root").toFile
    try {
      Artifacts.setRoot(root.getAbsolutePath)
      assert(Artifacts.materializeNearDupTruth(spark, sf) >= 0L)
      val df = Dedup.q21EmbeddingNearDup(spark, sf)
      assert(rows(df) == inline, "artifact-mode q21 drifted from inline")
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains(root.getName),
        "q21 plan does not read the artifact root:\n" + p.take(600))
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoop"),
        "artifact-mode q21 still pays the O(n²) pair scan:\n" + p.take(600))
      // idempotent: a second materialize call skips (committed count)
      assert(Artifacts.materializeNearDupTruth(spark, sf) >= 0L)
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(root)
      Checkpoints.releaseAll()
    }
  }

  test("over-cap corpora get no truth artifact; q21 refuses exactly as inline") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-truth-cap-root").toFile
    val corpusParent = Files.createTempDirectory("graft-truth-cap").toFile
    val corpus = s"${corpusParent.getPath}/c"
    try {
      val n = (Dedup.MaxBruteForceVectors + 1).toInt
      spark.range(n.toLong)
        .select(col("id").as("vec_id"),
          array(lit(1.0f), lit(0.0f)).as("embedding"),
          lit("x").as("label"))
        .write.parquet(s"$corpus/embeddings.parquet")
      Tables.invalidate(corpus)
      Artifacts.setRoot(root.getAbsolutePath)
      assert(Artifacts.materializeNearDupTruth(spark, corpus) == -1L,
        "an over-cap corpus must be a build no-op, not an O(n²) attempt")
      val err = intercept[IllegalArgumentException] {
        Dedup.q21EmbeddingNearDup(spark, corpus).collect()
      }
      assert(err.getMessage.contains("capped"),
        s"q21's refusal must stay loud in artifact mode: ${err.getMessage}")
    } finally {
      Artifacts.clearRoot()
      Tables.invalidate(corpus)
      deleteRecursively(root)
      deleteRecursively(corpusParent)
      Checkpoints.releaseAll()
    }
  }

  test("a mutated embeddings tree is never served the stale truth") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-truth-stale-root").toFile
    val corpusParent = Files.createTempDirectory("graft-truth-stale").toFile
    val corpus = s"${corpusParent.getPath}/c"
    try {
      spark.read.parquet(s"$sf/embeddings.parquet")
        .write.parquet(s"$corpus/embeddings.parquet")
      Tables.invalidate(corpus)
      Artifacts.setRoot(root.getAbsolutePath)
      assert(Artifacts.materializeNearDupTruth(spark, corpus) >= 0L)
      // shrink the table in place → fingerprint moves → fallback inline
      val shrunk = spark.read.parquet(s"$corpus/embeddings.parquet")
        .filter(col("vec_id") < 40).collect().toSeq
      val schema = spark.read.parquet(s"$corpus/embeddings.parquet").schema
      spark.createDataFrame(
          spark.sparkContext.parallelize(shrunk), schema)
        .write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
      Tables.invalidate(corpus)
      val got = rows(Dedup.q21EmbeddingNearDup(spark, corpus))
      val fresh = rows(Dedup.embeddingNearDupPairsFrom(
        Tables.embeddings(spark, corpus)))
      assert(got == fresh,
        "stale truth must never be served — inline over the new table")
    } finally {
      Artifacts.clearRoot()
      Tables.invalidate(corpus)
      deleteRecursively(root)
      deleteRecursively(corpusParent)
      Checkpoints.releaseAll()
    }
  }
}

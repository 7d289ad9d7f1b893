package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Ivf, Multimodal}

/** The image-IVF standing state (`image_ivf_centroids` /
  * `image_ivf_cells`): artifact ≡ inline, DOCUMENTS-fp keyed (stale
  * the moment documents move, indifferent to embeddings moves — the
  * staleness twin of `EmbeddingArtifactsSpec`'s independence test),
  * and never served stale in either direction.
  */
class ImageIvfArtifactsSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("artifact ≡ inline: committed centroids/cells equal a fresh deterministic train") {
    val root = Files.createTempDirectory("graft-iivf-root").toFile
    try {
      Artifacts.setRoot(root.getAbsolutePath)
      Artifacts.materialize(spark, sf)
      assert(Artifacts.isMaterialized(spark, sf, Artifacts.ImageIvfCentroidsName))
      assert(Artifacts.isMaterialized(spark, sf, Artifacts.ImageIvfCellsName))
      val (cents, cells) = Artifacts.imageIvfModel(spark, sf)
      val quant = Multimodal.imageQuantRows(
        Multimodal.imageGridRows(Tables.documents(spark, sf)))
      val freshCents = Ivf.train(graft.Checkpoints.checkpoint(quant))
      assert(cents.map { case (k, c) => (k, c.toSeq) } ==
        freshCents.map { case (k, c) => (k, c.toSeq) },
        "committed image centroids drifted from the deterministic train")
      assert(rows(cells) == rows(Ivf.assignFrame(quant, freshCents)),
        "committed image cells drifted from assignment under fresh centroids")
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(root)
      Checkpoints.releaseAll()
    }
  }

  test("staleness keys to the documents tree; embeddings moves don't touch it") {
    val root = Files.createTempDirectory("graft-iivf-stale-root").toFile
    val corpusParent = Files.createTempDirectory("graft-iivf-stale").toFile
    val corpus = s"${corpusParent.getPath}/c"
    try {
      for (t <- Seq("documents", "embeddings")) {
        spark.read.parquet(s"$sf/$t.parquet")
          .write.mode("overwrite").parquet(s"$corpus/$t.parquet")
      }
      Tables.invalidate(corpus)
      Artifacts.setRoot(root.getAbsolutePath)
      Artifacts.materialize(spark, corpus)
      assert(Artifacts.isMaterialized(spark, corpus,
        Artifacts.ImageIvfCentroidsName))

      // 1) embeddings mutate → the image IVF (documents-keyed) is
      // untouched: grid vectors derive from documents, not embeddings
      val shrunk = spark.read.parquet(s"$corpus/embeddings.parquet")
        .filter(col("vec_id") < 40)
      val shrunkRows = shrunk.collect().toSeq
      spark.createDataFrame(
          spark.sparkContext.parallelize(shrunkRows), shrunk.schema)
        .write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
      Tables.invalidate(corpus)
      assert(Artifacts.isMaterialized(spark, corpus,
        Artifacts.ImageIvfCentroidsName),
        "embeddings mutation must NOT stale the image IVF")

      // 2) documents mutate → stale, and the consumer model falls back
      // to a correct inline train over the NEW corpus
      val docsFrame = spark.read.parquet(s"$corpus/documents.parquet")
        .limit(100)
      val docRows = docsFrame.collect().toSeq
      spark.createDataFrame(
          spark.sparkContext.parallelize(docRows), docsFrame.schema)
        .write.mode("overwrite").parquet(s"$corpus/documents.parquet")
      Tables.invalidate(corpus)
      Artifacts.invalidateFingerprint(corpus)
      assert(!Artifacts.isMaterialized(spark, corpus,
        Artifacts.ImageIvfCentroidsName),
        "documents mutation must stale the image IVF")
      val (cents, cells) = Artifacts.imageIvfModel(spark, corpus)
      val quantNew = Multimodal.imageQuantRows(
        Multimodal.imageGridRows(Tables.documents(spark, corpus)))
      val freshCents = Ivf.train(graft.Checkpoints.checkpoint(quantNew))
      assert(cents.map { case (k, c) => (k, c.toSeq) } ==
        freshCents.map { case (k, c) => (k, c.toSeq) },
        "stale centroids must never be served — inline over new data")
      assert(rows(cells) == rows(Ivf.assignFrame(quantNew, freshCents)))

      // re-materialize against the new fingerprint → resolves again
      Artifacts.materialize(spark, corpus)
      assert(Artifacts.isMaterialized(spark, corpus,
        Artifacts.ImageIvfCentroidsName))
    } finally {
      Artifacts.clearRoot()
      Tables.invalidate(corpus)
      deleteRecursively(root)
      deleteRecursively(corpusParent)
      Checkpoints.releaseAll()
    }
  }
}

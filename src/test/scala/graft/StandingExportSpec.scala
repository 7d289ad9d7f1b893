package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusOps
import graft.sources.PackedExport

/** The packed-export STANDING store: served deliverables equal the
  * inline round-trip row-for-row, a committed key is never rebuilt
  * (write + byte-verify once per snapshot), and a changed corpus is
  * never served stale bytes — the `Artifacts` commit discipline
  * applied to the binary deliverable itself.
  */
class StandingExportSpec extends SparkSpec {

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("standing deliverable ≡ inline round-trip (full corpus and curated cut)") {
    try {
      assert(rowsOf(PackedExport.q127PackedExport(spark, sf)) ==
        rowsOf(PackedExport.packedRoundTrip(spark, sf,
          CorpusOps.ExportOrder.ByDocId)),
        "doc_id deliverable drifted from the inline read-back")
      val kept = operators.Curation.q138CurationLedger(spark, sf)
        .filter(col("keep")).select("doc_id")
      assert(rowsOf(PackedExport.q156PackedCurated(spark, sf)) ==
        rowsOf(PackedExport.packedRoundTrip(spark, sf,
          CorpusOps.ExportOrder.ByDocId, members = Some(kept),
          memberTag = "curated")),
        "curated deliverable drifted from the inline read-back")
    } finally Checkpoints.releaseAll()
  }

  test("a committed deliverable is served, never rebuilt") {
    try {
      PackedExport.q127PackedExport(spark, sf).collect()
      val afterFirst = PackedExport.buildsPerformed.get()
      val again = PackedExport.q127PackedExport(spark, sf).collect()
      assert(again.nonEmpty)
      assert(PackedExport.buildsPerformed.get() == afterFirst,
        "retry of a committed snapshot must skip the build")
    } finally Checkpoints.releaseAll()
  }

  test("a changed corpus resolves to a fresh key; the superseded key is swept") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-standing").toFile
    val corpus = new java.io.File(tmp, "corpus").getAbsolutePath
    val store = new java.io.File(PackedExport.storeRoot(corpus))
    try {
      Seq((1L, "a b a", "s"), (2L, "b c", "s"))
        .toDF("doc_id", "text", "source")
        .write.parquet(s"$corpus/documents.parquet")
      val first = PackedExport.q127PackedExport(spark, corpus).collect()
      assert(first.map(_.getAs[Long]("shard_tokens")).sum == 5L)
      val builds1 = PackedExport.buildsPerformed.get()

      // rewrite the corpus in place: the old deliverable's key no
      // longer resolves, the new snapshot builds, the old key is swept
      Seq((1L, "a b a", "s"), (2L, "b c", "s"), (3L, "d d d d", "s"))
        .toDF("doc_id", "text", "source")
        .write.mode("overwrite").parquet(s"$corpus/documents.parquet")
      Tables.invalidate(corpus)
      Artifacts.invalidateFingerprint(corpus)
      val second = PackedExport.q127PackedExport(spark, corpus).collect()
      assert(second.map(_.getAs[Long]("shard_tokens")).sum == 9L,
        "served bytes must reflect the NEW corpus, never the stale key")
      assert(PackedExport.buildsPerformed.get() == builds1 + 1)
      val keys = new java.io.File(store, "doc_id").listFiles()
        .filter(f => f.isDirectory && !f.getName.startsWith("_"))
      assert(keys.length == 1, "superseded key must be swept after commit")

      // and the fresh key is itself committed state now: served on retry
      PackedExport.q127PackedExport(spark, corpus).collect()
      assert(PackedExport.buildsPerformed.get() == builds1 + 1)
    } finally {
      Tables.invalidate(corpus)
      deleteRecursively(tmp)
      deleteRecursively(store)
      Checkpoints.releaseAll()
    }
  }

  test("a stranded stage directory neither breaks the build nor is mistaken for a key") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-standing-strand")
      .toFile
    val corpus = new java.io.File(tmp, "corpus").getAbsolutePath
    val store = new java.io.File(PackedExport.storeRoot(corpus), "doc_id")
    try {
      Seq((1L, "a b", "s"), (2L, "c d e", "s"))
        .toDF("doc_id", "text", "source")
        .write.parquet(s"$corpus/documents.parquet")
      // a crash mid-build leaves an underscore-prefixed stage sibling;
      // the next build must proceed, and the key sweep must leave the
      // possibly-in-flight stage alone (underscore = not a key)
      store.mkdirs()
      new java.io.File(store, "_crashed__stage").mkdirs()
      val out = PackedExport.q127PackedExport(spark, corpus).collect()
      assert(out.map(_.getAs[Long]("shard_tokens")).sum == 5L)
      val entries = store.listFiles().map(_.getName)
      assert(entries.count(!_.startsWith("_")) == 1,
        s"exactly one committed key expected, got ${entries.mkString(",")}")
      assert(entries.contains("_crashed__stage"),
        "the sweep must never delete an underscore-prefixed stage sibling")
    } finally {
      Tables.invalidate(corpus)
      deleteRecursively(tmp)
      deleteRecursively(new java.io.File(PackedExport.storeRoot(corpus)))
      Checkpoints.releaseAll()
    }
  }

  test("the verified commit ships its own read-back: verify ⋈ manifest is total") {
    // every manifest shard resolves a stream_sum (zero-token shards to
    // 0), and the served n_bytes are exactly 4·shard_tokens — the
    // byte-level proof rides inside the deliverable
    val served = PackedExport.q127PackedExport(spark, sf).collect()
    try {
      assert(served.nonEmpty)
      served.foreach { r =>
        assert(r.getAs[Long]("n_bytes") ==
          PackedExport.BytesPerToken * r.getAs[Long]("shard_tokens"))
        assert(!r.isNullAt(r.fieldIndex("stream_sum")))
        if (r.getAs[Long]("shard_tokens") > 0)
          assert(r.getAs[Long]("stream_sum") > 0L)
      }
    } finally Checkpoints.releaseAll()
  }
}

package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** The streaming intake journey, end-to-end: a crawl stream is
  * content-hash deduped (bounded state via watermark), quality-gated, and
  * landed through the idempotent keyed upsert sink — composing
  * `dedupStream`, the q24-style signal expressions, and `upsertSink`
  * exactly as a continuous corpus-ingest job would. Asserts the landed
  * corpus is exactly-once per content hash across re-deliveries.
  */
case class RawDoc(doc_id: Long, ts: Timestamp, text: String)

case class IngestDoc(doc_id: Long, text: String, source: String)

case class IngestVec(vec_id: Long, embedding: Array[Float], label: Int)

class StreamingIntakeSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")

  test("continuous intake maintains artifacts ≡ a cold materialize of the final corpus") {
    // artifactMaintainingIntake closes the ingest loop: each micro-batch
    // appends documents idempotently AND carries every standing artifact
    // across the append. After three batches — including an exact
    // duplicate and a cross-batch re-delivery — the live artifacts must
    // hash-equal a from-scratch materialize of the final corpus.
    val liveRoot = Files.createTempDirectory("graft-intake-live").toFile
    val coldRoot = Files.createTempDirectory("graft-intake-cold").toFile
    val corpus = Files.createTempDirectory("graft-intake-corpus").toString + "/c"
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    def artifactRows(root: java.io.File): Map[String, Seq[String]] = {
      // point the session at THIS root for the read (live vs cold)
      val prev = Artifacts.root
      Artifacts.setRoot(root.getAbsolutePath)
      try Artifacts.AllNames.map { n =>
        assert(Artifacts.isMaterialized(spark, corpus, n), s"$n not committed")
        n -> rows(Artifacts.readCommitted(spark, corpus, n))
      }.toMap
      finally prev.foreach(Artifacts.setRoot)
    }
    val input = MemoryStream[IngestDoc](spark)
    try {
      Artifacts.setRoot(liveRoot.getAbsolutePath)
      val q = StreamingOps.artifactMaintainingIntake(
        input.toDF(), spark, corpus)
      try {
        // batch 1: bootstrap (empty corpus → full materialize fallback)
        input.addData(
          IngestDoc(1L, "alpha beta gamma delta epsilon zeta", "s1"),
          IngestDoc(2L, "one two three four five six", "s1"))
        q.processAllAvailable()
        // batch 2: append path, incl. an exact duplicate of doc 1
        input.addData(
          IngestDoc(3L, "alpha beta gamma delta epsilon zeta", "s2"),
          IngestDoc(4L, "seven eight nine ten eleven twelve", "s2"))
        q.processAllAvailable()
        // batch 3: a re-delivery of doc 2 (different text — first write
        // wins on BOTH legs) plus a genuinely new doc
        input.addData(
          IngestDoc(2L, "redelivered text that must be ignored", "s1"),
          IngestDoc(5L, "one two three four five six seven", "s3"))
        q.processAllAvailable()
      } finally q.stop()

      Tables.invalidate(corpus)
      val landed = spark.read.parquet(s"$corpus/documents.parquet")
      assert(landed.count() == 5)
      assert(landed.filter(col("doc_id") === 2L).select("text")
        .head.getString(0) == "one two three four five six",
        "re-delivered doc 2 must keep its first text")

      val live = artifactRows(liveRoot)
      // the duplicate pair collapsed into one component
      val keepers = Artifacts.readCommitted(spark, corpus,
        Artifacts.KeepersName)
      assert(keepers.filter(col("doc_id") === 3L && !col("is_keeper"))
        .count() == 1L, "exact duplicate doc 3 must not be a keeper")

      // cold rebuild into a separate root — every artifact hash-equal
      Artifacts.setRoot(coldRoot.getAbsolutePath)
      Artifacts.materialize(spark, corpus)
      val cold = artifactRows(coldRoot)
      Artifacts.AllNames.foreach { n =>
        assert(live(n) == cold(n),
          s"$n drifted between continuous intake and cold materialize")
      }
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(liveRoot)
      deleteRecursively(coldRoot)
      deleteRecursively(new java.io.File(corpus).getParentFile)
      Checkpoints.releaseAll()
    }
  }

  test("intake self-heals artifacts after a crash between append and maintenance") {
    // simulate the torn state: rows landed in the corpus (the append
    // committed) but the process died before maintainAppended ran —
    // artifacts still key to the pre-append fingerprint. Replaying the
    // same batch through the sink must detect the gap and re-run
    // maintenance instead of treating the re-delivery as a no-op.
    import spark.implicits._
    val liveRoot = Files.createTempDirectory("graft-heal-live").toFile
    val coldRoot = Files.createTempDirectory("graft-heal-cold").toFile
    val corpus = Files.createTempDirectory("graft-heal-corpus").toString + "/c"
    val input = MemoryStream[IngestDoc](spark)
    try {
      Artifacts.setRoot(liveRoot.getAbsolutePath)
      val q = StreamingOps.artifactMaintainingIntake(input.toDF(), spark, corpus)
      try {
        input.addData(
          IngestDoc(1L, "alpha beta gamma delta epsilon", "s1"),
          IngestDoc(2L, "one two three four five", "s1"))
        q.processAllAvailable()
        assert(Artifacts.isFullyMaterialized(spark, corpus))
        // "crash": batch 2's rows land in the corpus with NO maintenance
        Seq((3L, "six seven eight nine ten", "s2"))
          .toDF("doc_id", "text", "source")
          .write.mode("append").parquet(s"$corpus/documents.parquet")
        Tables.invalidate(corpus)
        assert(!Artifacts.isFullyMaterialized(spark, corpus),
          "artifacts unexpectedly current after the torn append")
        // restart replays the batch: rows already present → fresh empty
        // → the sink's self-heal leg must re-materialize
        input.addData(IngestDoc(3L, "six seven eight nine ten", "s2"))
        q.processAllAvailable()
        assert(Artifacts.isFullyMaterialized(spark, corpus),
          "self-heal did not restore artifact currency")
      } finally q.stop()
      // healed artifacts ≡ cold rebuild of the final corpus
      def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.collect().map(_.toString).sorted.toSeq
      val live = Artifacts.AllNames.map(n =>
        n -> rows(Artifacts.readCommitted(spark, corpus, n))).toMap
      Artifacts.setRoot(coldRoot.getAbsolutePath)
      Artifacts.materialize(spark, corpus)
      Artifacts.AllNames.foreach { n =>
        assert(live(n) == rows(Artifacts.readCommitted(spark, corpus, n)),
          s"$n drifted after self-heal")
      }
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(liveRoot)
      deleteRecursively(coldRoot)
      deleteRecursively(new java.io.File(corpus).getParentFile)
      Checkpoints.releaseAll()
    }
  }

  test("crawl stream lands deduped, quality-gated, exactly once") {
    val input = MemoryStream[RawDoc](spark)
    val out = Files.createTempDirectory("intake").toString + "/corpus"
    val ckpt = Files.createTempDirectory("intake_ck").toString

    val stream = input.toDF()
      .withColumn("content_hash", md5(col("text")))
    val deduped = StreamingOps.dedupStream(stream, "content_hash")
    val curated = deduped
      .filter(size(split(col("text"), "\\s+")) >= 5)
    val q = StreamingOps.upsertSink(curated, spark, out,
      keys = Seq("content_hash"), versionCols = Seq("ts", "doc_id"),
      checkpoint = Some(ckpt))
    try {
      val good = "a clean document with enough tokens"
      val junk = "too short"
      input.addData(
        RawDoc(1, t(1), good),
        RawDoc(2, t(2), good), // in-batch duplicate content
        RawDoc(3, t(3), junk)) // fails the quality gate
      q.processAllAvailable()
      // re-delivery of the same content + one genuinely new doc
      input.addData(
        RawDoc(4, t(4), good),
        RawDoc(5, t(5), "another clean document with enough tokens"))
      q.processAllAvailable()
    } finally q.stop()

    val landed = spark.read.parquet(out)
    assert(landed.count() == 2, "one row per distinct clean content")
    assert(landed.select("content_hash").distinct().count() == 2)
    // an arrival from the FIRST batch won the dedup, not the later
    // re-delivery (doc 4). Within one micro-batch the survivor between
    // docs 1 and 2 is not contractual — dropDuplicatesWithinWatermark
    // keeps whichever row reaches the state store first — so both are
    // acceptable winners.
    val winner = landed.filter(col("text") === "a clean document with enough tokens")
      .select("doc_id").as[Long].head()
    assert(Set(1L, 2L).contains(winner), s"re-delivery $winner won the dedup")
    assert(landed.filter(col("text") === "too short").isEmpty)
  }

  test("streaming quality gate scores identically to batch q83 and culls at intake") {
    val input = MemoryStream[RawDoc](spark)
    val scored = StreamingOps.qualityGateStream(input.toDF(), "text")
    val q = scored.writeStream
      .format("memory").queryName("quality_gate")
      .outputMode("append").start()
    val texts = Seq(
      1L -> "the cat sat on the mat",
      2L -> "click here to buy cheap viagra now",
      3L -> "plain words only")
    try {
      input.addData(texts.map { case (id, tx) => RawDoc(id, t(id.toInt), tx) }: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("quality_gate")
      .select("doc_id", "n_tokens", "quality_score", "quality_label")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.toSeq.tail).toMap
    // the batch query over the same rows — identical kernel, identical result
    val dir = Files.createTempDirectory("graft-qgate").toFile
    try {
      texts.map { case (id, tx) => (id, tx, "en", "web", tx.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"${dir.getPath}/documents.parquet")
      val batch = graft.operators.TextAnalysis
        .q83QualityClassifier(spark, dir.getPath)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.toSeq.tail).toMap
      assert(streamed == batch,
        "streaming gate diverged from the batch classifier")
    } finally deleteRecursively(dir)
    // the spam doc is the one culled
    assert(streamed(2L).last == "cull")
    assert(streamed(1L).last == "keep")
  }

  test("streaming decontamination quarantines eval-overlapping docs at intake") {
    val input = MemoryStream[RawDoc](spark)
    // the "benchmark" is one sentence; its 8-gram shingles are the static
    // side of the stream-static semi-join
    val evalText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val evalShingles = Seq(evalText).toDF("text")
      .select(explode(graft.operators.CorpusOps.shinglesN(
        split(col("text"), "\\s+"), 8)).as("sh"))
    val flagged = StreamingOps.decontaminateStream(
      input.toDF(), "doc_id", "text", evalShingles)
    val q = flagged.writeStream
      .format("memory").queryName("quarantine")
      .outputMode("append").start()
    try {
      input.addData(
        // contains tokens 2..9 of the eval sentence = one shared 8-gram
        RawDoc(1, t(1), "prefix beta gamma delta epsilon zeta eta theta iota suffix"),
        // shares vocabulary but never 8 contiguous tokens
        RawDoc(2, t(2), "beta alpha delta gamma zeta epsilon theta eta kappa iota"),
        // disjoint
        RawDoc(3, t(3), "totally unrelated text with enough tokens to shingle fine"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("quarantine")
    assert(got.select("doc_id").distinct().as[Long].collect().toSet == Set(1L))
    // evidence rows carry the matching shingle itself
    assert(got.select("sh").as[String].collect()
      .forall(_ == "beta gamma delta epsilon zeta eta theta iota"))
  }

  test("vector intake maintains embedding artifacts ≡ a cold materializeEmbeddings") {
    // vectorIntake is artifactMaintainingIntake's embedding twin: after
    // three micro-batches — bootstrap, append, and a re-delivered id
    // with a DIFFERENT vector (first write wins on both legs) — the live
    // vector artifacts must hash-equal a scratch build, and a torn
    // append (rows landed, no maintenance) must self-heal on replay.
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(j => math.sin(seed * 64.0 + j).toFloat)
    val liveRoot = Files.createTempDirectory("graft-vecintake-live").toFile
    val coldRoot = Files.createTempDirectory("graft-vecintake-cold").toFile
    val corpus = Files.createTempDirectory("graft-vecintake").toString + "/c"
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val input = MemoryStream[IngestVec](spark)
    try {
      Artifacts.setRoot(liveRoot.getAbsolutePath)
      val q = StreamingOps.vectorIntake(input.toDF(), spark, corpus)
      try {
        // batch 1: bootstrap (no embeddings table → full build fallback)
        input.addData(IngestVec(1L, vec(1), 0), IngestVec(2L, vec(2), 1))
        q.processAllAvailable()
        assert(Artifacts.isEmbeddingsMaterialized(spark, corpus))
        // batch 2: append path + a re-delivery of id 2 with a different
        // vector — the first-landed embedding must win on both legs
        input.addData(IngestVec(3L, vec(3), 0), IngestVec(2L, vec(99), 1))
        q.processAllAvailable()
        // "crash": batch 3's rows land with NO maintenance
        import spark.implicits._
        Seq((4L, vec(4), 1)).toDF("vec_id", "embedding", "label")
          .write.mode("append").parquet(s"$corpus/embeddings.parquet")
        Tables.invalidate(corpus)
        assert(!Artifacts.isEmbeddingsMaterialized(spark, corpus),
          "vector artifacts unexpectedly current after the torn append")
        // restart replays the batch → fresh empty → self-heal leg
        input.addData(IngestVec(4L, vec(4), 1))
        q.processAllAvailable()
        assert(Artifacts.isEmbeddingsMaterialized(spark, corpus),
          "vector self-heal did not restore artifact currency")
      } finally q.stop()
      Tables.invalidate(corpus)
      val landed = spark.read.parquet(s"$corpus/embeddings.parquet")
      assert(landed.count() == 4)
      assert(landed.filter(col("vec_id") === 2L).select("embedding")
        .head.getSeq[Float](0).toSeq == vec(2).toSeq,
        "re-delivered vector 2 must keep its first embedding")
      val live = Artifacts.EmbeddingNames.map(n =>
        n -> rows(Artifacts.readCommitted(spark, corpus, n))).toMap
      Artifacts.setRoot(coldRoot.getAbsolutePath)
      Artifacts.materializeEmbeddings(spark, corpus)
      Artifacts.EmbeddingNames.foreach { n =>
        assert(live(n) == rows(Artifacts.readCommitted(spark, corpus, n)),
          s"$n drifted between continuous vector intake and cold build")
      }
    } finally {
      Artifacts.clearRoot()
      Tables.invalidate(corpus)
      deleteRecursively(liveRoot)
      deleteRecursively(coldRoot)
      deleteRecursively(new java.io.File(corpus).getParentFile)
      Checkpoints.releaseAll()
    }
  }
}

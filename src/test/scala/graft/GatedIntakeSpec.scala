package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** The gated door-to-corpus intake (`StreamingOps.gatedIntake`):
  *
  *  1. admission — a batch mixing a corpus duplicate, a contaminated
  *     copy of an eval-set member, a perceptual collision, and a clean
  *     novel document appends EXACTLY the admitted rows, with the audit
  *     parquet carrying one verdict row per arriving document and
  *     `admitted` ≡ the default rule evaluated over those verdicts;
  *  2. lockstep — after the gated appends the standing artifacts
  *     hash-equal a cold materialize of the final (admitted-only)
  *     corpus;
  *  3. torn-append self-heal — a replayed batch whose admitted row
  *     already landed re-folds exactly the in-table rows into the
  *     artifacts; the rejected rows stay out of corpus AND artifacts.
  *
  * Fixture texts are chosen empirically: the synthetic media derivation
  * gives the ≤16-bit perceptual fingerprints so little entropy on a
  * 4-doc corpus that MOST novel texts collide at Hamming ≤ 3 in image
  * or video space — doc 103 deliberately keeps one such collision as
  * the media-gate rejection case, and the admitted keeper (104) is a
  * text verified to clear every gate.
  */
class GatedIntakeSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  // seed docs: ids 7 and 8 are eval-set members (doc_id % 10 ∈ {7, 8})
  private val seed = Seq(
    IngestDoc(1L, "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon", "s1"),
    IngestDoc(2L, "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen", "s1"),
    IngestDoc(7L, "held out benchmark question about the seven bridges " +
      "of königsberg and the degree parity argument euler gave", "s2"),
    IngestDoc(8L, "another held out item listing the planets in order " +
      "from the sun with their orbital periods in days", "s2"))

  private val keeperText = "field notes on alpine lichens their growth " +
    "rates substrate preferences and the slow clock they keep " +
    "on exposed granite surfaces above the treeline"

  test("admission, audit trail, and artifact lockstep") {
    val liveRoot = Files.createTempDirectory("graft-gated-live").toFile
    val coldRoot = Files.createTempDirectory("graft-gated-cold").toFile
    val corpus = Files.createTempDirectory("graft-gated-corpus").toString + "/c"
    val audit = Files.createTempDirectory("graft-gated-audit").toString + "/a"
    val input = MemoryStream[IngestDoc](spark)
    try {
      Artifacts.setRoot(liveRoot.getAbsolutePath)
      seed.toDF().write.parquet(s"$corpus/documents.parquet")
      Tables.invalidate(corpus)
      Artifacts.materialize(spark, corpus)

      val q = StreamingOps.gatedIntake(input.toDF(), spark, corpus, audit)
      try {
        input.addData(
          // exact duplicate of corpus doc 1 → dedup_verdict exact_dup
          IngestDoc(101L, seed(0).text, "crawl"),
          // copies an eval member's text → contaminated
          IngestDoc(102L, seed(2).text, "crawl"),
          // text-new but perceptually colliding → media gate rejects
          IngestDoc(103L, "a genuinely fresh discussion of compiler " +
            "intermediate representations and register allocation " +
            "strategies in modern optimizing backends", "crawl"),
          // clean novel keeper, repeated in-batch — absorbed at the door
          IngestDoc(104L, keeperText, "crawl"),
          IngestDoc(104L, keeperText, "crawl"))
        q.processAllAvailable()
        // second batch: re-delivery of the admitted keeper
        input.addData(IngestDoc(104L, keeperText, "crawl"))
        q.processAllAvailable()
      } finally q.stop()

      // corpus = seed + exactly the admitted arrival
      val ids = spark.read.parquet(s"$corpus/documents.parquet")
        .select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 2L, 7L, 8L, 104L), s"admitted set wrong: $ids")

      // audit: one row per distinct arriving doc per batch, admitted ≡
      // the default rule over the recorded verdict columns
      val a0 = spark.read.parquet(s"$audit/batch=0")
      assert(a0.count() == 4, "batch 0 audits its four distinct arrivals")
      val verdicts = a0.select("doc_id", "dedup_verdict", "contaminated",
        "image_verdict", "admitted").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2),
          r.getString(3), r.getBoolean(4)))).toMap
      assert(verdicts(101L)._1 == "exact_dup" && !verdicts(101L)._4,
        s"corpus duplicate must be rejected: ${verdicts(101L)}")
      assert(verdicts(102L)._2 && !verdicts(102L)._4,
        s"contaminated copy must be rejected: ${verdicts(102L)}")
      assert(verdicts(103L)._1 == "new" && verdicts(103L)._3 != "new" &&
        !verdicts(103L)._4,
        s"perceptual collision must be media-rejected: ${verdicts(103L)}")
      assert(verdicts(104L)._1 == "new" && !verdicts(104L)._2 &&
        verdicts(104L)._4, s"clean keeper must be admitted: ${verdicts(104L)}")
      val drifted = a0.withColumn("want", StreamingOps.defaultAdmit(None))
        .filter(col("admitted") =!= col("want")).count()
      assert(drifted == 0, "audit admitted flag drifted from the rule")
      // batch 1: the re-delivered 104 re-verdicts as a dup of itself
      val a1 = spark.read.parquet(s"$audit/batch=1")
        .select("doc_id", "dedup_verdict", "admitted").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap
      assert(a1(104L)._1 == "exact_dup" && !a1(104L)._2,
        "re-delivered admitted doc must re-verdict as duplicate")

      // lockstep: live artifacts ≡ cold materialize of the final corpus
      assert(Artifacts.isFullyMaterialized(spark, corpus))
      val live = Artifacts.AllNames.map(n =>
        n -> rows(Artifacts.readCommitted(spark, corpus, n))).toMap
      Artifacts.setRoot(coldRoot.getAbsolutePath)
      Artifacts.materialize(spark, corpus)
      Artifacts.AllNames.foreach { n =>
        assert(live(n) == rows(Artifacts.readCommitted(spark, corpus, n)),
          s"$n drifted from a cold rebuild after gated intake")
      }
    } finally {
      Artifacts.clearRoot()
      Tables.invalidate(corpus)
      deleteRecursively(liveRoot)
      deleteRecursively(coldRoot)
      deleteRecursively(new java.io.File(corpus).getParentFile)
      deleteRecursively(new java.io.File(audit).getParentFile)
      Checkpoints.releaseAll()
    }
  }

  test("admit override replaces the default rule") {
    val liveRoot = Files.createTempDirectory("graft-gated-ovr").toFile
    val corpus = Files.createTempDirectory("graft-gated-ovr-c").toString + "/c"
    val audit = Files.createTempDirectory("graft-gated-ovr-a").toString + "/a"
    try {
      Artifacts.setRoot(liveRoot.getAbsolutePath)
      seed.toDF().write.parquet(s"$corpus/documents.parquet")
      Tables.invalidate(corpus)
      Artifacts.materialize(spark, corpus)
      // text-only policy: a deployment that trusts its media pipeline
      // elsewhere admits on the text gates alone — doc 103's perceptual
      // collision (rejected by the default rule) is admitted here
      val batch = Seq(IngestDoc(103L, "a genuinely fresh discussion of " +
        "compiler intermediate representations and register allocation " +
        "strategies in modern optimizing backends", "crawl")).toDF()
      StreamingOps.gatedIntakeBatch(batch, 0L, spark, corpus, audit, None,
        Some(col("dedup_verdict") === "new" && !col("contaminated") &&
          col("quality_label") === "keep"))
      val ids = spark.read.parquet(s"$corpus/documents.parquet")
        .select("doc_id").as[Long].collect().toSet
      assert(ids.contains(103L), "override must admit the text-clean doc")
      assert(Artifacts.isFullyMaterialized(spark, corpus),
        "artifacts must carry the override-admitted append")
      val a0 = spark.read.parquet(s"$audit/batch=0")
        .select("image_verdict", "admitted").collect().head
      assert(a0.getString(0) != "new" && a0.getBoolean(1),
        "audit must record the collision AND the override admission")
    } finally {
      Artifacts.clearRoot()
      Tables.invalidate(corpus)
      deleteRecursively(liveRoot)
      deleteRecursively(new java.io.File(corpus).getParentFile)
      deleteRecursively(new java.io.File(audit).getParentFile)
      Checkpoints.releaseAll()
    }
  }

  test("torn append self-heals; rejected rows stay out of artifacts") {
    val liveRoot = Files.createTempDirectory("graft-gated-heal").toFile
    val corpus = Files.createTempDirectory("graft-gated-heal-c").toString + "/c"
    val audit = Files.createTempDirectory("graft-gated-heal-a").toString + "/a"
    try {
      Artifacts.setRoot(liveRoot.getAbsolutePath)
      seed.toDF().write.parquet(s"$corpus/documents.parquet")
      Tables.invalidate(corpus)
      Artifacts.materialize(spark, corpus)

      val batch = Seq(
        IngestDoc(201L, keeperText, "crawl"),
        IngestDoc(202L, seed(0).text, "crawl")).toDF()
      // "crash": the admitted row landed in the corpus but the process
      // died before maintenance — artifacts key to the pre-append state
      batch.filter(col("doc_id") === 201L)
        .write.mode("append").parquet(s"$corpus/documents.parquet")
      Tables.invalidate(corpus)
      assert(!Artifacts.isFullyMaterialized(spark, corpus),
        "artifacts unexpectedly current after the torn append")

      // restart replays the batch through the sink body: admitted row
      // already present → fresh empty → self-heal folds it
      StreamingOps.gatedIntakeBatch(batch, 0L, spark, corpus, audit,
        None, None)
      assert(Artifacts.isFullyMaterialized(spark, corpus),
        "self-heal did not restore artifact currency")
      // the rejected duplicate stayed out of the corpus
      val ids = spark.read.parquet(s"$corpus/documents.parquet")
        .select("doc_id").as[Long].collect().toSet
      assert(!ids.contains(202L), "rejected row leaked into the corpus")
      // and out of the artifacts: keepers ≡ the corpus's own doc set
      val keeperIds = Artifacts.readCommitted(spark, corpus,
        Artifacts.KeepersName).select("doc_id").as[Long].collect().toSet
      assert(!keeperIds.contains(202L),
        "rejected row leaked into the artifacts")
      assert(keeperIds.contains(201L), "healed row missing from artifacts")
    } finally {
      Artifacts.clearRoot()
      Tables.invalidate(corpus)
      deleteRecursively(liveRoot)
      deleteRecursively(new java.io.File(corpus).getParentFile)
      deleteRecursively(new java.io.File(audit).getParentFile)
      Checkpoints.releaseAll()
    }
  }
}

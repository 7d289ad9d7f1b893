package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{CorpusOps, Dedup}

/** The incremental-maintenance contract (`Artifacts.materializeIncremental`):
  * artifacts maintained from a snapshot diff are HASH-IDENTICAL to a full
  * rebuild against the new corpus, the keeper re-run is change-bounded
  * (component-bounded CC, not corpus-bounded), and the fallback paths
  * trigger when incrementality would be unsound or uneconomic.
  */
class IncrementalArtifactsSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq


  /** Full inline rebuild of every artifact frame against a corpus dir. */
  private def fullRebuild(dir: String): Map[String, Seq[String]] = {
    val docs = Tables.documents(spark, dir)
    val out = Map(
      Artifacts.NgramPostingsName -> rows(Dedup.shingleIndex(docs)),
      Artifacts.SpanCountsName -> rows(CorpusOps.spanCounts(docs)),
      Artifacts.DupSpansName -> rows(CorpusOps.dupSpanSet(spark, dir)),
      Artifacts.DupPairsName -> rows(Dedup.jaccardPairs(Dedup.shingleIndex(docs))),
      Artifacts.MinhashBandsName -> rows(Dedup.bandedSignatures(docs)),
      Artifacts.KeepersName -> rows(Dedup.keeperAssignment(spark, dir)),
      Artifacts.Shingles8Name -> rows(CorpusOps.docShingles8(docs)),
      Artifacts.EvalShinglesName ->
        rows(graft.operators.EvalSets.evalShingleRows(CorpusOps.docShingles8(docs))
          .unionByName(graft.operators.EvalSets.externalShingleRows(spark))),
      Artifacts.TokenFreqName -> rows(CorpusOps.tokenFreqRows(docs)),
      Artifacts.BigramFreqName -> rows(CorpusOps.bigramFreqRows(docs)),
      Artifacts.DocHashesName -> rows(Artifacts.docHashesFrame(docs)),
      Artifacts.ChunkPostingsName -> rows(CorpusOps.chunkPostingsRows(docs)),
      Artifacts.TokenPositionsName -> rows(CorpusOps.tokenPositionsRows(docs)),
      Artifacts.TokenDfName -> rows(CorpusOps.tokenDfRows(docs)),
      Artifacts.LineDfName ->
        rows(graft.operators.Extraction.lineDfRows(docs)),
      Artifacts.BpeMergesName ->
        rows(graft.operators.TextAnalysis.bpeTrainFrom(spark,
          docs.select(explode(graft.operators.Dedup.tokens(col("text")))
              .as("token"))
            .groupBy("token").agg(count(lit(1)).as("n")),
          graft.operators.TextAnalysis.BpeSteps)),
      Artifacts.ImageGridsName ->
        rows(graft.operators.Multimodal.imageGridRows(docs)),
      Artifacts.ImageIvfCentroidsName ->
        rows(graft.operators.Ivf.centroidsFrame(spark,
          graft.operators.Ivf.trainOrEmpty(graft.operators.Multimodal
            .imageQuantRows(graft.operators.Multimodal.imageGridRows(docs))))),
      Artifacts.ImageIvfCellsName -> {
        val q = graft.operators.Multimodal.imageQuantRows(
          graft.operators.Multimodal.imageGridRows(docs))
        rows(graft.operators.Ivf.assignFrame(q, graft.operators.Ivf.trainOrEmpty(q)))
      },
      Artifacts.VideoSigsName ->
        rows(graft.operators.Multimodal.videoSigRows(docs)),
      Artifacts.AudioSigsName ->
        rows(graft.operators.Multimodal.audioSigRows(docs)),
      Artifacts.TextGatesName ->
        rows(graft.operators.Curation.textGateRows(docs)),
      Artifacts.EvalFlagsLexName ->
        rows(graft.operators.EvalSets.lexFlagRows(
          CorpusOps.docShingles8(docs),
          graft.operators.EvalSets.evalShingleRows(
            CorpusOps.docShingles8(docs))
            .unionByName(graft.operators.EvalSets.externalShingleRows(spark)))),
      Artifacts.QualityModelName ->
        rows(graft.operators.QualityTrain.modelFrame(spark, dir)),
      Artifacts.QualityScoresName ->
        rows(graft.operators.QualityTrain.scoresFrame(spark, dir,
          graft.operators.QualityTrain.train(spark, dir)))) ++
      Artifacts.DefaultTokenizers.map(t =>
        Artifacts.tokenCountsName(t) -> rows(Artifacts.tokenCountsFrame(docs, t))) ++
      Artifacts.PostingsTokenizers.map(t =>
        Artifacts.tokenPostingsName(t) -> rows(CorpusOps.tokenPostingsRows(docs, t)))
    Checkpoints.releaseAll()
    out
  }

  private def artifactRows(dir: String): Map[String, Seq[String]] = {
    Artifacts.AllNames.map { n =>
      assert(Artifacts.isMaterialized(spark, dir, n), s"$n not committed")
      n -> rows(Artifacts.readCommitted(spark, dir, n))
    }.toMap
  }

  private def keyOf(dir: String): String = {
    // mirror of Artifacts.corpusKey (private): resolve via the filesystem
    val root = new java.io.File(Artifacts.root.get)
    val sanitized = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    root.listFiles().map(_.getName).find(_.startsWith(sanitized + "-"))
      .getOrElse(fail(s"no artifact tree for $dir under $root"))
  }

  test("incremental maintenance is hash-identical to a full rebuild") {
    val tmpRoot = Files.createTempDirectory("graft-incr-root").toFile
    val base = Files.createTempDirectory("graft-incr-corpus").toString
    val (oldDir, newDir) = (s"$base/old", s"$base/new")
    try {
      val src = Tables.documents(spark, sf)
      src.write.parquet(s"$oldDir/documents.parquet")
      // new snapshot: remove the %25==3 stripe, truncate the %33==7
      // stripe, add exact copies (%100==1, exact-dup edges to their
      // sources) and near copies (%100==51, two appended tokens keep
      // 3-gram jaccard >= 0.5) under shifted ids
      val kept = src.filter(pmod(col("doc_id"), lit(25)) =!= 3)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(33)) === 7, substring(col("text"), 1, 60))
            .otherwise(col("text")))
      val addedExact = src.filter(pmod(col("doc_id"), lit(100)) === 1)
        .withColumn("doc_id", col("doc_id") + 100000)
      val addedNear = src.filter(pmod(col("doc_id"), lit(100)) === 51)
        .withColumn("doc_id", col("doc_id") + 100000)
        .withColumn("text", concat(col("text"), lit(" zq zq")))
      kept.unionByName(addedExact).unionByName(addedNear)
        .write.parquet(s"$newDir/documents.parquet")

      Artifacts.setRoot(tmpRoot.getAbsolutePath)
      Artifacts.materialize(spark, oldDir)
      val res = Artifacts.materializeIncremental(spark, oldDir, newDir)
      assert(res.mode == "incremental", res)
      assert(res.added > 0 && res.changed > 0 && res.removed > 0, res)

      val expected = fullRebuild(newDir)
      val got = artifactRows(newDir)
      Artifacts.AllNames.foreach { n =>
        assert(got(n) == expected(n), s"$n drifted from the full rebuild")
      }

      // the CC re-run must not be the whole corpus. (At THIS toy scale
      // the partner expansion is proportionally large — a df<=64 shingle
      // reaches 13% of a 500-doc corpus, vs a vanishing fraction of a
      // real one — so the tight boundedness assertion lives in the
      // controlled-sharing test below.)
      val nNew = Tables.documents(spark, newDir).count()
      assert(res.ccVertices > 0 && res.ccVertices < nNew,
        s"CC re-ran over ${res.ccVertices} of $nNew docs")
      assert(res.affectedComponents > 0)

      // idempotent: second call skips (same fingerprint, already committed)
      val again = Artifacts.materializeIncremental(spark, oldDir, newDir)
      assert(again.mode == "skip" && again.counts == res.counts, again)
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmpRoot)
      deleteRecursively(new java.io.File(base))
      Checkpoints.releaseAll()
    }
  }

  test("an empty additive delta (a spanless doc removed) stays hash-identical") {
    // Removing a doc with fewer than SpanN tokens produces an EMPTY span
    // delta: the additive path must commit an empty delta segment (null
    // observed range metrics — the delivered-null Observation path) and
    // the multi-segment read must still equal a full rebuild. The token
    // delta is pure retraction: the removed doc's tokens sum to <= 0 and
    // must vanish from the view.
    val tmpRoot = Files.createTempDirectory("graft-empty-root").toFile
    val base = Files.createTempDirectory("graft-empty-corpus").toString
    val (oldDir, newDir) = (s"$base/old", s"$base/new")
    try {
      val sp = spark; import sp.implicits._
      val docs = (1 to 40).map(i => (i.toLong,
        s"alpha beta gamma delta epsilon zeta eta theta iota kappa lam$i mu$i",
        "s")) :+ ((99L, "tiny doc", "s"))
      docs.toDF("doc_id", "text", "source")
        .write.parquet(s"$oldDir/documents.parquet")
      spark.read.parquet(s"$oldDir/documents.parquet")
        .filter(col("doc_id") =!= 99)
        .write.parquet(s"$newDir/documents.parquet")

      Artifacts.setRoot(tmpRoot.getAbsolutePath)
      Artifacts.materialize(spark, oldDir)
      val res = Artifacts.materializeIncremental(spark, oldDir, newDir)
      assert(res.mode == "incremental", res)
      assert(res.removed == 1 && res.added == 0 && res.changed == 0, res)

      val expected = fullRebuild(newDir)
      val got = artifactRows(newDir)
      Artifacts.AllNames.foreach { n =>
        assert(got(n) == expected(n), s"$n drifted from the full rebuild")
      }
      // the retracted-to-zero tokens are really gone from the view
      val tf = Artifacts.readCommitted(spark, newDir, Artifacts.TokenFreqName)
      assert(tf.filter(col("token").isin("tiny", "doc")).count() == 0,
        "fully retracted token keys must drop from the additive view")
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmpRoot)
      deleteRecursively(new java.io.File(base))
      Checkpoints.releaseAll()
    }
  }

  test("a df-cap flip between unchanged docs is caught (closure seeds)") {
    // Adversarial case for the seed closure: 70 docs share both leading
    // 3-shingles, so their df (70) exceeds MaxShingleDf and the old
    // corpus has NO near edges — everyone is a singleton. The new
    // snapshot only REMOVES six docs, dropping those shingles' df to 64
    // (under the cap): every surviving pair now shares 2 of its 3
    // shingles (jaccard 0.5) and the 64 UNCHANGED docs collapse into one
    // component. No changed doc participates in any new edge — only the
    // flipped-shingle seeding can find these docs.
    val tmpRoot = Files.createTempDirectory("graft-flip-root").toFile
    val base = Files.createTempDirectory("graft-flip-corpus").toString
    val (oldDir, newDir) = (s"$base/old", s"$base/new")
    try {
      import spark.implicits._
      val docs = (1 to 70).map(i => (i.toLong, s"aaa bbb ccc ddd unique$i"))
        .toDF("doc_id", "text")
        .withColumn("source", lit("s")) // token_freq artifact needs it
      docs.write.parquet(s"$oldDir/documents.parquet")
      docs.filter(col("doc_id") <= 64)
        .write.parquet(s"$newDir/documents.parquet")

      Artifacts.setRoot(tmpRoot.getAbsolutePath)
      Artifacts.materialize(spark, oldDir)
      // old corpus: all singletons (the shared shingles are capped out)
      val oldKeepers = Artifacts.readCommitted(spark, oldDir,
        Artifacts.KeepersName)
      assert(oldKeepers.filter(col("is_keeper")).count() == 70L)

      val res = Artifacts.materializeIncremental(spark, oldDir, newDir)
      assert(res.mode == "incremental", res)
      assert(res.added == 0 && res.changed == 0 && res.removed == 6, res)
      // the flip pulled all 64 unchanged docs into the re-run
      assert(res.ccVertices == 64L, res)

      val got = artifactRows(newDir)
      val expected = fullRebuild(newDir)
      Artifacts.AllNames.foreach { n =>
        assert(got(n) == expected(n), s"$n drifted from the full rebuild")
      }
      // and the re-run actually merged them: one 64-doc component
      val keepers = Artifacts.readCommitted(spark, newDir,
        Artifacts.KeepersName)
      assert(keepers.filter(col("is_keeper")).count() == 1L)
      assert(keepers.filter(col("keeper_id") === 1L).count() == 64L)
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmpRoot)
      deleteRecursively(new java.io.File(base))
      Checkpoints.releaseAll()
    }
  }

  test("the keeper re-run is change-bounded when shingles don't fan out") {
    // controlled sharing: every doc's shingles are unique to it, so
    // seeds cannot expand past the diff itself — the CC re-run must
    // touch EXACTLY the added/changed docs (removed docs are no longer
    // vertices), and affected components = changed ∪ removed.
    val tmpRoot = Files.createTempDirectory("graft-cb-root").toFile
    val base = Files.createTempDirectory("graft-cb-corpus").toString
    val (oldDir, newDir) = (s"$base/old", s"$base/new")
    try {
      import spark.implicits._
      val docs = (1 to 1000).map(i =>
        (i.toLong, s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f")).toDF("doc_id", "text")
        .withColumn("source", lit("s")) // token_freq artifact needs it
      docs.write.parquet(s"$oldDir/documents.parquet")
      val changed = Set(10L, 20L, 30L, 40L, 50L)
      val removed = Set(7L, 77L, 777L)
      docs.filter(!col("doc_id").isin(removed.toSeq: _*))
        .withColumn("text",
          when(col("doc_id").isin(changed.toSeq: _*),
            concat(col("text"), lit(" xtra"))).otherwise(col("text")))
        .unionByName(Seq((5001L, "n1 n2 n3 n4 n5 n6"),
          (5002L, "m1 m2 m3 m4 m5 m6")).toDF("doc_id", "text")
          .withColumn("source", lit("s")))
        .write.parquet(s"$newDir/documents.parquet")

      Artifacts.setRoot(tmpRoot.getAbsolutePath)
      Artifacts.materialize(spark, oldDir)
      val res = Artifacts.materializeIncremental(spark, oldDir, newDir)
      assert(res.mode == "incremental", res)
      assert((res.added, res.changed, res.removed) == (2L, 5L, 3L), res)
      assert(res.ccVertices == 7L, s"re-ran ${res.ccVertices} docs, expected 7")
      assert(res.affectedComponents == 8L, res)
      // and the maintained keepers still equal the full rebuild
      assert(artifactRows(newDir)(Artifacts.KeepersName) ==
        fullRebuild(newDir)(Artifacts.KeepersName))
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmpRoot)
      deleteRecursively(new java.io.File(base))
      Checkpoints.releaseAll()
    }
  }

  test("composed refresh: two snapshot hops ≡ the from-scratch path") {
    // refreshSnapshot = maintain artifacts + re-verdict, one call. Drive
    // v1 → v2 → v3 through the composed entry point and pin BOTH legs:
    // artifacts after each hop hash-equal a full rebuild, and the
    // verdict frame hash-equals the same verdict computed with NO
    // artifacts at all (inline, no root).
    val tmpRoot = Files.createTempDirectory("graft-refresh-root").toFile
    val base = Files.createTempDirectory("graft-refresh-corpus").toString
    val dirs = Seq(s"$base/v1", s"$base/v2", s"$base/v3")
    try {
      val src = Tables.documents(spark, sf)
      // v1: the even-id slice; v2: drop %10==2, truncate %12==4, add
      // copies under shifted ids; v3: drop %14==6 from v2's membership,
      // append two fresh docs
      src.filter(col("doc_id") % 2 === 0)
        .write.parquet(s"${dirs(0)}/documents.parquet")
      src.filter(col("doc_id") % 2 === 0 && col("doc_id") % 10 =!= 2)
        .withColumn("text",
          when(col("doc_id") % 12 === 4, substring(col("text"), 1, 50))
            .otherwise(col("text")))
        .unionByName(src.filter(col("doc_id") % 100 === 2)
          .withColumn("doc_id", col("doc_id") + 200000))
        .write.parquet(s"${dirs(1)}/documents.parquet")
      spark.read.parquet(s"${dirs(1)}/documents.parquet")
        .filter(col("doc_id") % 14 =!= 6)
        .unionByName(src.filter(col("doc_id") % 100 === 3)
          .withColumn("doc_id", col("doc_id") + 300000))
        .write.parquet(s"${dirs(2)}/documents.parquet")

      // inline references (no root): verdicts computed with zero
      // artifact help
      Artifacts.clearRoot()
      val inlineVerdicts = Seq(
        rows(CorpusOps.refreshVerdicts(spark, dirs(0), dirs(1))),
        rows(CorpusOps.refreshVerdicts(spark, dirs(1), dirs(2))))
      Checkpoints.releaseAll()

      Artifacts.setRoot(tmpRoot.getAbsolutePath)
      Artifacts.materialize(spark, dirs(0))
      val hop1 = CorpusOps.refreshSnapshot(spark, dirs(0), dirs(1),
        maxChangeFraction = 0.6)
      assert(hop1.text.mode == "incremental", hop1.text)
      // these corpora carry no embeddings table — the vector leg skips
      assert(hop1.vectors.mode == "skip", hop1.vectors)
      assert(rows(hop1.verdicts) == inlineVerdicts(0), "hop-1 verdicts drifted")
      val hop2 = CorpusOps.refreshSnapshot(spark, dirs(1), dirs(2),
        maxChangeFraction = 0.6)
      assert(hop2.text.mode == "incremental", hop2.text)
      assert(rows(hop2.verdicts) == inlineVerdicts(1), "hop-2 verdicts drifted")
      // artifacts after the second hop ≡ full rebuild of v3
      val expected = fullRebuild(dirs(2))
      val got = artifactRows(dirs(2))
      Artifacts.AllNames.foreach { n =>
        assert(got(n) == expected(n), s"$n drifted after two composed hops")
      }
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmpRoot)
      deleteRecursively(new java.io.File(base))
      Checkpoints.releaseAll()
    }
  }

  test("the delta scan prunes a range-sorted corpus to the touched files") {
    // the incremental claim is not just "few rows" but "little I/O":
    // prunedDeltaScan pushes the diff ids' min/max range into the
    // parquet scan, so a corpus written range-clustered by doc_id (the
    // production layout for exactly this reason) skips untouched files
    // and row groups via min/max stats. Measured here by task input
    // bytes: a diff clustered in one id range must read a small
    // fraction of what the unpruned semi-join scan reads.
    val base = Files.createTempDirectory("graft-prune-corpus").toString
    try {
      import spark.implicits._
      // 20 range-sorted files of 500 docs each; texts are unique-token
      // (incompressible) and heavy enough that data pages dominate the
      // footers every scan must read
      val docs = (1 to 10000).map(i => (i.toLong,
        s"document number $i " +
          (1 to 100).map(j => s"w${i}x${j}q${i * j}").mkString(" ")))
        .toDF("doc_id", "text")
      docs.repartitionByRange(20, col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.parquet(s"$base/documents.parquet")
      val corpus = spark.read.parquet(s"$base/documents.parquet")
      // the diff touches only ids 901-950 — one file's range
      val ids = (901L to 950L).toDF("doc_id")

      // measurement: rows the parquet READER actually decoded (the scan
      // node's numOutputRows — pushed filters are applied by the reader
      // through row-group/page min-max stats, so skipped groups never
      // surface here). Task bytesRead is NOT usable: the local-file
      // reader bypasses Hadoop FS statistics and under-reports by ~50×.
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
        df.collect()
        val out = scala.collection.mutable.ArrayBuffer.empty[Long]
        def walk(p: SparkPlan): Unit = p.foreach {
          case f: FileSourceScanExec => out += f.metrics("numOutputRows").value
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: QueryStageExec => walk(q.plan)
          case _ =>
        }
        walk(df.queryExecution.executedPlan)
        out.sum
      }
      val pruned = Artifacts.prunedDeltaScan(corpus, ids)
      assert(pruned.queryExecution.executedPlan.toString
          .contains("GreaterThanOrEqual(doc_id"),
        "diff range not pushed into the parquet scan")
      val prunedRows = scanRows(pruned)
      val fullRows = scanRows(corpus.join(ids, Seq("doc_id"), "left_semi"))
      assert(fullRows == 10000L,
        s"unpruned semi-join scan decoded $fullRows rows — baseline broken")
      assert(prunedRows > 0 && prunedRows <= 1000L,
        s"pruned delta scan decoded $prunedRows of $fullRows rows — " +
          "row-group pruning lost")
    } finally {
      deleteRecursively(new java.io.File(base))
    }
  }

  test("a widened artifact set backfills the old snapshot instead of a full rebuild") {
    // simulate a pre-upgrade artifact tree: materialize the old
    // snapshot, then delete two artifacts a newer library version would
    // have added. The refresh must backfill exactly those against the
    // OLD corpus and stay on the incremental path — not demote to a
    // corpus-bounded rebuild of the new snapshot.
    val tmpRoot = Files.createTempDirectory("graft-backfill-root").toFile
    val base = Files.createTempDirectory("graft-backfill-corpus").toString
    val (oldDir, newDir) = (s"$base/old", s"$base/new")
    try {
      val src = Tables.documents(spark, sf)
      src.filter(col("doc_id") % 2 === 0).write.parquet(s"$oldDir/documents.parquet")
      src.filter(col("doc_id") % 2 === 0 && col("doc_id") % 20 =!= 4)
        .write.parquet(s"$newDir/documents.parquet")
      Artifacts.setRoot(tmpRoot.getAbsolutePath)
      Artifacts.materialize(spark, oldDir)
      val fpOld = Artifacts.corpusFingerprint(spark, oldDir)
      for (n <- Seq(Artifacts.DocHashesName,
          Artifacts.tokenCountsName(graft.functions.Tokenizer.Whitespace)))
        deleteRecursively(new java.io.File(
          s"$tmpRoot/${keyOf(oldDir)}/$n/fp=$fpOld"))
      assert(!Artifacts.isFullyMaterialized(spark, oldDir))

      val res = Artifacts.materializeIncremental(spark, oldDir, newDir)
      assert(res.mode == "incremental",
        s"refresh fell back to ${res.mode} instead of backfilling")
      // the backfill restored the old snapshot's full set...
      assert(Artifacts.isFullyMaterialized(spark, oldDir))
      // ...and the maintained new artifacts still equal a full rebuild
      val expected = fullRebuild(newDir)
      val got = artifactRows(newDir)
      Artifacts.AllNames.foreach { n =>
        assert(got(n) == expected(n), s"$n drifted after backfill")
      }
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmpRoot)
      deleteRecursively(new java.io.File(base))
      Checkpoints.releaseAll()
    }
  }

  test("maintainAppended detects an unaccounted external append and rebuilds") {
    // another writer lands files between fpOld resolution and
    // maintenance: folding only the batch would commit artifacts that
    // RESOLVE as current while missing the external docs. The coverage
    // invariant (old count + batch count == corpus count) must catch it
    // and rebuild from the corpus as it actually is.
    import spark.implicits._
    val tmpRoot = Files.createTempDirectory("graft-delta-root").toFile
    val corpus = Files.createTempDirectory("graft-delta-corpus").toString + "/c"
    try {
      Artifacts.setRoot(tmpRoot.getAbsolutePath)
      (1 to 20).map(i => (i.toLong, s"base doc $i words here", "s"))
        .toDF("doc_id", "text", "source")
        .write.parquet(s"$corpus/documents.parquet")
      Artifacts.materialize(spark, corpus)
      val fpOld = Artifacts.corpusFingerprint(spark, corpus)
      // the batch this maintenance knows about...
      val batch = Seq((21L, "batch doc twenty one", "s"))
        .toDF("doc_id", "text", "source")
      batch.write.mode("append").parquet(s"$corpus/documents.parquet")
      // ...and an EXTERNAL append it does not
      Seq((99L, "external doc this maintenance never saw", "x"))
        .toDF("doc_id", "text", "source")
        .write.mode("append").parquet(s"$corpus/documents.parquet")
      Tables.invalidate(corpus)
      val res = Artifacts.maintainAppended(spark, corpus, fpOld, batch)
      assert(res.mode == "full_unexpected_delta", res)
      // the rebuild covered the external doc too
      assert(Artifacts.isFullyMaterialized(spark, corpus))
      val hashes = Artifacts.readCommitted(spark, corpus,
        Artifacts.DocHashesName)
      assert(hashes.count() == 22)
      assert(hashes.filter(col("doc_id") === 99L).count() == 1)
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmpRoot)
      deleteRecursively(new java.io.File(corpus).getParentFile)
      Checkpoints.releaseAll()
    }
  }

  test("fallback paths: missing old artifacts and oversized diffs rebuild fully") {
    val tmpRoot = Files.createTempDirectory("graft-fb-root").toFile
    val base = Files.createTempDirectory("graft-fb-corpus").toString
    val (oldDir, newDir) = (s"$base/old", s"$base/new")
    try {
      val src = Tables.documents(spark, sf)
      src.filter(col("doc_id") % 2 === 0).write.parquet(s"$oldDir/documents.parquet")
      src.filter(col("doc_id") % 3 === 0).write.parquet(s"$newDir/documents.parquet")
      Artifacts.setRoot(tmpRoot.getAbsolutePath)

      // old never materialized → full rebuild of new
      val r1 = Artifacts.materializeIncremental(spark, oldDir, newDir)
      assert(r1.mode == "full_missing_old", r1)
      assert(Artifacts.isMaterialized(spark, newDir, Artifacts.KeepersName))

      // old materialized, but the diff is most of the corpus → full
      Artifacts.materialize(spark, oldDir)
      val strictFrac = Artifacts.materializeIncremental(spark, oldDir, newDir,
        maxChangeFraction = 0.0001)
      // newDir already committed for its fingerprint → skip beats fallback
      assert(strictFrac.mode == "skip", strictFrac)
      // force a re-decision by pointing at a fresh copy of new
      val newDir2 = s"$base/new2"
      src.filter(col("doc_id") % 3 === 0).write.parquet(s"$newDir2/documents.parquet")
      val r2 = Artifacts.materializeIncremental(spark, oldDir, newDir2,
        maxChangeFraction = 0.0001)
      assert(r2.mode == "full_large_diff", r2)
      assert(r2.added > 0 && r2.removed > 0)
      assert(Artifacts.isMaterialized(spark, newDir2, Artifacts.KeepersName))
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmpRoot)
      deleteRecursively(new java.io.File(base))
      Checkpoints.releaseAll()
    }
  }
}

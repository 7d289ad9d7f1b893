package graft

import org.apache.spark.sql.functions._
import graft.operators.{RelationalQueries, TextAnalysis}

/** Guards on PHYSICAL plan properties the 100 TB design depends on —
  * regressions here don't change answers at test scale, they change
  * whether the plan survives a 1000-executor cluster: column pruning at
  * the scan, filter pushdown into parquet, dimension broadcasts instead
  * of fact shuffles, and top-k via TakeOrderedAndProject instead of a
  * full sort.
  */
class PlanQualitySpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("narrow text queries prune the documents scan to (doc_id, text)") {
    val p = plan(TextAnalysis.q24TextStats(spark, sf))
    val readSchema = p.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"),
      readSchema)
    // the documents table carries lang/source/payload columns the query
    // must NOT read
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      readSchema)
  }

  test("comparison filters push down into the parquet scan") {
    val p = plan(spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") > 100).select("doc_id"))
    val pushed = p.linesIterator
      .find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("GreaterThan"), pushed)
  }

  test("baseline join queries broadcast the dimension side") {
    for (q <- Seq(RelationalQueries.q1TopRated _,
        RelationalQueries.q2TopGenres _, RelationalQueries.q3GroupConcat _)) {
      val p = plan(q(spark, sf))
      assert(p.contains("BroadcastHashJoin"), p.take(400))
      assert(!p.contains("SortMergeJoin"),
        "dimension join fell back to a fact shuffle:\n" + p.take(400))
    }
  }

  test("top-k queries plan TakeOrderedAndProject, not a full sort") {
    for (q <- Seq(RelationalQueries.q1TopRated _,
        RelationalQueries.q2TopGenres _, RelationalQueries.q3GroupConcat _)) {
      assert(plan(q(spark, sf)).contains("TakeOrderedAndProject"))
    }
  }

  test("q47 broadcasts the eval shingle set — the corpus side never shuffles to the join") {
    val p = plan(graft.operators.CorpusOps.q47Decontaminate(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(600))
  }

  test("q49 is map-only: no exchange except the presentation sort") {
    val p = plan(graft.operators.CorpusOps.q49PiiScrub(spark, sf))
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    // exactly the rangepartitioning for the final ORDER BY
    assert(exchanges.forall(_.contains("rangepartitioning")), exchanges.mkString("\n"))
  }

  test("q123 heavy pass prunes the scan to (doc_id, text); final plan only sorts the checkpointed arrays") {
    // the regex chain's scan: only the two columns it needs
    val pBase = plan(graft.operators.Extraction.extractionBase(
      Tables.documents(spark, sf)))
    val readSchema = pBase.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"),
      readSchema)
    assert(!readSchema.contains("lang") && !readSchema.contains("n_chars"),
      readSchema)
    // the visible q123 plan starts at the checkpointed arrays: the only
    // exchange left is the presentation sort (the width-fixing hash
    // exchange happens inside the checkpoint build)
    val p = plan(graft.operators.Extraction.q123TextExtract(spark, sf))
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      exchanges.mkString("\n"))
    Checkpoints.releaseAll()
  }

  test("q51 top-k plans TakeOrderedAndProject, not a full sort") {
    assert(plan(graft.operators.CorpusOps.q51BoilerplateNgrams(spark, sf))
      .contains("TakeOrderedAndProject"))
  }

  test("q20's capped index shuffles once: the pair join reuses the window exchange") {
    val df = graft.operators.Dedup.q20NgramJaccard(spark, sf)
    // collect through df's own query execution so AQE finalizes THIS
    // plan (a sink write executes a separate QueryExecution)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"), p.take(800))
  }

  test("q46's per-stratum cap gets map-side WindowGroupLimit before the shuffle") {
    val df = graft.operators.Curation.q46StratifiedCap(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the Partial limit bounds each partition's contribution to K rows
    // per stratum BEFORE the exchange — the property that keeps a giant
    // stratum from shipping its full population to one reducer
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"), p.take(800))
  }

  test("q48's per-doc window partitions by (shard, rng) — no task owns more than a range") {
    val df = graft.operators.CorpusOps.sequencePack(spark, sf, 64L)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the level-3 running sum must be partitioned by BOTH shard and rng:
    // partitioning by shard alone is the 16-task ceiling this decomposition
    // removes (each (shard, rng) cell holds at most `width` documents
    // regardless of corpus size)
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.exists(w => w.contains("shard") && w.contains("rng")
      && w.contains("doc_id")), windows.mkString("\n"))
    // and the bounded-mass property itself, measured: no window cell
    // exceeds the range width in documents
    val maxCell = graft.operators.CorpusOps.sequencePack(spark, sf, 64L)
      .groupBy(col("shard"), col("doc_id").divide(64).cast("long").as("rng"))
      .count().agg(max("count")).head.getLong(0)
    assert(maxCell <= 64L, s"cell holds $maxCell docs")
  }

  test("q75's running sums partition by (source, band) behind a map-side rank cap") {
    val df = graft.operators.Curation.q75TokenBudget(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the literal rank cap must plan a Partial WindowGroupLimit, so each
    // scan partition ships at most budget+1 rows per (source, band) into
    // the doc-grain shuffle
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"), p.take(800))
    // no doc-grain running sum partitioned by source alone: every
    // windowspecdefinition ordered by (n_tokens, doc_id) — the doc-grain
    // windows — must carry the band key; the only source-alone window is
    // the band-grain base offset (ordered by band)
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.nonEmpty)
    windows.filter(_.contains("doc_id")).foreach { w =>
      assert(w.contains("band"),
        "doc-grain window lost the band key:\n" + w)
    }
  }

  test("q60/q77 corpus indexes: the corpus is scanned at most once per query plan") {
    // q60 is a single aggregation chain over the shingle rows by
    // construction (flag-aggregate, no self-join); q77 feeds its
    // (source, token, n) index into a totals aggregate AND both sides of
    // a self-join, collapsed onto one materialized RDD by a checkpoint.
    // Either way the corpus must be scanned at most once per query —
    // this guard turns a silent 3× corpus re-scan into a red test.
    for (q <- Seq(graft.operators.CorpusAudit.q60SplitOverlap _,
        graft.operators.CorpusAudit.q77SourceOverlap _)) {
      val df = q(spark, sf)
      df.collect()
      val scans = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0).linesIterator
        .count(l => l.contains("FileScan parquet") && l.contains("documents"))
      Checkpoints.releaseAll()
      assert(scans <= 1,
        s"query plan scans the documents table $scans times — single-pass shape lost")
    }
  }

  test("q64 chunking is map-only: no exchange except the presentation sort") {
    val p = plan(graft.operators.Segments.q64ChunkDocs(spark, sf))
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")), exchanges.mkString("\n"))
  }

  test("q101 chunk search ranks via TakeOrderedAndProject, not a full sort") {
    val p = plan(graft.operators.Search.q101ChunkSearch(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
  }

  test("q66 search ranks via TakeOrderedAndProject, not a full sort") {
    assert(plan(graft.operators.Search.q66KeywordSearch(spark, sf))
      .contains("TakeOrderedAndProject"))
  }

  test("artifact mode: q126 phrase search reads the positional index — text never scanned") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-planguard").toFile
    // FileScan location strings truncate at maxMetadataStringLength —
    // widen so the artifact directory name is visible to the assertion
    val prevLen = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materialize(spark, sf)
      val df = graft.operators.Search.q126PhraseSearch(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      Checkpoints.releaseAll()
      assert(p.contains(tmp.getName),
        "q126 plan does not read the artifact root:\n" + p.take(600))
      val docScans = p.linesIterator.count(l =>
        l.contains("FileScan parquet") && l.contains("documents"))
      assert(docScans == 0, s"q126 artifact-mode plan scans documents $docScans times")
      assert(p.contains(Artifacts.TokenPositionsName),
        "q126 plan does not read the positional index:\n" + p.take(600))
    } finally {
      spark.conf.set("spark.sql.maxMetadataStringLength", prevLen)
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("artifact mode: q124 reads the standing indexes — text never scanned, corpus pass count independent of registry size") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-planguard").toFile
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materialize(spark, sf)
      val df = graft.operators.EvalSets.q124EvalDecontam(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      Checkpoints.releaseAll()
      assert(p.contains(tmp.getName),
        "q124 plan does not read the artifact root:\n" + p.take(600))
      // the registry membership explode is map-side: the documents table
      // is never scanned, and the shingle artifacts are read once per
      // leg (eval index + corpus side) — NOT once per registered set
      val docScans = p.linesIterator.count(l =>
        l.contains("FileScan parquet") && l.contains("documents"))
      assert(docScans == 0, s"q124 artifact-mode plan scans documents $docScans times")
      val shingleScans = p.linesIterator.count(l =>
        l.contains("FileScan parquet") &&
          (l.contains(Artifacts.Shingles8Name) || l.contains(Artifacts.EvalShinglesName)))
      assert(shingleScans <= 2,
        s"q124 scans shingle artifacts $shingleScans times for " +
          s"${graft.operators.EvalSets.Registry.size} registered sets")
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("artifact mode: keeper consumers read the parquet artifact, no CC fixpoint, one documents scan") {
    // ArtifactsSpec proves artifact reads are row-identical to inline;
    // this guards the PLAN: a future edit could quietly re-inline the
    // connected-components fixpoint while staying hash-equal, and only
    // the plan shows it. With a materialized root, q41/q69's plans must
    // (a) scan the keepers artifact path, (b) contain NO aggregate over
    // the label-propagation shape (the fixpoint runs eagerly via
    // localCheckpoint — its LogicalRDD leaves would appear as scans of
    // ExistingRDD), and (c) scan the documents table at most once.
    val tmp = java.nio.file.Files.createTempDirectory("graft-planguard").toFile
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materialize(spark, sf)
      for ((name, q) <- Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)](
          "q41" -> (graft.operators.Curation.q41CorpusSelect _),
          "q69" -> (graft.operators.Similarity.q69HardNegatives _))) {
        val df = q(spark, sf)
        df.collect()
        // an executed AQE plan prints final AND initial sections — keep
        // only the final one or every scan counts twice
        val p = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        Checkpoints.releaseAll()
        // Location paths are truncated in the plan string, so match the
        // artifact ROOT (unique temp dir), not the artifact name
        assert(p.contains(tmp.getName),
          s"$name plan does not read the artifact root:\n" + p.take(600))
        assert(!p.contains("ExistingRDD"),
          s"$name plan contains a checkpointed fixpoint leaf — CC ran inline:\n" +
            p.take(600))
        val docScans = p.linesIterator.count(l =>
          l.contains("FileScan parquet") && l.contains("documents"))
        assert(docScans <= 1,
          s"$name artifact-mode plan scans documents $docScans times")
      }
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("artifact mode: token-count consumers read standing counts, not the text") {
    // q48's inputs all derive from (doc_id, n_tokens): in artifact mode
    // its plan must contain NO documents scan at all. q26 reads two
    // count artifacts — same property. q75 still scans (doc_id, source)
    // but its scan must not read the text column (pruned schema).
    val tmp = java.nio.file.Files.createTempDirectory("graft-tokguard").toFile
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materialize(spark, sf)
      for ((name, q) <- Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)](
          "q48" -> (graft.operators.CorpusOps.q48SequencePack _),
          "q26" -> (TextAnalysis.q26TokenCount _))) {
        val df = q(spark, sf)
        df.collect()
        val p = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        assert(p.contains(tmp.getName),
          s"$name plan does not read the artifact root:\n" + p.take(600))
        val docScans = p.linesIterator.count(l =>
          l.contains("FileScan parquet") && l.contains("documents"))
        assert(docScans == 0,
          s"$name artifact-mode plan still scans documents $docScans times")
      }
      val q75 = graft.operators.Curation.q75TokenBudget(spark, sf)
      q75.collect()
      val p75 = q75.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(p75.contains(tmp.getName))
      val textScans = p75.linesIterator.count(l =>
        l.contains("FileScan parquet") && l.contains("documents") &&
          l.contains("text"))
      assert(textScans == 0,
        "q75 artifact-mode scan still reads the text column")
      // q160 under the TRAINED tokenizer's committed counts: the budget
      // scan likewise reads (doc_id, source), never text — tokenization
      // under the trained table is paid once at materialize time
      Artifacts.materializeTrainedTokenCounts(spark, sf)
      val q160 = graft.operators.Curation.q160TrainedBudget(spark, sf)
      q160.collect()
      val p160 = q160.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(p160.contains(tmp.getName),
        "q160 plan does not read the trained count artifact:\n" +
          p160.take(600))
      val textScans160 = p160.linesIterator.count(l =>
        l.contains("FileScan parquet") && l.contains("documents") &&
          l.contains("text"))
      assert(textScans160 == 0,
        "q160 artifact-mode scan still reads the text column")
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("artifact mode: decontam/overlap family reads the standing indexes") {
    // q60 and q77 derive ENTIRELY from the shingles8 / token_freq
    // artifacts (split and source ride the index rows) — zero documents
    // scans; q47 keeps one pruned scan for the train id ledger but its
    // shingle sides must come from the artifact.
    val tmp = java.nio.file.Files.createTempDirectory("graft-declguard").toFile
    def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    }
    def docScans(p: String): Int = p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("documents"))
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materialize(spark, sf)
      for ((name, q, maxScans) <- Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame, Int)](
          ("q60", graft.operators.CorpusAudit.q60SplitOverlap _, 0),
          ("q77", graft.operators.CorpusAudit.q77SourceOverlap _, 0),
          ("q153", graft.operators.TextAnalysis.q153TrainedFertility _, 0),
          ("q47", graft.operators.CorpusOps.q47Decontaminate _, 1))) {
        val p = finalPlan(q(spark, sf))
        Checkpoints.releaseAll()
        assert(p.contains(tmp.getName),
          s"$name plan does not read the artifact root:\n" + p.take(600))
        assert(docScans(p) <= maxScans,
          s"$name artifact-mode plan scans documents ${docScans(p)} times (max $maxScans)")
      }
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("q82 near-dup candidates come from equi-joins — never a pairwise product") {
    val p = plan(graft.operators.Similarity.q82AnnNearDupPairs(spark, sf))
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(600))
  }

  test("q83 classifier inference is map-only: no exchange except the presentation sort") {
    val p = plan(graft.operators.TextAnalysis.q83QualityClassifier(spark, sf))
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      exchanges.mkString("\n"))
    val readSchema = p.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text") &&
      !readSchema.contains("lang"), readSchema)
  }

  test("q84's per-doc window partitions by rng — no task owns more than a range") {
    val p = plan(graft.operators.CorpusOps.q84ShardManifest(spark, sf))
    // the only global (un-partitioned) windows run over the tiny
    // range-totals table; the doc-grain running sum must partition by rng
    val windows = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    val docGrain = windows.filter(_.contains("doc_id"))
    assert(docGrain.nonEmpty, windows.mkString("\n"))
    docGrain.foreach(w => assert(w.contains("rng"),
      s"doc-grain window lost its rng partitioning:\n$w"))
    val scans = p.split("== Initial Plan ==")(0).linesIterator
      .count(l => l.contains("FileScan parquet") && l.contains("documents"))
    Checkpoints.releaseAll()
    assert(scans <= 1,
      s"q84 scans the documents table $scans times — single-pass shape lost")
  }

  test("artifact mode: q88/q89 never scan document text") {
    // q88 reads keepers from the artifact plus a doc_id-pruned seed
    // scan; q89 joins the standing token counts against a
    // (doc_id, lang, source) projection — in both, the text column
    // must never reach a documents FileScan
    val tmp = java.nio.file.Files.createTempDirectory("graft-tkmixg").toFile
    def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    }
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materialize(spark, sf)
      for ((name, q) <- Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)](
          ("q88", graft.operators.Curation.q88TakedownCascade _),
          ("q89", graft.operators.CorpusOps.q89TemperatureMixture _))) {
        val p = finalPlan(q(spark, sf))
        Checkpoints.releaseAll()
        assert(p.contains(tmp.getName),
          s"$name plan does not read the artifact root:\n" + p.take(600))
        val docLines = p.linesIterator.filter(l =>
          l.contains("FileScan parquet") && l.contains("documents")).toSeq
        assert(docLines.size <= 1,
          s"$name artifact-mode plan scans documents ${docLines.size} times")
        docLines.foreach(l => assert(!l.contains("text"),
          s"$name reads document text in artifact mode:\n$l"))
      }
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("q130 pairs only within cells — equi-join, no pairwise product") {
    val p = plan(graft.operators.SemanticOps.q130SemDedup(spark, sf))
    // the candidate generation must be the cell equi-join (hash or
    // sort-merge on the cell key), never a corpus cross product
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "q130 plans a pairwise product:\n" + p.take(800))
  }

  test("artifact mode: q130 reads the standing cell assignment") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-semguard").toFile
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materializeEmbeddings(spark, sf)
      val df = graft.operators.SemanticOps.q130SemDedup(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      Checkpoints.releaseAll()
      assert(p.contains(tmp.getName),
        "q130 plan does not read the artifact root (Lloyd re-ran):\n" +
          p.take(600))
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("artifact mode: q136 cards ride postings + cells + census — zero documents scans") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cardguard").toFile
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materialize(spark, sf)
      Artifacts.materializeEmbeddings(spark, sf)
      val df = graft.operators.SemanticOps.q136ClusterCards(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      Checkpoints.releaseAll()
      val docScans = p.linesIterator.count(l =>
        l.contains("FileScan parquet") && l.contains("documents"))
      assert(docScans == 0,
        s"q136 artifact-mode plan scans documents $docScans times:\n" +
          p.take(600))
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("artifact mode: q139 reads the standing PQ codes — Lloyd never re-runs") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-pqguard").toFile
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materializeEmbeddings(spark, sf)
      val df = graft.operators.Pq.q139PqRecall(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      Checkpoints.releaseAll()
      assert(p.contains(tmp.getName),
        "q139 plan does not read the artifact root (PQ re-trained):\n" +
          p.take(600))
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("artifact mode: q129 reads the standing line_df — the line aggregate never re-runs") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-linedfguard").toFile
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materialize(spark, sf)
      val df = graft.operators.Extraction.q129LineDedup(spark, sf)
      val withArt = df.collect().map(_.toSeq).toSeq
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      Checkpoints.releaseAll()
      assert(p.contains(tmp.getName),
        "q129 plan does not read the artifact root (line df re-aggregated):\n" +
          p.take(600))
      // and the artifact-served result is row-identical to the inline one
      Artifacts.clearRoot()
      val inline = graft.operators.Extraction.q129LineDedup(spark, sf)
        .collect().map(_.toSeq).toSeq
      assert(withArt == inline)
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("artifact mode: q140 reads BOTH standing indexes — nothing re-trains") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivfadcguard").toFile
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materializeEmbeddings(spark, sf)
      val df = graft.operators.Pq.q140IvfAdcRecall(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      Checkpoints.releaseAll()
      assert(p.contains(tmp.getName),
        "q140 plan does not read the artifact root (indexes re-trained):\n" +
          p.take(600))
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("artifact mode: q146 reads the standing residual index — nothing re-trains") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-resguard").toFile
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materializeEmbeddings(spark, sf)
      val df = graft.operators.Pq.q146IvfAdcResidualRecall(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      Checkpoints.releaseAll()
      assert(p.contains(tmp.getName),
        "q146 plan does not read the artifact root (indexes re-trained):\n" +
          p.take(600))
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("artifact mode: q132 islands ride the standing span dictionary") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-runguard").toFile
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materialize(spark, sf)
      val df = graft.operators.CorpusOps.q132DupRuns(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      Checkpoints.releaseAll()
      // the df aggregate must come from the artifact, not a second
      // corpus-wide span explode (the positional explode itself is the
      // one legitimate documents read)
      assert(p.contains(tmp.getName),
        "q132 plan does not read the artifact root:\n" + p.take(600))
      val docScans = p.linesIterator.count(l =>
        l.contains("FileScan parquet") && l.contains("documents"))
      assert(docScans <= 2,
        s"q132 artifact-mode plan scans documents $docScans times")
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("q92/q93 probe evals inherit the broadcast-probe shape — no pairwise product") {
    for ((name, q) <- Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)](
        ("q92", graft.operators.Similarity.q92AnnRecall _),
        ("q93", graft.operators.Similarity.q93KnnLabelEval _),
        ("q139", graft.operators.Pq.q139PqRecall _))) {
      val p = plan(q(spark, sf))
      // the probe×corpus scoring must ride a broadcast of the probe side
      assert(p.contains("BroadcastNestedLoopJoin") ||
        p.contains("BroadcastHashJoin"),
        s"$name lost the broadcast probe side:\n" + p.take(600))
      // an un-broadcast cross join would be an O(n²) corpus product
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n" + p.take(600))
    }
  }

  test("q94's doc-grain rank partitions by (band, hb) — global window only over cells") {
    val p = plan(graft.operators.Curation.q94CurriculumOrder(spark, sf))
    val windows = p.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    val docGrain = windows.filter(_.contains("doc_id"))
    assert(docGrain.nonEmpty, windows.mkString("\n"))
    docGrain.foreach(w => assert(w.contains("band") && w.contains("hb"),
      s"doc-grain rank lost its (band, hb) partitioning:\n$w"))
  }

  test("artifact mode: q95 reads standing counts — document text never scanned") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-fertguard").toFile
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materialize(spark, sf)
      val df = TextAnalysis.q95TokenizerFertility(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      Checkpoints.releaseAll()
      assert(p.contains(tmp.getName),
        "q95 plan does not read the artifact root:\n" + p.take(600))
      val docLines = p.linesIterator.filter(l =>
        l.contains("FileScan parquet") && l.contains("documents")).toSeq
      assert(docLines.size <= 1,
        s"q95 artifact-mode plan scans documents ${docLines.size} times")
      docLines.foreach(l => assert(!l.contains("text"),
        s"q95 reads document text in artifact mode:\n$l"))
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("q103's centroid join broadcasts and its bottom-k is WindowGroupLimit-shaped") {
    val df = graft.operators.Similarity.q103CentroidOutliers(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // |labels| rows must broadcast back onto the corpus scan — a
    // centroid SortMergeJoin would shuffle the whole embedding table
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), p.take(800))
    // only ≤K rows per label may survive the rank shuffle
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"), p.take(800))
  }

  test("artifact mode: q105 reads the shingle index — text never scanned; q106 composes on keepers") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-novguard").toFile
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materialize(spark, sf)
      // q105: both aggregations ride the shingles8 artifact; the one
      // documents scan contributes only (doc_id, source) — a text read
      // would mean the tokenize+shingle pass ran inline
      val d5 = graft.operators.CorpusAudit.q105NgramNovelty(spark, sf)
      d5.collect()
      val p5 = d5.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      Checkpoints.releaseAll()
      assert(p5.contains(tmp.getName),
        "q105 plan does not read the artifact root:\n" + p5.take(600))
      val textScans = p5.linesIterator.count(l =>
        l.contains("FileScan parquet") && l.contains("documents") &&
          l.contains("text"))
      assert(textScans == 0, "q105 artifact-mode scan still reads text")
      // q106: keeper election must compose on the artifact — no inline
      // CC fixpoint leaf; one documents scan (the classifier needs text)
      val d6 = graft.operators.Dedup.q106QualityKeepers(spark, sf)
      d6.collect()
      val p6 = d6.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      Checkpoints.releaseAll()
      assert(p6.contains(tmp.getName),
        "q106 plan does not read the artifact root:\n" + p6.take(600))
      assert(!p6.contains("ExistingRDD"),
        "q106 plan contains a checkpointed fixpoint leaf — CC ran inline")
      val docScans = p6.linesIterator.count(l =>
        l.contains("FileScan parquet") && l.contains("documents"))
      assert(docScans <= 1,
        s"q106 artifact-mode plan scans documents $docScans times")
      assert(p6.contains("WindowGroupLimit"),
        "q106 per-cluster argmax lost its group-limit shape")
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("q107's three cutoffs are TakeOrderedAndProject — no full sorts before the limit") {
    val df = graft.operators.Search.q107Rm3Expansion(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // seed top-F, expansion top-E, and the final top-k must all plan as
    // bounded top-k; a full Sort+Limit on the corpus-scale score frame
    // is the regression this guards against
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("artifact mode: q108 reads standing token counts — text never scanned") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-repguard").toFile
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materialize(spark, sf)
      val df = graft.operators.CorpusOps.q108RepetitionPlan(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      Checkpoints.releaseAll()
      assert(p.contains(tmp.getName),
        "q108 plan does not read the artifact root:\n" + p.take(600))
      val textScans = p.linesIterator.count(l =>
        l.contains("FileScan parquet") && l.contains("documents") &&
          l.contains("text"))
      assert(textScans == 0, "q108 artifact-mode scan still reads text")
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("artifact mode: q110/q112 derive from standing indexes — text never scanned") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-divguard").toFile
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materialize(spark, sf)
      // q110: both TTR grains re-aggregate from token_freq/bigram_freq —
      // NO documents scan at all
      val d10 = graft.operators.CorpusAudit.q110DiversityProfile(spark, sf)
      d10.collect()
      val p10 = d10.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      Checkpoints.releaseAll()
      assert(p10.contains(tmp.getName),
        "q110 plan does not read the artifact root:\n" + p10.take(600))
      val docScans10 = p10.linesIterator.count(l =>
        l.contains("FileScan parquet") && l.contains("documents"))
      assert(docScans10 == 0,
        s"q110 artifact-mode plan still scans documents $docScans10 times")
      // q112: shingle work rides the artifact; the one documents scan
      // lists the test split by doc_id — text must stay unread
      val d12 = graft.operators.CorpusAudit.q112EvalContamination(spark, sf)
      d12.collect()
      val p12 = d12.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      Checkpoints.releaseAll()
      assert(p12.contains(tmp.getName),
        "q112 plan does not read the artifact root:\n" + p12.take(600))
      val textScans12 = p12.linesIterator.count(l =>
        l.contains("FileScan parquet") && l.contains("documents") &&
          l.contains("text"))
      assert(textScans12 == 0, "q112 artifact-mode scan still reads text")
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("artifact mode: q113 counts pairs over the vocabulary — no documents scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-bpeguard").toFile
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materialize(spark, sf)
      val df = TextAnalysis.q113BpeMergeCensus(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      Checkpoints.releaseAll()
      assert(p.contains(tmp.getName),
        "q113 plan does not read the artifact root:\n" + p.take(600))
      val docScans = p.linesIterator.count(l =>
        l.contains("FileScan parquet") && l.contains("documents"))
      assert(docScans == 0,
        s"q113 artifact-mode plan still scans documents $docScans times " +
          "— the merge census must be vocabulary-sized, not corpus-sized")
      assert(p.contains("TakeOrderedAndProject"), p.take(800))
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("artifact mode: the lexical-search family rides the postings indexes — zero documents scans") {
    // q66/q101/q102/q107 each consumed a per-query corpus tokenize
    // (q107 three times per run); with the token_postings /
    // chunk_postings artifacts materialized, every pass is a term- or
    // doc-bounded filter of standing doc-grain state and the documents
    // table must not appear in ANY of the executed plans. q118 rides
    // the same postings; q119/q120 run entirely over the standing
    // frequency indexes. (q102's dense leg scans embeddings — that is
    // its own index family.)
    val tmp = java.nio.file.Files.createTempDirectory("graft-searchguard").toFile
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materialize(spark, sf)
      val queries: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
        "q66" -> graft.operators.Search.q66KeywordSearch(spark, sf),
        "q101" -> graft.operators.Search.q101ChunkSearch(spark, sf),
        "q102" -> graft.operators.Search.q102HybridSearch(spark, sf),
        "q107" -> graft.operators.Search.q107Rm3Expansion(spark, sf),
        "q118" -> graft.operators.Search.q118TfidfKeyterms(spark, sf),
        "q119" -> graft.operators.TextAnalysis.q119PmiCollocations(spark, sf),
        "q120" -> graft.operators.TextAnalysis.q120OovRate(spark, sf),
        "q121" -> graft.operators.Search.q121Bm25Full(spark, sf),
        "q128" -> graft.operators.Search.q128ProximitySearch(spark, sf),
        "q134" -> graft.operators.Search.q134Snippet(spark, sf))
      queries.foreach { case (name, df) =>
        df.collect()
        val p = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        Checkpoints.releaseAll()
        assert(p.contains(tmp.getName),
          s"$name plan does not read the artifact root:\n" + p.take(600))
        val docScans = p.linesIterator.count(l =>
          l.contains("FileScan parquet") && l.contains("documents"))
        assert(docScans == 0,
          s"$name artifact-mode plan still scans documents $docScans times " +
            "— the lexical family must join the standing postings index")
      }
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("artifact mode: the image family rides image_grids — media never re-decoded") {
    // q162/q163/q165/q167 all derive from the per-doc grid frame; with
    // the image_grids artifact materialized each query is column
    // arithmetic + joins over standing state and the documents table
    // (the decode input) must not appear in any executed plan — media
    // decode is the pass a 100 TB multimodal corpus cannot afford per
    // query
    val tmp = java.nio.file.Files.createTempDirectory("graft-imgguard").toFile
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materialize(spark, sf)
      // thunks, not frames: q175 checkpoints its quantized vectors at
      // construction, and the per-query releaseAll below would drop a
      // pre-built frame's blocks before its collect
      val queries: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
        "q162" -> (() => graft.operators.Multimodal.q162ImageResize(spark, sf)),
        "q163" -> (() => graft.operators.Multimodal.q163ImagePhashDups(spark, sf)),
        "q165" -> (() => graft.operators.Multimodal.q165ImageHammingPairs(spark, sf)),
        "q167" -> (() => graft.operators.Multimodal.q167ImageKnn(spark, sf)),
        "q175" -> (() => graft.operators.Multimodal.q175ImageIvf(spark, sf)))
      queries.foreach { case (name, mk) =>
        val df = mk()
        df.collect()
        val p = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        Checkpoints.releaseAll()
        assert(p.contains(tmp.getName),
          s"$name plan does not read the artifact root:\n" + p.take(600))
        val docScans = p.linesIterator.count(l =>
          l.contains("FileScan parquet") && l.contains("documents"))
        assert(docScans == 0,
          s"$name artifact-mode plan still scans documents $docScans times " +
            "— the image family must read the standing image_grids")
      }
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("artifact mode: the trained-quality family rides quality_scores — " +
      "never re-trained or re-scored") {
    // q148 is the standing model, q151 the standing scores + a label CASE
    // — ZERO documents scans; q154 adds only the (doc_id, source)
    // curated-label projection, so its documents read must never touch
    // text. Training + scoring at query time is what made q159 the
    // bench's top hotspot.
    val tmp = java.nio.file.Files.createTempDirectory("graft-qualguard").toFile
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materialize(spark, sf)
      val zeroDoc: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
        "q148" -> graft.operators.QualityTrain.q148QualityTrain(spark, sf),
        "q151" -> graft.operators.QualityTrain.q151TrainedQuality(spark, sf))
      zeroDoc.foreach { case (name, df) =>
        df.collect()
        val p = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        Checkpoints.releaseAll()
        assert(p.contains(tmp.getName),
          s"$name plan does not read the artifact root:\n" + p.take(600))
        val docScans = p.linesIterator.count(l =>
          l.contains("FileScan parquet") && l.contains("documents"))
        assert(docScans == 0,
          s"$name artifact-mode plan still scans documents $docScans times")
      }
      val sweep = graft.operators.QualityTrain
        .q154TrainedThresholdSweep(spark, sf)
      sweep.collect()
      val p = sweep.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      Checkpoints.releaseAll()
      assert(p.contains(tmp.getName),
        "q154 plan does not read the artifact root:\n" + p.take(600))
      val textScans = p.linesIterator.count(l =>
        l.contains("FileScan parquet") && l.contains("documents") &&
          l.contains("text"))
      assert(textScans == 0,
        "q154 artifact-mode documents scan still reads text")
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("artifact mode: the video/audio dedup family rides the standing " +
      "signatures — zero documents scans, zero media decode") {
    // q172/q173 read video_sigs, q176/q177 read audio_sigs: the decode
    // pass runs once per snapshot at materialize time, never per query
    val tmp = java.nio.file.Files.createTempDirectory("graft-sigguard").toFile
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materialize(spark, sf)
      val family: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
        "q172" -> (() => graft.operators.Multimodal.q172VideoPhashDups(spark, sf)),
        "q173" -> (() => graft.operators.Multimodal.q173VideoHammingPairs(spark, sf)),
        "q176" -> (() => graft.operators.Multimodal.q176AudioPhashDups(spark, sf)),
        "q177" -> (() => graft.operators.Multimodal.q177AudioHammingPairs(spark, sf)))
      family.foreach { case (name, mk) =>
        val df = mk()
        df.collect()
        val p = df.queryExecution.executedPlan.toString
          .split("== Initial Plan ==")(0)
        Checkpoints.releaseAll()
        assert(p.contains(tmp.getName),
          s"$name plan does not read the artifact root:\n" + p.take(600))
        val docScans = p.linesIterator.count(l =>
          l.contains("FileScan parquet") && l.contains("documents"))
        assert(docScans == 0,
          s"$name artifact-mode plan still scans documents $docScans times " +
            "— the dedup family must read the standing signatures")
      }
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("artifact mode: q175 rides the standing image IVF — zero Lloyd " +
      "work, zero documents scans, identical rows") {
    // the trained model is image_ivf_centroids/image_ivf_cells; at query
    // time q175 must read the committed pieces (no Ivf.train call at
    // all — the counter pins it) and touch documents never (vecs come
    // from the standing image_grids)
    val inline = graft.operators.Multimodal.q175ImageIvf(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    Checkpoints.releaseAll()
    val tmp = java.nio.file.Files.createTempDirectory("graft-iivfguard").toFile
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materialize(spark, sf)
      val trains0 = graft.operators.Ivf.trainsPerformed.get()
      val df = graft.operators.Multimodal.q175ImageIvf(spark, sf)
      val got = df.collect().map(_.toString).sorted.toSeq
      assert(got == inline, "artifact-mode q175 drifted from inline")
      assert(graft.operators.Ivf.trainsPerformed.get() == trains0,
        "q175 in artifact mode must not run Lloyd training at query time")
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      Checkpoints.releaseAll()
      assert(p.contains(tmp.getName),
        "q175 plan does not read the artifact root:\n" + p.take(600))
      val docScans = p.linesIterator.count(l =>
        l.contains("FileScan parquet") && l.contains("documents"))
      assert(docScans == 0,
        s"q175 artifact-mode plan still scans documents $docScans times")
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("artifact mode: the curation ledger is two standing joins — " +
      "zero documents scans, identical rows") {
    // q138 = text_gates ⋈ keepers + column arithmetic once both stand;
    // the Gopher/language/quality scans must not reappear in the plan
    // (they're what made every ledger-gated export re-pay the funnel)
    val inline = graft.operators.Curation.q138CurationLedger(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    Checkpoints.releaseAll()
    val tmp = java.nio.file.Files.createTempDirectory("graft-ledgguard").toFile
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materialize(spark, sf)
      val df = graft.operators.Curation.q138CurationLedger(spark, sf)
      val got = df.collect().map(_.toString).sorted.toSeq
      assert(got == inline, "artifact-mode ledger drifted from inline")
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      Checkpoints.releaseAll()
      assert(p.contains(tmp.getName),
        "q138 plan does not read the artifact root:\n" + p.take(600))
      val docScans = p.linesIterator.count(l =>
        l.contains("FileScan parquet") && l.contains("documents"))
      assert(docScans == 0,
        s"q138 artifact-mode plan still scans documents $docScans times")
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("artifact mode: the decontam screens read standing flags — " +
      "identical rows, no per-query re-screen") {
    // q124's lexical screen and q142's semantic screen are computed
    // once per snapshot (eval_flags_lex / eval_flags_sem); at query
    // time neither re-joins shingles nor re-scores cells
    val inline124 = graft.operators.EvalSets.q124EvalDecontam(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val inline142 = graft.operators.SemanticOps.q142SemDecontam(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    Checkpoints.releaseAll()
    val tmp = java.nio.file.Files.createTempDirectory("graft-flagguard").toFile
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materialize(spark, sf)
      Artifacts.materializeEmbeddings(spark, sf)
      val lex = graft.operators.EvalSets.q124EvalDecontam(spark, sf)
      assert(lex.collect().map(_.toString).sorted.toSeq == inline124,
        "artifact-mode q124 drifted from inline")
      val pLex = lex.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(pLex.contains(tmp.getName) &&
        pLex.linesIterator.count(l => l.contains("FileScan parquet") &&
          l.contains("documents")) == 0,
        "q124 artifact-mode plan still scans documents:\n" + pLex.take(600))
      val sem = graft.operators.SemanticOps.q142SemDecontam(spark, sf)
      assert(sem.collect().map(_.toString).sorted.toSeq == inline142,
        "artifact-mode q142 drifted from inline")
      val pSem = sem.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(pSem.contains(tmp.getName) &&
        pSem.linesIterator.count(l => l.contains("FileScan parquet") &&
          l.contains("embeddings")) == 0,
        "q142 artifact-mode plan still scans embeddings:\n" + pSem.take(600))
      Checkpoints.releaseAll()
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("artifact mode: q122 reads the pair artifact — document text never scanned") {
    // the matrix is a rollup of standing dup_pairs state; its one
    // documents read is the (doc_id, source) labeling projection, so a
    // text-column scan means the pair chain leaked back into the plan
    val tmp = java.nio.file.Files.createTempDirectory("graft-dupmxguard").toFile
    try {
      Artifacts.setRoot(tmp.getAbsolutePath)
      Artifacts.materialize(spark, sf)
      val df = graft.operators.CorpusAudit.q122SourceDupMatrix(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      Checkpoints.releaseAll()
      assert(p.contains(tmp.getName),
        "q122 plan does not read the artifact root:\n" + p.take(600))
      val textScans = p.linesIterator.count(l =>
        l.contains("FileScan parquet") && l.contains("documents") &&
          l.contains("text"))
      assert(textScans == 0, "q122 artifact-mode scan still reads text")
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("whole-stage codegen covers the text-analysis expression pipeline") {
    // AQE's pre-execution wrapper hides codegen nodes; plan without it
    // for this structural check only
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val phys = TextAnalysis.q24TextStats(spark, sf)
        .queryExecution.executedPlan
      val spans = phys.collect { case w: WholeStageCodegenExec => w }
      assert(spans.nonEmpty, phys.toString.take(500))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}

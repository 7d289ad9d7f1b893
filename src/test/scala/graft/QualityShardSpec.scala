package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusOps, TextAnalysis}

/** q83 (quality-classifier inference) and q84 (token-balanced shard
  * manifest): hand-computed fixtures for the scoring math, and the
  * structural invariants the manifest promises (two-level ≡ single
  * window, token balance, id-contiguity, mass conservation).
  */
class QualityShardSpec extends SparkSpec {

  // ---- q83 ---------------------------------------------------------------

  test("q83 scores a hand-computed fixture exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-q83").toFile
    try {
      // "the cat sat" → the=9, others 0 → (9 - 2)/10/3 = 0.233333
      // "Click HERE buy now" → click=-20, buy=-15 → (-35 - 2)/10/4 = -0.925
      // "plain words only" → (0 - 2)/10/3 = -0.066667
      Seq((1L, "the cat sat", "en", "web", 11L),
        (2L, "Click HERE buy now", "en", "web", 18L),
        (3L, "plain words only", "en", "web", 16L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"${dir.getPath}/documents.parquet")
      val out = TextAnalysis.q83QualityClassifier(spark, dir.getPath)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Double]("quality_score"), r.getAs[String]("quality_label")))
        .toMap
      assert(out(1L) == ((0.233333, "keep")))
      assert(out(2L) == ((-0.925, "cull")))
      assert(out(3L) == ((-0.066667, "cull")))
    } finally deleteRecursively(dir)
  }

  test("q83/q84 treat NULL-text documents as in-domain input") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-nulltext").toFile
    try {
      // doc 2 has NULL text — the q86 posture: null text is in-domain
      Seq((1L, Option("the cat sat"), "en", "web", 11L),
        (2L, Option.empty[String], "en", "web", 0L),
        (3L, Option("plain words only"), "en", "web", 16L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"${dir.getPath}/documents.parquet")
      // q83: NULL text → NULL count and score (not -1), label "cull"
      val cls = TextAnalysis.q83QualityClassifier(spark, dir.getPath)
        .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
      assert(cls(2L).isNullAt(cls(2L).fieldIndex("n_tokens")))
      assert(cls(2L).isNullAt(cls(2L).fieldIndex("quality_score")))
      assert(cls(2L).getAs[String]("quality_label") == "cull")
      assert(cls(1L).getAs[Int]("n_tokens") == 3)
      // q84: NULL text costs 0 tokens — the doc is still sharded and the
      // cumsum (shard boundaries) is NOT shifted by a legacy -1
      val shards = CorpusOps.q84ShardManifest(spark, dir.getPath).collect()
      assert(shards.map(_.getAs[Long]("n_docs")).sum == 3)
      assert(shards.map(_.getAs[Long]("shard_tokens")).sum == 6)
    } finally deleteRecursively(dir)
  }

  test("q83 tokens match the whitespace tokenizer; label follows score sign") {
    val cls = TextAnalysis.q83QualityClassifier(spark, sf)
    val joined = cls.join(
      TextAnalysis.q26TokenCount(spark, sf).select("doc_id", "ws_tokens"),
      "doc_id")
    assert(joined.filter(col("n_tokens") =!= col("ws_tokens")).count() == 0,
      "q83 length normalization diverged from the q26 whitespace count")
    val rows = cls.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expected =
        if (r.getAs[Double]("quality_score") >= 0.0) "keep" else "cull"
      assert(r.getAs[String]("quality_label") == expected)
    }
  }

  // ---- q84 ---------------------------------------------------------------

  test("q84 two-level decomposition equals a narrow-range re-cut") {
    val wide = CorpusOps.shardManifest(spark, sf, 1L << 16).collect().toSeq
    val narrow = CorpusOps.shardManifest(spark, sf, 7L).collect().toSeq
    assert(wide == narrow,
      s"rangeWidth changed the manifest:\n$wide\nvs\n$narrow")
  }

  test("q84 shards are token-balanced, id-contiguous, and mass-conserving") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), "\\s+")).cast("long")
        .as("n_tokens"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val total = docs.map(_._2).sum
    val maxDoc = docs.map(_._2).max
    val nShards = math.max(
      (total + CorpusOps.TargetShardTokens - 1) / CorpusOps.TargetShardTokens,
      1L)
    val target = (total + nShards - 1) / nShards
    val shards = CorpusOps.q84ShardManifest(spark, sf).collect()
    assert(shards.nonEmpty && shards.length <= nShards)
    assert(shards.forall(_.getAs[Long]("n_shards") == nShards),
      "manifest n_shards disagrees with the auto-size formula")
    // conservation: every doc in exactly one shard
    assert(shards.map(_.getAs[Long]("shard_tokens")).sum == total)
    assert(shards.map(_.getAs[Long]("n_docs")).sum == docs.length)
    // contiguity: shard id ranges are increasing and non-overlapping
    val ordered = shards.sortBy(_.getAs[Int]("shard_id"))
    ordered.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
      case _ =>
    }
    // balance: cutting on the running sum bounds every non-last shard's
    // deviation from target by one document's tokens
    ordered.dropRight(1).foreach { s =>
      val t = s.getAs[Long]("shard_tokens")
      assert(math.abs(t - target) <= maxDoc,
        s"shard ${s.getAs[Int]("shard_id")}: $t vs target $target " +
          s"(max doc $maxDoc)")
    }
  }

  test("q84 on a single giant document puts everything in shard 0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-q84").toFile
    try {
      Seq((42L, Array.fill(100)("w").mkString(" "), "en", "web", 199L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"${dir.getPath}/documents.parquet")
      val m = CorpusOps.q84ShardManifest(spark, dir.getPath).collect()
      assert(m.length == 1)
      assert(m.head.getAs[Int]("shard_id") == 0)
      assert(m.head.getAs[Long]("shard_tokens") == 100L)
      assert(m.head.getAs[Long]("first_doc") == 42L)
    } finally deleteRecursively(dir)
  }

  test("q84 shard count auto-sizes with corpus token mass; cuts stay balanced") {
    import spark.implicits._
    val T = CorpusOps.TargetShardTokens
    def manifestFor(nDocs: Int, perDoc: Int) = {
      val dir = java.nio.file.Files.createTempDirectory("graft-autoshard").toFile
      try {
        (1 to nDocs).map(i => (i.toLong,
            Seq.fill(perDoc)("w").mkString(" "), "en", "s",
            (2L * perDoc - 1)))
          .toDF("doc_id", "text", "lang", "source", "n_chars")
          .write.parquet(s"${dir.getPath}/documents.parquet")
        CorpusOps.q84ShardManifest(spark, dir.getPath).collect()
      } finally {
        Tables.invalidate(dir.getPath)
        deleteRecursively(dir)
      }
    }
    // 1.5×T tokens → 2 shards; 3.25×T → 4 shards: the count MOVES with
    // corpus mass (the fixed-16 posture sheared at 100 TB)
    val small = manifestFor((T * 3 / 2 / 64).toInt, 64)
    val big = manifestFor((T * 13 / 4 / 64).toInt, 64)
    def claimed(m: Array[org.apache.spark.sql.Row]) =
      m.map(_.getAs[Long]("n_shards")).distinct.toSeq
    assert(claimed(small) == Seq(2L) && small.length == 2,
      s"1.5×target corpus cut into ${claimed(small)} shards")
    assert(claimed(big) == Seq(4L) && big.length == 4,
      s"3.25×target corpus cut into ${claimed(big)} shards")
    // balance invariant holds at the auto-sized count: every non-last
    // shard within one document (64 tokens) of its target
    Seq(small, big).foreach { m =>
      val total = m.map(_.getAs[Long]("shard_tokens")).sum
      val n = m.head.getAs[Long]("n_shards")
      val target = (total + n - 1) / n
      m.sortBy(_.getAs[Int]("shard_id")).dropRight(1).foreach { s =>
        assert(math.abs(s.getAs[Long]("shard_tokens") - target) <= 64L)
      }
    }
  }
}

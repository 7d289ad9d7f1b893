package graft

import graft.operators.{Multimodal, Similarity}

class SimilaritySpec extends SparkSpec {

  test("q23 ANN recalls a solid fraction of the exact top-10") {
    val exact = Similarity.q22CosineTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val ann = Similarity.q23AnnLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val recall = exact.count(ann.contains).toDouble / exact.size
    info(s"ANN recall@10 = $recall (${ann.size} ANN rows)")
    assert(recall >= 0.3, s"recall $recall")
  }

  test("vectorCentroid aggregate averages element-wise across partitions") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((0, Array(1.0f, 2.0f)), (0, Array(3.0f, 6.0f)),
      (1, Array(10.0f, 20.0f))).toDF("g", "v").repartition(3)
    val out = df.groupBy("g")
      .agg(graft.functions.VectorOps.vectorCentroid(col("v")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(out(0) == Seq(2.0, 4.0))
    assert(out(1) == Seq(10.0, 20.0))
  }

  test("q35 IVF recalls a solid fraction of the exact top-10") {
    val exact = Similarity.q22CosineTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val ivf = Similarity.q35IvfAnn(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    info(s"IVF recall@10 = $recall (nprobe=3 of 10 cells)")
    assert(recall >= 0.25, s"recall $recall")
  }

  test("q22 scores are valid cosines in descending rank order") {
    val rows = Similarity.q22CosineTopK(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("probe_id")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
      assert(byRank.zip(byRank.tail).forall { case (x, y) => x >= y })
      assert(byRank.forall(c => c >= -1.0001 && c <= 1.0001))
    }
  }

  test("q28 real P6 decode is deterministic; header fields and stats are coherent") {
    val a = Multimodal.q28MultimodalFeatures(spark, sf).collect()
    val b = Multimodal.q28MultimodalFeatures(spark, sf).collect()
    assert(a.sameElements(b))
    a.take(50).foreach { r =>
      assert(r.getAs[Int]("maxval") == 255)
      assert(r.getAs[Int]("n_pixels") ==
        r.getAs[Int]("width") * r.getAs[Int]("height"))
      // container = header + plane, byte-exact
      assert(r.getAs[Long]("n_bytes") ==
        3L + r.getAs[Int]("width").toString.length + 1 +
          r.getAs[Int]("height").toString.length + 5 +
          3L * r.getAs[Int]("n_pixels"))
      Seq("r", "g", "b").foreach { c =>
        val mean = r.getAs[Double](s"mean_$c")
        assert(mean >= 0.0 && mean <= 255.0)
        assert(r.getAs[Int](s"min_$c") <= r.getAs[Int](s"max_$c"))
      }
    }
  }

  test("documents corpus is pure ASCII (q28 oracle byte==char dependency)") {
    // q28's Spark kernel iterates UTF-8 bytes; its DuckDB oracle iterates
    // characters. They agree only while every char is one byte, so a
    // non-ASCII doc would fail the driver's hash compare with no hint
    // why — fail HERE instead, by name.
    import org.apache.spark.sql.functions._
    val nonAscii = spark.read.parquet(s"$sf/documents.parquet")
      .filter(length(col("text")) =!= octet_length(col("text")))
      .count()
    assert(nonAscii == 0,
      s"$nonAscii non-ASCII document(s): q28OracleSql's char-wise replay " +
        "no longer matches the byte-wise kernel — make the oracle " +
        "byte-wise or re-encode the corpus")
  }

  test("frameSample emits n fixed-width windows") {
    val frames = Multimodal.frameSample(
      Multimodal.withMediaColumns(spark.read.parquet(s"$sf/documents.parquet")),
      nFrames = 4, frameLen = 16)
      .collect()
    frames.foreach { r =>
      val fs = r.getSeq[Array[Byte]](1)
      assert(fs.length == 4)
      assert(fs.forall(_.length <= 16))
    }
  }

  test("q82 is a subset of the q21 ground truth with identical scores") {
    val exact = graft.operators.Dedup.q21EmbeddingNearDup(spark, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("cos")).toMap
    val ann = Similarity.q82AnnNearDupPairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("cos")).toMap
    ann.foreach { case (pair, cos) =>
      assert(exact.contains(pair), s"q82 pair $pair not in q21 ground truth")
      assert(exact(pair) == cos, s"score drift at $pair: ${exact(pair)} vs $cos")
    }
    val recall = if (exact.isEmpty) 1.0
      else ann.size.toDouble / exact.size
    info(s"q82 near-dup recall = $recall (${ann.size}/${exact.size} pairs)")
    // random unclustered embeddings at cos≈0.4 are sign-LSH's worst
    // case (see the NearDup* scaladoc) — the floor pins the configured
    // trade, production corpora with true near-dups sit far higher
    assert(recall >= 0.15, s"recall $recall")
  }

  test("q82's bucket cap degrades degenerate buckets to a min-id star") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-q82cap").toFile
    try {
      def corpus(n: Int): String = {
        val d = new java.io.File(dir, s"n$n"); d.mkdirs()
        // identical vectors: every pair is an exact duplicate (cos 1.0)
        // and all of them land in the same bucket of every table
        (0 until n).map(i => (i.toLong, Array.fill(64)(0.5f), 0))
          .toDF("vec_id", "embedding", "label")
          .write.mode("overwrite").parquet(s"${d.getPath}/embeddings.parquet")
        d.getPath
      }
      val small = Similarity.q82AnnNearDupPairs(spark, corpus(10)).collect()
      assert(small.length == 10 * 9 / 2, s"${small.length} pairs")
      assert(small.forall(_.getAs[Double]("cos") == 1.0))
      // 300 > NearDupBucketCap=256: the one bucket every vector shares is
      // over cap in every table, so the quadratic enumeration degrades to
      // a star against the min-id representative — exactly n−1 pairs, all
      // anchored at id 0, so the most-duplicated cluster still yields the
      // edges a downstream keeper election needs (every member connects
      // to the hub) at O(n) instead of O(n²) cost
      val capped = Similarity.q82AnnNearDupPairs(spark, corpus(300)).collect()
      assert(capped.length == 299,
        s"expected the 299-edge star, got ${capped.length} pairs")
      assert(capped.forall(_.getAs[Long]("id_a") == 0L),
        "star pairs must anchor at the bucket's min id")
      assert(capped.map(_.getAs[Long]("id_b")).toSet == (1L to 299L).toSet)
      assert(capped.forall(_.getAs[Double]("cos") == 1.0))
    } finally deleteRecursively(dir)
  }

  test("past 20k vectors the ground-truth evals refuse; the hash sample evaluates") {
    // q21/q111's brute-force truth is hard-capped; q117's deterministic
    // hash sample is the documented production posture — it must RUN on
    // a corpus the capped ops refuse, on a sample the cap accepts
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-bigvec").toFile
    try {
      val corpus = s"${dir.getPath}/c"
      spark.range(21000).select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(63)),
            j => sin(col("id") * 64 + j)).cast("array<float>").as("embedding"),
          pmod(col("id"), lit(10)).cast("int").as("label"))
        .write.parquet(s"$corpus/embeddings.parquet")
      val e1 = intercept[IllegalArgumentException](
        graft.operators.Dedup.q21EmbeddingNearDup(spark, corpus))
      assert(e1.getMessage.contains("capped"), e1.getMessage)
      intercept[IllegalArgumentException](
        Similarity.q111NearDupRecall(spark, corpus))
      val out = Similarity.sampledNearDupRecall(spark, corpus, 500).collect()
      out.foreach { r =>
        val recall = r.getAs[Double]("recall")
        assert(recall >= 0.0 && recall <= 1.0, r.toString)
        assert(r.getAs[Long]("n_found") <= r.getAs[Long]("n_truth"),
          "q82's exact-cosine confirm makes found ⊆ truth on any corpus")
      }
      info(s"sampled recall bands on 21k vectors: ${out.length}")
    } finally deleteRecursively(dir)
  }

  test("q117's hash sample is layout-independent: a repartitioned corpus samples identically") {
    // the sample is a pure function of vec_id — rewriting the same rows
    // under a different partitioning/file layout must produce the same
    // bands bit-for-bit (an RNG sample() could not promise this)
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-q117layout").toFile
    try {
      val corpus = s"${dir.getPath}/c"
      val src = spark.read.parquet(s"$sf/embeddings.parquet")
      src.repartition(13, col("label")).write
        .parquet(s"$corpus/embeddings.parquet")
      val base = Similarity.q117SampledNearDupRecall(spark, sf)
        .collect().map(_.toString).toSeq
      val relaid = Similarity.q117SampledNearDupRecall(spark, corpus)
        .collect().map(_.toString).toSeq
      assert(base.nonEmpty, "fixture corpus must produce recall bands")
      assert(relaid == base, "sample drifted under a different file layout")
    } finally {
      Tables.invalidate(s"${dir.getPath}/c")
      deleteRecursively(dir)
    }
  }
}

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

  test("q28 multimodal decode stub is deterministic with L1-normalized features") {
    val a = Multimodal.q28MultimodalFeatures(spark, sf).collect()
    val b = Multimodal.q28MultimodalFeatures(spark, sf).collect()
    assert(a.sameElements(b))
    a.take(50).foreach { r =>
      val fsum = (0 until Multimodal.FeatureDim)
        .map(i => r.getAs[Double](s"f$i")).sum
      assert(math.abs(fsum - 1.0) < 1e-3, s"f-sum $fsum")
      assert(r.getAs[Int]("n_bytes") > 0)
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
}

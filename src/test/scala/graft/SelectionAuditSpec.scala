package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusAudit, CorpusOps, Dedup, Similarity, TextAnalysis}

/** Semantics pins for the round-12 selection/audit operators: q103
  * (centroid outliers), q104 (DSIR importance), q105 (n-gram novelty),
  * q106 (quality-aware keepers). Cross-engine value checks live in the
  * DuckDB oracle gate; these pin the invariants the oracle can't state
  * (independent local recomputes, cross-operator consistency, the
  * direction the score is supposed to push).
  */
class SelectionAuditSpec extends SparkSpec {

  /** The engines' shared rounding: through decimal(24,12), then 6 dp. */
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q103 flags exactly the per-label bottom-k of a local recompute") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray))
    val centroids = vecs.groupBy(_._2).map { case (l, vs) =>
      val dim = vs.head._3.length
      l -> Array.tabulate(dim)(i => r6(vs.map(_._3(i)).sum / vs.length))
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      r6(dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)))
    }
    val expected: Map[(Int, Int), (Long, Double)] =
      vecs.groupBy(_._2).toSeq.flatMap { case (l, vs) =>
        vs.map(v => (l, v._1, cos(v._3, centroids(l))))
          .sortBy { case (_, id, c) => (c, id) }
          .take(5).zipWithIndex
          .map { case ((lab, id, c), i) => ((lab, i + 1), (id, c)) }
      }.toMap
    val got = Similarity.q103CentroidOutliers(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val key = (r.getAs[Int]("label"), r.getAs[Int]("rank"))
      val (id, c) = expected(key)
      assert(r.getAs[Long]("vec_id") == id, s"outlier at $key")
      assert(math.abs(r.getAs[Double]("cos_centroid") - c) < 1e-9, s"cos at $key")
    }
  }

  test("q104 scores keep-docs above cull-docs on average and sums exactly") {
    val rows = TextAnalysis.q104DsirWeights(spark, sf).collect()
    assert(rows.nonEmpty)
    val keepSet = TextAnalysis
      .scoredQuality(Tables.documents(spark, sf), "text")
      .filter(col("quality_label") === "keep")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keepSet.nonEmpty && keepSet.size < rows.length,
      "fixture must have both keep and cull docs")
    // direction: the importance score must rank the target sample above
    // the rest — that is the whole point of the estimator
    val (keepScores, cullScores) = rows
      .filter(_.getAs[Long]("n_tokens") > 0)
      .partition(r => keepSet.contains(r.getAs[Long]("doc_id")))
    def mean(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Double]("mean_ratio")).sum / rs.length
    assert(mean(keepScores) > mean(cullScores),
      s"keep mean ${mean(keepScores)} !> cull mean ${mean(cullScores)}")
    // exactness: per-doc micro-ratio integer score recomputed from raw
    // counts with the same pinned double association
    val docs = spark.read.parquet(s"$sf/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def toks(t: String): Seq[String] =
      if (t == null) Seq.empty else t.split("\\s+", -1).toSeq
    val srcCnt = docs.values.toSeq.flatMap(toks)
      .groupBy(identity).map { case (t, o) => t -> o.length.toLong }
    val srcTot = srcCnt.values.sum
    val v = srcCnt.size.toLong
    val tgtCnt = docs.filter(d => keepSet.contains(d._1)).values.toSeq
      .flatMap(toks).groupBy(identity).map { case (t, o) => t -> o.length.toLong }
    val tgtTot = tgtCnt.values.sum
    def delta(t: String): Long = {
      val r = ((tgtCnt.getOrElse(t, 0L) + 1L).toDouble * srcTot.toDouble) /
        ((tgtTot + v).toDouble * srcCnt(t).toDouble)
      BigDecimal(r * 1000000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expected = toks(docs(id)).map(delta).sum
      assert(r.getAs[Long]("dsir_score") == expected, s"doc $id score")
      assert(r.getAs[Long]("n_tokens") == toks(docs(id)).length.toLong,
        s"doc $id n_tokens")
    }
  }

  test("q105 novelty agrees with a local distinct-8-gram recompute") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    def sh8(t: String): Set[String] = {
      val w = if (t == null) Array.empty[String] else t.split("\\s+", -1)
      if (w.length < 8) Set.empty
      else w.sliding(8).map(_.mkString(" ")).toSet
    }
    val perDoc = docs.map { case (id, t) => id -> sh8(t) }.toMap
    val df = perDoc.values.toSeq.flatMap(_.toSeq)
      .groupBy(identity).map { case (s, o) => s -> o.length }
    val rows = CorpusAudit.q105NgramNovelty(spark, sf).collect()
    assert(rows.length == docs.length)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val mine = perDoc(id)
      val uniq = mine.count(df(_) == 1)
      assert(r.getAs[Long]("n_shingles") == mine.size.toLong, s"doc $id total")
      assert(r.getAs[Long]("n_unique") == uniq.toLong, s"doc $id unique")
      if (mine.nonEmpty)
        assert(math.abs(r.getAs[Double]("novelty") -
          r6(uniq.toDouble / mine.size)) < 1e-9, s"doc $id novelty")
      else assert(r.isNullAt(r.fieldIndex("novelty")), s"doc $id null novelty")
    }
    // cross-operator sanity: total unique = number of df=1 shingles
    assert(rows.map(_.getAs[Long]("n_unique")).sum == df.count(_._2 == 1).toLong)
  }

  test("q106 elects the highest-quality member of every q40 cluster") {
    val clusters = Dedup.q40DedupKeepers(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("keeper_id")).toMap
    val score = TextAnalysis
      .scoredQuality(Tables.documents(spark, sf), "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[java.lang.Double]("quality_score")).map(_.toDouble))
      .toMap
    val rows = Dedup.q106QualityKeepers(spark, sf).collect()
    assert(rows.length == clusters.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("cluster_id") == clusters(id), s"doc $id cluster")
      assert(r.getAs[Boolean]("is_quality_keeper") ==
        (id == r.getAs[Long]("quality_keeper_id")))
    }
    // per cluster: exactly one keeper, and it is the (score desc, id asc) argmax
    rows.groupBy(_.getAs[Long]("cluster_id")).foreach { case (c, rs) =>
      val keepers = rs.map(_.getAs[Long]("quality_keeper_id")).distinct
      assert(keepers.length == 1, s"cluster $c keeper not unique")
      val members = rs.map(_.getAs[Long]("doc_id"))
      val best = members.sortBy(id =>
        (score(id).map(-_).getOrElse(Double.MaxValue), id)).head
      assert(keepers.head == best, s"cluster $c argmax")
      assert(rs.count(_.getAs[Boolean]("is_quality_keeper")) == 1)
    }
    // the election must differ from min-id somewhere on this fixture, or
    // the query is q40 with extra steps
    assert(rows.exists(r => r.getAs[Long]("quality_keeper_id") !=
      r.getAs[Long]("cluster_id")), "fixture never re-elects — weak fixture")
  }
}

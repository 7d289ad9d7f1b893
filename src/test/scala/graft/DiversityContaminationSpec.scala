package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusAudit, Curation, Dedup, Similarity}

/** Semantics pins for q110 (lexical diversity), q111 (near-dup pair
  * recall by band), q112 (per-eval-item contamination). Cross-engine
  * value checks live in the DuckDB oracle gate; these pin local
  * recomputes and the structural facts the oracle can't state (subset
  * relations, fixture strength).
  */
class DiversityContaminationSpec extends SparkSpec {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val docs: Array[(Long, String, String)] =
    spark.read.parquet(s"$sf/documents.parquet").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text")))

  private def toks(t: String): Seq[String] =
    if (t == null) Seq.empty else t.split("\\s+", -1).toSeq

  test("q110 TTRs agree with a local per-source recompute") {
    val bySource = docs.groupBy(_._2)
    val rows = CorpusAudit.q110DiversityProfile(spark, sf).collect()
    assert(rows.length == bySource.size)
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      val ts = bySource(s).toSeq.flatMap(d => toks(d._3))
      val bs = bySource(s).toSeq.flatMap(d => toks(d._3).sliding(2).toSeq
        .filter(_.length == 2).map(p => (p(0), p(1))))
      assert(r.getAs[Long]("n_tokens") == ts.length.toLong, s"$s n_tokens")
      assert(r.getAs[Long]("uniq_tokens") == ts.distinct.length.toLong,
        s"$s uniq_tokens")
      assert(r.getAs[Long]("n_bigrams") == bs.length.toLong, s"$s n_bigrams")
      assert(r.getAs[Long]("uniq_bigrams") == bs.distinct.length.toLong,
        s"$s uniq_bigrams")
      assert(math.abs(r.getAs[Double]("ttr_unigram") -
        r6(ts.distinct.length.toDouble / ts.length)) < 1e-9, s"$s ttr1")
      assert(math.abs(r.getAs[Double]("ttr_bigram") -
        r6(bs.distinct.length.toDouble / bs.length)) < 1e-9, s"$s ttr2")
    }
  }

  test("q111 recall reconciles the q21 and q82 pair sets band by band") {
    val truth = Dedup.q21EmbeddingNearDup(spark, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("cos")).toMap
    val found = Similarity.q82AnnNearDupPairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // precision is 1 by construction: every candidate is exact-cosine
    // verified at the same threshold — if this breaks, q82 emits pairs
    // the ground truth denies
    assert(found.subsetOf(truth.keySet), "q82 emitted a non-truth pair")
    val expected = truth.groupBy { case (_, c) => math.floor(c * 20).toInt }
      .map { case (b, m) =>
        b -> (m.size, m.keys.count(found.contains))
      }
    val got = Similarity.q111NearDupRecall(spark, sf).collect()
    assert(got.length == expected.size)
    assert(got.map(_.getAs[Long]("n_truth")).sum == truth.size.toLong)
    assert(got.map(_.getAs[Long]("n_found")).sum == found.size.toLong)
    got.foreach { r =>
      val b = r.getAs[Int]("band")
      val (nT, nF) = expected(b)
      assert(r.getAs[Long]("n_truth") == nT.toLong, s"band $b truth")
      assert(r.getAs[Long]("n_found") == nF.toLong, s"band $b found")
      assert(math.abs(r.getAs[Double]("recall") -
        r6(nF.toDouble / nT)) < 1e-9, s"band $b recall")
    }
  }

  test("q112 agrees with a local shingle-set recompute of the split overlap") {
    val split = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), Curation.splitOf(col("doc_id")).as("split"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split"))
      .toMap
    def sh8(t: String): Set[String] = {
      val w = if (t == null) Array.empty[String] else t.split("\\s+", -1)
      if (w.length < 8) Set.empty else w.sliding(8).map(_.mkString(" ")).toSet
    }
    val perDoc = docs.map { case (id, _, t) => id -> sh8(t) }.toMap
    val df = perDoc.values.toSeq.flatMap(_.toSeq)
      .groupBy(identity).map { case (s, o) => s -> o.length }
    val capped = perDoc.map { case (id, ss) => id -> ss.filter(df(_) <= 64) }
    val trainSh = capped.collect { case (id, ss) if split(id) == "train" =>
      ss.map(_ -> id) }.flatten
      .groupBy(_._1).map { case (s, o) => s -> o.map(_._2).toSet }
    val rows = CorpusAudit.q112EvalContamination(spark, sf).collect()
    val testIds = split.collect { case (id, "test") => id }.toSet
    assert(rows.length == testIds.size)
    var anyContaminated = false
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(testIds.contains(id))
      val mine = capped(id)
      val shared = mine.filter(trainSh.contains)
      val trainDocs = shared.flatMap(trainSh(_))
      assert(r.getAs[Long]("n_train_docs") == trainDocs.size.toLong,
        s"doc $id train docs")
      assert(r.getAs[Long]("n_shared_shingles") == shared.size.toLong,
        s"doc $id shared shingles")
      assert(r.getAs[Boolean]("contaminated") == trainDocs.nonEmpty)
      anyContaminated ||= trainDocs.nonEmpty
    }
    assert(anyContaminated,
      "fixture has zero test-train 8-gram overlap — weak fixture")
  }

  test("q113 pair census agrees with a local frequency-weighted recompute") {
    val counts = docs.flatMap(d => toks(d._3))
      .groupBy(identity).map { case (t, o) => t -> o.length.toLong }
    val agg = scala.collection.mutable.Map
      .empty[(String, String), (Long, Set[String])]
    counts.foreach { case (w, n) =>
      w.sliding(2).filter(_.length == 2).foreach { p =>
        val k = (p.substring(0, 1), p.substring(1, 2))
        val (wt, ts) = agg.getOrElse(k, (0L, Set.empty[String]))
        agg(k) = (wt + n, ts + w)
      }
    }
    val expected = agg.toSeq
      .map { case ((c1, c2), (wt, ts)) => (c1, c2, wt, ts.size.toLong) }
      .sortBy { case (c1, c2, wt, _) => (-wt, c1, c2) }
      .take(20)
    val got = graft.operators.TextAnalysis.q113BpeMergeCensus(spark, sf)
      .collect().map(r => (r.getAs[String]("c1"), r.getAs[String]("c2"),
        r.getAs[Long]("weight"), r.getAs[Long]("n_types")))
    assert(got.length == expected.length)
    assert(got.toSeq == expected)
  }
}

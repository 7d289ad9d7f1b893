package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusOps, Search}

/** Semantics pins for q107 (RM3 query expansion), q108 (repetition
  * plan), q109 (snapshot novelty). Cross-engine value checks live in
  * the DuckDB oracle gate; these pin what the oracle can't state:
  * q107's equivalence to re-running the shared scorer under the mined
  * terms, q108's arithmetic consistency with q89's weights, q109's
  * agreement with a local set-algebra recompute.
  */
class ExpansionRepetitionSpec extends SparkSpec {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q107 equals the shared scorer under the locally mined expansion") {
    val seed = Seq("data", "pipeline", "quality")
    // mine the expansion exactly as specified: top-5 docs of the seed
    // query, their non-seed term occurrence counts, top-5 by (count
    // desc, token asc)
    val feedback = Search.keywordSearch(spark, sf, seed).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSet
    val docs = spark.read.parquet(s"$sf/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val counts = feedback.toSeq.flatMap(id => docs(id).split("\\s+", -1))
      .filterNot(seed.contains)
      .groupBy(identity).map { case (t, o) => (t, o.length) }
    val expansion = counts.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(5).map(_._1)
    val expected = Search.keywordSearch(spark, sf, seed ++ expansion)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Double]("score"), r.getAs[Long]("n_terms_hit")))
    val got = Search.q107Rm3Expansion(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Double]("score"), r.getAs[Long]("n_terms_hit")))
    assert(got.nonEmpty)
    assert(got.toSeq == expected.toSeq)
    // the expansion must matter: some returned doc hits only expansion
    // terms, or the ranking differs from the seed-only query — otherwise
    // this is q66 with extra steps
    val seedOnly = Search.keywordSearch(spark, sf, seed)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(got.map(_._1).toSeq != seedOnly, "expansion changed nothing")
  }

  test("q108 is arithmetically consistent with q89's weights and its own cap") {
    val w89 = CorpusOps.q89TemperatureMixture(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        r.getAs[Double]("temp_weight")).toMap
    val rows = CorpusOps.q108RepetitionPlan(spark, sf).collect()
    assert(rows.length == w89.size)
    rows.foreach { r =>
      val k = (r.getAs[String]("lang"), r.getAs[String]("source"))
      assert(r.getAs[Double]("temp_weight") == w89(k), s"$k weight drift vs q89")
      val nTok = r.getAs[Long]("n_tokens")
      val raw = r.getAs[Double]("epochs_raw")
      val ep = r.getAs[Double]("epochs")
      val alloc = r.getAs[Double]("allocated_tokens")
      val deficit = r.getAs[Double]("deficit_tokens")
      val capped = r.getAs[Boolean]("capped")
      assert(capped == (raw > 4.0), s"$k capped flag")
      assert(math.abs(ep - math.min(4.0, raw)) < 1e-6, s"$k epoch cap")
      assert(math.abs(alloc - ep * nTok) < nTok * 1e-5, s"$k allocation")
      if (capped) assert(deficit > 0.0, s"$k capped stratum must report deficit")
      else assert(math.abs(deficit) < nTok * 1e-5, s"$k uncapped deficit not ~0")
    }
    // the fixture must exercise both sides of the ceiling, or the cap
    // logic is dead code at test scale
    assert(rows.exists(_.getAs[Boolean]("capped")), "no stratum capped")
    assert(rows.exists(!_.getAs[Boolean]("capped")), "every stratum capped")
    // budget conservation: allocated + deficit sums back to the budget
    val total = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble
    val spent = rows.map(r => r.getAs[Double]("allocated_tokens") +
      r.getAs[Double]("deficit_tokens")).sum
    assert(math.abs(spent - 4.0 * total) / (4.0 * total) < 1e-6,
      s"allocated+deficit=$spent vs budget ${4.0 * total}")
  }

  test("q109 agrees with a local set-algebra recompute of the fixture") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def sh8(t: String): Set[String] = {
      val w = if (t == null) Array.empty[String] else t.split("\\s+", -1)
      if (w.length < 8) Set.empty else w.sliding(8).map(_.mkString(" ")).toSet
    }
    val prior = docs.collect {
      case (id, t) if id % 7 != 0 =>
        id -> (if (t != null && id % 11 == 0) t.substring(0, math.min(10, t.length)) else t)
    }
    val cur = docs.filter { case (id, _) => id % 5 != 3 }
    val changed = cur.flatMap { case (id, t) =>
      prior.get(id) match {
        case None => Some(id -> "added")
        case Some(p) if p != t => Some(id -> "changed")
        case _ => None
      }
    }
    val priorShingles = prior.values.toSeq.flatMap(t => sh8(t).toSeq).toSet
    val rows = CorpusOps.q109SnapshotNovelty(spark, sf).collect()
    assert(rows.length == changed.size)
    assert(rows.exists(_.getAs[String]("status") == "added"))
    assert(rows.exists(_.getAs[String]("status") == "changed"))
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(changed(id) == r.getAs[String]("status"), s"doc $id status")
      val mine = sh8(cur(id))
      val novel = mine.count(!priorShingles.contains(_))
      assert(r.getAs[Long]("n_shingles") == mine.size.toLong, s"doc $id total")
      assert(r.getAs[Long]("n_novel") == novel.toLong, s"doc $id novel")
      if (mine.nonEmpty)
        assert(math.abs(r.getAs[Double]("novelty") -
          r6(novel.toDouble / mine.size)) < 1e-9, s"doc $id novelty")
      else assert(r.isNullAt(r.fieldIndex("novelty")), s"doc $id null novelty")
    }
  }
}

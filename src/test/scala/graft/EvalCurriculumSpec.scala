package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Similarity, TextAnalysis}

/** Semantics pins for the round-12 eval + scheduling operators:
  * q92 (ANN recall@k), q93 (k-NN label eval), q94 (curriculum order),
  * q95 (tokenizer fertility). Cross-engine value checks live in the
  * DuckDB oracle gate; these pin the invariants the oracle can't state
  * (permutation-ness, decomposition equivalence, consistency between
  * the eval and the searches it measures).
  */
class EvalCurriculumSpec extends SparkSpec {

  test("q92 recall agrees with a direct q22-vs-q23 set comparison") {
    val exact = Similarity.q22CosineTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")))
    val ann = Similarity.q23AnnLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val expected = exact.groupBy(_._1).map { case (p, rows) =>
      p -> (rows.length, rows.count(ann.contains))
    }
    val got = Similarity.q92AnnRecall(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val p = r.getAs[Long]("probe_id")
      val (nExact, nHit) = expected(p)
      assert(r.getAs[Long]("n_exact") == nExact, s"probe $p n_exact")
      assert(r.getAs[Long]("n_hit") == nHit, s"probe $p n_hit")
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(math.abs(rec - nHit.toDouble / nExact) < 1e-6)
    }
  }

  test("q93 prediction is the majority label of the exact top-k") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val top = Similarity.q22CosineTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id")))
    val rows = Similarity.q93KnnLabelEval(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Long]("probe_id")
      val votes = top.filter(_._1 == p).map(t => e(t._2))
        .groupBy(identity).map { case (l, v) => (l, v.length) }
      val best = votes.toSeq.sortBy { case (l, v) => (-v, l) }.head
      assert(r.getAs[Int]("pred_label") == best._1, s"probe $p argmax")
      assert(r.getAs[Long]("votes") == best._2.toLong, s"probe $p votes")
      assert(r.getAs[Int]("true_label") == e(p))
      assert(r.getAs[Boolean]("correct") == (best._1 == e(p)))
    }
  }

  test("q94 positions are a permutation and band-monotone") {
    val rows = Curation.q94CurriculumOrder(spark, sf).collect()
    val n = rows.length
    assert(n > 0)
    val pos = rows.map(_.getAs[Long]("curriculum_pos")).sorted
    assert(pos.sameElements(Array.tabulate(n)(_.toLong)),
      "not a 0..n-1 permutation")
    val byPos = rows.sortBy(_.getAs[Long]("curriculum_pos"))
    val bands = byPos.map(_.getAs[Int]("band"))
    assert(bands.zip(bands.tail).forall { case (a, b) => a <= b },
      "band order violated along the curriculum")
    // within a band the order is (sk, doc_id) — the deterministic shuffle
    byPos.groupBy(_.getAs[Int]("band")).foreach { case (_, rs) =>
      val keys = rs.sortBy(_.getAs[Long]("curriculum_pos"))
        .map(r => (r.getAs[Long]("sk"), r.getAs[Long]("doc_id")))
      assert(keys.zip(keys.tail).forall { case (a, b) =>
        a._1 < b._1 || (a._1 == b._1 && a._2 < b._2) })
    }
  }

  test("q94 two-level decomposition equals the single-window definition") {
    val decomposed = Curation.q94CurriculumOrder(spark, sf)
      .select("doc_id", "curriculum_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val single = TextAnalysis.q86UnigramSurprisal(spark, sf)
      .select(col("doc_id"),
        coalesce(floor(col("mean_rarity")), lit(0L)).cast("int").as("band"),
        pmod(org.apache.spark.sql.GraftSqlBridge.column(
          graft.functions.PolyHash(
            org.apache.spark.sql.GraftSqlBridge.expression(
              concat(col("doc_id").cast("string"), lit("#curriculum"))))),
          lit(1000000L)).as("sk"))
      .withColumn("p", row_number().over(
        Window.orderBy(col("band"), col("sk"), col("doc_id"))) - 1)
      .select("doc_id", "p").collect()
      .map(r => r.getLong(0) -> (r.getInt(1).toLong)).toMap
    assert(decomposed == single)
  }

  test("q137 ranks are per-source permutations, buckets cut at 33/66") {
    val rows = Curation.q137PerplexityBuckets(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val n = rs.length
      // ranks are exactly 1..n within the source
      assert(rs.map(_.getAs[Long]("src_rank")).sorted.toSeq ==
        (1 to n).map(_.toLong), s"ranks not a permutation in $src")
      // the rank order is (mean_rarity asc, doc_id asc)
      val byRank = rs.sortBy(_.getAs[Long]("src_rank"))
        .map(r => (r.getAs[Double]("mean_rarity"), r.getAs[Long]("doc_id")))
      assert(byRank.zip(byRank.tail).forall { case (a, b) =>
        a._1 < b._1 || (a._1 == b._1 && a._2 < b._2) },
        s"rank order violated in $src")
      // bucket sizes are the exact integer cuts
      val counts = rs.groupBy(_.getAs[String]("bucket"))
        .view.mapValues(_.length).toMap.withDefaultValue(0)
      assert(counts("head") == n / 3, s"head size in $src")
      assert(counts("middle") == 2 * n / 3 - n / 3, s"middle size in $src")
      assert(counts("tail") == n - 2 * n / 3, s"tail size in $src")
      // head really holds the LOWEST-surprisal documents
      val maxHead = rs.filter(_.getAs[String]("bucket") == "head")
        .map(_.getAs[Double]("mean_rarity"))
      val minTail = rs.filter(_.getAs[String]("bucket") == "tail")
        .map(_.getAs[Double]("mean_rarity"))
      if (maxHead.nonEmpty && minTail.nonEmpty)
        assert(maxHead.max <= minTail.min, s"head above tail in $src")
    }
  }

  test("q138 ledger agrees with every underlying gate and q41's verdict") {
    val ledger = Curation.q138CurationLedger(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(ledger.nonEmpty)
    val q41 = Curation.q41CorpusSelect(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val gopher = operators.Extraction.q133RepetitionGate(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    val quality = TextAnalysis.q83QualityClassifier(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("quality_label") == "keep")).toMap
    val order = Seq("gopher_keep" -> "repetition_gate", "lang_ok" -> "language",
      "len_ok" -> "length", "rep_ok" -> "intra_doc_repetition",
      "quality_ok" -> "quality", "dedup_ok" -> "duplicate")
    ledger.foreach { case (id, r) =>
      assert(r.getAs[Boolean]("gopher_keep") == gopher(id))
      assert(r.getAs[Boolean]("quality_ok") == quality(id))
      assert(r.getAs[Boolean]("dedup_ok") ==
        q41(id).getAs[Boolean]("is_keeper"))
      // q41's selected is the ledger's verdict minus the two newer gates
      assert(q41(id).getAs[Boolean]("selected") ==
        (r.getAs[Boolean]("dedup_ok") && r.getAs[Boolean]("lang_ok") &&
          r.getAs[Boolean]("len_ok") && r.getAs[Boolean]("rep_ok")), s"doc $id")
      val gates = order.map { case (c, reason) =>
        reason -> r.getAs[Boolean](c) }
      assert(r.getAs[Boolean]("keep") == gates.forall(_._2))
      val expected = gates.find(!_._2).map(_._1).getOrElse("kept")
      assert(r.getAs[String]("reason") == expected, s"doc $id reason")
    }
  }

  test("q95 per-source sums match a direct recompute") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val direct = d.select(col("source"), col("n_chars"),
        size(split(col("text"), "\\s+")).as("ws"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"), lit(0))).as("bpe"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("c"),
        sum("ws").as("w"), sum("bpe").as("b"))
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n"), r.getAs[Long]("c"),
          r.getAs[Long]("w"), r.getAs[Long]("b"))).toMap
    val rows = TextAnalysis.q95TokenizerFertility(spark, sf).collect()
    assert(rows.length == direct.size)
    rows.foreach { r =>
      val (n, c, w, b) = direct(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("n_chars") == c)
      assert(r.getAs[Long]("ws_tokens") == w)
      assert(r.getAs[Long]("bpe_tokens") == b)
      assert(math.abs(r.getAs[Double]("fertility") - b.toDouble / w) < 1e-6)
      assert(math.abs(
        r.getAs[Double]("chars_per_token") - c.toDouble / b) < 1e-6)
    }
  }
}

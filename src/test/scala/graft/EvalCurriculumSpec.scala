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
        org.apache.spark.sql.GraftSqlBridge.column(
          graft.functions.PolyHash(
            org.apache.spark.sql.GraftSqlBridge.expression(
              col("doc_id").cast("string")))).as("sk"))
      .withColumn("p", row_number().over(
        Window.orderBy(col("band"), col("sk"), col("doc_id"))) - 1)
      .select("doc_id", "p").collect()
      .map(r => r.getLong(0) -> (r.getInt(1).toLong)).toMap
    assert(decomposed == single)
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

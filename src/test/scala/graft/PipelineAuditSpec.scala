package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusAudit, CorpusOps, Curation, TextAnalysis}

/** Semantics pins for the pipeline-audit operators added in round 12:
  * q96 (quality-gate disagreement), q97 (epoch-annealed mixture
  * schedule), q98 (packing efficiency). Cross-engine value checks live
  * in the DuckDB oracle gate; these pin the reconciliation invariants —
  * cells partition the corpus, the ramp's endpoints are the two
  * mixtures it interpolates, the efficiency numbers reconcile with the
  * packing they audit.
  */
class PipelineAuditSpec extends SparkSpec {

  test("q96 cells partition the corpus and shares sum to one") {
    val cells = CorpusAudit.q96FilterDisagreement(spark, sf).collect()
    assert(cells.nonEmpty)
    val corpus = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(cells.map(_.getAs[Long]("n_docs")).sum == corpus,
      "confusion cells do not partition the corpus")
    val shareSum = cells.map(_.getAs[Double]("doc_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"doc_share sum $shareSum")
    // one cell cross-checked directly against the two gate frames
    val funnel = Curation.q41CorpusSelect(spark, sf)
      .select(col("doc_id"), col("selected"))
    val keepKeep = funnel.join(
        TextAnalysis.q83QualityClassifier(spark, sf)
          .select(col("doc_id"), col("quality_label")), "doc_id")
      .filter(col("selected") && col("quality_label") === "keep").count()
    val cell = cells.find(r =>
      r.getAs[Boolean]("selected") && r.getAs[String]("quality_label") == "keep")
    assert(cell.map(_.getAs[Long]("n_docs")).getOrElse(0L) == keepKeep)
  }

  test("q97 ramp endpoints are exactly the two mixtures it interpolates") {
    val sched = CorpusOps.q97AnnealSchedule(spark, sf).collect()
      .map(r => ((r.getAs[String]("lang"), r.getAs[String]("source"),
        r.getAs[Int]("epoch")), r.getAs[Double]("anneal_weight"))).toMap
    val epochs = sched.keys.map(_._3).toSet
    assert(epochs == Set(0, 1, 2, 3))
    val uni = CorpusOps.q53MixtureWeights(spark, sf).collect()
      .map(r => ((r.getAs[String]("lang"), r.getAs[String]("source")),
        r.getAs[Double]("weight"))).toMap
    val temp = CorpusOps.q89TemperatureMixture(spark, sf).collect()
      .map(r => ((r.getAs[String]("lang"), r.getAs[String]("source")),
        r.getAs[Double]("temp_weight"))).toMap
    uni.keys.foreach { k =>
      assert(math.abs(sched((k._1, k._2, 0)) - uni(k)) < 1e-9,
        s"epoch-0 weight drifts from q53 for $k")
      assert(math.abs(sched((k._1, k._2, 3)) - temp(k)) < 1e-9,
        s"final-epoch weight drifts from q89 for $k")
      // interior epochs stay between the endpoints
      for (e <- Seq(1, 2)) {
        val w = sched((k._1, k._2, e))
        val (lo, hi) = (math.min(uni(k), temp(k)), math.max(uni(k), temp(k)))
        assert(w >= lo - 1e-9 && w <= hi + 1e-9, s"epoch-$e weight $w for $k")
      }
    }
  }

  test("q155 equals a local replay of the epoch-salted sampler") {
    val sched = CorpusOps.q97AnnealSchedule(spark, sf).collect()
      .map(r => ((r.getAs[String]("lang"), r.getAs[String]("source"),
        r.getAs[Int]("epoch")), r.getAs[Double]("anneal_weight"))).toMap
    val docs = Tables.documents(spark, sf).collect().map { r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("source"),
        Option(r.getAs[String]("text")).map(_.split("\\s+", -1).length))
    }
    def h(id: Long, e: Int): Long = graft.functions.PolyHash.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s"$id#mix$e"),
      31) % 1000000L
    // independent replay: per (epoch, stratum), kept docs + token mass
    val keptDocs = (for {
      (id, lang, src, nt) <- docs
      e <- 0 to 3
      w <- sched.get((lang, src, e))
      if h(id, e) < w * 1000000L
    } yield ((e, lang, src), (id, nt)))
    val expect = keptDocs.groupBy(_._1).map { case (k, rs) =>
      k -> (rs.length.toLong, rs.flatMap(_._2._2).map(_.toLong).sum)
    }
    val out = CorpusOps.q155EpochSamplePlan(spark, sf).collect()
    val got = out.map(r => ((r.getAs[Int]("epoch"), r.getAs[String]("lang"),
      r.getAs[String]("source")),
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))).toMap
    assert(got == expect)
    // token_share sums to 1 within each epoch
    out.groupBy(_.getAs[Int]("epoch")).foreach { case (e, rs) =>
      val s = rs.map(_.getAs[Double]("token_share")).sum
      assert(math.abs(s - 1.0) < 1e-4, s"epoch $e share sum $s")
    }
    // independent draws: some down-weighted stratum keeps DIFFERENT doc
    // sets across epochs (the epoch salt's whole point) — assert when
    // the schedule actually down-weights something
    val partialStrata = sched.filter(_._2 < 0.999).keys
      .map(k => (k._1, k._2)).toSet
    if (partialStrata.nonEmpty) {
      val byEpoch = keptDocs.filter { case ((_, l, s), _) =>
        partialStrata((l, s)) }
        .groupBy(_._1._1).view
        .mapValues(_.map(_._2._1).toSet).toMap
      assert(byEpoch.values.toSet.size > 1,
        "every epoch drew the identical sample — epoch salt inert")
    }
    Checkpoints.releaseAll()
  }

  test("q99 rollup reconciles with q76's change set") {
    val drift = CorpusOps.q99SnapshotDrift(spark, sf).collect()
    assert(drift.nonEmpty)
    // per-status doc counts must sum to q76's statuses exactly
    val byStatus = drift.groupBy(_.getAs[String]("status"))
      .map { case (s, rs) => s -> rs.map(_.getAs[Long]("n_docs")).sum }
    val q76 = CorpusOps.q76SnapshotDiff(spark, sf).collect()
      .groupBy(_.getAs[String]("status"))
      .map { case (s, rs) => s -> rs.length.toLong }
    assert(byStatus == q76, s"$byStatus vs $q76")
    // removed docs can only shed mass; added docs can only add it
    drift.foreach { r =>
      val delta = r.getAs[Long]("token_delta")
      r.getAs[String]("status") match {
        case "removed" => assert(delta <= 0, s"removed with +$delta")
        case "added" => assert(delta >= 0, s"added with $delta")
        case _ =>
      }
    }
  }

  test("q100 bands partition q20's pair table") {
    val pairs = graft.operators.Dedup.q20NgramJaccard(spark, sf).collect()
    val bands = graft.operators.Dedup.q100JaccardBands(spark, sf).collect()
    assert(bands.nonEmpty)
    assert(bands.map(_.getAs[Long]("n_pairs")).sum == pairs.length,
      "band pair counts do not sum to the pair table")
    bands.foreach { r =>
      val b = r.getAs[Int]("band")
      assert(b >= 10 && b <= 20, s"band $b outside [0.5, 1.0]")
      val direct = pairs.count { p =>
        math.floor(p.getAs[Double]("jaccard") * 20).toInt == b
      }
      assert(r.getAs[Long]("n_pairs") == direct.toLong, s"band $b count")
      val docs = pairs.filter(p =>
          math.floor(p.getAs[Double]("jaccard") * 20).toInt == b)
        .flatMap(p => Seq(p.getAs[Long]("doc_a"), p.getAs[Long]("doc_b")))
        .distinct.length
      assert(r.getAs[Long]("n_docs") == docs.toLong, s"band $b docs")
    }
  }

  test("q101 hits are real chunks whose text contains the query terms") {
    val terms = Set("data", "pipeline", "quality")
    val hits = graft.operators.Search.q101ChunkSearch(spark, sf).collect()
    assert(hits.nonEmpty)
    val chunks = graft.operators.Segments.q64ChunkDocs(spark, sf)
      .select("doc_id", "chunk_id", "chunk_text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_id")) ->
        r.getAs[String]("chunk_text")).toMap
    hits.foreach { r =>
      val key = (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_id"))
      val text = chunks.getOrElse(key, fail(s"hit $key is not a q64 chunk"))
      val present = text.split("\\s+").count(terms.contains)
      assert(present >= 1, s"chunk $key has no query term")
      val nHit = r.getAs[Long]("n_terms_hit")
      assert(nHit >= 1 && nHit <= 3, s"chunk $key n_terms_hit $nHit")
      assert(r.getAs[Double]("score") > 0.0)
    }
    // scores arrive in rank order
    val scores = hits.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("q102 fusion reconciles with its two legs") {
    val hits = graft.operators.Search.q102HybridSearch(spark, sf).collect()
    assert(hits.nonEmpty)
    val dense = graft.operators.Similarity.q22CosineTopK(spark, sf)
      .filter(col("probe_id") === 0L).collect()
      .map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Int]("rank")).toMap
    hits.foreach { r =>
      val lexR = Option(r.getAs[Integer]("lex_rank")).map(_.toInt)
      val denR = Option(r.getAs[Integer]("dense_rank")).map(_.toInt)
      assert(lexR.isDefined || denR.isDefined,
        s"doc ${r.getAs[Long]("doc_id")} in neither leg")
      // dense ranks must be exactly q22's probe-0 ranks
      denR.foreach(dr =>
        assert(dense(r.getAs[Long]("doc_id")) == dr, "dense rank drift"))
      val expected = lexR.map(x => 1.0 / (60.0 + x)).getOrElse(0.0) +
        denR.map(x => 1.0 / (60.0 + x)).getOrElse(0.0)
      assert(math.abs(r.getAs[Double]("rrf_score") - expected) < 1e-6)
    }
    // output arrives in fused-score rank order
    val scores = hits.map(_.getAs[Double]("rrf_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // the term-mining guard held: the lexical leg actually fired (terms
    // present outside the probe exist in this corpus)
    assert(hits.exists(r => r.getAs[Integer]("lex_rank") != null),
      "lexical leg empty — hapax guard regressed")
  }

  test("q98 reconciles with the q48 packing it audits") {
    val packed = CorpusOps.q48SequencePack(spark, sf).collect()
    val eff = CorpusOps.q98PackEfficiency(spark, sf).collect()
    val byShard = packed.groupBy(_.getAs[Int]("shard"))
    assert(eff.length == byShard.size)
    val budget = 512L
    eff.foreach { r =>
      val shard = r.getAs[Int]("shard")
      val rows = byShard(shard)
      val tokens = rows.map(_.getAs[Long]("n_tokens")).sum
      assert(r.getAs[Long]("n_docs") == rows.length)
      assert(r.getAs[Long]("n_tokens") == tokens)
      val nSeqs = (tokens + budget - 1) / budget
      assert(r.getAs[Long]("n_seqs") == nSeqs)
      assert(r.getAs[Long]("pad_tokens") == nSeqs * budget - tokens)
      assert(r.getAs[Long]("pad_tokens") >= 0 &&
        r.getAs[Long]("pad_tokens") < budget)
      val split = rows.count(p => p.getAs[Long]("tok_offset") +
        p.getAs[Long]("n_tokens") > (p.getAs[Long]("seq_id") + 1) * budget)
      assert(r.getAs[Long]("split_docs") == split.toLong)
      val fill = r.getAs[Double]("fill_ratio")
      assert(fill > 0.0 && fill <= 1.0, s"fill $fill")
    }
  }

  test("q144 budget sweep reconciles with q48 at every budget") {
    val packed = CorpusOps.q48SequencePack(spark, sf).collect()
    val byShard = packed.groupBy(_.getAs[Int]("shard"))
    val out = CorpusOps.q144PackBudgetSweep(spark, sf).collect()
    assert(out.map(_.getAs[Int]("budget")).toSeq == CorpusOps.BudgetSweep)
    out.foreach { r =>
      val b = r.getAs[Int]("budget").toLong
      val nSeqs = byShard.values.map(rows =>
        (rows.map(_.getAs[Long]("n_tokens")).sum + b - 1) / b).sum
      val tokens = packed.map(_.getAs[Long]("n_tokens")).sum
      val split = packed.count(p => p.getAs[Long]("tok_offset") +
        p.getAs[Long]("n_tokens") >
        (p.getAs[Long]("tok_offset") / b + 1) * b)
      assert(r.getAs[Long]("n_docs") == packed.length.toLong, s"b=$b docs")
      assert(r.getAs[Long]("n_tokens") == tokens, s"b=$b tokens")
      assert(r.getAs[Long]("n_seqs") == nSeqs, s"b=$b seqs")
      assert(r.getAs[Long]("pad_tokens") == nSeqs * b - tokens, s"b=$b pad")
      assert(r.getAs[Long]("split_docs") == split.toLong, s"b=$b split")
    }
    Checkpoints.releaseAll()
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Ivf, SemanticOps}

/** q130 semantic dedup + q131 source semantic divergence. q130's verdicts
  * are cross-checked against q21's brute-force pair truth (the same
  * threshold and rounding), so the spec never re-derives float cosines;
  * q131's integer centroid arithmetic IS re-derived locally (it is exact
  * by construction, so the comparison is equality up to the final round6
  * boundary, checked with a 1e-6 envelope).
  */
class SemanticOpsSpec extends SparkSpec {

  test("q130: one row per vector, verdicts consistent with q21 truth") {
    val out = SemanticOps.q130SemDedup(spark, sf).collect()
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(out.length == nVecs)
    assert(out.map(_.getAs[Long]("vec_id")).distinct.length == out.length)

    val cellOf = out.map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    // q21 = all pairs at cos >= 0.4 (q130's Tau) with the same round6
    val truth = Dedup.q21EmbeddingNearDup(spark, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("cos")).toMap
    val sameCellTruth = truth.keys.filter { case (a, b) =>
      cellOf(a) == cellOf(b)
    }.toSet

    out.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      if (r.getAs[Boolean]("is_dup")) {
        val of = r.getAs[Long]("dup_of")
        assert(of < id, s"dup_of must be a lower id ($of !< $id)")
        assert(cellOf(of) == cellOf(id), s"dup_of in another cell for $id")
        // the reported (dup_of, id, cos) must BE a q21 truth pair
        assert(truth((of, id)) == r.getAs[Double]("cos"),
          s"cos drift vs q21 at ($of, $id)")
        // ... and the best one: no same-cell truth partner scores higher
        val better = sameCellTruth.filter(p => p._2 == id &&
          truth(p) > r.getAs[Double]("cos"))
        assert(better.isEmpty, s"$id missed a higher-cos partner: $better")
      } else {
        assert(r.isNullAt(r.fieldIndex("dup_of")))
        assert(r.isNullAt(r.fieldIndex("cos")))
        // no same-cell lower-id truth partner exists (under-cap cells:
        // sf0.001's 50 vectors over 16 cells are all far under CellCap)
        assert(!sameCellTruth.exists(p => p._2 == id),
          s"$id should have been marked dup")
      }
    }
  }

  test("q130 star degradation: over-cap cells compare against rep only") {
    import spark.implicits._
    // one cell, four vectors: v3 is identical to v2 (cos 1) but orthogonal
    // to v0; under the cap the cell degrades to a star around v0, so the
    // (2,3) pair is never scored and v3 survives
    val e = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0f, 1f)), (3L, Seq(0f, 1f))
    ).toDF("vec_id", "embedding")
    val cells = Seq((0L, 0), (1L, 0), (2L, 0), (3L, 0)).toDF("vec_id", "cell")
    val full = SemanticOps.semDedupFrom(e, cells).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("is_dup")).toMap
    assert(full(3), "full pairs: v3 duplicates v2")
    assert(full(1), "full pairs: v1 duplicates v0")
    val star = SemanticOps.semDedupFrom(e, cells, cap = 2L).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Boolean]("is_dup"),
          if (r.isNullAt(r.fieldIndex("dup_of"))) -1L
          else r.getAs[Long]("dup_of"))).toMap
    assert(star(1) == ((true, 0L)), "star keeps the rep edge")
    assert(star(3) == ((false, -1L)),
      "star never scores the (2,3) member-member pair")
  }

  test("q142: verdicts equal q21 truth over same-cell train×member pairs") {
    val out = SemanticOps.q142SemDecontam(spark, sf).collect()
    val cellOf = Artifacts.ivfModel(spark, sf)._2.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    // q21 = all pairs at cos >= 0.4 (the shared Tau) with the same round6
    val truth = Dedup.q21EmbeddingNearDup(spark, sf).collect().flatMap { r =>
      val (a, b) = (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
      val c = r.getAs[Double]("cos")
      Seq((a, b) -> c, (b, a) -> c)
    }.toMap
    val reg = graft.operators.EvalSets.Registry
    def setsOf(id: Long) =
      reg.filter(s => id % s.mod == s.residue).map(s => (s.setId, s.version))
    val expected = (for {
      t <- cellOf.keys if setsOf(t).isEmpty
      (sid, ver) <- reg.map(s => (s.setId, s.version)).distinct
      hits = cellOf.keys.filter(e => setsOf(e).exists(_._1 == sid) &&
        cellOf(e) == cellOf(t) && truth.contains((t, e))).toSeq
      if hits.nonEmpty
    } yield {
      val best = hits.map(e => (-truth((t, e)), e)).min
      (t, sid) -> (ver, hits.size.toLong, -best._1, best._2)
    }).toMap
    // residue sets: exact equality against the q21 truth replay;
    // external sets (negative closest_eval ids) are checked separately
    val extIds = graft.operators.EvalSets.ExternalRegistry.map(_.setId).toSet
    val (extOut, resOut) =
      out.partition(r => extIds(r.getAs[String]("set_id")))
    assert(resOut.length == expected.size)
    resOut.foreach { r =>
      val key = (r.getAs[Long]("vec_id"), r.getAs[String]("set_id"))
      val (ver, n, cos, closest) = expected(key)
      assert(r.getAs[Int]("set_version") == ver, s"$key version")
      assert(r.getAs[Long]("n_hits") == n, s"$key n_hits")
      assert(r.getAs[Double]("max_cos") == cos, s"$key max_cos")
      assert(r.getAs[Long]("closest_eval") == closest, s"$key closest")
    }
    // external rows: every closest_eval is a benchmark item (reserved
    // negative id space), every hit clears Tau, and each leaked doc
    // (its vector copied verbatim into the benchmark) scores an exact
    // cosine-1.0 hit against its own copy
    assert(extOut.nonEmpty, "external suite must flag semantically")
    extOut.foreach { r =>
      assert(r.getAs[Long]("closest_eval") < 0, "external eval ids")
      assert(r.getAs[Double]("max_cos") >= SemanticOps.Tau)
    }
    val extByDoc = extOut
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("max_cos")).toMap
    val leaked = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.lit(100)) === 3)
      .collect().map(_.getAs[Long]("doc_id"))
      .filter(d => setsOf(d).isEmpty && cellOf.contains(d))
    leaked.foreach { d =>
      assert(extByDoc.get(d).contains(1.0), s"leaked doc $d max_cos")
    }
    Checkpoints.releaseAll()
  }

  test("q142 star degradation: over-cap (cell, set) scores the rep only") {
    import spark.implicits._
    // ids 7 and 27 are heldout_a members (id % 10 == 7); 8 is heldout_b;
    // 0 is in no set. All share one cell. Train vector 0 matches both
    // heldout_a members at cos 1 — under cap=1 only the rep (7) scores.
    val e = Seq(
      (0L, Seq(1f, 0f)), (7L, Seq(1f, 0f)), (27L, Seq(1f, 0f)),
      (8L, Seq(0f, 1f))
    ).toDF("vec_id", "embedding")
    val cells = Seq((0L, 0), (7L, 0), (27L, 0), (8L, 0))
      .toDF("vec_id", "cell")
    val full = SemanticOps.semDecontamFrom(e, cells).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[String]("set_id")) ->
        (r.getAs[Long]("n_hits"), r.getAs[Long]("closest_eval"))).toMap
    assert(full((0L, "heldout_a")) == ((2L, 7L)), "full: both members hit")
    assert(!full.contains((0L, "heldout_b")), "orthogonal set never hits")
    val star = SemanticOps.semDecontamFrom(e, cells, cap = 1L).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[String]("set_id")) ->
        (r.getAs[Long]("n_hits"), r.getAs[Long]("closest_eval"))).toMap
    assert(star((0L, "heldout_a")) == ((1L, 7L)),
      "star: only the set's rep is scored in an over-cap cell")
    Checkpoints.releaseAll()
  }

  test("q136 cluster cards: crafted postings produce exact lift ranks") {
    import spark.implicits._
    // cell 0 = docs {1,2} talking about "cats"; cell 1 = doc 3 about
    // "dogs"; "the" is common everywhere so its lift is ~1 in any cell
    val postings = Seq(
      (1L, "cats", 3L), (1L, "the", 2L),
      (2L, "cats", 1L), (2L, "the", 2L),
      (3L, "dogs", 4L), (3L, "the", 4L)
    ).toDF("doc_id", "token", "tf")
    val cells = Seq((1L, 0), (2L, 0), (3L, 1)).toDF("doc_id", "cell")
    val corpus = Seq(("cats", 4L), ("dogs", 4L), ("the", 8L))
      .toDF("token", "n")
    val out = SemanticOps.clusterCardsFrom(postings, cells, corpus)
      .collect()
      .map(r => (r.getAs[Int]("cell"), r.getAs[Int]("rank")) ->
        (r.getAs[String]("token"), r.getAs[Long]("tf_ct"),
          r.getAs[Double]("lift"))).toMap
    // cell 0: W=16, w_c=8; cats lift = (4*16)/(8*4) = 2.0;
    // the = (4*16)/(8*8) = 1.0
    assert(out((0, 1)) == (("cats", 4L, 2.0)))
    assert(out((0, 2)) == (("the", 4L, 1.0)))
    // cell 1: w_c=8; dogs = (4*16)/(8*4) = 2.0; the = (4*16)/(8*8) = 1.0
    assert(out((1, 1)) == (("dogs", 4L, 2.0)))
    assert(out((1, 2)) == (("the", 4L, 1.0)))
    assert(out.size == 4)
  }

  test("q136 on the corpus: dense ranks per cell, lift recomputes") {
    val rows = SemanticOps.q136ClusterCards(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCell = rows.groupBy(_.getAs[Int]("cell"))
    byCell.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
      // ranks really descend by lift (ties broken by token asc)
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
        .map(r => (-r.getAs[Double]("lift"), r.getAs[String]("token")))
      assert(sorted.sameElements(sorted.sorted))
    }
    // every reported cell is a trained cell
    val cells = Artifacts.ivfModel(spark, sf)._2
      .select("cell").distinct().collect().map(_.getAs[Int]("cell")).toSet
    assert(byCell.keySet.subsetOf(cells))
  }

  test("q131: one row per source pair, exact integer-centroid recompute") {
    val out = SemanticOps.q131SourceSemanticDiv(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "source")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source"))
      .toMap
    val sources = docs.values.toSeq.distinct.sorted
    assert(out.length == sources.size * (sources.size - 1) / 2)
    assert(out.map(r => (r.getAs[String]("source_a"),
      r.getAs[String]("source_b"))).forall { case (a, b) => a < b })

    // local replay: quantize (double*scale through DECIMAL(20,4), then
    // half-up to integer), integer mean, integer dot/norms, cosine
    def quant(v: Float): Long =
      BigDecimal(v.toDouble * Ivf.QuantScale)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val bySource = Tables.embeddings(spark, sf).collect()
      .map(r => (docs(r.getAs[Long]("vec_id")),
        r.getAs[scala.collection.Seq[Float]]("embedding").map(quant).toArray))
      .groupBy(_._1).map { case (s, rows) => s -> rows.map(_._2) }
    val cent = bySource.map { case (s, vs) =>
      s -> Array.tabulate(vs.head.length) { i =>
        Ivf.roundDiv(vs.map(_(i)).sum, vs.length.toLong)
      }
    }
    out.foreach { r =>
      val ca = cent(r.getAs[String]("source_a"))
      val cb = cent(r.getAs[String]("source_b"))
      val dot = ca.zip(cb).map { case (x, y) => x * y }.sum.toDouble
      val na = math.sqrt(ca.map(x => x * x).sum.toDouble)
      val nb = math.sqrt(cb.map(x => x * x).sum.toDouble)
      val expected = if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
      assert(math.abs(r.getAs[Double]("cos") - expected) <= 1e-6,
        s"${r.getAs[String]("source_a")}/${r.getAs[String]("source_b")}")
    }
  }
}

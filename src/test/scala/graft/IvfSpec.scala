package graft

import org.apache.spark.sql.functions._
import graft.operators.Ivf

class IvfSpec extends SparkSpec {

  test("roundDiv is exact half-away-from-zero integer division") {
    assert(Ivf.roundDiv(7, 2) == 4)   // 3.5 → 4
    assert(Ivf.roundDiv(-7, 2) == -4) // -3.5 → -4
    assert(Ivf.roundDiv(6, 4) == 2)   // 1.5 → 2
    assert(Ivf.roundDiv(5, 4) == 1)   // 1.25 → 1
    assert(Ivf.roundDiv(0, 5) == 0)
    assert(Ivf.roundDiv(-5, 4) == -1)
    // matches BigDecimal HALF_UP on a sweep
    for (s <- -50L to 50L; n <- 1L to 7L) {
      val expected = BigDecimal(s)./%(BigDecimal(n))._1 // just guard compile
      val bd = (BigDecimal(s) / BigDecimal(n))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      assert(Ivf.roundDiv(s, n) == bd, s"$s/$n")
    }
  }

  test("training is deterministic and assignments partition the corpus") {
    val quant = Checkpoints.checkpoint(
      Ivf.quantized(Tables.embeddings(spark, sf)))
    val c1 = Ivf.train(quant)
    val c2 = Ivf.train(quant)
    assert(c1.map { case (k, a) => (k, a.toSeq) } ==
      c2.map { case (k, a) => (k, a.toSeq) })
    assert(c1.size == Ivf.K)
    assert(c1.forall(_._2.length == 64))

    val cells = Ivf.assignFrame(quant, c1).collect()
    assert(cells.length == Tables.embeddings(spark, sf).count())
    assert(cells.map(_.getAs[Long]("vec_id")).distinct.length == cells.length)
    assert(cells.forall { r =>
      val c = r.getAs[Int]("cell"); c >= 0 && c < Ivf.K
    })
    // training moved the centroids off their init vectors (Lloyd ran);
    // init = the K smallest SAMPLED ids' vectors
    val init = quant
      .filter(Ivf.inTrainSample(col("vec_id"),
        Ivf.sampleModulus(quant.count())))
      .orderBy("vec_id").limit(Ivf.K).collect()
      .map(_.getAs[scala.collection.Seq[Long]]("q").toSeq)
    assert(c1.exists { case (k, a) => a.toSeq != init(k) })
    Checkpoints.releaseAll()
  }

  test("assignment argmin matches a brute-force distance check") {
    val quant = Checkpoints.checkpoint(
      Ivf.quantized(Tables.embeddings(spark, sf)))
    val cents = Ivf.train(quant)
    val byVec = quant.collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Long]]("q").toArray).toMap
    val got = Ivf.assignFrame(quant, cents).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    byVec.foreach { case (id, q) =>
      val best = cents.map { case (k, c) =>
        (q.zip(c).map { case (a, b) => val d = a - b; d * d }.sum, k)
      }.min
      assert(got(id) == best._2, s"vec $id")
    }
    Checkpoints.releaseAll()
  }

  test("q143 sweep: monotone in nprobe, anchored to q125 at the shipped budget") {
    val out = Ivf.q143NprobeSweep(spark, sf).collect()
      .sortBy(_.getAs[Int]("nprobe"))
    assert(out.map(_.getAs[Int]("nprobe")).toSeq == Ivf.ProbeSweep)
    // a larger candidate set can never lose an exact member it already
    // ranked (rerank is by the SAME cosine order as the baseline), so
    // both curves are non-decreasing
    val rec = out.map(_.getAs[Double]("avg_recall")).toSeq
    val scan = out.map(_.getAs[Double]("avg_scan_frac")).toSeq
    assert(rec == rec.sorted, s"recall not monotone: $rec")
    assert(scan == scan.sorted, s"scan fraction not monotone: $scan")
    scan.foreach(f => assert(f >= 0.0 && f <= 1.0))
    // at the shipped budget the sweep row IS q125's micro-average
    val q125 = Ivf.q125IvfRecall(spark, sf).collect()
    val micro = q125.map(_.getAs[Long]("n_hit")).sum.toDouble /
      q125.map(_.getAs[Long]("n_exact")).sum
    val at = out.find(_.getAs[Int]("nprobe") == Ivf.Nprobe).get
      .getAs[Double]("avg_recall")
    assert(at == BigDecimal(micro).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble,
      s"sweep@${Ivf.Nprobe} = $at, q125 micro-average = $micro")
    Checkpoints.releaseAll()
  }

  test("sampled training: sample active at the fixture, recall within band of full") {
    val quant = Checkpoints.checkpoint(
      Ivf.quantized(Tables.embeddings(spark, sf)))
    val n = quant.count()
    assert(Ivf.sampleModulus(n) > 1,
      s"fixture corpus ($n) must exercise the hash sample")
    val sampled = Ivf.train(quant)
    val full = Ivf.train(quant, sampled = false)
    // the sample genuinely changed what Lloyd saw
    assert(sampled.map { case (k, a) => (k, a.toSeq) } !=
      full.map { case (k, a) => (k, a.toSeq) })
    def micro(c: Seq[(Int, Array[Long])]): Double = {
      val r = Ivf.ivfRecallFrom(spark, sf, c,
        Ivf.assignFrame(quant, c)).collect()
      r.map(_.getAs[Long]("n_hit")).sum.toDouble /
        r.map(_.getAs[Long]("n_exact")).sum
    }
    val ms = micro(sampled)
    val mf = micro(full)
    // the published sampled-training claim: codebooks fit on a bounded
    // sample lose little recall vs full-corpus Lloyd. Scored on the
    // init-DISJOINT top-id probes — with first-id probes this read
    // ~0.85 for full training because the probes WERE the init
    // centroids (each probe's neighborhood forms a flatteringly tight
    // cell around its own seed); honest probes put both around the
    // 0.5–0.6 a converged k-means achieves at nprobe 3/16 here.
    assert(ms >= mf - 0.15, s"sampled micro-recall $ms vs full $mf")
    assert(ms >= 0.35, s"sampled micro-recall $ms below absolute floor")
    Checkpoints.releaseAll()
  }

  test("q147 cell balance reconciles with the assignment it audits") {
    val out = graft.operators.Ivf.q147CellBalance(spark, sf).collect()
    assert(out.length == Ivf.K, "one row per trained cell, empties included")
    val quant = Checkpoints.checkpoint(
      Ivf.quantized(Tables.embeddings(spark, sf)))
    val cells = Ivf.assignFrame(quant, Ivf.train(quant)).collect()
      .groupBy(_.getAs[Int]("cell")).view.mapValues(_.length.toLong).toMap
    val n = cells.values.sum
    out.foreach { r =>
      val c = r.getAs[Int]("cell")
      assert(r.getAs[Long]("pop") == cells.getOrElse(c, 0L), s"cell $c pop")
    }
    assert(out.map(_.getAs[Long]("pop")).sum == n, "pops partition the corpus")
    val shares = out.map(_.getAs[Double]("share")).sum
    assert(math.abs(shares - 1.0) < 1e-4, s"shares sum to $shares")
    Checkpoints.releaseAll()
  }

  test("q152 sample drift reconciles with q147 pops and the hash membership") {
    val drift = Ivf.q152SampleDrift(spark, sf).collect()
    assert(drift.length == Ivf.K)
    val pops = Ivf.q147CellBalance(spark, sf).collect()
      .map(r => r.getAs[Int]("cell") -> r.getAs[Long]("pop")).toMap
    drift.foreach { r =>
      assert(r.getAs[Long]("pop") == pops(r.getAs[Int]("cell")),
        s"cell ${r.getAs[Int]("cell")} pop vs q147")
    }
    val n = drift.map(_.getAs[Long]("pop")).sum
    val mod = Ivf.sampleModulus(n)
    def inSample(id: Long): Boolean = graft.functions.PolyHash.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(id.toString),
      31) % mod == 0
    val (cents, cells) = Artifacts.ivfModel(spark, sf)
    val expectedSample = cells.collect()
      .filter(r => inSample(r.getAs[Long]("vec_id")))
      .groupBy(_.getAs[Int]("cell")).view.mapValues(_.length.toLong).toMap
    drift.foreach { r =>
      val c = r.getAs[Int]("cell")
      assert(r.getAs[Long]("sample_pop") == expectedSample.getOrElse(c, 0L),
        s"cell $c sample_pop")
    }
    Seq("corpus_share", "sample_share").foreach { col =>
      val tot = drift.map(_.getAs[Double](col)).sum
      assert(math.abs(tot - 1.0) < 1e-4, s"$col sums to $tot")
    }
    assert(math.abs(drift.map(_.getAs[Double]("share_drift")).sum) < 1e-4)
    Checkpoints.releaseAll()
  }

  test("artifact mode: committed model ≡ inline model, q125 identical across modes") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf").toFile
    try {
      val inline = Ivf.q125IvfRecall(spark, sf).collect().map(_.toSeq).toSeq
      Artifacts.setRoot(tmp.getAbsolutePath)
      val counts = Artifacts.materializeEmbeddings(spark, sf)
      assert(counts(Artifacts.IvfCentroidsName) == Ivf.K)
      assert(counts(Artifacts.IvfCellsName) ==
        Tables.embeddings(spark, sf).count())
      val (cents, cells) = Artifacts.ivfModel(spark, sf)
      val quant = Checkpoints.checkpoint(
        Ivf.quantized(Tables.embeddings(spark, sf)))
      val trained = Ivf.train(quant)
      assert(cents.map { case (k, a) => (k, a.toSeq) } ==
        trained.map { case (k, a) => (k, a.toSeq) })
      assert(cells.collect().map(_.toSeq).toSet ==
        Ivf.assignFrame(quant, trained).collect().map(_.toSeq).toSet)
      val withArt = Ivf.q125IvfRecall(spark, sf).collect().map(_.toSeq).toSeq
      assert(withArt == inline)
      // per-probe floor on init-disjoint probes: a converged k-means
      // tops out near 0.65 micro at nprobe 3/16 on this fixture with
      // per-probe lows near 0.3 (measured against a best-of-8-seeds,
      // 50-iteration reference) — 0.2 catches a broken index without
      // flagging honest per-probe variance
      withArt.foreach { r => assert(r(3).asInstanceOf[Double] >= 0.2, r) }
      val microArt = withArt.map(_(2).asInstanceOf[Long]).sum.toDouble /
        withArt.map(_(1).asInstanceOf[Long]).sum
      assert(microArt >= 0.35, s"micro-recall $microArt")
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }
}

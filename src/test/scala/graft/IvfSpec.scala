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
    // training moved the centroids off their init vectors (Lloyd ran)
    val init = quant.orderBy("vec_id").limit(Ivf.K).collect()
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
      // a trained coarse quantizer at nprobe 3/16 must beat coin-flip
      // recall on every probe
      withArt.foreach { r => assert(r(3).asInstanceOf[Double] >= 0.5, r) }
    } finally {
      Artifacts.clearRoot()
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }
}

package graft

import graft.operators.{Ivf, Pq}

/** q139 PQ-ADC: a full independent Scala replay of the pipeline —
  * quantize, fused Lloyd codebook training, encoding, ADC scan, exact
  * integer-L2 truth — compared against the operator's reported recalls
  * value-for-value. The DuckDB oracle checks Spark-vs-SQL; this checks
  * both against a third, loop-written implementation.
  */
class PqSpec extends SparkSpec {

  private def quantLocal(v: Float): Long =
    BigDecimal(v.toDouble * Ivf.QuantScale)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** The PolyHash-mod training sample, replayed locally: the ids the
    * Lloyd loops (coarse and PQ) actually see.
    */
  private def sampleIds(ids: Seq[Long]): Seq[Long] = {
    val mod = Ivf.sampleModulus(ids.length.toLong)
    ids.filter(id => graft.functions.PolyHash.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(id.toString),
      31) % mod == 0)
  }

  test("q139 recalls equal an independent local replay") {
    val emb: Map[Long, Array[Long]] = Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding")
          .map(quantLocal).toArray).toMap
    val ids = emb.keys.toSeq.sorted
    val M = Pq.SubM
    val K = Pq.PqK
    def sub(q: Array[Long], m: Int): Array[Long] =
      q.slice(m * Pq.SubDim, (m + 1) * Pq.SubDim)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

    // init: the K smallest SAMPLED ids' subvectors, per subspace;
    // Lloyd runs on the sample, encoding on the full corpus
    val tids = sampleIds(ids)
    var cb: Map[(Int, Int), Array[Long]] =
      (for (m <- 0 until M; (id, k) <- tids.take(K).zipWithIndex)
        yield (m, k) -> sub(emb(id), m)).toMap
    def argmin(s: Array[Long], m: Int): Int =
      (0 until K).map(k => (d2(s, cb((m, k))), k)).min._2
    for (_ <- 1 to Pq.PqIters) {
      val asn = for (id <- tids; m <- 0 until M)
        yield (m, argmin(sub(emb(id), m), m), sub(emb(id), m))
      cb = cb.map { case ((m, k), old) =>
        val members = asn.collect { case (`m`, `k`, s) => s }
        ((m, k), if (members.isEmpty) old
        else Array.tabulate(Pq.SubDim)(i =>
          Ivf.roundDiv(members.map(_(i)).sum, members.length.toLong)))
      }
    }
    val codes: Map[Long, Array[Int]] = ids.map(id =>
      id -> Array.tabulate(M)(m => argmin(sub(emb(id), m), m))).toMap

    val probes = ids.sorted.takeRight(10) // top-id probes, init-disjoint
    val expected = probes.map { p =>
      val dt = Array.tabulate(M, K)((m, k) => d2(sub(emb(p), m), cb((m, k))))
      val others = ids.filter(_ != p)
      val adcTop = others.map(v =>
          ((0 until M).map(m => dt(m)(codes(v)(m))).sum, v))
        .sorted.take(10).map(_._2).toSet
      val exactTop = others.map(v => (d2(emb(p), emb(v)), v))
        .sorted.take(10).map(_._2).toSet
      p -> (exactTop.size, (exactTop & adcTop).size)
    }.toMap

    val out = Pq.q139PqRecall(spark, sf).collect()
    assert(out.length == probes.length)
    out.foreach { r =>
      val p = r.getAs[Long]("probe_id")
      val (nExact, nHit) = expected(p)
      assert(r.getAs[Long]("n_exact") == nExact, s"probe $p n_exact")
      assert(r.getAs[Long]("n_hit") == nHit, s"probe $p n_hit")
      assert(r.getAs[Double]("recall") ==
        BigDecimal(nHit.toDouble / nExact).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble, s"probe $p recall")
    }
  }

  test("q140 recalls equal an independent local replay of IVF-ADC") {
    val emb: Map[Long, Array[Long]] = Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding")
          .map(quantLocal).toArray).toMap
    val ids = emb.keys.toSeq.sorted
    val M = Pq.SubM
    val K = Pq.PqK
    def sub(q: Array[Long], m: Int): Array[Long] =
      q.slice(m * Pq.SubDim, (m + 1) * Pq.SubDim)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

    // local IVF training: Lloyd over the SAMPLED quantized vectors
    val tids = sampleIds(ids)
    var cents: Map[Int, Array[Long]] =
      tids.take(Ivf.K).zipWithIndex.map { case (id, k) => k -> emb(id) }.toMap
    def cellOf(q: Array[Long]): Int =
      (0 until Ivf.K).map(k => (d2(q, cents(k)), k)).min._2
    for (_ <- 1 to Ivf.Iters) {
      val asn = tids.map(id => (cellOf(emb(id)), emb(id)))
      cents = cents.map { case (k, old) =>
        val members = asn.collect { case (`k`, q) => q }
        (k, if (members.isEmpty) old
        else Array.tabulate(64)(i =>
          Ivf.roundDiv(members.map(_(i)).sum, members.length.toLong)))
      }
    }
    val cellAsn: Map[Long, Int] = ids.map(id => id -> cellOf(emb(id))).toMap

    // local PQ training — the q139 replay verbatim (sampled)
    var cb: Map[(Int, Int), Array[Long]] =
      (for (m <- 0 until M; (id, k) <- tids.take(K).zipWithIndex)
        yield (m, k) -> sub(emb(id), m)).toMap
    def argmin(s: Array[Long], m: Int): Int =
      (0 until K).map(k => (d2(s, cb((m, k))), k)).min._2
    for (_ <- 1 to Pq.PqIters) {
      val asn = for (id <- tids; m <- 0 until M)
        yield (m, argmin(sub(emb(id), m), m), sub(emb(id), m))
      cb = cb.map { case ((m, k), old) =>
        val members = asn.collect { case (`m`, `k`, s) => s }
        ((m, k), if (members.isEmpty) old
        else Array.tabulate(Pq.SubDim)(i =>
          Ivf.roundDiv(members.map(_(i)).sum, members.length.toLong)))
      }
    }
    val codes: Map[Long, Array[Int]] = ids.map(id =>
      id -> Array.tabulate(M)(m => argmin(sub(emb(id), m), m))).toMap

    // coarse probe → Nprobe cells; ADC restricted to those cells' members
    val probes = ids.sorted.takeRight(10) // top-id probes, init-disjoint
    val expected = probes.map { p =>
      val near = (0 until Ivf.K).map(k => (d2(emb(p), cents(k)), k))
        .sorted.take(Ivf.Nprobe).map(_._2).toSet
      val dt = Array.tabulate(M, K)((m, k) => d2(sub(emb(p), m), cb((m, k))))
      val adcTop = ids.filter(v => v != p && near.contains(cellAsn(v)))
        .map(v => ((0 until M).map(m => dt(m)(codes(v)(m))).sum, v))
        .sorted.take(10).map(_._2).toSet
      val exactTop = ids.filter(_ != p).map(v => (d2(emb(p), emb(v)), v))
        .sorted.take(10).map(_._2).toSet
      p -> (exactTop.size, (exactTop & adcTop).size)
    }.toMap

    val out = Pq.q140IvfAdcRecall(spark, sf).collect()
    assert(out.length == probes.length)
    out.foreach { r =>
      val p = r.getAs[Long]("probe_id")
      val (nExact, nHit) = expected(p)
      assert(r.getAs[Long]("n_exact") == nExact, s"probe $p n_exact")
      assert(r.getAs[Long]("n_hit") == nHit, s"probe $p n_hit")
    }
    Checkpoints.releaseAll()
  }

  test("q146 recalls equal an independent local replay of residual IVF-ADC") {
    val emb: Map[Long, Array[Long]] = Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding")
          .map(quantLocal).toArray).toMap
    val ids = emb.keys.toSeq.sorted
    val M = Pq.SubM
    val K = Pq.PqK
    def sub(q: Array[Long], m: Int): Array[Long] =
      q.slice(m * Pq.SubDim, (m + 1) * Pq.SubDim)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

    // local IVF training (as the q140 replay — sampled)
    val tids = sampleIds(ids)
    var cents: Map[Int, Array[Long]] =
      tids.take(Ivf.K).zipWithIndex.map { case (id, k) => k -> emb(id) }.toMap
    def cellOf(q: Array[Long]): Int =
      (0 until Ivf.K).map(k => (d2(q, cents(k)), k)).min._2
    for (_ <- 1 to Ivf.Iters) {
      val asn = tids.map(id => (cellOf(emb(id)), emb(id)))
      cents = cents.map { case (k, old) =>
        val members = asn.collect { case (`k`, q) => q }
        (k, if (members.isEmpty) old
        else Array.tabulate(64)(i =>
          Ivf.roundDiv(members.map(_(i)).sum, members.length.toLong)))
      }
    }
    val cellAsn: Map[Long, Int] = ids.map(id => id -> cellOf(emb(id))).toMap
    // residuals, then the same local PQ loop over the sampled ones
    val res: Map[Long, Array[Long]] = ids.map(id => id ->
      emb(id).zip(cents(cellAsn(id))).map { case (a, b) => a - b }).toMap
    var cb: Map[(Int, Int), Array[Long]] =
      (for (m <- 0 until M; (id, k) <- tids.take(K).zipWithIndex)
        yield (m, k) -> sub(res(id), m)).toMap
    def argmin(s: Array[Long], m: Int): Int =
      (0 until K).map(k => (d2(s, cb((m, k))), k)).min._2
    for (_ <- 1 to Pq.PqIters) {
      val asn = for (id <- tids; m <- 0 until M)
        yield (m, argmin(sub(res(id), m), m), sub(res(id), m))
      cb = cb.map { case ((m, k), old) =>
        val members = asn.collect { case (`m`, `k`, s) => s }
        ((m, k), if (members.isEmpty) old
        else Array.tabulate(Pq.SubDim)(i =>
          Ivf.roundDiv(members.map(_(i)).sum, members.length.toLong)))
      }
    }
    val codes: Map[Long, Array[Int]] = ids.map(id =>
      id -> Array.tabulate(M)(m => argmin(sub(res(id), m), m))).toMap

    // coarse probe → per-probed-cell residual tables → restricted ADC
    val probes = ids.sorted.takeRight(10) // top-id probes, init-disjoint
    val expected = probes.map { p =>
      val near = (0 until Ivf.K).map(k => (d2(emb(p), cents(k)), k))
        .sorted.take(Ivf.Nprobe).map(_._2)
      val dt: Map[Int, Array[Array[Long]]] = near.map { c =>
        val pres = emb(p).zip(cents(c)).map { case (a, b) => a - b }
        c -> Array.tabulate(M, K)((m, k) => d2(sub(pres, m), cb((m, k))))
      }.toMap
      val adcTop = ids
        .filter(v => v != p && near.contains(cellAsn(v)))
        .map(v => ((0 until M).map(m =>
          dt(cellAsn(v))(m)(codes(v)(m))).sum, v))
        .sorted.take(10).map(_._2).toSet
      val exactTop = ids.filter(_ != p).map(v => (d2(emb(p), emb(v)), v))
        .sorted.take(10).map(_._2).toSet
      p -> (exactTop.size, (exactTop & adcTop).size)
    }.toMap

    val out = Pq.q146IvfAdcResidualRecall(spark, sf).collect()
    assert(out.length == probes.length)
    out.foreach { r =>
      val p = r.getAs[Long]("probe_id")
      val (nExact, nHit) = expected(p)
      assert(r.getAs[Long]("n_exact") == nExact, s"probe $p n_exact")
      assert(r.getAs[Long]("n_hit") == nHit, s"probe $p n_hit")
    }
    Checkpoints.releaseAll()
  }

  test("q139 compression is real: codes take SubM small ints per vector") {
    // structural pin on the published working point: 64 dims → 8
    // subspaces of 8 dims, 8 codewords (3 bits) each — 64 floats
    // become 8 3-bit codes
    assert(Pq.SubM * Pq.SubDim == 64)
    assert(Pq.PqK <= 256, "codes must fit a byte")
  }
}

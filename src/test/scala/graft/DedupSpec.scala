package graft

import graft.operators.Dedup

class DedupSpec extends SparkSpec {

  private lazy val exact = Dedup.q20NgramJaccard(spark, sf).collect()
    .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
      r.getAs[Double]("jaccard")).toMap

  test("q20 exact jaccard finds the planted near-dup pairs") {
    assert(exact.nonEmpty)
    assert(exact.values.forall(j => j >= 0.5 && j <= 1.0))
  }

  test("q18 minhash recalls high-jaccard pairs and estimates accurately") {
    val found = Dedup.q18DedupMinhash(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("est_jaccard")).toMap
    // recall: pairs with true jaccard >= 0.9 should almost all surface
    val strong = exact.filter(_._2 >= 0.9).keySet
    val recalled = strong.count(found.contains)
    assert(strong.isEmpty || recalled.toDouble / strong.size >= 0.8,
      s"recall ${recalled}/${strong.size}")
    // estimation: reported pairs shouldn't be wildly off the true value
    val errs = found.collect {
      case (pair, est) if exact.contains(pair) => math.abs(est - exact(pair))
    }
    assert(errs.nonEmpty && errs.sum / errs.size <= 0.25)
  }

  test("q141 calibration equals a local replay; curve is monotone in bands") {
    val sigs = Dedup.minhashSignatures(Tables.documents(spark, sf)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (0 until 16).map(i => r.getAs[Long](s"h$i")).toArray).toMap
    def replay(bands: Int): (Long, Long) = {
      val r = 16 / bands
      // band buckets, hot buckets (>64) dropped
      val buckets = sigs.toSeq.flatMap { case (id, sig) =>
        (0 until bands).map(b =>
          (b, sig.slice(b * r, (b + 1) * r).mkString("_")) -> id)
      }.groupBy(_._1).filter(_._2.size <= 64)
      val cand = buckets.values.flatMap { members =>
        val ids = members.map(_._2).sorted
        for (i <- ids.indices; j <- (i + 1) until ids.size)
          yield (ids(i), ids(j))
      }.toSet
      val acc = cand.count { case (a, b) =>
        sigs(a).zip(sigs(b)).count(p => p._1 == p._2) / 16.0 >= 0.5
      }
      (cand.size.toLong, acc.toLong)
    }
    val expected = Dedup.CalibrationBands.map(b => b -> replay(b)).toMap
    val out = Dedup.q141LshCalibration(spark, sf).collect()
    assert(out.map(_.getAs[Int]("bands")).toSeq == Dedup.CalibrationBands)
    out.foreach { row =>
      val b = row.getAs[Int]("bands")
      val (nCand, nAcc) = expected(b)
      assert(row.getAs[Long]("n_candidates") == nCand, s"bands=$b candidates")
      assert(row.getAs[Long]("n_accepted") == nAcc, s"bands=$b accepted")
    }
    // widest config anchors recall at 1.0 (unless nothing is accepted)
    val widest = out.find(_.getAs[Int]("bands") == 16).get
    assert(widest.getAs[Long]("n_accepted") == 0 ||
      widest.getAs[Double]("recall") == 1.0)
    Checkpoints.releaseAll()
  }

  test("q19 simhash pairs have genuinely similar token sets") {
    import spark.implicits._
    val pairs = Dedup.q19DedupSimhash(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    def tokSet(id: Long) = docs(id).split("\\s+").toSet
    val sims = pairs.take(200).map { case (a, b) =>
      val (sa, sb) = (tokSet(a), tokSet(b))
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    // hamming<=3 of 64 bits over distinct-token simhash implies strong
    // token-set agreement on this shared-vocabulary corpus
    assert(sims.sum / sims.length >= 0.6)
  }

  test("q40 keeper assignment is a consistent clustering of the pair graph") {
    val rows = Dedup.q40DedupKeepers(spark, sf).collect()
    val keeper = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("keeper_id")).toMap
    // total: every document gets exactly one assignment
    assert(rows.length ==
      spark.read.parquet(s"$sf/documents.parquet").count())
    // keeper = cluster min, so never above the member
    assert(keeper.forall { case (d, k) => k <= d })
    // is_keeper is derived, and keepers are fixpoints (keeper of a keeper
    // is itself — fails if propagation stopped before convergence)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_keeper") ==
        (r.getAs[Long]("doc_id") == r.getAs[Long]("keeper_id")))
    }
    assert(keeper.values.toSet.forall(k => keeper(k) == k))
    // every q20 near-dup pair landed in the same cluster
    exact.keys.foreach { case (a, b) => assert(keeper(a) == keeper(b)) }
  }

  test("connectedComponents labels a multi-hop chain with its min id") {
    import spark.implicits._
    // 0-1-2-3-4 chain plus isolated 9: propagation must cross 4 hops
    val edges = Seq((1L, 0L), (1L, 2L), (3L, 2L), (3L, 4L), (7L, 8L))
      .toDF("src", "dst")
    val verts = (Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L, 9L)).toDF("v")
    val got = Dedup.connectedComponents(verts, edges).collect()
      .map(r => r.getAs[Long]("v") -> r.getAs[Long]("label")).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
      7L -> 7L, 8L -> 7L, 9L -> 9L))
  }

  test("connectedComponents matches union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val n = 30 + rnd.nextInt(20)
      val edges = Seq.fill(25)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side min-union-find oracle: pointing the larger root at the
      // smaller keeps every root the component minimum
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r); r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      val got = Dedup.connectedComponents(
          (0L until n.toLong).toDF("v"), edges.toDF("src", "dst"))
        .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("label")).toMap
      assert(got == expected)
    }
  }

  test("star contraction labels a 1000-long chain in O(log) rounds") {
    import spark.implicits._
    // the adversarial-diameter case: propagation needs ~n rounds on a
    // chain (its maxIter=50 default would abort here); star contraction
    // must finish in logarithmic rounds
    val n = 1000L
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val verts = (0L until n).toDF("v")
    val (labels, rounds) = Dedup.starContraction(verts, edges)
    assert(rounds <= 16, s"took $rounds rounds on a ${n}-chain")
    val got = labels.collect()
      .map(r => r.getAs[Long]("v") -> r.getAs[Long]("label"))
    assert(got.length == n)
    assert(got.forall(_._2 == 0L))
  }

  test("star contraction matches propagation and union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 3) {
      val n = 30 + rnd.nextInt(20)
      val edges = Seq.fill(25)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r); r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      val verts = (0L until n.toLong).toDF("v")
      val star = Dedup.connectedComponentsStar(verts, edges.toDF("src", "dst"))
        .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("label")).toMap
      assert(star == expected)
      val prop = Dedup.connectedComponents(verts, edges.toDF("src", "dst"))
        .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("label")).toMap
      assert(star == prop)
    }
  }

  test("star contraction handles empty and self-loop-only edge sets") {
    import spark.implicits._
    val verts = Seq(1L, 2L, 3L).toDF("v")
    val none = Dedup.connectedComponentsStar(verts,
        Seq.empty[(Long, Long)].toDF("src", "dst"))
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("label")).toMap
    assert(none == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    val selfOnly = Dedup.connectedComponentsStar(verts,
        Seq((2L, 2L)).toDF("src", "dst"))
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("label")).toMap
    assert(selfOnly == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("q41 curation verdict is consistent with its own signals") {
    val rows = graft.operators.Curation.q41CorpusSelect(spark, sf).collect()
    assert(rows.length ==
      spark.read.parquet(s"$sf/documents.parquet").count())
    val selected = rows.filter(_.getAs[Boolean]("selected"))
    assert(selected.nonEmpty, "funnel selected nothing — thresholds broken")
    // selected implies every gate; non-keepers are never selected
    selected.foreach { r =>
      assert(r.getAs[Boolean]("is_keeper"))
      assert(r.getAs[String]("pred_lang") == "en")
      val n = r.getAs[Int]("n_tokens")
      assert(n >= 5 && n <= 5000)
      assert(r.getAs[Double]("repetition_ratio") <= 0.5)
    }
    assert(rows.filter(r => !r.getAs[Boolean]("is_keeper"))
      .forall(!_.getAs[Boolean]("selected")))
  }

  test("q42 split assignment is deterministic, total, and near the fractions") {
    val a = graft.operators.Curation.q42SampleSplit(spark, sf).collect()
    val b = graft.operators.Curation.q42SampleSplit(spark, sf).collect()
    assert(a.sameElements(b))
    val n = a.length.toDouble
    assert(n == spark.read.parquet(s"$sf/documents.parquet").count())
    val frac = a.groupBy(_.getAs[String]("split")).view.mapValues(_.length / n).toMap
    // hash buckets of a small corpus wobble; generous tolerance
    assert(math.abs(frac.getOrElse("train", 0.0) - 0.8) < 0.08, frac.toString)
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.1) < 0.06, frac.toString)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.1) < 0.06, frac.toString)
    a.foreach { r =>
      val bkt = r.getAs[Int]("bucket")
      val expected = if (bkt < 80) "train" else if (bkt < 90) "val" else "test"
      assert(r.getAs[String]("split") == expected)
    }
  }

  test("q43 yield report totals reconcile with the verdict ledger") {
    val report = graft.operators.Curation.q43CorpusStats(spark, sf).collect()
    val ledger = graft.operators.Curation.q41CorpusSelect(spark, sf).collect()
    assert(report.map(_.getAs[Long]("n_docs")).sum == ledger.length)
    val selectedDocs = ledger.count(_.getAs[Boolean]("selected"))
    assert(report.filter(_.getAs[Boolean]("selected"))
      .map(_.getAs[Long]("n_docs")).sum == selectedDocs)
    assert(report.map(_.getAs[String]("split")).toSet
      .subsetOf(Set("train", "val", "test")))
  }

  test("q46 stratified cap keeps at most K per stratum, deterministically") {
    val a = graft.operators.Curation.q46StratifiedCap(spark, sf).collect()
    val b = graft.operators.Curation.q46StratifiedCap(spark, sf).collect()
    assert(a.sameElements(b))
    val perLang = a.groupBy(_.getAs[String]("lang"))
    assert(perLang.nonEmpty)
    perLang.foreach { case (lang, rows) =>
      assert(rows.length <= 50, s"$lang over cap: ${rows.length}")
      val ranks = rows.map(_.getAs[Int]("stratum_rank")).sorted.toSeq
      assert(ranks == (1 to rows.length), s"$lang ranks not dense: $ranks")
    }
  }

  test("q17 exact-dedup groups partition the corpus") {
    val rows = Dedup.q17DedupExact(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == spark.read.parquet(s"$sf/documents.parquet").count())
    assert(rows.forall(r => r.getAs[Long]("keeper_id") >= 0))
  }
}

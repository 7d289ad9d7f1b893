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

  test("q17 exact-dedup groups partition the corpus") {
    val rows = Dedup.q17DedupExact(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == spark.read.parquet(s"$sf/documents.parquet").count())
    assert(rows.forall(r => r.getAs[Long]("keeper_id") >= 0))
  }
}

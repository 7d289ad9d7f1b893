package graft

import graft.operators.CandidateJoin

class CandidateJoinSpec extends SparkSpec {
  import spark.implicits._

  test("resolve picks the highest-priority hit and defaults on miss") {
    val probe = Seq(
      (1, Seq("alpha beta", "alpha")),   // both keys exist -> priority 0 wins
      (2, Seq("nope", "alpha")),         // only fallback matches -> priority 1
      (3, Seq("nope", "zilch")),         // total miss -> nulls
      (4, Seq("gamma"))                  // single candidate hit
    ).toDF("id", "candidates")
    val lookup = Seq(("alpha beta", 100), ("alpha", 200), ("gamma", 300))
      .toDF("key", "payload")

    val out = CandidateJoin.resolve(probe, "id", "candidates", lookup, "key")
      .orderBy("id")
      .collect()
      .map(r => (r.getInt(0),
        if (r.isNullAt(1)) -1 else r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2)))
      .toSeq

    assert(out == Seq((1, 0, 100), (2, 1, 200), (3, -1, -1), (4, 0, 300)))
  }

  test("resolveLive with the offline client agrees with the declarative join") {
    import graft.operators.{Enrichment, EnrichmentClient}
    val probe = Seq(
      (1L, Seq("alpha beta", "alpha")),
      (2L, Seq("nope", "alpha")),
      (3L, Seq("nope", "zilch")),
      (4L, Seq("gamma"))
    ).toDF("id", "candidates")
    val lookup = Seq(("alpha beta", 100L, "x"), ("alpha", 200L, "y"),
      ("gamma", 300L, "z")).toDF("key", "meta_id", "tag")

    val live = Enrichment.resolveLive(probe, "id", "candidates",
        EnrichmentClient.offline(lookup, "key"))
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"),
        Option(r.getAs[Integer]("matched_priority")).map(_.toInt),
        Option(r.getAs[Map[String, String]]("payload"))))
      .toSeq
    val declarative = CandidateJoin.resolve(probe, "id", "candidates", lookup, "key")
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"),
        Option(r.getAs[Integer]("matched_priority")).map(_.toInt),
        if (r.isNullAt(r.fieldIndex("meta_id"))) None
        else Some(Map("meta_id" -> r.getAs[Long]("meta_id").toString,
          "tag" -> r.getAs[String]("tag")))))
      .toSeq
    assert(live == declarative)
    assert(live.map(_._1) == Seq(1L, 2L, 3L, 4L))
    assert(live(0)._2.contains(0) && live(1)._2.contains(1) && live(2)._2.isEmpty)
  }

  test("resolveLive opens and closes one client per partition") {
    import graft.operators.{Enrichment, EnrichmentClient}
    val sc = spark.sparkContext
    val opens = sc.longAccumulator("opens")
    val closes = sc.longAccumulator("closes")
    val client = new EnrichmentClient {
      override def open(): Unit = opens.add(1)
      override def close(): Unit = closes.add(1)
      override def fetch(c: String): Option[Map[String, String]] =
        if (c.startsWith("k")) Some(Map("v" -> c)) else None
    }
    val probe = (1L to 100L).map(i => (i, Seq(s"k$i")))
      .toDF("id", "candidates").repartition(4)
    val out = Enrichment.resolveLive(probe, "id", "candidates", client)
    assert(out.filter("matched_priority IS NOT NULL").count() == 100)
    assert(opens.value == 4 && closes.value == 4,
      s"opens=${opens.value} closes=${closes.value}")
  }

  test("offline client refuses a lookup above its dimension bound") {
    import graft.operators.EnrichmentClient
    val big = spark.range(11)
      .selectExpr("CAST(id AS STRING) AS key", "id AS payload")
    val e = intercept[IllegalArgumentException] {
      EnrichmentClient.offline(big, "key", maxRows = 10L)
    }
    assert(e.getMessage.contains("exceeds 10 rows"))
    // at the bound it still builds
    EnrichmentClient.offline(big.limit(10), "key", maxRows = 10L)
  }

  test("q15/q16 plans resolve every probe row exactly once") {
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(CandidateJoin.q15CandidateJoin(spark, sf).count() == n)
    val q16 = CandidateJoin.q16EnrichmentJoin(spark, sf)
    assert(q16.count() == n)
    // even docs are their own lookup entries -> must all match
    assert(q16.filter("doc_id % 2 = 0 AND matched_priority IS NULL").count() == 0)
  }
}

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

  test("q15/q16 plans resolve every probe row exactly once") {
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(CandidateJoin.q15CandidateJoin(spark, sf).count() == n)
    val q16 = CandidateJoin.q16EnrichmentJoin(spark, sf)
    assert(q16.count() == n)
    // even docs are their own lookup entries -> must all match
    assert(q16.filter("doc_id % 2 = 0 AND matched_priority IS NULL").count() == 0)
  }
}

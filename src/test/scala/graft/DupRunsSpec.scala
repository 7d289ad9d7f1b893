package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusOps

/** q132 longest-duplicated-run: crafted-corpus island arithmetic plus
  * row-for-row reconciliation with q54's span counts on the shared
  * corpus.
  */
class DupRunsSpec extends SparkSpec {

  private def runsOf(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    val d = docs.toDF("doc_id", "text")
    val spans = CorpusOps.dupSpansFromCounts(CorpusOps.spanCounts(d))
    CorpusOps.dupRunsFrom(d, spans).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_runs"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Long]("max_run_spans"), r.getAs[Long]("max_run_tokens")))
      .toMap
  }

  test("a single shared 12-token block is one 3-span run of 12 tokens") {
    val shared = (0 until 12).map(i => s"s$i").mkString(" ")
    val out = runsOf(Seq(
      0L -> s"${(0 until 10).map(i => s"a$i").mkString(" ")} $shared ${(0 until 6).map(i => s"b$i").mkString(" ")}",
      1L -> s"${(0 until 7).map(i => s"c$i").mkString(" ")} $shared ${(0 until 9).map(i => s"d$i").mkString(" ")}"))
    // 12 shared tokens → 3 consecutive duplicated 10-gram starts → one
    // island of 3 spans = 3 + 9 = 12 tokens, in BOTH docs
    assert(out(0L) == ((1L, 3L, 3L, 12L)))
    assert(out(1L) == ((1L, 3L, 3L, 12L)))
  }

  test("two separated shared blocks are two islands; max is the longer") {
    val blockA = (0 until 10).map(i => s"p$i").mkString(" ") // exactly 1 span
    val blockB = (0 until 14).map(i => s"q$i").mkString(" ") // 5 spans
    val out = runsOf(Seq(
      0L -> s"$blockA ${(0 until 8).map(i => s"x$i").mkString(" ")} $blockB",
      1L -> s"$blockB ${(0 until 8).map(i => s"y$i").mkString(" ")} $blockA",
      2L -> s"${(0 until 20).map(i => s"z$i").mkString(" ")}"))
    // gap of 8 unique tokens < SpanN keeps the islands apart: the spans
    // bridging the gap contain unique tokens, so they are not duplicated
    assert(out(0L) == ((2L, 6L, 5L, 14L)))
    assert(out(1L) == ((2L, 6L, 5L, 14L)))
    assert(out(2L) == ((0L, 0L, 0L, 0L)))
  }

  test("q132 reconciles with q54 span counts on the shared corpus") {
    val q54 = operators.CorpusOps.q54DupSpans(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dup_spans")).toMap
    val q132 = CorpusOps.q132DupRuns(spark, sf).collect()
    assert(q132.nonEmpty)
    q132.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_dup_spans") == q54(id),
        s"doc $id dup-span count drifted from q54")
      assert(r.getAs[Long]("max_run_spans") <= r.getAs[Long]("n_dup_spans"))
      if (r.getAs[Long]("n_dup_spans") > 0) {
        assert(r.getAs[Long]("max_run_spans") >= 1)
        assert(r.getAs[Long]("max_run_tokens") ==
          r.getAs[Long]("max_run_spans") + 9)
      } else assert(r.getAs[Long]("max_run_tokens") == 0)
    }
  }
}

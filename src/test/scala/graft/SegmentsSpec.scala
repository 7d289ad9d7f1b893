package graft

import org.apache.spark.sql.functions._
import graft.operators.Segments

/** Behavioral checks for the token-segment operators beyond the DuckDB
  * hash oracles: chunk coverage invariants (q64) and the winnowing
  * shared-run guarantee (q65).
  */
class SegmentsSpec extends SparkSpec {

  test("q64 chunks cover every token with the configured stride and width") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split("\\s+")).toMap
    val chunks = Segments.q64ChunkDocs(spark, sf).collect()
    val byDoc = chunks.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == docs.keySet)
    byDoc.foreach { case (id, rs) =>
      val toks = docs(id)
      val sorted = rs.sortBy(_.getAs[Int]("chunk_id"))
      // starts advance by the stride from zero
      assert(sorted.zipWithIndex.forall { case (r, i) =>
        r.getAs[Int]("start_tok") == i * 24 })
      // every chunk matches a direct slice of the token array
      sorted.foreach { r =>
        val s = r.getAs[Int]("start_tok")
        val expect = toks.slice(s, math.min(s + 32, toks.length))
        assert(r.getAs[Int]("n_chunk_tokens") == expect.length)
        assert(r.getAs[String]("chunk_text") == expect.mkString(" "))
      }
      // full coverage: last chunk reaches the end of the doc
      val last = sorted.last
      assert(last.getAs[Int]("start_tok") + last.getAs[Int]("n_chunk_tokens")
        == toks.length)
    }
  }

  test("q65 winnowing surfaces a crafted containment duplicate") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    val long = (1 to 60).map(i => s"w$i").mkString(" ")
    // doc 2 is a 20-token excerpt of doc 1 (tokens 21..40); doc 3 is
    // unrelated — the winnowing guarantee (shared run of k+w-1 = 7
    // tokens shares a fingerprint) must pair (1, 2) and nothing else
    val excerpt = (21 to 40).map(i => s"w$i").mkString(" ")
    val other = (1 to 60).map(i => s"x$i").mkString(" ")
    Seq((1L, long), (2L, excerpt), (3L, other))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Segments.q65WinnowPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("containment")).toMap
    assert(pairs.keySet == Set((1L, 2L)))
    // every fingerprint of the excerpt also winnows out of the source's
    // matching region, so containment is total
    assert(pairs((1L, 2L)) == 1.0)
  }

  test("winnowing guarantee: any shared k+w-1 run yields a shared fingerprint") {
    import spark.implicits._
    // Schleimer et al.'s correctness property, tested on random docs
    // with planted shared runs: two documents sharing >= k+w-1 = 7
    // contiguous tokens must share at least one selected fingerprint
    val rnd = new scala.util.Random(23)
    val docs = scala.collection.mutable.Buffer.empty[(Long, String)]
    val planted = scala.collection.mutable.Buffer.empty[(Long, Long)]
    var id = 0L
    for (trial <- 1 to 8) {
      val run = Seq.fill(7)(s"r${trial}_${rnd.nextInt(1000)}")
      def docWithRun(): String = {
        val pre = Seq.fill(rnd.nextInt(30))(s"t${rnd.nextInt(5000)}")
        val post = Seq.fill(rnd.nextInt(30))(s"t${rnd.nextInt(5000)}")
        (pre ++ run ++ post).mkString(" ")
      }
      docs += ((id, docWithRun())); docs += ((id + 1, docWithRun()))
      planted += ((id, id + 1))
      id += 2
    }
    val fps = graft.operators.Segments.winnowFingerprints(
        docs.toSeq.toDF("doc_id", "text"))
      .collect().groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[Long]("fp")).toSet).toMap
    planted.foreach { case (a, b) =>
      assert(fps(a).intersect(fps(b)).nonEmpty,
        s"docs $a/$b share a 7-token run but no fingerprint")
    }
  }

  test("q65 pair set is plausible against q20's exact jaccard pairs") {
    // winnowing samples the q20 shingle space: its high-containment pairs
    // on the real corpus must include the exact near-dup pairs q20 finds
    // at 0.5 jaccard (a strictly stronger condition than containment)
    val winnow = Segments.q65WinnowPairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val exact = graft.operators.Dedup.q20NgramJaccard(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(exact.nonEmpty)
    val missed = exact -- winnow
    assert(missed.size <= exact.size / 4,
      s"winnowing missed ${missed.size} of ${exact.size} exact pairs")
  }
}

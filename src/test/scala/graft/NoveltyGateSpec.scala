package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingOps

/** The intake novelty gate (`StreamingOps.noveltyOfBatch`): per
  * micro-batch verdicts must equal a local recompute against the
  * PRE-BATCH corpus, and must see the standing state advance — a batch-2
  * re-crawl of batch-1 content scores zero novelty. MemoryStream drives
  * a real foreachBatch loop that appends + re-materializes artifacts
  * between batches, so batch 2 reads the standing shingles8 artifact,
  * not the inline fallback.
  */
class NoveltyGateSpec extends SparkSpec {
  import spark.implicits._

  private def sh8(t: String): Set[String] = {
    val w = if (t == null) Array.empty[String] else t.split("\\s+", -1)
    if (w.length < 8) Set.empty else w.sliding(8).map(_.mkString(" ")).toSet
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("per-batch novelty = recompute vs pre-batch corpus; re-crawled content scores zero") {
    val root = Files.createTempDirectory("graft-novelty-root").toFile
    val corpus = Files.createTempDirectory("graft-novelty-corpus").toString + "/c"
    val docsPath = s"$corpus/documents.parquet"
    val a = "alpha beta gamma delta epsilon zeta eta theta iota"
    val batch1 = Seq(
      IngestDoc(10L, a, "s1"),
      IngestDoc(11L, "one two three four five six seven eight nine", "s1"))
    val batch2 = Seq(
      IngestDoc(20L, a, "s2"), // re-crawl of doc 10 → zero novelty
      IngestDoc(21L, "alpha beta gamma delta epsilon zeta eta theta fresh", "s2"),
      IngestDoc(22L, "too short for shingles", "s2"), // no 8-grams → NULL
      // at-least-once delivery: the same row twice within ONE batch —
      // must produce a single verdict with un-inflated shingle counts
      IngestDoc(21L, "alpha beta gamma delta epsilon zeta eta theta fresh", "s2"))
    val ledger =
      scala.collection.mutable.ArrayBuffer[(Long, Long, Long, Option[Double])]()
    // corpus state as the local mirror sees it, BEFORE the current batch
    var mirror = Set.empty[String]
    val preBatchSets = scala.collection.mutable.ArrayBuffer[Set[String]]()
    val input = MemoryStream[IngestDoc](spark)
    try {
      Artifacts.setRoot(root.getAbsolutePath)
      // seed an empty corpus so batch 1 scores against a readable table
      spark.emptyDataset[IngestDoc].toDF()
        .write.mode("overwrite").parquet(docsPath)
      Tables.invalidate(corpus)
      val q = input.toDF().writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          graft.Checkpoints.scoped {
            val batch = graft.Checkpoints.checkpoint(b.toDF())
            preBatchSets += mirror
            ledger ++= StreamingOps.noveltyOfBatch(batch, spark, corpus)
              .collect().map(r => (r.getAs[Long]("doc_id"),
                r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"),
                Option(r.getAs[java.lang.Double]("novelty")).map(_.toDouble)))
            // the real intake appends id-deduped rows; mirror it
            batch.dropDuplicates("doc_id").write.mode("append").parquet(docsPath)
            Tables.invalidate(corpus)
            Artifacts.materialize(spark, corpus)
            mirror ++= batch.collect()
              .flatMap(r => sh8(r.getAs[String]("text")))
            ()
          }
        }.start()
      try {
        input.addData(batch1: _*)
        q.processAllAvailable()
        input.addData(batch2: _*)
        q.processAllAvailable()
      } finally q.stop()
    } finally {
      Artifacts.clearRoot()
      Tables.invalidate(corpus)
      deleteRecursively(root)
      deleteRecursively(new java.io.File(corpus).getParentFile)
      Checkpoints.releaseAll()
    }

    val all = (batch1 ++ batch2).distinct
    assert(ledger.size == all.size,
      "one verdict per distinct document, duplicates collapsed")
    assert(preBatchSets.size == 2 && preBatchSets(0).isEmpty &&
      preBatchSets(1).nonEmpty, "standing state did not advance")
    val pre = Map(0 -> preBatchSets(0), 1 -> preBatchSets(1))
    val batchOf = (batch1.map(_.doc_id -> 0) ++ batch2.map(_.doc_id -> 1)).toMap
    val textOf = all.map(d => d.doc_id -> d.text).toMap
    ledger.foreach { case (id, nSh, nNovel, novelty) =>
      val mine = sh8(textOf(id))
      val expected = mine.count(!pre(batchOf(id)).contains(_))
      assert(nSh == mine.size.toLong, s"doc $id n_shingles")
      assert(nNovel == expected.toLong, s"doc $id n_novel")
      if (mine.nonEmpty)
        assert(math.abs(novelty.get - r6(expected.toDouble / mine.size)) < 1e-9)
      else assert(novelty.isEmpty, s"doc $id expected NULL novelty")
    }
    // the headline behaviors, stated directly: batch-1 content is all
    // novel against an empty corpus; its batch-2 re-crawl scores zero
    val m = ledger.map(l => l._1 -> l).toMap
    assert(m(10L)._4.contains(1.0))
    assert(m(20L)._4.contains(0.0), "re-crawled duplicate not caught")
    assert(m(21L)._3 > 0 && m(21L)._3 < m(21L)._2,
      "partially novel doc should be partially novel")
  }
}

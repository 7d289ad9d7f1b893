package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.EvalSets
import graft.streaming.StreamingOps

/** The intake decontamination gate (`StreamingOps.contaminationOfBatch`):
  * per micro-batch verdicts must equal a local recompute against the
  * PRE-BATCH corpus's eval members, registered-member arrivals must be
  * excluded (the benchmark itself arriving is not contamination), and
  * the gate must see the standing state advance — content overlapping a
  * member that arrived in batch 1 is flagged in batch 2. MemoryStream
  * drives a real foreachBatch loop that appends + re-materializes
  * artifacts between batches, so batch 2 reads the standing
  * eval_shingles artifact, not the inline fallback.
  */
class ContaminationGateSpec extends SparkSpec {
  import spark.implicits._

  private def sh8(t: String): Set[String] = {
    val w = if (t == null) Array.empty[String] else t.split("\\s+", -1)
    if (w.length < 8) Set.empty else w.sliding(8).map(_.mkString(" ")).toSet
  }

  private def setsOf(id: Long): Seq[(String, Int)] =
    EvalSets.Registry.filter(s => id % s.mod == s.residue)
      .map(s => (s.setId, s.version))

  test("per-batch contamination = recompute vs pre-batch members; members excluded") {
    val root = Files.createTempDirectory("graft-contam-root").toFile
    val corpus = Files.createTempDirectory("graft-contam-corpus").toString + "/c"
    val docsPath = s"$corpus/documents.parquet"
    val a = "alpha beta gamma delta epsilon zeta eta theta iota"
    val b = "one two three four five six seven eight nine"
    // batch 1: member 7 (heldout_a ∧ heldout_c) carries text A, member 8
    // (heldout_b) text B, plus an unrelated non-member
    val batch1 = Seq(
      IngestDoc(7L, a, "s1"),
      IngestDoc(8L, b, "s1"),
      IngestDoc(1L, "completely unrelated words with no overlap here at all", "s1"))
    // batch 2: 30 leaks text A (→ flagged for a AND c), 31 leaks text B
    // (→ flagged for b), 27 is itself a member carrying A (→ excluded),
    // 32 is clean; 30 delivered twice within the batch → one verdict
    val batch2 = Seq(
      IngestDoc(30L, a, "s2"),
      IngestDoc(31L, b + " and some extra tail words", "s2"),
      IngestDoc(27L, a, "s2"),
      IngestDoc(32L, "nothing here matches any registered benchmark text", "s2"),
      IngestDoc(30L, a, "s2"))
    val ledger = scala.collection.mutable
      .ArrayBuffer[(Int, Long, String, Int, Long)]()
    // per-set shingle state of the corpus as the mirror sees it, BEFORE
    // the current batch
    var mirror = Map.empty[String, Set[String]].withDefaultValue(Set.empty)
    val preBatch = scala.collection.mutable
      .ArrayBuffer[Map[String, Set[String]]]()
    var batchNo = 0
    val input = MemoryStream[IngestDoc](spark)
    try {
      Artifacts.setRoot(root.getAbsolutePath)
      spark.emptyDataset[IngestDoc].toDF()
        .write.mode("overwrite").parquet(docsPath)
      Tables.invalidate(corpus)
      val q = input.toDF().writeStream.outputMode("append")
        .foreachBatch { (bd: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          graft.Checkpoints.scoped {
            val batch = graft.Checkpoints.checkpoint(bd.toDF())
            preBatch += mirror
            ledger ++= StreamingOps.contaminationOfBatch(batch, spark, corpus)
              .collect().map(r => (batchNo, r.getAs[Long]("doc_id"),
                r.getAs[String]("set_id"), r.getAs[Int]("set_version"),
                r.getAs[Long]("n_eval_shingles")))
            batch.dropDuplicates("doc_id").write.mode("append").parquet(docsPath)
            Tables.invalidate(corpus)
            Artifacts.materialize(spark, corpus)
            batch.dropDuplicates("doc_id").collect().foreach { r =>
              val (id, t) = (r.getAs[Long]("doc_id"), r.getAs[String]("text"))
              setsOf(id).foreach { case (sid, _) =>
                mirror = mirror.updated(sid, mirror(sid) ++ sh8(t))
              }
            }
            batchNo += 1
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

    // batch 1 ran against an empty corpus: nothing to leak from
    assert(ledger.forall(_._1 == 1), s"batch-1 verdicts from nothing: $ledger")
    // local recompute: every batch-2 non-member doc × set with overlap
    val expected = (for {
      d <- batch2.distinct if setsOf(d.doc_id).isEmpty
      (sid, ver) <- EvalSets.Registry.map(s => (s.setId, s.version)).distinct
      shared = sh8(d.text).intersect(preBatch(1)(sid))
      if shared.nonEmpty
    } yield (d.doc_id, sid) -> (ver, shared.size.toLong)).toMap
    val got = ledger.map(l => (l._2, l._3) -> (l._4, l._5)).toMap
    assert(got.size == ledger.size, "duplicate verdict rows")
    assert(got.keySet == expected.keySet,
      s"verdict keys: got ${got.keySet}, expected ${expected.keySet}")
    expected.foreach { case (k, (ver, n)) =>
      assert(got(k) == ((ver, n)), s"$k: got ${got(k)}, expected ($ver, $n)")
    }
    // the headline behaviors, stated directly
    assert(got.contains((30L, "heldout_a")) && got.contains((30L, "heldout_c")),
      "leak of an overlapping member must flag BOTH overlapping sets")
    assert(got.contains((31L, "heldout_b")))
    assert(!got.keySet.exists(_._1 == 27L), "member arrivals are excluded")
    assert(!got.keySet.exists(_._1 == 32L), "clean doc flagged")
  }
}

package graft

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingOps

/** The intake near-dup gate (`StreamingOps.nearDupOfBatch`): per
  * micro-batch q50 verdicts (exact_dup / near_dup / new + smallest
  * matching corpus doc) against the PRE-BATCH standing corpus. Pinned
  * against a full local reimplementation of the verdict chain — md5
  * digests, PolyHash-based MinHash signatures (the same Random(42)
  * affine family), 4×4 band buckets, the ≤64 bucket cap, agreement
  * ≥ 0.5 — in plain Scala collections, so the gate and q50's shared
  * core are checked by an independent construction, not by themselves.
  * MemoryStream drives a real foreachBatch loop that appends +
  * re-materializes artifacts between batches, so batch 2 reads the
  * standing `doc_hashes`/`minhash_bands` artifacts, not the inline
  * fallback.
  */
class NearDupGateSpec extends SparkSpec {
  import spark.implicits._

  // ---- local mirror of the verdict chain (independent construction) ----

  private val Mod = graft.functions.PolyHash.Mod
  private val Coeffs: Seq[(Long, Long)] = {
    val rnd = new java.util.Random(42)
    Seq.fill(16)(
      (1L + rnd.nextInt(Int.MaxValue - 1), rnd.nextInt(Int.MaxValue).toLong))
  }

  private def polyHash(s: String): Long = {
    var h = 0L
    s.getBytes("UTF-8").foreach(b => h = (h * 31 + (b & 0xFF)) % Mod)
    h
  }

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def sigOf(text: String): Option[Vector[Long]] = {
    val toks = text.split("\\s+")
    if (toks.length < 3) None
    else {
      val shingles = toks.sliding(3).map(_.mkString(" ")).toSet
      Some(Coeffs.map { case (a, b) =>
        shingles.map(sh => (a * polyHash(sh) + b) % Mod).min
      }.toVector)
    }
  }

  private def bucketsOf(sig: Vector[Long]): Seq[(Int, String)] =
    (0 until 4).map(b => (b, sig.slice(b * 4, b * 4 + 4).mkString("_")))

  /** q50's verdict semantics over plain collections: exact by digest,
    * near by shared kept bucket + signature agreement ≥ 0.5, precedence
    * exact > near > new, match = smallest corpus id.
    */
  private def mirrorVerdicts(batch: Seq[IngestDoc], corpus: Map[Long, String])
      : Map[Long, (String, Option[Long])] = {
    val corpusSigs = corpus.toSeq.flatMap { case (id, t) =>
      sigOf(t).map(s => (id, s))
    }
    val kept = corpusSigs
      .flatMap { case (id, s) => bucketsOf(s).map(bk => (bk, (id, s))) }
      .groupBy(_._1).filter(_._2.size <= 64)
      .map { case (k, v) => (k, v.map(_._2)) }
    val byHash = corpus.groupBy { case (_, t) => md5hex(t) }
    // Intra-batch duplicate ids in fixtures MUST carry identical text:
    // this mirror dedups with toMap (last wins) while nearDupOfBatch
    // uses dropDuplicates (arbitrary winner) — the comparison is only
    // well-defined when the winners are content-equal.
    batch.groupBy(_.doc_id).values.foreach { ds =>
      assert(ds.map(_.text).distinct.size == 1,
        s"fixture defect: conflicting texts for intra-batch duplicate " +
          s"id ${ds.head.doc_id}")
    }
    batch.map(d => d.doc_id -> d).toMap.values.toSeq.map { d =>
      val exact = byHash.getOrElse(md5hex(d.text), Map.empty)
        .keys.toSeq.sorted.headOption
      val near = sigOf(d.text).toSeq.flatMap { s =>
        bucketsOf(s).flatMap(bk => kept.getOrElse(bk, Nil)).collect {
          case (cid, cs)
            if s.zip(cs).count { case (a, b) => a == b } / 16.0 >= 0.5 => cid
        }
      }.sorted.headOption
      d.doc_id -> (
        if (exact.nonEmpty) ("exact_dup", exact)
        else if (near.nonEmpty) ("near_dup", near)
        else ("new", None))
    }.toMap
  }

  test("per-batch near-dup verdicts = local recompute vs pre-batch corpus") {
    val root = Files.createTempDirectory("graft-neardup-root").toFile
    val corpus = Files.createTempDirectory("graft-neardup-corpus").toString + "/c"
    val docsPath = s"$corpus/documents.parquet"
    val textA = ("the quick brown fox jumps over the lazy dog while seven " +
      "wild geese circle slowly above the frozen northern lake at dawn")
    val textB = ("an entirely different passage about compilers lexers " +
      "parsers and the many intermediate representations a query engine " +
      "lowers its logical plans through before execution")
    val tiny = "tiny doc"
    val batch1 = Seq(
      IngestDoc(1L, textA, "s1"),
      IngestDoc(2L, textB, "s1"),
      IngestDoc(3L, tiny, "s1"))
    // 10 = exact re-crawl of 1 (delivered twice); 11 = textA with one
    // token changed (near-dup of 1); 12 = new; 14 = exact dup of the
    // sub-shingle-length doc 3 (digest path only — no signature exists)
    val batch2 = Seq(
      IngestDoc(10L, textA, "s2"),
      IngestDoc(11L, textA.replace("frozen", "melted"), "s2"),
      IngestDoc(12L, "completely novel words that never appeared in any " +
        "seeded document of this fixture corpus at all", "s2"),
      IngestDoc(14L, tiny, "s2"),
      IngestDoc(10L, textA, "s2"))
    val ledger = scala.collection.mutable
      .ArrayBuffer[(Int, Long, String, Option[Long])]()
    var mirror = Map.empty[Long, String] // pre-batch corpus text by id
    val preBatch = scala.collection.mutable.ArrayBuffer[Map[Long, String]]()
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
            ledger ++= StreamingOps.nearDupOfBatch(batch, spark, corpus)
              .collect().map(r => (batchNo, r.getAs[Long]("doc_id"),
                r.getAs[String]("verdict"),
                Option(r.getAs[java.lang.Long]("match_id")).map(_.longValue)))
            batch.dropDuplicates("doc_id").write.mode("append").parquet(docsPath)
            Tables.invalidate(corpus)
            Artifacts.materialize(spark, corpus)
            batch.dropDuplicates("doc_id").collect().foreach { r =>
              mirror = mirror.updated(
                r.getAs[Long]("doc_id"), r.getAs[String]("text"))
            }
            batchNo += 1
            ()
          }
        }.start()
      try {
        input.addData(batch1: _*)
        q.processAllAvailable()
        // batch 2 must read standing artifacts, not the inline fallback
        assert(Artifacts.isMaterialized(spark, corpus,
          Artifacts.MinhashBandsName), "minhash_bands not standing")
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

    // one verdict per distinct arriving doc (intra-batch repeat absorbed)
    val got = ledger.groupBy(l => (l._1, l._2))
    assert(got.forall(_._2.size == 1), s"duplicate verdict rows: $ledger")
    // every batch checked cell-for-cell against the independent mirror
    Seq(batch1, batch2).zipWithIndex.foreach { case (b, i) =>
      val expected = mirrorVerdicts(b, preBatch(i))
      val actual = ledger.filter(_._1 == i)
        .map(l => l._2 -> ((l._3, l._4))).toMap
      assert(actual.keySet == expected.keySet,
        s"batch $i ids: got ${actual.keySet}, expected ${expected.keySet}")
      expected.foreach { case (id, (v, m)) =>
        assert(actual(id) == ((v, m)),
          s"batch $i doc $id: got ${actual(id)}, expected ($v, $m)")
      }
    }
    // the headline behaviors, stated directly
    val b2 = ledger.filter(_._1 == 1).map(l => l._2 -> ((l._3, l._4))).toMap
    assert(ledger.filter(_._1 == 0).forall(_._3 == "new"),
      "batch 1 ran against an empty corpus")
    assert(b2(10L) == (("exact_dup", Some(1L))), s"re-crawl: ${b2(10L)}")
    assert(b2(11L) == (("near_dup", Some(1L))), s"one-token edit: ${b2(11L)}")
    assert(b2(12L)._1 == "new", s"novel doc: ${b2(12L)}")
    assert(b2(14L) == (("exact_dup", Some(3L))),
      s"sub-shingle-length exact dup rides the digest path: ${b2(14L)}")
  }
}

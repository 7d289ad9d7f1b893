package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** The streaming intake journey, end-to-end: a crawl stream is
  * content-hash deduped (bounded state via watermark), quality-gated, and
  * landed through the idempotent keyed upsert sink — composing
  * `dedupStream`, the q24-style signal expressions, and `upsertSink`
  * exactly as a continuous corpus-ingest job would. Asserts the landed
  * corpus is exactly-once per content hash across re-deliveries.
  */
case class RawDoc(doc_id: Long, ts: Timestamp, text: String)

class StreamingIntakeSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")

  test("crawl stream lands deduped, quality-gated, exactly once") {
    val input = MemoryStream[RawDoc](spark)
    val out = Files.createTempDirectory("intake").toString + "/corpus"
    val ckpt = Files.createTempDirectory("intake_ck").toString

    val stream = input.toDF()
      .withColumn("content_hash", md5(col("text")))
    val deduped = StreamingOps.dedupStream(stream, "content_hash")
    val curated = deduped
      .filter(size(split(col("text"), "\\s+")) >= 5)
    val q = StreamingOps.upsertSink(curated, spark, out,
      keys = Seq("content_hash"), versionCols = Seq("ts", "doc_id"),
      checkpoint = Some(ckpt))
    try {
      val good = "a clean document with enough tokens"
      val junk = "too short"
      input.addData(
        RawDoc(1, t(1), good),
        RawDoc(2, t(2), good), // in-batch duplicate content
        RawDoc(3, t(3), junk)) // fails the quality gate
      q.processAllAvailable()
      // re-delivery of the same content + one genuinely new doc
      input.addData(
        RawDoc(4, t(4), good),
        RawDoc(5, t(5), "another clean document with enough tokens"))
      q.processAllAvailable()
    } finally q.stop()

    val landed = spark.read.parquet(out)
    assert(landed.count() == 2, "one row per distinct clean content")
    assert(landed.select("content_hash").distinct().count() == 2)
    // an arrival from the FIRST batch won the dedup, not the later
    // re-delivery (doc 4). Within one micro-batch the survivor between
    // docs 1 and 2 is not contractual — dropDuplicatesWithinWatermark
    // keeps whichever row reaches the state store first — so both are
    // acceptable winners.
    val winner = landed.filter(col("text") === "a clean document with enough tokens")
      .select("doc_id").as[Long].head()
    assert(Set(1L, 2L).contains(winner), s"re-delivery $winner won the dedup")
    assert(landed.filter(col("text") === "too short").isEmpty)
  }

  test("streaming decontamination quarantines eval-overlapping docs at intake") {
    val input = MemoryStream[RawDoc](spark)
    // the "benchmark" is one sentence; its 8-gram shingles are the static
    // side of the stream-static semi-join
    val evalText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val evalShingles = Seq(evalText).toDF("text")
      .select(explode(graft.operators.CorpusOps.shinglesN(
        split(col("text"), "\\s+"), 8)).as("sh"))
    val flagged = StreamingOps.decontaminateStream(
      input.toDF(), "doc_id", "text", evalShingles)
    val q = flagged.writeStream
      .format("memory").queryName("quarantine")
      .outputMode("append").start()
    try {
      input.addData(
        // contains tokens 2..9 of the eval sentence = one shared 8-gram
        RawDoc(1, t(1), "prefix beta gamma delta epsilon zeta eta theta iota suffix"),
        // shares vocabulary but never 8 contiguous tokens
        RawDoc(2, t(2), "beta alpha delta gamma zeta epsilon theta eta kappa iota"),
        // disjoint
        RawDoc(3, t(3), "totally unrelated text with enough tokens to shingle fine"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("quarantine")
    assert(got.select("doc_id").distinct().as[Long].collect().toSet == Set(1L))
    // evidence rows carry the matching shingle itself
    assert(got.select("sh").as[String].collect()
      .forall(_ == "beta gamma delta epsilon zeta eta theta iota"))
  }
}

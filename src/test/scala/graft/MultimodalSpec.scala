package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** The real media codecs: committed binary fixtures decode to
  * hand-computed statistics, corrupt containers route with reasons
  * (never throw), encode/decode round-trips, and the q28/q161 query
  * outputs reconcile with local byte-level recomputes.
  */
class MultimodalSpec extends SparkSpec {

  private val mediaDir = new java.io.File("fixtures/media").getAbsolutePath

  private def readAll(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(
      new java.io.File(mediaDir, name).toPath)

  test("P6 fixture with comment decodes to hand-computed channel stats") {
    val bytes = readAll("ok_2x2.ppm")
    val s = Multimodal.Ppm.decode(bytes).toOption.get
    assert(s.width == 2 && s.height == 2 && s.maxval == 255)
    assert(s.nPixels == 4 && s.nBytes == bytes.length.toLong)
    // R: 10,40,70,200  G: 20,50,80,150  B: 30,60,90,255
    assert(s.sums.toSeq == Seq(320L, 300L, 435L))
    assert(s.mins.toSeq == Seq(10, 20, 30))
    assert(s.maxs.toSeq == Seq(200, 150, 255))
  }

  test("corrupt PPM containers route with reasons, never throw") {
    assert(Multimodal.Ppm.decode(readAll("bad_magic.ppm")) ==
      Left("bad_magic"))
    val t = Multimodal.Ppm.decode(readAll("truncated.ppm"))
    assert(t.isLeft && t.swap.toOption.get.startsWith("truncated_plane"))
    assert(Multimodal.Ppm.decode(Array.empty[Byte]) == Left("bad_magic"))
    assert(Multimodal.Ppm.decode("P6\n0 2\n255\n".getBytes("US-ASCII")) ==
      Left("bad_dimensions"))
    assert(Multimodal.Ppm.decode("P6\n2 2\n999\n".getBytes("US-ASCII")) ==
      Left("unsupported_maxval"))
  }

  test("routed decode over a media frame splits features from rejects") {
    import spark.implicits._
    val media = Seq(
      (1L, readAll("ok_2x2.ppm")),
      (2L, readAll("bad_magic.ppm")),
      (3L, readAll("truncated.ppm"))).toDF("doc_id", "media")
    val (good, bad) = Multimodal.decodePpmRouted(media)
    val g = good.collect()
    assert(g.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    assert(g.head.getAs[Long]("sum_b") == 435L)
    val rejects = bad.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("reject_reason")).toMap
    assert(rejects.keySet == Set(2L, 3L))
    assert(rejects(2L) == "bad_magic")
    assert(rejects(3L).startsWith("truncated_plane"))
  }

  test("stereo WAV fixture decodes: fmt parsed, LIST chunk skipped, per-channel stats") {
    val s = Multimodal.Wav.decode(readAll("tone.wav")).toOption.get
    assert(s.channels == 2 && s.sampleRate == 8000 && s.bitsPerSample == 16)
    assert(s.nFrames == 4L)
    // L: 1000, -32768, 0, 123   R: -1000, 32767, 5, -456
    assert(s.sums.toSeq == Seq(-31645L, 31316L))
    assert(s.peaks.toSeq == Seq(32768, 32767))
  }

  test("corrupt WAV containers route with reasons") {
    val bad = Multimodal.Wav.decode(readAll("bad.wav"))
    assert(bad.isLeft && bad.swap.toOption.get.startsWith("truncated_chunk"))
    assert(Multimodal.Wav.decode("RIFX".getBytes("US-ASCII")) ==
      Left("bad_riff_header"))
  }

  test("PPM and WAV encode/decode round-trip, odd tails and sign edges included") {
    // PPM: payload shorter than one row — zero padding visible in stats
    val p = Array[Byte](7, 8)
    val ps = Multimodal.Ppm.decode(Multimodal.Ppm.encode(p, 3)).toOption.get
    assert(ps.width == 3 && ps.height == 1 && ps.nPixels == 3)
    assert(ps.sums.toSeq == Seq(7L, 8L, 0L))
    assert(ps.mins.toSeq == Seq(0, 0, 0) && ps.maxs.toSeq == Seq(7, 8, 0))
    // empty payload: one all-padding pixel row
    val es = Multimodal.Ppm.decode(
      Multimodal.Ppm.encode(Array.empty[Byte], 4)).toOption.get
    assert(es.height == 1 && es.sums.toSeq == Seq(0L, 0L, 0L))
    // WAV: bytes (0x00, 0x80) = -32768; odd tail pads high byte with 0
    val w = Multimodal.Wav.decode(Multimodal.Wav.encode(
      Array[Byte](0x00, 0x80.toByte, 0x61), 9000)).toOption.get
    assert(w.channels == 1 && w.sampleRate == 9000 && w.nFrames == 2L)
    assert(w.sums.toSeq == Seq(-32768L + 0x61))
    assert(w.peaks.toSeq == Seq(32768))
  }

  test("q28 features reconcile with a local byte-level recompute") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[Long]("n_chars"))).toMap
    val out = Multimodal.q28MultimodalFeatures(spark, sf).collect()
    assert(out.length == docs.size)
    out.take(100).foreach { r =>
      val (text, nChars) = docs(r.getAs[Long]("doc_id"))
      val payload = Option(text).getOrElse("").getBytes("UTF-8")
      val width = (nChars % 24 + 8).toInt
      val height = ((math.max(payload.length, 1) + 3 * width - 1)
        / (3 * width))
      assert(r.getAs[Int]("width") == width)
      assert(r.getAs[Int]("height") == height)
      val plane = payload ++
        Array.fill(3 * width * height - payload.length)(0.toByte)
      val rSum = plane.indices.filter(_ % 3 == 0).map(plane(_) & 0xFF).sum
      assert(math.abs(r.getAs[Double]("mean_r") -
        rSum.toDouble / (width * height)) < 1e-6)
      assert(r.getAs[Int]("max_b") ==
        plane.indices.filter(_ % 3 == 2).map(plane(_) & 0xFF).max)
    }
  }

  test("q161 stats reconcile with a local PCM recompute") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[Long]("n_chars"))).toMap
    val out = Multimodal.q161WavStats(spark, sf).collect()
    assert(out.length == docs.size)
    out.take(100).foreach { r =>
      val (text, nChars) = docs(r.getAs[Long]("doc_id"))
      val b = Option(text).getOrElse("").getBytes("UTF-8")
      val padded = if (b.length % 2 == 0) b else b :+ 0.toByte
      val samples = padded.grouped(2).map { p =>
        val v = (p(0) & 0xFF) | ((p(1) & 0xFF) << 8)
        if (v >= 0x8000) v - 0x10000 else v
      }.toSeq
      val rate = (8000 + (nChars % 8) * 1000).toInt
      assert(r.getAs[Int]("sample_rate") == rate)
      assert(r.getAs[Long]("n_frames") == samples.length.toLong)
      assert(r.getAs[Long]("duration_ms") ==
        samples.length.toLong * 1000 / rate)
      assert(r.getAs[Int]("peak_amp") ==
        (if (samples.isEmpty) 0 else samples.map(math.abs).max))
      if (samples.nonEmpty)
        assert(math.abs(r.getAs[Double]("mean_amp") -
          samples.map(_.toLong).sum.toDouble / samples.length) < 1e-6)
    }
  }
}

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

  // ---- resize grid (q162) ---------------------------------------------------

  test("decodeGrid on the 2x2 fixture: identity grid, hand-computed cells") {
    // 2x2 source under a 4-grid clamps to gx=gy=2 — each pixel its own
    // cell, sum = its three channel bytes
    val g = Multimodal.Ppm.decodeGrid(readAll("ok_2x2.ppm"), 4).toOption.get
    assert(g.width == 2 && g.height == 2 && g.gx == 2 && g.gy == 2)
    // pixels: (10,20,30) (40,50,60) / (70,80,90) (200,150,255)
    assert(g.sums.toSeq == Seq(60L, 150L, 240L, 605L))
    assert(g.cnts.toSeq == Seq(1L, 1L, 1L, 1L))
  }

  test("decodeGrid block assignment matches an independent local recompute") {
    // 8x2 image (48 payload bytes, values 1..48): gx=4, gy=2 — 2-pixel
    // blocks; recompute the box-filter assignment from scratch
    val payload = Array.tabulate(48)(i => (i + 1).toByte)
    val g = Multimodal.Ppm.decodeGrid(
      Multimodal.Ppm.encode(payload, 8), 4).toOption.get
    assert(g.width == 8 && g.height == 2 && g.gx == 4 && g.gy == 2)
    val sums = new Array[Long](8)
    val cnts = new Array[Long](8)
    for (p <- 0 until 16) {
      val cell = ((p / 8) * 2 / 2) * 4 + (p % 8) * 4 / 8
      sums(cell) += (0 until 3).map(c => payload(3 * p + c) & 0xFF).sum
      cnts(cell) += 1
    }
    assert(g.sums.toSeq == sums.toSeq && g.cnts.toSeq == cnts.toSeq)
    // padding rows are still pixels: 2-byte payload at width 3 → one
    // row, three 1-pixel cells, zeros visible in the sums
    val pad = Multimodal.Ppm.decodeGrid(
      Multimodal.Ppm.encode(Array[Byte](7, 8), 3), 4).toOption.get
    assert(pad.gx == 3 && pad.gy == 1)
    assert(pad.sums.toSeq == Seq(15L, 0L, 0L))
  }

  test("resizeGridRouted splits grids from rejects with decode's reasons") {
    import spark.implicits._
    val media = Seq(
      (1L, readAll("ok_2x2.ppm")),
      (2L, readAll("bad_magic.ppm")),
      (3L, readAll("truncated.ppm"))).toDF("doc_id", "media")
    val (good, bad) = Multimodal.resizeGridRouted(media, 4)
    val g = good.collect()
    assert(g.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    assert(g.head.getAs[scala.collection.Seq[Long]]("sums").toSeq ==
      Seq(60L, 150L, 240L, 605L))
    val rejects = bad.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("reject_reason")).toMap
    assert(rejects(2L) == "bad_magic")
    assert(rejects(3L).startsWith("truncated_plane"))
  }

  test("q162 grids reconcile with a local box-filter recompute") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[Long]("n_chars"))).toMap
    val byDoc = Multimodal.q162ImageResize(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == docs.keySet)
    byDoc.toSeq.sortBy(_._1).take(50).foreach { case (id, rows) =>
      val (text, nChars) = docs(id)
      val payload = Option(text).getOrElse("").getBytes("UTF-8")
      val w = (nChars % 24 + 8).toInt
      val h = ((math.max(payload.length, 1) + 3 * w - 1) / (3 * w))
      val gx = math.min(4, w)
      val gy = math.min(4, h)
      val sums = new Array[Long](gx * gy)
      val cnts = new Array[Long](gx * gy)
      for (p <- 0 until w * h) {
        val cell = ((p / w) * gy / h) * gx + (p % w) * gx / w
        sums(cell) += (0 until 3).map { c =>
          val i = 3 * p + c
          if (i < payload.length) payload(i) & 0xFF else 0
        }.sum
        cnts(cell) += 1
      }
      assert(rows.length == gx * gy)
      rows.foreach { r =>
        val cell = r.getAs[Int]("cell_y") * gx + r.getAs[Int]("cell_x")
        assert(r.getAs[Long]("px_sum") == sums(cell))
        assert(r.getAs[Long]("n_px") == cnts(cell))
        assert(math.abs(r.getAs[Double]("mean_val") -
          sums(cell).toDouble / (3 * cnts(cell))) < 1e-6)
      }
    }
  }

  // ---- perceptual-hash dedup (q163) -----------------------------------------

  test("q163 groups equal a full local aHash mirror") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
    // mirror: grid → integer-exact bits vs the global mean → fingerprint
    val fps = docs.map { r =>
      val payload = Option(r.getAs[String]("text")).getOrElse("")
        .getBytes("UTF-8")
      val w = (r.getAs[Long]("n_chars") % 24 + 8).toInt
      val g = Multimodal.Ppm.decodeGrid(
        Multimodal.Ppm.encode(payload, w), 4).toOption.get
      val sTot = g.sums.sum
      val nTot = g.cnts.sum
      val fp = g.sums.indices.map { i =>
        if (g.sums(i) * nTot >= sTot * g.cnts(i)) 1L << i else 0L
      }.sum
      (r.getAs[Long]("doc_id"), g.gy, fp)
    }
    val expected = fps.groupBy(t => (t._2, t._3))
      .filter(_._2.length >= 2)
      .map { case ((gy, fp), ms) =>
        (gy, fp) -> ms.map(_._1).sorted.mkString(",")
      }
    val out = Multimodal.q163ImagePhashDups(spark, sf).collect()
      .map(r => (r.getAs[Int]("grid_rows"), r.getAs[Long]("fingerprint")) ->
        r.getAs[String]("doc_ids")).toMap
    assert(out == expected)
    assert(out.nonEmpty, "fixture corpus should contain dup images")
  }

  // ---- audio frame windows (q164) -------------------------------------------

  test("windowedStats slices hand-checkable windows; stereo routes") {
    assert(Multimodal.Wav.windowedStats(readAll("tone.wav"), 3, 4) ==
      Left("not_mono:2"))
    // 300-byte payload → 150 frames; stride max((150-64)/3,1)=28
    val payload = Array.tabulate(300)(i => (i % 251).toByte)
    val container = Multimodal.Wav.encode(payload, 8000)
    val ws = Multimodal.Wav.windowedStats(container, 3, 64).toOption.get
    assert(ws.map(_.startFrame) == Seq(0L, 28L, 56L))
    assert(ws.forall(_.nSamples == 64L))
    val samples = payload.grouped(2).map { p =>
      val v = (p(0) & 0xFF) | ((p(1) & 0xFF) << 8)
      if (v >= 0x8000) v - 0x10000 else v
    }.toArray
    ws.foreach { w =>
      val slice = samples.slice(w.startFrame.toInt,
        w.startFrame.toInt + w.nSamples.toInt)
      assert(w.ampSum == slice.map(_.toLong).sum)
      assert(w.peak == slice.map(math.abs).max)
    }
    // 1-frame take: stride clamps to 1, windows past the end drop
    val tiny = Multimodal.Wav.windowedStats(
      Multimodal.Wav.encode(Array[Byte](1, 2), 8000), 3, 64).toOption.get
    assert(tiny.map(w => (w.idx, w.startFrame, w.nSamples)) ==
      Seq((0, 0L, 1L)))
    // zero-frame take: no windows
    assert(Multimodal.Wav.windowedStats(
      Multimodal.Wav.encode(Array.empty[Byte], 8000), 3, 64)
      .toOption.get.isEmpty)
  }

  test("q164 windows reconcile with a local recompute") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text")).toMap
    val byDoc = Multimodal.q164AudioFrames(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    byDoc.toSeq.sortBy(_._1).take(50).foreach { case (id, rows) =>
      val b = Option(docs(id)).getOrElse("").getBytes("UTF-8")
      val padded = if (b.length % 2 == 0) b else b :+ 0.toByte
      val samples = padded.grouped(2).map { p =>
        val v = (p(0) & 0xFF) | ((p(1) & 0xFF) << 8)
        if (v >= 0x8000) v - 0x10000 else v
      }.toArray
      val n = samples.length
      val step = math.max(math.max(n - 64, 0) / 3, 1)
      val expected = (0 until 3).flatMap { k =>
        val start = k * step
        if (start >= n) None
        else {
          val slice = samples.slice(start, math.min(start + 64, n))
          Some((k, start.toLong, slice.length.toLong,
            slice.map(_.toLong).sum, slice.map(math.abs).max))
        }
      }
      assert(rows.map(r => (r.getAs[Int]("window_idx"),
        r.getAs[Long]("start_frame"), r.getAs[Long]("n_samples"),
        r.getAs[Long]("amp_sum"), r.getAs[Int]("peak_amp"))).toSeq
        .sortBy(_._1) == expected)
    }
    // zero-frame docs emit no windows; everything else emits ≥ 1
    val emptyDocs = docs.filter { case (_, t) =>
      Option(t).getOrElse("").isEmpty }.keySet
    assert(byDoc.keySet == docs.keySet -- emptyDocs)
  }

  /** Local aHash mirror shared by the q163/q165/q167 tests:
    * (doc_id, gy, fingerprint, grid).
    */
  private def localFingerprints(): Seq[(Long, Int, Long, Multimodal.PpmGrid)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "n_chars").collect().toSeq
      .map { r =>
        val payload = Option(r.getAs[String]("text")).getOrElse("")
          .getBytes("UTF-8")
        val w = (r.getAs[Long]("n_chars") % 24 + 8).toInt
        val g = Multimodal.Ppm.decodeGrid(
          Multimodal.Ppm.encode(payload, w), 4).toOption.get
        val sTot = g.sums.sum
        val nTot = g.cnts.sum
        val fp = g.sums.indices.map { i =>
          if (g.sums(i) * nTot >= sTot * g.cnts(i)) 1L << i else 0L
        }.sum
        (r.getAs[Long]("doc_id"), g.gy, fp, g)
      }

  // ---- banded Hamming pairs (q165) ------------------------------------------

  test("q165 equals a brute-force Hamming sweep over distinct fingerprints") {
    val grp = localFingerprints().groupBy(t => (t._2, t._3))
      .map { case ((gy, fp), ms) => (gy, fp, ms.length.toLong) }.toSeq
    val expected = (for {
      a <- grp; b <- grp
      if a._1 == b._1 && a._2 < b._2
      h = java.lang.Long.bitCount(a._2 ^ b._2)
      if h <= 3
    } yield (a._1, a._2, b._2) -> (h, a._3, b._3)).toMap
    val out = Multimodal.q165ImageHammingPairs(spark, sf).collect()
      .map(r => (r.getAs[Int]("grid_rows"), r.getAs[Long]("fp_a"),
        r.getAs[Long]("fp_b")) -> (r.getAs[Int]("hamming"),
        r.getAs[Long]("n_docs_a"), r.getAs[Long]("n_docs_b"))).toMap
    // brute force IS the recall oracle: the 4-band bucket join must
    // surface every pair at Hamming ≤ 3 (pigeonhole), nothing else
    assert(out == expected)
  }

  // ---- audio quality screen (q166) ------------------------------------------

  test("q166 flags clipping and silence from the sampled windows; every doc verdicts") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
    val out = Multimodal.q166AudioQualityScreen(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == docs.map(_.getAs[Long]("doc_id")).toSet)
    docs.foreach { d =>
      val id = d.getAs[Long]("doc_id")
      val b = Option(d.getAs[String]("text")).getOrElse("").getBytes("UTF-8")
      val rate = (8000 + (d.getAs[Long]("n_chars") % 8) * 1000).toInt
      val ws = Multimodal.Wav.windowedStats(
        Multimodal.Wav.encode(b, rate), 3, 64).toOption.get
      val r = out(id)
      assert(r.getAs[Long]("n_windows") == ws.length.toLong)
      assert(r.getAs[Long]("n_samples") == ws.map(_.nSamples).sum)
      assert(r.getAs[Long]("abs_sum") == ws.map(_.absSum).sum)
      val peak = if (ws.isEmpty) 0 else ws.map(_.peak).max
      assert(r.getAs[Int]("peak_amp") == peak)
      val silent = ws.isEmpty ||
        ws.map(_.absSum).sum < 328L * ws.map(_.nSamples).sum
      assert(r.getAs[Boolean]("clipped") == (peak >= 32767))
      assert(r.getAs[Boolean]("silent") == silent)
      assert(r.getAs[Boolean]("keep") == (!(peak >= 32767) && !silent))
    }
    // the corpus text-as-PCM derivation: ASCII bytes are quiet enough
    // that neither flag is vacuous only if at least one side occurs;
    // zero-frame (empty/null text) docs must be silent
    out.values.filter(_.getAs[Long]("n_windows") == 0L)
      .foreach(r => assert(r.getAs[Boolean]("silent")))
  }

  // ---- image kNN (q167) -----------------------------------------------------

  test("q167 ranks mirror a local cosine recompute over grid embeddings") {
    val vecs = localFingerprints().filter(_._2 == 4)
      .map { case (id, _, _, g) =>
        id -> g.sums.indices.map(i =>
          g.sums(i).toDouble / (3.0 * g.cnts(i))).toArray
      }
    assert(vecs.size > Multimodal.ImageKnnProbes,
      "fixture corpus needs full-grid images")
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.indices.foldLeft(0.0)((acc, i) => acc + x(i) * y(i))
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val probes = vecs.map(_._1).sorted.reverse.take(Multimodal.ImageKnnProbes)
    val expected = probes.flatMap { p =>
      val pv = vecs.find(_._1 == p).get._2
      vecs.filter(_._1 != p)
        .map { case (id, v) => (id, round6(cos(pv, v))) }
        .sortBy { case (id, c) => (-c, id) }
        .take(Multimodal.ImageTopK).zipWithIndex
        .map { case ((id, c), i) => (p, i + 1, id, c) }
    }.sortBy(t => (t._1, t._2))
    val out = Multimodal.q167ImageKnn(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos"))).toSeq
    assert(out.map(t => (t._1, t._2, t._3)) ==
      expected.map(t => (t._1, t._2, t._3)))
    out.zip(expected).foreach { case (o, e) =>
      assert(math.abs(o._4 - e._4) < 1e-9) }
  }

  // ---- multimodal ledger (q168) ---------------------------------------------

  test("q168 composes the three modality gates; culled copies name their keeper") {
    val fps = localFingerprints()
    val keeper = fps.groupBy(t => (t._2, t._3))
      .flatMap { case (_, ms) =>
        val k = ms.map(_._1).min; ms.map(m => m._1 -> k) }
    val aud = Multimodal.q166AudioQualityScreen(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    val txt = graft.operators.TextAnalysis
      .q83QualityClassifier(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("quality_label") == "keep")).toMap
    val out = Multimodal.q168MultimodalLedger(spark, sf).collect()
    assert(out.length == fps.length, "one ledger row per document")
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("image_match") == keeper(id))
      assert(r.getAs[Boolean]("image_keeper") == (keeper(id) == id))
      assert(r.getAs[Boolean]("text_keep") == txt(id))
      assert(r.getAs[Boolean]("audio_keep") == aud(id))
      assert(r.getAs[Boolean]("ship") ==
        (txt(id) && aud(id) && keeper(id) == id))
    }
    // the image gate must actually bite: dup groups exist in the fixture
    assert(out.exists(!_.getAs[Boolean]("image_keeper")))
  }

  // ---- source image dup burden (q169) ----------------------------------------

  test("q169 source rollup reconciles with the fingerprint groups") {
    val fps = localFingerprints()
    val sizes = fps.groupBy(t => (t._2, t._3)).view.mapValues(_.length).toMap
    val srcOf = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    val expected = fps.groupBy(t => srcOf(t._1)).map { case (src, ms) =>
      src -> (ms.length.toLong,
        ms.count(m => sizes((m._2, m._3)) >= 2).toLong)
    }
    val out = Multimodal.q169SourceImageDups(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_images"), r.getAs[Long]("n_dup_images"))).toMap
    assert(out == expected)
    out.foreach { case (src, (n, d)) =>
      assert(d <= n, s"source $src dup count exceeds image count") }
  }

  // ---- multimodal intake gate -------------------------------------------------

  test("imageDupOfBatch verdicts arriving media against the standing corpus") {
    import spark.implicits._
    val corpus = localFingerprints().map(t => (t._2, t._3, t._1))
    // arriving batch: two exact re-crawls of corpus texts under NEW ids,
    // a novel text, and an at-least-once repeat of one row
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").filter(col("text").isNotNull)
      .orderBy("doc_id").limit(2).collect()
    val batch = Seq(
      (900001L, docs(0).getAs[String]("text")),
      (900002L, docs(1).getAs[String]("text")),
      (900003L, "an entirely new page with text the corpus never saw x9z"),
      (900001L, docs(0).getAs[String]("text"))).toDF("doc_id", "text")
    val out = graft.streaming.StreamingOps
      .imageDupOfBatch(batch, spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("verdict"),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out.size == 3, "doc-grain dedup absorbs the repeat")
    // mirror: exact = identical (gy, fp); near = Hamming 1..3
    def verdictOf(text: String): (String, Option[Long]) = {
      val payload = text.getBytes("UTF-8")
      val w = (text.length % 24 + 8)
      val g = Multimodal.Ppm.decodeGrid(
        Multimodal.Ppm.encode(payload, w), 4).toOption.get
      val sTot = g.sums.sum; val nTot = g.cnts.sum
      val fp = g.sums.indices.map(i =>
        if (g.sums(i) * nTot >= sTot * g.cnts(i)) 1L << i else 0L).sum
      val exact = corpus.filter(c => c._1 == g.gy && c._2 == fp).map(_._3)
      val near = corpus.filter(c => c._1 == g.gy &&
        (1 to 3).contains(java.lang.Long.bitCount(c._2 ^ fp))).map(_._3)
      if (exact.nonEmpty) ("exact_phash", Some(exact.min))
      else if (near.nonEmpty) ("near_phash", Some(near.min))
      else ("new", None)
    }
    assert(out(900001L) == verdictOf(docs(0).getAs[String]("text")))
    assert(out(900002L) == verdictOf(docs(1).getAs[String]("text")))
    assert(out(900003L) ==
      verdictOf("an entirely new page with text the corpus never saw x9z"))
    assert(out(900001L)._1 == "exact_phash", "a re-crawl must be caught")
  }

  /** Local video-signature mirror (doc_id, n_frames, fingerprint) —
    * the q172 arithmetic at document grain, for the gate tests.
    */
  private def localVideoSignatures(): Seq[(Long, Long, Long)] = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
    docs.map { r =>
      val (nf, fp) = localVideoSigOf(
        Option(r.getAs[String]("text")).getOrElse(""),
        r.getAs[Long]("n_chars"))
      (r.getAs[Long]("doc_id"), nf, fp)
    }.toSeq
  }

  private def localVideoSigOf(text: String, nChars: Long): (Long, Long) = {
    val b = text.getBytes("UTF-8")
    val w = (nChars % 16 + 8).toInt
    val fs = 6 * w
    val nf = (math.max(b.length, 1) + fs - 1) / fs
    val step = math.max(nf / 3, 1)
    val fp = (0 until 3).flatMap { i =>
      val f = i * step
      if (f >= nf) None
      else {
        val sum = (f * fs until (f + 1) * fs)
          .map(p => if (p < b.length) (b(p) & 0xFF).toLong else 0L).sum
        Some(math.min(sum * 16 / (255L * fs), 15L) << (4 * i))
      }
    }.sum
    (nf.toLong, fp)
  }

  test("videoDupOfBatch verdicts arriving takes against the standing signatures") {
    import spark.implicits._
    val corpus = localVideoSignatures()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").filter(col("text").isNotNull)
      .orderBy("doc_id").limit(2).collect()
    val novel = "an entirely new take the corpus never filmed q7y"
    val batch = Seq(
      (900001L, docs(0).getAs[String]("text")),
      (900002L, docs(1).getAs[String]("text")),
      (900003L, novel),
      (900001L, docs(0).getAs[String]("text"))).toDF("doc_id", "text")
    val out = graft.streaming.StreamingOps
      .videoDupOfBatch(batch, spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("verdict"),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out.size == 3, "doc-grain dedup absorbs the repeat")
    // mirror: exact = identical (n_frames, fp); near = Hamming 1..3
    // within the length class. The gate derives n_chars from the
    // arriving text itself (no stats column at the door).
    def verdictOf(text: String): (String, Option[Long]) = {
      val (nf, fp) = localVideoSigOf(text, text.length.toLong)
      val exact = corpus.filter(c => c._2 == nf && c._3 == fp).map(_._1)
      val near = corpus.filter(c => c._2 == nf &&
        (1 to 3).contains(java.lang.Long.bitCount(c._3 ^ fp))).map(_._1)
      if (exact.nonEmpty) ("exact_sig", Some(exact.min))
      else if (near.nonEmpty) ("near_sig", Some(near.min))
      else ("new", None)
    }
    assert(out(900001L) == verdictOf(docs(0).getAs[String]("text")))
    assert(out(900002L) == verdictOf(docs(1).getAs[String]("text")))
    assert(out(900003L) == verdictOf(novel))
    assert(out(900001L)._1 == "exact_sig", "a re-delivered take must be caught")
  }

  test("audioDupOfBatch verdicts arriving takes against the standing signatures") {
    import spark.implicits._
    val corpus = localAudioSignatures()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").filter(col("text").isNotNull)
      .orderBy("doc_id").limit(2).collect()
    val novel = "an entirely new recording the corpus never heard k3w"
    val batch = Seq(
      (900001L, docs(0).getAs[String]("text")),
      (900002L, docs(1).getAs[String]("text")),
      (900003L, novel),
      (900001L, docs(0).getAs[String]("text"))).toDF("doc_id", "text")
    val out = graft.streaming.StreamingOps
      .audioDupOfBatch(batch, spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("verdict"),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out.size == 3, "doc-grain dedup absorbs the repeat")
    def verdictOf(text: String): (String, Option[Long]) = {
      val b = text.getBytes("UTF-8")
      val rate = (8000 + (text.length % 8) * 1000)
      val n = (b.length + 1L) / 2
      val ws = Multimodal.Wav.windowedStats(
        Multimodal.Wav.encode(b, rate), 3, 64).toOption.get
      val fp = ws.map(w =>
        math.min(w.absSum * 16 / (32768L * w.nSamples), 15L)
          << (4 * w.idx)).sum
      val exact = corpus.filter(c => c._2 == n && c._3 == fp).map(_._1)
      val near = corpus.filter(c => c._2 == n &&
        (1 to 3).contains(java.lang.Long.bitCount(c._3 ^ fp))).map(_._1)
      if (exact.nonEmpty) ("exact_sig", Some(exact.min))
      else if (near.nonEmpty) ("near_sig", Some(near.min))
      else ("new", None)
    }
    assert(out(900001L) == verdictOf(docs(0).getAs[String]("text")))
    assert(out(900002L) == verdictOf(docs(1).getAs[String]("text")))
    assert(out(900003L) == verdictOf(novel))
    assert(out(900001L)._1 == "exact_sig",
      "a re-delivered recording must be caught")
  }

  // ---- Y4M video codec + q171 ---------------------------------------------------

  test("Y4M fixture parses: unknown header params skipped, frames counted, stats hand-computed") {
    val info = Multimodal.Y4m.parse(readAll("ok_2x2.y4m")).toOption.get
    assert(info.width == 2 && info.height == 2)
    assert(info.fpsNum == 24 && info.fpsDen == 1)
    assert(info.nFrames == 2)
    // frames: (10,20,30,40) and (200,0,255,5) — sample both (k=3,
    // stride max(2/3,1)=1, third sample past the end drops)
    val fs = Multimodal.Y4m.frameStats(readAll("ok_2x2.y4m"), 3).toOption.get
    assert(fs.map(f => (f.idx, f.frameNo, f.nPx, f.lumaSum,
      f.lumaMin, f.lumaMax)) ==
      Seq((0, 0, 4, 100L, 10, 40), (1, 1, 4, 460L, 0, 255)))
  }

  test("corrupt Y4M streams route with reasons") {
    assert(Multimodal.Y4m.parse(readAll("bad_magic.y4m")) ==
      Left("bad_magic"))
    val t = Multimodal.Y4m.parse(readAll("truncated.y4m"))
    assert(t == Left("truncated_frame:1"))
    assert(Multimodal.Y4m.parse(Array.empty[Byte]) ==
      Left("no_header_terminator"))
    assert(Multimodal.Y4m.parse("YUV4MPEG2 W2 F24:1\nFRAME\n"
      .getBytes("US-ASCII")) == Left("bad_dimensions"))
    assert(Multimodal.Y4m.parse("YUV4MPEG2 W2 H2 F24:1 Cmono\nFRAMX\n1234"
      .getBytes("US-ASCII")) == Left("bad_frame_marker:0"))
    // declared non-mono chroma routes — walking a C420 stream with the
    // one-plane frame size would misread chroma bytes as luma
    assert(Multimodal.Y4m.parse("YUV4MPEG2 W2 H2 F24:1 C420jpeg\n1234"
      .getBytes("US-ASCII")) == Left("unsupported_chroma:420jpeg"))
    // no C tag at all: the Y4M spec default is 4:2:0, so it routes too
    assert(Multimodal.Y4m.parse("YUV4MPEG2 W2 H2 F24:1\nFRAME\n1234"
      .getBytes("US-ASCII")) == Left("unsupported_chroma:420jpeg"))
    // declared W·H past Int.MaxValue wraps negative in Int arithmetic —
    // before the Long guard this walk re-read the same marker forever
    // (2·2147483645 ≡ -6); it must route, bounded, never hang or throw
    assert(Multimodal.Y4m.parse(
      "YUV4MPEG2 W2 H2147483645 F24:1 Cmono\nFRAME\n1234"
        .getBytes("US-ASCII")) == Left("frame_exceeds_stream"))
    // frameSize == Int.MaxValue passes the size guard but pos+frameSize
    // wraps Int inside the walk — the Long compare must route it as
    // truncated instead of indexing negative
    assert(Multimodal.Y4m.parse(
      "YUV4MPEG2 W2147483647 H1 F24:1 Cmono\nFRAME\n1234"
        .getBytes("US-ASCII")) == Left("truncated_frame:0"))
  }

  test("Y4M encode/decode round-trips with zero padding in the last frame") {
    // 5-byte payload at 2x2: 2 frames, last 3 bytes padding
    val payload = Array[Byte](1, 2, 3, 4, 5)
    val bytes = Multimodal.Y4m.encode(payload, 2, 2, 24)
    val info = Multimodal.Y4m.parse(bytes).toOption.get
    assert(info.nFrames == 2)
    val fs = Multimodal.Y4m.frameStats(bytes, 2).toOption.get
    assert(fs.map(f => (f.frameNo, f.lumaSum, f.lumaMin, f.lumaMax)) ==
      Seq((0, 10L, 1, 4), (1, 5L, 0, 5)))
    // empty payload: one all-zero frame
    val es = Multimodal.Y4m.frameStats(
      Multimodal.Y4m.encode(Array.empty[Byte], 3, 2, 24), 3).toOption.get
    assert(es.map(f => (f.frameNo, f.lumaSum, f.lumaMin, f.lumaMax)) ==
      Seq((0, 0L, 0, 0)))
  }

  test("q171 sampled frames reconcile with a local recompute") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[Long]("n_chars"))).toMap
    val byDoc = Multimodal.q171VideoFrames(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    // every doc emits ≥ 1 frame (empty payloads pad to one zero frame)
    assert(byDoc.keySet == docs.keySet)
    byDoc.toSeq.sortBy(_._1).take(50).foreach { case (id, rows) =>
      val (text, nChars) = docs(id)
      val b = Option(text).getOrElse("").getBytes("UTF-8")
      val w = (nChars % 16 + 8).toInt
      val fs = 6 * w
      val nf = ((math.max(b.length, 1) + fs - 1) / fs)
      val step = math.max(nf / 3, 1)
      val expected = (0 until 3).flatMap { i =>
        val f = i * step
        if (f >= nf) None
        else {
          val px = (f * fs until (f + 1) * fs)
            .map(p => if (p < b.length) b(p) & 0xFF else 0)
          Some((i, f, fs, px.map(_.toLong).sum, px.min, px.max))
        }
      }
      assert(rows.map(r => (r.getAs[Int]("frame_idx"),
        r.getAs[Int]("frame_no"), r.getAs[Int]("n_px"),
        r.getAs[Long]("luma_sum"), r.getAs[Int]("luma_min"),
        r.getAs[Int]("luma_max"))).toSeq.sortBy(_._1) == expected)
    }
  }

  // ---- video perceptual dedup (q172) ---------------------------------------------

  test("q172 groups equal a full local video-signature mirror") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
    val sigs = docs.map { r =>
      val b = Option(r.getAs[String]("text")).getOrElse("").getBytes("UTF-8")
      val w = (r.getAs[Long]("n_chars") % 16 + 8).toInt
      val fs = 6 * w
      val nf = (math.max(b.length, 1) + fs - 1) / fs
      val step = math.max(nf / 3, 1)
      val fp = (0 until 3).flatMap { i =>
        val f = i * step
        if (f >= nf) None
        else {
          val sum = (f * fs until (f + 1) * fs)
            .map(p => if (p < b.length) (b(p) & 0xFF).toLong else 0L).sum
          Some(math.min(sum * 16 / (255L * fs), 15L) << (4 * i))
        }
      }.sum
      (r.getAs[Long]("doc_id"), nf, fp)
    }
    val expected = sigs.groupBy(t => (t._2, t._3)).filter(_._2.length >= 2)
      .map { case ((nf, fp), ms) =>
        (nf, fp) -> ms.map(_._1).sorted.mkString(",") }
    val out = Multimodal.q172VideoPhashDups(spark, sf).collect()
      .map(r => (r.getAs[Int]("n_frames"), r.getAs[Long]("fingerprint")) ->
        r.getAs[String]("doc_ids")).toMap
    assert(out == expected)
    assert(out.nonEmpty, "fixture corpus should contain dup takes")
  }

  test("q175 trained image IVF: full recall table shape, deterministic, " +
      "and every approx hit is a real exact neighbor") {
    val out = Multimodal.q175ImageIvf(spark, sf).collect()
    assert(out.length == Multimodal.ImageKnnProbes)
    out.foreach { r =>
      assert(r.getAs[Long]("n_exact") == Multimodal.ImageTopK.toLong)
      val hit = r.getAs[Long]("n_hit")
      assert(hit >= 0 && hit <= Multimodal.ImageTopK,
        s"n_hit out of range: $hit")
      assert(r.getAs[Double]("recall") ==
        BigDecimal(hit.toDouble / Multimodal.ImageTopK)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(out.map(_.getAs[Long]("n_hit")).sum > 0,
      "the trained index should recover at least one exact neighbor")
    // deterministic end to end (sampled Lloyd is hash-seeded, not random)
    val again = Multimodal.q175ImageIvf(spark, sf).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
    Checkpoints.releaseAll()
  }

  test("q174 container bytes equal the REAL encoders' output lengths") {
    // the query is pure header arithmetic; this pins it to the actual
    // containers — every formula must equal the encoder's byte count
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "n_chars", "source").collect()
    val local = docs.flatMap { r =>
      val b = Option(r.getAs[String]("text")).getOrElse("").getBytes("UTF-8")
      val nc = r.getAs[Long]("n_chars")
      val src = r.getAs[String]("source")
      val wImg = (nc % 24 + 8).toInt
      val rate = (8000 + (nc % 8) * 1000).toInt
      val wVid = (nc % 16 + 8).toInt
      val img = Multimodal.Ppm.encode(b, wImg)
      val aud = Multimodal.Wav.encode(b, rate)
      val vid = Multimodal.Y4m.encode(b, wVid, 6, 24)
      val h = (math.max(b.length, 1) + 3L * wImg - 1) / (3L * wImg)
      val nf = (math.max(b.length, 1) + 6L * wVid - 1) / (6L * wVid)
      Seq(
        (src, "image", img.length.toLong, wImg.toLong * h),
        (src, "audio", aud.length.toLong, (b.length + 1L) / 2),
        (src, "video", vid.length.toLong, nf))
    }
    val expected = local.groupBy(t => (t._1, t._2)).map { case (k, ms) =>
      k -> (ms.length.toLong, ms.map(_._3).sum, ms.map(_._4).sum)
    }
    val out = Multimodal.q174MediaStorage(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("modality")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("container_bytes"),
          r.getAs[Long]("n_units"))).toMap
    assert(out == expected,
      "q174's header arithmetic drifted from the real containers")
  }

  test("decodeY4mRouted splits fixtures into features and routed rejects") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val mediaRows = Seq(
      Row(1L, readAll("ok_2x2.y4m")),
      Row(2L, readAll("bad_magic.y4m")),
      Row(3L, readAll("truncated.y4m")),
      Row(4L, "YUV4MPEG2 W2 H2 F24:1 C420\nxxxx".getBytes("US-ASCII")))
    val mediaDf = spark.createDataFrame(
      spark.sparkContext.parallelize(mediaRows),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("media", BinaryType))))
    val (good, bad) = Multimodal.decodeY4mRouted(mediaDf)
    val g = good.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Int]("width"), r.getAs[Int]("height"),
        r.getAs[Int]("fps_num"), r.getAs[Int]("fps_den"),
        r.getAs[Int]("n_frames"))).toMap
    assert(g == Map(1L -> ((2, 2, 24, 1, 2))))
    val b = bad.collect().map(r => r.getAs[Long]("doc_id") ->
      r.getAs[String]("reject_reason")).toMap
    assert(b == Map(2L -> "bad_magic", 3L -> "truncated_frame:1",
      4L -> "unsupported_chroma:420"))
  }

  test("audio intake gate agrees with q166 per document; repeats absorbed") {
    val audit = Multimodal.q166AudioQualityScreen(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.toString).toMap
    val batch = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").limit(40)
    val out = graft.streaming.StreamingOps
      .audioQualityOfBatch(batch.union(batch.limit(5)))
      .collect()
    assert(out.length == 40, "doc-grain dedup absorbs the repeat")
    out.foreach { r =>
      assert(r.toString == audit(r.getAs[Long]("doc_id")),
        s"gate and q166 disagree on doc ${r.getAs[Long]("doc_id")}")
    }
  }

  /** Local audio-signature mirror shared by the q176/q177 tests:
    * (doc_id, n_frames, fingerprint) via the REAL windowed decoder.
    */
  private def localAudioSignatures(): Seq[(Long, Long, Long)] = {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
    docs.flatMap { r =>
      val b = Option(r.getAs[String]("text")).getOrElse("").getBytes("UTF-8")
      val rate = (8000 + (r.getAs[Long]("n_chars") % 8) * 1000).toInt
      val n = (b.length + 1L) / 2
      if (n == 0) None
      else {
        val ws = Multimodal.Wav.windowedStats(
          Multimodal.Wav.encode(b, rate), 3, 64).toOption.get
        val fp = ws.map(w =>
          math.min(w.absSum * 16 / (32768L * w.nSamples), 15L)
            << (4 * w.idx)).sum
        Some((r.getAs[Long]("doc_id"), n, fp))
      }
    }.toSeq
  }

  test("q176 groups equal a local audio-signature mirror via the real decoder") {
    val expected = localAudioSignatures().groupBy(t => (t._2, t._3))
      .filter(_._2.length >= 2)
      .map { case ((n, fp), ms) =>
        (n, fp) -> ms.map(_._1).sorted.mkString(",") }
    val out = Multimodal.q176AudioPhashDups(spark, sf).collect()
      .map(r => (r.getAs[Long]("n_frames"), r.getAs[Long]("fingerprint")) ->
        r.getAs[String]("doc_ids")).toMap
    assert(out == expected)
    assert(out.nonEmpty, "fixture corpus should contain dup takes")
  }

  test("q177 equals a brute-force Hamming sweep over distinct audio signatures") {
    val grp = localAudioSignatures().groupBy(t => (t._2, t._3))
      .map { case ((n, fp), ms) => (n, fp, ms.length.toLong) }.toSeq
    val expected = (for {
      a <- grp; b <- grp
      if a._1 == b._1 && a._2 < b._2
      h = java.lang.Long.bitCount(a._2 ^ b._2)
      if h <= 3
    } yield (a._1, a._2, b._2) -> (h, a._3, b._3)).toMap
    val out = Multimodal.q177AudioHammingPairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("n_frames"), r.getAs[Long]("fp_a"),
        r.getAs[Long]("fp_b")) -> (r.getAs[Int]("hamming"),
        r.getAs[Long]("n_docs_a"), r.getAs[Long]("n_docs_b"))).toMap
    assert(out == expected)
    assert(expected.nonEmpty,
      "fixture corpus should contain near-dup takes at Hamming 1-3")
  }

  test("q173 equals a brute-force Hamming sweep over distinct video signatures") {
    // the same local signature mirror as the q172 test, reduced to
    // (length class, signature, member count)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
    val sigs = docs.map { r =>
      val b = Option(r.getAs[String]("text")).getOrElse("").getBytes("UTF-8")
      val w = (r.getAs[Long]("n_chars") % 16 + 8).toInt
      val fs = 6 * w
      val nf = (math.max(b.length, 1) + fs - 1) / fs
      val step = math.max(nf / 3, 1)
      val fp = (0 until 3).flatMap { i =>
        val f = i * step
        if (f >= nf) None
        else {
          val sum = (f * fs until (f + 1) * fs)
            .map(p => if (p < b.length) (b(p) & 0xFF).toLong else 0L).sum
          Some(math.min(sum * 16 / (255L * fs), 15L) << (4 * i))
        }
      }.sum
      (r.getAs[Long]("doc_id"), nf, fp)
    }
    val grp = sigs.groupBy(t => (t._2, t._3))
      .map { case ((nf, fp), ms) => (nf, fp, ms.length.toLong) }.toSeq
    // brute force IS the recall oracle: the 4×3-bit band join must
    // surface every pair at Hamming ≤ 3 (pigeonhole), nothing else
    val expected = (for {
      a <- grp; b <- grp
      if a._1 == b._1 && a._2 < b._2
      h = java.lang.Long.bitCount(a._2 ^ b._2)
      if h <= 3
    } yield (a._1, a._2, b._2) -> (h, a._3, b._3)).toMap
    val out = Multimodal.q173VideoHammingPairs(spark, sf).collect()
      .map(r => (r.getAs[Int]("n_frames"), r.getAs[Long]("fp_a"),
        r.getAs[Long]("fp_b")) -> (r.getAs[Int]("hamming"),
        r.getAs[Long]("n_docs_a"), r.getAs[Long]("n_docs_b"))).toMap
    assert(out == expected)
    assert(expected.nonEmpty,
      "fixture corpus should contain near-dup takes at Hamming 1-3")
  }

  // ---- multimodal budget (q170) ------------------------------------------------

  test("q170 equals a local greedy budget in text+patch units") {
    import graft.operators.Curation
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "n_chars", "source").collect()
    val costs = docs.map { r =>
      val text = Option(r.getAs[String]("text"))
      val payload = text.getOrElse("").getBytes("UTF-8")
      val w = (r.getAs[Long]("n_chars") % 24 + 8).toInt
      val g = Multimodal.Ppm.decodeGrid(
        Multimodal.Ppm.encode(payload, w), 4).toOption.get
      val ws = text.map(_.split("\\s+", -1).length.toLong).getOrElse(0L)
      (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        ws + g.gx * g.gy)
    }
    val expected: Map[Long, (Long, Long)] =
      costs.groupBy(_._2).toSeq.flatMap { case (_, ms) =>
        var cum = 0L
        ms.sortBy(m => (-m._3, m._1)).toSeq.flatMap { m =>
          cum += m._3
          if (cum <= Curation.SourceTokenBudget) Some(m._1 -> (m._3, cum))
          else None
        }
      }.toMap
    val out = Curation.q170MultimodalBudget(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens"))).toMap
    assert(out == expected)
    // the patch term must bite: every doc costs ≥ 4 more than q75's
    // whitespace pricing, so the same budget admits no more documents
    val ws = Curation.q75TokenBudget(spark, sf).collect()
    assert(out.size <= ws.length)
    assert(out.nonEmpty)
  }
}

package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal-column plumbing (BASELINE.json north star): media payloads
  * as opaque `binary` columns with typed metadata, decoded/featurized by
  * partition-batched kernels.
  *
  * The decoders are REAL pure-JVM format parsers for two self-describing
  * uncompressed containers — binary PPM (P6: magic, `#` comments,
  * whitespace-separated dimensions, maxval, pixel plane) and RIFF/WAVE
  * PCM (chunked header walk, fmt parse, interleaved 16-bit little-endian
  * frames) — the codec posture this sandbox can hold honestly: header
  * arithmetic and per-channel statistics are byte-exact and
  * oracle-replayable, where a JPEG/FLAC dependency would be a stub. A
  * production deployment swaps the `decode` bodies for its codec
  * (libjpeg/FFmpeg via JNI, or `mapInArrow` to a Python worker); every
  * seam around them — schema, `mapPartitions` batching, corrupt-media
  * routing, integer-exact kernel outputs with plan-side rounding — is
  * the shape that survives that swap. `mapPartitions` (not a per-row
  * UDF) is deliberate: a real decoder amortizes codec init per
  * partition and releases native buffers per batch.
  *
  * Corrupt media routes, never throws: [[Ppm.decode]]/[[Wav.decode]]
  * return `Either[reason, stats]` and [[decodePpmRouted]] splits a
  * media frame into (features, rejects) — the `JsonlTables.readRouted`
  * posture applied to binary payloads (a 100 TB media crawl ALWAYS
  * contains truncated files).
  */
object Multimodal {

  // ---- binary PPM (P6) codec ----------------------------------------------

  /** Per-channel integer statistics of one decoded P6 image: everything
    * downstream rounding needs, with no float computed in the kernel
    * (means divide in the PLAN, so cross-engine float semantics stay in
    * one place — the q148 all-integer discipline).
    */
  final case class PpmStats(width: Int, height: Int, maxval: Int,
      nPixels: Int, nBytes: Long, sums: Array[Long], mins: Array[Int],
      maxs: Array[Int])

  object Ppm {

    /** Wrap a payload as a P6 container: canonical single-whitespace
      * header, payload as the pixel plane zero-padded to `w·h·3` with
      * `h = ceil(max(len,1) / 3w)` — the deterministic media derivation
      * q28 runs on (the corpus stands in for a decoded crawl).
      */
    def encode(payload: Array[Byte], width: Int): Array[Byte] = {
      require(width > 0, "ppm: width must be positive")
      val height = ((math.max(payload.length, 1) + 3L * width - 1)
        / (3L * width)).toInt
      val header = s"P6\n$width $height\n255\n"
        .getBytes(StandardCharsets.US_ASCII)
      val out = new Array[Byte](header.length + 3 * width * height)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(payload, 0, out, header.length, payload.length)
      out
    }

    /** Parse a P6 container and reduce its pixel plane to per-channel
      * (sum, min, max). Full header grammar: `P6`, then
      * whitespace-separated width/height/maxval with `#`-to-newline
      * comments allowed anywhere whitespace is, then EXACTLY one
      * whitespace byte, then `w·h·3` plane bytes. Anything else is a
      * routed reason, never an exception.
      */
    def decode(bytes: Array[Byte]): Either[String, PpmStats] = {
      var pos = 0
      def skipWs(): Unit = {
        var in = true
        while (in && pos < bytes.length) {
          val b = bytes(pos)
          if (b == '#') { // comment runs to end of line
            while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          } else if (b == ' ' || b == '\n' || b == '\r' || b == '\t') pos += 1
          else in = false
        }
      }
      def readInt(): Option[Int] = {
        skipWs()
        val start = pos
        var v = 0L
        while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
          v = v * 10 + (bytes(pos) - '0'); pos += 1
          if (v > Int.MaxValue) return None
        }
        if (pos == start) None else Some(v.toInt)
      }
      if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6')
        return Left("bad_magic")
      pos = 2
      val w = readInt().getOrElse(return Left("bad_width"))
      val h = readInt().getOrElse(return Left("bad_height"))
      val mv = readInt().getOrElse(return Left("bad_maxval"))
      if (w <= 0 || h <= 0) return Left("bad_dimensions")
      if (mv <= 0 || mv > 255) return Left("unsupported_maxval")
      // exactly ONE whitespace byte separates maxval from the plane
      if (pos >= bytes.length || !(bytes(pos) == ' ' || bytes(pos) == '\n' ||
          bytes(pos) == '\r' || bytes(pos) == '\t'))
        return Left("bad_header_terminator")
      pos += 1
      val expect = 3L * w * h
      if (bytes.length - pos != expect)
        return Left(s"truncated_plane:${bytes.length - pos}:$expect")
      val sums = new Array[Long](3)
      val mins = Array(Int.MaxValue, Int.MaxValue, Int.MaxValue)
      val maxs = Array(Int.MinValue, Int.MinValue, Int.MinValue)
      var i = 0
      while (pos < bytes.length) {
        val v = bytes(pos) & 0xFF
        val c = i % 3
        sums(c) += v
        if (v < mins(c)) mins(c) = v
        if (v > maxs(c)) maxs(c) = v
        i += 1; pos += 1
      }
      Right(PpmStats(w, h, mv, w * h, bytes.length.toLong, sums, mins, maxs))
    }
  }

  // ---- RIFF/WAVE PCM codec -------------------------------------------------

  /** Integer statistics of one decoded PCM take: per-channel signed
    * sample sum and peak magnitude, plus the fmt-chunk header fields —
    * again no float in the kernel.
    */
  final case class WavStats(channels: Int, sampleRate: Int,
      bitsPerSample: Int, nFrames: Long, sums: Array[Long], peaks: Array[Int])

  object Wav {

    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    private def le32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
        ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

    /** Wrap a payload's bytes as 16-bit mono PCM frames (odd tail
      * zero-padded to a full sample) in a canonical RIFF/WAVE
      * container: RIFF size, fmt chunk (PCM, channels, rate, byte
      * rate, block align, bits), data chunk.
      */
    def encode(payload: Array[Byte], sampleRate: Int): Array[Byte] = {
      val dataLen = payload.length + (payload.length & 1)
      val out = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes(StandardCharsets.US_ASCII))
      out.putInt(36 + dataLen)
      out.put("WAVE".getBytes(StandardCharsets.US_ASCII))
      out.put("fmt ".getBytes(StandardCharsets.US_ASCII))
      out.putInt(16)
      out.putShort(1.toShort)               // PCM
      out.putShort(1.toShort)               // mono
      out.putInt(sampleRate)
      out.putInt(sampleRate * 2)            // byte rate = rate·block
      out.putShort(2.toShort)               // block align
      out.putShort(16.toShort)              // bits per sample
      out.put("data".getBytes(StandardCharsets.US_ASCII))
      out.putInt(dataLen)
      out.put(payload)
      out.array()
    }

    /** Walk the RIFF chunks (unknown chunks skipped by their declared
      * size — real WAV files carry LIST/INFO chunks), parse fmt,
      * reduce the data chunk's interleaved 16-bit LE frames to
      * per-channel (sum, peak). Only integer PCM-16 is accepted; other
      * formats route with a reason (the production decoder would
      * dispatch on them).
      */
    def decode(bytes: Array[Byte]): Either[String, WavStats] = {
      if (bytes.length < 12 ||
          new String(bytes, 0, 4, StandardCharsets.US_ASCII) != "RIFF" ||
          new String(bytes, 8, 4, StandardCharsets.US_ASCII) != "WAVE")
        return Left("bad_riff_header")
      var pos = 12
      var fmt: Option[(Int, Int, Int, Int)] = None // (format, ch, rate, bits)
      var data: Option[(Int, Int)] = None          // (offset, length)
      while (pos + 8 <= bytes.length && data.isEmpty) {
        val id = new String(bytes, pos, 4, StandardCharsets.US_ASCII)
        val size = le32(bytes, pos + 4)
        if (size < 0 || pos + 8 + size > bytes.length)
          return Left(s"truncated_chunk:$id")
        id match {
          case "fmt " =>
            if (size < 16) return Left("short_fmt_chunk")
            fmt = Some((le16(bytes, pos + 8), le16(bytes, pos + 10),
              le32(bytes, pos + 12).toInt, le16(bytes, pos + 22)))
          case "data" => data = Some((pos + 8, size.toInt))
          case _ => () // skip unknown chunk
        }
        pos += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
      }
      val (format, ch, rate, bits) = fmt.getOrElse(return Left("no_fmt_chunk"))
      val (off, len) = data.getOrElse(return Left("no_data_chunk"))
      if (format != 1) return Left(s"unsupported_format:$format")
      if (bits != 16) return Left(s"unsupported_bits:$bits")
      if (ch <= 0 || rate <= 0) return Left("bad_fmt_fields")
      val blockAlign = 2 * ch
      if (len % blockAlign != 0) return Left("partial_frame")
      val nFrames = len / blockAlign
      val sums = new Array[Long](ch)
      val peaks = new Array[Int](ch)
      var f = 0
      while (f < nFrames) {
        var c = 0
        while (c < ch) {
          val raw = le16(bytes, off + f * blockAlign + 2 * c)
          val s = if (raw >= 0x8000) raw - 0x10000 else raw
          sums(c) += s
          val a = math.abs(s)
          if (a > peaks(c)) peaks(c) = a
          c += 1
        }
        f += 1
      }
      Right(WavStats(ch, rate, bits, nFrames.toLong, sums, peaks))
    }
  }

  // ---- media frame + routing ----------------------------------------------

  /** Deterministic media derivation: each document's text bytes wrapped
    * as a REAL P6 container (header + zero-padded pixel plane), width
    * from doc stats the way a manifest would carry it — the corpus
    * standing in for a decoded media crawl.
    */
  def withMediaColumns(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media", BinaryType))))
    docs.select(col("doc_id"), col("text"), col("n_chars"))
      .mapPartitions { rows =>
        rows.map { r =>
          val text = Option(r.getString(1)).getOrElse("")
          val width = (r.getLong(2) % 24 + 8).toInt
          Row(r.getLong(0),
            Ppm.encode(text.getBytes(StandardCharsets.UTF_8), width))
        }
      }(enc)
  }

  private val ppmFeatureSchema = StructType(
    Seq(StructField("doc_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("maxval", IntegerType),
      StructField("n_pixels", IntegerType),
      StructField("n_bytes", LongType)) ++
      Seq("r", "g", "b").flatMap(c => Seq(
        StructField(s"sum_$c", LongType),
        StructField(s"min_$c", IntegerType),
        StructField(s"max_$c", IntegerType))) :+
      StructField("reject_reason", StringType))

  /** Partition-batched decode over a `(doc_id, media)` frame: one row
    * per payload with either the header fields + per-channel integer
    * stats or a routing reason — never an exception (media decode at
    * corpus scale must quarantine, not abort a 10-hour job).
    */
  private def decodePpmStats(mediaDf: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(ppmFeatureSchema)
    // positional getters: rows crossing a second mapPartitions boundary
    // arrive as schema-less GenericRows
    mediaDf.select("doc_id", "media").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Ppm.decode(r.getAs[Array[Byte]](1)) match {
          case Right(s) => Row.fromSeq(
            Seq[Any](id, s.width, s.height, s.maxval, s.nPixels, s.nBytes) ++
              (0 until 3).flatMap(c =>
                Seq[Any](s.sums(c), s.mins(c), s.maxs(c))) ++ Seq(null))
          case Left(reason) => Row.fromSeq(
            Seq[Any](id) ++ Seq.fill(14)(null) ++ Seq(reason))
        }
      }
    }(enc)
  }

  /** The routed split: (decoded features, rejects with reasons) — the
    * corrupt-line-routing posture for binary media.
    */
  def decodePpmRouted(mediaDf: DataFrame): (DataFrame, DataFrame) = {
    val all = decodePpmStats(mediaDf)
    (all.filter(col("reject_reason").isNull).drop("reject_reason"),
      all.filter(col("reject_reason").isNotNull)
        .select("doc_id", "reject_reason"))
  }

  /** Frame sampling: n evenly spaced fixed-width byte windows from the
    * payload (the video-frame-sample analog), as pure column expressions.
    */
  def frameSample(mediaDf: DataFrame, nFrames: Int, frameLen: Int): DataFrame =
    mediaDf.select(col("doc_id"),
      transform(sequence(lit(0), lit(nFrames - 1)), i =>
        substring(col("media"),
          (i * greatest((length(col("media")) - frameLen) / nFrames, lit(1)) + 1)
            .cast("int"),
          lit(frameLen))).as("frames"))

  // ---- q28: image pipeline end-to-end --------------------------------------

  /** q28 — the multimodal IMAGE pipeline end-to-end: container build →
    * batched REAL P6 decode (header parse + per-channel plane
    * reduction) → per-channel means in the plan (decimal-routed
    * rounding). The kernel emits only integers; every reported field —
    * parsed dimensions, maxval, container byte length (header digits
    * included), channel sums folded to means, channel min/max with the
    * zero padding visible — is replayed arithmetically by the DuckDB
    * oracle from the same text bytes, so a wrong header parse, a
    * swapped channel, or an off-by-one in the padding all
    * hash-mismatch.
    *
    * ASCII dependency (enforced, not assumed): the kernel iterates
    * UTF-8 BYTES of the payload while the oracle iterates CHARACTERS
    * of the text — identical only while every char is one byte
    * (`SimilaritySpec` pins the corpus and names this oracle in its
    * failure message).
    */
  def q28MultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorOps.round6
    val (good, bad) = decodePpmRouted(
      withMediaColumns(Tables.documents(spark, dir)))
    // self-encoded containers must parse — a reject here is a codec
    // defect, not data (the routing path is for FOREIGN media and is
    // spec-covered on crafted corrupt fixtures)
    val cols = Seq("width", "height", "maxval", "n_pixels", "n_bytes")
      .map(col) ++
      Seq("r", "g", "b").flatMap(c => Seq(
        round6(col(s"sum_$c").cast("double") / col("n_pixels"))
          .as(s"mean_$c"),
        col(s"min_$c"), col(s"max_$c")))
    good.select(col("doc_id") +: cols: _*).orderBy("doc_id")
  }

  /** Replays [[Ppm.encode]] + [[Ppm.decode]] arithmetically: width from
    * the manifest derivation, height from the ceil division, container
    * length = header digits + plane, channel c = character codes at
    * positions ≡ c (mod 3) plus the zero padding (visible in count,
    * min, and the mean denominator `w·h`).
    */
  lazy val q28OracleSql: String = {
    import graft.functions.VectorOps.round6Sql
    val chCols = Seq("r", "g", "b").zipWithIndex.map { case (cn, c) =>
      val vals = s"list_transform(generate_series(${c + 1}, L, 3), i -> codes[i])"
      s"""       ${round6Sql(s"CAST(COALESCE(list_sum(v_$cn), 0) AS DOUBLE)" +
           " / (width * height)")} AS mean_$cn,
         |       CAST(CASE WHEN width * height > len(v_$cn) THEN 0
         |                 ELSE list_min(v_$cn) END AS INTEGER) AS min_$cn,
         |       CAST(CASE WHEN width * height > len(v_$cn)
         |                 THEN GREATEST(COALESCE(list_max(v_$cn), 0), 0)
         |                 ELSE list_max(v_$cn) END AS INTEGER) AS max_$cn"""
        .stripMargin -> s"$vals AS v_$cn"
    }
    s"""WITH base AS (
       |  SELECT doc_id,
       |         CAST(n_chars % 24 + 8 AS INTEGER) AS width,
       |         list_transform(generate_series(1, length(coalesce(text, ''))),
       |                        i -> ascii(substring(text, i, 1))) AS codes,
       |         CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS L
       |  FROM documents
       |), dims AS (
       |  SELECT doc_id, width, codes, L,
       |         CAST(CEIL(CAST(GREATEST(L, 1) AS DOUBLE) / (3 * width))
       |           AS INTEGER) AS height
       |  FROM base
       |), chans AS (
       |  SELECT doc_id, width, height, L,
       |         ${chCols.map(_._2).mkString(",\n         ")}
       |  FROM dims
       |)
       |SELECT doc_id, width, height, 255 AS maxval,
       |       CAST(width * height AS INTEGER) AS n_pixels,
       |       CAST(3 + len(CAST(width AS VARCHAR)) + 1
       |            + len(CAST(height AS VARCHAR)) + 5
       |            + 3 * width * height AS BIGINT) AS n_bytes,
       |${chCols.map(_._1).mkString(",\n")}
       |FROM chans ORDER BY doc_id""".stripMargin
  }

  // ---- q161: audio pipeline end-to-end -------------------------------------

  /** q161 — the multimodal AUDIO pipeline end-to-end: each document's
    * text bytes wrapped as REAL mono PCM-16 RIFF/WAVE (sample rate
    * from doc stats, odd tail zero-padded), then the chunk-walking
    * decoder parses the container back and reduces the frames to
    * amplitude statistics; mean amplitude divides in the plan
    * (decimal-routed). The oracle rebuilds every sample from the
    * character codes — two bytes little-endian, sign-corrected — so
    * the byte pairing, the signed 16-bit interpretation, the odd-tail
    * pad, and the duration arithmetic are all hash-pinned.
    */
  def q161WavStats(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorOps.round6
    val kernelSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", LongType),
      StructField("amp_sum", LongType),
      StructField("peak_amp", IntegerType)))
    val enc = RowEncoder.encoderFor(kernelSchema)
    val stats = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .mapPartitions { rows =>
        rows.map { r =>
          val text = Option(r.getString(1)).getOrElse("")
          val rate = (8000 + (r.getLong(2) % 8) * 1000).toInt
          val container = Wav.encode(
            text.getBytes(StandardCharsets.UTF_8), rate)
          Wav.decode(container) match {
            case Right(s) => Row(r.getLong(0), s.sampleRate,
              s.nFrames, s.sums(0), s.peaks(0))
            case Left(reason) => throw new IllegalStateException(
              s"q161: self-encoded WAV failed to decode: $reason")
          }
        }
      }(enc)
    stats.select(col("doc_id"), col("sample_rate"), col("n_frames"),
        expr("n_frames * 1000 DIV sample_rate").as("duration_ms"),
        round6(col("amp_sum").cast("double") / nullif(col("n_frames"), lit(0L)))
          .as("mean_amp"),
        col("peak_amp"))
      .orderBy("doc_id")
  }

  /** Sample j = bytes (2j−1, 2j) little-endian, sign-corrected at
    * 0x8000, odd tail paired with the zero pad; frame count, duration,
    * mean, and peak from those samples.
    */
  lazy val q161OracleSql: String = {
    import graft.functions.VectorOps.round6Sql
    s"""WITH base AS (
       |  SELECT doc_id,
       |         CAST(8000 + (n_chars % 8) * 1000 AS INTEGER) AS sample_rate,
       |         list_transform(generate_series(1, length(coalesce(text, ''))),
       |                        i -> ascii(substring(text, i, 1))) AS codes,
       |         CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS L
       |  FROM documents
       |), samp AS (
       |  SELECT doc_id, sample_rate, L,
       |         list_transform(generate_series(1, CAST((L + 1) // 2 AS INTEGER)),
       |           j -> CASE WHEN codes[2*j - 1]
       |                       + 256 * COALESCE(codes[2*j], 0) >= 32768
       |                     THEN codes[2*j - 1]
       |                       + 256 * COALESCE(codes[2*j], 0) - 65536
       |                     ELSE codes[2*j - 1]
       |                       + 256 * COALESCE(codes[2*j], 0) END) AS s
       |  FROM base
       |)
       |SELECT doc_id, sample_rate,
       |       CAST((L + 1) // 2 AS BIGINT) AS n_frames,
       |       CAST(((L + 1) // 2) * 1000 // sample_rate AS BIGINT)
       |         AS duration_ms,
       |       ${round6Sql("CAST(COALESCE(list_sum(s), 0) AS DOUBLE)" +
              " / nullif((L + 1) // 2, 0)")} AS mean_amp,
       |       CAST(COALESCE(list_max(list_transform(s, x -> abs(x))), 0)
       |         AS INTEGER) AS peak_amp
       |FROM samp ORDER BY doc_id""".stripMargin
  }
}

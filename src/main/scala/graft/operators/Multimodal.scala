package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal-column plumbing (BASELINE.json north star): media payloads
  * as opaque `binary` columns with typed metadata, decoded/featurized by a
  * partition-batched kernel.
  *
  * The Spark-side machinery — schema, partitioning, batch iteration,
  * feature-column shape — is real and tested; the decode kernel itself is
  * a STUB (this container has no image/audio codecs): a deterministic
  * byte-histogram featurizer stands in where a JNI/FFmpeg/JPEG decoder
  * would plug in. `mapPartitions` (not a per-row UDF) is deliberate: a
  * real decoder amortizes codec init per partition and releases native
  * buffers per batch — the same shape `mapInPandas`/`mapInArrow` gives a
  * Python decoder.
  */
object Multimodal {

  /** Deterministic media derivation: the document text's UTF-8 bytes act
    * as the opaque payload; width/height/channels metadata derive from
    * doc stats the way a real manifest would carry them.
    */
  def withMediaColumns(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      (col("n_chars") % 64 + 16).cast("int").as("width"),
      (col("n_chars") % 48 + 12).cast("int").as("height"),
      lit(3).as("channels"))

  val FeatureDim = 8

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(DoubleType, containsNull = false))))

  /** STUB decode kernel — deterministic byte-bucket histogram (8 buckets,
    * L1-normalized). A real implementation decodes pixels/samples here;
    * everything around it (batching, schema, null-free output) is the
    * production shape.
    */
  private def decodeStub(media: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](FeatureDim)
    var i = 0
    while (i < media.length) {
      hist((media(i) & 0xFF) % FeatureDim) += 1.0
      i += 1
    }
    val n = math.max(media.length, 1).toDouble
    hist.map(_ / n)
  }

  /** Partition-batched decode+featurize over the media column. */
  def decodeFeatures(mediaDf: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    mediaDf.select("doc_id", "media", "width", "height")
      .mapPartitions { rows =>
        rows.map { r =>
          val media = r.getAs[Array[Byte]]("media")
          Row(r.getAs[Long]("doc_id"), media.length,
            r.getAs[Int]("width"), r.getAs[Int]("height"),
            decodeStub(media).toSeq)
        }
      }(enc)
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

  /** q28 — the multimodal pipeline end-to-end: manifest columns → batched
    * decode stub → flattened rounded features (decimal-routed rounding for
    * cross-engine determinism).
    *
    * Fully oracle-checked even though the kernel runs in `mapPartitions`:
    * the stub's byte-histogram math is replayed in DuckDB over the same
    * payload bytes ([[q28OracleSql]]) — the corpus is ASCII, so
    * `ascii(substring(text, i, 1))` enumerates exactly the UTF-8 bytes the
    * kernel sees. A real codec would make this a rows-only check again;
    * the point here is that the *plumbing* (schema, batching, feature
    * shape) is pinned by a hash compare, not just a row count.
    */
  def q28MultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    val feats = decodeFeatures(withMediaColumns(Tables.documents(spark, dir)))
    feats.select(
        col("doc_id") +: col("n_bytes") +: col("width") +: col("height") +:
          (0 until FeatureDim).map(i =>
            graft.functions.VectorOps.round6(
              element_at(col("features"), i + 1)).as(s"f$i")): _*)
      .orderBy("doc_id")
  }

  /** Replays [[decodeStub]] + [[withMediaColumns]] in SQL: per-character
    * code points modulo [[FeatureDim]], bucket-counted and normalized by
    * payload length — byte-identical to the kernel on an ASCII corpus.
    *
    * ASCII dependency (enforced, not assumed): the Spark kernel iterates
    * UTF-8 BYTES of the payload while this SQL iterates CHARACTERS of the
    * text — identical only while every char is one byte. A non-ASCII
    * corpus would hash-mismatch with no hint why, so
    * `SimilaritySpec` asserts the documents fixture is pure ASCII and
    * names this oracle in its failure message.
    */
  lazy val q28OracleSql: String = {
    val fcols = (0 until FeatureDim).map { k =>
      val frac = s"CAST(len(list_filter(codes, c -> c % $FeatureDim = $k)) AS DOUBLE) / denom"
      "       " + graft.functions.VectorOps.round6Sql(frac) + s" AS f$k"
    }.mkString(",\n")
    s"""WITH base AS (
      |  SELECT doc_id,
      |         CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |         CAST(n_chars % 64 + 16 AS INTEGER) AS width,
      |         CAST(n_chars % 48 + 12 AS INTEGER) AS height,
      |         list_transform(generate_series(1, length(text)),
      |                        i -> ascii(substring(text, i, 1))) AS codes,
      |         CAST(GREATEST(octet_length(encode(text)), 1) AS DOUBLE) AS denom
      |  FROM documents
      |)
      |SELECT doc_id, n_bytes, width, height,
      |$fcols
      |FROM base ORDER BY doc_id""".stripMargin
  }
}

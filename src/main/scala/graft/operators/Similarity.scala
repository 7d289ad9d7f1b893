package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`array<float>`, dim 64) — BASELINE.json north star.
  *
  * Two paths, as a production pipeline would ship them:
  *  - [[q22CosineTopK]]: brute-force cosine top-k — the exact baseline,
  *    DuckDB-oracle-checkable. Probe set × corpus via broadcast of the
  *    (small) probe side, so the corpus is scanned once with no shuffle
  *    of the big side; per-probe top-k is a windowed rank over rounded
  *    scores.
  *  - [[q23AnnLsh]]: random-hyperplane LSH (sign-of-projection sketches,
  *    Charikar-style) with multi-table banding. Candidates come from
  *    bucket equi-joins only; exact cosine reranks the candidates. At
  *    100 TB the bucket join is the only corpus-wide operation and it
  *    shuffles each vector once per table — no pairwise blow-up. Recall
  *    vs the brute-force baseline is asserted in `SimilaritySpec`.
  */
object Similarity {

  private val NumProbes = 10
  private val TopK = 10

  private def probes(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < NumProbes)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"))

  /** q22 — exact cosine top-k for the first [[NumProbes]] vectors.
    * Deterministic rank: (rounded score desc, neighbor id asc). Norms are
    * precomputed per side; the corpus scan evaluates one codegen'd dot
    * per (probe, vector).
    */
  def q22CosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        VectorOps.norm(col("embedding")).as("nrm"))
    val p = probes(e).withColumn("pn", VectorOps.norm(col("pv")))
    val scored = broadcast(p).crossJoin(e)
      .filter(col("probe_id") =!= col("vec_id"))
      .withColumn("cos", VectorOps.round6(
        VectorOps.dot(col("pv"), col("embedding")) / (col("pn") * col("nrm"))))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("cos"))
      .orderBy("probe_id", "rank")
  }

  val q22OracleSql: String = {
    val cos = VectorOps.round6Sql(VectorOps.cosineSql("p.embedding", "e.embedding"))
    s"""WITH scored AS (
      |  SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id, $cos AS cos
      |  FROM embeddings p JOIN embeddings e ON p.vec_id <> e.vec_id
      |  WHERE p.vec_id < $NumProbes
      |), ranked AS (
      |  SELECT probe_id, neighbor_id, cos,
      |         row_number() OVER (PARTITION BY probe_id
      |                            ORDER BY cos DESC, neighbor_id ASC) AS rank
      |  FROM scored
      |)
      |SELECT probe_id, rank, neighbor_id, cos
      |FROM ranked WHERE rank <= $TopK
      |ORDER BY probe_id, rank""".stripMargin
  }

  // ---- LSH ANN -----------------------------------------------------------

  // 8 tables × 4-bit sketches: tuned for this corpus, whose nearest
  // neighbors sit at cosine ≈0.3–0.5 (random, unclustered embeddings —
  // the hardest case for LSH). P[bit agrees] = 1 − θ/π ≈ 0.6 there, so
  // short sketches with many tables trade bucket selectivity for recall;
  // a clustered production corpus would invert the trade (more bits,
  // fewer tables) to prune harder.
  private val Tables_ = 8 // hash tables
  private val BitsPerTable = 4 // hyperplanes per table
  private val Dim = 64

  /** Deterministic random hyperplanes (seeded java.util.Random — the
    * algorithm is specified, so signatures are stable across JVMs).
    */
  private lazy val hyperplanes: Array[Array[Array[Double]]] = {
    val rnd = new java.util.Random(20260812L)
    Array.fill(Tables_, BitsPerTable, Dim)(rnd.nextGaussian())
  }

  /** Sign-sketch bucket id for one hash table, as a Column over the
    * embedding: bit j = [v · r_j > 0], packed into an int.
    */
  private def bucketExpr(vec: Column, table: Int): Column =
    (0 until BitsPerTable).map { j =>
      val plane = array(hyperplanes(table)(j).map(lit): _*)
      when(VectorOps.dot(vec, plane) > 0.0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** (id, table, bucket) index rows — one row per vector per hash table. */
  def lshIndex(e: DataFrame, idCol: String, vecCol: String): DataFrame =
    e.select(col(idCol).as("id"), col(vecCol).as("v"),
        posexplode(array((0 until Tables_).map(t =>
          bucketExpr(col(vecCol), t)): _*)).as(Seq("table", "bucket")))
      .select("id", "table", "bucket")

  /** q23 — LSH-bucketed ANN top-k for the probe set: candidates share a
    * bucket in ≥1 table; exact cosine reranks. Non-SQL-expressible
    * (hyperplane kernel) → rows-only driver check; recall floor asserted
    * in `SimilaritySpec` against q22.
    */
  def q23AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val idx = lshIndex(e, "vec_id", "embedding")
    val probeIdx = idx.filter(col("id") < NumProbes)
      .withColumnRenamed("id", "probe_id")
    val cand = broadcast(probeIdx).join(idx, Seq("table", "bucket"))
      .filter(col("probe_id") =!= col("id"))
      .select(col("probe_id"), col("id").as("neighbor_id"))
      .dropDuplicates("probe_id", "neighbor_id")

    val withVecs = cand
      .join(broadcast(probes(e).withColumn("pn", VectorOps.norm(col("pv")))),
        "probe_id")
      .join(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("nv"), VectorOps.norm(col("embedding")).as("nn")),
        "neighbor_id")
      .withColumn("cos", VectorOps.round6(
        VectorOps.dot(col("pv"), col("nv")) / (col("pn") * col("nn"))))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    withVecs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select("probe_id", "rank", "neighbor_id", "cos")
      .orderBy("probe_id", "rank")
  }
}

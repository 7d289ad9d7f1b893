package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorOps

/** Product quantization with asymmetric-distance search (Jégou,
  * Douze & Schmid 2011, "Product Quantization for Nearest Neighbor
  * Search"): the embedding space is split into [[SubM]] orthogonal
  * [[SubDim]]-dim subspaces, each compressed by its own [[PqK]]-word
  * codebook (per-subspace Lloyd, the q125 integer-arithmetic
  * discipline), and search runs over the CODES — each vector pays
  * [[SubM]] small integers of memory, and a probe scores a vector by
  * summing per-subspace table lookups (ADC) instead of touching the
  * raw floats. This is the compressed-exhaustive posture a 100 TB
  * vector corpus actually ships: the codes table is ~64× smaller than
  * the embeddings, the distance tables are (probes × [[SubM]] ×
  * [[PqK]]) and broadcast, and the scan is one equi-join + sum.
  *
  * All training and search arithmetic is exact-integer in q125's
  * quantized space (squared L2 over [[Ivf.QuantScale]]-scaled longs;
  * centroid means via [[Ivf.roundDiv]]), so the DuckDB oracle replays
  * the identical fused loop bit-for-bit. Recall is measured against
  * the EXACT integer-L2 top-[[TopK]] in the same quantized space —
  * the paper's own protocol, isolating pure quantization loss.
  */
object Pq {

  /** Subspaces (dim 64 → eight 8-dim slices). */
  val SubM = 8

  /** Dimensions per subspace. */
  val SubDim = 8

  /** Codewords per subspace codebook. */
  val PqK = 8

  /** Fixed Lloyd iterations per subspace (fused into one corpus pass
    * per iteration across all subspaces).
    */
  val PqIters = 2

  private val NumProbes = 10
  private val TopK = 10

  /** Exact integer squared-L2 between two long-array columns. */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)

  /** `(vec_id, m, sq)` — every vector's [[SubM]] subvectors, one row
    * per (vector, subspace).
    */
  private[graft] def subvectors(quant: DataFrame): DataFrame =
    quant.select(col("vec_id"),
      posexplode(array((0 until SubM).map(m =>
        slice(col("q"), m * SubDim + 1, SubDim)): _*)).as(Seq("m", "sq")))

  /** Codebooks as a small driver-built frame `(m, k, cw)` — the
    * `pq_codebooks` artifact shape.
    */
  private[graft] def codebookFrame(spark: SparkSession,
      cb: Seq[(Int, Int, Array[Long])]): DataFrame = {
    import spark.implicits._
    cb.map { case (m, k, c) => (m, k, c.toSeq) }.toDF("m", "k", "cw")
  }

  /** Collect a `pq_codebooks`-shaped frame back to literal form. */
  private[graft] def collectCodebooks(
      df: DataFrame): Seq[(Int, Int, Array[Long])] =
    df.collect().map(r => (r.getAs[Int]("m"), r.getAs[Int]("k"),
      r.getAs[scala.collection.Seq[Long]]("cw").toArray))
      .sortBy(t => (t._1, t._2)).toSeq

  /** `(vec_id, code)` with `code` the length-[[SubM]] codeword-id array
    * — the `pq_codes` artifact shape (one row per vector, [[SubM]]
    * small ints: the compressed corpus itself).
    */
  private[graft] def codesFrame(sub: DataFrame, cb: DataFrame): DataFrame =
    assign(sub, cb)
      .groupBy("vec_id")
      .agg(transform(array_sort(collect_list(struct(col("m"), col("k")))),
        s => s("k")).as("code"))

  /** Per-(vector, subspace) argmin codeword against a codebook frame —
    * ties toward the smaller k via lexicographic struct-min (a
    * partial-aggregatable shape, no window). Keeps `sq` for the update
    * step (k is unique per group, so the array field never decides).
    */
  private def assign(sub: DataFrame, cb: DataFrame): DataFrame =
    sub.join(broadcast(cb), "m")
      .select(col("vec_id"), col("m"),
        struct(sqDist(col("sq"), col("cw")).as("dist"), col("k"),
          col("sq")).as("c"))
      .groupBy("vec_id", "m")
      .agg(min(col("c")).as("best"))
      .select(col("vec_id"), col("m"), col("best")("k").as("k"),
        col("best")("sq").as("sq"))

  /** Fused PQ training: [[PqIters]] Lloyd iterations, each ONE pass
    * over the subvector frame covering all [[SubM]] subspaces at once
    * (the q125 discipline — per iteration the driver collects only the
    * ([[SubM]] × [[PqK]] × [[SubDim]]) sum/count aggregate). Init =
    * the [[PqK]] smallest `vec_id`s' subvectors per subspace, codeword
    * ids in that order; an emptied codeword keeps its previous value.
    */
  private[graft] def train(spark: SparkSession,
      sub: DataFrame): Seq[(Int, Int, Array[Long])] = {
    val init = sub.filter(col("vec_id").isin(
        sub.select("vec_id").distinct().orderBy("vec_id").limit(PqK)
          .collect().map(_.getAs[Long]("vec_id")).toSeq: _*))
      .collect()
      .groupBy(_.getAs[Int]("m")).toSeq.flatMap { case (m, rows) =>
        rows.sortBy(_.getAs[Long]("vec_id")).zipWithIndex.map {
          case (r, k) =>
            (m, k, r.getAs[scala.collection.Seq[Long]]("sq").toArray)
        }
      }
    (1 to PqIters).foldLeft(init) { case (cb, _) =>
      val sums = assign(sub, codebookFrame(spark, cb))
        .select(col("m"), col("k"), posexplode(col("sq")).as(Seq("pos", "v")))
        .groupBy("m", "k", "pos")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
        .collect()
        .groupBy(r => (r.getAs[Int]("m"), r.getAs[Int]("k")))
      cb.map { case (m, k, old) =>
        (m, k, sums.get((m, k)).map { rows =>
          rows.sortBy(_.getAs[Int]("pos"))
            .map(r => Ivf.roundDiv(r.getAs[Long]("s"), r.getAs[Long]("n")))
            .toArray
        }.getOrElse(old))
      }
    }
  }

  /** q139 — PQ-ADC recall vs the exact integer-L2 baseline, per probe:
    * train the codebooks, encode every vector as [[SubM]] codes (one
    * final assignment against the trained books), build each probe's
    * (subspace × codeword) distance table, score the whole corpus by
    * table-lookup sums, and compare the ADC top-[[TopK]] against the
    * exact quantized-space top-[[TopK]]. Output
    * `(probe_id, n_exact, n_hit, recall)` — the q92/q125 harness
    * shape applied to the compressed index.
    *
    * Scale shape: the codebooks and codes are standing
    * embedding-fingerprint artifacts (`pq_codebooks`/`pq_codes`,
    * exactly like `ivf_centroids`/`ivf_cells`) — training is
    * [[PqIters]]+1 subvector passes paid once per embedding snapshot;
    * the search side joins the CODES frame against a broadcast
    * distance table and sums — no float vector is touched after
    * encoding, which is the entire point of PQ at 100 TB.
    */
  def q139PqRecall(spark: SparkSession, dir: String): DataFrame = {
    val (cbLit, codesArr) = graft.Artifacts.pqModel(spark, dir)
    val cb = codebookFrame(spark, cbLit)
    val codes = codesArr
      .select(col("vec_id"), posexplode(col("code")).as(Seq("m", "k")))
    val quant = graft.Checkpoints.checkpoint(
      Ivf.quantized(Tables.embeddings(spark, dir)))

    val dtable = subvectors(quant.filter(col("vec_id") < NumProbes))
      .select(col("vec_id").as("probe_id"), col("m"), col("sq"))
      .join(broadcast(cb), "m")
      .select(col("probe_id"), col("m"), col("k"),
        sqDist(col("sq"), col("cw")).as("d"))

    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("adc").asc, col("vec_id").asc)
    val approx = codes.join(broadcast(dtable), Seq("m", "k"))
      .filter(col("vec_id") =!= col("probe_id"))
      .groupBy("probe_id", "vec_id")
      .agg(sum("d").as("adc"))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= TopK)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        lit(1).as("hit"))

    val exactW = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("dist").asc, col("vec_id").asc)
    val exact = broadcast(quant.filter(col("vec_id") < NumProbes)
        .select(col("vec_id").as("probe_id"), col("q").as("pq")))
      .join(quant.select(col("vec_id"), col("q")),
        col("vec_id") =!= col("probe_id"))
      .withColumn("dist", sqDist(col("pq"), col("q")))
      .withColumn("rank", row_number().over(exactW))
      .filter(col("rank") <= TopK)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"))

    exact.join(approx, Seq("probe_id", "neighbor_id"), "left")
      .groupBy("probe_id")
      .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
      .withColumn("recall", VectorOps.round6(
        col("n_hit").cast("double") / col("n_exact")))
      .orderBy("probe_id")
  }

  /** The identical fused loop unrolled: `sub` (subvector slices),
    * `cb0` (smallest-id init per subspace), per iteration an
    * assignment + update CTE pair, a final `codes` assignment, the
    * probe distance tables, the ADC scan, and the exact quantized-L2
    * baseline — every constant generated from the same fields the
    * Spark side trains with.
    */
  val q139OracleSql: String = {
    val dist = (a: String, b: String) =>
      s"list_sum(list_transform(generate_series(1, len($a)), " +
        s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"
    val iters = (1 to PqIters).map { it =>
      s"""a$it AS (
         |  SELECT vec_id, m, k, sq FROM (
         |    SELECT s.vec_id, s.m, c.k, s.sq,
         |           row_number() OVER (PARTITION BY s.vec_id, s.m
         |             ORDER BY ${dist("s.sq", "c.cw")}, c.k) AS rn
         |    FROM sub s JOIN cb${it - 1} c ON s.m = c.m
         |  ) WHERE rn = 1
         |), sums$it AS (
         |  SELECT m, k, i, CAST(SUM(v) AS BIGINT) AS s, COUNT(*) AS n
         |  FROM (SELECT m, k, generate_subscripts(sq, 1) AS i,
         |               unnest(sq) AS v FROM a$it)
         |  GROUP BY m, k, i
         |), cb$it AS (
         |  SELECT p.m, p.k, COALESCE(u.cw, p.cw) AS cw
         |  FROM cb${it - 1} p LEFT JOIN (
         |    SELECT m, k, list(${Ivf.roundDivSql("s", "n")} ORDER BY i) AS cw
         |    FROM sums$it GROUP BY m, k
         |  ) u ON p.m = u.m AND p.k = u.k
         |)""".stripMargin
    }.mkString(", ")
    val recall = VectorOps.round6Sql(
      "CAST(COUNT(a.neighbor_id) AS DOUBLE) / COUNT(*)")
    s"""WITH quant AS (
       |  SELECT vec_id, ${Ivf.quantizeSql("embedding")} AS q FROM embeddings
       |), sub AS (
       |  SELECT vec_id, m,
       |         q[m * $SubDim + 1 : m * $SubDim + $SubDim] AS sq
       |  FROM quant, (SELECT unnest(generate_series(0, ${SubM - 1})) AS m)
       |), cb0 AS (
       |  SELECT m,
       |         CAST(row_number() OVER (PARTITION BY m ORDER BY vec_id) - 1
       |           AS INTEGER) AS k,
       |         sq AS cw
       |  FROM sub
       |  WHERE vec_id IN (SELECT vec_id FROM quant ORDER BY vec_id LIMIT $PqK)
       |), $iters, codes AS (
       |  SELECT vec_id, m, k FROM (
       |    SELECT s.vec_id, s.m, c.k,
       |           row_number() OVER (PARTITION BY s.vec_id, s.m
       |             ORDER BY ${dist("s.sq", "c.cw")}, c.k) AS rn
       |    FROM sub s JOIN cb$PqIters c ON s.m = c.m
       |  ) WHERE rn = 1
       |), dt AS (
       |  SELECT s.vec_id AS probe_id, s.m, c.k,
       |         ${dist("s.sq", "c.cw")} AS d
       |  FROM sub s JOIN cb$PqIters c ON s.m = c.m
       |  WHERE s.vec_id < $NumProbes
       |), approx AS (
       |  SELECT probe_id, vec_id AS neighbor_id FROM (
       |    SELECT sc.probe_id, sc.vec_id,
       |           row_number() OVER (PARTITION BY sc.probe_id
       |             ORDER BY sc.adc, sc.vec_id) AS rank
       |    FROM (
       |      SELECT dt.probe_id, co.vec_id, CAST(SUM(dt.d) AS BIGINT) AS adc
       |      FROM codes co JOIN dt ON co.m = dt.m AND co.k = dt.k
       |      WHERE co.vec_id <> dt.probe_id
       |      GROUP BY dt.probe_id, co.vec_id
       |    ) sc
       |  ) WHERE rank <= $TopK
       |), exact AS (
       |  SELECT probe_id, vec_id AS neighbor_id FROM (
       |    SELECT p.vec_id AS probe_id, v.vec_id,
       |           row_number() OVER (PARTITION BY p.vec_id
       |             ORDER BY ${dist("p.q", "v.q")}, v.vec_id) AS rank
       |    FROM quant p JOIN quant v ON v.vec_id <> p.vec_id
       |    WHERE p.vec_id < $NumProbes
       |  ) WHERE rank <= $TopK
       |)
       |SELECT e.probe_id, COUNT(*) AS n_exact,
       |       COUNT(a.neighbor_id) AS n_hit,
       |       $recall AS recall
       |FROM exact e LEFT JOIN approx a
       |  ON e.probe_id = a.probe_id AND e.neighbor_id = a.neighbor_id
       |GROUP BY e.probe_id
       |ORDER BY e.probe_id""".stripMargin
  }
}

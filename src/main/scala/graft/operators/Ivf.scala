package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.functions.VectorOps

/** Learned-centroid IVF: Lloyd's k-means over the embeddings table as an
  * ITERATING corpus op, with the trained index evaluated by the q92
  * recall harness (q125).
  *
  * q35's IVF uses the label column as its cells — an honest stand-in.
  * This is the real thing: [[Iters]] fixed Lloyd iterations, each ONE
  * assignment pass over the corpus (centroids inlined as literals, so
  * the pass is map-side) followed by a vocabulary-sized aggregate
  * ((cells × dim) rows — the q113 census shape) collected to the
  * driver, never a corpus re-scan per step beyond the assignment pass.
  *
  * Cross-engine determinism is by INTEGER arithmetic throughout the
  * training loop: embeddings are decimal-route-quantized to
  * [[QuantScale]]-scaled longs ([[quantize]]), distances are exact
  * integer squared-L2 sums, centroid means round half-away-from-zero in
  * pure integer math ([[roundDivSql]]) — no float accumulates anywhere
  * an engine could order differently. Assignment ties break toward the
  * smaller cell id. The DuckDB oracle replays the identical loop
  * (same init, same iterations, same training SAMPLE — both sides
  * generated from the same constants), so q125 is hash-checkable end to
  * end. The final RERANK uses the ordinary float cosine (round6) on the
  * original embeddings — the trained structure only decides which
  * candidates are scored, exactly as a deployed IVF does.
  *
  * Training runs on a DETERMINISTIC HASH SAMPLE of the corpus (q117's
  * PolyHash-mod discipline, target [[TrainSampleTarget]] vectors): the
  * published practice for coarse quantizers — FAISS's own default —
  * is to fit centroids on a bounded sample and pay the corpus-wide
  * pass only for the final assignment, because Lloyd converges on the
  * sample's distribution long before it needs every vector. The sample
  * predicate is a pure hash residue (no RNG), so it is reproducible
  * across runs, engines, and partition layouts, and the oracle replays
  * it exactly ([[trainSampleSql]]).
  *
  * 100 TB shape: centroids are a (cells × dim) artifact
  * (`ivf_centroids`) and the assignment a per-vector artifact
  * (`ivf_cells`), both keyed by the embeddings fingerprint; training is
  * [[Iters]]+1 scans of the BOUNDED sample plus one corpus-wide
  * assignment pass per embedding snapshot — the one remaining
  * linear-in-corpus cost is the map-side assignment, not the iterating
  * loop; searches read the standing artifacts and scan only the probed
  * cells' vectors.
  */
object Ivf {

  /** Cells trained. */
  val K = 16

  /** Fixed Lloyd iterations (fixed so the oracle can replay them).
    * Five, not two: iterations over the BOUNDED sample cost O(sample)
    * each regardless of corpus size — the sampled-training dividend is
    * spent on actually converging Lloyd, which the sampled-vs-full
    * recall spec depends on.
    */
  val Iters = 5

  /** Cells probed per query at eval time. */
  val Nprobe = 3

  /** Fixed-point scale for the quantized training space. */
  val QuantScale = 1000000L

  /** Target size of the deterministic training sample — vectors kept
    * by `PolyHash(vec_id) mod ⌈n/target⌉ = 0` feed the Lloyd loops
    * (coarse and PQ); the corpus-wide pass is only the final
    * assignment/encoding. Sized well above the largest codebook
    * ([[K]] cells / [[Pq.PqK]]×[[Pq.SubM]] codewords) so every
    * centroid sees tens of training points.
    */
  val TrainSampleTarget = 250L

  private val NumProbes = 10
  private val TopK = 10

  /** Trained-index eval probes: the [[NumProbes]] HIGHEST `vec_id`s.
    * Deliberately disjoint from Lloyd's smallest-id init (sampled and
    * full both seed from the SMALLEST ids), so recall is never scored
    * on the very vectors the centroids were seeded from — first-id
    * probes overlap the seeds and read ~0.2 recall too high at the
    * fixtures (each such probe starts as its own centroid, so its
    * neighborhood forms a flatteringly tight cell). Works on any frame
    * carrying `vec_id`; the SQL twin is [[probeInSql]]. Shared by the
    * IVF (q125/q143) and PQ (q139/q140/q146) evals.
    */
  private[operators] def topProbes(df: DataFrame): DataFrame =
    df.orderBy(col("vec_id").desc).limit(NumProbes)

  /** Oracle predicate selecting [[topProbes]]' ids for alias `a` —
    * `vec_id` is unique, so the DESC-LIMIT subquery is deterministic.
    */
  private[operators] def probeInSql(a: String): String =
    s"$a.vec_id IN (SELECT vec_id FROM embeddings " +
      s"ORDER BY vec_id DESC LIMIT $NumProbes)"

  /** The sample modulus for a corpus of `n` vectors — identical
    * arithmetic to the oracle's `CEIL(COUNT(*) / target.0)` (one
    * IEEE double division, then ceil).
    */
  def sampleModulus(n: Long): Long =
    math.max(1L, math.ceil(n / TrainSampleTarget.toDouble).toLong)

  /** The training-sample predicate over an id column: PolyHash of the
    * decimal string, residue 0 mod `mod` (hash is non-negative, so
    * `%` and `pmod` agree with the oracle's `%`).
    */
  def inTrainSample(id: Column, mod: Long): Column =
    pmod(org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.PolyHash(
        org.apache.spark.sql.GraftSqlBridge.expression(id.cast("string")))),
      lit(mod)) === 0

  /** Oracle CTE body selecting the training sample of `src` (one row
    * per vector, `vec_id` column): the same PolyHash-mod predicate
    * with the modulus computed in-query from `COUNT(*)` of `src`.
    */
  def trainSampleSql(src: String): String = {
    val ph = graft.functions.PolyHash.sql("CAST(s.vec_id AS VARCHAR)")
    s"""SELECT s.* FROM $src s,
       |    (SELECT GREATEST(1, CAST(CEIL(COUNT(*) / ${TrainSampleTarget}.0)
       |       AS BIGINT)) AS mm FROM $src) m
       |  WHERE $ph % m.mm = 0""".stripMargin
  }

  /** Decimal-routed fixed-point quantization of a float vector:
    * `round(v * QuantScale)` as long, via DECIMAL(20,4) so both engines
    * round the same digits the same way (float→double is exact, the
    * double multiply is one deterministic IEEE op, and no double value
    * lands exactly on a .5000 four-decimal boundary — dyadic rationals
    * can't — so the only actual tie point is the final half-away-from-
    * zero integer round, identical in both engines).
    */
  def quantize(c: Column): Column =
    transform(c, v =>
      round((v.cast("double") * QuantScale).cast(DecimalType(20, 4)), 0)
        .cast("long"))

  /** [[quantize]] for the oracle. */
  def quantizeSql(x: String): String =
    s"list_transform($x, v -> CAST(ROUND(CAST(CAST(v AS DOUBLE) * $QuantScale " +
      s"AS DECIMAL(20,4)), 0) AS BIGINT))"

  /** The embeddings table quantized: `(vec_id, q)`. */
  def quantized(e: DataFrame): DataFrame =
    e.select(col("vec_id"), quantize(col("embedding")).as("q"))

  /** Exact integer squared-L2 distance from a quantized vector column to
    * a literal centroid.
    */
  private def distTo(q: Column, cent: Array[Long]): Column = {
    val c = array(cent.map(lit(_)): _*)
    aggregate(zip_with(q, c, (a, b) => (a - b) * (a - b)), lit(0L), _ + _)
  }

  /** `(dist, cell)` struct array against literal centroids, with field
    * names pinned by an explicit cast — `array()` over structs
    * normalizes names away otherwise.
    */
  private[operators] def distStructs(q: Column,
      cents: Seq[(Int, Array[Long])]): Column =
    array(cents.map { case (k, c) =>
      struct(distTo(q, c).as("dist"), lit(k).as("cell"))
    }: _*).cast("array<struct<dist:bigint,cell:int>>")

  /** argmin cell for a quantized vector against literal centroids —
    * ties toward the smaller cell id via lexicographic struct-min.
    * Pure map-side: the centroids ride in the expression.
    */
  def cellOf(q: Column, cents: Seq[(Int, Array[Long])]): Column =
    array_min(distStructs(q, cents))("cell")

  /** Round-half-away-from-zero integer division — the centroid-mean
    * arithmetic, in longs so both engines compute identical bits.
    */
  def roundDiv(s: Long, n: Long): Long = {
    val a = (2L * math.abs(s) + n) / (2L * n)
    if (s < 0) -a else a
  }

  /** [[roundDiv]] as oracle SQL over expressions `s`, `n`. */
  def roundDivSql(s: String, n: String): String =
    s"CASE WHEN ($s) >= 0 THEN (2 * ($s) + ($n)) // (2 * ($n)) " +
      s"ELSE -((-2 * ($s) + ($n)) // (2 * ($n))) END"

  /** Train [[K]] centroids by [[Iters]] Lloyd iterations over the
    * deterministic hash sample of a quantized frame. Init = the [[K]]
    * smallest sampled `vec_id`s' vectors, cell ids in that order; an
    * emptied cell keeps its previous centroid.
    *
    * The sampled path COLLECTS the sample (bounded by
    * [[TrainSampleTarget]] by construction) and runs the loop
    * driver-local — the FAISS trainer posture, shared with
    * [[QualityTrain.train]]: an iteration over a ≤250-vector sample is
    * pure arithmetic, and running it as Spark jobs paid [[Iters]]×
    * (assignment + aggregate) of job-scheduling floor to move no data
    * (11.7 s of the sf0.1 artifact build before this). The arithmetic
    * is bit-identical to the distributed form (exact integer L2, ties
    * toward the smaller cell, [[roundDiv]] means), which the oracle
    * replay and the local-replay specs pin.
    *
    * `sampled = false` keeps the distributed per-iteration
    * (cells × dim) aggregate over the FULL frame (checkpoint it first)
    * — the eval knob the sampled-vs-full recall spec turns, never the
    * production path.
    */
  /** Lloyd trainings actually run in this JVM — the plan-guard specs'
    * probe that artifact-mode queries pay ZERO training at query time;
    * nothing else reads it.
    */
  private[graft] val trainsPerformed =
    new java.util.concurrent.atomic.AtomicLong

  def train(quant: DataFrame,
      sampled: Boolean = true): Seq[(Int, Array[Long])] = {
    trainsPerformed.incrementAndGet()
    if (!sampled) return trainDistributed(quant)
    val mod = sampleModulus(quant.count())
    val tq =
      if (mod == 1L) quant
      else quant.filter(inTrainSample(col("vec_id"), mod))
    val sample = tq.select("vec_id", "q").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Long]]("q").toArray))
      .sortBy(_._1)
    require(sample.nonEmpty, "empty training frame")
    // a corpus smaller than K trains min(K, n) centroids — the
    // distributed form's limit(K) degradation, which the tiny streaming
    // intake batches rely on
    var cents: Array[Array[Long]] = sample.take(K).map(_._2.clone)
    val kk = cents.length
    for (_ <- 1 to Iters) {
      val sums = Array.ofDim[Long](kk, cents(0).length)
      val cnts = new Array[Long](kk)
      sample.foreach { case (_, q) =>
        var best = 0
        var bestD = d2(q, cents(0))
        var k = 1
        while (k < kk) {
          val d = d2(q, cents(k))
          if (d < bestD) { bestD = d; best = k } // tie keeps the smaller k
          k += 1
        }
        var i = 0
        while (i < q.length) { sums(best)(i) += q(i); i += 1 }
        cnts(best) += 1
      }
      cents = Array.tabulate(kk)(k =>
        if (cnts(k) == 0L) cents(k)
        else sums(k).map(s => roundDiv(s, cnts(k))))
    }
    cents.zipWithIndex.map { case (c, k) => (k, c) }.toSeq
  }

  /** Exact integer squared L2 between two long arrays (driver-side). */
  private def d2(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** The distributed full-frame Lloyd loop: each iteration one
    * assignment pass + one collected (cells × dim) sum/count aggregate
    * — driver state is vocabulary-sized, never corpus-sized.
    */
  private def trainDistributed(quant: DataFrame): Seq[(Int, Array[Long])] = {
    val init = quant.orderBy("vec_id").limit(K).collect()
      .map(r => r.getAs[scala.collection.Seq[Long]]("q").toArray)
      .zipWithIndex.map { case (q, i) => (i, q) }.toSeq
    (1 to Iters).foldLeft(init) { case (cents, _) =>
      val sums = quant
        .select(cellOf(col("q"), cents).as("cell"),
          posexplode(col("q")).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getAs[Int]("cell"))
      cents.map { case (k, old) =>
        k -> sums.get(k).map { rows =>
          rows.sortBy(_.getAs[Int]("pos"))
            .map(r => roundDiv(r.getAs[Long]("s"), r.getAs[Long]("n")))
            .toArray
        }.getOrElse(old)
      }
    }
  }

  /** [[train]] tolerant of an EMPTY frame: a corpus with no vectors of
    * this kind (e.g. no full-grid images on a schema-minimal fixture)
    * trains ZERO centroids rather than refusing — the artifact builds
    * need a committed (empty) model for such corpora, where the
    * embeddings path's hard `require` would abort the whole
    * materialize. One `isEmpty` probe (a limit-1 job) is the price.
    */
  def trainOrEmpty(quant: DataFrame): Seq[(Int, Array[Long])] =
    if (quant.isEmpty) Seq.empty else train(quant)

  /** Final per-vector cell assignment `(vec_id, cell)` — one map-side
    * pass against the literal centroids. Zero centroids (the
    * [[trainOrEmpty]] empty case — only reachable when the frame
    * itself is empty) keeps the schema and emits no rows.
    */
  def assignFrame(quant: DataFrame, cents: Seq[(Int, Array[Long])]): DataFrame =
    if (cents.isEmpty)
      quant.select(col("vec_id"), lit(null).cast("int").as("cell")).limit(0)
    else quant.select(col("vec_id"), cellOf(col("q"), cents).as("cell"))

  /** Trained centroids as a (cells × dim) frame `(cell, centroid)` —
    * the `ivf_centroids` artifact shape.
    */
  def centroidsFrame(spark: SparkSession,
      cents: Seq[(Int, Array[Long])]): DataFrame = {
    import spark.implicits._
    cents.map { case (k, c) => (k, c.toSeq) }.toDF("cell", "centroid")
  }

  /** Collect an `ivf_centroids`-shaped frame back to literal form. */
  def collectCentroids(df: DataFrame): Seq[(Int, Array[Long])] =
    df.collect().map(r => (r.getAs[Int]("cell"),
      r.getAs[scala.collection.Seq[Long]]("centroid").toArray))
      .sortBy(_._1).toSeq

  /** q125 — trained-IVF recall vs the exact cosine baseline (the q22
    * harness over [[topProbes]] — init-disjoint by construction), per
    * probe: probes pick their [[Nprobe]] nearest cells by the SAME integer
    * distance the training used (ties toward the smaller cell), scan
    * only those cells' vectors via the standing assignment, rerank by
    * float cosine (round6), and score recall@[[TopK]] against q22.
    * Output `(probe_id, n_exact, n_hit, recall)` — the q92 harness
    * applied to the learned index.
    */
  def q125IvfRecall(spark: SparkSession, dir: String): DataFrame = {
    val (cents, cells) = graft.Artifacts.ivfModel(spark, dir)
    ivfRecallFrom(spark, dir, cents, cells)
  }

  /** The q125 recall harness over a caller-supplied trained model —
    * q125 runs it on the standing artifacts; the sampled-vs-full
    * training spec runs it on both trainings to pin the recall band.
    */
  private[graft] def ivfRecallFrom(spark: SparkSession, dir: String,
      cents: Seq[(Int, Array[Long])], cells: DataFrame): DataFrame = {
    val e = Tables.embeddingsFanned(spark, dir)

    // probe → its Nprobe nearest cells, one array column, exploded
    val probeCells = quantized(topProbes(e))
      .select(col("vec_id").as("probe_id"),
        slice(array_sort(distStructs(col("q"), cents)), 1, Nprobe).as("near"))
      .select(col("probe_id"), explode(col("near")("cell")).as("cell"))

    val probeVecs = topProbes(e)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
        VectorOps.norm(col("embedding")).as("pn"))

    val rank = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id").asc)
    val approx = broadcast(probeCells.join(probeVecs, "probe_id"))
      .join(cells.join(e.select(col("vec_id"), col("embedding").as("nv"),
          VectorOps.norm(col("embedding")).as("nn")), "vec_id"),
        "cell")
      .filter(col("probe_id") =!= col("vec_id"))
      .withColumn("cos", VectorOps.round6(
        VectorOps.dot(col("pv"), col("nv")) / (col("pn") * col("nn"))))
      .withColumn("rank", row_number().over(rank))
      .filter(col("rank") <= TopK)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        lit(1).as("hit"))

    val exact = Similarity.cosineTopKFor(spark, dir, topProbes(e))
      .select(col("probe_id"), col("neighbor_id"))
    exact.join(approx, Seq("probe_id", "neighbor_id"), "left")
      .groupBy("probe_id")
      .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
      .withColumn("recall", VectorOps.round6(
        col("n_hit").cast("double") / col("n_exact")))
      .orderBy("probe_id")
  }

  /** Probe budgets swept by [[q143NprobeSweep]]. */
  private[graft] val ProbeSweep: Seq[Int] = 1 to 8

  /** q143 — the IVF probe-budget curve, q141's calibration discipline on
    * the vector side: for every nprobe in [[ProbeSweep]], the q125
    * search (probe → nprobe nearest trained cells by the training
    * distance, float-cosine rerank of those cells' members) is scored
    * against the exact q22 top-[[TopK]], and the sweep reports the
    * averaged recall@[[TopK]] next to the averaged fraction of the
    * corpus scanned. Recall vs scan cost at each budget IS the knob a
    * deployment turns — q125 pins the shipped point
    * (nprobe = [[Nprobe]]); this is the table it was picked from.
    *
    * Scale shape: ONE probe×candidate scoring pass covers the whole
    * sweep — each (probe, member-of-top-[[ProbeSweep]]-cells) pair is
    * scored once, tagged with its cell's coarse RANK, and a pair then
    * counts toward every budget ≥ that rank (a map-side explode of at
    * most |sweep| small ints). Candidate generation reads the standing
    * `ivf_cells`; the coarse ranks are a broadcast (probes × cells)
    * frame; nothing re-trains (the cosine side joins embeddings twice —
    * probe rows and candidate rows — exactly like q125).
    */
  def q143NprobeSweep(spark: SparkSession, dir: String): DataFrame =
    // artifact-first (the lsh_calibration posture, vector side): the
    // sweep is a pure function of the embeddings table and the standing
    // coarse index — a consumer reads the |ProbeSweep|-row table
    graft.Artifacts.annEval(spark, dir, graft.Artifacts.NprobeSweepEvalName)
      .map(_.orderBy("nprobe"))
      .getOrElse(nprobeSweepFrame(spark, dir))

  /** The inline sweep pass — what the standing `eval_nprobe_sweep`
    * table materializes and the rootless fallback runs per query.
    */
  private[graft] def nprobeSweepFrame(spark: SparkSession,
      dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val (cents, cells) = graft.Artifacts.ivfModel(spark, dir)
    val nOther = e.count() - 1

    // probe → every cell with its coarse rank (probes × K rows, broadcast)
    val ranked = quantized(topProbes(e))
      .select(col("vec_id").as("probe_id"),
        posexplode(array_sort(distStructs(col("q"), cents)))
          .as(Seq("crank0", "dc")))
      .select(col("probe_id"), (col("crank0") + 1).as("crank"),
        col("dc")("cell").as("cell"))
      .filter(col("crank") <= ProbeSweep.max)

    val probeVecs = topProbes(e)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
        VectorOps.norm(col("embedding")).as("pn"))
    // each candidate scored ONCE, carrying its coarse rank
    val scored = broadcast(ranked.join(probeVecs, "probe_id"))
      .join(cells.join(e.select(col("vec_id"), col("embedding").as("nv"),
          VectorOps.norm(col("embedding")).as("nn")), "vec_id"), "cell")
      .filter(col("probe_id") =!= col("vec_id"))
      .select(col("probe_id"), col("vec_id"), col("crank"),
        VectorOps.round6(VectorOps.dot(col("pv"), col("nv")) /
          (col("pn") * col("nn"))).as("cos"))
    // fan each pair out to every budget that includes it
    val sweepArr = array(ProbeSweep.map(lit): _*)
    val fanned = scored.select(col("probe_id"), col("vec_id"), col("cos"),
      explode(filter(sweepArr, n => n >= col("crank"))).as("nprobe"))

    val rank = org.apache.spark.sql.expressions.Window
      .partitionBy("nprobe", "probe_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    val approx = fanned
      .withColumn("rank", row_number().over(rank))
      .filter(col("rank") <= TopK)
      .select(col("nprobe"), col("probe_id"),
        col("vec_id").as("neighbor_id"), lit(1).as("hit"))
    val exact = Similarity.cosineTopKFor(spark, dir, topProbes(e))
      .select(col("probe_id"), col("neighbor_id"))
      .crossJoin(spark.createDataFrame(
        spark.sparkContext.parallelize(ProbeSweep.map(org.apache.spark.sql.Row(_))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("nprobe",
            org.apache.spark.sql.types.IntegerType, nullable = false)))))
    // micro-averages: ONE division of two exact long sums per budget —
    // no float accumulation whose order an engine could pick differently
    val recalls = exact
      .join(approx, Seq("nprobe", "probe_id", "neighbor_id"), "left")
      .groupBy("nprobe")
      .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
      .select(col("nprobe"),
        (col("n_hit").cast("double") / col("n_exact")).as("avg_recall"))
    val scanned = fanned.groupBy("nprobe")
      .agg(count(lit(1)).as("n_scanned"))
      .select(col("nprobe"), (col("n_scanned").cast("double") /
        (nOther * NumProbes)).as("avg_scan_frac"))
    recalls.join(scanned, "nprobe")
      .select(col("nprobe"),
        VectorOps.round6(col("avg_recall")).as("avg_recall"),
        VectorOps.round6(col("avg_scan_frac")).as("avg_scan_frac"))
      .orderBy("nprobe")
  }

  /** [[cellsCtes]] + coarse ranks + the one-pass scored/fanned sweep —
    * averages computed the same way (per-probe ratios, then AVG).
    */
  lazy val q143OracleSql: String = {
    val dist = "list_sum(list_transform(generate_series(1, len(q)), " +
      "i -> (q[i] - c[i]) * (q[i] - c[i])))"
    val ncos = VectorOps.round6Sql(
      VectorOps.cosineSql("pv.embedding", "e.embedding"))
    val sweepMax = ProbeSweep.max
    s"""WITH ${cellsCtes}, ranked AS (
       |  SELECT vec_id AS probe_id, cell, crank FROM (
       |    SELECT v.vec_id, c.cell,
       |           row_number() OVER (PARTITION BY v.vec_id
       |             ORDER BY $dist, c.cell) AS crank
       |    FROM quant v CROSS JOIN cent$Iters c
       |    WHERE ${probeInSql("v")}
       |  ) WHERE crank <= $sweepMax
       |), scored AS (
       |  SELECT r.probe_id, e.vec_id, r.crank, $ncos AS cos
       |  FROM ranked r
       |  JOIN cells cl ON r.cell = cl.cell
       |  JOIN embeddings e ON cl.vec_id = e.vec_id
       |  JOIN embeddings pv ON r.probe_id = pv.vec_id
       |  WHERE e.vec_id <> r.probe_id
       |), fanned AS (
       |  SELECT s.probe_id, s.vec_id, s.cos, n.nprobe
       |  FROM scored s
       |  JOIN (SELECT unnest(generate_series(${ProbeSweep.min},
       |          $sweepMax)) AS nprobe) n
       |    ON n.nprobe >= s.crank
       |), approx AS (
       |  SELECT nprobe, probe_id, vec_id AS neighbor_id FROM (
       |    SELECT nprobe, probe_id, vec_id,
       |           row_number() OVER (PARTITION BY nprobe, probe_id
       |             ORDER BY cos DESC, vec_id ASC) AS rank
       |    FROM fanned
       |  ) WHERE rank <= $TopK
       |), exact AS (
       |  SELECT probe_id, neighbor_id FROM (
       |${Similarity.cosineTopKSqlFor(probeInSql("p"))}
       |  )
       |), recalls AS (
       |  SELECT n.nprobe,
       |         CAST(COUNT(a.neighbor_id) AS DOUBLE) / COUNT(*)
       |           AS avg_recall
       |  FROM exact e
       |  CROSS JOIN (SELECT unnest(generate_series(${ProbeSweep.min},
       |                $sweepMax)) AS nprobe) n
       |  LEFT JOIN approx a ON a.nprobe = n.nprobe
       |    AND a.probe_id = e.probe_id AND a.neighbor_id = e.neighbor_id
       |  GROUP BY n.nprobe
       |), scanned AS (
       |  SELECT nprobe,
       |         CAST(COUNT(*) AS DOUBLE) /
       |           (((SELECT COUNT(*) FROM embeddings) - 1) * $NumProbes)
       |           AS avg_scan_frac
       |  FROM fanned GROUP BY nprobe
       |)
       |SELECT r.nprobe,
       |       ${VectorOps.round6Sql("r.avg_recall")} AS avg_recall,
       |       ${VectorOps.round6Sql("s.avg_scan_frac")} AS avg_scan_frac
       |FROM recalls r JOIN scanned s ON r.nprobe = s.nprobe
       |ORDER BY r.nprobe""".stripMargin
  }

  /** q147 — IVF cell-balance audit: per trained cell, its population,
    * population share, and the imbalance factor (pop / ideal-even-pop)
    * — plus empty trained cells carried explicitly as zero rows. The
    * index-health number a deployment actually watches: a hot cell is
    * a hot partition (every probe routed there scans it), and recall
    * collapses toward brute force as imbalance grows; q143 prices the
    * probe budget, this says whether the partitioning those budgets
    * assume is still true. Reads the standing `ivf_cells`/
    * `ivf_centroids`; one K-row aggregate.
    */
  def q147CellBalance(spark: SparkSession, dir: String): DataFrame = {
    val (cents, cells) = graft.Artifacts.ivfModel(spark, dir)
    import spark.implicits._
    val spine = cents.map(_._1).toDF("cell")
    val n = cells.count()
    spine.join(cells.groupBy("cell").agg(count(lit(1)).as("pop")),
        Seq("cell"), "left")
      .select(col("cell"), coalesce(col("pop"), lit(0L)).as("pop"))
      .select(col("cell"), col("pop"),
        VectorOps.round6(col("pop").cast("double") / n).as("share"),
        VectorOps.round6(col("pop").cast("double") * K / n)
          .as("imbalance"))
      .orderBy("cell")
  }

  /** q152 — training-sample drift audit: per trained cell, the CORPUS
    * share of its population beside the TRAINING SAMPLE's share of its
    * members assigned there, and the signed drift between them. The
    * sampled-training health check a deployment actually watches: the
    * codebooks were fit on the hash sample, so if the sample's cell
    * distribution diverges from the corpus's (corpus grew or shifted
    * since the snapshot), the sample no longer represents what the
    * index serves and the snapshot is due for retraining — q147 says
    * whether cells are BALANCED, this says whether the sample that
    * shaped them still LOOKS LIKE the corpus. Shares are exact-count
    * ratios (one double division each, round6); empty cells carry
    * explicit zeros on both sides.
    *
    * Scale shape: reads the standing `ivf_cells` assignment; the
    * sample flag is the map-side PolyHash-mod predicate; one K-row
    * aggregate — no training, no vector touched.
    */
  def q152SampleDrift(spark: SparkSession, dir: String): DataFrame = {
    val (cents, cells) = graft.Artifacts.ivfModel(spark, dir)
    import spark.implicits._
    val spine = cents.map(_._1).toDF("cell")
    val mod = sampleModulus(cells.count())
    val flagged = cells.select(col("cell"),
      inTrainSample(col("vec_id"), mod).cast("long").as("in_sample"))
    val agg = flagged.groupBy("cell")
      .agg(count(lit(1)).as("pop"), sum("in_sample").as("sample_pop"))
    // totals as unpartitioned windows over the bounded K-row cell frame
    // (empty cells carry explicit zeros, so summing after the spine join
    // is identical) — one stage instead of an aggregate job + broadcast
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    spine.join(agg, Seq("cell"), "left")
      .select(col("cell"), coalesce(col("pop"), lit(0L)).as("pop"),
        coalesce(col("sample_pop"), lit(0L)).as("sample_pop"))
      .withColumn("n", sum("pop").over(w))
      .withColumn("sn", sum("sample_pop").over(w))
      .select(col("cell"), col("pop"), col("sample_pop"),
        VectorOps.round6(col("pop").cast("double") / col("n"))
          .as("corpus_share"),
        VectorOps.round6(col("sample_pop").cast("double") / col("sn"))
          .as("sample_share"),
        VectorOps.round6(col("sample_pop").cast("double") / col("sn") -
          col("pop").cast("double") / col("n")).as("share_drift"))
      .orderBy("cell")
  }

  /** [[cellsCtes]] + the same sample predicate over the assignment +
    * one K-row aggregate with the identical share arithmetic.
    */
  lazy val q152OracleSql: String = {
    val ph = graft.functions.PolyHash.sql("CAST(cl.vec_id AS VARCHAR)")
    s"""WITH ${cellsCtes}, smod AS (
       |  SELECT GREATEST(1, CAST(CEIL(COUNT(*) / ${TrainSampleTarget}.0)
       |    AS BIGINT)) AS mm FROM cells
       |), agg AS (
       |  SELECT cl.cell, COUNT(*) AS pop,
       |         CAST(SUM(CASE WHEN $ph % m.mm = 0 THEN 1 ELSE 0 END)
       |           AS BIGINT) AS sample_pop
       |  FROM cells cl, smod m
       |  GROUP BY cl.cell
       |), tot AS (
       |  SELECT CAST(SUM(pop) AS BIGINT) AS n,
       |         CAST(SUM(sample_pop) AS BIGINT) AS sn
       |  FROM agg
       |)
       |SELECT s.cell, COALESCE(a.pop, 0) AS pop,
       |       COALESCE(a.sample_pop, 0) AS sample_pop,
       |       ${VectorOps.round6Sql(
            "CAST(COALESCE(a.pop, 0) AS DOUBLE) / t.n")} AS corpus_share,
       |       ${VectorOps.round6Sql(
            "CAST(COALESCE(a.sample_pop, 0) AS DOUBLE) / t.sn")}
       |         AS sample_share,
       |       ${VectorOps.round6Sql(
            """CAST(COALESCE(a.sample_pop, 0) AS DOUBLE) / t.sn
       |         - CAST(COALESCE(a.pop, 0) AS DOUBLE) / t.n""".stripMargin)}
       |         AS share_drift
       |FROM cent$Iters s LEFT JOIN agg a ON s.cell = a.cell, tot t
       |ORDER BY s.cell""".stripMargin
  }

  /** [[cellsCtes]] + a K-row spine (trained cells, empty ones included)
    * + the same single aggregate.
    */
  lazy val q147OracleSql: String =
    s"""WITH ${cellsCtes}, pop AS (
       |  SELECT cell, COUNT(*) AS pop FROM cells GROUP BY cell
       |), n AS (SELECT COUNT(*) AS n FROM cells)
       |SELECT s.cell, CAST(COALESCE(p.pop, 0) AS BIGINT) AS pop,
       |       ${VectorOps.round6Sql(
             "CAST(COALESCE(p.pop, 0) AS DOUBLE) / n.n")} AS share,
       |       ${VectorOps.round6Sql(
             s"CAST(COALESCE(p.pop, 0) AS DOUBLE) * $K / n.n")} AS imbalance
       |FROM cent$Iters s LEFT JOIN pop p ON s.cell = p.cell, n
       |ORDER BY s.cell""".stripMargin

  /** The oracle's training replay: CTEs `quant`, the hash-sampled
    * `tquant` ([[trainSampleSql]]), `cent0`, then per iteration an
    * assignment (`a<i>`, over the SAMPLE — the corpus-wide scan is only
    * the final `cells`) and an update (`cent<i>`), all generated from
    * the same [[K]]/[[Iters]]/[[QuantScale]]/[[TrainSampleTarget]]
    * constants the Spark side trains with.
    */
  /** The oracle's Lloyd training replay (`quant` … `cent[[Iters]]`) with
    * the quantized-source CTE body supplied by the caller — what lets
    * the image-vector IVF (q175) replay the SAME chain over
    * grid-derived vectors instead of the embeddings table (one training
    * replay, two vector spaces).
    */
  private[operators] def trainingSqlFrom(quantBody: String): String = {
    val dist = "list_sum(list_transform(generate_series(1, len(q)), " +
      "i -> (q[i] - c[i]) * (q[i] - c[i])))"
    val iters = (1 to Iters).map { it =>
      s"""a$it AS (
         |  SELECT vec_id, q, cell FROM (
         |    SELECT v.vec_id, v.q, c.cell,
         |           row_number() OVER (PARTITION BY v.vec_id
         |             ORDER BY $dist, c.cell) AS rn
         |    FROM tquant v CROSS JOIN (SELECT cell, c FROM cent${it - 1}) c
         |  ) WHERE rn = 1
         |), sums$it AS (
         |  SELECT cell, i, CAST(SUM(v) AS BIGINT) AS s,
         |         COUNT(*) AS n
         |  FROM (SELECT cell, generate_subscripts(q, 1) AS i,
         |               unnest(q) AS v FROM a$it)
         |  GROUP BY cell, i
         |), cent$it AS MATERIALIZED (
         |  SELECT p.cell,
         |         COALESCE(u.c, p.c) AS c
         |  FROM cent${it - 1} p LEFT JOIN (
         |    SELECT cell, list(${roundDivSql("s", "n")} ORDER BY i) AS c
         |    FROM sums$it GROUP BY cell
         |  ) u ON p.cell = u.cell
         |)""".stripMargin
    }.mkString(", ")
    s"""quant AS MATERIALIZED (
       |  $quantBody
       |), tquant AS MATERIALIZED (
       |  ${trainSampleSql("quant")}
       |), cent0 AS MATERIALIZED (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cell,
       |         q AS c
       |  FROM (SELECT vec_id, q FROM tquant ORDER BY vec_id LIMIT $K)
       |), $iters""".stripMargin
  }

  /** [[cellsCtes]] over a caller-supplied quantized-source CTE body;
    * `cellName` renames the final assignment CTE for callers whose WITH
    * already owns a `cells` (q175 composes with the grid replay).
    */
  private[operators] def cellsCtesFrom(quantBody: String,
      cellName: String = "cells"): String = {
    val dist = "list_sum(list_transform(generate_series(1, len(q)), " +
      "i -> (q[i] - c[i]) * (q[i] - c[i])))"
    s"""${trainingSqlFrom(quantBody)},
       |$cellName AS MATERIALIZED (
       |  SELECT vec_id, cell FROM (
       |    SELECT v.vec_id, c.cell,
       |           row_number() OVER (PARTITION BY v.vec_id
       |             ORDER BY $dist, c.cell) AS rn
       |    FROM quant v CROSS JOIN cent$Iters c
       |  ) WHERE rn = 1
       |)""".stripMargin
  }

  /** CTE chain `quant, cent0…cent[[Iters]], cells` — the oracle's replay
    * of training + final assignment, shared by the q125 and q130 oracles
    * so the two can never train different models.
    */
  private[operators] lazy val cellsCtes: String = cellsCtesFrom(
    s"SELECT vec_id, ${quantizeSql("embedding")} AS q FROM embeddings")

  lazy val q125OracleSql: String = {
    val dist = "list_sum(list_transform(generate_series(1, len(q)), " +
      "i -> (q[i] - c[i]) * (q[i] - c[i])))"
    val ncos = VectorOps.round6Sql(VectorOps.cosineSql("pv.embedding", "e.embedding"))
    val recall = VectorOps.round6Sql(
      "CAST(COUNT(a.neighbor_id) AS DOUBLE) / COUNT(*)")
    s"""WITH ${cellsCtes}, probe_cells AS (
       |  SELECT vec_id AS probe_id, cell FROM (
       |    SELECT v.vec_id, c.cell,
       |           row_number() OVER (PARTITION BY v.vec_id
       |             ORDER BY $dist, c.cell) AS rn
       |    FROM quant v CROSS JOIN cent$Iters c
       |    WHERE ${probeInSql("v")}
       |  ) WHERE rn <= $Nprobe
       |), approx AS (
       |  SELECT probe_id, neighbor_id FROM (
       |    SELECT pc.probe_id, e.vec_id AS neighbor_id,
       |           row_number() OVER (PARTITION BY pc.probe_id
       |             ORDER BY $ncos DESC, e.vec_id ASC) AS rank
       |    FROM probe_cells pc
       |    JOIN cells cl ON pc.cell = cl.cell
       |    JOIN embeddings e ON cl.vec_id = e.vec_id
       |    JOIN embeddings pv ON pc.probe_id = pv.vec_id
       |    WHERE e.vec_id <> pc.probe_id
       |  ) WHERE rank <= $TopK
       |), exact AS (
       |  SELECT probe_id, neighbor_id FROM (
       |${Similarity.cosineTopKSqlFor(probeInSql("p"))}
       |  )
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

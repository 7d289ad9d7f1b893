package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated star-schema parquet tables (TESTDATA.md).
  *
  * The reference engine's storage layer is a SQLite star schema created from
  * declared DDL (reference `schema.sql:4-40`, executed at `etl.py:35-44`).
  * Here the at-rest format is Parquet: schemas travel with the files, scans
  * are columnar, and Catalyst prunes columns / pushes predicates into the
  * scan — subsuming the role of the reference's six B-tree indexes
  * (`schema.sql:43-48`).
  */
object Tables {
  // DataFrames are immutable logical plans — safe to share. Caching them
  // avoids re-listing the directory and re-reading parquet footers for
  // every one of the 36 contract queries in a Verify/Bench run.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, sfDir, name),
      _ => spark.read.parquet(s"$sfDir/$name.parquet"))

  /** Fan a small single-split input out across the cores — for HEAVY
    * per-row consumers only.
    *
    * A parquet file below `spark.sql.files.maxPartitionBytes` arrives as
    * ONE scan task, and every per-row projection that fuses with the scan
    * (tokenization, shingling, regex language id, vector arithmetic) then
    * runs on one core while the rest of the machine idles — the
    * unsplittable-input skew of the optimization guide (§2.5), measured
    * here as ~350 ms single-task stages on a 32-core session. One hash
    * repartition on the table key buys parallelism for those projections;
    * the shuffled bytes are the table itself (hundreds of KB), orders of
    * magnitude below the projection work it parallelizes.
    *
    * Deliberately NOT applied to every read: a many-task SQL stage costs
    * ~15-50 ms of fixed per-task setup in this environment, so fanning a
    * metadata-only read (doc_id/lang/source projections feeding a tiny
    * aggregate) buys nothing and pays an exchange plus a stage of task
    * overhead — measured as consistent 2-3× regressions on those queries.
    * The fan width is capped ([[FanWidth]]): the point is to shrink a
    * ~350 ms single-core stage to tens of ms, after which per-task
    * overhead dominates and more tasks only add straggler surface.
    *
    * Scale posture: the guard is the INPUT's estimated size, not a local
    * constant — at production scale a scan has >= cores splits (size >>
    * maxPartitionBytes) and this is a no-op, so plans are unchanged where
    * the scan already parallelizes. Decision cached per (session, dir,
    * table); correctness is partition-layout-independent (every declared
    * query orders its output explicitly).
    */
  private def fanOut(spark: SparkSession, sfDir: String, name: String,
      key: String): DataFrame =
    cache.computeIfAbsent((spark, sfDir, name + "#fanout"), _ => {
      val base = table(spark, sfDir, name)
      val cores = spark.sparkContext.defaultParallelism
      val singleSplit = base.queryExecution.optimizedPlan.stats.sizeInBytes <
        spark.sessionState.conf.filesMaxPartitionBytes
      if (cores > 1 && singleSplit &&
          !sys.env.contains("SPARK_GRAFT_NO_FANOUT"))
        base.repartition(math.min(cores, FanWidth), col(key))
      else base
    })

  /** Cap on fan-out width (override: SPARK_GRAFT_FANOUT). */
  private lazy val FanWidth: Int =
    sys.env.get("SPARK_GRAFT_FANOUT").map(_.toInt).getOrElse(8)

  /** Drop cached handles for `sfDir` — required after an IN-PLACE rewrite
    * of a table under it (the cached DataFrame pins the file listing from
    * read time; Spark's own posture is `REFRESH TABLE` in that case).
    * Immutable snapshot dirs — the 100 TB norm, and what
    * `Artifacts.corpusFingerprint` keys on — never need this.
    */
  def invalidate(sfDir: String): Unit = {
    cache.keySet().removeIf(_._2 == sfDir)
    // the artifact layer memoizes the corpus fingerprint per dir; an
    // in-place rewrite invalidates that listing too
    Artifacts.invalidateFingerprint(sfDir)
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` arrives in one of two physical encodings depending on
    * the generator vintage, and this adapter normalizes BOTH to the same
    * logical pair: `ts` as a TimestampType for event-time ops (windows,
    * watermarks) and `ts_ns` as an epoch-nanosecond long for total
    * ordering (upsert version ordering must match the oracle's sort at
    * full stored precision).
    *
    *  - parquet `TIMESTAMP(NANOS)`: Spark's reader rejects it outright
    *    ([PARQUET_TYPE_ILLEGAL]), so it is read as a raw ns long
    *    (`spark.sql.legacy.parquet.nanosAsLong`) and `ts` is the
    *    µs-truncated derivation;
    *  - parquet `timestamp[us]`, not UTC-adjusted (read as
    *    TIMESTAMP_NTZ): the stored wall clock IS the epoch reading —
    *    `ts_ns` measures it against the NTZ epoch with `timestampdiff`,
    *    which is SESSION-TIMEZONE-FREE, where a cast-then-unix_micros
    *    would shift by the session offset (DuckDB's `epoch_us` over the
    *    same naive timestamp applies no zone either — the two must
    *    agree in any session);
    *  - parquet `timestamp[us]`, UTC-adjusted (read as TimestampType):
    *    already an instant; `unix_micros` is zone-free on instants.
    *
    * Oracle-side convention either way: compare timestamps via
    * `epoch_us(ts)` and order via raw `ts` ⇔ Spark `ts_ns` (DuckDB reads
    * every encoding as a native timestamp, so the oracle SQL is
    * vintage-independent).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    val normalized = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts_ns", expr(
          "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) * 1000"))
          .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
      case _ =>
        raw.withColumn("ts_ns", expr("unix_micros(ts) * 1000"))
    }
    normalized
      .select("event_id", "ts", "ts_ns", "user_id", "event_type", "value", "props")
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `documents` fanned across cores — use at call sites whose scan-side
    * projection is expensive (tokenize / shingle / regex / media decode),
    * never for metadata-only reads. See [[fanOut]].
    */
  def documentsFanned(s: SparkSession, d: String): DataFrame =
    fanOut(s, d, "documents", "doc_id")

  /** `embeddings` fanned across cores — for vector-arithmetic consumers
    * (distance evals, quantization); see [[fanOut]].
    */
  def embeddingsFanned(s: SparkSession, d: String): DataFrame =
    fanOut(s, d, "embeddings", "vec_id")
}

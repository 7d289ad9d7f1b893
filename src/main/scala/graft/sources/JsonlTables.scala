package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL (newline-delimited JSON) source — the interchange format raw
  * training corpora actually arrive in. The reference has no JSON source
  * (CSV + SQLite only, `etl.py:55-66`); this extends the engine's source
  * surface the same way `CsvTables` does for CSV.
  *
  * Scale rules encoded here:
  *   - Schema is DECLARED, never inferred: inference is a full extra pass
  *     over the data — a second 100 TB scan before the first real one.
  *   - Malformed lines are ROUTED, not fatal and not silently dropped:
  *     PERMISSIVE mode with a corrupt-record column splits the input into
  *     (clean, rejects) in ONE scan, the load-time analogue of
  *     `EtlOps.checkViolations`' report-and-route stance. A 100 TB crawl
  *     always contains broken lines; FAILFAST turns one of them into a
  *     dead job, and dropping them silently corrupts corpus accounting.
  */
object JsonlTables {

  /** Column JSON parse failures are routed to. */
  val CorruptCol = "_corrupt_record"

  /** Read JSONL with a declared schema; malformed lines yield nulls in
    * data columns and the raw line in [[CorruptCol]].
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(StructField(CorruptCol, StringType, nullable = true)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** One-scan split into (clean rows without the corrupt column, raw
    * rejected lines). Spark requires caching the parsed frame before
    * filtering on the corrupt column (the parser otherwise prunes the
    * data columns the predicate needs); the cache here is the parsed
    * batch, released by the caller via `unpersist` on either half's
    * completion — at 100 TB, route rejects to a quarantine sink in the
    * same pass.
    */
  def readRouted(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val parsed = read(spark, path, schema).cache()
    val clean = parsed.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val rejects = parsed.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (clean, rejects)
  }

  /** Write JSONL (one object per line), the symmetric sink. */
  def write(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)
}

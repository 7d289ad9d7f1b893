package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S1/S2 — header-CSV ingestion with declared schemas (reference
  * `etl.py:161,176-183` reads MovieLens CSVs via pandas inference; we pin
  * the schema explicitly per SURVEY.md §1.4 — inference is a scan of the
  * whole input at 100 TB and a correctness hazard besides).
  *
  * Quoting defaults (`"` quotes, embedded commas and quote-escaping)
  * match the pandas/RFC4180 behavior the reference relies on for titles
  * like `"American President, The (1995)"` (FIXTURES.md §1; locked in by
  * `CsvTablesSpec`).
  */
object CsvTables {

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"") // RFC4180 doubled-quote escaping, as pandas
      .option("mode", "FAILFAST") // surface malformed rows, don't null them
      .schema(schema)
      .csv(path)

  def write(df: DataFrame, path: String): Unit =
    df.write
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .mode("overwrite")
      .csv(path)
}

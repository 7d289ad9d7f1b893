package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned parquet layout for the fact tables — the at-rest
  * organization a 100 TB events store needs: `event_date=.../ part-*.parquet`
  * directories so date predicates prune whole partitions at planning time
  * (visible as `PartitionFilters` in the scan node) instead of reading
  * and filtering 100 TB.
  *
  * The reference's SQLite B-tree index on time-adjacent keys
  * (`schema.sql:43`) plays this role on a single node; partition pruning
  * is its distributed analog.
  */
object PartitionedLayout {

  /** Write with a derived `event_date` partition column. */
  def writeByDate(events: DataFrame, path: String): Unit =
    events.withColumn("event_date", to_date(col("ts")))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("event_date")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}

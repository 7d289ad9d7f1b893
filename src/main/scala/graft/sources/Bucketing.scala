package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the co-located-join tool for repeated large
  * joins on a stable key (orders ⋈ lineitem on orderkey is the canonical
  * case). Both tables hash-bucketed on the join key into the same bucket
  * count join with NO shuffle exchange on either side: each task reads
  * bucket i of both tables. At 100 TB this converts the biggest recurring
  * shuffle in the workload into a metadata decision at write time.
  *
  * (The reference's analog is SQLite's clustered B-tree primary keys —
  * `schema.sql:4-40` — which make its nested-loop joins index lookups.)
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets, so
    * merge-join needs no sort either). Drops any prior table AND its
    * leftover warehouse directory first — a fresh metastore with a stale
    * managed-table location otherwise fails CREATE with
    * [LOCATION_ALREADY_EXISTS]. Multi-key bucketing composes: the join
    * that skips its exchange must use ALL bucket keys.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      numBuckets: Int): Unit = {
    require(keys.nonEmpty, "bucketed write needs at least one key")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}

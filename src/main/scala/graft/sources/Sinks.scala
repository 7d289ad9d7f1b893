package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.operators.EtlOps

/** The reference's load-phase sink semantics (SURVEY.md §2.1 S5–S10) as
  * parquet write operations.
  *
  * Vanilla Spark has no multi-table transaction (reference
  * `etl.py:270-274` wraps the whole load in commit/rollback); the semantic
  * the reference actually relies on is per-table idempotency, which
  * overwrite-by-key delivers. In a Delta/Iceberg deployment each of these
  * becomes a `MERGE INTO` / transactional append; the dataflow shapes
  * below are exactly the MERGE bodies.
  */
object Sinks {

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }

  private def readIfExists(spark: SparkSession, path: String): Option[DataFrame] =
    if (exists(spark, path)) Some(spark.read.parquet(path)) else None

  /** S5 — `INSERT OR REPLACE` keyed upsert (reference `etl.py:238-244`):
    * last write wins per key, idempotent. Existing rows and updates are
    * unioned, then reduced to the newest row per key ordered by
    * `versionCols`. The union+window shuffles once on the key — the
    * partitioning a MERGE would use.
    */
  def upsertByKey(spark: SparkSession, path: String, updates: DataFrame,
      keys: Seq[String], versionCols: Seq[String]): Unit = {
    val merged = readIfExists(spark, path) match {
      case Some(existing) => existing.unionByName(updates)
      case None => updates
    }
    // Aggregate (map-side-reducing) form: hot keys never concentrate on
    // one reducer, and replayed/duplicate updates collapse identically.
    val latest = EtlOps.latestByKeyAgg(merged, keys, versionCols)
    // Overwrite of the path we just read: materialize via a staging dir +
    // atomic-ish swap (a self-overwrite would delete its own input mid-scan).
    val tmp = path + "__stage"
    latest.write.mode(SaveMode.Overwrite).parquet(tmp)
    spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(path)
    val p = new org.apache.hadoop.fs.Path(tmp)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** S6/S7 — `INSERT OR IGNORE` (reference `etl.py:248-258`): append only
    * rows whose key is absent (anti-join against the existing keys).
    */
  def insertIfAbsent(spark: SparkSession, path: String, incoming: DataFrame,
      keys: Seq[String]): Unit =
    readIfExists(spark, path) match {
      case Some(existing) =>
        EtlOps.insertIfAbsent(existing, incoming, keys)
          .write.mode(SaveMode.Append).parquet(path)
      case None =>
        incoming.dropDuplicates(keys).write.mode(SaveMode.Overwrite).parquet(path)
    }

  /** S8 — conditional bulk append (reference `etl.py:262-268`): load only
    * if the target is empty — the reference's idempotency guard for the
    * ratings fact table.
    */
  def appendIfEmpty(spark: SparkSession, path: String, df: DataFrame): Unit = {
    val empty = readIfExists(spark, path).forall(_.isEmpty)
    if (empty) df.write.mode(SaveMode.Overwrite).parquet(path)
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Blocked fuzzy self-join — approximate string matching as a JOIN, the
  * entity-resolution primitive (dirty catalog dedup, alias detection).
  * The universal shape is block → verify: an equi-join on a cheap
  * blocking key bounds the candidate set, and the expensive edit-distance
  * verifier runs only inside blocks — never all-pairs.
  */
object FuzzyJoin {

  /** Edit-distance threshold for [[q79FuzzyMatch]]. */
  val MaxEditDistance = 2

  /** Per-block candidate cap: blocks (noun groups) larger than this are
    * dropped before the self-join, the same hot-bucket bound as
    * MinHash/SimHash banding ([[Dedup.MaxBucketPop]]) — a degenerate
    * blocking key (every name sharing one noun) must not recreate the
    * all-pairs join that blocking exists to prevent.
    */
  val MaxBlockPop = 1024

  /** q79 — fuzzy-match the part-name vocabulary against itself: names
    * sharing a last word (the blocking key) within Levenshtein distance
    * [[MaxEditDistance]], enriched with how many catalog rows carry each
    * name. Matching runs at NAME grain — the distinct-name table is
    * orders of magnitude smaller than the catalog, and row counts join
    * back on the name afterwards (dimension-sized, broadcast).
    *
    * Parity: Levenshtein is the classic DP edit distance in both engines
    * — integer, exact.
    *
    * Scale: one distinct to name grain (map-side partial), a blocked
    * self-equi-join with per-block population capped at [[MaxBlockPop]],
    * and the O(len²) verifier only inside blocks. At 100 TB the name
    * table is the thing that grows; the cap keeps any one block's
    * fan-out bounded, and a smarter key (phonetic code, length band +
    * prefix) drops in as the blocking expression without changing the
    * join shape.
    */
  def q79FuzzyMatch(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(spark, dir)
      .groupBy(col("p_name").as("name")).agg(count(lit(1)).as("n_parts"))
    val blocked = names
      .withColumn("block", element_at(split(col("name"), " "), -1))
    val capped = blocked.withColumn("block_pop",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("block")))
      .filter(col("block_pop") <= MaxBlockPop)
    val a = capped.select(col("block"), col("name").as("name_a"),
      col("n_parts").as("n_parts_a"))
    val b = capped.select(col("block"), col("name").as("name_b"),
      col("n_parts").as("n_parts_b"))
    a.join(b, "block")
      .filter(col("name_a") < col("name_b"))
      .withColumn("edit_dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("edit_dist") <= MaxEditDistance)
      .select(col("name_a"), col("name_b"), col("edit_dist"),
        col("n_parts_a"), col("n_parts_b"))
      .orderBy("name_a", "name_b")
  }

  lazy val q79OracleSql: String =
    s"""WITH names AS (
      |  SELECT p_name AS name, COUNT(*) AS n_parts
      |  FROM part GROUP BY p_name
      |), blocked AS (
      |  SELECT name, n_parts,
      |         string_split(name, ' ')[-1] AS block,
      |         COUNT(*) OVER (PARTITION BY string_split(name, ' ')[-1])
      |           AS block_pop
      |  FROM names
      |), capped AS (
      |  SELECT * FROM blocked WHERE block_pop <= $MaxBlockPop
      |)
      |SELECT a.name AS name_a, b.name AS name_b,
      |       CAST(levenshtein(a.name, b.name) AS INTEGER) AS edit_dist,
      |       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
      |FROM capped a JOIN capped b
      |  ON a.block = b.block AND a.name < b.name
      |WHERE levenshtein(a.name, b.name) <= $MaxEditDistance
      |ORDER BY name_a, name_b""".stripMargin
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md "partitioning & shuffle" scale
  * notes). AQE's skew-join handling covers sort-merge joins at runtime;
  * explicit salting remains the tool for pathological hot keys (the
  * "null genre" / "Unknown director" style hubs this domain produces —
  * e.g. the reference's default-enriched `director='Unknown'` covers ALL
  * 9,742 movies).
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, with the big side's hot keys
    * spread over `saltFactor` shuffle partitions: the big side gets a
    * deterministic per-row salt and the small side is replicated once per
    * salt value, so no single reducer receives a whole hot key.
    *
    * Result equality with the plain join is exact (asserted in
    * `SkewSpec`); cost is `saltFactor`× replication of the small side —
    * use for genuinely skewed keys, not as a default.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor.toLong))
        .cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (key, salt), then final-aggregate on key. `sum`/`count`-shaped
    * aggregates compose exactly; pass the partial and final forms.
    */
  def saltedAggregate(df: DataFrame, key: String, saltFactor: Int,
      partial: Seq[Column], finalAgg: Seq[Column]): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(finalAgg.head, finalAgg.tail: _*)
}

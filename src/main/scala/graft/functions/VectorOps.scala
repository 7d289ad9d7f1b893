package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.functions._

/** Dense-vector column math over `array<float>` embeddings, built from
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no UDFs, so
  * similarity scans stay inside whole-stage codegen.
  *
  * All arithmetic is promoted to double BEFORE accumulation and folds run
  * sequentially left-to-right — the same evaluation order DuckDB's list
  * kernels use — so oracle scores match bit-for-bit (belt-and-braces:
  * query outputs still round through decimal).
  */
object VectorOps {

  /** Σ aᵢ·bᵢ in double — the native [[DotProduct]] expression (codegen'd
    * primitive loop; the equivalent `zip_with`+`aggregate` HOF form runs
    * interpreted and was 50× slower on the sf0.1 pair scan).
    */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** ‖a‖₂ in double. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity dot/(‖a‖·‖b‖) in double; a zero-norm operand
    * yields 0, not 0/0 — Spark's NaN would round to NULL while the
    * DuckDB oracle's would ERROR on the decimal cast, a cross-engine
    * divergence on degenerate vectors (e.g. an all-NUL document's grid
    * embedding). "No shared direction" is the honest score anyway.
    */
  def cosine(a: Column, b: Column): Column = {
    val den = norm(a) * norm(b)
    when(den === 0.0, lit(0.0)).otherwise(dot(a, b) / den)
  }

  /** Oracle-side cosine matching [[cosine]]'s formula exactly:
    * `list_inner_product` on double lists, norms multiplied separately,
    * the same zero-norm → 0 guard.
    */
  def cosineSql(a: String, b: String): String = {
    val na = s"sqrt(list_inner_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[])))"
    val nb = s"sqrt(list_inner_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[])))"
    s"(CASE WHEN $na * $nb = 0 THEN 0.0 ELSE " +
      s"list_inner_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])) / " +
      s"($na * $nb) END)"
  }

  /** Element-wise mean of a vector column — the custom
    * [[VectorCentroid]] `TypedImperativeAggregate`.
    */
  def vectorCentroid(c: Column): Column =
    GraftSqlBridge.column(
      VectorCentroid(GraftSqlBridge.expression(c)).toAggregateExpression())

  /** round(x, 6) through decimal for cross-engine determinism (same
    * rationale as [[Parity.round2]]).
    */
  def round6(c: Column): Column =
    round(c.cast(org.apache.spark.sql.types.DecimalType(24, 12)), 6)
      .cast("double")

  def round6Sql(expr: String): String =
    s"CAST(ROUND(CAST($expr AS DECIMAL(24,12)), 6) AS DOUBLE)"
}

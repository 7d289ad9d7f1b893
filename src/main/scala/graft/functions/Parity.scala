package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine numeric parity helpers.
  *
  * The reference's only math scalar is `ROUND(x, 2)` (reference
  * `queries.sql:21,51`). SQLite and DuckDB round doubles half-away-from-zero
  * while Spark's `round` on DoubleType goes through HALF_UP on the decimal
  * representation — near-boundary values can disagree. Routing through an
  * explicit high-precision decimal makes both engines round the same digits
  * the same way; the final cast back to double yields bit-identical output
  * for the 2-decimal values involved (SURVEY.md §7.4.2).
  *
  * Oracle-side equivalent: `CAST(ROUND(CAST(x AS DECIMAL(20,10)), 2) AS DOUBLE)`.
  */
object Parity {
  /** round(x, 2) with deterministic cross-engine semantics, as double. */
  def round2(c: Column): Column =
    round(c.cast(DecimalType(20, 10)), 2).cast("double")

  /** Oracle SQL fragment matching [[round2]]. */
  def round2Sql(expr: String): String =
    s"CAST(ROUND(CAST($expr AS DECIMAL(20,10)), 2) AS DOUBLE)"
}

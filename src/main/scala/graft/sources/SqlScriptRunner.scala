package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S11 — SQL script runner (reference `etl.py:295-321`): split a script on
  * `;`, execute each statement, return (statement, result) pairs. The
  * split is deliberately as naive as the reference's (`etl.py:304` — no
  * string-literal awareness); statements route through Catalyst's full
  * parse/analyze/optimize pipeline via `spark.sql`.
  */
object SqlScriptRunner {

  def run(spark: SparkSession, script: String): Seq[(String, DataFrame)] =
    script.split(";").map(_.trim).filter(_.nonEmpty).toSeq
      .map(stmt => stmt -> spark.sql(stmt))

  /** Reference-style rendering (`etl.py:311-313`): header line + rows with
    * `NULL` for nulls. Collects — presentation only, driver-side by
    * design.
    */
  def render(df: DataFrame, limit: Int = 100): String = {
    val header = df.columns.mkString(" | ")
    val rows = df.limit(limit).collect().map(
      _.toSeq.map(v => if (v == null) "NULL" else v.toString).mkString(" | "))
    (header +: rows).mkString("\n")
  }
}

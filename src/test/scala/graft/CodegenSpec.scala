package graft

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import graft.functions.TextNorm
import graft.operators.Dedup

/** Proof that the custom expressions participate in whole-stage codegen
  * (not CodegenFallback): the generated Java for a scan+project stage
  * must contain the static kernel calls.
  */
class CodegenSpec extends SparkSpec {
  import spark.implicits._

  private def generatedCode(df: org.apache.spark.sql.DataFrame): String = {
    val wsc = df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, "no WholeStageCodegen stage found:\n" +
      df.queryExecution.executedPlan.toString.take(600))
    wsc.map(w => w.doCodeGen()._2.body).mkString("\n")
  }

  test("StripDiacritics generates a static kernel call inside codegen") {
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(TextNorm.stripDiacritics($"text").as("s"))
    assert(generatedCode(df).contains("graft.functions.StripDiacritics.strip"))
  }

  test("DotProduct generates a primitive loop inside codegen") {
    val df = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(graft.functions.VectorOps
        .dot($"embedding", $"embedding").as("d"))
    val code = generatedCode(df)
    assert(code.contains("getFloat") && code.contains("numElements"))
  }

  test("NgramShingles generates a static kernel call inside codegen") {
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(Dedup.shingles3(Dedup.tokens($"text")).as("sh"))
    assert(generatedCode(df).contains("graft.functions.NgramShingles.compute"))
  }
}

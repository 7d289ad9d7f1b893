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

  test("every native kernel is callable from the SQL surface") {
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(s"$sf/documents.parquet")
      .createOrReplaceTempView("docs_fn")
    val row = spark.sql(
      """SELECT poly_hash(text) AS h,
        |       poly_hash(text, 37) AS h37,
        |       size(ngram_shingles(split(text, '\\s+'), 3)) AS ns,
        |       size(ngram_shingles_all(split(text, '\\s+'), 3)) AS nsa,
        |       strip_diacritics(text) AS sd
        |FROM docs_fn LIMIT 1""".stripMargin).head
    assert(row.getLong(0) >= 0 && row.getLong(1) >= 0)
    assert(row.getInt(2) <= row.getInt(3))
    // the aggregate registers too: simhash over per-token hashes
    val agg = spark.sql(
      """SELECT simhash_agg(poly_hash(tok)) AS sh
        |FROM (SELECT explode(split(text, '\\s+')) AS tok FROM docs_fn)""".stripMargin)
      .head
    assert(!agg.isNullAt(0))
    // and matches the programmatic SimhashAgg path's type (a long signature)
    assert(agg.schema("sh").dataType.typeName == "long")
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

  test("fused title kernels generate static calls inside codegen") {
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(TextNorm.titleCandidates($"text").as("c"),
        TextNorm.fullTitleClean($"text").as("f"))
    val code = generatedCode(df)
    assert(code.contains("graft.functions.TitleKernels.candidates"))
    assert(code.contains("graft.functions.TitleKernels.fullClean"))
  }

  test("fused title kernels equal the Column compositions over the corpus") {
    // the kernels replaced the composition in q5/q6/q16's hot path; this
    // pins them row-identical over every synthetic title decoration (the
    // 9,742-real-title golden in TitleCleanExhaustiveSpec pins
    // fullTitleClean against the reference's own outputs)
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val title = concat(substring($"text", 1, 40),
      when($"doc_id" % 3 === 0, lit(", The"))
        .when($"doc_id" % 3 === 1, lit(" (a.k.a. alias)"))
        .otherwise(lit("")),
      lit(" ("), (lit(1970) + $"doc_id" % 50).cast("string"), lit(")"))
    val drift = d.select($"doc_id",
        TextNorm.titleCandidates(title).as("k_cands"),
        TextNorm.titleCandidatesComposed(title).as("c_cands"),
        TextNorm.fullTitleClean(title).as("k_full"),
        TextNorm.fullTitleCleanComposed(title).as("c_full"))
      .filter(!($"k_cands" <=> $"c_cands") || !($"k_full" <=> $"c_full"))
    assert(drift.isEmpty, drift.head(3).mkString("\n"))
  }
}

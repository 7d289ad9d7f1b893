package graft

import org.apache.spark.sql.functions._
import graft.plans.RewriteHofDotProduct

class RewriteRuleSpec extends SparkSpec {
  import spark.implicits._

  // parquet-backed source so ConvertToLocalRelation can't constant-fold
  // the whole plan away before the rewrite is observable
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteHofDotProduct
    try f finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteHofDotProduct)
    }
  }

  test("HOF dot-product idiom is rewritten to the native expression") {
    val hof = emb.select($"vec_id", aggregate(
      zip_with($"embedding", $"embedding",
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v).as("dot"))
    val baseline = hof.orderBy("vec_id").limit(5).collect()
    withRule {
      assert(hof.queryExecution.optimizedPlan.toString.contains("vec_dot"),
        hof.queryExecution.optimizedPlan.toString)
      val rewritten = hof.orderBy("vec_id").limit(5).collect()
      assert(rewritten.sameElements(baseline)) // bit-identical arithmetic
    }
  }

  test("non-dot-product aggregates are left untouched") {
    withRule {
      val df = emb.select(aggregate(
        zip_with($"embedding", $"embedding", (x, y) => x + y), // sum, not mul
        lit(0.0f), (acc, v) => acc + v).as("s"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("vec_dot"))
      assert(df.count() > 0)
    }
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL registration for the graft native expressions, so `spark.sql`
  * scripts (the reference's query surface, `etl.py:295-321`) can call
  * them like builtins: `strip_diacritics(s)`, `vec_dot(a, b)`,
  * `ngram_shingles(arr, n)`.
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("strip_diacritics",
      (es: Seq[Expression]) => StripDiacritics(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("vec_dot",
      (es: Seq[Expression]) => DotProduct(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("ngram_shingles",
      (es: Seq[Expression]) => es match {
        case Seq(arr, Literal(n: Int, IntegerType)) => NgramShingles(arr, n)
        case _ => throw new IllegalArgumentException(
          "ngram_shingles(array<string>, <int literal>)")
      }, "scala_udf")
    reg.createOrReplaceTempFunction("ngram_shingles_all",
      (es: Seq[Expression]) => es match {
        case Seq(arr, Literal(n: Int, IntegerType)) => NgramShinglesAll(arr, n)
        case _ => throw new IllegalArgumentException(
          "ngram_shingles_all(array<string>, <int literal>)")
      }, "scala_udf")
    reg.createOrReplaceTempFunction("quantize_error",
      (es: Seq[Expression]) => es match {
        case Seq(vec, Literal(levels: Int, IntegerType)) =>
          QuantizeError(vec, levels)
        case _ => throw new IllegalArgumentException(
          "quantize_error(array<float|double>, <int literal>)")
      }, "scala_udf")
    reg.createOrReplaceTempFunction("poly_hash",
      (es: Seq[Expression]) => es match {
        case Seq(s) => PolyHash(s)
        case Seq(s, Literal(mult: Int, IntegerType)) => PolyHash(s, mult)
        case _ => throw new IllegalArgumentException(
          "poly_hash(string[, <int literal> multiplier])")
      }, "scala_udf")
    // aggregate: the analyzer wraps a bare AggregateFunction returned by
    // a registry builder in its AggregateExpression
    reg.createOrReplaceTempFunction("simhash_agg",
      (es: Seq[Expression]) => es match {
        case Seq(h) => SimhashAgg(h, 62)
        case Seq(h, Literal(bits: Int, IntegerType)) => SimhashAgg(h, bits)
        case _ => throw new IllegalArgumentException(
          "simhash_agg(bigint hash[, <int literal> bits])")
      }, "scala_udf")
  }
}

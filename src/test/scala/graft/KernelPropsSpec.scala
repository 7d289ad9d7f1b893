package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the round-4 native kernels against straightforward
  * Scala reference models, on generated inputs with a fixed seed (same
  * offline-deterministic setup as `TextNormPropsSpec`).
  */
class KernelPropsSpec extends SparkSpec {
  import spark.implicits._

  private val tokGen = Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(5))
  private val docGen: Gen[List[String]] = Gen.listOf(tokGen).map(_.take(30))
  private lazy val docs: Seq[List[String]] =
    Gen.listOfN(200, docGen).pureApply(Gen.Parameters.default, Seed(7L))

  private val vecGen: Gen[Array[Float]] =
    Gen.listOf(Gen.chooseNum(-2.0f, 2.0f)).map(_.take(32).toArray)
  private lazy val vecs: Seq[Array[Float]] =
    Gen.listOfN(200, vecGen).pureApply(Gen.Parameters.default, Seed(11L))

  test("NgramShinglesAll matches the sliding-window model") {
    val out = docs.zipWithIndex.map { case (d, i) => (i.toLong, d.toArray) }
      .toDF("id", "toks")
      .select(col("id"), org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.NgramShinglesAll(
          org.apache.spark.sql.GraftSqlBridge.expression(col("toks")), 3))
        .as("sh"))
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[String](1)).toMap
    docs.zipWithIndex.foreach { case (d, i) =>
      val expected =
        if (d.length < 3) Seq.empty else d.sliding(3).map(_.mkString(" ")).toSeq
      assert(out(i.toLong) == expected, s"doc $i: $d")
    }
  }

  test("QuantizeError matches the Scala model and is scale-bounded") {
    def model(v: Array[Float], levels: Int): Double = {
      if (v.isEmpty) return 0.0
      val d = v.map(_.toDouble)
      val (mn, mx) = (d.min, d.max)
      if (mn == mx) return 0.0
      val scale = (mx - mn) / (levels - 1)
      d.map { x =>
        val q = math.floor((x - mn) / scale + 0.5)
        val e = x - (mn + q * scale)
        e * e
      }.sum / d.length
    }
    val out = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "vec")
      .select(col("id"), org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.QuantizeError(
          org.apache.spark.sql.GraftSqlBridge.expression(col("vec")), 64))
        .as("mse"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("mse")).toMap
    vecs.zipWithIndex.foreach { case (v, i) =>
      val m = model(v, 64)
      assert(out(i.toLong) == m, s"vec $i: got ${out(i.toLong)}, model $m")
      if (v.nonEmpty && v.min != v.max) {
        val scale = (v.max.toDouble - v.min.toDouble) / 63
        assert(m <= scale * scale / 4 + 1e-15)
      }
    }
  }

  test("kernels tolerate null elements instead of reading garbage or NPE-ing") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT quantize_error(array(CAST(0.0 AS FLOAT), NULL, CAST(1.0 AS FLOAT)), 256) AS qe,
        |       ngram_shingles_all(array('a', NULL, 'c'), 2) AS sh
        |""".stripMargin).head
    // null skipped: remaining [0,1] are both exact levels -> error 0
    assert(r.getDouble(0) == 0.0)
    // null token renders as empty string, positions preserved
    assert(r.getSeq[String](1) == Seq("a ", " c"))
  }

  test("the kernels are callable from SQL after registration") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT ngram_shingles_all(array('a','b','c','d'), 3) AS sh,
        |       quantize_error(array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT)), 256) AS qe
        |""".stripMargin).head
    assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r.getDouble(1) == 0.0)
  }
}

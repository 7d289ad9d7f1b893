package graft

import java.nio.file.Files

import org.apache.spark.sql.types._
import graft.sources.JsonlTables

class JsonlTablesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("score", DoubleType)))

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    val lines = Seq(
      """{"doc_id": 1, "text": "alpha", "score": 0.5}""",
      """{"doc_id": 2, "text": "beta", "score": 1.5}""",
      """this is not json at all""",
      """{"doc_id": 3, "text": "gamma", "score": -1}""",
      """{"doc_id": 4 "text": "missing comma"}""")
    Files.write(java.nio.file.Paths.get(dir, "part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  test("readRouted splits clean rows from malformed lines in one scan") {
    val dir = writeFixture()
    val (clean, rejects) = JsonlTables.readRouted(spark, dir, schema)
    val rows = clean.as[(Long, String, Double)].collect().toSet
    assert(rows == Set((1L, "alpha", 0.5), (2L, "beta", 1.5), (3L, "gamma", -1.0)))
    assert(!clean.columns.contains(JsonlTables.CorruptCol))
    val bad = rejects.as[String].collect().toSet
    assert(bad == Set("this is not json at all",
      """{"doc_id": 4 "text": "missing comma"}"""))
  }

  test("jsonl write/read round-trips with the declared schema") {
    val dir = Files.createTempDirectory("graft_jsonl_rt").toString + "/out"
    val df = Seq((10L, "x", 1.0), (11L, "y", 2.0)).toDF("doc_id", "text", "score")
    JsonlTables.write(df, dir)
    val (back, rejects) = JsonlTables.readRouted(spark, dir, schema)
    assert(back.as[(Long, String, Double)].collect().toSet ==
      Set((10L, "x", 1.0), (11L, "y", 2.0)))
    assert(rejects.isEmpty)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** The full user journey: curate → export → train-side read. Drives
  * `Curation.exportCorpus` end-to-end and checks the at-rest layout has
  * the properties the trainer relies on.
  */
class ExportSpec extends SparkSpec {

  private lazy val out =
    java.nio.file.Files.createTempDirectory("corpus_export").toString + "/corpus"

  private lazy val exported: Long = Curation.exportCorpus(spark, sf, out)

  test("export writes exactly the selected documents") {
    val selected = Curation.q41CorpusSelect(spark, sf)
      .filter(col("selected")).count()
    assert(exported == selected && exported > 0)
    val back = spark.read.parquet(out)
    assert(back.count() == selected)
    // every exported doc carries its original text and a split label
    assert(back.columns.toSet ==
      Set("doc_id", "text", "lang", "source", "n_chars", "split"))
  }

  test("the layout is split-partitioned and split predicates prune at plan time") {
    exported
    val dirs = new java.io.File(out).listFiles()
      .map(_.getName).filter(_.startsWith("split=")).sorted
    assert(dirs.nonEmpty && dirs.forall(d =>
      Set("split=train", "split=val", "split=test").contains(d)), dirs.mkString(","))
    val pruned = spark.read.parquet(out).filter(col("split") === "train")
    val scanLine = pruned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("split"), scanLine)
  }

  test("re-export is idempotent") {
    val first = exported
    val again = Curation.exportCorpus(spark, sf, out)
    assert(again == first)
    assert(spark.read.parquet(out).count() == first)
  }
}

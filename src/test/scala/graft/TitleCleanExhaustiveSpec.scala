package graft

import scala.io.Source

import org.apache.spark.sql.functions._
import graft.functions.TextNorm
import graft.operators.MoviePipeline
import graft.sources.CsvTables

/** Exhaustive parity for the whole string pipeline: for every one of the
  * reference's 9,742 titles, md5(full_title_clean ∥ candidates) must equal
  * the hash computed by executing the reference's Python functions
  * (resource generated 2026-08-12). This covers every diacritic,
  * trailing-article, parenthetical, quoting, and whitespace edge the real
  * corpus contains — not just the curated fixtures.
  */
class TitleCleanExhaustiveSpec extends SparkSpec {

  test("all 9742 titles hash-match the reference pipeline") {
    val golden = Source.fromResource("title_clean_golden.csv").getLines()
      .drop(1).map { l =>
        val Array(id, h) = l.split(",")
        id.toInt -> h
      }.toMap

    val payload = concat(
      TextNorm.fullTitleClean(col("title")), lit(""),
      array_join(TextNorm.titleCandidates(col("title")), ""))
    val got = CsvTables.read(spark, "/root/reference/movies.csv",
        MoviePipeline.moviesCsvSchema)
      .select(col("movieId"), md5(payload).as("h"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap

    assert(got.size == 9742)
    val mismatches = golden.collect {
      case (id, h) if got.get(id).exists(_ != h) => id
    }
    assert(mismatches.isEmpty,
      s"${mismatches.size} title(s) diverge, e.g. ${mismatches.take(5)}")
  }
}

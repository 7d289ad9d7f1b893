package graft

import java.nio.file.Files

import org.apache.spark.sql.types._
import graft.sources.CsvTables

/** CSV parsing parity (SURVEY.md §7.4.8): quoted titles with embedded
  * commas, leading-quote titles, and missing fields must survive a
  * write→read round-trip exactly — the reference's movies.csv depends on
  * RFC4180 quoting for 1,860 trailing-article rows.
  */
class CsvTablesSpec extends SparkSpec {
  import spark.implicits._

  private val moviesSchema = StructType(Seq(
    StructField("movieId", IntegerType),
    StructField("title", StringType),
    StructField("genres", StringType)))

  test("reference-shaped CSV text parses with embedded commas and quotes") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val csv =
      """movieId,title,genres
        |1,Toy Story (1995),Adventure|Animation
        |11,"American President, The (1995)",Comedy|Drama|Romance
        |779,'Til There Was You (1997),Drama|Romance
        |31086,"Battleship Potemkin, The (Bronenosets ""Potyomkin"") (1925)",Drama
        |40697,Babylon 5,Sci-Fi""".stripMargin
    Files.writeString(java.nio.file.Paths.get(s"$dir/movies.csv"), csv)

    val rows = CsvTables.read(spark, s"$dir/movies.csv", moviesSchema)
      .as[(Int, String, String)].collect().sortBy(_._1).toSeq
    assert(rows == Seq(
      (1, "Toy Story (1995)", "Adventure|Animation"),
      (11, "American President, The (1995)", "Comedy|Drama|Romance"),
      (779, "'Til There Was You (1997)", "Drama|Romance"),
      (31086, "Battleship Potemkin, The (Bronenosets \"Potyomkin\") (1925)", "Drama"),
      (40697, "Babylon 5", "Sci-Fi")))
  }

  test("CSV write -> read round-trips commas, quotes, and nulls exactly") {
    val dir = Files.createTempDirectory("graft_csv_rt").toString + "/t"
    val data = Seq(
      (1, Option("plain"), Option("a|b")),
      (2, Option("with, comma"), Option("c")),
      (3, Option("has \"quotes\" inside"), None),
      (4, None, Option("d|e")))
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("title", StringType),
      StructField("genres", StringType)))
    CsvTables.write(data.toDF("id", "title", "genres"), dir)
    val back = CsvTables.read(spark, dir, schema)
      .as[(Int, Option[String], Option[String])].collect().sortBy(_._1).toSeq
    assert(back == data)
  }
}

package graft

import scala.io.Source

import org.apache.spark.sql.functions.col

import graft.operators.{EtlOps, MoviePipeline}
import graft.sources.SqliteDialect

/** Runs the reference's `queries.sql` UNTOUCHED — read from
  * `/root/reference/queries.sql` at test time — through the SQLite→Spark
  * dialect layer against the Spark-loaded movie star schema, and checks
  * the four results against the same SQLite goldens as `MovieGoldenSpec`.
  * This is the "switch engines without rewriting your scripts" proof.
  */
class SqliteDialectSpec extends SparkSpec {

  private lazy val views: Unit = {
    val movies = MoviePipeline.loadMovies(spark, "/root/reference/movies.csv").cache()
    val ratings = MoviePipeline.loadRatings(spark, "/root/reference/ratings.csv").cache()
    val exploded = MoviePipeline.movieGenres(movies)
      .select(col("movie_id").as("id"), col("genre_name").as("token"))
    val dim = EtlOps.dictionaryEncode(exploded).cache()
    movies.createOrReplaceTempView("movies")
    ratings.createOrReplaceTempView("ratings")
    dim.select(col("token_id").as("genre_id"), col("token").as("genre_name"))
      .createOrReplaceTempView("genres")
    EtlOps.junction(exploded, dim)
      .select(col("id").as("movie_id"), col("token_id").as("genre_id"))
      .createOrReplaceTempView("movie_genres")
  }

  private lazy val results: Map[Int, org.apache.spark.sql.DataFrame] = {
    views
    val script = Source.fromFile("/root/reference/queries.sql").mkString
    SqliteDialect.runScript(spark, script).zipWithIndex
      .map { case ((_, df), i) => (i + 1) -> df }.toMap
  }

  test("the script splits into exactly the reference's four statements") {
    assert(results.size == 4)
  }

  test("GROUP_CONCAT translation handles quoted separators and nesting") {
    assert(SqliteDialect.translate("SELECT GROUP_CONCAT(title, ', ') FROM m")
      == "SELECT concat_ws(', ', sort_array(collect_list(title))) FROM m")
    assert(SqliteDialect.translate("SELECT GROUP_CONCAT(x) FROM m")
      == "SELECT concat_ws(',', sort_array(collect_list(x))) FROM m")
    assert(SqliteDialect.translate(
      "SELECT group_concat(substr(t, 1, 3), '; ') AS a, GROUP_CONCAT(y, ',') AS b FROM m")
      == "SELECT concat_ws('; ', sort_array(collect_list(substr(t, 1, 3)))) AS a, " +
        "concat_ws(',', sort_array(collect_list(y))) AS b FROM m")
    // a doubled-quote escape inside the separator survives
    assert(SqliteDialect.translate("SELECT GROUP_CONCAT(x, ''',''') FROM m")
      == "SELECT concat_ws(''',''', sort_array(collect_list(x))) FROM m")
  }

  test("Q1 verbatim: top-rated movie scores avg 5.0 over 2 ratings") {
    val r = results(1).collect().head
    assert(r.getAs[Double]("avg_rating") == 5.0)
    assert(r.getAs[Long]("rating_count") == 2L)
  }

  test("Q2 verbatim: top-5 genres match SQLite exactly") {
    val got = results(2).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      ("Film-Noir", 3.92, 85L, 870L),
      ("War", 3.81, 381L, 4859L),
      ("Documentary", 3.8, 438L, 1219L),
      ("Drama", 3.66, 4349L, 41928L),
      ("Crime", 3.66, 1196L, 16681L)))
  }

  test("Q3 verbatim: prolific director with GROUP_CONCAT movie list") {
    val r = results(3).collect().head
    assert(r.getAs[String]("director") == "Unknown")
    assert(r.getAs[Long]("movie_count") == 9742L)
    assert(r.getAs[String]("movies").contains("Jumanji"))
  }

  test("Q4 verbatim: all 106 year rows match SQLite exactly") {
    val golden = Source.fromResource("q4_golden.csv").getLines().drop(1)
      .map { l =>
        val Array(y, a, m, t) = l.split(",")
        (y.toInt, a.toDouble, m.toLong, t.toLong)
      }.toSeq
    val got = results(4).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.length == 106)
    assert(got == golden)
  }
}

package graft

import scala.io.Source

import graft.operators.MoviePipeline

/** Golden end-to-end test (SURVEY.md §5.4): the full pipeline over the
  * reference's own MovieLens CSVs, compared against SQLite executing the
  * reference verbatim (enrichment stubbed to the `etl.py:118-121`
  * defaults on both sides). Golden values were produced by running the
  * reference's load + `queries.sql` under SQLite on 2026-08-12.
  */
class MovieGoldenSpec extends SparkSpec {

  private lazy val movies =
    MoviePipeline.loadMovies(spark, "/root/reference/movies.csv").cache()
  private lazy val ratings =
    MoviePipeline.loadRatings(spark, "/root/reference/ratings.csv").cache()

  test("corpus shape matches the reference load") {
    assert(movies.count() == 9742)
    assert(ratings.count() == 100836)
    assert(MoviePipeline.movieGenres(movies)
      .select("genre_name").distinct().count() == 19)
  }

  test("created_at audit stamp is present and non-null (schema.sql:14)") {
    import org.apache.spark.sql.types.TimestampType
    assert(movies.schema("created_at").dataType == TimestampType)
    assert(movies.filter(movies("created_at").isNull).count() == 0)
  }

  test("Q1: top-rated movie scores avg 5.0 over 2 ratings") {
    // SQLite's pick among the (5.0, 2) ties is insertion-order arbitrary
    // (queries.sql:13 has no further tie-break); the score is the golden.
    val r = MoviePipeline.q1TopMovie(movies, ratings).collect().head
    assert(r.getAs[Double]("avg_rating") == 5.0)
    assert(r.getAs[Long]("rating_count") == 2L)
  }

  test("Q2: top-5 genres match SQLite exactly") {
    val got = MoviePipeline.q2TopGenres(movies, ratings).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      ("Film-Noir", 3.92, 85L, 870L),
      ("War", 3.81, 381L, 4859L),
      ("Documentary", 3.8, 438L, 1219L),
      ("Drama", 3.66, 4349L, 41928L),
      ("Crime", 3.66, 1196L, 16681L)))
  }

  test("Q3: prolific director matches (all default to Unknown)") {
    val r = MoviePipeline.q3ProlificDirector(movies).collect().head
    assert(r.getAs[String]("director") == "Unknown")
    assert(r.getAs[Long]("movie_count") == 9742L)
    assert(r.getAs[String]("movies").contains("Jumanji"))
  }

  test("Q4: all 106 year rows match SQLite exactly") {
    val golden = Source.fromResource("q4_golden.csv").getLines().drop(1)
      .map { l =>
        val Array(y, a, m, t) = l.split(",")
        (y.toInt, a.toDouble, m.toLong, t.toLong)
      }.toSeq
    val got = MoviePipeline.q4RatingByYear(movies, ratings).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.length == 106)
    assert(got == golden)
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Parity.round2
import graft.functions.TextNorm
import graft.sources.CsvTables

/** The reference's own workload, end-to-end on Spark: MovieLens CSVs →
  * cleaned movie dimension + genre explode + ratings fact → the four
  * analytical queries of `queries.sql` (reference `etl.py:155-341`).
  *
  * This is the "a user of the reference could switch" surface: point it
  * at `movies.csv`/`ratings.csv` and run the exact queries they run
  * today. Enrichment uses the reference's offline default record
  * (`etl.py:118-121`) — the live-OMDb path is the lookup join
  * ([[CandidateJoin]]) fed by any metadata table. Validated against
  * SQLite executing the reference verbatim in `MovieGoldenSpec`.
  */
object MoviePipeline {

  val moviesCsvSchema: StructType = StructType(Seq(
    StructField("movieId", IntegerType),
    StructField("title", StringType),
    StructField("genres", StringType)))

  val ratingsCsvSchema: StructType = StructType(Seq(
    StructField("userId", IntegerType),
    StructField("movieId", IntegerType),
    StructField("rating", DoubleType),
    StructField("timestamp", LongType)))

  /** Extract + clean + default-enrich the movie dimension (reference
    * `etl.py:155-174`, `etl.py:203-244`): year from the raw title (F9),
    * stored title = F8 normal form, defaults for the enrichment fields.
    */
  def loadMovies(spark: SparkSession, csvPath: String): DataFrame =
    CsvTables.read(spark, csvPath, moviesCsvSchema)
      .select(
        col("movieId").as("movie_id"),
        TextNorm.fullTitleClean(col("title")).as("title"),
        TextNorm.extractYear(col("title")).as("release_year"),
        col("genres").as("genres_raw"),
        lit(null).cast("string").as("imdb_id"),
        lit("Not Available").as("plot"),
        lit("Unknown").as("director"),
        lit(null).cast("long").as("box_office_dollars"),
        lit(null).cast("int").as("runtime_mins"),
        lit(null).cast("double").as("imdb_rating"),
        // `created_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP` (reference
        // schema.sql:14): load-time audit stamp. Stamped with a
        // driver-side literal captured when the load plan is BUILT —
        // current_timestamp() is only constant per query execution, so an
        // uncached plan would re-stamp on every action; a literal gives
        // one load one stamp regardless of caching.
        lit(new java.sql.Timestamp(System.currentTimeMillis()))
          .as("created_at"))

  def loadRatings(spark: SparkSession, csvPath: String): DataFrame =
    CsvTables.read(spark, csvPath, ratingsCsvSchema)
      .select(col("userId").as("user_id"), col("movieId").as("movie_id"),
        col("rating"), col("timestamp"))

  /** G1 — one (movie_id, genre_name) per pipe token (reference
    * `etl.py:186-200`).
    */
  def movieGenres(movies: DataFrame): DataFrame =
    EtlOps.explodeTokens(movies, movies("movie_id"), movies("genres_raw"))
      .withColumnRenamed("id", "movie_id")
      .withColumnRenamed("token", "genre_name")

  /** Q1 (reference `queries.sql:5-14`) with the SURVEY.md §7.4.1
    * deterministic tie-break appended.
    */
  def q1TopMovie(movies: DataFrame, ratings: DataFrame): DataFrame =
    movies.join(ratings, "movie_id")
      .groupBy("movie_id", "title", "release_year")
      .agg(avg("rating").as("avg_rating"), count("rating").as("rating_count"))
      .orderBy(desc("avg_rating"), desc("rating_count"), asc("movie_id"))
      .limit(1)

  /** Q2 (reference `queries.sql:19-30`): genre dim + junction via
    * dictionary encode, 4-way join, round-parity avg, exact distinct.
    */
  def q2TopGenres(movies: DataFrame, ratings: DataFrame): DataFrame = {
    val mg = movieGenres(movies)
    mg.join(ratings, "movie_id")
      .groupBy("genre_name")
      .agg(round2(avg("rating")).as("avg_rating"),
        countDistinct("movie_id").as("movie_count"),
        count("rating").as("total_ratings"))
      .orderBy(desc("avg_rating"), desc("total_ratings"), asc("genre_name"))
      .limit(5)
  }

  /** Q3 (reference `queries.sql:35-44`): most prolific director with
    * deterministic sorted concat (A6; SQLite's order is insertion-order
    * arbitrary).
    */
  def q3ProlificDirector(movies: DataFrame): DataFrame =
    movies.filter(col("director").isNotNull && col("director") =!= "N/A")
      .groupBy("director")
      .agg(count(lit(1)).as("movie_count"),
        concat_ws(", ", sort_array(collect_list(col("title")))).as("movies"))
      .orderBy(desc("movie_count"), asc("director"))
      .limit(1)

  /** Q4 (reference `queries.sql:49-58`): avg rating per release year,
    * integer-year semantics (§7.4.4 — identical ordering to the
    * reference's TEXT sort for 4-digit years).
    */
  def q4RatingByYear(movies: DataFrame, ratings: DataFrame): DataFrame =
    movies.filter(col("release_year").isNotNull)
      .join(ratings, "movie_id")
      .groupBy("release_year")
      .agg(round2(avg("rating")).as("avg_rating"),
        countDistinct("movie_id").as("movie_count"),
        count("rating").as("total_ratings"))
      .orderBy(desc("release_year"))
}

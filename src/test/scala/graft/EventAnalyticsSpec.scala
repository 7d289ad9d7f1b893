package graft

import org.apache.spark.sql.functions._
import graft.operators.EventAnalytics

/** Behavioral checks for the event-analytics operators (q72–q74, q78,
  * q80) beyond the DuckDB hash oracles: cross-operator consistency and
  * the invariants the oracles can't see (funnel monotonicity, window-
  * frame bounds, bigram mass).
  */
class EventAnalyticsSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sf)

  test("events adapter is session-timezone-independent for µs NTZ vintage") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-evtz").toFile
    try {
      // LocalDateTime → TIMESTAMP_NTZ → parquet timestamp[us],
      // isAdjustedToUTC=false — the vintage the adapter reads as NTZ
      val wall = java.time.LocalDateTime.of(2024, 1, 1, 12, 0, 0)
      Seq((1L, wall, 7L, "view", 1.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"${dir.getPath}/events.parquet")
      val expectedNs =
        wall.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
      def tsNs(): Long =
        Tables.events(spark, dir.getPath).select("ts_ns").as[Long].head()
      assert(tsNs() == expectedNs)
      // the same file under a shifted session zone must yield the SAME
      // ts_ns — the naive wall clock is the epoch reading, exactly as
      // DuckDB's epoch_us treats it, regardless of who runs the session
      val prev = spark.conf.get("spark.sql.session.timeZone")
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      try assert(tsNs() == expectedNs,
        "ts_ns shifted with the session timezone")
      finally spark.conf.set("spark.sql.session.timeZone", prev)
    } finally { Tables.invalidate(dir.getPath); deleteRecursively(dir) }
  }

  test("q72 pivot rows cover every user and types sum to the total") {
    val rows = EventAnalytics.q72EventPivot(spark, sf).collect()
    assert(rows.length == events.select("user_id").distinct.count())
    rows.foreach { r =>
      val parts = Seq("view", "click", "purchase", "signup", "error")
        .map(r.getAs[Long])
      assert(parts.sum == r.getAs[Long]("n_total"))
      assert(parts.forall(_ >= 0))
    }
    // pivot cell mass equals the raw event count
    assert(rows.map(_.getAs[Long]("n_total")).sum == events.count())
  }

  test("q73 funnel stages are monotone and lags non-negative") {
    val rows = EventAnalytics.q73EventFunnel(spark, sf).collect()
      .map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("n_users"), Option(r.get(2)).map(_.asInstanceOf[Long])))
      .toMap
    val (n1, _) = rows("1_view")
    val (n2, lag2) = rows("2_click")
    val (n3, lag3) = rows("3_purchase")
    assert(n1 >= n2 && n2 >= n3)
    assert(lag2.forall(_ >= 0) && lag3.forall(_ >= 0))
    // stage 1 is exactly the distinct viewers
    assert(n1 == events.filter(col("event_type") === "view")
      .select("user_id").distinct.count())
  }

  test("q74 moving window honors its 7-day range frame") {
    val rows = EventAnalytics.q74RollingDaily(spark, sf).collect()
    val daily = rows.map(r => (r.getAs[String]("event_type"),
      r.getAs[Long]("day")) -> r.getAs[Long]("n_events")).toMap
    rows.foreach { r =>
      val (t, d) = (r.getAs[String]("event_type"), r.getAs[Long]("day"))
      val expected = (d - 6 to d).flatMap(dd => daily.get((t, dd)))
      assert(r.getAs[Long]("ma7_sum") == expected.sum)
      assert(r.getAs[Long]("ma7_days") == expected.length)
      assert(r.getAs[Long]("ma7_days") <= 7)
    }
    // deltas reconstruct consecutive-day differences
    rows.filter(r => !r.isNullAt(r.fieldIndex("delta"))).foreach { r =>
      val (t, d) = (r.getAs[String]("event_type"), r.getAs[Long]("day"))
      val prev = daily((t, rows.filter(x =>
        x.getAs[String]("event_type") == t && x.getAs[Long]("day") < d)
        .map(_.getAs[Long]("day")).max))
      assert(r.getAs[Long]("delta") == daily((t, d)) - prev)
    }
  }

  test("q78 flags exactly the days outside 2 sigma (float cross-check)") {
    val daily = events
      .groupBy(expr("ts_ns div 86400000000000").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n")).collect()
      .groupBy(_.getAs[String]("event_type"))
    val expected = daily.toSeq.flatMap { case (t, rows) =>
      val ns = rows.map(_.getAs[Long]("n").toDouble)
      val d = ns.length
      val mean = ns.sum / d
      val variance = ns.map(x => (x - mean) * (x - mean)).sum / (d - 1)
      rows.filter { r =>
        val dev = r.getAs[Long]("n") - mean
        dev * dev > 4.0 * variance
      }.map(r => (r.getAs[Long]("day"), t))
    }.toSet
    val flagged = EventAnalytics.q78DailyAnomalies(spark, sf).collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[String]("event_type"))).toSet
    assert(flagged == expected)
  }

  test("q78 is_high agrees with the sign of the deviation") {
    EventAnalytics.q78DailyAnomalies(spark, sf).collect().foreach { r =>
      assert(r.getAs[Boolean]("is_high") == (r.getAs[Long]("dev_num") > 0))
    }
  }

  test("q80 transition mass equals events minus one per active user") {
    val total = EventAnalytics.q80TransitionTopK(spark, sf)
      .agg(sum("n_transitions")).head.getLong(0)
    val nEvents = events.count()
    val nUsers = events.select("user_id").distinct.count()
    // 25 possible bigrams, top-20 kept: mass can only drop below the
    // exact total if the limit actually bit
    assert(total <= nEvents - nUsers)
    val rows = EventAnalytics.q80TransitionTopK(spark, sf).collect()
    assert(rows.length <= 20)
    val ns = rows.map(_.getAs[Long]("n_transitions"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("q114 cohort matrix agrees with a local recompute and its own identities") {
    val days = events.select(col("user_id"),
        expr("ts_ns div 86400000000000").as("day")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val first = days.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).min }
    val active = days.map { case (u, d) => (first(u), d - first(u), u) }.distinct
    val expected = active.groupBy(t => (t._1, t._2))
      .map { case (k, m) => k -> m.map(_._3).distinct.length }
    val sizes = first.values.groupBy(identity).map { case (d, o) => d -> o.size }
    val rows = EventAnalytics.q114RetentionCohorts(spark, sf).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val k = (r.getAs[Long]("cohort_day"), r.getAs[Long]("age_days"))
      assert(r.getAs[Long]("n_active") == expected(k).toLong, s"cell $k")
      assert(r.getAs[Long]("cohort_users") == sizes(k._1).toLong, s"cohort ${k._1}")
      assert(k._2 >= 0, "negative age")
    }
    // age 0 is full retention by definition: every cohort member is
    // active on their own first day
    rows.filter(_.getAs[Long]("age_days") == 0L).foreach { r =>
      assert(r.getAs[Long]("n_active") == r.getAs[Long]("cohort_users"))
      assert(r.getAs[Double]("retention") == 1.0)
    }
  }

  test("q115 buckets partition users and total event mass exactly") {
    val perUser = events.groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    val rows = EventAnalytics.q115EngagementHistogram(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_users")).sum == perUser.length.toLong)
    assert(rows.map(_.getAs[Long]("total_events")).sum == perUser.sum)
    assert(math.abs(rows.map(_.getAs[Double]("event_share")).sum - 1.0) < 1e-5)
    val expected = perUser.groupBy(n => 63 - java.lang.Long.numberOfLeadingZeros(n))
      .map { case (b, os) => b -> (os.length.toLong, os.sum) }
    rows.foreach { r =>
      val b = r.getAs[Int]("bucket")
      val (nU, tot) = expected(b)
      assert(r.getAs[Long]("n_users") == nU, s"bucket $b users")
      assert(r.getAs[Long]("total_events") == tot, s"bucket $b mass")
    }
  }
}

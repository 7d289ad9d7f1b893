package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorOps.{round6, round6Sql}

/** Event-log analytics — the product-analytics surface over the `events`
  * stream table, complementing the windowed aggregations (q29–q31) and
  * window-function analytics (q37): behavioral pivot (q72), conversion
  * funnel (q73), rolling daily activity (q74), integer-exact anomaly
  * flags (q78), and transition-bigram mining (q80).
  *
  * Scale posture shared by all five: the event-grain work is always a
  * single map-side-partial aggregate down to a small grain (user, day, or
  * type-pair); window functions and joins run on the reduced grain only.
  * Nothing here ships event-grain rows through more than one shuffle.
  */
object EventAnalytics {

  /** Epoch-day of the lossless ns timestamp (integer `div` on both
    * engines — no timezone/calendar library, and no float division:
    * ts_ns ≈ 1.7e18 is beyond double's exact-integer range, so `/`
    * would mis-bucket boundary events). Oracle side buckets from
    * `epoch_us` (DuckDB truncates the ns parquet type to µs on read);
    * ns-day and µs-day agree because NsPerDay is a multiple of 1000.
    */
  private val NsPerDay = 86400000000000L
  private def dayOfTsNs = expr(s"ts_ns div $NsPerDay")

  private val EventTypes = Seq("view", "click", "purchase", "signup", "error")

  // ---- q72: per-user behavior pivot ---------------------------------------

  /** q72 — the per-user behavior matrix: event counts pivoted to one
    * column per type. `pivot` WITH an explicit value list compiles to a
    * single aggregate (PivotFirst) — one shuffle on `user_id` with
    * map-side partials; omitting the list would trigger a driver-side
    * distinct-values collect, which is exactly what a 100 TB plan must
    * not do.
    */
  def q72EventPivot(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val pivoted = e.groupBy("user_id")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    val filled = EventTypes.foldLeft(pivoted)((df, t) =>
      df.withColumn(t, coalesce(col(t), lit(0L))))
    filled
      .withColumn("n_total", EventTypes.map(col).reduce(_ + _))
      .orderBy("user_id")
  }

  lazy val q72OracleSql: String =
    """SELECT user_id,
      |       COUNT(*) FILTER (WHERE event_type = 'view') AS view,
      |       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
      |       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |       COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
      |       COUNT(*) FILTER (WHERE event_type = 'error') AS error,
      |       COUNT(*) AS n_total
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---- q73: ordered conversion funnel -------------------------------------

  /** q73 — strictly-ordered conversion funnel view → click → purchase:
    * a user reaches a stage only with an event AFTER their entry into
    * the previous stage (the cascading-min formulation). Emits one row
    * per stage with the surviving-user count and the exact total
    * stage-to-stage lag in µs (ns sums would overflow BIGINT near
    * sf1-scale user counts; µs keeps headroom ~10³).
    *
    * Scale: stage 1 is a filtered map-side-partial min per user (the only
    * event-grain aggregate); stages 2–3 join event-grain rows against the
    * already-user-grain previous stage on `user_id` and reduce again —
    * each stage is one co-partitioned shuffle, never a cross-stage
    * event×event join.
    */
  def q73EventFunnel(spark: SparkSession, dir: String): DataFrame = {
    // µs precision end-to-end (integer `div`, not `/` — long `/` is
    // DOUBLE division): DuckDB truncates the parquet ns timestamps to µs
    // on read, so the oracle-comparable event time IS the µs truncation
    // (the Tables.events convention); ns-side comparisons would admit
    // same-µs-later-ns events the oracle can't see.
    funnelStages(Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        expr("ts_ns div 1000").as("ts_us")))
  }

  /** q73's funnel over any `(user_id, event_type, ts_us)` frame — shared
    * with the streaming dual's equivalence spec
    * (`StreamingOps.funnelStream` replays the same events through
    * per-user state and must land on these exact stage rows).
    */
  private[graft] def funnelStages(e: DataFrame): DataFrame = {
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_us").as("t1"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ts_us") > col("t1"))
      .groupBy("user_id").agg(min("ts_us").as("t2"), min("t1").as("t1"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c.select("user_id", "t2"), "user_id")
      .filter(col("ts_us") > col("t2"))
      .groupBy("user_id").agg(min("ts_us").as("t3"), min("t2").as("t2"))
    val s1 = v.agg(count(lit(1)).as("n_users"),
      lit(null).cast("long").as("sum_lag_us"))
      .select(lit("1_view").as("stage"), col("n_users"), col("sum_lag_us"))
    val s2 = c.agg(count(lit(1)).as("n_users"),
      sum(col("t2") - col("t1")).as("sum_lag_us"))
      .select(lit("2_click").as("stage"), col("n_users"), col("sum_lag_us"))
    val s3 = p.agg(count(lit(1)).as("n_users"),
      sum(col("t3") - col("t2")).as("sum_lag_us"))
      .select(lit("3_purchase").as("stage"), col("n_users"), col("sum_lag_us"))
    s1.unionAll(s2).unionAll(s3).orderBy("stage")
  }

  lazy val q73OracleSql: String =
    """WITH v AS (
      |  SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id
      |), c AS (
      |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2, MIN(v.t1) AS t1
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
      |  GROUP BY e.user_id
      |), p AS (
      |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3, MIN(c.t2) AS t2
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
      |  GROUP BY e.user_id
      |)
      |SELECT '1_view' AS stage, COUNT(*) AS n_users,
      |       CAST(NULL AS BIGINT) AS sum_lag_us FROM v
      |UNION ALL
      |SELECT '2_click', COUNT(*), CAST(SUM(t2 - t1) AS BIGINT) FROM c
      |UNION ALL
      |SELECT '3_purchase', COUNT(*), CAST(SUM(t3 - t2) AS BIGINT) FROM p
      |ORDER BY stage""".stripMargin

  // ---- q74: rolling daily activity ----------------------------------------

  /** Daily event counts per type — the shared day-grain reduction feeding
    * q74 and q78. ONE map-side-partial aggregate over the event grain;
    * everything downstream runs on |days|×|types| rows.
    */
  private def dailyCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(dayOfTsNs.as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))

  /** q74 — rolling daily activity per event type: 7-day trailing moving
    * sum/average (RANGE frame over the integer epoch-day, so calendar
    * gaps shorten the window rather than silently widening it) and
    * day-over-day delta. The window runs on the day-grain table — its
    * sort is |days|×|types| rows regardless of corpus size.
    */
  def q74RollingDaily(spark: SparkSession, dir: String): DataFrame = {
    val w7 = Window.partitionBy("event_type").orderBy("day")
      .rangeBetween(-6, 0)
    val w1 = Window.partitionBy("event_type").orderBy("day")
    dailyCounts(spark, dir)
      .select(col("day"), col("event_type"), col("n_events"),
        sum("n_events").over(w7).as("ma7_sum"),
        count(lit(1)).over(w7).as("ma7_days"),
        (col("n_events") - lag("n_events", 1).over(w1)).as("delta"))
      .withColumn("ma7_avg",
        round6(col("ma7_sum").cast("double") / col("ma7_days")))
      .orderBy("event_type", "day")
  }

  lazy val q74OracleSql: String =
    s"""WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day, event_type,
      |         COUNT(*) AS n_events
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT day, event_type, n_events,
      |       CAST(SUM(n_events) OVER w7 AS BIGINT) AS ma7_sum,
      |       COUNT(*) OVER w7 AS ma7_days,
      |       n_events - LAG(n_events, 1) OVER w1 AS delta,
      |       ${round6Sql("CAST(SUM(n_events) OVER w7 AS DOUBLE) / COUNT(*) OVER w7")} AS ma7_avg
      |FROM daily
      |WINDOW w7 AS (PARTITION BY event_type ORDER BY day
      |              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW),
      |       w1 AS (PARTITION BY event_type ORDER BY day)
      |ORDER BY event_type, day""".stripMargin

  // ---- q78: integer-exact daily anomaly flags -----------------------------

  /** q78 — days whose count is more than 2σ from that type's mean,
    * decided ENTIRELY in integer arithmetic: |z| > Z becomes
    * `(n·D − S)²·(D−1) > Z²·D·(D·Q − S²)` for day-count n, day total D,
    * sum S, and sum-of-squares Q — no float mean/stddev anywhere, so the
    * flag is bit-identical on any engine and any aggregation order
    * (float stddev is the classic cross-engine parity trap).
    *
    * BIGINT headroom: the cube-ish term (n·D−S)²·(D−1) stays under 2⁶³
    * while per-day counts are below ~10⁸ at D=365 — beyond that, route
    * the same identity through DECIMAL(38,0). Day-grain stats per type
    * are a broadcast-sized table.
    */
  def q78DailyAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val ZSq = 4L // Z = 2 sigma
    val daily = dailyCounts(spark, dir)
    val stats = daily.groupBy("event_type").agg(
      count(lit(1)).as("n_days"),
      sum("n_events").as("s"),
      sum(col("n_events") * col("n_events")).as("q"))
    daily.join(broadcast(stats), "event_type")
      .withColumn("dev_num", col("n_events") * col("n_days") - col("s"))
      .filter(col("dev_num") * col("dev_num") * (col("n_days") - 1) >
        lit(ZSq) * col("n_days") *
          (col("n_days") * col("q") - col("s") * col("s")))
      .select(col("day"), col("event_type"), col("n_events"),
        col("dev_num"), (col("dev_num") > 0).as("is_high"))
      .orderBy("event_type", "day")
  }

  lazy val q78OracleSql: String =
    """WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day, event_type,
      |         COUNT(*) AS n_events
      |  FROM events GROUP BY 1, 2
      |), stats AS (
      |  SELECT event_type, COUNT(*) AS n_days,
      |         CAST(SUM(n_events) AS BIGINT) AS s,
      |         CAST(SUM(n_events * n_events) AS BIGINT) AS q
      |  FROM daily GROUP BY event_type
      |)
      |SELECT d.day, d.event_type, d.n_events,
      |       d.n_events * st.n_days - st.s AS dev_num,
      |       (d.n_events * st.n_days - st.s) > 0 AS is_high
      |FROM daily d JOIN stats st ON d.event_type = st.event_type
      |WHERE (d.n_events * st.n_days - st.s) * (d.n_events * st.n_days - st.s)
      |        * (st.n_days - 1)
      |      > 4 * st.n_days * (st.n_days * st.q - st.s * st.s)
      |ORDER BY d.event_type, d.day""".stripMargin

  // ---- q80: transition-bigram mining --------------------------------------

  /** q80 — top event-type transition bigrams (the empirical Markov
    * matrix): per user, consecutive event pairs under the total order
    * (ts_ns, event_id), counted and ranked. The lag window shuffles the
    * event grain ONCE on `user_id`; the bigram aggregate then reduces to
    * at most |types|² rows, and the top-k is a `TakeOrderedAndProject`
    * (no global sort).
    */
  def q80TransitionTopK(spark: SparkSession, dir: String): DataFrame = {
    val TopK = 20
    transitionPairs(Tables.events(spark, dir))
      .orderBy(col("n_transitions").desc, col("prev_type"), col("next_type"))
      .limit(TopK)
  }

  /** q80's bigram counts (pre-top-k) over any `(user_id, ts_ns,
    * event_id, event_type)` frame — shared with the streaming dual's
    * equivalence spec (`StreamingOps.transitionsStream` must emit
    * exactly these pairs).
    */
  private[graft] def transitionPairs(e: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    e.select(col("user_id"), col("ts_ns"), col("event_id"),
        col("event_type").as("next_type"))
      .withColumn("prev_type", lag("next_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n_transitions"))
  }

  lazy val q80OracleSql: String =
    """WITH seq AS (
      |  SELECT user_id,
      |         LAG(event_type, 1) OVER
      |           (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
      |         event_type AS next_type
      |  FROM events
      |)
      |SELECT prev_type, next_type, COUNT(*) AS n_transitions
      |FROM seq WHERE prev_type IS NOT NULL
      |GROUP BY prev_type, next_type
      |ORDER BY n_transitions DESC, prev_type, next_type
      |LIMIT 20""".stripMargin

  // ---- q114: retention cohort matrix --------------------------------------

  /** q114 — the retention cohort matrix: users grouped by the integer
    * epoch-day of their FIRST event (the cohort), then for each cohort ×
    * age-in-days cell, how many of its users were active and what
    * fraction of the cohort that is. The canonical activation/retention
    * triangle every growth dashboard draws; day arithmetic stays in the
    * q74 integer-epoch-day domain (ns DIV, exactly µs-compatible with
    * DuckDB's parquet read) — no calendar functions, no timezone
    * surface, bit-identical cross-engine.
    *
    * Scale shape: three aggregates, every one reduced BEFORE it
    * shuffles — (user → first day) is a map-side-partial min,
    * (user, day) distinct-activity collapses event grain once, and the
    * cohort×age rollup runs on |users|×|active-days| rows at most. The
    * cohort-size join attaches at cohort grain (|days| rows). No
    * windows, no event-grain row crosses two shuffles — the q72 family
    * posture.
    */
  def q114RetentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(col("user_id"), dayOfTsNs.as("day"))
    val first = days.groupBy("user_id").agg(min("day").as("cohort_day"))
    val activity = days.join(first, "user_id")
      .select(col("cohort_day"), (col("day") - col("cohort_day")).as("age_days"),
        col("user_id"))
      .distinct()
    retentionRollup(activity)
  }

  /** The cohort×age rollup over distinct `(cohort_day, age_days,
    * user_id)` activity rows — shared by the batch q114 and its
    * streaming dual (`StreamingOps.retentionStream` emits exactly these
    * rows incrementally). Cohort sizes are the age-0 cells: every user
    * is by definition active on their own cohort day, so the first-day
    * aggregate and the age-0 census are the same number — one shared
    * frame instead of a separate user-grain aggregation.
    */
  private[graft] def retentionRollup(activity: DataFrame): DataFrame = {
    val cells = activity
      .groupBy("cohort_day", "age_days")
      .agg(count(lit(1)).as("n_active"))
    // sizes as a separate aggregation over the age-0 slice rather than a
    // filter of `cells`: the rollup must accept ANY activity source
    // (including a memory-sink view), and a cells-on-cells self-join
    // trips conflicting-reference resolution on such relations
    val sizes = activity.filter(col("age_days") === 0)
      .groupBy("cohort_day").agg(count(lit(1)).as("cohort_users"))
    cells.join(sizes, "cohort_day")
      .select(col("cohort_day"), col("cohort_users"), col("age_days"),
        col("n_active"),
        round6(col("n_active").cast("double") / col("cohort_users"))
          .as("retention"))
      .orderBy("cohort_day", "age_days")
  }

  /** q74's integer epoch-day, the same min/distinct/rollup chain. */
  lazy val q114OracleSql: String =
    s"""WITH days AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
      |), first AS (
      |  SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id
      |), sizes AS (
      |  SELECT cohort_day, COUNT(*) AS cohort_users FROM first GROUP BY 1
      |), active AS (
      |  SELECT DISTINCT f.cohort_day, d.day - f.cohort_day AS age_days,
      |         d.user_id
      |  FROM days d JOIN first f ON d.user_id = f.user_id
      |), cells AS (
      |  SELECT cohort_day, age_days, COUNT(*) AS n_active
      |  FROM active GROUP BY 1, 2
      |)
      |SELECT c.cohort_day, s.cohort_users, c.age_days, c.n_active,
      |       ${round6Sql("CAST(c.n_active AS DOUBLE) / s.cohort_users")}
      |         AS retention
      |FROM cells c JOIN sizes s ON c.cohort_day = s.cohort_day
      |ORDER BY c.cohort_day, c.age_days""".stripMargin

  // ---- q115: engagement distribution --------------------------------------

  /** q115 — the engagement (power-user) distribution: users bucketed by
    * ⌊log₂(lifetime event count)⌋ — bucket 0 is the one-shot drive-by,
    * each next bucket doubles the commitment — with user counts and the
    * event mass each bucket owns. The health curve behind "1% of users
    * generate 50% of events": a product (or an abuse desk) reads the
    * top buckets' mass share, and a data pipeline reads it as the skew
    * forecast for every user-keyed shuffle upstream. The bucket is the
    * q68/q86 binary-digit trick (`length(bin(n)) − 1`), so the whole
    * report is exact integer arithmetic except the one final share
    * division.
    *
    * Scale shape: one map-side-partial count to user grain, one
    * aggregate to ≤64 bucket rows, one broadcast scalar for the share —
    * nothing event-grain survives the first shuffle.
    */
  def q115EngagementHistogram(spark: SparkSession, dir: String): DataFrame =
    engagementRollup(Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n_events")))

  /** The log₂-bucket histogram over user-grain `(user_id, n_events)`
    * rows — shared by the batch q115 and its streaming dual (the final
    * `StreamingOps.engagementStream` update per user carries the same
    * lifetime count the batch aggregate computes).
    */
  private[graft] def engagementRollup(perUser: DataFrame): DataFrame = {
    val buckets = perUser
      .groupBy((length(bin(col("n_events"))) - 1).as("bucket"))
      .agg(count(lit(1)).as("n_users"), sum("n_events").as("total_events"))
    // the grand total as an unpartitioned window over the bounded
    // (≤64-row) bucket frame — one stage instead of an aggregate job
    // plus a broadcast build
    val withTotal = buckets.withColumn("all_events",
      sum("total_events").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    withTotal
      .select(col("bucket"), col("n_users"), col("total_events"),
        round6(col("total_events").cast("double") / col("all_events"))
          .as("event_share"))
      .orderBy("bucket")
  }

  /** The same binary-digit bucket and share arithmetic. */
  lazy val q115OracleSql: String =
    s"""WITH per_user AS (
      |  SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
      |), buckets AS (
      |  SELECT CAST(length(bin(n_events)) - 1 AS INTEGER) AS bucket,
      |         COUNT(*) AS n_users,
      |         CAST(SUM(n_events) AS BIGINT) AS total_events
      |  FROM per_user GROUP BY 1
      |), tot AS (
      |  SELECT SUM(total_events) AS all_events FROM buckets
      |)
      |SELECT bucket, n_users, total_events,
      |       ${round6Sql("CAST(total_events AS DOUBLE) / all_events")}
      |         AS event_share
      |FROM buckets, tot ORDER BY bucket""".stripMargin
}

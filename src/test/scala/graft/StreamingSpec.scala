package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{LatestUpdate, StreamEvent, StreamingOps}

/** Structured Streaming paths (SURVEY.md §2.10/§5.5): the same plan
  * functions the q29–q31 batch entries use, driven incrementally through
  * MemoryStream — windowed aggregation parity, watermark late-data drops,
  * custom keyed state, and the foreachBatch upsert sink.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  private def ev(id: Long, minute: Long, user: Long, etype: String,
      value: Double): StreamEvent =
    StreamEvent(id, ts(minute), user, etype, value)

  test("streaming tumbling windows equal the batch plan on the same rows") {
    val input = MemoryStream[StreamEvent](spark)
    val events = Seq(
      ev(1, 5, 1, "view", 1.0), ev(2, 20, 1, "view", 2.0),
      ev(3, 65, 2, "buy", 3.0), ev(4, 70, 1, "view", 4.0))
    input.addData(events)
    val q = StreamingOps.tumblingCounts(input.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumble_out").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("tumble_out")
      .orderBy("w_start_us", "event_type").collect().toSeq
    val batch = StreamingOps.tumblingCounts(events.toDF())
      .orderBy("w_start_us", "event_type").collect().toSeq
    assert(streamed == batch)
  }

  test("watermark drops events later than the allowance") {
    val input = MemoryStream[StreamEvent](spark)
    val q = StreamingOps.tumblingCountsStream(input.toDF())
      .writeStream.outputMode("update")
      .format("memory").queryName("late_out").start()

    input.addData(ev(1, 5, 1, "view", 1.0), ev(2, 200, 1, "view", 1.0))
    q.processAllAvailable() // watermark advances to minute 190
    input.addData(ev(3, 6, 1, "view", 1.0)) // 184 min late -> dropped
    q.processAllAvailable(); q.stop()

    val hour0 = spark.table("late_out").filter($"w_start_us" === 0L).collect()
    assert(hour0.forall(_.getAs[Long]("n_events") == 1L),
      s"late row leaked into ${hour0.mkString(",")}")
  }

  test("q80 streaming dual: replayed transitions equal the batch bigram counts") {
    val input = MemoryStream[StreamEvent](spark)
    // three users, interleaved types, replayed across THREE micro-batches
    // in per-user event-time order (the documented delivery contract);
    // intra-batch rows deliberately out of order (the op re-sorts)
    val b1 = Seq(ev(2, 11, 1, "click", 0), ev(1, 10, 1, "view", 0),
      ev(5, 10, 2, "view", 0))
    val b2 = Seq(ev(3, 12, 1, "purchase", 0), ev(6, 30, 2, "click", 0),
      ev(8, 5, 3, "view", 0))
    val b3 = Seq(ev(4, 40, 1, "view", 0), ev(7, 31, 2, "click", 0),
      ev(9, 50, 3, "purchase", 0))
    val q = StreamingOps.transitionsStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("trans_out").start()
    Seq(b1, b2, b3).foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()

    val streamed = spark.table("trans_out")
      .groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy("prev_type", "next_type").collect().toSeq
    val batchFrame = (b1 ++ b2 ++ b3).toDF()
      .select(col("user_id"), expr("CAST(ts AS LONG) * 1000000000").as("ts_ns"),
        col("event_id"), col("event_type"))
    val batch = graft.operators.EventAnalytics.transitionPairs(batchFrame)
      .orderBy("prev_type", "next_type").collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("q73 streaming dual: final funnel states roll up to the batch stage rows") {
    val input = MemoryStream[StreamEvent](spark)
    // user 1 completes the funnel; user 2 stalls at click; user 3 clicks
    // BEFORE viewing (must not advance); user 4 only purchases (no stage)
    val b1 = Seq(ev(1, 10, 1, "view", 0), ev(2, 12, 1, "click", 0),
      ev(10, 9, 3, "click", 0), ev(20, 8, 4, "purchase", 0))
    val b2 = Seq(ev(3, 20, 1, "purchase", 0), ev(11, 15, 2, "view", 0),
      ev(12, 18, 3, "view", 0))
    val b3 = Seq(ev(13, 25, 2, "click", 0), ev(14, 30, 3, "click", 0))
    val q = StreamingOps.funnelStream(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_out").start()
    Seq(b1, b2, b3).foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()

    // last update per user = that user's final funnel row
    val finals = spark.table("funnel_out")
      .as[graft.streaming.FunnelUpdate].collect()
      .zipWithIndex.groupBy(_._1.user_id)
      .map { case (_, us) => us.maxBy(_._2)._1 }.toSeq
    val streamedStages = Seq(
      ("1_view", finals.count(_.t1.nonEmpty).toLong,
        None: Option[Long]),
      ("2_click", finals.count(_.t2.nonEmpty).toLong,
        Some(finals.flatMap(f => f.t2.zip(f.t1).map { case (a, b) => a - b }).sum)),
      ("3_purchase", finals.count(_.t3.nonEmpty).toLong,
        Some(finals.flatMap(f => f.t3.zip(f.t2).map { case (a, b) => a - b }).sum)))
    val batch = graft.operators.EventAnalytics.funnelStages(
        (b1 ++ b2 ++ b3).toDF()
          .select(col("user_id"), col("event_type"),
            expr("CAST(ts AS LONG) * 1000000").as("ts_us")))
      .orderBy("stage").collect().toSeq
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(streamedStages == batch)
    // and the crafted edge cases landed as designed
    assert(finals.find(_.user_id == 3).exists(f => f.t1.nonEmpty && f.t2.nonEmpty))
    assert(finals.find(_.user_id == 4).exists(f => f.t1.isEmpty && f.t3.isEmpty))
  }

  test("mapGroupsWithState keeps the newest event per key across batches") {
    val input = MemoryStream[StreamEvent](spark)
    val q = StreamingOps.latestPerKey(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("latest_out").start()

    input.addData(ev(1, 10, 1, "view", 1.0), ev(2, 20, 1, "view", 2.0))
    q.processAllAvailable()
    input.addData(ev(3, 15, 1, "view", 9.0)) // older than event 2 -> ignored
    input.addData(ev(4, 30, 1, "view", 4.0)) // newest -> wins
    q.processAllAvailable(); q.stop()

    val last = spark.table("latest_out").as[LatestUpdate].collect()
      .groupBy(u => (u.user_id, u.event_type))
      .map { case (_, us) => us.last }
    assert(last.toSeq == Seq(LatestUpdate(1, "view", 4, 4.0)))
  }

  test("flatMapGroupsWithState sessionizer emits closed sessions on gap and timeout") {
    import graft.streaming.ClosedSession
    val input = MemoryStream[StreamEvent](spark)
    val q = StreamingOps.sessionize(input.toDS(), gapMinutes = 30)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()

    // user 1: two sessions separated by a >30min gap within one batch
    input.addData(ev(1, 10, 1, "view", 1.0), ev(2, 20, 1, "view", 2.0),
      ev(3, 100, 1, "view", 3.0))
    q.processAllAvailable()
    // a much later event advances the watermark past session 2's timeout
    input.addData(ev(4, 500, 2, "view", 9.0))
    q.processAllAvailable()
    input.addData(ev(5, 900, 2, "view", 9.0))
    q.processAllAvailable(); q.stop()

    val sessions = spark.table("sessions_out").as[ClosedSession].collect()
      .filter(_.user_id == 1L).sortBy(_.start_us)
    assert(sessions.length == 2, sessions.mkString(","))
    assert(sessions(0).n_events == 2 && sessions(0).sum_value == 3.0)
    assert(sessions(1).n_events == 1 && sessions(1).sum_value == 3.0)
  }

  test("foreachBatch upsert sink is last-write-wins over micro-batches") {
    val dir = Files.createTempDirectory("graft_stream_upsert").toString + "/t"
    val input = MemoryStream[StreamEvent](spark)
    val q = StreamingOps.upsertSink(
      input.toDF().select($"user_id", $"event_type", $"event_id", $"value",
        unix_micros($"ts").as("ts_us")),
      spark, dir, Seq("user_id", "event_type"), Seq("ts_us", "event_id"))

    input.addData(ev(1, 10, 1, "view", 1.0), ev(2, 12, 2, "buy", 2.0))
    q.processAllAvailable()
    input.addData(ev(3, 20, 1, "view", 7.0))
    q.processAllAvailable(); q.stop()

    val rows = spark.read.parquet(dir)
      .select("user_id", "event_type", "event_id", "value")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(rows == Set((1L, "view", 3L, 7.0), (2L, "buy", 2L, 2.0)))
  }

  test("dedupStream drops re-delivered ids within the watermark, state bounded") {
    val input = MemoryStream[StreamEvent](spark)
    val q = StreamingOps.dedupStream(input.toDF(), "event_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()

    input.addData(ev(1, 10, 1, "view", 1.0), ev(2, 11, 1, "view", 2.0))
    q.processAllAvailable()
    // re-delivery of event 1 (same id) inside the allowance -> dropped,
    // while the genuinely new event 3 passes
    input.addData(ev(1, 10, 1, "view", 1.0), ev(3, 12, 1, "view", 3.0))
    q.processAllAvailable(); q.stop()

    val ids = spark.table("dedup_out").select("event_id")
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("stream-stream interval join pairs events within the gap, same key only") {
    val views = MemoryStream[StreamEvent](spark)
    val buys = MemoryStream[StreamEvent](spark)
    val q = StreamingOps.intervalJoinStream(
        views.toDF().select($"ts", $"user_id", $"event_id".as("view_id")),
        buys.toDF().select($"ts", $"user_id", $"event_id".as("buy_id")),
        gapMinutes = 30)
      .select("view_id", "buy_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("ij_out").start()

    views.addData(ev(1, 10, 1, "view", 0), ev(2, 50, 1, "view", 0),
      ev(3, 55, 2, "view", 0))
    buys.addData(ev(10, 60, 1, "purchase", 0), ev(11, 200, 2, "purchase", 0))
    q.processAllAvailable(); q.stop()

    val pairs = spark.table("ij_out").as[(Long, Long)].collect().toSet
    // buy 10 (min 60, user 1): view 2 (min 50) in window; view 1 (min 10) is
    // outside the 30-min gap. buy 11 (min 200, user 2): view 3 too old.
    assert(pairs == Set((2L, 10L)))
  }

  test("stateful duals order at µs grain: sub-ms events neither tie nor reorder") {
    // Three events inside 1.5 ms, with event_ids arranged so an ms-grain
    // sort key (ts.getTime) ties the first two and then orders them
    // BACKWARDS by id: the view (id 9) precedes the click (id 1) by only
    // 500 µs. The batch twins (q73/q80) compare at full µs grain, so the
    // duals must too — this pins the lossless-µs conversion.
    def tsOfUs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000000L * 1000L)
      t.setNanos((us % 1000000L).toInt * 1000)
      t
    }
    val base = 60L * 1000000L
    val events = Seq(
      StreamEvent(9, tsOfUs(base + 200), 1, "view", 0.0),
      StreamEvent(1, tsOfUs(base + 700), 1, "click", 0.0), // same ms as the view
      StreamEvent(2, tsOfUs(base + 1700), 1, "purchase", 0.0))

    val tIn = MemoryStream[StreamEvent](spark)
    val tq = StreamingOps.transitionsStream(tIn.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("subms_trans").start()
    tIn.addData(events); tq.processAllAvailable(); tq.stop()
    val trans = spark.table("subms_trans")
      .as[graft.streaming.Transition].collect().toSeq
    assert(trans == Seq(graft.streaming.Transition("view", "click"),
      graft.streaming.Transition("click", "purchase")),
      s"ms-grain tie reordered the pairs: $trans")

    val fIn = MemoryStream[StreamEvent](spark)
    val fq = StreamingOps.funnelStream(fIn.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("subms_funnel").start()
    fIn.addData(events); fq.processAllAvailable(); fq.stop()
    val fin = spark.table("subms_funnel")
      .as[graft.streaming.FunnelUpdate].collect().last
    // strict t1 < t2 gating at µs grain: the click 500 µs after the view
    // advances the funnel (ms grain would see equal stamps and stall),
    // and the emitted stamps carry the sub-ms digits
    assert(fin == graft.streaming.FunnelUpdate(1,
      Some(base + 200), Some(base + 700), Some(base + 1700)))
    // and the rollup equals the batch q73 over the same µs values
    val batch = graft.operators.EventAnalytics.funnelStages(
        events.toDF().select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us")))
      .orderBy("stage").collect().toSeq
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(batch == Seq(("1_view", 1L, None), ("2_click", 1L, Some(500L)),
      ("3_purchase", 1L, Some(1000L))))
  }

  test("upsert sink restarted from its checkpoint is idempotent under re-delivery") {
    // foreachBatch is at-least-once: after a crash/restart the last
    // uncommitted batch replays, and an at-least-once upstream may
    // re-deliver rows it already sent. Exactly-once for this sink =
    // checkpointed offsets (committed batches are NOT reprocessed) +
    // idempotent keyed merge (replayed rows reduce to the same winners).
    // This restarts the query from its checkpoint and re-delivers the
    // first batch verbatim: the parquet target must be byte-identical.
    val base = Files.createTempDirectory("graft_ckpt_replay").toString
    val target = base + "/t"
    val ckpt = base + "/ckpt"
    val input = MemoryStream[StreamEvent](spark)
    def start() = StreamingOps.upsertSink(
      input.toDF().select($"user_id", $"event_type", $"event_id", $"value",
        unix_micros($"ts").as("ts_us")),
      spark, target, Seq("user_id", "event_type"), Seq("ts_us", "event_id"),
      checkpoint = Some(ckpt))
    def snapshot() = spark.read.parquet(target)
      .select("user_id", "event_type", "event_id", "value", "ts_us")
      .as[(Long, String, Long, Double, Long)].collect().toSet

    val firstBatch = Seq(ev(1, 10, 1, "view", 1.0), ev(2, 12, 2, "buy", 2.0),
      ev(3, 20, 1, "view", 7.0))
    val q1 = start()
    input.addData(firstBatch)
    q1.processAllAvailable(); q1.stop()
    val committed = snapshot()
    assert(committed == Set((1L, "view", 3L, 7.0, 1200000000L),
      (2L, "buy", 2L, 2.0, 720000000L)))

    // restart from the same checkpoint: the committed batch is not re-run...
    val q2 = start()
    q2.processAllAvailable()
    assert(snapshot() == committed, "restart alone must not change the target")
    // ...and re-delivering the same rows as a new batch changes nothing
    input.addData(firstBatch)
    q2.processAllAvailable(); q2.stop()
    assert(snapshot() == committed, "re-delivered batch must merge to the same winners")
  }

  test("retentionStream drops cross-batch early-day disorder — never a negative age") {
    // an event landing in a LATER batch with a day EARLIER than the
    // anchored cohort is outside the delivery contract; the documented
    // posture is to drop it (append mode cannot retract the anchor),
    // keeping every emitted invariant intact rather than corrupting the
    // matrix with a negative-age cell
    val input = MemoryStream[StreamEvent](spark)
    val q = StreamingOps.retentionStream(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("ret_disorder_out").start()
    input.addData(ev(1, 1440 * 10, 1, "view", 0)) // day 10 anchors
    q.processAllAvailable()
    input.addData(ev(2, 1440 * 8, 1, "view", 0)) // day 8, later batch
    q.processAllAvailable(); q.stop()
    val rows = spark.table("ret_disorder_out").collect()
    assert(rows.length == 1, rows.mkString(","))
    assert(rows.head.getAs[Long]("age_days") == 0L)
    assert(rows.head.getAs[Long]("cohort_day") == 10L)
  }

  test("q114/q115 streaming duals replay the real corpus to the batch rollups") {
    import graft.operators.EventAnalytics
    // the whole sf0.001 events table, replayed across three
    // micro-batches in global event-time order (per-user order — the
    // documented delivery contract — follows; same-ms ties share a day,
    // so ms-grain ordering cannot move a cohort assignment)
    val sfEvents = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[StreamEvent].collect().toSeq
      .sortBy(e => (e.ts.getTime, e.event_id))
    val chunks = sfEvents.grouped(sfEvents.size / 3 + 1).toSeq

    // q114 dual: first-activity emissions -> shared cohort rollup
    val rIn = MemoryStream[StreamEvent](spark)
    val rq = StreamingOps.retentionStream(rIn.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("ret_dual_out").start()
    chunks.foreach { c => rIn.addData(c); rq.processAllAvailable() }
    rq.stop()
    // materialize off the memory sink: the rollup references the
    // activity frame twice, and a MemoryPlan cannot be self-joined
    val emitted = spark.table("ret_dual_out")
      .select(col("cohort_day"), col("age_days"), col("user_id"))
      .as[(Long, Long, Long)].collect().toSeq
    val activity = emitted
      .toDF("cohort_day", "age_days", "user_id")
    assert(emitted.size == emitted.distinct.size,
      "the stream must emit each (user, day) exactly once")
    val streamedR = EventAnalytics.retentionRollup(activity)
      .collect().toSeq.map(_.toString)
    val batchR = EventAnalytics.q114RetentionCohorts(spark, sf)
      .collect().toSeq.map(_.toString)
    assert(streamedR == batchR, "retention matrix drifted from batch q114")

    // q115 dual: final per-user count -> shared histogram rollup
    val eIn = MemoryStream[StreamEvent](spark)
    val eq = StreamingOps.engagementStream(eIn.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("eng_dual_out").start()
    chunks.foreach { c => eIn.addData(c); eq.processAllAvailable() }
    eq.stop()
    // counts are monotone, so the max update per user is the final one
    val perUser = spark.table("eng_dual_out")
      .groupBy("user_id").agg(max("n_events").as("n_events"))
    val streamedE = EventAnalytics.engagementRollup(perUser)
      .collect().toSeq.map(_.toString)
    val batchE = EventAnalytics.q115EngagementHistogram(spark, sf)
      .collect().toSeq.map(_.toString)
    assert(streamedE == batchE, "engagement histogram drifted from batch q115")
  }
}

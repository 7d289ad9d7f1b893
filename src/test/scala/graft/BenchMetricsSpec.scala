package graft

import org.apache.spark.sql.functions._

/** The bench instrumentation contract: the listener attributes shuffle
  * bytes, GC, and EXACT peak storage to the window between reset() and
  * snapshot(), with the bus drained around each read — the fields the
  * judge uses to tell plan regressions from in-sweep noise.
  */
class BenchMetricsSpec extends SparkSpec {

  private def drain(): Unit =
    org.apache.spark.sql.GraftListenerBridge.drain(spark.sparkContext)

  test("shuffle bytes land in the window that shuffled; map-only windows read zero") {
    val listener = new BenchMetricsListener
    spark.sparkContext.addSparkListener(listener)
    try {
      import spark.implicits._
      val df = (1 to 10000).map(i => (i % 7, i.toLong)).toDF("k", "v")

      drain(); listener.reset()
      df.groupBy("k").agg(sum("v")).collect() // one exchange
      drain()
      val shuffled = listener.snapshot()
      assert(shuffled.shuffleWrite > 0, shuffled)
      assert(shuffled.shuffleRead > 0, shuffled)

      drain(); listener.reset()
      df.select(col("v") * 2).collect() // map-only
      drain()
      val mapOnly = listener.snapshot()
      assert(mapOnly.shuffleWrite == 0 && mapOnly.shuffleRead == 0,
        s"map-only window charged shuffle bytes: $mapOnly")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("peak storage tracks pinned checkpoint blocks and falls after release") {
    val listener = new BenchMetricsListener
    spark.sparkContext.addSparkListener(listener)
    try {
      import spark.implicits._
      drain(); listener.reset()
      val (cp, handle) = Checkpoints.checkpointed(
        (1 to 50000).map(i => (i.toLong, s"row $i payload")).toDF("id", "s"))
      cp.count()
      drain()
      val pinned = listener.snapshot()
      assert(pinned.peakStorage > 0, pinned)

      handle.release(blocking = true)
      drain(); listener.reset() // watermark restarts from CURRENT live bytes
      spark.range(10).count()
      drain()
      val after = listener.snapshot()
      assert(after.peakStorage < pinned.peakStorage,
        s"peak did not fall after release: $pinned -> $after")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      Checkpoints.releaseAll(blocking = true)
    }
  }

  test("driftFactors brackets each query between its neighboring probes") {
    // quiet machine: every probe equals the anchor → factor 1 everywhere
    val quiet = Bench.driftFactors(4, Seq((0, 0.5), (2, 0.5), (4, 0.5)))
    assert(quiet == Seq(1.0, 1.0, 1.0, 1.0), quiet)

    // load arrives mid-sweep: probe at position 2 reads 2×, the final
    // anchor 3×. Queries 0–1 sit between the 1× and 2× probes (mean
    // 1.5×); queries 2–3 between 2× and 3× (mean 2.5×).
    val loaded = Bench.driftFactors(4, Seq((0, 1.0), (2, 2.0), (4, 3.0)))
    assert(loaded == Seq(1.5, 1.5, 2.5, 2.5), loaded)

    // probe highs inside the dead-band are instrument noise: ZERO
    // correction, the normalized total must equal the raw total on a
    // quiet machine (mid-sweep bracket factors reach ~1.36× the sweep
    // minimum even with nothing else running)
    val jitter = Bench.driftFactors(4, Seq((0, 1.0), (2, 1.35), (4, 1.1)))
    assert(jitter == Seq(1.0, 1.0, 1.0, 1.0), jitter)

    // sustained load for the WHOLE sweep except one quiet probe: the
    // base is the minimum probe (the machine's demonstrated capacity),
    // so the loaded stretches normalize down even when the position-0
    // anchor itself ran loaded — the round-13 failure mode (sustained
    // drift the spread defense can't see) made visible
    val sustained = Bench.driftFactors(4, Seq((0, 2.0), (2, 1.0), (4, 2.0)))
    assert(sustained == Seq(1.5, 1.5, 1.5, 1.5), sustained)

    // a uniformly loaded sweep (every probe 2×, including both anchors)
    // has min = every probe → factors 1: normalization never invents a
    // quiet machine it did not observe; the sweep-level
    // calibration_drift and absolute probe values carry that case
    val uniform = Bench.driftFactors(3, Seq((0, 2.0), (3, 2.0)))
    assert(uniform == Seq(1.0, 1.0, 1.0), uniform)

    // anchors are mandatory: a boundary set missing position 0 or n fails
    intercept[IllegalArgumentException] {
      Bench.driftFactors(4, Seq((1, 1.0), (4, 1.0)))
    }
    intercept[IllegalArgumentException] {
      Bench.driftFactors(4, Seq((0, 1.0), (3, 1.0)))
    }
  }

  test("synthetic background load: drift-normalized headline recovers the quiet total within 10%") {
    // the verdict-6 acceptance shape, run as deterministic arithmetic
    // against the REAL driftFactors composition: a quiet per-query time
    // vector, a background stressor modeled as a load ramp 1.0 → 1.8
    // across the sweep inflating every observation multiplicatively,
    // probes every 2 queries observing the same ramp. The drift-
    // normalized total must land within 10% of the quiet-machine total
    // even though the raw loaded total is ~40% high.
    val quiet = Seq(0.2, 0.4, 0.3, 0.5, 0.1, 0.6)
    val n = quiet.size
    def load(pos: Double): Double = 1.0 + 0.8 * pos / n
    val observed = quiet.zipWithIndex.map { case (t, i) => t * load(i + 0.5) }
    val probes = (0 to n by 2).map(i => (i, 0.09 * load(i.toDouble)))
    val factors = Bench.driftFactors(n, probes)
    val normalized = observed.zip(factors).map { case (t, f) => t / f }.sum
    val quietTotal = quiet.sum
    assert(observed.sum / quietTotal > 1.3,
      s"precondition: the raw loaded total should be visibly inflated, got ${observed.sum}")
    assert(math.abs(normalized - quietTotal) / quietTotal < 0.10,
      s"normalized $normalized vs quiet $quietTotal")
  }

  test("shuffle_identical_to_prev: tolerance band, parse, and shape surprises") {
    // within 3% (or 64 bytes) = identical; integer-factor moves are not
    assert(Bench.shuffleIdentical(1000000L, 1000000L))
    assert(Bench.shuffleIdentical(1000000L, 1029999L))
    assert(!Bench.shuffleIdentical(1000000L, 1031000L))
    assert(Bench.shuffleIdentical(0L, 0L))
    assert(Bench.shuffleIdentical(10L, 70L), "64-byte floor for tiny shuffles")
    assert(!Bench.shuffleIdentical(10L, 80L))
    assert(!Bench.shuffleIdentical(1000000L, 2000000L), "a plan change is never identical")
    // parse: the committed bench_out.json field shape
    val txt = """{"metric":"total","shuffle_read_bytes":{"q1":123,"q2":0},"queries":{}}"""
    assert(Bench.parsePrevShuffle(txt) == Map("q1" -> 123L, "q2" -> 0L))
    // shape surprises yield an empty baseline, never a throw
    assert(Bench.parsePrevShuffle("""{"metric":"total"}""").isEmpty)
    assert(Bench.parsePrevShuffle("""{"shuffle_read_bytes":[1,2]}""").isEmpty)
    assert(Bench.parsePrevShuffle("not json at all").isEmpty)
    assert(Bench.parsePrevShuffle("").isEmpty)
  }
}

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
}

package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerBlockUpdated, SparkListenerTaskEnd, SparkListenerUnpersistRDD}
import org.apache.spark.storage.{BlockId, RDDBlockId}

/** Per-query resource accounting for `Bench` — the instrumentation that
  * lets a reader of `bench_out.json` tell a plan regression from
  * in-sweep measurement noise without re-timing queries by hand:
  *
  *   - shuffle read/write bytes: the plan-shape signal. A query whose
  *     time moved while its shuffle bytes did not has the same plan
  *     doing the same work — the delta is environment (GC, OS cache),
  *     not code.
  *   - peak storage bytes: pinned-block pressure (localCheckpoint
  *     lifecycle), tracked exactly from block-update events — a running
  *     sum over live RDD block sizes, high-watermarked per query.
  *     Broadcast blocks are excluded (their removal posts no event, so
  *     they could only ever accumulate — see onBlockUpdated).
  *   - GC ms + spill bytes: the noise signals themselves.
  *
  * Metrics are accumulated from listener events (delivered async — the
  * caller serializes on `GraftListenerBridge.drain` before reading) and
  * reset at each timed run's start. Thread-safe throughout: events
  * arrive on the bus thread while queries run on the main thread.
  */
final class BenchMetricsListener extends SparkListener {
  private val shuffleRead = new AtomicLong
  private val shuffleWrite = new AtomicLong
  private val gcMs = new AtomicLong
  private val spill = new AtomicLong
  // exact storage tracking: live block → bytes; `stored` is the running
  // total and survives reset (blocks persist across query boundaries
  // until released), `peak` is the per-window high watermark
  private val blocks = new ConcurrentHashMap[BlockId, Long]()
  private val stored = new AtomicLong
  private val peak = new AtomicLong

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      gcMs.addAndGet(m.jvmGCTime)
      spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
    }
  }

  // RDD blocks ONLY: broadcast blocks post a block-updated event when
  // stored but none when the ContextCleaner removes them, so counting
  // them would ratchet `stored` upward across a long sweep and inflate
  // later queries' peaks. The field exists to watch the pinned
  // localCheckpoint lifecycle (RDD blocks, released via onUnpersistRDD),
  // so broadcast footprint is deliberately out of scope rather than
  // wrongly accumulated.
  override def onBlockUpdated(e: SparkListenerBlockUpdated): Unit = {
    val u = e.blockUpdatedInfo
    if (u.blockId.isInstanceOf[RDDBlockId]) {
      val sz = if (u.storageLevel.isValid) u.memSize + u.diskSize else 0L
      val prev =
        if (sz > 0L) Option(blocks.put(u.blockId, sz)).getOrElse(0L)
        else Option(blocks.remove(u.blockId)).getOrElse(0L)
      val cur = stored.addAndGet(sz - prev)
      peak.accumulateAndGet(cur, (a: Long, b: Long) => math.max(a, b))
    }
  }

  // RDD unpersist does NOT emit per-block updates — it posts one
  // unpersist event; without this the running total only ever grows and
  // every release (the Checkpoints lifecycle this field exists to watch)
  // would be invisible
  override def onUnpersistRDD(e: SparkListenerUnpersistRDD): Unit = {
    val it = blocks.entrySet().iterator()
    var freed = 0L
    while (it.hasNext) {
      val entry = it.next()
      entry.getKey match {
        case RDDBlockId(rddId, _) if rddId == e.rddId =>
          freed += entry.getValue; it.remove()
        case _ => ()
      }
    }
    if (freed != 0L) stored.addAndGet(-freed)
  }

  /** Zero the per-window counters; the storage watermark restarts from
    * the CURRENT live-block total (not zero — blocks the previous
    * window leaked would otherwise vanish from the next one's peak).
    */
  def reset(): Unit = {
    shuffleRead.set(0); shuffleWrite.set(0); gcMs.set(0); spill.set(0)
    peak.set(stored.get)
  }

  def snapshot(): BenchMetricsListener.Snapshot =
    BenchMetricsListener.Snapshot(shuffleRead.get, shuffleWrite.get,
      gcMs.get, spill.get, peak.get)
}

object BenchMetricsListener {
  final case class Snapshot(shuffleRead: Long, shuffleWrite: Long,
      gcMs: Long, spillBytes: Long, peakStorage: Long)
}

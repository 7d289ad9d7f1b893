package graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

/** Session-scoped lifecycle registry for `localCheckpoint` blocks.
  *
  * `Dataset.localCheckpoint` pins its materialized partitions in executor
  * storage for the lifetime of the SparkSession — there is no automatic
  * release, and because the checkpoint truncates lineage, an unpersisted
  * checkpoint CANNOT be recomputed (actions on it fail with "checkpoint
  * block not found"). So release has a hard ordering constraint: only
  * after every consumer of the checkpointed frame has run its action.
  *
  * This registry gives the library one disciplined shape for that:
  *
  *   - Operators take checkpoints through [[checkpoint]] /
  *     [[checkpointed]] instead of calling `df.localCheckpoint` directly.
  *     Every checkpoint is recorded here.
  *   - Iterative operators (connected-components fixpoints) release each
  *     superseded round's blocks inline via the returned [[Handle]] the
  *     moment the next round is materialized — peak storage stays at one
  *     round's working set instead of growing with the iteration count.
  *   - Entry points that run many queries in one session (`Bench`,
  *     `Verify`) call [[releaseAll]] after each query's terminal action,
  *     so no query's pinned blocks survive into the next query's run.
  *     Without this, an 80-query sweep accumulates every query's
  *     checkpoint blocks — the round-5 bench measured a ~12 s drift on
  *     storage-heavy queries from exactly that accumulation.
  *
  * Long-lived user sessions get the same lever: call [[releaseAll]] at
  * any query boundary (after consuming results) to return executor
  * storage to baseline.
  */
object Checkpoints {

  /** Releasable handle over the storage blocks one checkpoint pinned.
    * Safe to release multiple times; only release after every consumer
    * of the checkpointed frame has acted (the blocks are unrecoverable).
    *
    * `blocking = true` waits for the block manager to confirm removal —
    * use it when the caller is about to start a timed window (so async
    * cleanup cannot leak into it); the default stays async because
    * fixpoint loops release a superseded round every iteration and must
    * not stall the next round on block-removal round-trips.
    */
  final class Handle private[Checkpoints] (rdds: Seq[RDD[_]]) {
    def release(blocking: Boolean = false): Unit = rdds.foreach { r =>
      try r.unpersist(blocking)
      catch { case _: Throwable => () }
      live.remove(r)
    }
  }

  private val live = new java.util.concurrent.ConcurrentLinkedQueue[RDD[_]]()

  private val scopes =
    new ThreadLocal[List[scala.collection.mutable.ArrayBuffer[Handle]]] {
      override def initialValue(): List[scala.collection.mutable.ArrayBuffer[Handle]] = Nil
    }

  /** Run `body`, then release ONLY the checkpoints the current thread
    * registered inside it — the composition-safe cleanup for LIBRARY
    * code that can run concurrently with foreground queries.
    * [[releaseAll]] is a session-wide query-boundary lever; called from
    * a subroutine (artifact maintenance on a streaming micro-batch
    * thread) it would unpersist a concurrent query's still-live
    * checkpoint blocks, which lineage truncation makes unrecoverable.
    * Scopes nest (inner scopes release first); handles released early
    * inside the scope (fixpoint rounds) release again harmlessly.
    */
  def scoped[T](body: => T): T = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Handle]
    scopes.set(buf :: scopes.get())
    try body
    finally {
      scopes.set(scopes.get().tail)
      buf.foreach(_.release())
    }
  }

  /** `df.localCheckpoint(eager)`, registered for [[releaseAll]]. */
  def checkpoint(df: DataFrame, eager: Boolean = true): DataFrame =
    checkpointed(df, eager)._1

  /** As [[checkpoint]], plus a [[Handle]] for targeted early release —
    * the shape iterative fixpoints need to drop round N-1's blocks as
    * soon as round N is materialized.
    *
    * The pinned RDD is captured DIRECTLY off the returned plan: a
    * local checkpoint's result is a single `LogicalRDD` leaf whose
    * `rdd` IS the persisted internal RDD (persist is marked at
    * checkpoint time for both eager and lazy checkpoints). No global
    * `getPersistentRDDs` snapshot diff, no lock: concurrent
    * checkpoints — or any concurrent `.persist()` elsewhere in the
    * session — cannot be claimed by the wrong handle, and an
    * eager materialization job never runs under a registry-wide
    * monitor. (The earlier set-diff approach held this object's lock
    * for the full materialization job and cost two persistent-RDD map
    * snapshots per call — measurable per-iteration overhead in the
    * connected-components fixpoints, which checkpoint every round.)
    */
  def checkpointed(df: DataFrame, eager: Boolean = true): (DataFrame, Handle) = {
    // Mark lazily, then materialize outside any lock: Dataset's own
    // eager path is exactly `internalRdd.count()` after the mark.
    val cp = df.localCheckpoint(eager = false)
    val rdds: Seq[RDD[_]] = cp.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
    // Plan-shape drift (a Spark version whose localCheckpoint no longer
    // surfaces a LogicalRDD leaf) must fail loudly: an empty capture
    // would silently skip materialization AND registration, quietly
    // reintroducing the storage leak this registry exists to prevent.
    require(rdds.nonEmpty,
      "localCheckpoint plan did not expose a LogicalRDD leaf — " +
        "checkpoint capture cannot register its storage blocks")
    // Eager checkpoints materialize BEFORE registering: a concurrent
    // releaseAll() (long-lived sessions call it at query boundaries)
    // must not unpersist a half-materialized checkpoint whose lineage
    // is already truncated — that frame would be permanently
    // unrecoverable. Registration happens even if the count throws
    // (finally), so a failed materialization's partial blocks are still
    // released by the next releaseAll instead of leaking. Lazy
    // checkpoints are materialized by the CALLER's first action, which
    // the registry cannot order around — lazy users release through the
    // returned Handle after their own actions, as the fixpoints do.
    if (eager) {
      try rdds.foreach(_.count())
      finally rdds.foreach(live.add)
    } else rdds.foreach(live.add)
    val handle = new Handle(rdds)
    scopes.get().headOption.foreach(_ += handle)
    (cp, handle)
  }

  /** Unpersist every registered checkpoint's blocks. Call only at a
    * query boundary — any still-unconsumed frame built over a released
    * checkpoint will fail on its next action. `blocking = true` waits
    * for confirmed removal (callers about to open a timed window).
    */
  def releaseAll(blocking: Boolean = false): Unit = {
    var r = live.poll()
    while (r != null) {
      try r.unpersist(blocking)
      catch { case _: Throwable => () }
      r = live.poll()
    }
  }

  /** Number of registered, not-yet-released checkpoints (for specs). */
  def liveCount: Int = live.size
}

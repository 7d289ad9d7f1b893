package graft

import graft.operators.Dedup

/** Lifecycle guard for localCheckpoint blocks (the round-5 leak): every
  * checkpoint an operator takes must be registered with [[Checkpoints]],
  * iterative fixpoints must release superseded rounds inline, and a
  * query-boundary `releaseAll` must return executor storage to baseline
  * — the invariant `Bench`/`Verify` rely on across an 80-query sweep.
  */
class CheckpointLifecycleSpec extends SparkSpec {
  private def pinned: Int = spark.sparkContext.getPersistentRDDs.size

  private def materialize(name: String): Unit =
    SparkEntry.queries(name)(spark, sf)
      .write.format("noop").mode("overwrite").save()

  test("CC fixpoint releases superseded rounds inline; peak stays bounded") {
    Checkpoints.releaseAll()
    val base = pinned
    Dedup.q40DedupKeepers(spark, sf)
      .write.format("noop").mode("overwrite").save()
    // After the action, only the FINAL label table may remain pinned:
    // the symmetrized edge list and every superseded round were released
    // inside the loop. A leak here grows with the iteration count.
    val after = pinned - base
    assert(after <= 1,
      s"CC fixpoint left $after checkpoints pinned (expected <= 1: final labels)")
    Checkpoints.releaseAll()
    assert(pinned <= base, "releaseAll did not return storage to baseline")
  }

  test("multi-query sweep returns to baseline with per-query releaseAll") {
    Checkpoints.releaseAll()
    val base = pinned
    // the checkpoint-heavy queries: CC chain consumers, decontam probe,
    // winnowing index, split-overlap index, source-overlap index
    val heavy = Seq("q40_dedup_keepers", "q47_decontaminate",
      "q65_winnow_pairs", "q60_split_overlap", "q77_source_overlap",
      "q50_incremental_dedup")
    heavy.foreach { q =>
      materialize(q)
      Checkpoints.releaseAll()
      assert(pinned <= base,
        s"$q left ${pinned - base} checkpoint blocks pinned after releaseAll")
    }
    assert(Checkpoints.liveCount == 0)
  }

  test("star contraction releases superseded edge sets inline") {
    import spark.implicits._
    Checkpoints.releaseAll()
    val base = pinned
    // a 64-chain forces several contraction rounds
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("src", "dst")
    val verts = (0L to 63L).toDF("v")
    val labels = Dedup.connectedComponentsStar(verts, edges)
    assert(labels.agg(org.apache.spark.sql.functions.sum("label"))
      .head.getLong(0) == 0L)
    val after = pinned - base
    assert(after <= 1,
      s"star contraction left $after checkpoints pinned (expected <= 1: final edges)")
    Checkpoints.releaseAll()
    assert(pinned <= base)
  }
}

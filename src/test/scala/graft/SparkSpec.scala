package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared ScalaTest base: one local SparkSession per suite (lazy, shared JVM
  * via getOrCreate), UTC, small shuffle-partition count for local mode.
  *
  * Suites run sequentially in the forked test JVM (`Test / fork := true`
  * without `testForkedParallel`), all sharing one SparkSession — so each
  * suite drains the [[Checkpoints]] registry on exit, keeping pinned
  * localCheckpoint blocks from accumulating across the 30+ suite run.
  * (Drain is per-suite, not per-test: a suite may legitimately share a
  * checkpointed frame between its tests.)
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  override def afterAll(): Unit = {
    Checkpoints.releaseAll()
    super.afterAll()
  }

  /** Recursive delete for the temp dirs artifact-root tests create. */
  protected def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // q75's band-0 rank cap is SourceTokenBudget+1 (2001); the map-side
    // WindowGroupLimit rewrite only fires at or under this threshold
    .config("spark.sql.optimizer.windowGroupLimitThreshold", "2048")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf: String = "/root/testdata/sf0.001"
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusOps, Dedup}

/** Scale-pathology evidence: a corpus whose dominant feature is one huge
  * duplicate cluster — k copies of a boilerplate page — which is exactly
  * what real crawls contain and exactly what makes unbounded LSH joins go
  * O(k²). These tests drive the REAL operators end-to-end over a crafted
  * parquet corpus and assert the bounds hold.
  */
class HotClusterSpec extends SparkSpec {

  private val Clones = 200

  /** documents.parquet with one 200-clone cluster + 50 distinct docs. */
  private lazy val dir: String = {
    import spark.implicits._
    val boiler = "terms of service apply to all pages on this site " * 4
    val clones = (0 until Clones).map(i =>
      (i.toLong, boiler.trim, "en", "crawl", boiler.trim.length.toLong))
    val distinct = (0 until 50).map { i =>
      val text = (0 until 40).map(j => s"w${i}_$j").mkString(" ")
      ((Clones + i).toLong, text, "en", "crawl", text.length.toLong)
    }
    val d = java.nio.file.Files.createTempDirectory("hotcluster").toString
    (clones ++ distinct)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q18 bucket cap keeps the clone cluster from exploding the pair output") {
    val pairs = Dedup.q18DedupMinhash(spark, dir).collect()
    // uncapped, the cluster alone would emit C(200,2) = 19900 pairs; the
    // population cap drops its saturated buckets before the self-join
    assert(pairs.length < Clones * (Clones - 1) / 2 / 10,
      s"pair output ${pairs.length} looks quadratic in the clone count")
    val cloneIds = (0L until Clones).toSet
    assert(!pairs.exists(r => cloneIds.contains(r.getAs[Long]("doc_a")) &&
      cloneIds.contains(r.getAs[Long]("doc_b"))),
      "clone-cluster pairs must be handled by exact dedup, not the LSH join")
  }

  test("q40 still assigns every clone one keeper via the exact-dup edges") {
    val rows = Dedup.q40DedupKeepers(spark, dir).collect()
    assert(rows.length == Clones + 50)
    val keepers = rows.filter(r => r.getAs[Long]("doc_id") < Clones)
      .map(_.getAs[Long]("keeper_id")).toSet
    assert(keepers == Set(0L),
      s"all clones must cluster under doc 0, got keepers $keepers")
    // distinct docs keep themselves
    rows.filter(r => r.getAs[Long]("doc_id") >= Clones).foreach { r =>
      assert(r.getAs[Boolean]("is_keeper"))
    }
  }

  test("q54 reports full span duplication for clones, none for distinct docs") {
    val rows = CorpusOps.q54DupSpans(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("dup_fraction")).toMap
    (0L until Clones).foreach(id => assert(rows(id) == 1.0))
    (Clones.toLong until (Clones + 50L)).foreach(id => assert(rows(id) == 0.0))
  }

  test("connectedComponents fails loudly past the iteration bound on a long chain") {
    import spark.implicits._
    // a 12-vertex path has diameter 11 > maxIter 3: propagation must
    // refuse to return a half-converged labelling
    val vs = (0L until 12L).toDF("v")
    val es = (0L until 11L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(vs, es, maxIter = 3).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // and with the bound relaxed the same graph converges to one component
    val labels = Dedup.connectedComponents(vs, es).collect()
      .map(_.getAs[Long]("label")).toSet
    assert(labels == Set(0L))
  }

  test("q50 marks cloned incoming docs as exact duplicates of the corpus") {
    val rows = CorpusOps.q50IncrementalDedup(spark, dir).collect()
    // every incoming (val/test-split) clone must resolve to an exact dup
    // of the smallest train-split clone, never 'new'
    val trainClone = rows.filter(r => r.getAs[Long]("doc_id") < Clones)
    assert(trainClone.nonEmpty)
    trainClone.foreach { r =>
      assert(r.getAs[String]("verdict") == "exact_dup", r.toString)
    }
  }
}

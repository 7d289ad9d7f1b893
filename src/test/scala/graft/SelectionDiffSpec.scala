package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, CorpusOps, FuzzyJoin}

/** Behavioral checks for token-budget selection (q75), snapshot diff
  * (q76), and the blocked fuzzy join (q79).
  */
class SelectionDiffSpec extends SparkSpec {

  test("q75 never exceeds the budget and is a greedy prefix per source") {
    val rows = Curation.q75TokenBudget(spark, sf).collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("cum_tokens"))
      assert(sorted.last.getAs[Long]("cum_tokens") <= Curation.SourceTokenBudget)
      // cum is the running sum of n_tokens in admission order
      val runs = sorted.map(_.getAs[Long]("n_tokens")).scanLeft(0L)(_ + _).tail
      assert(runs.toSeq == sorted.map(_.getAs[Long]("cum_tokens")).toSeq)
      // greedy longest-first: admitted docs are a prefix of the
      // length-descending order, so no skipped doc is longer than an
      // admitted one (ties broken by doc_id)
      val minAdmitted = sorted.map(_.getAs[Long]("n_tokens")).min
      assert(sorted.head.getAs[Long]("n_tokens") ==
        sorted.map(_.getAs[Long]("n_tokens")).max)
      assert(minAdmitted >= 0)
    }
    assert(bySource.nonEmpty)
  }

  test("q75 band decomposition is invariant in the band width") {
    // any width must reproduce the single-window semantics exactly; a
    // huge width degenerates to one band per source (the plain window),
    // width 1 puts every distinct length in its own band
    val ws = graft.functions.Tokenizer.Whitespace
    val expected = Curation
      .tokenBudgetBanded(spark, sf, 1000000L, ws).collect().map(_.toString).toSeq
    for (width <- Seq(1L, 7L, Curation.TokenBandWidth, 517L)) {
      val got = Curation.tokenBudgetBanded(spark, sf, width, ws)
        .collect().map(_.toString).toSeq
      assert(got == expected, s"width $width drifted")
    }
  }

  test("q75 custom tokenizer changes token counts through the seam") {
    // the synthetic corpus is letters+single-spaces only, so BpePre
    // coincides with whitespace here — use a tokenizer that provably
    // differs (character grain) to exercise the seam
    object CharTokens extends graft.functions.Tokenizer {
      override def tokens(text: org.apache.spark.sql.Column) =
        split(text, "")
    }
    val ws = Curation.q75TokenBudget(spark, sf)
      .agg(sum("n_tokens")).head.getLong(0)
    val chars = Curation.tokenBudget(spark, sf, CharTokens)
      .agg(sum("n_tokens")).head.getLong(0)
    assert(ws != chars)
  }

  test("q76 statuses partition the expected id stripes") {
    val d = Tables.documents(spark, sf)
    val rows = CorpusOps.q76SnapshotDiff(spark, sf).collect()
    val byStatus = rows.groupBy(_.getAs[String]("status"))
      .view.mapValues(_.map(_.getAs[Long]("doc_id")).toSet).toMap
    val ids = d.select("doc_id").collect().map(_.getLong(0)).toSet
    // added: not in prior (id % 7 == 0) but in current (id % 5 != 3)
    assert(byStatus.getOrElse("added", Set.empty) ==
      ids.filter(i => i % 7 == 0 && i % 5 != 3))
    // removed: in prior but deleted from current
    assert(byStatus.getOrElse("removed", Set.empty) ==
      ids.filter(i => i % 7 != 0 && i % 5 == 3))
    // changed: present both sides with the % 11 truncation (long texts)
    byStatus.getOrElse("changed", Set.empty).foreach { i =>
      assert(i % 7 != 0 && i % 5 != 3 && i % 11 == 0)
    }
    // statuses are disjoint and cover nothing unchanged
    assert(rows.length ==
      byStatus.values.map(_.size).sum)
  }

  test("q81 re-processes exactly the diff's added/changed documents") {
    val diffIds = CorpusOps.q76SnapshotDiff(spark, sf)
      .filter(col("status").isin("added", "changed"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    val out = CorpusOps.q81IncrementalRefresh(spark, sf).collect()
    Checkpoints.releaseAll()
    // change-bounded: one verdict per diff doc, nothing else re-processed
    assert(out.map(_.getAs[Long]("doc_id")).toSet == diffIds.keySet)
    assert(out.length == diffIds.size)
    out.foreach { r =>
      assert(r.getAs[String]("status") == diffIds(r.getAs[Long]("doc_id")))
      val verdict = r.getAs[String]("verdict")
      assert(Set("exact_dup", "near_dup", "new")(verdict))
      // a matched verdict names a corpus doc, which is never an incoming doc
      if (verdict != "new") {
        val m = r.getAs[Long]("match_id")
        assert(!diffIds.contains(m), s"match_id $m is itself incoming")
      }
    }
  }

  test("q79 finds known lev-1 adjective pairs and respects the threshold") {
    val rows = FuzzyJoin.q79FuzzyMatch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("edit_dist") <= FuzzyJoin.MaxEditDistance)
      // blocked on the shared last word
      assert(r.getAs[String]("name_a").split(" ").last ==
        r.getAs[String]("name_b").split(" ").last)
      assert(r.getAs[String]("name_a") < r.getAs[String]("name_b"))
      assert(r.getAs[Long]("n_parts_a") > 0 && r.getAs[Long]("n_parts_b") > 0)
    }
    // cold/old differ by one edit and both exist in the catalog
    val names = Tables.part(spark, sf).select("p_name").distinct
      .collect().map(_.getString(0)).toSet
    val expectPair = names.exists(n => n.startsWith("cold ") &&
      names.contains(n.replace("cold ", "old ")))
    if (expectPair)
      assert(rows.exists(r => r.getAs[String]("name_a").startsWith("cold ")
        && r.getAs[String]("name_b").startsWith("old ")))
  }

  test("q79 block cap drops oversized blocks instead of joining them") {
    // direct unit check of the capping shape on a crafted frame: one
    // giant block and one small one
    import spark.implicits._
    val crafted = (1 to 2000).map(i => s"name$i x") ++ Seq("a y", "b y")
    val df = crafted.toDF("p_name")
    val names = df.groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("n_parts"))
      .withColumn("block", element_at(split(col("name"), " "), -1))
      .withColumn("block_pop",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("block")))
    val kept = names.filter(col("block_pop") <= FuzzyJoin.MaxBlockPop)
    assert(kept.filter(col("block") === "x").count() == 0)
    assert(kept.filter(col("block") === "y").count() == 2)
  }
}

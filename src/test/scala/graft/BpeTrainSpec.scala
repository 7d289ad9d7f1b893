package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** q135 BPE merge training: hand-computed greedy-merge arithmetic on
  * crafted dictionaries, plus structural invariants on the corpus run
  * (the value hash is the DuckDB oracle's job).
  */
class BpeTrainSpec extends SparkSpec {

  private def train(vocab: Seq[(String, Long)], steps: Int) = {
    import spark.implicits._
    TextAnalysis.bpeTrainFrom(spark, vocab.toDF("token", "n"), steps)
      .collect()
      .map(r => (r.getAs[Int]("step"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[String]("merged"),
        r.getAs[Long]("weight")))
      .toSeq
  }

  test("crafted dictionary: merges, weights, and order are exact") {
    // aaab×10 holds (a,a) twice (multiplicity!) and (a,b) once;
    // ab×5 adds (a,b). Step 1 picks (a,a) at 20; the greedy merge
    // rewrites aaab to [aa, a, b], so step 2 picks (a,b) at 15 — the
    // aa,a pair only has 10; step 3 merges (aa, ab); then no pairs
    // remain and training stops early.
    val out = train(Seq("aaab" -> 10L, "ab" -> 5L), steps = 8)
    assert(out == Seq(
      (1, "a", "a", "aa", 20L),
      (2, "a", "b", "ab", 15L),
      (3, "aa", "ab", "aaab", 10L)))
  }

  test("greedy non-overlap: aaa merges one pair and leaves the odd one") {
    val out = train(Seq("aaa" -> 1L), steps = 8)
    // ' a  a  a ' → (a,a) weight 2 (two adjacent positions), ONE merge
    // fires greedily left-to-right → [aa, a]; then (aa, a) at 1; done
    assert(out == Seq(
      (1, "a", "a", "aa", 2L),
      (2, "aa", "a", "aaa", 1L)))
  }

  test("tie-break: equal weights resolve by (lhs, rhs) string order") {
    // (a,b) and (c,d) both weigh 3 — the pair ordering must pick (a,b)
    val out = train(Seq("ab" -> 3L, "cd" -> 3L), steps = 1)
    assert(out == Seq((1, "a", "b", "ab", 3L)))
  }

  private def fert(tf: org.apache.spark.sql.DataFrame, steps: Int) =
    TextAnalysis.trainedFertilityFrom(spark, tf, steps).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_types"),
        r.getAs[Long]("ws_tokens"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("bpe_tokens"), r.getAs[Double]("fertility"),
        r.getAs[Double]("chars_per_token"))).toSeq

  test("q153 crafted index: trained merges move fertility exactly") {
    import spark.implicits._
    // training census (summed over sources): aaab→10, ab→7, cd→1.
    // step 1 trains (a,a) (weight 20): aaab→[aa,a,b], ab→[a,b], cd→[c,d]
    //   A: ws 15, chars 50, syms 10·3+5·2=40; B: ws 3, chars 6, syms 6
    // step 2 adds (a,b) (weight 17): aaab→[aa,ab], ab→[ab]
    //   A: syms 10·2+5·1=25; B: syms 2·1+1·2=4
    val tf = Seq(("A", "aaab", 10L), ("A", "ab", 5L),
      ("B", "ab", 2L), ("B", "cd", 1L)).toDF("source", "token", "n")
    assert(fert(tf, 1) == Seq(
      ("A", 2L, 15L, 50L, 40L, 2.666667, 1.25),
      ("B", 2L, 3L, 6L, 6L, 2.0, 1.0)))
    assert(fert(tf, 2) == Seq(
      ("A", 2L, 15L, 50L, 25L, 1.666667, 2.0),
      ("B", 2L, 3L, 6L, 4L, 1.333333, 1.5)))
  }

  test("q153 untrained floor: zero merges = one symbol per character") {
    import spark.implicits._
    val tf = Seq(("A", "aaab", 10L), ("B", "xyz", 4L))
      .toDF("source", "token", "n")
    fert(tf, 0).foreach { case (_, _, ws, chars, bpe, f, cpt) =>
      assert(bpe == chars, "pre-merge symbols are the characters")
      assert(cpt == 1.0)
      assert(f == math.rint(1000000.0 * chars / ws) / 1000000.0)
    }
  }

  test("q153 corpus run: more merges never inflate the token bill") {
    val bills = Seq(0, 4, TextAnalysis.BpeSteps).map { s =>
      val tf = graft.operators.CorpusOps.tokenFreqRows(
        Tables.documents(spark, sf))
      TextAnalysis.trainedFertilityFrom(spark, tf, s).collect()
        .map(r => r.getAs[String]("source") -> r.getAs[Long]("bpe_tokens"))
        .toMap
    }
    assert(bills.head.nonEmpty)
    bills.sliding(2).foreach { case Seq(a, b) =>
      assert(a.keySet == b.keySet)
      a.keys.foreach(k => assert(b(k) <= a(k),
        s"source $k: ${a(k)} → ${b(k)} symbols after more merges"))
    }
  }

  test("corpus run: 8 steps, non-increasing weights, merges compose") {
    val out = TextAnalysis.q135BpeTrain(spark, sf).collect()
    assert(out.length == TextAnalysis.BpeSteps)
    assert(out.map(_.getAs[Int]("step")).toSeq == (1 to 8))
    val ws = out.map(_.getAs[Long]("weight")).toSeq
    assert(ws == ws.sorted.reverse, s"weights increased: $ws")
    assert(ws.forall(_ >= 1L))
    // every merged symbol is the concatenation of its parts, and every
    // part is either a single character or a previously-merged symbol
    val seen = scala.collection.mutable.Set.empty[String]
    out.foreach { r =>
      val (l, rr, m) = (r.getAs[String]("lhs"), r.getAs[String]("rhs"),
        r.getAs[String]("merged"))
      assert(m == l + rr)
      Seq(l, rr).foreach(s => assert(s.length == 1 || seen.contains(s),
        s"symbol $s is neither a character nor a prior merge"))
      seen += m
    }
  }
}

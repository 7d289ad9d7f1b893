package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.Tokenizer
import graft.operators.{CorpusOps, Curation, TextAnalysis}

/** The tokenizer seam contract: every token-mass operator accepts a
  * custom `Tokenizer`, swapping it changes the counts (so the seam is
  * real, not decorative), and the default reproduces the whitespace
  * behavior every oracle pins.
  */
class TokenizerSpec extends SparkSpec {

  /** A deliberately different tokenizer: every CHARACTER is a token.
    * Degenerate on purpose — its counts can't accidentally coincide with
    * whitespace counts on real text.
    */
  private object CharTokens extends Tokenizer {
    override def tokens(text: Column): Column =
      filter(split(text, ""), t => t =!= "")
    override def count(text: Column): Column = length(text)
  }

  test("TrainedWs replays merges in rank order; id digests the table") {
    import spark.implicits._
    val tok = Tokenizer.TrainedWs(Seq("t" -> "h", "th" -> "e"))
    val out = Seq("the the cat", "thth").toDF("text")
      .select(tok.tokens(col("text")).as("t"),
        tok.count(col("text")).as("n")).collect()
    // "the" → t h e → th e → the; "cat" stays characters
    assert(out(0).getSeq[String](0) == Seq("the", "the", "c", "a", "t"))
    assert(out(0).getInt(1) == 5)
    // "thth": t h t h → left-to-right non-overlapping (t,h) pairs both
    // → th th; the (th,e) merge then finds nothing
    assert(out(1).getSeq[String](0) == Seq("th", "th"))
    // id digests the merges: a different table is a different artifact key
    assert(tok.id == Tokenizer.TrainedWs(Seq("t" -> "h", "th" -> "e")).id)
    assert(tok.id != Tokenizer.TrainedWs(Seq("t" -> "h")).id)
    assert(!tok.zeroTokenCapable)
  }

  test("tokenizer ids: stable for named impls, refused for anonymous ones") {
    // ids key the token-count artifact path; the three shipped ids are
    // load-bearing (committed artifacts resolve by them across sessions)
    assert(Tokenizer.Whitespace.id == "ws")
    assert(Tokenizer.BpePre.id == "bpe_pre")
    assert(Tokenizer.BpeFixture.id.startsWith("bpe_") &&
      Tokenizer.BpeFixture.id.length == 16)
    // different merges ⇒ different id (a changed vocabulary must never
    // resolve the old vocabulary's counts)
    assert(Tokenizer.Bpe(Tokenizer.FixtureMerges.tail).id !=
      Tokenizer.BpeFixture.id)
    // a named object keeps the class-derived default
    assert(CharTokens.id.contains("CharTokens"))
    // anonymous classes get compiler-ordered $$anon names that can
    // collide across refactors — the default id refuses them
    val anon = new Tokenizer {
      override def tokens(text: Column): Column = split(text, ",")
    }
    val e = intercept[IllegalArgumentException](anon.id)
    assert(e.getMessage.contains("anonymous"))
  }

  test("default tokenizer reproduces the oracle-pinned whitespace counts") {
    val default = TextAnalysis.q26TokenCount(spark, sf).collect().toSeq
    val seam = TextAnalysis.tokenCounts(spark, sf, Tokenizer.Whitespace)
      .collect().toSeq
    assert(seam == default)
  }

  test("q26 counts follow the swapped tokenizer") {
    val ws = TextAnalysis.q26TokenCount(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("ws_tokens")).toMap
    val ch = TextAnalysis.tokenCounts(spark, sf, CharTokens).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("ws_tokens")).toMap
    // char counts exceed whitespace counts on every non-trivial doc
    assert(ch.keySet == ws.keySet)
    assert(ws.forall { case (id, n) => n <= 1 || ch(id) > n })
    // bpe column is independent of the seam tokenizer
    val bpeDefault = TextAnalysis.q26TokenCount(spark, sf)
      .select("doc_id", "bpe_tokens").collect().toSeq
    val bpeSwapped = TextAnalysis.tokenCounts(spark, sf, CharTokens)
      .select("doc_id", "bpe_tokens").collect().toSeq
    assert(bpeSwapped == bpeDefault)
  }

  test("the BpePre tokenizer splits punctuation that whitespace keeps attached") {
    import spark.implicits._
    val df = Seq("hello, world! x2").toDF("text")
    val ws = df.select(Tokenizer.Whitespace.count(col("text"))).head.getInt(0)
    val bpe = df.select(Tokenizer.BpePre.count(col("text"))).head.getInt(0)
    assert(ws == 3)
    assert(bpe == 6, "hello | , | world | ! | x | 2")
  }

  test("BPE merges by table rank: known words, cascaded and repeated merges") {
    import spark.implicits._
    val got = Seq("the", "and", "mother", "her", "2020", "ath")
      .toDF("text")
      .select(Tokenizer.BpeFixture.tokens(col("text")).as("t"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(
      List("the"), // t+h → th, th+e → the (rank cascade)
      List("and"), // a+n, an+d
      List("m", "o", "the", "r"), // partial merges leave subwords
      List("her"), // e+r, then h+er — merge into a MERGED right symbol
      List("20", "20"), // one round merges ALL occurrences of 2+0
      List("a", "th"))) // rank priority: t+h (0) beats a+t (9) at the same pass
  }

  test("BPE round-trips: token concatenation reproduces the pre-token text") {
    val d = Tables.documents(spark, sf)
    val mismatches = d.select(
        concat_ws("", Tokenizer.BpeFixture.tokens(col("text"))).as("bpe"),
        concat_ws("", Tokenizer.BpePre.tokens(col("text"))).as("pre"))
      .filter(col("bpe") =!= col("pre")).count()
    assert(mismatches == 0L)
    // and on adversarial text: punctuation, digits, surrogate pairs
    import spark.implicits._
    val hard = Seq("a-b_c 12034 😀x!!", "", "   ", "thether")
      .toDF("text")
      .select(
        concat_ws("", Tokenizer.BpeFixture.tokens(col("text"))).as("bpe"),
        concat_ws("", Tokenizer.BpePre.tokens(col("text"))).as("pre"))
      .collect()
    hard.foreach(r => assert(r.getString(0) == r.getString(1), r))
  }

  test("BPE stays inside whole-stage codegen") {
    val df = Tables.documents(spark, sf)
      .select(size(Tokenizer.BpeFixture.tokens(col("text"))).as("n"))
      .filter(col("n") >= 0)
    df.collect()
    val wsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, "no WholeStageCodegen stage found:\n" +
      df.queryExecution.executedPlan.toString.take(600))
    // the bpe projection itself sits inside the codegen span (its parent
    // is the codegen'd Project, not an interpreted fallback)
    assert(wsc.exists(_.toString.contains("bpe_encode")))
  }

  test("q48 packing follows the real BPE tokenizer through the seam") {
    val ws = CorpusOps.q48SequencePack(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("tok_offset")).toMap
    val bpe = CorpusOps.packSequences(spark, sf, Tokenizer.BpeFixture).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("tok_offset")).toMap
    assert(bpe.keySet == ws.keySet)
    assert(bpe != ws, "BPE offsets must differ from whitespace offsets")
  }

  test("q43 yield report token mass follows the tokenizer") {
    val default = Curation.q43CorpusStats(spark, sf).collect()
      .map(r => (r.getString(0), r.getBoolean(1)) -> r.getAs[Long]("total_tokens")).toMap
    val swapped = Curation.corpusStats(spark, sf, CharTokens).collect()
      .map(r => (r.getString(0), r.getBoolean(1)) -> r.getAs[Long]("total_tokens")).toMap
    // same (split, selected) cells under the default-whitespace keeper/
    // selection signals... except selection itself also follows the seam
    // (n_tokens bounds, repetition), so only assert: masses differ and
    // every swapped mass >= its default where cells coincide
    assert(swapped.nonEmpty)
    val common = default.keySet.intersect(swapped.keySet)
    assert(common.nonEmpty)
    assert(common.exists(k => swapped(k) != default(k)))
  }

  test("q48 packing offsets follow the tokenizer") {
    val default = CorpusOps.q48SequencePack(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("tok_offset")).toMap
    val swapped = CorpusOps.packSequences(spark, sf, CharTokens).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("tok_offset")).toMap
    assert(swapped.keySet == default.keySet)
    assert(swapped != default)
  }

  test("q53 stratum token mass follows the tokenizer, weights do not") {
    val default = CorpusOps.q53MixtureWeights(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("weight"))).toMap
    val swapped = CorpusOps.mixtureWeights(spark, sf, CharTokens).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("weight"))).toMap
    assert(swapped.keySet == default.keySet)
    assert(swapped.exists { case (k, (n, _)) => n != default(k)._1 })
    assert(swapped.forall { case (k, (_, w)) => w == default(k)._2 },
      "weights are doc-count-based and must not move with the tokenizer")
  }

  test("q57 quantiles follow the tokenizer") {
    val default = CorpusOps.q57LengthQuantiles(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("p50")).toMap
    val swapped = CorpusOps.lengthQuantiles(spark, sf, CharTokens).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("p50")).toMap
    assert(swapped.keySet == default.keySet)
    assert(swapped.exists { case (k, v) => v != default(k) })
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Extraction

/** Branch coverage for the raw-crawl extraction chain on crafted markup
  * rows — each rule exercised in isolation, then the q123 stats checked
  * against hand-computed values on a fully-adversarial page.
  */
class ExtractionSpec extends SparkSpec {

  private def extract(raw: String): String = {
    import spark.implicits._
    Seq(raw).toDF("raw")
      .select(Extraction.extractText(col("raw")).as("x"))
      .collect().head.getAs[String]("x")
  }

  test("script and style blocks vanish with their contents") {
    assert(extract("keep this prose line <script>var x = 1; if (x < 2) { x++; }</script> and this too") ==
      "keep this prose line and this too")
    assert(extract("<style>p { color: red; }</style>body text stays here") ==
      "body text stays here")
    // two blocks do not fuse (non-greedy body): the prose between survives
    assert(extract("<script>a</script> middle words survive here <script>b</script>") ==
      "middle words survive here")
    // \b guard: <scripty> is an ordinary (stripped) tag, not a block opener
    assert(extract("<scripty>not a script block at all</scripty>") ==
      "not a script block at all")
  }

  test("tags strip to spaces so words never fuse") {
    assert(extract("one <b>two</b> three") == "one two three")
    assert(extract("word<b>s</b> never fuse across tags") == "word s never fuse across tags")
  }

  test("entities decode, &amp; last so double-escapes survive literally") {
    assert(extract("a &lt;tag&gt; and &quot;quote&quot; &#39;s &amp; more") ==
      "a <tag> and \"quote\" 's & more")
    // &amp;lt; is the ESCAPED text "&lt;": must decode to the literal
    // entity, never to '<'
    assert(extract("double escape &amp;lt; stays an entity") ==
      "double escape &lt; stays an entity")
  }

  test("line rules: word floor, boilerplate lexicon, link density") {
    // short line dies, prose survives
    assert(extract("<p>Short.</p><p>this line has enough words</p>") ==
      "this line has enough words")
    // boilerplate lexicon kills a long-enough line
    assert(extract("<p>All rights reserved by the company.</p><p>real content lives here</p>") ==
      "real content lives here")
    assert(extract("<p>We use cookies on this site.</p><p>actual prose is kept</p>") ==
      "actual prose is kept")
    // link density: 3 anchors, 5 words → dead; 1 anchor, 9 words → alive
    assert(extract("<div><a href=\"/\">home</a> | <a href=\"/a\">about</a> | <a href=\"/c\">contact</a></div>" +
      "<p>a prose sentence that happens to cite <a href=\"/x\">one link</a> politely</p>") ==
      "a prose sentence that happens to cite one link politely")
  }

  test("break tags create line structure; title and list items split out") {
    assert(extract("<p>first paragraph has words</p><p>second paragraph also has words</p>") ==
      "first paragraph has words\nsecond paragraph also has words")
    // the title becomes its own (short, dropped) line instead of gluing
    // onto the first body line
    assert(extract("<html><head><title>Tiny Title</title></head><body><p>the body keeps its own line</p></body></html>") ==
      "the body keeps its own line")
  }

  test("q123 stats are hand-verifiable on an adversarial page") {
    import spark.implicits._
    val raw = "<html><head><title>T</title><style>b{}</style></head><body>" +
      "<p>alpha beta gamma delta</p>" + // kept: 4 tokens
      "<p>no</p>" + // dropped: short
      "<p>copyright 2024 someone somewhere</p>" + // dropped: boilerplate
      "<ul><li><a href=\"/\">x</a></li></ul>" + // dropped: link density (1 word, 1 anchor)
      "</body></html>"
    val row = Seq((7L, raw)).toDF("doc_id", "raw")
      .select(col("doc_id"),
        Extraction.extractText(col("raw")).as("extracted"))
      .collect().head
    assert(row.getAs[String]("extracted") == "alpha beta gamma delta")
    // raw visible tokens: T(1) + 4 + 1 + 4 + 1 = 11; kept = 4
    val stats = Seq(raw).toDF("raw").select(
      size(filter(split(Extraction.extractText(col("raw")), "\\s+"),
        w => length(w) > 0)).as("kept")).collect().head
    assert(stats.getAs[Int]("kept") == 4)
  }

  test("q123 over the corpus: every mode fires its branches, stats are consistent") {
    val rows = Extraction.q123TextExtract(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val mode = r.getAs[Long]("doc_id") % 4
      val frac = r.getAs[Double]("boilerplate_frac")
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("raw_tokens"))
      assert(r.getAs[Long]("n_lines_kept") <= r.getAs[Long]("n_lines_raw"))
      if (mode == 0) {
        // passthrough: nothing removed
        assert(frac == 0.0, s"doc ${r.getAs[Long]("doc_id")}")
        assert(r.getAs[Long]("kept_tokens") == r.getAs[Long]("raw_tokens"))
      } else {
        // every wrapped mode carries boilerplate that must be removed
        assert(frac > 0.0, s"doc ${r.getAs[Long]("doc_id")}")
        assert(r.getAs[Long]("n_lines_kept") < r.getAs[Long]("n_lines_raw"))
      }
      // the extracted body always retains the original prose line
      assert(r.getAs[Long]("n_lines_kept") >= 1)
    }
  }

  test("q129 removes lines by corpus frequency, keeps unique lines rules would drop") {
    val byDoc = Extraction.q129LineDedup(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byDoc.size == 500)
    byDoc.values.foreach { r =>
      val mode = r.getAs[Long]("doc_id") % 4
      val cleaned = r.getAs[String]("cleaned")
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_lines"))
      // repeated boilerplate lines die by frequency, lexicon-free
      assert(!cleaned.contains("All rights reserved"))
      assert(!cleaned.contains("cookies"))
      assert(!cleaned.contains("privacy policy"))
      assert(!cleaned.contains("home | about | contact"))
      if (mode == 1) {
        // the per-doc title line is corpus-unique → frequency KEEPS it
        // (q123's word floor dropped it) — the mechanisms differ
        assert(cleaned.contains(s"Doc ${r.getAs[Long]("doc_id")}"),
          s"doc ${r.getAs[Long]("doc_id")}")
      }
      if (mode == 0) {
        // passthrough docs: the single prose line is unique → untouched
        assert(r.getAs[Long]("n_kept") == r.getAs[Long]("n_lines"))
      }
    }
  }

  test("q129 frequency cap on crafted rows: df boundary is inclusive") {
    import spark.implicits._
    // doc_ids ≡ 0 (mod 4): rawify passes the text through, so the lines
    // are exactly ours. "shared line y" appears in MaxLineDf docs →
    // kept; "spam line x" appears in MaxLineDf+1 docs → removed
    val ids = Seq(4L, 8L, 12L, 16L, 20L)
    val crafted = ids.map { i =>
      val shared = if (i <= 16) "<br>shared line y" else ""
      (i, s"unique prose $i<br>spam line x$shared", "s")
    }.toDF("doc_id", "text", "source")
    val tmp = java.nio.file.Files.createTempDirectory("graft-linededup").toFile
    try {
      crafted.write.parquet(s"${tmp.getAbsolutePath}/documents.parquet")
      val rows = Extraction.q129LineDedup(spark, tmp.getAbsolutePath)
        .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
      Seq(4L, 8L, 12L, 16L).foreach { i =>
        assert(rows(i).getAs[String]("cleaned") ==
          s"unique prose $i\nshared line y", i)
        assert(rows(i).getAs[Long]("n_lines") == 3L, i)
        assert(rows(i).getAs[Long]("n_kept") == 2L, i)
      }
      assert(rows(20L).getAs[String]("cleaned") == "unique prose 20")
    } finally {
      Tables.invalidate(tmp.getAbsolutePath)
      deleteRecursively(tmp)
      Checkpoints.releaseAll()
    }
  }

  test("q133 gate: each repetition rule culls exactly its crafted doc") {
    import spark.implicits._
    // doc_ids ≡ 0 (mod 4): rawify is a pass-through, so literal <br>
    // separators make OUR lines; spaces around <br> keep the raw-text
    // bigram stream clean
    val crafted = Seq(
      // duplicate line: 2 of 3 lines identical → dup_line 1/3 > 0.30
      (0L, "alpha beta gamma <br> alpha beta gamma <br> delta epsilon zeta words here"),
      // bullets: every line starts with '-' → bullet 1.0 > 0.90
      (4L, "- one two three <br> - four five six <br> - seven eight nine"),
      // ellipses: every line ends with ... or … → 1.0 > 0.30
      (8L, "one two three... <br> four five six…"),
      // top bigram: "spam ham" 4 of 7 bigrams → 0.571429 > 0.20
      (12L, "spam ham spam ham spam ham spam ham"),
      // clean prose: everything passes
      (16L, "the quick brown fox jumps over a lazy dog today")
    ).toDF("doc_id", "text")
    val out = Extraction.repetitionGateFrom(crafted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(!out(0L).getAs[Boolean]("keep"))
    assert(out(0L).getAs[Double]("dup_line_frac") == 0.333333)
    // dup chars: the repeated 16-char line, of 16+16+29 visible line chars
    assert(out(0L).getAs[Double]("dup_char_frac") ==
      BigDecimal(16.0 / 61).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)

    assert(!out(4L).getAs[Boolean]("keep"))
    assert(out(4L).getAs[Double]("bullet_frac") == 1.0)
    assert(out(4L).getAs[Double]("dup_line_frac") == 0.0)

    assert(!out(8L).getAs[Boolean]("keep"))
    assert(out(8L).getAs[Double]("ellipsis_frac") == 1.0)

    assert(!out(12L).getAs[Boolean]("keep"))
    assert(out(12L).getAs[Double]("top2_frac") == 0.571429)
    assert(out(12L).getAs[Double]("dup_line_frac") == 0.0)

    assert(out(16L).getAs[Boolean]("keep"))
    assert(out(16L).getAs[Long]("n_lines") == 1L)
    Seq("dup_line_frac", "dup_char_frac", "bullet_frac", "ellipsis_frac")
      .foreach(c => assert(out(16L).getAs[Double](c) == 0.0, c))
  }

  test("q133 gate on the corpus: fractions in range, verdict consistent") {
    val rows = Extraction.q133RepetitionGate(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val fr = Seq("dup_line_frac", "dup_char_frac", "top2_frac",
        "bullet_frac", "ellipsis_frac").map(r.getAs[Double])
      assert(fr.forall(f => f >= 0.0 && f <= 1.0))
      val expect = fr(0) <= Extraction.DupLineFracMax &&
        fr(1) <= Extraction.DupLineCharFracMax &&
        fr(2) <= Extraction.Top2GramFracMax &&
        fr(3) <= Extraction.BulletLineFracMax &&
        fr(4) <= Extraction.EllipsisLineFracMax
      // round6 can only move a fraction across a threshold at boundary
      // cases the synthetic corpus doesn't produce
      assert(r.getAs[Boolean]("keep") == expect,
        s"doc ${r.getAs[Long]("doc_id")}")
    }
  }
}

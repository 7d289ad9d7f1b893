package graft

import org.apache.spark.sql.functions._
import graft.functions.TextNorm

/** Golden tests for the F1–F14 library. Expected values were produced by
  * executing the reference implementation's functions (reference
  * `etl.py:49-111,216-223`) over the FIXTURES.md edge-case titles —
  * trailing articles, diacritics, a.k.a. parentheticals, leading quotes,
  * missing years, messy whitespace.
  */
class TextNormSpec extends SparkSpec {
  import spark.implicits._

  private val fixtures: Seq[(String, String, String, String, Option[String], String, Seq[String])] = Seq(
    // (title, base, moved, noparen, alt, full, candidates)
    ("Toy Story (1995)", "Toy Story", "Toy Story", "Toy Story", None,
      "Toy Story", Seq("Toy Story")),
    ("American President, The (1995)", "American President, The",
      "The American President", "American President, The", None,
      "The American President",
      Seq("The American President", "American President, The")),
    ("City of Lost Children, The (Cité des enfants perdus, La) (1995)",
      "City of Lost Children, The (Cité des enfants perdus, La)",
      "City of Lost Children, The (Cité des enfants perdus, La)",
      "City of Lost Children, The", None,
      "City of Lost Children, The",
      Seq("City of Lost Children, The (Cité des enfants perdus, La)",
        "City of Lost Children, The",
        "City of Lost Children, The (Cite des enfants perdus, La)")),
    ("Twelve Monkeys (a.k.a. 12 Monkeys) (1995)",
      "Twelve Monkeys (a.k.a. 12 Monkeys)",
      "Twelve Monkeys (a.k.a. 12 Monkeys)", "Twelve Monkeys",
      Some("a.k.a. 12 Monkeys"), "Twelve Monkeys",
      Seq("Twelve Monkeys (a.k.a. 12 Monkeys)", "Twelve Monkeys",
        "a.k.a. 12 Monkeys")),
    ("Misérables, Les (1995)", "Misérables, Les", "Misérables, Les",
      "Misérables, Les", None, "Miserables, Les",
      Seq("Misérables, Les", "Miserables, Les")),
    ("'Til There Was You (1997)", "Til There Was You", "Til There Was You",
      "Til There Was You", None, "Til There Was You",
      Seq("Til There Was You")),
    ("Babylon 5", "Babylon 5", "Babylon 5", "Babylon 5", None, "Babylon 5",
      Seq("Babylon 5")),
    ("La cravate (1957)", "La cravate", "La cravate", "La cravate", None,
      "La cravate", Seq("La cravate")),
    ("  Weird   spacing  , An (2001) ", "Weird spacing , An",
      "An Weird spacing", "Weird spacing , An", None, "An Weird spacing",
      Seq("An Weird spacing", "Weird spacing , An")),
    ("Short (ab) (1999)", "Short (ab)", "Short (ab)", "Short", Some("ab"),
      "Short", Seq("Short (ab)", "Short", "ab")))

  private lazy val results = fixtures.map(_._1).toDF("title")
    .select($"title",
      TextNorm.baseClean($"title").as("base"),
      TextNorm.moveTrailingArticle(TextNorm.baseClean($"title")).as("moved"),
      TextNorm.removeParentheticalAlternates(TextNorm.baseClean($"title")).as("noparen"),
      TextNorm.extractParentheticalAlternate(TextNorm.baseClean($"title")).as("alt"),
      TextNorm.fullTitleClean($"title").as("full"),
      TextNorm.titleCandidates($"title").as("cands"))
    .collect().map(r => r.getAs[String]("title") -> r).toMap

  test("base_clean matches the reference on all fixtures") {
    for ((t, base, _, _, _, _, _) <- fixtures)
      assert(results(t).getAs[String]("base") == base, s"title=$t")
  }
  test("move_trailing_article matches the reference") {
    for ((t, _, moved, _, _, _, _) <- fixtures)
      assert(results(t).getAs[String]("moved") == moved, s"title=$t")
  }
  test("remove_parenthetical_alternates matches the reference") {
    for ((t, _, _, noparen, _, _, _) <- fixtures)
      assert(results(t).getAs[String]("noparen") == noparen, s"title=$t")
  }
  test("extract_parenthetical_alternate matches the reference") {
    for ((t, _, _, _, alt, _, _) <- fixtures)
      assert(Option(results(t).getAs[String]("alt")) == alt, s"title=$t")
  }
  test("full_title_clean matches the reference") {
    for ((t, _, _, _, _, full, _) <- fixtures)
      assert(results(t).getAs[String]("full") == full, s"title=$t")
  }
  test("generate_title_candidates matches the reference order and dedup") {
    for ((t, _, _, _, _, _, cands) <- fixtures)
      assert(results(t).getSeq[String](results(t).fieldIndex("cands")) == cands,
        s"title=$t")
  }

  test("extractYear: anywhere-match, null on absence, int type") {
    val rows = Seq("Toy Story (1995)", "Babylon 5", "(2010) Future (x)",
      "Bad (19x5)").toDF("t")
      .select(TextNorm.extractYear($"t").as("y")).collect()
    assert(rows.map(r => Option(r.get(0))).toSeq ==
      Seq(Some(1995), None, Some(2010), None).map(_.map(_.asInstanceOf[Any])))
  }

  test("cleanBoxOffice / cleanRuntime / parseRating sentinel handling") {
    val df = Seq(("$28,341,469", "142 min", "7.3"), ("N/A", "N/A", "N/A"),
      ("", "95 mins", "x")).toDF("box", "rt", "rating")
      .select(TextNorm.cleanBoxOffice($"box").as("b"),
        TextNorm.cleanRuntime($"rt").as("r"),
        TextNorm.parseRating($"rating").as("v"))
    val rows = df.collect()
    assert(Option(rows(0).get(0)).contains(28341469L) &&
      Option(rows(0).get(1)).contains(142) &&
      Option(rows(0).get(2)).contains(7.3))
    assert((0 to 2).forall(i => rows(1).isNullAt(i)))
    assert(rows(2).isNullAt(0) &&
      Option(rows(2).get(1)).contains(95) && rows(2).isNullAt(2))
  }

  test("tokenize splits and trims pipe-delimited genres") {
    val out = Seq("Adventure| Animation |Children").toDF("g")
      .select(TextNorm.tokenize($"g").as("t")).collect().head.getSeq[String](0)
    assert(out == Seq("Adventure", "Animation", "Children"))
  }
}

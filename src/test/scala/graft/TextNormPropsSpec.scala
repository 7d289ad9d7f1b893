package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.TextNorm

/** Property tests (SURVEY.md §5.3): invariants of the string pipeline on
  * generated title-shaped inputs. Uses ScalaCheck generators with a fixed
  * seed (the scalatest↔scalacheck bridge artifact is not available
  * offline, so sampling is explicit and deterministic).
  */
class TextNormPropsSpec extends SparkSpec {
  import spark.implicits._

  private val word = Gen.alphaStr.suchThat(_.nonEmpty).map(_.take(8))
  private val titleGen: Gen[String] = for {
    words <- Gen.nonEmptyListOf(word).map(_.take(5))
    art <- Gen.oneOf("", ", The", ", A", ", an")
    paren <- Gen.oneOf("", " (a.k.a. Alias)", " (Très Bien)")
    year <- Gen.oneOf("", " (1995)", " (2020)")
    pad <- Gen.oneOf("", "  ", "\t")
  } yield s"$pad${words.mkString(" ")}$art$paren$year$pad"

  private lazy val samples: Seq[String] =
    Gen.listOfN(300, titleGen).pureApply(Gen.Parameters.default, Seed(42L))

  private def run(col: org.apache.spark.sql.Column): Seq[String] =
    samples.toDF("t").select(col.as("out")).collect().map(_.getString(0)).toSeq

  test("tidyWhitespace is a fixpoint (idempotent)") {
    val once = run(TextNorm.tidyWhitespace($"t"))
    val twice = run(TextNorm.tidyWhitespace(TextNorm.tidyWhitespace($"t")))
    assert(once == twice)
  }

  // NB: fullTitleClean is deliberately NOT idempotent — the reference
  // applies move_trailing_article before remove_parenthetical_alternates
  // (`etl.py:216-223`), so "foo, an (x)" cleans to "foo, an", which a
  // second pass would rewrite to "an foo". We assert the invariants that
  // do hold of its output.
  test("fullTitleClean output is tidy and diacritic-free") {
    val out = run(TextNorm.fullTitleClean($"t"))
    val stripped = run(TextNorm.stripDiacritics(TextNorm.fullTitleClean($"t")))
    assert(out == stripped)
    for (s <- out) {
      assert(s == s.trim)
      assert(!s.contains("  "))
      assert(!s.matches(".*\\(\\d{4}\\)$"))
    }
  }

  test("titleCandidates: every candidate non-empty, tidied, list deduped") {
    val cands = samples.toDF("t")
      .select(TextNorm.titleCandidates($"t").as("c"))
      .collect().map(_.getSeq[String](0))
    for (cs <- cands; c <- cs) {
      assert(c.nonEmpty)
      assert(c == c.trim)
      assert(!c.contains("  "))
    }
  }

  test("extractYear yields null or a 4-digit int") {
    val years = samples.toDF("t")
      .select(TextNorm.extractYear($"t").as("y"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(years.exists(_.isDefined))
    years.flatten.foreach(y => assert(y >= 1000 && y <= 9999))
  }
}

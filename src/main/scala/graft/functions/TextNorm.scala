package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.functions._

/** The reference's title-normalization function library (F1–F14 in
  * SURVEY.md §2.7), re-expressed as pure Column expressions so every
  * composition stays inside Catalyst — optimizable, codegen'd, and
  * pushdown-transparent. No UDFs anywhere; the one non-builtin kernel
  * (diacritic removal) is the native [[StripDiacritics]] expression.
  */
object TextNorm {

  /** F1 — `remove_diacritics` (reference `etl.py:49-54`). */
  def stripDiacritics(c: Column): Column =
    GraftSqlBridge.column(StripDiacritics(GraftSqlBridge.expression(c)))

  /** Python `str.strip()` — trims all whitespace, unlike Spark's
    * space-only `trim`.
    */
  private def stripWs(c: Column): Column =
    regexp_replace(c, "^\\s+|\\s+$", "")

  /** Python `str.strip(chars)` for a regex character-class body. */
  private def stripChars(c: Column, charClass: String): Column =
    regexp_replace(c, s"^[$charClass]+|[$charClass]+$$", "")

  /** F2 — `tidy_whitespace`: collapse runs to single spaces, trim
    * (reference `etl.py:56-57`).
    */
  def tidyWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** F3 — `base_clean`: drop trailing `(yyyy)`, strip outer
    * quotes/apostrophes/spaces, tidy (reference `etl.py:62-65`).
    */
  def baseClean(c: Column): Column =
    tidyWhitespace(
      stripChars(stripWs(regexp_replace(c, "\\s*\\(\\d{4}\\)\\s*$", "")), " \"'"))

  private val ArticleRe = "^(.*),\\s*(The|A|An)$"

  /** F4 — `move_trailing_article`: `'Name, The' → 'The Name'`
    * (reference `etl.py:67-69`).
    */
  def moveTrailingArticle(c: Column): Column =
    when(c.rlike(s"(?i)$ArticleRe"),
      stripWs(concat(
        regexp_extract(c, s"(?i)$ArticleRe", 2), lit(" "),
        regexp_extract(c, s"(?i)$ArticleRe", 1))))
      .otherwise(c)

  /** Keyword alternation preserved verbatim from the reference
    * (`etl.py:73-75`).
    */
  private val AlternateKeywordsRe =
    "\\s*\\(.*?(a\\.k\\.a\\.|aka|original|original title|la|le|der|el|cite|cité|versión|version).*?\\)\\s*"

  /** F5 — `remove_parenthetical_alternates` (reference `etl.py:71-78`):
    * drop keyword-bearing parentheticals, then any remaining `( … )`, tidy.
    * `(?iu)` mirrors Python's Unicode-aware IGNORECASE (the keyword list
    * contains `cité`/`versión`).
    */
  def removeParentheticalAlternates(c: Column): Column =
    tidyWhitespace(regexp_replace(
      regexp_replace(c, s"(?iu)$AlternateKeywordsRe", " "),
      "\\s*\\([^)]*\\)\\s*", " "))

  /** F6 — `extract_parenthetical_alternate` (reference `etl.py:80-87`):
    * first `( … )` body if ≤30 chars and comma-free after trim, else null.
    */
  def extractParentheticalAlternate(c: Column): Column = {
    val inside = stripWs(regexp_extract(c, "\\(([^)]+)\\)", 1))
    when(c.rlike("\\([^)]+\\)") &&
        length(inside) <= 30 && !inside.contains(","),
      inside)
  }

  /** F7 — `generate_title_candidates` (reference `etl.py:89-111`): the
    * ordered, de-duplicated candidate list
    * `[moved, paren-removed, alternate, base]` plus diacritic-stripped
    * variants. `array_distinct` keeps first occurrences, which reproduces
    * the reference's order-preserving membership checks; the final tidy
    * pass runs after dedup exactly as the reference does (`etl.py:111`).
    */
  def titleCandidates(title: Column): Column =
    GraftSqlBridge.column(TitleCandidates(GraftSqlBridge.expression(title)))

  /** [[titleCandidates]] as the Column composition the fused kernel must
    * match — kept as the spec-side reference implementation
    * (`CodegenSpec` pins kernel ≡ composition over the corpus).
    */
  private[graft] def titleCandidatesComposed(title: Column): Column = {
    val base = baseClean(title)
    val four = array(
      moveTrailingArticle(base),
      removeParentheticalAlternates(base),
      extractParentheticalAlternate(base),
      base)
    val deduped = array_distinct(
      filter(four, x => x.isNotNull && x =!= ""))
    val withTranslit = array_distinct(
      concat(deduped, transform(deduped, stripDiacritics _)))
    filter(transform(withTranslit, tidyWhitespace _), _ =!= "")
  }

  /** F8 — `full_title_clean` (reference `etl.py:216-223`): base_clean ∘
    * move_trailing_article ∘ remove_parenthetical_alternates ∘
    * remove_diacritics ∘ tidy_whitespace, the stored-title normal form.
    */
  def fullTitleClean(c: Column): Column =
    GraftSqlBridge.column(FullTitleClean(GraftSqlBridge.expression(c)))

  /** [[fullTitleClean]] as the Column composition (spec reference). */
  private[graft] def fullTitleCleanComposed(c: Column): Column =
    tidyWhitespace(stripDiacritics(
      removeParentheticalAlternates(moveTrailingArticle(baseClean(c)))))

  /** F9 — year extraction (reference `etl.py:162`): first `(yyyy)`
    * anywhere in the title. Spark's `regexp_extract` yields `""` on
    * no-match, mapped back to null (SURVEY.md §7.4.5); the guarded cast is
    * ANSI-safe (always 4 digits).
    */
  def extractYear(c: Column): Column =
    nullif(regexp_extract(c, "\\((\\d{4})\\)", 1), lit("")).cast("int")

  /** F10 — `clean_box_office` (reference `etl.py:238-243`): strip `$`/`,`,
    * empty → null, digits → long. The reference lets the literal `'N/A'`
    * flow into the INT column (SURVEY.md §1.2 wart); we implement the
    * intended semantic — non-numeric → null — via a digit guard, which
    * also keeps the cast ANSI-safe.
    */
  def cleanBoxOffice(c: Column): Column = {
    val stripped = stripWs(regexp_replace(c, "[$,]", ""))
    when(stripped.rlike("^\\d+$"), stripped.cast("long"))
  }

  /** F11 — `clean_runtime` (reference `etl.py:245-248`): parse leading
    * integer minutes. The reference strips `"min"` before `"mins"` so
    * `"142 mins" → "142 s"` (SURVEY.md §1.2 wart); the intended semantic —
    * leading integer — is implemented.
    */
  def cleanRuntime(c: Column): Column =
    nullif(regexp_extract(stripWs(c), "^(\\d+)", 1), lit("")).cast("int")

  /** F12 — genre tokenize (reference `etl.py:194-195`): split on a
    * delimiter, trim each token.
    */
  def tokenize(c: Column, delimiterRe: String = "\\|"): Column =
    transform(split(c, delimiterRe), tidyWhitespace _)

  /** F13 — rating parse (reference `etl.py:145`): numeric string → double,
    * `'N/A'`/non-numeric → null (guarded, ANSI-safe).
    */
  def parseRating(c: Column): Column =
    when(c.rlike("^[0-9]+(\\.[0-9]+)?$"), c.cast("double"))

  /** F14 — null defaulting (reference `etl.py:119-121,140-141`). */
  def defaultIfNull(c: Column, default: String): Column =
    coalesce(c, lit(default))
}

package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused native kernels for the title-candidate chain (reference
  * `etl.py:89-111` and `etl.py:216-223`).
  *
  * The Column-composition forms in [[TextNorm]] are semantically right
  * but evaluate the shared `base_clean` subtree once per candidate slot
  * (Catalyst does not CSE across array elements), run ~40 regex passes
  * per row, and route the dedup/tidy tail through higher-order array
  * functions (`transform`/`filter`/`array_distinct`) that execute
  * INTERPRETED — together the densest CPU hotspot left in the bench
  * (q16/q6: map-only, ≤ 242 KB shuffle, all time in this chain). These
  * kernels evaluate each compiled pattern once per row inside
  * whole-stage codegen — same [[StripDiacritics]]/[[BpeEncode]] pattern,
  * same results (the DuckDB oracles and the 9,742-title golden parity
  * spec pin them).
  */
case class TitleCandidates(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "title_candidates"

  override def nullSafeEval(input: Any): Any =
    TitleKernels.candidates(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TitleKernels.candidates($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): TitleCandidates =
    copy(child = newChild)
}

/** F8 `full_title_clean` as one native pass (see [[TitleCandidates]]). */
case class FullTitleClean(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "full_title_clean"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      TitleKernels.fullClean(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.TitleKernels.fullClean($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): FullTitleClean =
    copy(child = newChild)
}

/** JVM-side kernels, shared by interpreted eval and generated code. Each
  * helper mirrors one [[TextNorm]] Column function EXACTLY (same
  * java.util.regex engine Spark's regexp_* use, Spark's space-only
  * `trim`, code-point lengths) — the F-function golden/oracle specs hold
  * for both implementations.
  */
object TitleKernels {

  private val YearTail = Pattern.compile("\\s*\\(\\d{4}\\)\\s*$")
  private val WsEdges = Pattern.compile("^\\s+|\\s+$")
  private val QuoteEdges = Pattern.compile("^[ \"']+|[ \"']+$")
  private val WsRuns = Pattern.compile("\\s+")
  private val Article = Pattern.compile("(?i)^(.*),\\s*(The|A|An)$")
  private val AltKeywords = Pattern.compile(
    "(?iu)\\s*\\(.*?(a\\.k\\.a\\.|aka|original|original title|la|le|der|el|cite|cité|versión|version).*?\\)\\s*")
  private val AnyParen = Pattern.compile("\\s*\\([^)]*\\)\\s*")
  private val ParenBody = Pattern.compile("\\(([^)]+)\\)")

  /** Spark `trim`: leading/trailing 0x20 spaces only (NOT Java trim's
    * full control-char range — the Column forms never trimmed those).
    */
  private def trimSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  private def tidy(s: String): String =
    trimSpaces(WsRuns.matcher(s).replaceAll(" "))

  private def stripWs(s: String): String =
    WsEdges.matcher(s).replaceAll("")

  private def baseClean(s: String): String =
    tidy(QuoteEdges.matcher(
      stripWs(YearTail.matcher(s).replaceAll(""))).replaceAll(""))

  private def moveArticle(s: String): String = {
    val m = Article.matcher(s)
    if (m.find()) stripWs(m.group(2) + " " + m.group(1)) else s
  }

  private def removeParens(s: String): String =
    tidy(AnyParen.matcher(
      AltKeywords.matcher(s).replaceAll(" ")).replaceAll(" "))

  /** null when absent/oversized/comma-bearing — the F6 contract. */
  private def extractAlt(s: String): String = {
    val m = ParenBody.matcher(s)
    if (!m.find()) return null
    val inside = stripWs(m.group(1))
    if (inside.codePointCount(0, inside.length) <= 30 && !inside.contains(","))
      inside
    else null
  }

  /** F7 — the ordered, de-duplicated candidate list: `[moved,
    * paren-removed, alternate, base]`, first-occurrence dedup, then the
    * diacritic-stripped variants appended and deduped again, each
    * candidate tidied LAST (post-tidy duplicates are kept, exactly like
    * the Column form: distinct runs before the final tidy).
    */
  def candidates(title: String): ArrayData = {
    val base = baseClean(title)
    val four = Array(moveArticle(base), removeParens(base),
      extractAlt(base), base)
    val deduped = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < four.length) {
      val x = four(i)
      if (x != null && !x.isEmpty) deduped.add(x)
      i += 1
    }
    val withTranslit = new java.util.LinkedHashSet[String](deduped)
    val it = deduped.iterator()
    while (it.hasNext) withTranslit.add(StripDiacritics.strip(it.next()))
    val out = new java.util.ArrayList[UTF8String](withTranslit.size())
    val it2 = withTranslit.iterator()
    while (it2.hasNext) {
      val t = tidy(it2.next())
      if (!t.isEmpty) out.add(UTF8String.fromString(t))
    }
    new GenericArrayData(out.toArray(Array.empty[AnyRef]))
  }

  /** F8 — `tidy ∘ stripDiacritics ∘ removeParens ∘ moveArticle ∘
    * baseClean`, one pass.
    */
  def fullClean(title: String): String =
    tidy(StripDiacritics.strip(removeParens(moveArticle(baseClean(title)))))
}

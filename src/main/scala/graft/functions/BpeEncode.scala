package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair encoding against a merges table — the published GPT-2-style
  * algorithm (Sennrich et al. 2016, "Neural Machine Translation of Rare
  * Words with Subword Units"; the greedy rank-ordered variant of
  * Radford et al.'s GPT-2 encoder): pre-tokenize into letter/digit/
  * punctuation runs, start each pre-token as its code-point symbols,
  * then repeatedly merge the adjacent symbol pair with the best (lowest)
  * rank in the merges table until no adjacent pair has a rank.
  *
  * Native Catalyst `UnaryExpression` like [[StripDiacritics]]: the
  * merges table rides into generated code as a reference object and the
  * per-row work is one static-method call, so tokenization stays inside
  * the whole-stage-codegen span — swapping the BPE tokenizer into a
  * token-mass operator changes no plan shape. Input STRING, output
  * `ARRAY<STRING>` of subword tokens in order; concatenating the tokens
  * of a pre-token reproduces the pre-token exactly (merges never drop
  * characters), which the round-trip spec pins.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  // rank table built once per expression instance (driver side), shipped
  // to executors inside the serialized plan / codegen references
  private lazy val ranks: java.util.HashMap[String, Integer] =
    BpeEncode.rankTable(merges)

  override def nullSafeEval(input: Any): Any =
    BpeEncode.encode(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeEncode.encode($c, $ranksRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  /** Same pre-token classes as `Tokenizer.BpePre` — letter runs, digit
    * runs, punctuation runs; whitespace delimits and is dropped.
    */
  private val PreToken: Pattern =
    Pattern.compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+")

  /** Merge pair → rank (position in the merges list; lower merges
    * first). Keys are `"left right"` — symbols never contain whitespace,
    * so the space join is unambiguous (the GPT-2 merges-file convention).
    */
  def rankTable(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      require(!a.contains(' ') && !b.contains(' '),
        s"merge symbols must not contain spaces: '$a' '$b'")
      m.putIfAbsent(a + " " + b, Integer.valueOf(i))
    }
    m
  }

  /** JVM-side kernel, shared by interpreted eval and generated code. */
  def encode(text: UTF8String,
      ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    val matcher = PreToken.matcher(text.toString)
    while (matcher.find()) bpeWord(matcher.group(), ranks, out)
    new GenericArrayData(out.toArray(Array.empty[AnyRef]))
  }

  /** Greedy rank-ordered BPE of one pre-token: per round, find the
    * adjacent pair with the best rank and merge ALL its occurrences
    * left-to-right; stop when no adjacent pair is in the table.
    */
  private def bpeWord(word: String,
      ranks: java.util.HashMap[String, Integer],
      out: java.util.ArrayList[UTF8String]): Unit = {
    if (word.isEmpty) return
    // initial symbols = code points (surrogate-pair safe)
    var parts = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      parts.add(word.substring(i, i + n))
      i += n
    }
    var done = parts.size < 2
    while (!done) {
      // best-ranked adjacent pair this round
      var best = -1
      var bestRank = Integer.MAX_VALUE
      var j = 0
      while (j < parts.size - 1) {
        val r = ranks.get(parts.get(j) + " " + parts.get(j + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); best = j
        }
        j += 1
      }
      if (best < 0) done = true
      else {
        val a = parts.get(best)
        val b = parts.get(best + 1)
        val merged = new java.util.ArrayList[String](parts.size)
        var k = 0
        while (k < parts.size) {
          if (k < parts.size - 1 && parts.get(k) == a && parts.get(k + 1) == b) {
            merged.add(a + b); k += 2
          } else {
            merged.add(parts.get(k)); k += 1
          }
        }
        parts = merged
        done = parts.size < 2
      }
    }
    var k = 0
    while (k < parts.size) {
      out.add(UTF8String.fromString(parts.get(k)))
      k += 1
    }
  }
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct space-joined n-token shingles of a string array, as a native
  * expression.
  *
  * The HOF formulation (`transform(sequence(...)) ∘ array_distinct`)
  * interprets a lambda tree per element and measured ~8.5 s just to build
  * the shingle index at sf0.1; this kernel is one static call per row
  * with a tight loop (LinkedHashSet preserves `array_distinct`'s
  * first-occurrence order).
  */
case class NgramShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_shingles"

  override def nullSafeEval(input: Any): Any =
    NgramShingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NgramShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramShingles =
    copy(child = newChild)
}

object NgramShingles {
  /** Shared kernel for interpreted eval and generated code. A null token
    * (never produced by `split`, but reachable from hand-built arrays)
    * renders as the empty string rather than NPE-ing an executor.
    */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= m - n) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        if (!toks.isNullAt(i + j)) sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

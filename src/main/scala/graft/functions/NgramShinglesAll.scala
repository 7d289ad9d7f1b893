package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ALL space-joined n-token shingles of a string array, in position
  * order — the positional (non-deduplicating) sibling of
  * [[NgramShingles]]. `posexplode` over this yields (start position,
  * shingle), which is what span-level duplication analysis needs;
  * [[NgramShingles]]'s set semantics would erase repeated spans.
  */
case class NgramShinglesAll(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_shingles_all"

  override def nullSafeEval(input: Any): Any =
    NgramShinglesAll.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NgramShinglesAll.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramShinglesAll =
    copy(child = newChild)
}

object NgramShinglesAll {
  /** Shared kernel for interpreted eval and generated code. A null token
    * (never produced by `split`, but reachable from hand-built arrays)
    * renders as the empty string rather than NPE-ing an executor.
    */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    var i = 0
    while (i <= m - n) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        if (!toks.isNullAt(i + j)) sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

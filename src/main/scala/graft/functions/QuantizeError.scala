package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Mean squared reconstruction error of per-vector scalar quantization to
  * `levels` levels: the vector's [min, max] range is cut into `levels-1`
  * steps, each element is rounded to the nearest level (`floor(t + 0.5)`,
  * not a platform `rint`, so the oracle can replay it exactly), and the
  * MSE of the reconstruction is returned. This is the quality metric a
  * pipeline computes before committing to int8 embedding storage.
  *
  * Native codegen'd expression for the same reason as [[DotProduct]]:
  * the HOF formulation runs interpreted and allocates per row. Arithmetic
  * parity: elements widened to double before any op, accumulation
  * left-to-right — DuckDB's `list_sum` over a `list_transform` of the
  * double-cast list evaluates in the same order.
  */
case class QuantizeError(child: Expression, levels: Int)
    extends UnaryExpression {

  require(levels >= 2, "quantization needs at least 2 levels")

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.sql}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "quantize_error"

  override def nullSafeEval(input: Any): Any =
    QuantizeError.compute(input.asInstanceOf[ArrayData], isFloat, levels)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.QuantizeError.compute($c, $isFloat, $levels)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeError =
    copy(child = newChild)
}

object QuantizeError {
  /** Shared kernel for interpreted eval and generated code. Null elements
    * are skipped (SQL-aggregate semantics) — `ArrayData.getFloat` on a
    * null slot would otherwise read garbage bytes silently.
    */
  def compute(a: ArrayData, isFloat: Boolean, levels: Int): Double = {
    val n = a.numElements()
    def elem(i: Int): Double =
      if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
    var mn = Double.MaxValue
    var mx = -Double.MaxValue
    var valid = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = elem(i)
        if (x < mn) mn = x
        if (x > mx) mx = x
        valid += 1
      }
      i += 1
    }
    if (valid == 0 || mx == mn) return 0.0
    val scale = (mx - mn) / (levels - 1)
    var sse = 0.0
    i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = elem(i)
        val q = math.floor((x - mn) / scale + 0.5)
        val d = x - (mn + q * scale)
        sse += d * d
      }
      i += 1
    }
    sse / valid
  }
}

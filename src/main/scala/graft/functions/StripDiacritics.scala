package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Diacritic removal — NFKD-normalize then drop combining marks, e.g.
  * `'Cité' → 'Cite'` (reference `etl.py:49-54`).
  *
  * Implemented as a native Catalyst `UnaryExpression` with whole-stage
  * codegen (a static-method call, so the generated code stays a single
  * virtual-call-free expression inside the codegen span) rather than a
  * Scala UDF: UDFs box every row and block filter pushdown through the
  * projection; a codegen'd expression does neither.
  *
  * Semantics note: the reference drops characters with a nonzero Unicode
  * canonical combining class (`unicodedata.combining(c) != 0`); the JVM has
  * no public combining-class API, so we drop `NON_SPACING_MARK` +
  * `COMBINING_SPACING_MARK` + `ENCLOSING_MARK` (the `\p{M}` categories).
  * For Latin-script text — the reference's movie-title domain — the two
  * definitions agree. DuckDB-oracle counterpart: `strip_accents(...)`.
  */
case class StripDiacritics(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "strip_diacritics"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      StripDiacritics.strip(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.StripDiacritics.strip($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): StripDiacritics =
    copy(child = newChild)
}

object StripDiacritics {
  /** JVM-side kernel, shared by interpreted eval and generated code. */
  def strip(s: String): String = {
    val nfkd = Normalizer.normalize(s, Normalizer.Form.NFKD)
    val sb = new java.lang.StringBuilder(nfkd.length)
    var i = 0
    while (i < nfkd.length) {
      val ch = nfkd.charAt(i)
      val t = Character.getType(ch)
      if (t != Character.NON_SPACING_MARK &&
          t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) {
        sb.append(ch)
      }
      i += 1
    }
    sb.toString
  }
}

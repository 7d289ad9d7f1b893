package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash `h = Σ bᵢ·31^(n-i) mod (2³¹−1)` over a
  * string's bytes — the MinHash base hash.
  *
  * Chosen over `xxhash64` precisely because it IS cross-engine
  * expressible: DuckDB computes the identical value with
  * `list_reduce(list_prepend(0, list_transform(...ascii...)), (h,b) ->
  * (h*31+b) % 2147483647)`, which upgrades the MinHash+LSH pipeline from
  * a rows-only check to a full DuckDB-oracle query. Byte values equal
  * `ascii()` code points on the ASCII token domain this corpus uses
  * (documented limitation for non-ASCII).
  */
case class PolyHash(child: Expression, mult: Int = 31) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any =
    PolyHash.compute(input.asInstanceOf[UTF8String], mult)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.compute($c, $mult)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  val Mod: Long = 2147483647L // 2^31 - 1

  def compute(s: UTF8String, mult: Int): Long = {
    val bytes = s.getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * mult + (bytes(i) & 0xFF)) % Mod
      i += 1
    }
    h
  }

  /** DuckDB fragment computing the identical hash of string expr `s`. */
  def sql(s: String, mult: Int = 31): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(generate_series(1, length($s)), " +
      s"i -> CAST(ascii(substring($s, i, 1)) AS BIGINT))), " +
      s"(h, b) -> (h * $mult + b) % $Mod)"
}

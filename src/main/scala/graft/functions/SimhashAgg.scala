package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash reduction: folds per-token base hashes into a sign-of-bit-sums
  * signature in ONE aggregate.
  *
  * The declarative formulation needs `bits` separate `SUM(CASE ...)`
  * aggregate columns (62 of them doubled q19's bench cost); this
  * imperative aggregate keeps one int[bits] buffer and assembles the
  * signature at eval — the same map-side-partial/merge shape, 62× fewer
  * aggregate expressions.
  */
case class SimhashAgg(
    child: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_agg"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits)

  override def update(b: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < bits) {
        b(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
    }
    b
  }

  override def merge(b: Array[Int], o: Array[Int]): Array[Int] = {
    var i = 0
    while (i < bits) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Int]): Any = {
    var sig = 0L
    var i = 0
    while (i < bits) {
      if (b(i) > 0) sig |= (1L << i)
      i += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override def serialize(b: Array[Int]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 * bits)
    var i = 0
    while (i < bits) { buf.putInt(b(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val buf = ByteBuffer.wrap(bytes)
    val a = new Array[Int](bits)
    var i = 0
    while (i < bits) { a(i) = buf.getInt(); i += 1 }
    a
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimhashAgg =
    copy(child = newChildren.head)
}

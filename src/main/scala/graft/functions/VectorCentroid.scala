package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise mean of a vector column (`array<float|double>` →
  * `array<double>`) — the IVF coarse-quantizer training step, as a custom
  * `TypedImperativeAggregate` (SURVEY.md §2.11's custom-aggregate
  * surface).
  *
  * The mutable buffer is a primitive double[] of running sums + a count;
  * update/merge never allocate per row, and partial aggregation works the
  * usual way (map-side partials, one shuffle of 8·dim-byte buffers per
  * group — at 100 TB the centroid of a billion-vector cell costs one
  * buffer per task, not a shuffle of the vectors).
  */
case class VectorCentroid(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorCentroid.Buffer] {

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vector_centroid"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): VectorCentroid.Buffer =
    new VectorCentroid.Buffer(null, 0L)

  override def update(b: VectorCentroid.Buffer, input: InternalRow): VectorCentroid.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (b.sums == null) b.sums = new Array[Double](n)
      var i = 0
      while (i < n && i < b.sums.length) {
        b.sums(i) += (if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
        i += 1
      }
      b.count += 1
    }
    b
  }

  override def merge(b: VectorCentroid.Buffer, o: VectorCentroid.Buffer): VectorCentroid.Buffer = {
    if (o.sums != null) {
      if (b.sums == null) { b.sums = o.sums.clone(); b.count = o.count }
      else {
        var i = 0
        while (i < b.sums.length && i < o.sums.length) { b.sums(i) += o.sums(i); i += 1 }
        b.count += o.count
      }
    }
    b
  }

  override def eval(b: VectorCentroid.Buffer): Any =
    if (b.count == 0L || b.sums == null) null
    else new GenericArrayData(b.sums.map(_ / b.count))

  override def serialize(b: VectorCentroid.Buffer): Array[Byte] = {
    val n = if (b.sums == null) 0 else b.sums.length
    val buf = ByteBuffer.allocate(8 + 4 + 8 * n)
    buf.putLong(b.count).putInt(n)
    var i = 0
    while (i < n) { buf.putDouble(b.sums(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorCentroid.Buffer = {
    val buf = ByteBuffer.wrap(bytes)
    val count = buf.getLong()
    val n = buf.getInt()
    val sums = if (n == 0) null else {
      val a = new Array[Double](n)
      var i = 0
      while (i < n) { a(i) = buf.getDouble(); i += 1 }
      a
    }
    new VectorCentroid.Buffer(sums, count)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorCentroid =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorCentroid =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorCentroid =
    copy(child = newChildren.head)
}

object VectorCentroid {
  /** Mutable aggregation state: running element sums + vector count. */
  final class Buffer(var sums: Array[Double], var count: Long)
}

package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Elementwise sum of `array<double>` vectors as a typed imperative
  * aggregate — the building block for distributed centroid math (vector
  * mean per group = `vec_sum / count`).
  *
  * Why an aggregate and not posexplode+avg+collect: summing d-dimensional
  * vectors via posexplode multiplies the shuffle by d and needs a sort to
  * reassemble; this buffer is ONE d-length array per group per partition,
  * merged associatively — O(groups × d) through the exchange, which is the
  * 100 TB shape for k-means/IVF training.
  *
  * Null/ragged semantics: null vectors are skipped; the first non-null
  * vector fixes the dimension and a later mismatched length poisons the
  * group to NULL (dimension bugs must surface, not silently truncate).
  */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumAgg.Buf] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_sum expects array<double>, got $t")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): VecSumAgg.Buf = new VecSumAgg.Buf()

  override def update(buf: VecSumAgg.Buf, input: InternalRow): VecSumAgg.Buf = {
    val v = child.eval(input)
    if (v != null && !buf.poisoned) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buf.sum == null) buf.sum = new Array[Double](n)
      if (buf.sum.length != n) buf.poisoned = true
      else {
        var i = 0
        while (i < n) {
          if (arr.isNullAt(i)) { buf.poisoned = true; i = n }
          else { buf.sum(i) += arr.getDouble(i); i += 1 }
        }
      }
    }
    buf
  }

  override def merge(a: VecSumAgg.Buf, b: VecSumAgg.Buf): VecSumAgg.Buf = {
    if (b.poisoned) a.poisoned = true
    else if (b.sum != null) {
      if (a.sum == null) a.sum = b.sum.clone()
      else if (a.sum.length != b.sum.length) a.poisoned = true
      else {
        var i = 0
        while (i < a.sum.length) { a.sum(i) += b.sum(i); i += 1 }
      }
    }
    a
  }

  override def eval(buf: VecSumAgg.Buf): Any =
    if (buf.poisoned || buf.sum == null) null
    else new GenericArrayData(buf.sum.map(java.lang.Double.valueOf))

  override def serialize(buf: VecSumAgg.Buf): Array[Byte] = {
    val n = if (buf.sum == null) -1 else buf.sum.length
    val bb = ByteBuffer.allocate(1 + 4 + 8 * math.max(n, 0))
    bb.put(if (buf.poisoned) 1.toByte else 0.toByte)
    bb.putInt(n)
    if (n > 0) buf.sum.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new VecSumAgg.Buf()
    buf.poisoned = bb.get() == 1
    val n = bb.getInt
    if (n >= 0) {
      buf.sum = new Array[Double](n)
      var i = 0
      while (i < n) { buf.sum(i) = bb.getDouble; i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VecSumAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "vec_sum"
}

object VecSumAgg {
  /** Mutable aggregation state: running elementwise sum, or poisoned on a
    * dimension mismatch / null element. */
  final class Buf {
    var sum: Array[Double] = _
    var poisoned: Boolean = false
  }
}

package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}

/** KMV (k-minimum-values) distinct-count sketch as a typed imperative
  * aggregate (Bar-Yossef et al. 2002 / the Theta-sketch family).
  *
  * Input: a uniform [0,1) hash fraction per row (e.g.
  * [[graft.operators.Sampling.hashFraction]] — md5-based, so the sketch is
  * deterministic and any engine can reproduce the exact estimate). The
  * buffer keeps the k smallest DISTINCT fractions; the estimator is
  * `(k-1) / kth_min` once full, the exact distinct count while not.
  *
  * Why an aggregate sketch and not `count_distinct`: the buffer is O(k)
  * regardless of cardinality and MERGES associatively — partial sketches
  * combine map-side and across partitions/days, which is the 100 TB shape
  * for distinct counting (exact distinct shuffles every distinct value;
  * Spark's own approx_count_distinct is the same idea with HLL, but its
  * binary sketch cannot be reproduced by an external oracle).
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Double]] {

  require(k >= 2, "KMV needs k >= 2")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct expects a double hash fraction, got $t")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Double] =
    new java.util.TreeSet[java.lang.Double]()

  override def update(buf: java.util.TreeSet[java.lang.Double],
                      input: InternalRow): java.util.TreeSet[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) {
      val d = java.lang.Double.valueOf(v.asInstanceOf[Double])
      // TreeSet dedups identical fractions (same underlying value);
      // keep only the k smallest to bound the buffer
      buf.add(d)
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Double],
                     other: java.util.TreeSet[java.lang.Double])
      : java.util.TreeSet[java.lang.Double] = {
    val it = other.iterator()
    while (it.hasNext) {
      buf.add(it.next())
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Double]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble / buf.last()

  override def serialize(buf: java.util.TreeSet[java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putDouble(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Double]()
    var i = 0
    while (i < n) { buf.add(bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren.head)

  override def prettyName: String = "kmv_distinct"
}

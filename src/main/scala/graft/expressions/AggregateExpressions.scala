package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Element-wise running sum + count for vector averaging. */
final class VectorAvgBuffer(var sums: Array[Double], var count: Long) {
  def this() = this(null, 0L)
}

/** Element-wise average of a vector column (array<float> | array<double>
  * → array<double>): embedding mean-pooling, k-means centroid updates,
  * cluster profiles.
  *
  * Why a native TypedImperativeAggregate: the compositional route
  * (posexplode to (row, dim, value) then groupBy(key, dim)) multiplies
  * shuffle ROWS by the vector dimension — a 768-dim corpus shuffles
  * 768× the rows of this aggregate, which carries one double[] per
  * group per partition (classic partial aggregation: map-side combine,
  * tiny merge). Vectors shorter than the first-seen length pad with 0;
  * longer ones extend the buffer — callers with ragged input get
  * positional semantics, same as zip_with null-padding. */
case class VectorAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorAvgBuffer] {

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_vector_avg requires array<float> or array<double> input, " +
        s"got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vector_avg"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): VectorAvgBuffer = new VectorAvgBuffer()

  private def addInto(buf: VectorAvgBuffer, arr: ArrayData): Unit = {
    val n = arr.numElements()
    if (buf.sums == null) buf.sums = new Array[Double](n)
    else if (n > buf.sums.length) buf.sums = java.util.Arrays.copyOf(buf.sums, n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        buf.sums(i) += (if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
      i += 1
    }
    buf.count += 1
  }

  override def update(buf: VectorAvgBuffer, input: InternalRow): VectorAvgBuffer = {
    val v = child.eval(input)
    if (v != null) addInto(buf, v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(buf: VectorAvgBuffer, other: VectorAvgBuffer): VectorAvgBuffer = {
    if (other.sums != null) {
      if (buf.sums == null) buf.sums = new Array[Double](other.sums.length)
      else if (other.sums.length > buf.sums.length)
        buf.sums = java.util.Arrays.copyOf(buf.sums, other.sums.length)
      var i = 0
      while (i < other.sums.length) { buf.sums(i) += other.sums(i); i += 1 }
      buf.count += other.count
    }
    buf
  }

  override def eval(buf: VectorAvgBuffer): Any =
    if (buf.count == 0 || buf.sums == null) null
    else {
      val out = new Array[Double](buf.sums.length)
      var i = 0
      while (i < out.length) { out(i) = buf.sums(i) / buf.count; i += 1 }
      new GenericArrayData(out)
    }

  override def serialize(buf: VectorAvgBuffer): Array[Byte] = {
    val n = if (buf.sums == null) 0 else buf.sums.length
    val bb = ByteBuffer.allocate(8 + 4 + 8 * n)
    bb.putLong(buf.count).putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(buf.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorAvgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val count = bb.getLong()
    val n = bb.getInt()
    val sums = if (n == 0) null else {
      val a = new Array[Double](n)
      var i = 0
      while (i < n) { a(i) = bb.getDouble(); i += 1 }
      a
    }
    new VectorAvgBuffer(sums, count)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

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

/** Mergeable quantile sketch as a REUSABLE SQL aggregate —
  * `graft_quantile_sketch(value, lo, hi)` → array<long> of 256 bin
  * counts over the integer domain [lo, hi]. The per-query inline
  * version (ScaleOps.qQuantileSketch) stays as the audit; this lifts
  * the same discipline into an aggregate ANY query can call through
  * `spark.sql` text, grouped or global.
  *
  * Merge is plain bin-wise addition — count histograms merge
  * LOSSLESSLY (the property GK/t-digest only approximate), which is
  * exactly what TypedImperativeAggregate's partial/merge protocol
  * needs: each executor ships 256 longs regardless of row count, so a
  * 100 TB ANALYZE never sorts anything. Binning matches the audited
  * query: bin = (v − lo)·256 DIV (hi − lo + 1), clamped to [0, 255]
  * for out-of-domain stragglers (late rows under a stale domain
  * estimate land in an edge bin rather than erroring — rank error
  * stays bounded by bin load). `lo`/`hi` ride each input row (the
  * standard cross-join-the-1-row-domain shape), NOT the buffer, so a
  * group whose rows disagree on the domain is caller error — the
  * guarantee holds for constant-per-group domains. */
case class QuantileSketch(
    child: Expression,
    loExpr: Expression,
    hiExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val nBins = 256

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(child, loExpr, hiExpr).forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_quantile_sketch requires (BIGINT value, BIGINT lo, BIGINT hi)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_quantile_sketch"
  override def children: Seq[Expression] = Seq(child, loExpr, hiExpr)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nBins)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    val lo = loExpr.eval(input)
    val hi = hiExpr.eval(input)
    if (v != null && lo != null && hi != null) {
      val vv = v.asInstanceOf[Long]
      val lv = lo.asInstanceOf[Long]
      val hv = hi.asInstanceOf[Long]
      val w = math.max(1L, hv - lv + 1L)
      // Clamp INTO the domain before the multiply: (vv - lv) * nBins
      // overflows Long for values ~2^55 above lo, wrapping negative and
      // silently landing far-out-of-domain stragglers in bin 0 instead
      // of the documented edge bin 255. For a domain itself wider than
      // 2^55 even in-domain offsets overflow the multiply, so that
      // (cold) band takes an exact 128-bit path — same integer
      // semantics, never a wrapped product.
      val c = math.min(hv, math.max(lv, vv))
      val d = c - lv
      val bin =
        if (d <= Long.MaxValue / nBins) (d * nBins / w).toInt
        else (BigInt(d) * nBins / w).toInt
      buf(bin) += 1L
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < nBins) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * nBins)
    var i = 0
    while (i < nBins) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val a = new Array[Long](nBins)
    var i = 0
    while (i < nBins) { a(i) = bb.getLong(); i += 1 }
    a
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), loExpr = newChildren(1), hiExpr = newChildren(2))
}

/** Running co-moment state for one-pass covariance: per-dim sums plus
  * the upper-triangle pair-product sums (length d(d+1)/2). */
final class VectorCovBuffer(
    var d: Int, var n: Long,
    var sums: Array[Double], var prods: Array[Double]) {
  def this() = this(0, 0L, null, null)

  def grow(nd: Int): Unit =
    if (sums == null) {
      d = nd
      sums = new Array[Double](nd)
      prods = new Array[Double](nd * (nd + 1) / 2)
    } else if (nd > d) {
      val ns = new Array[Double](nd)
      val np = new Array[Double](nd * (nd + 1) / 2)
      System.arraycopy(sums, 0, ns, 0, d)
      // re-index the old triangle into the wider one
      var i = 0
      while (i < d) {
        var j = i
        while (j < d) {
          np(i * nd - i * (i - 1) / 2 + (j - i)) =
            prods(i * d - i * (i - 1) / 2 + (j - i))
          j += 1
        }
        i += 1
      }
      d = nd; sums = ns; prods = np
    }
}

/** One-pass population covariance matrix of a vector column
  * (array<float> | array<double> → array<double> of length d·d,
  * row-major): cov(i,j) = Σxᵢxⱼ/n − (Σxᵢ/n)(Σxⱼ/n).
  *
  * Why native: the compositional route fans every row out to its
  * d(d+1)/2 pair products through an explode before the partial
  * aggregate — a 64-dim corpus pushes 2080 struct rows per vector
  * through the hash aggregate (row overhead dwarfs the FMA). Here the
  * co-moment accumulation is a tight per-row loop over one buffer;
  * what crosses the shuffle is ONE (d² + d)-double state per
  * partition, invariant in row count — the textbook moment-sketch
  * shape for a 100 TB scan. Ragged vectors extend the buffer and pad
  * with zeros (positional semantics, same as graft_vector_avg).
  *
  * With `scale` > 0 the sketch is ORDER-INDEPENDENT: each row's
  * values and pair products quantize to integer units
  * (`floor(v·scale + 0.5)`) before accumulation, so partial sums are
  * exact integers in any partition/merge order and an oracle engine
  * summing the same integers lands on the bit-identical double —
  * the repo's standard cross-engine determinism trick lifted into
  * the sketch itself. Bound the sums before picking the scale: at
  * micro (1e6) units, per-cell product sums must stay < 2^53. */
case class VectorCovariance(
    child: Expression,
    scale: Double = 0.0,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorCovBuffer] {

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_vector_cov requires array<float> or array<double> input, " +
        s"got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vector_cov"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): VectorCovBuffer = new VectorCovBuffer()

  override def update(buf: VectorCovBuffer, input: InternalRow): VectorCovBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val nd = arr.numElements()
      buf.grow(nd)
      val d = buf.d
      val x = new Array[Double](nd)
      val s = scale
      var i = 0
      while (i < nd) {
        x(i) = if (arr.isNullAt(i)) 0.0
          else if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        buf.sums(i) += (if (s > 0.0) math.floor(x(i) * s + 0.5) else x(i))
        i += 1
      }
      i = 0
      while (i < nd) {
        val base = i * d - i * (i - 1) / 2 - i
        val xi = x(i)
        var j = i
        if (s > 0.0)
          while (j < nd) {
            buf.prods(base + j) += math.floor(xi * x(j) * s + 0.5); j += 1
          }
        else
          while (j < nd) { buf.prods(base + j) += xi * x(j); j += 1 }
        i += 1
      }
      buf.n += 1
    }
    buf
  }

  override def merge(buf: VectorCovBuffer, other: VectorCovBuffer): VectorCovBuffer = {
    if (other.sums != null) {
      buf.grow(other.d)
      val d = buf.d
      var i = 0
      while (i < other.d) {
        buf.sums(i) += other.sums(i)
        val dstBase = i * d - i * (i - 1) / 2 - i
        val srcBase = i * other.d - i * (i - 1) / 2 - i
        var j = i
        while (j < other.d) {
          buf.prods(dstBase + j) += other.prods(srcBase + j)
          j += 1
        }
        i += 1
      }
      buf.n += other.n
    }
    buf
  }

  override def eval(buf: VectorCovBuffer): Any =
    if (buf.n == 0 || buf.sums == null) null
    else {
      val d = buf.d
      val n = buf.n.toDouble
      val s = scale
      val out = new Array[Double](d * d)
      var i = 0
      while (i < d) {
        val base = i * d - i * (i - 1) / 2 - i
        var j = i
        while (j < d) {
          // Quantized path: written as the exact expression shape the
          // DuckDB oracle mirrors — every operand is an exact integer
          // in a double, so each IEEE op is correctly rounded and
          // bit-identical across engines.
          val c =
            if (s > 0.0)
              buf.prods(base + j) / (s * n) -
                (buf.sums(i) * buf.sums(j)) / (s * s * n * n)
            else
              buf.prods(base + j) / n - (buf.sums(i) / n) * (buf.sums(j) / n)
          out(i * d + j) = c
          out(j * d + i) = c
          j += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }

  override def serialize(buf: VectorCovBuffer): Array[Byte] = {
    val nd = if (buf.sums == null) 0 else buf.d
    val tri = nd * (nd + 1) / 2
    val bb = ByteBuffer.allocate(8 + 4 + 8 * (nd + tri))
    bb.putLong(buf.n).putInt(nd)
    var i = 0
    while (i < nd) { bb.putDouble(buf.sums(i)); i += 1 }
    i = 0
    while (i < tri) { bb.putDouble(buf.prods(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorCovBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong()
    val nd = bb.getInt()
    if (nd == 0) new VectorCovBuffer(0, n, null, null)
    else {
      val sums = new Array[Double](nd)
      var i = 0
      while (i < nd) { sums(i) = bb.getDouble(); i += 1 }
      val tri = nd * (nd + 1) / 2
      val prods = new Array[Double](tri)
      i = 0
      while (i < tri) { prods(i) = bb.getDouble(); i += 1 }
      new VectorCovBuffer(nd, n, sums, prods)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorCovariance =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorCovariance =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

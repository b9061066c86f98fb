package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Accumulated first and second moments of a fixed-dimension vector
  * column: count, per-dimension sums, and the upper-triangle
  * cross-product sums (row-major, i ≤ j). One buffer per aggregation
  * group; layout `[d, n, sx(0..d-1), sxy(i,j : i ≤ j)]`.
  */
final class MomentsBuffer(var d: Int, var n: Long,
                          var sx: Array[Double], var sxy: Array[Double]) {
  def this() = this(-1, 0L, null, null)

  private def init(dim: Int): Unit = {
    d = dim
    sx = new Array[Double](dim)
    sxy = new Array[Double](dim * (dim + 1) / 2)
  }

  def add(v: ArrayData, isFloat: Boolean): Unit = {
    val dim = v.numElements()
    if (d < 0) init(dim)
    // the guard [[whitenRotation]]'s per-pair counts used to provide:
    // a ragged corpus (mixed embedding dimensions) silently corrupts
    // means/covariances — fail loudly instead
    require(dim == d,
      s"graft_moments: ragged embedding dimensions — row has $dim dims, earlier rows $d; " +
        "fix the corpus to a uniform size(embedding)")
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    n += 1L
    var idx = 0
    i = 0
    while (i < dim) {
      val xi = x(i)
      sx(i) += xi
      var j = i
      while (j < dim) {
        sxy(idx) += xi * x(j)
        idx += 1
        j += 1
      }
      i += 1
    }
  }

  def mergeFrom(other: MomentsBuffer): Unit = {
    if (other.d >= 0) {
      if (d < 0) init(other.d)
      require(other.d == d,
        s"graft_moments: ragged embedding dimensions across partitions (${other.d} vs $d)")
      n += other.n
      var i = 0
      while (i < sx.length) { sx(i) += other.sx(i); i += 1 }
      i = 0
      while (i < sxy.length) { sxy(i) += other.sxy(i); i += 1 }
    }
  }
}

/** `graft_moments(vec)` — single-pass mean/Gram moment accumulation for
  * the whitening operators (C79b/C79c): returns
  * `array(d, n, sx(0..d-1), sxy(i ≤ j row-major))` as doubles.
  *
  * Replaces the double-posexplode pair stream (d(d+1)/2 rows per input
  * row — 2080 at d=64 — through a hash aggregate on (i, j)) with one
  * O(d²/2) primitive-array update per row: the explode never
  * materializes and the exchange carries ONE buffer per map task
  * instead of per-task partial counts for 2080 keys (guide §2.3
  * "aggregate before you shuffle"). Merge is element-wise addition —
  * associative and commutative; float summation ORDER differs from the
  * exploded form's only in grouping, the same run-stability class the
  * whiten operators already document (no SQL oracle; spec-pinned).
  */
case class MomentsAgg(child: Expression,
                      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MomentsBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_moments expects array<float>/array<double>, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): MomentsBuffer = new MomentsBuffer()

  override def update(buf: MomentsBuffer, input: InternalRow): MomentsBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData], isFloat)
    buf
  }

  override def merge(buf: MomentsBuffer, other: MomentsBuffer): MomentsBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: MomentsBuffer): Any = {
    if (buf.d < 0) new GenericArrayData(Array(0.0d, 0.0d))
    else {
      val out = new Array[Double](2 + buf.sx.length + buf.sxy.length)
      out(0) = buf.d.toDouble
      out(1) = buf.n.toDouble
      System.arraycopy(buf.sx, 0, out, 2, buf.sx.length)
      System.arraycopy(buf.sxy, 0, out, 2 + buf.sx.length, buf.sxy.length)
      new GenericArrayData(out)
    }
  }

  override def serialize(buf: MomentsBuffer): Array[Byte] = {
    val d = math.max(buf.d, 0)
    val nSxy = if (buf.d < 0) 0 else buf.sxy.length
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + 8 * (d + nSxy))
    bb.putInt(buf.d)
    bb.putLong(buf.n)
    if (buf.d >= 0) {
      buf.sx.foreach(bb.putDouble)
      buf.sxy.foreach(bb.putDouble)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MomentsBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val n = bb.getLong
    if (d < 0) new MomentsBuffer()
    else {
      val sx = Array.fill(d)(bb.getDouble)
      val sxy = Array.fill(d * (d + 1) / 2)(bb.getDouble)
      new MomentsBuffer(d, n, sx, sxy)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MomentsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MomentsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MomentsAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_moments"
}

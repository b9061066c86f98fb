package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Dense HyperLogLog registers: 2^p six-bit-max ranks stored one byte
  * each (dense from the start — at p=12 that is 4 KiB per buffer, which
  * is the map-side cost class this aggregate exists to bound).
  *
  * Estimator per Flajolet et al. 2007 with the small-range linear
  * counting correction; no 32-bit large-range correction is needed on a
  * 64-bit hash (collision range starts ~2^57). Standard error is
  * 1.04/sqrt(m) ≈ 1.6 % at p=12.
  */
final class HllBuffer(val p: Int) {
  val m: Int = 1 << p
  val regs = new Array[Byte](m)

  /** FNV-1a over the UTF-8 bytes, finished with the murmur3 fmix64
    * avalanche — FNV alone biases low bits on short keys; the fmix
    * restores the uniformity HLL's rank statistic assumes.
    */
  def hash(s: UTF8String): Long = {
    val b = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) {
      h = (h ^ (b(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  def add(s: UTF8String): Unit = {
    val h = hash(s)
    val idx = (h >>> (64 - p)).toInt
    // rank = leading zeros of the remaining 64-p bits, + 1 (capped there
    // by the numberOfLeadingZeros of the shifted-in 1 guard bit)
    val w = (h << p) | (1L << (p - 1))
    val rank = (java.lang.Long.numberOfLeadingZeros(w) + 1).toByte
    if (rank > regs(idx)) regs(idx) = rank
  }

  def mergeFrom(other: HllBuffer): Unit = {
    var i = 0
    while (i < m) {
      if (other.regs(i) > regs(i)) regs(i) = other.regs(i)
      i += 1
    }
  }

  def estimate: Long = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += java.lang.Double.longBitsToDouble((1023L - regs(i)) << 52) // 2^-reg
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    // Flajolet et al. 2007 give exact alpha for small m; the asymptotic
    // 0.7213/(1+1.079/m) only holds for m >= 128 and would carry a
    // systematic 1-3 % bias at p=4..6.
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m * m / sum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.rint(est).toLong
  }
}

/** D3: mergeable distinct-count sketch —
  * `graft_hll(item, p)` returns the HyperLogLog estimate as a long.
  *
  * A TypedImperativeAggregate, so each map task reduces its rows to one
  * 2^p-byte register array BEFORE the exchange: distinct-counting a
  * 100 TB column shuffles one 4 KiB buffer per task per group, where
  * the exact `count(distinct x)` it replaces rewrites into a shuffle of
  * every distinct value. Sketches merge by pointwise register max —
  * associative, commutative, idempotent — so partial aggregation,
  * AQE re-plans and retries can never change the answer for a given
  * input SET (the estimate is a pure function of the merged registers).
  */
case class HllAgg(child: Expression, p: Int,
                  mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HllBuffer] {

  require(p >= 4 && p <= 18, s"graft_hll precision must be in [4, 18], got $p")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_hll expects a string item, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): HllBuffer = new HllBuffer(p)

  override def update(buf: HllBuffer, input: InternalRow): HllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: HllBuffer, other: HllBuffer): HllBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: HllBuffer): Any = buf.estimate

  override def serialize(buf: HllBuffer): Array[Byte] = buf.regs.clone()

  override def deserialize(bytes: Array[Byte]): HllBuffer = {
    val buf = new HllBuffer(p)
    System.arraycopy(bytes, 0, buf.regs, 0, buf.m)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_hll"
}

package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries summary with at most `capacity` counters.
  *
  * Guarantees (Misra & Gries 1982; merge rule from Agarwal et al. 2013,
  * "Mergeable Summaries"): each reported count is a LOWER bound on the
  * true frequency, underestimating by at most n/(capacity+1) over n
  * processed items, and every item with true frequency > n/(capacity+1)
  * is present in the summary. When the distinct-item count never exceeds
  * `capacity`, no decrement ever fires and every count is EXACT.
  */
final class MGBuffer(val capacity: Int) {
  val counts = new java.util.HashMap[String, Long]()
  /** Sum of decrements applied so far — the per-item undercount bound. */
  var decremented: Long = 0L

  def add(item: String, by: Long = 1L): Unit = {
    val cur = counts.get(item)
    if (cur != 0L) counts.put(item, cur + by)
    else if (counts.size < capacity) counts.put(item, by)
    else decrementAll(by)
  }

  /** Subtract `by` from every counter (clamped at the smallest counter —
    * the classic one-at-a-time rule generalized to weighted arrival),
    * dropping zeros. Cost O(capacity), amortized O(1) per arrival.
    */
  private def decrementAll(by: Long): Unit = {
    var d = by
    while (d > 0) {
      var minV = Long.MaxValue
      val it0 = counts.values().iterator()
      while (it0.hasNext) minV = math.min(minV, it0.next())
      val step = math.min(d, minV)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - step
        if (nv <= 0) it.remove() else e.setValue(nv)
      }
      decremented += step
      d -= step
      if (counts.isEmpty) return
    }
  }

  /** Mergeable-summaries combine: add counts pointwise, then if over
    * capacity subtract the (capacity+1)-th largest count from all and
    * drop non-positives — the error bounds add, the guarantee holds.
    */
  def mergeFrom(other: MGBuffer): Unit = {
    decremented += other.decremented
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey, cur + e.getValue)
    }
    if (counts.size > capacity) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vi = counts.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(counts.size - capacity - 1) // (capacity+1)-th largest
      val ei = counts.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        val nv = e.getValue - cut
        if (nv <= 0) ei.remove() else e.setValue(nv)
      }
      decremented += cut
    }
  }

  /** Entries sorted (count desc, item asc) — deterministic output. */
  def sorted: Array[(String, Long)] = {
    val arr = new Array[(String, Long)](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue); i += 1 }
    arr.sortWith { case ((t1, c1), (t2, c2)) => if (c1 != c2) c1 > c2 else t1 < t2 }
  }
}

/** D3: streaming heavy-hitters aggregate —
  * `graft_heavy_hitters(item, capacity)` returns
  * `array<struct<item string, count long>>` of the Misra–Gries summary,
  * sorted (count desc, item asc).
  *
  * A TypedImperativeAggregate, so each map task reduces its rows to a
  * capacity-bounded summary BEFORE the exchange: finding frequent items
  * over 100 TB shuffles one O(capacity) buffer per task — the exact
  * groupBy it replaces shuffles the full vocabulary. Counts are exact
  * whenever the true distinct count stays within capacity (no decrement
  * ever fires); beyond that they are lower bounds with error ≤
  * n/(capacity+1), and nothing with frequency above that bound is lost.
  */
case class HeavyHittersAgg(child: Expression, capacity: Int,
                           mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGBuffer] {

  require(capacity > 0, s"graft_heavy_hitters needs capacity > 0, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType), StructField("count", LongType))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_heavy_hitters expects a string item, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(capacity)

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    // toString copies out of the (reused) unsafe-row buffer — required
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MGBuffer, other: MGBuffer): MGBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: MGBuffer): Any = {
    val rows: Array[Any] = buf.sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c): Any
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: MGBuffer): Array[Byte] = {
    val entries = buf.sorted.map { case (t, c) => (t.getBytes(StandardCharsets.UTF_8), c) }
    val bb = ByteBuffer.allocate(12 + entries.map(_._1.length + 12).sum)
    bb.putInt(entries.length)
    bb.putLong(buf.decremented)
    entries.foreach { case (b, c) => bb.putInt(b.length); bb.put(b); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MGBuffer(capacity)
    buf.decremented = bb.getLong
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.counts.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_heavy_hitters"
}

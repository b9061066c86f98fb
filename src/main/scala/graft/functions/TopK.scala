package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mergeable bounded top-k buffer: keeps the k best (score desc, id asc)
  * entries. Insertion is O(k) against the current worst — k is small by
  * construction, and the buffer is what ships through partial
  * aggregation, so a grouped top-k needs ONE shuffle of k-sized buffers
  * instead of a window sort over every row.
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** true when (s1, id1) ranks strictly better than (s2, id2). Scores
    * compare under the SQL sort total order (Double.compare: NaN ranks
    * above +Infinity, exactly like Spark's and DuckDB's ORDER BY DESC),
    * with -0.0/0.0 treated as a tie — a plain `>` would make every NaN
    * comparison false and let one NaN entry poison worst-slot selection.
    */
  @inline private def better(s1: Double, id1: Long, s2: Double, id2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    if (c > 0 && !(s1 == s2)) true
    else if (c < 0 && !(s1 == s2)) false
    else id1 < id2
  }

  private def worstIdx: Int = {
    var w = 0
    var i = 1
    while (i < size) {
      if (better(scores(w), ids(w), scores(i), ids(i))) w = i
      i += 1
    }
    w
  }

  def insert(score: Double, id: Long): Unit = {
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1
    } else if (k > 0) {
      val w = worstIdx
      if (better(score, id, scores(w), ids(w))) { scores(w) = score; ids(w) = id }
    }
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** Entries sorted best-first — the deterministic output order. */
  def sorted: Array[(Double, Long)] =
    (0 until size).map(i => (scores(i), ids(i))).toArray
      .sortWith { case ((s1, i1), (s2, i2)) => better(s1, i1, s2, i2) }
}

/** D3: bounded top-k aggregate — `graft_topk(struct(score, id), k)`
  * returns `array<struct<score double, id long>>` of the k best rows by
  * (score desc, id asc). A TypedImperativeAggregate, so partial
  * aggregation applies: every map task reduces its rows to a k-entry
  * buffer before the exchange — grouped top-k without a window sort.
  */
case class TopKAgg(child: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"graft_topk needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  // update() reads the struct positionally as (double, long) — anything
  // else must fail analysis, not read reinterpreted bytes at runtime
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StructType(fields) if fields.length == 2 &&
          fields(0).dataType == DoubleType && fields(1).dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_topk expects struct<double, bigint> input, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1)) buf.insert(row.getDouble(0), row.getLong(1))
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows: Array[Any] = buf.sorted.map { case (s, id) =>
      InternalRow(s, id): Any
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_topk"
}

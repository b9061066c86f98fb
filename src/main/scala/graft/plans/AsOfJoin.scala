package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.DatasetShim

/** A1-class custom operator (SURVEY §2 A9, native path): AS-OF JOIN as a
  * first-class plan — logical node + planner strategy + physical
  * co-partitioned merge pass — for the case the composed union+window
  * formulation can't express efficiently at scale (wide right payloads,
  * multiple as-of columns).
  *
  * Physical shape: both sides hash-clustered on the key and sorted by
  * (key, time) — EnsureRequirements inserts exactly one exchange + sort
  * per side — then a single streaming merge per partition keeps ONE
  * buffered right row (the latest with right.time <= left.time per key):
  * O(n log n) in the sort, O(1) state, no per-key materialization.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression) extends BinaryNode {
  // right side is outer: null-padded when no earlier row exists
  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan =
    copy(left = l, right = r)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  private def asc(e: Expression): SortOrder =
    SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending,
      org.apache.spark.sql.catalyst.expressions.NullsFirst, Seq.empty)

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(asc(leftKey), asc(leftTime)),
    Seq(asc(rightKey), asc(rightTime)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val rightSchema = right.schema
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = InternalRow.fromSeq(Seq.fill(rightSchema.length)(null))
      val project = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow()

      val rBuf = rIter.buffered
      var heldKey: Long = 0L
      var held: InternalRow = null     // latest right row with key == heldKey so far

      lIter.map { lRow =>
        val kAny = lKey.eval(lRow)
        val tsAny = lTime.eval(lRow)
        if (kAny == null || tsAny == null) {
          // null never equals any key: null-padded, no right advance needed
          // (null-keyed left rows sort first, so the merge stays monotone)
          project(joined(lRow, nullRight))
        } else {
          val k = kAny.asInstanceOf[Long]
          val ts = tsAny.asInstanceOf[Long]
          // drop held row from an earlier key group
          if (held != null && heldKey != k) held = null
          // advance right while (rk, rt) <= (k, ts) in (key, time) order
          var continue = rBuf.hasNext
          while (continue) {
            val head = rBuf.head
            val hkAny = rKey.eval(head)
            val htAny = rTime.eval(head)
            if (hkAny == null || htAny == null) {
              rBuf.next() // null-keyed right rows can never match; discard
              continue = rBuf.hasNext
            } else {
              val hk = hkAny.asInstanceOf[Long]
              val ht = htAny.asInstanceOf[Long]
              if (hk < k || (hk == k && ht <= ts)) {
                if (hk == k) { held = head.copy(); heldKey = k }
                rBuf.next()
                continue = rBuf.hasNext
              } else continue = false
            }
          }
          project(joined(lRow, if (held != null && heldKey == k) held else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)
}

/** Public API: as-of join two DataFrames on long key/time columns
  * (right row = latest with rightTime <= leftTime per key; right columns
  * null-padded when none exists). Column names must be disambiguated by
  * the caller. Requires a session built with GraftExtensions.
  */
object AsOf {
  def join(leftDf: DataFrame, rightDf: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String): DataFrame = {
    val spark = leftDf.sparkSession
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(sys.error(s"column $name not found"))
    DatasetShim.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan,
        attr(lPlan, leftKey), attr(rPlan, rightKey),
        attr(lPlan, leftTime), attr(rPlan, rightTime)))
  }
}

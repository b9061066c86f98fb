package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ClassicConversions._

/** Bridge into the package-private Dataset factory so library code can
  * materialize a DataFrame from a custom LogicalPlan (the standard pattern
  * used by Spark-extension libraries; Dataset#ofRows is private[sql]).
  */
object DatasetShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(castToImpl(spark), plan)

  /** Column over a custom Expression (Column(expr) is private[sql] in 4.x). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** The Expression behind a Column (Column#expr is private[sql] in 4.x). */
  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** DataFrame over an RDD of InternalRows without a per-row
    * Row→Catalyst conversion (SparkSession#internalCreateDataFrame is
    * private[sql]) — the zero-copy path custom binary sources/sinks use
    * to hand pre-encoded batches (e.g. UnsafeArrayData-packed sample
    * blocks) back into a Catalyst plan.
    */
  def internalCreateDataFrame(spark: SparkSession,
                              rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
                              schema: org.apache.spark.sql.types.StructType): DataFrame =
    castToImpl(spark).internalCreateDataFrame(rdd, schema)
}

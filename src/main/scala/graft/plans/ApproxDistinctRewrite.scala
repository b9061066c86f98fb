package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Final, Partial}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DateType, NumericType, StringType, TimestampType}
import graft.functions.HllAgg

/** D6: opt-in Catalyst optimizer rule — rewrite exact
  * `count(DISTINCT x)` into the mergeable `graft_hll` sketch when the
  * session sets `spark.graft.approxDistinct=true`.
  *
  * This is the engine-level answer to "my exploratory dashboards don't
  * need exact distincts over 100 TB": Spark plans an exact distinct as
  * an Expand + double aggregation whose first shuffle carries every
  * distinct value; under the flag the SAME query text plans as one
  * map-side-combined 2^p-byte sketch per group (±1.6 % at the default
  * p=12). Opt-IN by construction: the flag is off by default, nothing
  * rewrites without it, and flipping it per session/notebook changes no
  * query code. The rewrite triggers only on the plain single-argument
  * form (no FILTER clause), keeps the aggregate's output attribute ids
  * (downstream plan references stay valid), and casts non-string atomic
  * children to string — value-preserving for the distinct count because
  * atomic-to-string is injective on non-null values and Count ignores
  * nulls either way.
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule` — the
  * public extension point, same as the AsOf planner strategy (D-surface:
  * expressions, aggregates, DSv2 source, planner strategy, TVFs, and —
  * with this — optimizer rules).
  */
case class ApproxDistinctRewrite(spark: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.approxDistinct").contains("true")

  private def precision: Int = {
    val key = "spark.graft.approxDistinct.p"
    def invalid(raw: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        "INVALID_CONF_VALUE.REQUIREMENT",
        Map("confValue" -> raw, "confName" -> key,
            "confRequirement" -> "an integer in [4, 18]"))
    spark.conf.getOption(key) match {
      case None => 12
      case Some(raw) =>
        val parsed = try raw.toInt catch { case _: NumberFormatException => invalid(raw) }
        if (parsed < 4 || parsed > 18) invalid(raw)
        parsed
    }
  }

  private def asStringChild(e: Expression): Option[Expression] = e.dataType match {
    case StringType => Some(e)
    // Timestamp-to-string rendering needs the session zone: a bare Cast
    // is injected POST-analysis, so the ResolveTimeZone rule never fills
    // it in and execution would fail on timeZoneId.get.
    case TimestampType =>
      Some(Cast(e, StringType, Some(spark.sessionState.conf.sessionLocalTimeZone)))
    case _: NumericType | BooleanType | DateType => Some(Cast(e, StringType))
    case _ => None // array/struct/map/binary distincts keep exact semantics
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    val p = precision
    plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(Count(Seq(child)), Complete | Partial | Final, true, None, _) =>
            asStringChild(child) match {
              case Some(c) => ae.copy(aggregateFunction = HllAgg(c, p), isDistinct = false)
              case None => ae
            }
        }
    }
  }
}

package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream product analytics (SURVEY.md §2 B15-B16) — the classic
  * per-user behavioral queries a training-telemetry pipeline runs over the
  * same event stream the time-series operators process: ordered funnels
  * and cohort retention.
  *
  * Scale shape: both operators reduce the event stream to user-cardinality
  * relations FIRST (per-user minima / distinct activity days) and join
  * only those — at 100 TB the joins shuffle per-user rows, never raw
  * events, and every aggregation is map-side combinable.
  */
object EventAnalytics {

  /** µs since epoch from the int64-ns ts column (integer division — no FP). */
  private def tsUs: Column = expr("ts div 1000")

  /** B15: ordered funnel — users who did stage 1, then stage 2 AFTER
    * their first stage-1 event, then stage 3 after that, unbounded
    * horizon. Emits one row per stage with the surviving user count.
    *
    * Each stage is `min(ts)` over the stage's events joined to the
    * previous stage's per-user completion time — the join inputs are the
    * type-filtered event subsets (filter pushed to the scan) and the
    * user-cardinality completion relation, so no stage ever re-shuffles
    * the full stream.
    */
  def funnel(t: Tables, stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = t.events.sparkSession
    import spark.implicits._
    val ev = t.events.select(col("user_id"), col("event_type"), tsUs.as("us"))
    // completed(i) = (user_id, t_i) for users who reached stage i in order
    val first = ev.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("us")).as("t"))
    val completed = stages.tail.scanLeft(first) { (prev, stage) =>
      ev.filter(col("event_type") === stage)
        .join(prev.withColumnRenamed("t", "t_prev"), Seq("user_id"))
        .filter(col("us") > col("t_prev"))
        .groupBy(col("user_id")).agg(min(col("us")).as("t"))
    }
    completed.zip(stages).zipWithIndex.map { case ((df, name), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).cast("long").as("stage"),
          lit(name).as("stage_name"), col("n_users"))
    }.reduce(_.unionAll(_)).orderBy(col("stage"))
  }

  /** B16: cohort retention — cohort = a user's first active day; one row
    * per (cohort day, day offset) with the count of users active again
    * that day. Day arithmetic is integer µs (86400000000 per day), exact
    * in every engine.
    *
    * Two aggregations: distinct (user, day) activity, then the
    * user-cardinality first-day relation joins back — the count never
    * needs countDistinct because (user, day) is already unique.
    */
  def retention(t: Tables): DataFrame = {
    val dayUs = 86400000000L
    val days = t.events
      .select(col("user_id"), (tsUs / dayUs).cast("long").as("day"))
      .distinct()
    val cohort = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    days.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }
}

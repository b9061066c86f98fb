package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics

/** B12/B13 behavioral checks: salted agg equals direct agg; sketches stay
  * inside their error bounds vs exact values.
  */
class AnalyticsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  lazy val t: Tables = Tables(spark, "/root/testdata/sf0.01")

  test("skewAgg equals direct aggregation regardless of salt count") {
    val direct = t.events.groupBy(col("event_type"))
      .agg(round(sum(col("value")), 2).as("total_value"), count(lit(1)).as("n"))
      .orderBy(col("event_type")).collect()
    Seq(4, 16, 64).foreach { salts =>
      // operators are sort-free (determinism ordering lives at the
      // driver boundary) — order here for the row-wise compare
      val salted = Analytics.skewAgg(t, salts).orderBy(col("event_type")).collect()
      assert(salted.map(r => (r.getString(0), r.getLong(2))).toSeq ==
        direct.map(r => (r.getString(0), r.getLong(2))).toSeq, s"counts at salts=$salts")
      salted.zip(direct).foreach { case (s, d) =>
        assert(math.abs(s.getDouble(1) - d.getDouble(1)) <= 0.01, s"sums at salts=$salts")
      }
    }
  }

  test("approx_count_distinct within 5% of exact; quantile sketch ordered") {
    val approx = Analytics.approxStats(t).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = t.lineitem.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("o"), countDistinct(col("l_partkey")).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (k, (o, p)) =>
      val (ao, ap) = approx(k)
      assert(math.abs(ao - o).toDouble / o < 0.05, s"$k orders: approx $ao vs exact $o")
      assert(math.abs(ap - p).toDouble / p < 0.05, s"$k parts: approx $ap vs exact $p")
    }
    Analytics.approxStats(t).collect().foreach { r =>
      assert(r.getDouble(3) <= r.getDouble(4), "p50 <= p90")
    }
  }

  test("bucketed tables co-locate the join: no shuffle exchange") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    t.lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    t.orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketing should co-locate the join:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}

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

  private def pagerankFixture(): Tables = {
    import spark.implicits._
    // trade graph: c1-{s1,s2}, c2-{s1} (order 10 -> c1 buys from s1+s2,
    // order 20 -> c2 buys from s1); duplicate lineitem rows must collapse
    val dir = java.nio.file.Files.createTempDirectory("pr").toString
    Seq((10L, 1L), (20L, 2L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, 1L), (10L, 2L), (10L, 1L), (20L, 1L)).toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Tables(spark, dir)
  }

  test("triangleCount: hand-built baskets give the exact triangle census") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tri").toString
    // o1 {1,2,3}: 1 triangle; o2 {3,4}: bridge edge; o3 {4,5,6,7}: K4 = 4
    // triangles; o4 {1,2}: duplicate edge must not double-count
    Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L),
        (3L, 4L), (3L, 5L), (3L, 6L), (3L, 7L), (4L, 1L), (4L, 2L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Analytics.triangleCount(Tables(spark, dir)).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((7L, 10L, 5L)),
      s"nodes=7 edges=10 triangles=1+C(4,3)... : $got")
  }

  test("graphPagerank: one iteration matches exact integer fixed-point arithmetic") {
    val tt = pagerankFixture()
    val got = Analytics.graphPagerank(tt, iters = 1, k = 10).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // n=4, scale=1e12: r0=250e9 each; deg c1=2,c2=1,s1=2,s2=1
    // base=(15e10)//4=37_500_000_000
    // inflow(c1)=125e9(s1)+250e9(s2)=375e9 -> rank=37.5e9+85*375e9//100=356_250_000_000
    // inflow(c2)=125e9 -> 37.5e9+106_250_000_000=143_750_000_000; s1==c1, s2==c2 by symmetry
    assert(got("c1") == ((2L, 356250000000L)), s"c1: ${got("c1")}")
    assert(got("c2") == ((1L, 143750000000L)), s"c2: ${got("c2")}")
    assert(got("s1") == ((2L, 356250000000L)), s"s1 symmetric to c1: ${got("s1")}")
    assert(got("s2") == ((1L, 143750000000L)), s"s2: ${got("s2")}")
  }

  test("graphPagerank: 5 iterations conserve total rank and keep hub order") {
    val tt = pagerankFixture()
    val rows = Analytics.graphPagerank(tt, iters = 5, k = 10).collect()
    val ranks = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    // integer floor-division loses < 1 unit per node per step: total stays
    // within n*(iters+2) units of SCALE
    val total = ranks.values.sum
    assert(math.abs(total - 1000000000000L) <= 4L * 7L * 100L,
      s"rank conservation: $total")
    // the two degree-2 hubs tie and outrank the degree-1 leaves
    assert(ranks("c1") == ranks("s1") && ranks("c2") == ranks("s2"), s"symmetry: $ranks")
    assert(ranks("c1") > ranks("c2"), s"hubs outrank leaves: $ranks")
    // output is rank desc with node tie-break
    val order = rows.map(_.getString(0)).toSeq
    assert(order == Seq("c1", "s1", "c2", "s2"), s"deterministic order: $order")
  }
}

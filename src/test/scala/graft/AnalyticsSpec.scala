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
    // skew gate: the 4-item basket (o3) trips maxBasket=3 BEFORE any pair
    // forms, with the remedy named — the last ungated quadratic surface
    val e = intercept[IllegalArgumentException] {
      Analytics.triangleCount(Tables(spark, dir), maxBasket = 3)
    }
    assert(e.getMessage.contains("maxBasket") && e.getMessage.contains("top-N"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Analytics.assocRules(Tables(spark, dir), maxBasket = 3)
    }
    assert(e2.getMessage.contains("assocRules"), e2.getMessage)
  }

  test("lpaLabels: hand-traced synchronous rounds split two triangles across a bridge") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6} joined by bridge 3-4. Synchronous LPA
    // with (most-frequent, min-label) votes, own label excluded — traced
    // by hand: converges at round 4 to {1,2,3}->1 and {4,5,6}->3, and the
    // bridge must NOT merge the two communities (CC would).
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L))
      .toDF("a", "b")
    val got = Analytics.lpaLabels(e, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L),
      s"got $got")
    // intermediate rounds are part of the contract (the oracle unrolls
    // them): round 2 still shows the pre-convergence labels
    val r2 = Analytics.lpaLabels(e, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 3L, 6L -> 3L),
      s"round-2 labels: $r2")
  }

  test("graphCC: exact component census on a hand-built two-component graph") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cc").toString
    // o1..o4 connect {1..7} (bridge 3-4); o5 {8,9} is a separate market;
    // o6 {10} is a singleton basket -> NO edge, so 10 is not a node
    Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L),
        (3L, 4L), (3L, 5L), (3L, 6L), (3L, 7L), (4L, 1L), (4L, 2L),
        (5L, 8L), (5L, 9L), (6L, 10L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Analytics.graphCC(Tables(spark, dir)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 7L), (8L, 2L)),
      s"component = min part id, sized desc, edge-less parts excluded: $got")
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

  test("assocRules: planted baskets give exact support/confidence/lift") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ar").toString
    // baskets: o1{1,2} o2{1,2} o3{1,2,3} o4{3}; the duplicate (1,1) row
    // must collapse in the distinct. supp(1)=3 supp(2)=3 supp(3)=2 nb=4;
    // pair (1,2) appears 3x, (1,3)/(2,3) once (below minPairSupport=2).
    Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
        (3L, 1L), (3L, 2L), (3L, 3L), (4L, 3L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = Analytics.assocRules(Tables(spark, dir)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toSet
    // conf = 3/3 = 1.0 both ways; lift = 3*4/(3*3) = 1.3333
    assert(rows == Set(
      (1L, 2L, 3L, 3L, 3L, 1.0, 1.3333),
      (2L, 1L, 3L, 3L, 3L, 1.0, 1.3333)), s"got $rows")
  }

  test("rfmSegments: planted customers band exactly on interpolated quartiles") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rfm").toString
    def day(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 00:00:00")
    // c1: 1 order day0 $10; c2: 2 orders days1-2 $20; c3: 3 orders
    // days3-5 $30; c4: 4 orders days6-9 $40. Metrics are fully distinct,
    // so each quartile cutoff interpolates between known order stats.
    val orders =
      Seq((1L, day(0), 10.0)) ++
      (1 to 2).map(d => (2L, day(d), 20.0)) ++
      (3 to 5).map(d => (3L, day(d), 30.0)) ++
      (6 to 9).map(d => (4L, day(d), 40.0))
    orders.toDF("o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Analytics.rfmSegments(Tables(spark, dir)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getInt(6)))).toMap
    // recency [0,4,7,9] -> cuts 3.0/5.5/7.5; freq [1,2,3,4] -> 1.75/2.5/3.25;
    // monetary cents [1000,4000,9000,16000] -> 3250/6500/10750
    assert(got(1L) == ((9L, 1L, 1000L, 4, 1, 1)), s"c1: ${got(1L)}")
    assert(got(2L) == ((7L, 2L, 4000L, 3, 2, 2)), s"c2: ${got(2L)}")
    assert(got(3L) == ((4L, 3L, 9000L, 2, 3, 3)), s"c3: ${got(3L)}")
    assert(got(4L) == ((0L, 4L, 16000L, 1, 4, 4)), s"c4: ${got(4L)}")
  }
}

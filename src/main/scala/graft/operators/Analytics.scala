package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analytics backbone (SURVEY.md §2 B1-B11).
  *
  * Every operator is a declarative plan builder: filters/projections sit
  * directly on the parquet scans (Catalyst pushes them down), dimension
  * tables are broadcast explicitly, and top-k goes through
  * TakeOrderedAndProject rather than a global sort.
  *
  * Oracle-parity rules (SURVEY.md §6): float aggregates rounded on both
  * sides, deterministic ORDER BY with tie-breaks, temporal outputs as DATE
  * or epoch-µs BIGINT (never raw ns timestamps).
  */
object Analytics {

  /** B1: TPC-H Q1-style pricing summary. One shuffle (partial aggs map-side). */
  def q1Pricing(t: Tables): DataFrame =
    t.lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** B2: shipping-priority top-k — 3-way join, broadcast customer, bounded top-k. */
  def q3Shipping(t: Tables): DataFrame = {
    val cutoff = lit("1998-03-15").cast("timestamp")
    val cust = t.customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = t.orders.filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = t.lineitem.filter(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord.join(broadcast(cust), ord("o_custkey") === cust("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** B3: local-supplier volume — 5-way star join. The orders fact side
    * shuffle-joins with lineitem (it is NOT broadcast: at scale it is
    * fact-sized); all true dims (customer/supplier/nation/region) are
    * broadcast, so the plan has exactly one fact-fact shuffle.
    */
  def q5Volume(t: Tables): DataFrame = {
    val li = t.lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val ord = t.orders
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.customer.select("c_custkey", "c_nationkey")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t.nation.select("n_nationkey", "n_name", "n_regionkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.select("r_regionkey", "r_name")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** B4: running window aggregates per customer over order time. */
  def winRunning(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    t.orders
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("running_spend",
        round(sum(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
      .select(col("o_orderkey"), col("o_custkey"), col("rn"), col("running_spend"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** B5: exact distinct counts per group (Catalyst expand rewrite). */
  def aggDistinct(t: Tables): DataFrame =
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** B6: rollup hierarchy totals (order status ⊃ priority). */
  def cubeRollup(t: Tables): DataFrame =
    t.orders
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice")), 2).as("total"), count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** B7: EXISTS / NOT EXISTS via semi/anti joins (never a full join + distinct). */
  def semiAnti(t: Tables): DataFrame = {
    val urgent = t.orders.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    val withUrgent = t.customer.join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit(1L).as("has_urgent"))
    val withoutUrgent = t.customer.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit(0L).as("has_urgent"))
    withUrgent.unionAll(withoutUrgent).orderBy(col("c_custkey"))
  }

  /** B8: top-N per group via rank window. */
  def topnGroup(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc, col("c_custkey"))
    t.customer
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("c_mktsegment"), col("rk"), col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"))
      .orderBy(col("c_mktsegment"), col("rk"))
  }

  /** B9: wide pivot by event_type via conditional aggregation (oracle-parity with FILTER). */
  def pivotEvents(t: Tables): DataFrame = {
    val types = Seq("click", "view", "purchase", "signup", "error")
    val aggs = types.flatMap { ty =>
      Seq(
        count(when(col("event_type") === ty, 1)).as(s"n_$ty"),
        round(coalesce(sum(when(col("event_type") === ty, col("value"))), lit(0.0)), 2).as(s"v_$ty"))
    }
    t.events
      .groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("user_id"))
  }

  /** Exact interpolated quantiles via sort + rank selection (the scalable
    * alternative to Spark's `percentile` aggregate, which materializes a
    * value→count hashmap per group): one window sort per value column,
    * then only the two bracketing ranks per (group, q) feed the final
    * interpolation `v_lo + frac·(v_hi − v_lo)` — identical to
    * `quantile_cont`/Spark `percentile` semantics.
    */
  private def exactQuantiles(df: DataFrame, groupCol: String, valCol: String,
                             probs: Seq[(String, Double)]): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valCol))
    val ranked = df.select(col(groupCol), col(valCol))
      .withColumn("rn", row_number().over(w).cast("long"))
    val counts = ranked.groupBy(col(groupCol)).agg(max(col("rn")).as("n"))
    val joined = ranked.join(broadcast(counts), Seq(groupCol))
    val aggs = probs.flatMap { case (name, p) =>
      val pos = (col("n") - 1).cast("double") * p
      val lo = floor(pos).cast("long") + 1
      val hi = least(lo + 1, col("n"))
      val frac = pos - floor(pos)
      Seq(
        max(when(col("rn") === lo, col(valCol))).as(s"${name}_lo"),
        max(when(col("rn") === hi, col(valCol))).as(s"${name}_hi"),
        max(when(col("rn") === lo, frac)).as(s"${name}_frac"))
    }
    val out = probs.map { case (name, _) =>
      round(col(s"${name}_lo") +
        col(s"${name}_frac") * (col(s"${name}_hi") - col(s"${name}_lo")), 4).as(name)
    }
    joined
      .filter(probs.map { case (_, p) =>
        val pos = (col("n") - 1).cast("double") * p
        val lo = floor(pos).cast("long") + 1
        col("rn") === lo || col("rn") === least(lo + 1, col("n"))
      }.reduce(_ || _))
      .groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .select((col(groupCol) +: out): _*)
  }

  /** B10: exact interpolated percentiles per group (≡ DuckDB `quantile_cont`). */
  def percentiles(t: Tables): DataFrame = {
    val price = exactQuantiles(t.lineitem, "l_returnflag", "l_extendedprice",
      Seq("p50_price" -> 0.5, "p90_price" -> 0.9))
    val qty = exactQuantiles(t.lineitem, "l_returnflag", "l_quantity", Seq("p50_qty" -> 0.5))
    price.join(qty, Seq("l_returnflag")).orderBy(col("l_returnflag"))
  }

  /** B12: two-phase salted aggregation — the skew-mitigation pattern for
    * heavy-hitter keys at scale: partial sums over (key, salt) spread a hot
    * key across `salts` reducers, then a cheap final combine. Result is
    * identical to a direct groupBy (and oracle-checked against one).
    */
  def skewAgg(t: Tables, salts: Int = 16): DataFrame =
    t.events
      .withColumn("salt", pmod(col("event_id"), lit(salts.toLong)))
      .groupBy(col("event_type"), col("salt"))
      .agg(sum(col("value")).as("psum"), count(lit(1)).as("pn"))
      .groupBy(col("event_type"))
      .agg(round(sum(col("psum")), 2).as("total_value"), sum(col("pn")).as("n"))
      .orderBy(col("event_type"))

  /** B13: approximate aggregates for interactive 100 TB profiling — HLL
    * distinct counts and quantile sketches (single pass, mergeable, no
    * exact-distinct expand). Rows-only driver check; accuracy bounds are
    * asserted against exact values in AnalyticsSpec.
    */
  def approxStats(t: Tables): DataFrame =
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 1000)").as("pq"),
        count(lit(1)).as("n_rows"))
      // scalar columns only (the driver's rows-only compare can't hash arrays)
      .select(col("l_returnflag"), col("approx_orders"), col("approx_parts"),
        round(element_at(col("pq"), 1), 2).as("approx_p50_price"),
        round(element_at(col("pq"), 2), 2).as("approx_p90_price"),
        col("n_rows"))
      .orderBy(col("l_returnflag"))

  /** B11: non-equi range join against a broadcast band table. */
  def rangeJoin(t: Tables): DataFrame = {
    val spark = t.part.sparkSession
    import spark.implicits._
    val bands = Seq((0.0, 905.0, "low"), (905.0, 912.0, "mid"), (912.0, 1e9, "high"))
      .toDF("lo", "hi", "band")
    t.part
      .join(broadcast(bands), col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_parts"), round(avg(col("p_retailprice")), 4).as("avg_price"))
      .orderBy(col("band"))
  }
}

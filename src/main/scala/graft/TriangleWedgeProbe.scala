package graft

import org.apache.spark.sql.functions._

/** Dev-only: measures the ONE intermediate relation whose size decides
  * whether B23 `triangle_count` scales — the oriented-wedge stream. The
  * degree-ordered orientation claims wedges = Σ C(d⁺, 2) with d⁺ bounded
  * ~√m-ish, instead of the naive Σ C(d, 2) that a hub explodes. This
  * probe computes both sums from the EXACT oriented relation the
  * operator joins ([[operators.Analytics.coPurchaseOriented]]) so the
  * claim at Analytics.scala's B23 Scaladoc is a measured number, not an
  * argument.
  *
  * Prints one JSON line:
  *   {"sf":…,"n_nodes":…,"n_edges":…,"max_deg":…,"max_outdeg":…,
  *    "wedges_oriented":…,"wedges_naive":…,"ratio":…,"sec_probe":…}
  *
  * Usage: tools/run_main.sh graft.TriangleWedgeProbe <sfDir>
  */
object TriangleWedgeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)
    val t0 = System.nanoTime()
    val (e, deg, oriented) = operators.Analytics.coPurchaseOriented(t)
    val stats = deg.agg(
      count(lit(1)).as("n_nodes"),
      max(col("d")).as("max_deg"),
      sum(col("d") * (col("d") - 1) / 2).cast("long").as("wedges_naive")).collect().head
    val out = oriented.groupBy(col("src")).agg(count(lit(1)).as("od"))
      .agg(max(col("od")).as("max_outdeg"),
        sum(col("od") * (col("od") - 1) / 2).cast("long").as("wedges_oriented"))
      .collect().head
    val nEdges = e.count()
    val sec = (System.nanoTime() - t0) / 1e9
    val naive = stats.getLong(2)
    val orientedW = out.getLong(1)
    println(s"""{"sf":"$sfDir","n_nodes":${stats.getLong(0)},"n_edges":$nEdges,""" +
      s""""max_deg":${stats.getLong(1)},"max_outdeg":${out.getLong(0)},""" +
      s""""wedges_oriented":$orientedW,"wedges_naive":$naive,""" +
      s""""ratio":${"%.4f".format(orientedW.toDouble / math.max(naive, 1L))},""" +
      s""""sec_probe":${"%.3f".format(sec)}}""")
    spark.stop()
  }
}

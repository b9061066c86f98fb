package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HllBuffer
import graft.operators.TextAnalysis
import org.apache.spark.unsafe.types.UTF8String

/** C65/D3: HyperLogLog sketch — error bounds against exact distinct,
  * and the merge-invariance property that makes the aggregate safe
  * under any partitioning / AQE re-plan / task retry.
  */
class HllSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("local buffer: estimate within 3 sigma at 1k and 100k distinct") {
    for (n <- Seq(1000, 100000)) {
      val buf = new HllBuffer(12)
      (0 until n).foreach(i => buf.add(UTF8String.fromString(s"item-$i-x")))
      // duplicates must not move the estimate (idempotent add)
      (0 until n by 7).foreach(i => buf.add(UTF8String.fromString(s"item-$i-x")))
      val err = math.abs(buf.estimate - n).toDouble / n
      assert(err < 3 * 1.04 / math.sqrt(4096.0), s"n=$n est=${buf.estimate} err=$err")
    }
  }

  test("merge of split buffers equals the single-pass buffer exactly") {
    val whole = new HllBuffer(12)
    val parts = Array.fill(8)(new HllBuffer(12))
    (0 until 50000).foreach { i =>
      val s = UTF8String.fromString(s"k$i")
      whole.add(s)
      parts(i % 8).add(s)
    }
    val merged = new HllBuffer(12)
    parts.foreach(merged.mergeFrom)
    assert(java.util.Arrays.equals(merged.regs, whole.regs),
      "register-max merge reconstructs the single-pass registers bit-for-bit")
    assert(merged.estimate == whole.estimate)
  }

  test("ApproxDistinctRewrite: off by default (exact plan); flag rewrites count(DISTINCT) to the sketch") {
    import spark.implicits._
    val df = (0 until 30000).map(i => (s"k${i % 7919}", i % 3)).toDF("k", "g")
    df.createOrReplaceTempView("adr_t")
    val q = "SELECT g, count(DISTINCT k) AS d FROM adr_t GROUP BY g"
    def planOf = spark.sql(q).queryExecution.executedPlan.toString
    def result = spark.sql(q).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // default: exact — no sketch in the plan, exact distinct counts
    spark.conf.unset("spark.graft.approxDistinct")
    assert(!planOf.contains("graft_hll"), "no rewrite without the flag")
    val exact = result
    assert(exact.values.forall(_ > 2500), s"sanity: $exact")
    try {
      spark.conf.set("spark.graft.approxDistinct", "true")
      // SAME query text now plans the sketch: no Expand double-aggregate,
      // map-side partial_graft_hll
      val p = planOf
      assert(p.contains("graft_hll") && !p.contains("Expand"),
        s"flag rewrites to the sketch and drops the distinct Expand:\n$p")
      val approx = result
      exact.foreach { case (g, d) =>
        val err = math.abs(approx(g) - d).toDouble / d
        assert(err < 0.05, s"g=$g exact=$d approx=${approx(g)} err=$err")
      }
      // non-distinct counts and non-atomic children are untouched
      val other = spark.sql("SELECT count(k) FROM adr_t").queryExecution.executedPlan.toString
      assert(!other.contains("graft_hll"), "plain count stays exact")
      // numeric child rewrites through an injective string cast
      val num = spark.sql("SELECT count(DISTINCT g) FROM adr_t")
      assert(num.queryExecution.executedPlan.toString.contains("graft_hll"))
      assert(num.collect().head.getLong(0) == 3L, "tiny-cardinality sketch is exact")
    } finally spark.conf.unset("spark.graft.approxDistinct")
  }

  test("ApproxDistinctRewrite: timestamp child carries the session zone; bad p is a conf error") {
    import spark.implicits._
    val df = (0 until 5000).map(i => (i.toLong, new java.sql.Timestamp(1700000000000L + (i % 997) * 1000L)))
      .toDF("id", "ts")
    df.createOrReplaceTempView("adr_ts")
    try {
      spark.conf.set("spark.graft.approxDistinct", "true")
      // the injected Cast(ts -> string) is built post-analysis, so it must
      // carry the session zone itself — this executed-path check would
      // throw timeZoneId.get on None otherwise
      val got = spark.sql("SELECT count(DISTINCT ts) AS d FROM adr_ts").collect().head.getLong(0)
      assert(math.abs(got - 997L).toDouble / 997 < 0.05, s"ts distinct via sketch: $got")
      // malformed / out-of-range precision fails as a named conf error,
      // not a NumberFormatException inside the optimizer
      for (bad <- Seq("high", "25", "3")) {
        spark.conf.set("spark.graft.approxDistinct.p", bad)
        val e = intercept[org.apache.spark.sql.AnalysisException] {
          spark.sql("SELECT count(DISTINCT ts) FROM adr_ts").collect()
        }
        assert(e.getMessage.contains("spark.graft.approxDistinct.p"), s"'$bad': ${e.getMessage}")
      }
    } finally {
      spark.conf.unset("spark.graft.approxDistinct")
      spark.conf.unset("spark.graft.approxDistinct.p")
    }
  }

  test("small-m alpha: p=4..6 estimates stay inside 3 sigma with the paper constants") {
    // Flajolet alpha16/32/64 are exact-paper values; the asymptotic formula
    // would bias these registers-few sketches beyond the documented bound
    for ((p, n) <- Seq((4, 2000), (5, 4000), (6, 8000))) {
      val buf = new HllBuffer(p)
      (0 until n).foreach(i => buf.add(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"alpha-$p-$i")))
      val sigma = 1.04 / math.sqrt(1 << p)
      val err = math.abs(buf.estimate - n).toDouble / n
      assert(err < 3 * sigma, s"p=$p n=$n est=${buf.estimate} err=$err bound=${3 * sigma}")
    }
  }

  test("hllDistinct: partition-layout invariance and error vs exact on the corpus") {
    val t = Tables(spark, "/root/testdata/sf0.01")
    val est = TextAnalysis.hllDistinct(t).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // same data shuffled into a different layout -> identical estimates
    import org.apache.spark.sql.DataFrame
    val redocs: DataFrame = t.documents.repartition(17, col("doc_id"))
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    redocs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val est2 = TextAnalysis.hllDistinct(Tables(spark, dir)).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(est == est2, "estimate is a pure function of the value set, not the layout")
    // error bound vs exact distinct per source
    val exact = t.documents
      .select(col("source"), explode(split(trim(lower(col("text"))), "\\s+")).as("tk"))
      .filter(length(col("tk")) > 0)
      .groupBy(col("source")).agg(countDistinct(col("tk")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (src, d) =>
      val err = math.abs(est(src) - d).toDouble / d
      assert(err < 0.05, s"source=$src exact=$d est=${est(src)} err=$err")
    }
  }
}

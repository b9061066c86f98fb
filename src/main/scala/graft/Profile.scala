package graft

import org.apache.spark.sql.functions._

/** Dev-only micro-profiler for hot operators (not part of the library API). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    import graft.operators.Dedup
    val k = 3
    val shingleHash = "graft_shingle_hashes(text, 3)"

    time("tokenize only") {
      t.documents.select(expr("size(split(trim(lower(text)), '\\\\s+'))").as("n")).agg(sum("n")).collect()(0).getLong(0)
    }
    time("shingle hashes") {
      t.documents.select(expr(s"size($shingleHash)").as("n")).agg(sum("n")).collect()(0).getLong(0)
    }
    time("minhash bands expr") {
      t.documents.withColumn("hs", expr(shingleHash))
        .select(expr("size(graft_minhash_bands(hs, 8, 4))").as("n")).agg(sum("n")).collect()(0).getLong(0)
    }
    time("bands + explode") {
      t.documents.withColumn("hs", expr(shingleHash))
        .select(col("doc_id"), posexplode(expr("graft_minhash_bands(hs, 8, 4)")).as(Seq("band_idx", "band_hash")))
        .count()
    }
    time("full dedupMinhash") { Dedup.dedupMinhash(t).count() }
    time("full dedupSimhash") { Dedup.dedupSimhash(t).count() }
    time("full ngramJaccard") { Dedup.ngramJaccard(t).count() }

    import org.apache.spark.sql.expressions.Window
    val li = t.lineitem
    time("pct: scan 2 cols") {
      li.select(col("l_returnflag"), col("l_extendedprice")).agg(count(lit(1))).collect()(0).getLong(0)
    }
    time("pct: stack+bits+bucket") {
      li.select(col("l_returnflag").as("g"),
          expr("stack(2, 'p', l_extendedprice, 'q', l_quantity) AS (m, v)"))
        .withColumn("b", shiftright(expr("graft_sortable_bits(v)"), 44))
        .agg(count(col("b"))).collect()(0).getLong(0)
    }
    time("pct: bcounts agg") {
      li.select(col("l_returnflag").as("g"),
          expr("stack(2, 'p', l_extendedprice, 'q', l_quantity) AS (m, v)"))
        .withColumn("b", shiftright(expr("graft_sortable_bits(v)"), 44))
        .groupBy(col("g"), col("m"), col("b")).agg(count(lit(1))).count()
    }
    time("pct: window rank full") {
      val st = li.select(col("l_returnflag").as("g"),
          expr("stack(2, 'p', l_extendedprice, 'q', l_quantity) AS (m, v)"))
        .withColumn("b", shiftright(expr("graft_sortable_bits(v)"), 44))
      st.withColumn("rn", row_number().over(Window.partitionBy(col("g"), col("m"), col("b")).orderBy(col("v"))))
        .agg(max(col("rn"))).collect()(0).getInt(0).toLong
    }
    time("pct: full operator") { graft.operators.Analytics.percentiles(t).count() }
    time("pct: full op 2nd run") { graft.operators.Analytics.percentiles(t).count() }
    time("pct: full op noop") {
      graft.operators.Analytics.percentiles(t).write.mode("overwrite").format("noop").save(); 0L
    }
    time("pct: tables reload") {
      val t2 = Tables(spark, sfDir)
      graft.operators.Analytics.percentiles(t2).count()
    }
    time("pct: builtin percentile") {
      li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, array(0.5, 0.9))"), expr("percentile(l_quantity, 0.5)"))
        .count()
    }
    spark.stop()
  }
}

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
    spark.stop()
  }
}

package graft
object ProbeOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    SparkEntry.queries("jaccard_join_exact")(spark, "/tmp/sf1_r14")
      .write.mode("overwrite").format("noop").save()
    println(f"[probe] jaccard_join_exact sf1 (50k docs) cold: ${(System.nanoTime()-t0)/1e9}%.2f s")
    val t1 = System.nanoTime()
    SparkEntry.queries("jaccard_join_exact")(spark, "/tmp/sf1_r14")
      .write.mode("overwrite").format("noop").save()
    println(f"[probe] warm: ${(System.nanoTime()-t1)/1e9}%.2f s")
    spark.stop()
  }
}

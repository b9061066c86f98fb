package graft
/** Dev scratch harness: repeatedly run one declared query in a warm JVM
  * and print per-pass seconds — the isolation probe for separating a
  * query's steady-state compute from bench fixed costs.
  * Usage: ProbeOne <query> [sfDir] [passes]
  */
object ProbeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val passes = args.lift(2).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try Tables.register(spark, sfDir, db = "graft_bench")
    catch { case e: Throwable =>
      System.err.println(s"[probe] stats registration skipped: ${e.getMessage}")
    }
    // optional per-job breakdown (PROBE_JOBS=1): prints every job's wall
    // seconds so a multi-job query's fixed-cost structure is visible
    if (sys.env.contains("PROBE_JOBS")) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(js.jobId, (System.nanoTime(),
            Option(js.properties.getProperty("spark.job.description")).getOrElse("")))
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = starts.remove(je.jobId)
          if (s != null)
            println(f"[probe-job] job ${je.jobId}%3d ${(System.nanoTime() - s._1) / 1e9}%7.3f s  ${s._2}")
        }
      })
    }
    val fn = SparkEntry.queries(name)
    for (i <- 1 to passes) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"[probe] $name pass $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      try spark.catalog.clearCache() catch { case _: Throwable => }
      System.gc()
    }
    spark.stop()
  }
}

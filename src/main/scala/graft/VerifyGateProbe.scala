package graft

/** Dev-only: plan-shape check that the exact-Jaccard verify stage's
  * candidate-endpoint restriction engages exactly where the stats gate
  * says it should — present above [[operators.Dedup.verifyRestrictGate]]
  * (e.g. a ScaleGen sf3 corpus, 150k docs), absent below it (the sf0.1
  * driver corpus, 5k docs, where it measured as 1.85x pure overhead).
  *
  * Usage: tools/run_main.sh graft.VerifyGateProbe [bigDir] [smallDir]
  */
object VerifyGateProbe {
  def main(args: Array[String]): Unit = {
    val bigDir = args.lift(0).getOrElse("/tmp/sf3")
    val smallDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def hasSemi(dir: String): Boolean =
      operators.Dedup.ngramJaccard(Tables(spark, dir), threshold = 0.8)
        .queryExecution.optimizedPlan.toString.toLowerCase.contains("leftsemi")
    println(s"""{"probe":"verify_gate","big_dir":"$bigDir","big_restricts":${hasSemi(bigDir)},""" +
      s""""small_dir":"$smallDir","small_restricts":${hasSemi(smallDir)}}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Defaults target local[32] testing but are chosen to survive a real
  * cluster: AQE (runtime coalescing + skew-join splitting) stays on, UTC
  * session time zone for oracle parity, and shuffle partitions default to
  * the local core count rather than Spark's 200 (on a cluster, set
  * `spark.sql.shuffle.partitions` ≈ 2-3x total cores or rely on AQE
  * coalescing from a high initial value).
  */
object GraftSession {
  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is TIMESTAMP(NANOS) parquet; read as int64 nanos (exact,
      // and oracle-comparable via epoch_ns) instead of failing the scan.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // propagate catalog row-count statistics (ANALYZE TABLE) into plan
      // stats so self-sizing operators (Similarity.corpusRows) can answer
      // cardinality from metadata instead of a plan-build-time scan
      .config("spark.sql.cbo.planStats.enabled", "true")
      .config("spark.ui.enabled", "false")

  def getOrCreate(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

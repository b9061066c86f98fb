package graft

import org.apache.spark.sql.functions._

/** Dev-only: stage-level decomposition of the A14 sink's wall time over
  * the EdfScaleProbe 4 GiB fixture (reuses `<work>/probe_c.edf`).
  * Separates (1) source decode, (2) decode+route projection, (3) the
  * full shuffle+sort drain (the dump's exact physical plan minus file
  * writes), so sink_write regressions can be attributed to a stage
  * instead of guessed at. One JSON line per stage.
  *
  * Usage: tools/run_main.sh graft.SinkStageProbe [workDir]
  */
object SinkStageProbe {
  def main(args: Array[String]): Unit = {
    val work = args.lift(0).getOrElse("/tmp/edf_scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(name: String)(action: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = action
      println(s"""{"probe":"$name","sec":${(System.nanoTime() - t0) / 1e9},"rows":$n}""")
    }

    val slice = spark.read.format("edf").load(s"$work/probe_c.edf")
      .filter(col("channel").isin("ch000", "ch001", "ch002", "ch003"))

    time("scan_decode") {
      slice.agg(count(col("value"))).head().getLong(0)
    }

    val maxSamples = 4L << 20
    val partIdx = expr(s"sample_idx div ${maxSamples}L")
    val keys = slice
      .select(col("file"), col("channel"), partIdx.as("part"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted.zipWithIndex
    val keyDf = keys.toSeq.map { case ((f, c, p), i) => (f, c, p, i) }
      .toDF("file", "channel", "part_idx", "_bin_id")

    val routed = slice
      .select(col("file"), col("channel"), partIdx.as("part_idx"),
        col("sample_idx"), col("ts_us"), col("value"))
      .join(broadcast(keyDf), Seq("file", "channel", "part_idx"), "left")
      .select(col("_bin_id"), col("sample_idx"), col("ts_us"), col("value"))

    time("scan_route_project") {
      routed.agg(count(lit(1))).head().getLong(0)
    }

    def drain(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val counts = df.queryExecution.toRdd.mapPartitions { it =>
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator.single(n)
      }.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"""{"probe":"$name","sec":$sec,"rows":${counts.sum},""" +
        s""""partitions":${counts.length},"nonempty":${counts.count(_ > 0)},""" +
        s""""max_rows":${counts.max}}""")
    }

    val twoCol = routed.select(col("_bin_id"), col("sample_idx"), col("ts_us"), col("value"))
    drain("twocol_aqe")(twoCol
      .repartition(col("_bin_id"))
      .sortWithinPartitions(col("_bin_id"), col("sample_idx")))
    // r17 record-packed path, stage by stage: pack only (map side, no
    // exchange, routing + discovery resolved inside the pack loop), then
    // the full packed shuffle+sort — block cardinality
    val sevenCol = slice.select(col("file"), col("channel"),
      col("sample_idx"), col("ts_us"), col("value"), col("rate"), col("unit"))
    drain("pack_only")(graft.sources.EdfSink.packedBlocksProbe(sevenCol, maxSamples))
    drain("packed_drain")(graft.sources.EdfSink.packedDumpProbe(sevenCol, maxSamples))
    drain("twocol_aqe_again")(twoCol
      .repartition(col("_bin_id"))
      .sortWithinPartitions(col("_bin_id"), col("sample_idx")))
    spark.stop()
  }
}

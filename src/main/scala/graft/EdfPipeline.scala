package graft

import org.apache.spark.sql.SparkSession
import graft.sources.{EdfFile, EdfSink}

/** The reference processor's end-to-end task as one composed pipeline
  * (reference: processor/edf_processor/processor.py:10-69): read EDF
  * file(s) → calibrated, timestamped samples → per-channel binary dumps +
  * channel JSON manifests with gap-derived contiguous chunks.
  *
  * A user of Pennsieve/processor-EDF runs `EdfPipeline.process(spark,
  * files, outDir)` and gets the same output contract, computed
  * distributively: header-only planning on the driver, record-range
  * parallel parsing, one shuffle to group channels for the sink.
  */
object EdfPipeline {

  /** Process EDF files into the reference output contract; returns the
    * manifest path. `mode = "append"` merges into an existing output —
    * the reference's multi-run workflow (`inputs['mode']`,
    * base.py:131-133): channels fuzzy-matched by name/type/rate get
    * their new session appended; the rest are created.
    */
  def process(spark: SparkSession, files: Seq[String], outDir: String,
              mode: String = "overwrite"): String = {
    // land-time indexing: EDF+D inputs get their onset sidecar written as
    // part of processing (the reference processor materializes outputs at
    // process time), so later time-bounded reads prune at PLANNING without
    // any operator remembering to index first
    graft.sources.EdfOnsetIndex.ensure(spark, files)
    val samples = EdfFile.read(spark, files)
    EdfSink.write(samples, outDir, mode = mode)
  }

  /** CLI: runMain graft.EdfPipeline [--append] <out_dir> <file.edf> [more.edf...] */
  def main(args: Array[String]): Unit = {
    val mode = if (args.contains("--append")) "append" else "overwrite"
    val rest = args.filterNot(_ == "--append")
    require(rest.length >= 2, "usage: EdfPipeline [--append] <out_dir> <file.edf> [more...]")
    val spark = GraftSession.getOrCreate()
    val manifest = process(spark, rest.drop(1).toSeq, rest(0), mode)
    println(s"[edf-pipeline] wrote $manifest")
    spark.stop()
  }
}

package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pipeline composition (the reference processor's task). */
class EdfPipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("process() reproduces the reference output contract on test.edf") {
    val out = Files.createTempDirectory("edfpipe").toString
    val manifest = EdfPipeline.process(spark, Seq("/root/reference/sample_data/test.edf"), out)
    assert(Files.exists(Paths.get(manifest)))
    val json = new String(Files.readAllBytes(Paths.get(manifest)))
    // reference tests/params.py: 11 channels @200 Hz
    assert("\"name\"".r.findAllIn(json).size == 11)
    assert(json.contains("\"rate\": 200.0"))
    assert(json.contains("\"type\": \"CONTINUOUS\""))
    val bins = new java.io.File(out).listFiles().count(_.getName.endsWith(".ts.bin"))
    assert(bins == 11)
  }

  test("process() writes the EDF+D onset sidecar at land time; re-reads prune") {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("edfpiped")
    val path = s"$tmp/disc.edf"
    EdfDFixtures.makeEdfD(path, Seq(0.0, 10.0, 25.0))
    val out = Files.createTempDirectory("edfpipedout").toString
    EdfPipeline.process(spark, Seq(path), out)
    val side = Paths.get(graft.sources.EdfOnsetIndex.sidecarPath(path))
    assert(Files.exists(side), "sidecar materialized as part of processing")

    // a later time-bounded read prunes whole splits at PLANNING time
    val h = graft.sources.EdfFile.readHeader(path)
    val lo = h.startUs + 9000000L; val hi = h.startUs + 12000000L
    val sliced = spark.read.format("edf")
      .option("targetSplitBytes", h.recordBytes.toString).load(path)
      .filter(col("ts_us") >= lo && col("ts_us") < hi)
    assert(sliced.rdd.getNumPartitions == 1,
      "2 of 3 per-record splits dropped at plan time via the landed sidecar")
    assert(sliced.count() == 4, "middle record only, row-exact")
  }
}

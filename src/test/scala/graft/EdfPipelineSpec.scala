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
}

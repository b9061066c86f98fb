package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.EdfFile

/** A1/A2: EDF reader vs the reference's own sample files and test params
  * (reference tests/params.py: test.edf = 11 channels x 120000 samples
  * @200 Hz; sin_wave.edf = 2 channels x 12000 @800 Hz), plus a synthetic
  * EDF+D file exercising the discontiguous-timestamp path.
  */
class EdfFileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  val testEdf = "/root/reference/sample_data/test.edf"
  val sinEdf  = "/root/reference/sample_data/sin_wave.edf"

  test("header parse matches reference test params (test.edf)") {
    val h = EdfFile.readHeader(testEdf)
    assert(h.reserved == "EDF+C")
    assert(h.nbDataRec == 600)
    assert(h.duration == 1.0)
    assert(h.signals.size == 12)
    val data = h.signals.filterNot(_.isAnnotation)
    assert(data.size == 11)
    assert(data.forall(_.nrSamples == 200)) // 200 Hz at 1s records
  }

  test("channels() yields 11 rows at 200 Hz for test.edf") {
    val ch = EdfFile.channels(spark, Seq(testEdf)).collect()
    assert(ch.length == 11)
    assert(ch.forall(_.getAs[Double]("rate") == 200.0))
    assert(ch.forall(!_.getAs[Boolean]("discontiguous")))
  }

  test("read() parses sin_wave.edf: 2 channels x 12000 samples @800 Hz") {
    val df = EdfFile.read(spark, Seq(sinEdf)).cache()
    val perChannel = df.groupBy(col("channel")).agg(count(lit(1)).as("n")).collect()
    assert(perChannel.length == 2)
    assert(perChannel.forall(_.getAs[Long]("n") == 12000L))
    val rates = df.select(col("rate")).distinct().collect().map(_.getDouble(0))
    assert(rates.toSet == Set(800.0))
    // timestamps strictly increasing per channel with uniform 1250us step
    val steps = df.filter(col("channel_idx") === 0)
      .select(col("sample_idx"), col("ts_us")).orderBy(col("sample_idx")).limit(1000).collect()
    steps.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(1) - a.getLong(1) == 1250L, "800 Hz => 1250us period")
    }
    df.unpersist()
  }

  test("read() calibrates digital to physical range (test.edf)") {
    val h = EdfFile.readHeader(testEdf)
    val data = h.signals.filterNot(_.isAnnotation)
    val df = EdfFile.read(spark, Seq(testEdf))
    val mm = df.agg(min(col("value")), max(col("value"))).collect()(0)
    val lo = data.map(_.physMin).min
    val hi = data.map(_.physMax).max
    assert(mm.getDouble(0) >= lo - 1e-6 && mm.getDouble(1) <= hi + 1e-6,
      s"values [${mm.getDouble(0)}, ${mm.getDouble(1)}] within physical range [$lo, $hi]")
    assert(df.count() == 11L * 120000L)
  }

  test("record-range splits partition the read without overlap") {
    // force tiny splits: each record is its own split
    val h = EdfFile.readHeader(sinEdf)
    val df = EdfFile.read(spark, Seq(sinEdf), targetSplitBytes = h.recordBytes)
    assert(df.count() == 2L * 12000L)
    val dup = df.groupBy(col("channel_idx"), col("sample_idx")).count().filter(col("count") > 1).count()
    assert(dup == 0L, "no sample read twice across splits")
  }

  // --- synthetic EDF+D: 1 data signal (4 samples/record) + annotation signal,
  // 3 records at onsets 0s, 10s, 25s ---
  private def pad(s: String, n: Int): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.US_ASCII)
    require(b.length <= n, s"'$s' wider than $n")
    b ++ Array.fill(n - b.length)(' '.toByte)
  }

  private def makeEdfD(path: String, onsets: Seq[Double]): Unit = {
    val out = new ByteArrayOutputStream()
    val nSig = 2
    val annNr = 16 // 32 bytes of TAL per record
    out.write(pad("0", 8)); out.write(pad("patient", 80)); out.write(pad("rec", 80))
    out.write(pad("01.01.20", 8)); out.write(pad("00.00.00", 8))
    out.write(pad((256 + nSig * 256).toString, 8))
    out.write(pad("EDF+D", 44))
    out.write(pad(onsets.size.toString, 8)); out.write(pad("1", 8)); out.write(pad(nSig.toString, 4))
    // signal headers, column-major
    out.write(pad("sig1", 16)); out.write(pad("EDF Annotations", 16))
    out.write(pad("", 80)); out.write(pad("", 80))         // transducer
    out.write(pad("uV", 8)); out.write(pad("", 8))          // physDim
    out.write(pad("-100", 8)); out.write(pad("-1", 8))      // physMin
    out.write(pad("100", 8)); out.write(pad("1", 8))        // physMax
    out.write(pad("-32768", 8)); out.write(pad("-32768", 8))
    out.write(pad("32767", 8)); out.write(pad("32767", 8))
    out.write(pad("", 80)); out.write(pad("", 80))          // prefiltering
    out.write(pad("4", 8)); out.write(pad(annNr.toString, 8))
    out.write(pad("", 32)); out.write(pad("", 32))          // reserved
    onsets.zipWithIndex.foreach { case (onset, r) =>
      // data: 4 int16 LE samples = r*4 + i
      (0 until 4).foreach { i =>
        val v = r * 4 + i
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
      }
      val tal = "+" + onset + "\u0014\u0014\u0000"
      val talBytes = tal.getBytes(StandardCharsets.US_ASCII)
      out.write(talBytes ++ Array.fill(annNr * 2 - talBytes.length)(0.toByte))
    }
    val f = new FileOutputStream(path)
    try f.write(out.toByteArray) finally f.close()
  }

  test("EDF+D: per-record TAL onsets drive discontiguous timestamps") {
    val tmp = java.nio.file.Files.createTempDirectory("edfd").toString
    val path = s"$tmp/disc.edf"
    makeEdfD(path, Seq(0.0, 10.0, 25.0))
    val h = EdfFile.readHeader(path)
    assert(h.isDiscontiguous)
    val rows = EdfFile.read(spark, Seq(path))
      .orderBy(col("sample_idx")).collect()
    assert(rows.length == 12)
    val start = h.startUs
    // record onsets 0s,10s,25s; 4 samples per 1s record => 250000us step
    val expected = Seq(0L, 10000000L, 25000000L).flatMap(o => (0 until 4).map(i => start + o + i * 250000L))
    assert(rows.map(_.getAs[Long]("ts_us")).toSeq == expected)
    // gap between record 0 end and record 1 start is 9.25s, not 0.25s
    assert(rows(4).getAs[Long]("ts_us") - rows(3).getAs[Long]("ts_us") == 9250000L)
  }

  test("annotations() extracts TAL onsets") {
    val tmp = java.nio.file.Files.createTempDirectory("edfd2").toString
    val path = s"$tmp/disc2.edf"
    makeEdfD(path, Seq(0.0, 10.0))
    val ann = EdfFile.annotations(spark, Seq(path)).orderBy(col("record_idx")).collect()
    assert(ann.length == 2)
    assert(ann.map(_.getAs[Double]("onset_s")).toSeq == Seq(0.0, 10.0))
  }
}

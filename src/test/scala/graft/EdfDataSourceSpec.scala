package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.EdfFile

/** A1 via DataSource V2: format("edf") registration, split planning,
  * column pruning pushed into the scan.
  */
class EdfDataSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  val sinEdf = "/root/reference/sample_data/sin_wave.edf"

  test("format(\"edf\") reads the same rows as EdfFile.read") {
    val v2 = spark.read.format("edf").load(sinEdf)
    assert(v2.count() == 2L * 12000L)
    val a = v2.orderBy(col("channel_idx"), col("sample_idx"))
      .select(col("channel"), col("ts_us"), col("value")).limit(100).collect()
    val b = EdfFile.read(spark, Seq(sinEdf)).orderBy(col("channel_idx"), col("sample_idx"))
      .select(col("channel"), col("ts_us"), col("value")).limit(100).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("multi-path load survives commas in file names (JSON paths option)") {
    val tmp = java.nio.file.Files.createTempDirectory("edfcomma")
    val withComma = s"$tmp/night,1.edf"
    java.nio.file.Files.copy(java.nio.file.Paths.get(sinEdf), java.nio.file.Paths.get(withComma))
    val v2 = spark.read.format("edf").load(withComma, sinEdf)
    assert(v2.count() == 2L * 2L * 12000L, "both files read despite comma in one path")
  }

  test("user schema: compatible subset honored, incompatible rejected") {
    import org.apache.spark.sql.types._
    val sub = StructType(Seq(StructField("channel", StringType), StructField("ts_us", LongType)))
    val got = spark.read.schema(sub).format("edf").load(sinEdf)
    assert(got.schema.fieldNames.toSeq == Seq("channel", "ts_us"))
    assert(got.count() == 2L * 12000L)
    val badType = StructType(Seq(StructField("ts_us", StringType)))
    val e1 = intercept[Exception] { spark.read.schema(badType).format("edf").load(sinEdf) }
    assert(e1.getMessage.contains("ts_us"))
    val badName = StructType(Seq(StructField("nope", LongType)))
    val e2 = intercept[Exception] { spark.read.schema(badName).format("edf").load(sinEdf) }
    assert(e2.getMessage.contains("no column"))
  }

  test("column pruning reaches the EDF scan") {
    val v2 = spark.read.format("edf").load(sinEdf).select(col("channel"), col("ts_us"))
    val scanDesc = v2.queryExecution.executedPlan.toString
    assert(scanDesc.contains("columns=[channel,ts_us]"), s"pruned scan in:\n$scanDesc")
    // aggregate over metadata only — no value bytes needed
    val n = spark.read.format("edf").load(sinEdf)
      .groupBy(col("channel")).agg(count(lit(1)).as("n")).collect()
    assert(n.forall(_.getAs[Long]("n") == 12000L))
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

/** C16: deterministic stratified sampling — reproducible membership,
  * rates respected per stratum.
  */
class SamplingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def docs(n: Int): Tables = {
    import spark.implicits._
    val langs = Seq("en", "de", "es", "fr", "zh")
    val df = (0 until n).map(i => (i.toLong, s"text $i", langs(i % langs.length)))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("test")).withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("docs").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables(spark, dir)
  }

  test("sampling is deterministic and respects per-stratum rates") {
    val t = docs(2000)
    val a = Sampling.sampleStratified(t).collect()
    val b = Sampling.sampleStratified(t).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq, "identical sample across runs")
    val rates = Map("en" -> 500, "de" -> 300, "es" -> 200, "fr" -> 100, "zh" -> 50)
    a.foreach { r =>
      assert(r.getLong(2) < rates(r.getString(1)), "kept rows are under their stratum threshold")
    }
    // 400 docs per stratum; multiplicative-hash buckets are near-uniform,
    // so kept fraction tracks rate/1000 loosely
    val kept = a.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(kept("en") > kept("zh"), s"dominant stratum keeps more than the tail: $kept")
    assert(math.abs(kept("en") - 200) < 60, s"en ~ 400*0.5: $kept")
    assert(math.abs(kept("zh") - 20) < 20, s"zh ~ 400*0.05: $kept")
  }
}

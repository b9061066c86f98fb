package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** C39 embed_quantize tests: hand-computed affine codes on a tiny
  * corpus, the half-step reconstruction-error bound, constant-dimension
  * exactness, and range-extreme code saturation.
  */
class QuantizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def embeddings(rows: Seq[(Long, Seq[Float], Int)]): Tables = {
    import spark.implicits._
    val df = rows.toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("quant").toString
    df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Tables(spark, dir)
  }

  private def r8(x: Double): Double = math.floor(x * 1e8 + 0.5) / 1e8

  test("codes and mse match the hand-computed affine quantizer") {
    // dim0 range [0,2], dim1 range [-1,1], dim2 constant 5
    val rows = Seq(
      (1L, Seq(0.0f, -1.0f, 5.0f), 0),
      (2L, Seq(1.0f, 0.0f, 5.0f), 0),
      (3L, Seq(2.0f, 1.0f, 5.0f), 0))
    val t = embeddings(rows)
    val lo = Array(0.0, -1.0, 5.0); val hi = Array(2.0, 1.0, 5.0)
    def code(v: Double, d: Int): Int =
      if (hi(d) == lo(d)) 0
      else math.min(math.max(math.floor((v - lo(d)) / (hi(d) - lo(d)) * 255.0 + 0.5), 0.0), 255.0).toInt
    def recon(c: Int, d: Int): Double = lo(d) + c * (hi(d) - lo(d)) / 255.0
    val expected = rows.map { case (id, e, _) =>
      val cs = e.toArray.zipWithIndex.map { case (v, d) => code(v.toDouble, d) }
      val mse = e.toArray.zipWithIndex.map { case (v, d) =>
        val err = v.toDouble - recon(cs(d), d); err * err
      }.sum / e.size
      id -> ((cs(0), cs(1), cs(2), r8(mse)))
    }.toMap
    val got = Similarity.embedQuantize(t).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(5)))).toMap
    // columns: vec_id, code_0..code_3, mse — code_3 is null here (3 dims)
    assert(got == expected)
  }

  test("range extremes saturate to 0 and 255; constant dims reconstruct exactly") {
    val rows = Seq(
      (1L, Seq(-3.5f, 7.0f), 0),
      (2L, Seq(10.5f, 7.0f), 0))
    val t = embeddings(rows)
    val got = Similarity.embedQuantize(t).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(5)))).toMap
    assert(got(1L)._1 == 0 && got(2L)._1 == 255)
    assert(got(1L)._2 == 0 && got(2L)._2 == 0) // constant dim codes 0
    // constant dim reconstructs exactly and extremes are on-grid -> mse 0
    assert(got(1L)._3 == 0.0 && got(2L)._3 == 0.0)
  }

  test("reconstruction error is bounded by the half-step property per dimension") {
    val rng = new scala.util.Random(7)
    val rows = (0L until 50L).map(i => (i, Seq.fill(8)(rng.nextFloat() * 4f - 2f), 0))
    val t = embeddings(rows)
    // per-dim step = range/255; mse <= max over dims of (step/2)^2
    val byDim = (0 until 8).map(d => rows.map(_._2(d).toDouble))
    val maxSqHalfStep = byDim.map { vs =>
      val step = (vs.max - vs.min) / 255.0; (step / 2) * (step / 2)
    }.max
    Similarity.embedQuantize(t).collect().foreach { r =>
      assert(r.getDouble(5) <= maxSqHalfStep + 1e-12,
        s"vec ${r.getLong(0)} mse ${r.getDouble(5)} > bound $maxSqHalfStep")
    }
  }
}

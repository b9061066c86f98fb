package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** C18: k-means over PLANTED well-separated blobs — every blob must land
  * in one cluster, distinct blobs in distinct clusters, deterministically.
  */
class SimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def embeddings(rows: Seq[(Long, Seq[Float], String)]): Tables = {
    import spark.implicits._
    val df = rows.toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("emb").toString
    df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Tables(spark, dir)
  }

  test("kmeans separates planted blobs and is deterministic") {
    // three orthogonal-ish directions in 8-d, 20 jittered members each;
    // ids arranged so the deterministic init picks one seed per blob
    val dirs = Seq(
      Seq(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f),
      Seq(0f, 1f, 0f, 0f, 0f, 1f, 0f, 0f),
      Seq(0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f))
    val rows = for {
      blob <- 0 until 3
      i <- 0 until 20
    } yield {
      val jitter = dirs(blob).zipWithIndex.map { case (x, d) =>
        x + 0.05f * (((blob * 20 + i) * 31 + d) % 7 - 3)
      }
      ((i * 3 + blob).toLong, jitter, s"blob$blob")
    }
    val t = embeddings(rows)
    val got = Similarity.kmeans(t, k = 3, maxIter = 5).collect()
      .map(r => (r.getString(1), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    got.foreach { case (label, cells) =>
      assert(cells.size == 1, s"$label all in one cluster, got $cells")
    }
    assert(got.values.flatten.toSet.size == 3, s"three distinct clusters: $got")
    val again = Similarity.kmeans(t, k = 3, maxIter = 5).collect().map(_.getLong(2)).toSeq
    val first = Similarity.kmeans(t, k = 3, maxIter = 5).collect().map(_.getLong(2)).toSeq
    assert(again == first, "deterministic across runs")
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** C48 chunk_text tests: hand-computed windows/strides, full token
  * coverage with the documented overlap, boundary cases (doc shorter
  * than one window, exact-multiple lengths, empty docs).
  */
class ChunkSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def docs(rows: Seq[(Long, String)]): Tables = {
    import spark.implicits._
    val df = rows.map { case (id, s) => (id, s, "en", "web", s.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("chunk").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables(spark, dir)
  }

  test("hand-computed chunks at window 4 / stride 3") {
    // 10 tokens t0..t9 -> starts 0,3,6,9 -> [t0..t3][t3..t6][t6..t9][t9]
    val t = docs(Seq((1L, (0 until 10).map(i => s"t$i").mkString(" "))))
    val got = TextAnalysis.chunkText(t, window = 4, stride = 3).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 4L, "t0 t1 t2 t3"), (1L, 4L, "t3 t4 t5 t6"),
      (2L, 4L, "t6 t7 t8 t9"), (3L, 1L, "t9")))
  }

  test("every token is covered; overlap equals window - stride") {
    val n = 23
    val t = docs(Seq((1L, (0 until n).map(i => s"w$i").mkString(" "))))
    val chunks = TextAnalysis.chunkText(t, window = 8, stride = 5).collect()
      .map(r => (r.getLong(1), r.getString(3).split(" ").toSeq)).sortBy(_._1)
    val covered = chunks.flatMap(_._2).toSet
    assert(covered == (0 until n).map(i => s"w$i").toSet)
    // consecutive full chunks overlap by exactly 3 tokens
    chunks.sliding(2).foreach { case Array((_, a), (_, b)) =>
      if (a.size == 8) assert(a.toSet.intersect(b.toSet).size == math.min(3, b.size))
    case _ => }
  }

  test("boundaries: shorter than a window, exact multiple, empty") {
    val t = docs(Seq(
      (1L, "a b"),                                  // < window -> 1 short chunk
      (2L, (0 until 6).map("x" + _).mkString(" ")), // n == 2*stride: starts 0,3
      (3L, "")))                                    // empty -> no chunks
    val got = TextAnalysis.chunkText(t, window = 3, stride = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    assert(got.toSeq == Seq((1L, 0L, 2L), (2L, 0L, 3L), (2L, 1L, 3L)))
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** C46 pmi_top tests: hand-computed PMI on a planted corpus where one
  * pair always co-occurs (collocation) and another is frequent but
  * incidental, plus the min-count floor.
  */
class PmiSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def docs(rows: Seq[(Long, String)]): Tables = {
    import spark.implicits._
    val df = rows.map { case (id, s) => (id, s, "en", "web", s.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("pmi").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables(spark, dir)
  }

  private def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  test("collocation outranks an equally frequent incidental pair, PMI hand-checked") {
    // "new york" always adjacent (6x); "the cat/dog/sun..." = "the" pairs
    // with many different successors, so each "the X" pair has low PMI
    val rows = (0L until 6L).map(i => (i, s"new york w$i the t$i")) :+
      (6L, "the cat the dog the sun the cat")
    val t = docs(rows)
    val got = TextAnalysis.pmiTop(t, minCount = 2, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.contains(("new", "york")))
    val (cnt, cl, cr, pmi) = got(("new", "york"))
    assert(cnt == 6 && cl == 6 && cr == 6)
    // N = total pairs: 6 docs x 4 pairs + 1 doc x 7 pairs = 31
    val expected = r4(math.log((6.0 * 31) / (6.0 * 6)))
    assert(pmi == expected, s"pmi $pmi vs $expected")
    // "the cat" appears 2x but "the" is promiscuous (cl = 8): lower PMI
    val theCat = got(("the", "cat"))
    assert(theCat._4 < pmi, s"incidental pair ${theCat._4} should rank below $pmi")
  }

  test("min-count floor drops singletons; marginals still count them") {
    val t = docs(Seq((0L, "a b a b c d")))
    // pairs: (a,b)x2, (b,a), (b,c), (c,d) — only (a,b) meets minCount 2
    val got = TextAnalysis.pmiTop(t, minCount = 2, k = 10).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    // cl(a) = 2, cr(b) = 2, N = 5 — the dropped singletons still feed marginals
    assert(r.getLong(2) == 2 && r.getLong(3) == 2 && r.getLong(4) == 2)
    assert(r.getDouble(5) == r4(math.log((2.0 * 5) / (2.0 * 2))))
  }
}

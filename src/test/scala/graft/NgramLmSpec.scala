package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** C37/C37b bigram-LM tests: hand-computed probabilities on tiny
  * corpora, OOV mapping against a forced-small vocabulary, boundary-tie
  * determinism, the BOS corner with a literal '<s>' token, and the
  * n_bigrams == token-count invariant against C10.
  */
class NgramLmSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def docs(rows: Seq[(Long, String)]): Tables = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("test"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("lmdocs").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables(spark, dir)
  }

  private def r3(x: Double): Double = math.floor(x * 1000.0 + 0.5) / 1000.0
  private def r2(x: Double): Double = math.floor(x * 100.0 + 0.5) / 100.0

  test("ngram_lm matches hand-computed bigram counts and add-k log-probs") {
    val t = docs(Seq((1L, "a b a"), (2L, "b a")))
    // pairs: d1 (<s>,a)(a,b)(b,a); d2 (<s>,b)(b,a)
    val got = TextAnalysis.ngramLm(t).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(got.size == 4)
    val denomUnit = 0.5 * 257 // k * (V+1), V = 256
    def lp(cnt: Long, ctx: Long): Double = r3(math.log((cnt + 0.5) / (ctx + denomUnit)))
    assert(got(("<s>", "a")) == ((1L, 2L, lp(1, 2))))
    assert(got(("<s>", "b")) == ((1L, 2L, lp(1, 2))))
    assert(got(("a", "b")) == ((1L, 1L, lp(1, 1))))
    assert(got(("b", "a")) == ((2L, 2L, lp(2, 2))))
  }

  test("lm_score: avg log-prob and perplexity from the same model, per doc") {
    val t = docs(Seq((1L, "a b a"), (2L, "b a")))
    val got = TextAnalysis.lmScore(t).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    def raw(cnt: Long, ctx: Long): Double = math.log((cnt + 0.5) / (ctx + 128.5))
    val d1 = (raw(1, 2) + raw(1, 1) + raw(2, 2)) / 3.0
    val d2 = (raw(1, 2) + raw(2, 2)) / 2.0
    assert(got(1L) == ((3L, r3(d1), r2(math.exp(-d1)))), s"doc1: ${got(1L)}")
    assert(got(2L) == ((2L, r3(d2), r2(math.exp(-d2)))), s"doc2: ${got(2L)}")
  }

  test("tokens outside the top-V vocabulary map to <unk> before pairing") {
    val t = docs(Seq((1L, "a a b"), (2L, "a c b")))
    // counts a:3 b:2 c:1 -> vocab(2) = {a, b}; c -> <unk>
    val got = TextAnalysis.ngramLm(t, vocabSize = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("<s>", "a") -> 2L, ("a", "a") -> 1L, ("a", "b") -> 1L,
      ("a", "<unk>") -> 1L, ("<unk>", "b") -> 1L))
  }

  test("vocabulary boundary ties break by token, deterministically") {
    val t = docs(Seq((1L, "b a")))
    // counts a:1 b:1 tie at vocabSize=1 -> vocab = {a} (token asc)
    val got = TextAnalysis.ngramLm(t, vocabSize = 1).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("<s>", "<unk>") -> 1L, ("<unk>", "a") -> 1L))
  }

  test("a literal '<s>' token in the text goes through vocabulary mapping") {
    // counts x:2 <s>:1 -> vocab(1) = {x}; the REAL '<s>' token is OOV ->
    // '<unk>', while the injected begin marker stays literal '<s>'
    val t = docs(Seq((1L, "x <s> x")))
    val got = TextAnalysis.ngramLm(t, vocabSize = 1).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("<s>", "x") -> 1L, ("x", "<unk>") -> 1L, ("<unk>", "x") -> 1L))
    // and when it IS in vocabulary, it keeps its surface form: the model
    // cannot tell it from the begin marker (documented collapse corner)
    val t2 = docs(Seq((1L, "<s> <s>")))
    val got2 = TextAnalysis.ngramLm(t2, vocabSize = 4).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got2 == Map(("<s>", "<s>") -> ((2L, 2L))))
  }

  test("n_bigrams equals the whitespace token count; empty docs drop") {
    val t = docs(Seq(
      (1L, "one two three four"), (2L, "solo"), (3L, ""), (4L, "   "),
      (5L, "  padded   tokens  ")))
    val score = TextAnalysis.lmScore(t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(score == Map(1L -> 4L, 2L -> 1L, 5L -> 2L))
    // cross-operator invariant vs C10: one bigram per token (BOS pairs
    // the first token), zero for whitespace-only docs
    val tc = TextAnalysis.tokenCount(t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(score.forall { case (id, n) => tc(id) == n })
    // total bigram mass == total tokens
    val mass = TextAnalysis.ngramLm(t).agg(sum("cnt")).collect()(0).getLong(0)
    assert(mass == 7L)
  }

  test("pplBucket: per-language quantile cutoffs match the closed form; bands monotone in ppl") {
    import spark.implicits._
    // two langs with very different fluency mixes; repeated phrases give
    // low ppl, one-off token soup gives high ppl
    val rows = (0 until 30).map { i =>
      val (lang, text) =
        if (i < 15) ("en", if (i % 3 == 0) "a b a b a b" else s"tok$i x$i y$i z$i")
        else ("de", if (i % 3 == 0) "c d c d c d" else s"w$i v$i u$i t$i")
      (i.toLong, text, lang)
    }
    val df = rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("test")).withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("lmdocs").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.pplBucket(Tables(spark, dir), nBands = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(got.length == 30, "every scoreable doc banded")
    assert(got.forall(r => r._4 >= 0 && r._4 < 3), "bands in range")
    // reference: recompute cutoffs per lang from the ppl values alone
    got.groupBy(_._2).foreach { case (lang, rs) =>
      val sorted = rs.map(_._3).sorted
      val n = sorted.length.toLong
      val cuts = (1 until 3).map { i =>
        val target = ((i * n + 2) / 3).toInt
        sorted(target - 1)
      }.distinct
      rs.foreach { case (id, _, ppl, band) =>
        val want = cuts.count(c => ppl > c).toLong
        assert(band == want, s"$lang doc $id: ppl $ppl -> band $band, want $want")
      }
      // monotone: lower ppl never lands in a higher band
      val byPpl = rs.sortBy(_._3)
      byPpl.zip(byPpl.tail).foreach { case (a, b) =>
        assert(a._4 <= b._4, s"$lang: ppl ${a._3} band ${a._4} vs ppl ${b._3} band ${b._4}")
      }
    }
    // per-language independence: en and de cutoffs derive from their own
    // distributions, so the low-ppl repeated-phrase docs land in band 0
    // in BOTH langs even though their absolute ppl values differ
    val low = got.filter(r => r._1 % 3 == 0)
    assert(low.forall(_._4 == 0L), s"repeated-phrase docs are the per-lang head: ${low.toSeq}")
    // degenerate-corpus gate: with the limit(gate+1) ordering the loud
    // failure path materializes O(gate) rows, never O(distinct), and
    // still names the remedy
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.pplBucket(Tables(spark, dir), nBands = 3, maxDistinct = 2L)
    }
    assert(e.getMessage.contains("coarsen the ppl rounding"), e.getMessage)
  }
}

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

  test("sequence packing reproduces the sequential concat-then-chunk layout") {
    import spark.implicits._
    // doc i has i+1 tokens; pack with seqLen=10 and a bucket size (3) that
    // forces MANY buckets so cross-bucket offsets are actually exercised
    val df = (0 until 20).map(i => (i.toLong, (0 to i).map(_ => "w").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("test")).withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("docs").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Sampling.packSequences(Tables(spark, dir), seqLen = 10, bucketSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // sequential reference: running prefix of (1, 2, ..., 20)
    var prev = 0L
    got.sortBy(_._1).foreach { case (id, n, seqId, off) =>
      assert(n == id + 1, s"doc $id token count")
      assert(seqId == prev / 10, s"doc $id seq_id: got $seqId, want ${prev / 10}")
      assert(off == prev % 10, s"doc $id offset: got $off, want ${prev % 10}")
      prev += n
    }
  }

  test("mix_apply materializes the plan's per-stratum fractions") {
    val t = docs(2000)  // 400 docs x 5 langs, doc i has 2 tokens each
    val got = Sampling.mixApply(t).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // equal availability per stratum -> budget = min(avail/weight) is set
    // by the largest weight (en, 0.4): rate_en = 1.0, others = w/0.4
    val kept = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(kept("en") == 400, s"binding stratum keeps everything: $kept")
    assert(math.abs(kept("de") - 200) < 50, s"de ~ 400*(0.2/0.4): $kept")
    assert(math.abs(kept("zh") - 100) < 30, s"zh ~ 400*(0.1/0.4): $kept")
    val again = Sampling.mixApply(t).collect().map(_.getLong(0)).toSeq
    assert(again == got.map(_._1).toSeq, "deterministic sample")
  }

  test("corpus shuffle is a deterministic permutation with contiguous ranks") {
    val t = docs(500)
    val a = Sampling.corpusShuffle(t).collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = Sampling.corpusShuffle(t).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq == b.toSeq, "identical permutation across runs")
    assert(a.map(_._1).toSeq == (1L to 500L), "ranks are exactly 1..n")
    assert(a.map(_._2).sorted.toSeq == (0L until 500L), "every doc appears exactly once")
    // multiplicative hashing actually permutes: the identity order would
    // keep doc_id monotone in rank
    assert(a.map(_._2).toSeq != (0L until 500L).toSeq, "order differs from doc_id order")
  }

  test("source cap keeps exactly cap docs per source, ranked by the id hash") {
    import spark.implicits._
    val df = (0 until 300).map(i => (i.toLong, s"text $i", "en", s"src${i % 3}"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("docs").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val t = Tables(spark, dir)

    val got = Sampling.sourceCap(t, cap = 7).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.groupBy(_._1).forall(_._2.length == 7), "exactly cap kept per source")
    // parity with the window formulation the oracle states: row_number()
    // over (partition by source order by hash, doc_id) <= cap
    val P = 1000000007L
    val want = (0 until 300).map { i =>
      (s"src${i % 3}", i.toLong, ((i.toLong % P + P) % P * 2654435761L) % P)
    }.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.sortBy(r => (r._3, r._2)).take(7).zipWithIndex
        .map { case ((s, id, h), idx) => (s, idx + 1L, id, h) }
    }.toSet
    assert(got.toSet == want, "heap-aggregate path == window-rank definition")
    // cap above group size degrades to identity membership
    assert(Sampling.sourceCap(t, cap = 1000).count() == 300L)
  }

  test("curriculumBands: exact quantile cutoffs, value-determined ties, degenerate corpus") {
    import spark.implicits._
    def tab(tokens: Seq[Int]): Tables = {
      val df = tokens.zipWithIndex.map { case (n, i) =>
        (i.toLong, (1 to n).map(_ => "w").mkString(" "), "en")
      }.toDF("doc_id", "text", "lang")
        .withColumn("source", lit("test")).withColumn("n_chars", length(col("text")))
      val dir = java.nio.file.Files.createTempDirectory("docs").toString
      df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      Tables(spark, dir)
    }
    // 12 docs with 1..12 tokens, 4 bands: cutoffs at ceil(12i/4) = scores
    // 3/6/9, band = #cutoffs strictly below the score
    val got = Sampling.curriculumBands(tab(1 to 12), nBands = 4)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    (1 to 12).foreach { s =>
      val want = Seq(3, 6, 9).count(c => s > c)
      assert(got(s.toLong) == want.toLong, s"score $s -> band ${got(s.toLong)}, want $want")
    }
    // all-equal scores: every cutoff is the same value, distinct collapses
    // them, and no score exceeds it -> everyone in band 0
    val flat = Sampling.curriculumBands(tab(Seq.fill(9)(5)), nBands = 4).collect()
    assert(flat.forall(_.getLong(2) == 0L), "degenerate corpus lands in one band")
    // distinct-score gate names the remedy
    val e = intercept[IllegalArgumentException] {
      Sampling.curriculumBands(tab(1 to 50), nBands = 4, maxDistinct = 10L)
    }
    assert(e.getMessage.contains("bucket the score"), e.getMessage)
  }

  private def srcDocs(rows: Seq[(Long, String, String)]): Tables = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("docs").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables(spark, dir)
  }

  test("budgetSelect: quality-first admission, prefix rule with overshoot, per-source budgets") {
    // source A qualities strictly ordered: all-stopword > some-stopword > none
    val t = srcDocs(Seq(
      (1L, "the a of and to in is it the a", "A"), // 10 tokens, highest quality
      (2L, "the cat sat on mat", "A"),             //  5 tokens, middle
      (3L, "zz!!! yy!!!", "A"),                    //  2 tokens, lowest
      // source B: three IDENTICAL docs (one quality band) -> the prefix
      // rule resolves the boundary inside the band by doc_id
      (4L, "the same four tokens", "B"),
      (5L, "the same four tokens", "B"),
      (6L, "the same four tokens", "B")))
    val got = Sampling.budgetSelect(t, budgetTokens = 9L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    // A: doc1 cum_before=0 < 9 (admits, overshoots to 10); doc2 cum=10 >= 9; doc3 cum=15 >= 9
    assert(got(1L) && !got(2L) && !got(3L), s"quality-first prefix rule: $got")
    // B: 4-token ties resolve by doc_id: cum_before 0, 4, 8 all < 9
    val b = Seq(4L, 5L, 6L).map(got)
    assert(b == Seq(true, true, true), s"cum_before 0/4/8 all < 9 -> all admitted: $b")
    val got6 = Sampling.budgetSelect(t, budgetTokens = 8L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    val b6 = Seq(4L, 5L, 6L).map(got6)
    assert(b6 == Seq(true, true, false), s"budget 8: cum_before 8 is not < 8 -> third rejected: $b6")
  }

  test("budgetSelect: schema, total coverage, and determinism across runs") {
    val t = srcDocs((0 until 40).map(i =>
      (i.toLong, Seq.fill(i % 7 + 1)("word").mkString(" "), s"s${i % 3}")))
    val a = Sampling.budgetSelect(t, budgetTokens = 10L).orderBy("doc_id").collect()
    val b = Sampling.budgetSelect(t, budgetTokens = 10L).orderBy("doc_id").collect()
    assert(a.length == 40, "every doc appears exactly once with a verdict")
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "value-based admission is run-stable")
    // per-source admitted token totals stay within budget + one overshoot doc
    val bySrc = a.filter(_.getBoolean(4)).groupBy(_.getString(1))
    bySrc.foreach { case (s, rows) =>
      val toks = rows.map(_.getLong(2))
      assert(toks.sum - toks.max < 10L, s"$s: all but the overshoot doc fit the budget")
    }
  }

  test("sampleWeighted: exact A-ES key formula, weight dominance, run determinism") {
    import spark.implicits._
    // 500 heavy docs (10000 chars) vs 500 light (10 chars): the exponential
    // race must hand the top-200 overwhelmingly to the ~1000x heavier docs
    val df = (0 until 1000).map { i =>
      val heavy = i < 500
      (i.toLong, if (heavy) "h" * 10000 else "l" * 10, "en")
    }.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("test")).withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("docs").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val t = Tables(spark, dir)
    val got = Sampling.sampleWeighted(t, k = 200).collect()
    assert(got.length == 200)
    val heavyCount = got.count(_.getLong(0) < 500L)
    assert(heavyCount >= 190, s"~1000x weights must dominate the draw: $heavyCount/200 heavy")
    // the key is the documented closed form of (doc_id, weight) — checked
    // against an independent scalar computation for every selected row
    val P = 1000000007L
    got.foreach { r =>
      val (id, w) = (r.getLong(0), r.getLong(2))
      val u = (((id % P + P) % P * 2654435761L) % P).toDouble + 0.5
      val key = -math.log(u / P.toDouble) / w.toDouble
      val expect = math.floor(key * 1e9 + 0.5) / 1e9
      assert(r.getDouble(3) == expect, s"key formula for doc $id: ${r.getDouble(3)} vs $expect")
    }
    // reproducible across runs (hash-derived u, never rand())
    val again = Sampling.sampleWeighted(t, k = 200).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq, "deterministic rerun")
  }
}

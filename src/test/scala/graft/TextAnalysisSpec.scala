package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** C13/C15 behavioral tests with PLANTED text (the synthetic corpus has
  * no PII and word-soup repetition): exact expected counts and ratios.
  */
class TextAnalysisSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def docs(rows: Seq[(Long, String)]): Tables = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("test"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("docs").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables(spark, dir)
  }

  test("normalizeText: NFC composition, control strip, whitespace collapse, identity fast path") {
    val t = docs(Seq(
      (1L, "cafe\u0301 menu"),                // e + combining acute -> precomposed
      (2L, "a\u0000\u0007bc\u007Fd"),          // C0/DEL controls stripped
      (3L, "  spaced\t\tout\n\nlines  "),      // runs collapse, ends trim
      (4L, "already normal"),                  // byte-identical fast path
      (5L, "\u212B vs \u00C5")))               // ANGSTROM SIGN composes to ARING
    val got = TextAnalysis.normalizeText(t)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2), r.getLong(3))).toMap
    assert(got(1L) == (("caf\u00E9 menu", true, 9L)), s"NFC composes: ${got(1L)}")
    assert(got(2L) == (("abcd", true, 4L)), s"controls stripped: ${got(2L)}")
    assert(got(3L) == (("spaced out lines", true, 16L)), s"whitespace: ${got(3L)}")
    assert(got(4L) == (("already normal", false, 14L)), s"identity: ${got(4L)}")
    assert(got(5L) == (("\u00C5 vs \u00C5", true, 6L)), s"singleton composition: ${got(5L)}")
  }

  test("bm25 matches the hand-computed Okapi formula on a tiny corpus") {
    val t = docs(Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "dog")))
    val got = TextAnalysis.bm25Search(t, query = "apple banana", k = 10).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // N=3, dl = (3, 2, 1), avgdl = 2.0; df(apple)=1, df(banana)=2
    val (k1, b) = (1.2, 0.75)
    def w(tf: Long, df: Long, dl: Long): Double =
      math.log(1.0 + (3L - df + 0.5) / (df + 0.5)) * (tf * (k1 + 1.0)) /
        (tf + k1 * (1.0 - b + b * dl / 2.0))
    def r4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0
    assert(got(1L) == ((2L, r4(w(2, 1, 3) + w(1, 2, 3)))), s"doc1: ${got(1L)}")
    assert(got(2L) == ((1L, r4(w(1, 2, 2)))), s"doc2: ${got(2L)}")
    assert(!got.contains(3L), "doc with no query terms never scores")
    // ranking: doc1 matches both terms incl. the rarer one -> ranks first
    val ranked = TextAnalysis.bm25Search(t, query = "apple banana", k = 1).collect()
    assert(ranked.head.getLong(0) == 1L, "best match wins the top slot")
  }

  test("pii counts find planted email, url and phone; clean text is clean") {
    val t = docs(Seq(
      (1L, "contact alice@example.com or visit https://example.org/page and call 555-123-4567"),
      (2L, "a perfectly clean sentence with no contact details at all")))
    val got = TextAnalysis.piiCount(t).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got(1L) == ((1L, 1L, 1L, true)), s"planted PII counted once each: ${got(1L)}")
    assert(got(2L) == ((0L, 0L, 0L, false)), "clean doc has zero counts")
  }

  test("decontaminate flags docs sharing a benchmark 5-gram, not clean docs") {
    val benchSentence = "the capital of france is paris and everyone knows it"
    val t = docs(Seq(
      (1L, benchSentence),                                                  // benchmark doc
      (30L, s"some leaked training text says $benchSentence quite verbatim"), // contaminated
      (31L, "a perfectly original document with entirely novel phrasing throughout")))
    val got = TextAnalysis.decontaminate(t, benchMaxId = 25L, k = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.contains(30L) && got(30L) >= 6L, s"verbatim overlap flagged: $got")
    assert(!got.contains(31L), "clean doc untouched")
  }

  test("bloom-prefiltered decontamination is exact (identical to the broadcast path)") {
    val benchSentence = "the capital of france is paris and everyone knows it"
    val t = docs(Seq(
      (1L, benchSentence),
      (30L, s"some leaked training text says $benchSentence quite verbatim"),
      (31L, "a perfectly original document with entirely novel phrasing throughout")))
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = toMap(TextAnalysis.decontaminate(t, benchMaxId = 25L, k = 5))
    val bloom = toMap(TextAnalysis.decontaminateBloom(t, benchMaxId = 25L, k = 5))
    assert(bloom == exact, s"bloom path exact: $bloom vs $exact")
    assert(bloom.contains(30L) && !bloom.contains(31L))
  }

  test("pii redact replaces spans with typed placeholders in URL-first order") {
    val t = docs(Seq(
      (1L, "mail alice@example.com or see https://a.example/x?u=bob@example.com then call 555-123-4567"),
      (2L, "nothing sensitive here at all")))
    val got = TextAnalysis.piiRedact(t).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // the email inside the URL redacts as part of the URL, not separately
    assert(got(1L)._1 == "mail [EMAIL] or see [URL] then call [PHONE]", s"redacted: ${got(1L)._1}")
    assert((got(1L)._2, got(1L)._3, got(1L)._4) == ((1L, 1L, 1L)),
      s"one placeholder per kind: ${got(1L)}")
    assert(got(2L) == (("nothing sensitive here at all", 0L, 0L, 0L)), "clean doc unchanged")
  }

  test("production phone forms: parenthesized, international, space-separated") {
    val t = docs(Seq(
      (1L, "office (555) 123-4567 ext 9"),
      (2L, "intl +1 555-123-4567 and also +44 123 456 7890 wait that last one is 3-3-4-4"),
      (3L, "spaced 555 123 4567 works"),
      (4L, "dotted 555.123.4567 still works"),
      (5L, "not a phone: 12-34-56 or 1234567890 or (55) 12-34")))
    val redacted = TextAnalysis.piiRedact(t).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(4))).toMap
    assert(redacted(1L)._1 == "office [PHONE] ext 9", s"paren area code: ${redacted(1L)._1}")
    assert(redacted(1L)._2 == 1L)
    assert(redacted(2L)._1.startsWith("intl [PHONE] and also [PHONE]"),
      s"international prefixes redact whole: ${redacted(2L)._1}")
    assert(redacted(2L)._2 == 2L)
    assert(redacted(3L)._1 == "spaced [PHONE] works", s"space-separated: ${redacted(3L)._1}")
    assert(redacted(4L)._1 == "dotted [PHONE] still works", s"dot-separated: ${redacted(4L)._1}")
    assert(redacted(5L)._1 == "not a phone: 12-34-56 or 1234567890 or (55) 12-34",
      s"non-phone shapes untouched: ${redacted(5L)._1}")
    val counts = TextAnalysis.piiCount(t).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(counts == Map(1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 1L, 5L -> 0L),
      s"piiCount phone tallies stay in lockstep with redaction: $counts")
  }

  test("phone trailing boundary: a longer digit run is not a phone") {
    val t = docs(Seq(
      (1L, "order id 555.123.45678 is not a phone"),
      (2L, "call 555.123.4567 today"),
      (3L, "ends with 555-123-4567"),
      (4L, "adjacent 555-123-4567,555-123-4568 both count")))
    val red = TextAnalysis.piiRedact(t).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(4))).toMap
    // the ([^0-9]|$) guard rejects the 10-digit prefix of a longer run
    assert(red(1L) == (("order id 555.123.45678 is not a phone", 0L)),
      s"digit run untouched: ${red(1L)}")
    // the consumed boundary char is restored by the $3 backreference
    assert(red(2L)._1 == "call [PHONE] today", s"mid-text boundary survives: ${red(2L)._1}")
    assert(red(3L)._1 == "ends with [PHONE]", s"end-of-text boundary: ${red(3L)._1}")
    assert(red(4L)._1 == "adjacent [PHONE],[PHONE] both count", s"adjacent: ${red(4L)._1}")
    val counts = TextAnalysis.piiCount(t).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(counts == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L),
      s"counts agree with redaction: $counts")
  }

  test("corpus_delta on an empty corpus fails with a clear message, not an NPE") {
    val t = docs(Seq.empty)
    val e = intercept[IllegalArgumentException] { TextAnalysis.corpusDelta(t) }
    assert(e.getMessage.contains("empty"), s"actionable message: ${e.getMessage}")
  }

  test("fuzzy decontamination catches a paraphrased leak exact k-grams can miss") {
    val benchSentence = "the quick brown fox jumps over the lazy dog every single morning " +
      "before breakfast is served in the garden by the caretaker"
    // paraphrase: a word swapped mid-sentence breaks many exact 5-grams
    // but leaves shingle-set Jaccard high
    val leaked = benchSentence.replace("lazy", "sleepy")
    val t = docs(Seq(
      (1L, benchSentence),                                             // benchmark doc
      (30L, leaked),                                                   // paraphrased leak
      (31L, "completely unrelated text about cooking pasta with fresh tomatoes and basil leaves")))
    val got = TextAnalysis.decontaminateFuzzy(t, benchMaxId = 25L, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.exists(p => p._1 == 30L && p._2 == 1L && p._3 >= 0.5),
      s"paraphrased leak flagged vs its benchmark source: ${got.toSeq}")
    assert(!got.exists(_._1 == 31L), "unrelated doc untouched")
  }

  test("corpusDelta classifies added / removed / changed / unchanged exactly") {
    import spark.implicits._
    val cur = Seq(
      (1L, "same text"), (2L, "new version"), (4L, "brand new doc")).toDF("doc_id", "text")
    val prev = Seq(
      (1L, "same text"), (2L, "old version"), (3L, "deleted doc")).toDF("doc_id", "text")
    val got = TextAnalysis.corpusDelta(cur, prev).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"),
      s"exact per-doc classification: $got")
  }

  test("gopher rules flag exactly the rule each pathological doc violates") {
    // 30 words, 27 distinct, all-alpha, mean word length 159/30 = 5.3, and the
    // ONLY stopwords present are "the"/"of" — so doc 4's THE/OF-stripped copy
    // fails stop_ok and nothing else.
    val goodWords = ("the quick brown fox jumped over the lazy dog while many curious " +
      "students observed careful notes about strange patterns of light shining across " +
      "distant hills during quiet evenings of autumn").split(" ").toSeq
    val t = docs(Seq(
      (1L, goodWords.mkString(" ")),                        // passes everything
      (2L, "the of short doc"),                             // too few words
      (3L, (0 until 30).map(_ => "a").mkString(" ")),       // mean word len < 3, repetitive
      (4L, goodWords.map(_.toUpperCase).filterNot(w => w == "THE" || w == "OF")
        .padTo(30, "cat").mkString(" ")),                   // no 2nd distinct stopword
      (5L, (0 until 30).map(i => s"${i}23456").mkString(" "))))  // numeric: alpha ratio 0
    val got = TextAnalysis.gopherRules(t).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(6), r.getBoolean(7), r.getBoolean(8),
        r.getBoolean(9), r.getBoolean(10), r.getBoolean(11))).toMap
    assert(got(1L) == ((true, true, true, true, true, true)), s"doc 1 passes: ${got(1L)}")
    assert(!got(2L)._1 && !got(2L)._6, s"doc 2 fails word count: ${got(2L)}")
    assert(!got(3L)._2 && !got(3L)._5 && !got(3L)._6, s"doc 3 fails word len + distinct: ${got(3L)}")
    assert(!got(4L)._3 && !got(4L)._6, s"doc 4 fails stopwords: ${got(4L)}")
    assert(!got(5L)._4 && !got(5L)._6, s"doc 5 fails alpha ratio: ${got(5L)}")
  }

  test("curate keeps a clean doc and drops on the signal that fails") {
    val clean = ("the quick brown fox jumped over the lazy dog while many curious " +
      "students observed careful notes about strange patterns of light shining across " +
      "distant hills during quiet evenings of autumn")  // gopher-clean, varied
    val t = docs(Seq(
      (1L, clean),
      (2L, (0 until 15).map(_ => "the cat").mkString(" ")),  // repetitive 2-grams
      (3L, "too short of a doc")))                           // fails word count
    val got = TextAnalysis.curate(t).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(4), r.getBoolean(5))).toMap
    assert(got(1L) == ((true, true)), s"clean doc kept: ${got(1L)}")
    assert(!got(2L)._2, s"repetitive doc dropped: ${got(2L)}")
    assert(got(3L) == ((false, false)), s"short doc fails gopher and is dropped: ${got(3L)}")
  }

  test("heavy hitters summary is exact when vocabulary fits capacity") {
    val t = docs(Seq(
      (1L, "x x x y y z"),
      (2L, "x y w")))
    val got = TextAnalysis.heavyHitters(t, capacity = 16).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("x", 4L), ("y", 3L), ("w", 1L), ("z", 1L)), s"got ${got.toSeq}")
  }

  test("paragraph dedup keeps first occurrence corpus-wide and rebuilds docs in order") {
    val t = docs(Seq(
      (1L, "alpha\nbeta\ngamma"),
      (2L, "BETA \ndelta"),   // beta dups doc 1's (case/trim-insensitive)
      (3L, "alpha\nalpha")))  // both paragraphs dup doc 1's alpha
    val got = TextAnalysis.paragraphDedup(t).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L) == ((3L, 3L, "alpha\nbeta\ngamma")), s"first doc untouched: ${got(1L)}")
    assert(got(2L) == ((2L, 1L, "delta")), s"duplicate paragraph dropped: ${got(2L)}")
    assert(got(3L) == ((2L, 0L, "")), s"fully-duplicate doc goes empty: ${got(3L)}")
  }

  test("corpusStats keeps a NULL-lang stratum") {
    import spark.implicits._
    val df = Seq((1L, "short text", "en"), (2L, "other words here", null), (3L, "more", null))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("test")).withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("docs").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.corpusStats(Tables(spark, dir)).collect()
    assert(got.length == 2, s"en and NULL strata both present: ${got.toSeq}")
    val nullRow = got.find(_.isNullAt(0)).get
    assert(nullRow.getLong(1) == 2L && !nullRow.isNullAt(3), "NULL stratum counted with quantiles")
  }

  test("repetition ratio: alternating 2-grams repeat, distinct text doesn't") {
    val t = docs(Seq(
      (1L, "a b a b a b"),          // 5 bigrams, 2 distinct -> ratio 0.6
      (2L, "one two three four five six")))  // all distinct -> ratio 0.0
    val got = TextAnalysis.textRepetition(t).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got(1L) == ((6L, 5L, 2L, 0.6)), s"alternating text: ${got(1L)}")
    assert(got(2L) == ((6L, 5L, 5L, 0.0)), s"distinct text: ${got(2L)}")
  }

  private def docsWithSource(rows: Seq[(Long, String, String)]): Tables = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("docs").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables(spark, dir)
  }

  test("canonicalSelect: preferred source wins over lower doc_id; ties break by doc_id") {
    val t = docsWithSource(Seq(
      (1L, "same text", "crawl"),       // lower id, but crawl loses to curated
      (2L, "same  TEXT ", "curated"),   // whitespace/case-normalized equal; wins
      (3L, "same text", "crawl"),
      (4L, "unique doc", "crawl"),      // singleton cluster keeps itself
      (5L, "other dup", "crawl"),       // same priority -> min doc_id wins
      (6L, "other dup", "crawl")))
    val got = TextAnalysis.canonicalSelect(t, preferred = Seq("curated"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got(1L) == ((2L, 3L, false)), s"crawl copy maps to curated survivor: ${got(1L)}")
    assert(got(2L) == ((2L, 3L, true)), s"curated copy is canonical: ${got(2L)}")
    assert(got(3L) == ((2L, 3L, false)), s"third copy maps too: ${got(3L)}")
    assert(got(4L) == ((4L, 1L, true)), s"singleton keeps itself: ${got(4L)}")
    assert(got(5L) == ((5L, 2L, true)), s"equal priority -> min doc_id: ${got(5L)}")
    assert(got(6L) == ((5L, 2L, false)), s"loser maps to min doc_id: ${got(6L)}")
  }

  test("boilerplateSegs: frequent segments drop everywhere, rare ones survive in order") {
    // "menu" in 4 of 5 docs (800 permille), all other words rarer; at
    // minDfPermille=700 -> minDf = ceil(0.7*5) = 4, only "menu" is boilerplate
    val t = docs(Seq(
      (1L, "menu alpha menu beta"),    // both menu occurrences drop, order kept
      (2L, "Menu gamma"),              // case-insensitive match drops
      (3L, "menu"),                    // fully-boilerplate doc goes empty
      (4L, "delta menu epsilon"),
      (5L, "zeta zeta")))              // repeat of a rare word is preserved
    val got = TextAnalysis.boilerplateSegs(t, minDfPermille = 700)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L) == ((4L, 2L, "alpha beta")), s"every occurrence drops: ${got(1L)}")
    assert(got(2L) == ((2L, 1L, "gamma")), s"case-insensitive: ${got(2L)}")
    assert(got(3L) == ((1L, 0L, "")), s"fully boilerplate -> empty: ${got(3L)}")
    assert(got(4L) == ((3L, 2L, "delta epsilon")), s"interior drop keeps order: ${got(4L)}")
    assert(got(5L) == ((2L, 2L, "zeta zeta")), s"rare repeats preserved: ${got(5L)}")
  }

  test("boilerplateSegs: gate refuses an oversized boilerplate set loudly") {
    val t = docs(Seq((1L, "a b"), (2L, "a b"), (3L, "a b")))
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.boilerplateSegs(t, minDfPermille = 100, maxBoiler = 1).collect()
    }
    assert(e.getMessage.contains("maxBoiler"), s"gate message names the knob: ${e.getMessage}")
  }

  test("entropyScore: hand-computed entropy, degenerate/empty/non-BMP corners") {
    def h(counts: Seq[Int]): Double = {
      val n = counts.sum.toDouble
      val raw = counts.map(c => -(c / n) * math.log(c / n)).sum
      math.floor(raw * 10000.0 + 0.5) / 10000.0
    }
    val t = docs(Seq(
      (1L, "aab b"),        // counts {' ':1, a:2, b:2}
      (2L, ""),             // empty -> all zeros
      (3L, "aaaa"),         // one symbol -> zero entropy
      (4L, "abcd"),         // uniform over 4 -> ln 4
      (5L, "𝄞𝄞a")))  // U+1D11E twice + 'a': 3 CODEPOINTS, not 5 chars
    val got = TextAnalysis.entropyScore(t).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((5L, 3L, h(Seq(1, 2, 2)))), s"mixed text: ${got(1L)}")
    assert(got(2L) == ((0L, 0L, 0.0)), s"empty: ${got(2L)}")
    assert(got(3L) == ((4L, 1L, 0.0)), s"degenerate repetition: ${got(3L)}")
    assert(got(4L) == ((4L, 4L, h(Seq(1, 1, 1, 1)))), s"uniform: ${got(4L)}")
    assert(got(5L) == ((3L, 2L, h(Seq(2, 1)))), s"codepoint counting (non-BMP): ${got(5L)}")
  }

  test("sourceKl: zero for identical distributions, hand-computed skew, <unk> folding") {
    val t0 = docsWithSource(Seq(
      (1L, "a a b", "s0"), (2L, "a b b", "s1")))
    val got = TextAnalysis.sourceKl(t0).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // corpus q = (a: .5, b: .5); s0 p = (2/3, 1/3): KL = 2/3 ln(4/3) + 1/3 ln(2/3)
    val kl = math.floor((2.0/3 * math.log(4.0/3) + 1.0/3 * math.log(2.0/3)) * 10000.0 + 0.5) / 10000.0
    assert(got("s0") == ((3L, kl)), s"skewed source: ${got("s0")}")
    assert(got("s1") == ((3L, kl)), s"mirror source: ${got("s1")}")
    val tEq = docsWithSource(Seq((1L, "a b", "s0"), (2L, "a b", "s1")))
    val gotEq = TextAnalysis.sourceKl(tEq).collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(gotEq.values.forall(_ == 0.0), s"identical distributions -> 0: $gotEq")
    // vocabSize=1: only the top token survives, the rest fold to <unk> and
    // the two sources become indistinguishable
    val tU = docsWithSource(Seq((1L, "a x", "s0"), (2L, "a y", "s1")))
    val gotU = TextAnalysis.sourceKl(tU, vocabSize = 1).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(gotU.values.forall(_ == 0.0), s"<unk> folding equalizes: $gotU")
  }

  test("ngramCounts: trigram tf/df, short-doc collapse, tie order") {
    val t = docs(Seq(
      (1L, "a b c d"),        // trigrams: "a b c", "b c d"
      (2L, "a b c"),          // trigram: "a b c"
      (3L, "x y"),            // shorter than n -> whole doc is one gram
      (4L, "a b c a b c a"))) // sliding window: "a b c","b c a","c a b","a b c","b c a"
    val got = TextAnalysis.ngramCounts(t, n = 3, topK = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.head == (("a b c", 4L, 3L)), s"most frequent first: ${got.head}")
    assert(got.toSet == Set(
      ("a b c", 4L, 3L), ("b c a", 2L, 1L), ("b c d", 1L, 1L),
      ("c a b", 1L, 1L), ("x y", 1L, 1L)), s"exact tf/df: ${got.toSeq}")
    // tf ties are ordered by gram ascending
    val ties = got.filter(_._2 == 1L).map(_._1).toSeq
    assert(ties == ties.sorted, s"deterministic tie order: $ties")
  }

  test("bm25Indexed == bm25Search row-for-row; index layout prunes to the query buckets") {
    val t = docs(Seq(
      (1L, "apple banana apple cherry plum"),
      (2L, "banana cherry"),
      (3L, "dog grass field"),
      (4L, ""),
      (5L, "apple apple apple")))
    val dir = java.nio.file.Files.createTempDirectory("idx").toString
    TextAnalysis.buildInvertedIndex(t, dir, nBuckets = 16)
    val scan = TextAnalysis.bm25Search(t, query = "apple banana", k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val idx = TextAnalysis.bm25Indexed(spark, dir, query = "apple banana", k = 10, nBuckets = 16)
    val got = idx.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == scan, s"indexed == scan: $got vs $scan")
    // the scan leaf must carry the bucket partition predicate
    val plan = idx.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"bucket pruning reaches the index scan:\n$plan")
  }

  test("indexDelta: update+add+delete land as a segment; queries == fresh scan of the post-delta corpus") {
    import spark.implicits._
    val t0 = docs(Seq(
      (1L, "apple banana apple cherry plum"),
      (2L, "banana cherry"),
      (3L, "dog grass field"),
      (5L, "apple apple apple")))
    val dir = java.nio.file.Files.createTempDirectory("idxd").toString
    TextAnalysis.buildInvertedIndex(t0, dir, nBuckets = 16)
    def files(): Set[String] = {
      def walk(f: java.io.File): Seq[String] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f.getPath) else Seq.empty
      walk(new java.io.File(s"$dir/postings")).toSet
    }
    val baseFiles = files()
    // delta 1: doc 2 rewritten, doc 9 added, doc 3 deleted
    TextAnalysis.indexDelta(spark, dir,
      Seq((2L, "apple plum plum"), (9L, "banana banana dog")).toDF("doc_id", "text"),
      removedIds = Seq(3L), nBuckets = 16)
    val post1 = docs(Seq(
      (1L, "apple banana apple cherry plum"),
      (2L, "apple plum plum"),
      (5L, "apple apple apple"),
      (9L, "banana banana dog")))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows(TextAnalysis.bm25IndexedInc(spark, dir, "apple banana", 10, nBuckets = 16)) ==
      rows(TextAnalysis.bm25Search(post1, "apple banana", 10)),
      "segmented read == fresh scan after update+add+delete")
    assert(rows(TextAnalysis.bm25IndexedInc(spark, dir, "dog grass", 10, nBuckets = 16)) ==
      rows(TextAnalysis.bm25Search(post1, "dog grass", 10)),
      "deleted doc is gone, added doc is found")
    assert(baseFiles.subsetOf(files()), "base segment files are never rewritten")
    // delta 2: doc 9 rewritten AGAIN — its gen-1 postings must die under
    // the (tombstone.gen > posting.gen) rule while gen-2 rows survive
    TextAnalysis.indexDelta(spark, dir,
      Seq((9L, "grass grass")).toDF("doc_id", "text"), removedIds = Seq.empty, nBuckets = 16)
    val post2 = docs(Seq(
      (1L, "apple banana apple cherry plum"),
      (2L, "apple plum plum"),
      (5L, "apple apple apple"),
      (9L, "grass grass")))
    assert(rows(TextAnalysis.bm25IndexedInc(spark, dir, "banana grass", 10, nBuckets = 16)) ==
      rows(TextAnalysis.bm25Search(post2, "banana grass", 10)),
      "second-generation rewrite supersedes the first")
    // a doc_id in BOTH changed and removedIds is ambiguous (same-gen
    // tombstone would lose to the same-gen postings) — refused loudly,
    // and the refusal leaves the index untouched
    val before = rows(TextAnalysis.bm25IndexedInc(spark, dir, "apple banana", 10, nBuckets = 16))
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.indexDelta(spark, dir,
        Seq((2L, "pear pear")).toDF("doc_id", "text"), removedIds = Seq(2L), nBuckets = 16)
    }
    assert(e.getMessage.contains("both") && e.getMessage.contains("removedIds"), e.getMessage)
    assert(rows(TextAnalysis.bm25IndexedInc(spark, dir, "apple banana", 10, nBuckets = 16)) == before,
      "refused delta writes nothing")
  }

  private def idxFiles(dir: String, rel: String): Set[String] = {
    def walk(f: java.io.File): Seq[String] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f.getPath) else Seq.empty
    val root = new java.io.File(s"$dir/$rel")
    if (root.isDirectory) walk(root).toSet else Set.empty
  }

  test("compactIndex: full merge — one segment, zero tombstones, query row-identity, deltas keep composing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("idxc").toString
    TextAnalysis.buildInvertedIndex(docs(Seq(
      (1L, "apple banana apple cherry plum"),
      (2L, "banana cherry"),
      (3L, "dog grass field"),
      (5L, "apple apple apple"))), dir, nBuckets = 16)
    TextAnalysis.indexDelta(spark, dir,
      Seq((2L, "apple plum plum"), (9L, "banana banana dog")).toDF("doc_id", "text"),
      removedIds = Seq(3L), nBuckets = 16)
    TextAnalysis.indexDelta(spark, dir,
      Seq((9L, "grass grass")).toDF("doc_id", "text"), removedIds = Seq.empty, nBuckets = 16)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    def q(s: String) = rows(TextAnalysis.bm25IndexedInc(spark, dir, s, 10, nBuckets = 16))
    val (b1, b2) = (q("apple banana"), q("dog grass plum"))
    TextAnalysis.compactIndex(spark, dir)
    assert(q("apple banana") == b1 && q("dog grass plum") == b2,
      "query results are row-identical across a full compaction")
    assert(!new java.io.File(s"$dir/tombstones").isDirectory,
      "full compaction retires every tombstone (dir removed for the fast query path)")
    val seg = spark.read.parquet(s"$dir/segstats").collect()
    assert(seg.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((2L, 4L)),
      s"one segstats row at maxGen with the live doc count: ${seg.toSeq}")
    val gens = spark.read.parquet(s"$dir/postings").select("gen").distinct().collect().map(_.getLong(0))
    assert(gens.toSeq == Seq(2L), s"all postings in the merged segment: ${gens.toSeq}")
    val docsRows = spark.read.parquet(s"$dir/docs").collect()
      .map(r => (r.getLong(0), r.getLong(2))).sorted
    assert(docsRows.toSeq == Seq((1L, 2L), (2L, 2L), (5L, 2L), (9L, 2L)),
      s"docs relation holds exactly the live set at the merged gen: ${docsRows.toSeq}")
    // maintenance keeps composing after compaction: update + removal land
    // as gen 3 and the segmented read still equals a fresh scan
    TextAnalysis.indexDelta(spark, dir,
      Seq((2L, "cherry cherry field")).toDF("doc_id", "text"),
      removedIds = Seq(5L), nBuckets = 16)
    val post = docs(Seq(
      (1L, "apple banana apple cherry plum"),
      (2L, "cherry cherry field"),
      (9L, "grass grass")))
    assert(q("apple cherry field") ==
      rows(TextAnalysis.bm25Search(post, "apple cherry field", 10)),
      "post-compaction delta == fresh scan of the resulting corpus")
  }

  test("compactIndex: partial merge never touches newer segments; cross-gen stat netting survives") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("idxp").toString
    TextAnalysis.buildInvertedIndex(docs(Seq(
      (1L, "apple banana apple cherry plum"),
      (2L, "banana cherry"),
      (3L, "dog grass field"),
      (5L, "apple apple apple"))), dir, nBuckets = 16)
    TextAnalysis.indexDelta(spark, dir,
      Seq((2L, "apple plum plum")).toDF("doc_id", "text"), removedIds = Seq.empty, nBuckets = 16)
    // gen 2 removes doc 3, which LIVES in gen 0 <= upToGen: its stat
    // netting stays in the untouched gen-2 row while its postings must
    // not survive the merge — the arithmetic-sum invariant under test
    TextAnalysis.indexDelta(spark, dir,
      Seq((9L, "banana banana dog")).toDF("doc_id", "text"), removedIds = Seq(3L), nBuckets = 16)
    TextAnalysis.indexDelta(spark, dir,
      Seq((9L, "grass grass")).toDF("doc_id", "text"), removedIds = Seq.empty, nBuckets = 16)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    def q(s: String) = rows(TextAnalysis.bm25IndexedInc(spark, dir, s, 10, nBuckets = 16))
    val (b1, b2) = (q("apple banana"), q("dog grass plum"))
    val newerPost = idxFiles(dir, "postings").filter { f =>
      spark.read.parquet(f).agg(org.apache.spark.sql.functions.min(col("gen")))
        .collect().head.getLong(0) >= 2L
    }
    TextAnalysis.compactIndex(spark, dir, upToGen = 1L)
    assert(newerPost.subsetOf(idxFiles(dir, "postings")),
      "files of segments above upToGen are byte-identical paths — base immutability")
    assert(q("apple banana") == b1 && q("dog grass plum") == b2,
      "query results are row-identical across a partial compaction")
    val segGens = spark.read.parquet(s"$dir/segstats").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(segGens.toSeq == Seq((1L, 4L), (2L, 0L), (3L, 0L)),
      s"merged row is the arithmetic sum; newer netting rows untouched: ${segGens.toSeq}")
    val tombGens = spark.read.parquet(s"$dir/tombstones").select("gen").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(tombGens.toSeq == Seq(2L, 3L), s"only tombstones above upToGen survive: ${tombGens.toSeq}")
    // doc 3 was removed by the KEPT gen-2 tombstone: its rows may not sit
    // in the merged segment either (live filter ran against ALL tombstones)
    val merged = spark.read.parquet(s"$dir/postings").filter(col("gen") === 1L)
      .select("doc_id").distinct().collect().map(_.getLong(0)).sorted
    assert(!merged.contains(3L), s"later-removed doc must not be carried forward: ${merged.toSeq}")
    // the full corpus view still equals a fresh scan
    val post = docs(Seq(
      (1L, "apple banana apple cherry plum"),
      (2L, "apple plum plum"),
      (5L, "apple apple apple"),
      (9L, "grass grass")))
    assert(q("apple banana") == rows(TextAnalysis.bm25Search(post, "apple banana", 10)),
      "partial compaction preserves the corpus view")
  }

  test("compactIndex: crash-safe swap — a crash at any swap point loses no rows and reruns cleanly") {
    import spark.implicits._
    // r13 advice (medium): the old swap deleted live files BEFORE moving
    // the staged merge in, so a crash between the two lost the index and a
    // rerun destroyed the only remaining copy. Now: old files are deleted
    // only after every staged file is moved in, the _COMMIT marker records
    // the exact replaced file set, and a rerun rolls an interrupted swap
    // forward from that list.
    def build(): String = {
      val dir = java.nio.file.Files.createTempDirectory("idxcr").toString
      TextAnalysis.buildInvertedIndex(docs(Seq(
        (1L, "apple banana apple cherry plum"),
        (2L, "banana cherry"),
        (3L, "dog grass field"),
        (5L, "apple apple apple"))), dir, nBuckets = 16)
      TextAnalysis.indexDelta(spark, dir,
        Seq((2L, "apple plum plum"), (9L, "banana banana dog")).toDF("doc_id", "text"),
        removedIds = Seq(3L), nBuckets = 16)
      dir
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    def q(dir: String, s: String) = rows(TextAnalysis.bm25IndexedInc(spark, dir, s, 10, nBuckets = 16))
    val clean = build()
    TextAnalysis.compactIndex(spark, clean)
    val want = (q(clean, "apple banana"), q(clean, "dog grass plum"))
    for (at <- Seq("staged", "moved")) {
      val dir = build()
      assert((q(dir, "apple banana"), q(dir, "dog grass plum")) == want,
        "fixture parity before the crash (compaction is query row-identity)")
      intercept[TextAnalysis.CompactionCrash] {
        TextAnalysis.compactIndexImpl(spark, dir, Long.MaxValue, crashAfter = Some(at))
      }
      if (at == "staged")
        assert((q(dir, "apple banana"), q(dir, "dog grass plum")) == want,
          "crash before the swap leaves the visible index untouched (staging + marker are dot-invisible)")
      // rerunning compactIndex IS the documented recovery: the marker rolls
      // the interrupted swap forward, then the rerun compacts the whole state
      TextAnalysis.compactIndex(spark, dir)
      assert((q(dir, "apple banana"), q(dir, "dog grass plum")) == want,
        s"crash at '$at' + rerun equals the clean compaction result")
      val seg = spark.read.parquet(s"$dir/segstats").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(seg.toSeq == Seq((1L, 4L)), s"single merged segstats row after recovery: ${seg.toSeq}")
      assert(!new java.io.File(s"$dir/tombstones").isDirectory, "tombstones fully retired")
      assert(!new java.io.File(s"$dir/.compact").exists, "staging cleared")
    }
  }

  test("phraseSearch: adjacency and order are the contract; index path is row-identical") {
    import spark.implicits._
    val corpus = docs(Seq(
      (1L, "a x y b x y"),      // two hits
      (2L, "y x"),              // order matters -> no hit
      (3L, "x q y"),            // gap -> no hit
      (4L, "b x y"),            // phrase at the very end -> one hit
      (5L, "x"),                // shorter than the phrase -> no hit
      (6L, ""),                 // empty doc -> no hit
      (7L, "x y x y x")))       // two hits
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val scan = rows(TextAnalysis.phraseSearchDocs(corpus.documents, "x y", 10))
    assert(scan == Seq((1L, 2L), (7L, 2L), (4L, 1L)), s"got $scan")
    // overlapping occurrences count: "a a a" has TWO "a a" starts
    val ov = rows(TextAnalysis.phraseSearchDocs(
      docs(Seq((9L, "a a a"))).documents, "a a", 10))
    assert(ov == Seq((9L, 2L)), s"overlap rule: $ov")
    // a 3-word phrase needs all three adjacent in order
    val tri = rows(TextAnalysis.phraseSearchDocs(corpus.documents, "x y b", 10))
    assert(tri == Seq((1L, 1L)), s"3-word phrase: $tri")
    // the positional index answers row-identically WITHOUT re-reading text
    val dir = java.nio.file.Files.createTempDirectory("phidx").toString
    TextAnalysis.buildPhraseIndexDocs(corpus.documents, dir, nBuckets = 16)
    val idx = rows(TextAnalysis.phraseSearchIndexed(spark, dir, "x y", 10, nBuckets = 16))
    assert(idx == scan, s"index vs scan: $idx vs $scan")
    val idxTri = rows(TextAnalysis.phraseSearchIndexed(spark, dir, "x y b", 10, nBuckets = 16))
    assert(idxTri == tri, s"index 3-word: $idxTri vs $tri")
    // doc 2 contains both words but never adjacent — the all-present
    // pivot must still reject it through the adjacency fold
    assert(!idx.exists(_._1 == 2L), "order violation excluded by the index path too")
  }

  test("tokFertility: exact token/byte ratios per language") {
    import spark.implicits._
    // punctuation splits re-tokens ("a-b" -> a, -, b); é is 2 UTF-8 bytes
    val df = Seq((1L, "ab cd", "en"), (2L, "a-b x", "en"), (3L, "é", "fr"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("t")).withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("tf").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.tokFertility(Tables(spark, dir)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6))).toMap
    // en: ws 2+2=4, re 2+4=6, bytes 5+5=10 -> fertility 1.5, bpt 1.6667
    assert(got("en") == ((2L, 4L, 6L, 10L, 1.5, 1.6667)), s"en: ${got("en")}")
    // fr: ws 1, re 1, bytes 2 -> fertility 1.0, bpt 2.0
    assert(got("fr") == ((1L, 1L, 1L, 2L, 1.0, 2.0)), s"fr: ${got("fr")}")
  }

  test("domainCounts: host extraction, www-strip, port/path/query stops, per-doc distinct") {
    val t = docs(Seq(
      (1L, "see https://www.example.com/page and http://example.com:8080/x?q=1 plus https://other.org"),
      (2L, "again https://example.com/deep/path#frag here"),
      (3L, "no links at all")))
    val got = TextAnalysis.domainCounts(t).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("example.com") == ((3L, 2L)), s"3 mentions across 2 docs: ${got("example.com")}")
    assert(got("other.org") == ((1L, 1L)), s"other.org: ${got("other.org")}")
    assert(got.size == 2, s"no empty/garbage domains: $got")
  }

  test("htmlStrip: tags dropped, entities unescaped, whitespace collapsed") {
    val t = docs(Seq(
      (1L, "<p>Hello <b>world</b></p>"),
      (2L, "a &lt;tag&gt; &amp; &quot;quotes&quot; &#39;s&nbsp;end"),
      (3L, "plain text stays"),
      (4L, "<div class=\"x\">nested <span>deep</span>\n\n text</div>")))
    val got = TextAnalysis.htmlStrip(t).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(4))).toMap
    assert(got(1L)._1 == "Hello world", s"tags: ${got(1L)}")
    assert(got(2L)._1 == "a <tag> & \"quotes\" 's end", s"entities: ${got(2L)}")
    assert(got(3L)._1 == "plain text stays", s"identity: ${got(3L)}")
    assert(got(4L)._1 == "nested deep text", s"nested: ${got(4L)}")
    assert(got(3L)._2 == 0.0, "no markup -> zero markup_frac")
    assert(got(1L)._2 > 0.5, s"tag-heavy doc flags high markup_frac: ${got(1L)._2}")
  }

  test("ngramDiversity: exact distinct-n ratios per source") {
    val t = docs(Seq(
      (1L, "a b a"),    // uni: 3 total / 2 distinct; bi: "a b","b a" -> 2/2
      (2L, "a b a")))   // same source doubles totals, not distincts
    val got = TextAnalysis.ngramDiversity(t).collect()
      .map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got(1) == ((6L, 2L, 0.3333)), s"unigram: ${got(1)}")
    assert(got(2) == ((4L, 2L, 0.5)), s"bigram: ${got(2)}")
  }

  test("cooccurTop: window-2 pairs with exact 1/d half-unit weights") {
    val t = docs(Seq((1L, "x y z"), (2L, "x y")))
    // d=1: (x,y)x2, (y,z); d=2: (x,z). units: d1=2, d2=1
    val got = TextAnalysis.cooccurTop(t, window = 2, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got(("x", "y")) == ((2L, 4L, 2.0)), s"xy: ${got(("x", "y"))}")
    assert(got(("y", "z")) == ((1L, 2L, 1.0)), s"yz: ${got(("y", "z"))}")
    assert(got(("x", "z")) == ((1L, 1L, 0.5)), s"xz half weight at distance 2: ${got(("x", "z"))}")
    // ordering: units desc, then lexicographic
    val order = TextAnalysis.cooccurTop(t, window = 2, k = 10).collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(order == Seq(("x", "y"), ("y", "z"), ("x", "z")), s"order: $order")
  }

  test("zipfFit: exact power-law counts fit slope -1") {
    // counts 12/r for ranks 1..4 -> ln c = ln 12 - 1 * ln r exactly
    val text = (Seq.fill(12)("w1") ++ Seq.fill(6)("w2") ++ Seq.fill(4)("w3") ++ Seq.fill(3)("w4")).mkString(" ")
    val got = TextAnalysis.zipfFit(docs(Seq((1L, text)))).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getInt(0) == 4, s"n_terms: ${r.getInt(0)}")
    assert(r.getDouble(1) == -1.0, s"slope on exact power law: ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - math.log(12.0)) < 1e-3, s"intercept ~ ln 12: ${r.getDouble(2)}")
  }

  /** docs with explicit sources, for reference-slice operators. */
  private def docsSrc(rows: Seq[(Long, String, String)]): Tables = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("docsrc").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables(spark, dir)
  }

  test("noveltyScore: replayed text scores 0, half-overlap 0.5, fresh text 1") {
    val t = docsSrc(Seq(
      (1L, "alpha beta gamma delta", "ref1"),   // reference: shingles {abg, bgd}
      (10L, "alpha beta gamma delta", "other"), // exact replay -> 0.0
      (11L, "alpha beta gamma zeta", "other"),  // abg known, bgz fresh -> 0.5
      (12L, "one two three four", "other")))    // nothing known -> 1.0
    val got = TextAnalysis.noveltyScore(t, refExpr = "source = 'ref1'").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((2L, 0.0)), s"ref doc scores 0 by construction: ${got(1L)}")
    assert(got(10L) == ((2L, 0.0)), s"replay: ${got(10L)}")
    assert(got(11L) == ((2L, 0.5)), s"half overlap: ${got(11L)}")
    assert(got(12L) == ((2L, 1.0)), s"fresh: ${got(12L)}")
  }

  test("noveltyScore: short docs fall back to the whole-text shingle") {
    // under k=3 words the single shingle is the full text — a replayed
    // short doc is caught, a reworded one is fully novel
    val t = docsSrc(Seq(
      (1L, "hello world", "ref1"),
      (10L, "hello world", "other"),
      (11L, "goodbye world", "other")))
    val got = TextAnalysis.noveltyScore(t, refExpr = "source = 'ref1'").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(10L) == ((1L, 0.0)), s"short replay: ${got(10L)}")
    assert(got(11L) == ((1L, 1.0)), s"short fresh: ${got(11L)}")
  }

  test("readability: Flesch formulas over exact counts; vowelless words get one syllable") {
    val t = docs(Seq(
      (1L, "The cat sat. It ran!"),   // 5 words, 2 sentences, 5 syllables
      (2L, "42 7th"),                 // vowelless tokens: 1 syllable each, sentence floor 1
      (3L, ""),                       // empty: NULL scores, 'empty' band
      (4L, "aeiolia aeiolia aeiolia."))) // 2 syllables/word, 1 sentence -> difficult
    val got = TextAnalysis.readability(t).collect()
      .map(r => r.getLong(0) -> r).toMap
    def row(id: Long) = { val r = got(id)
      (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) null else r.getDouble(4),
        if (r.isNullAt(5)) null else r.getDouble(5), r.getString(6)) }
    assert(row(1L) == ((5L, 2L, 5L, 119.6975, -2.815, "easy")), s"doc1 ${row(1L)}")
    assert(row(2L) == ((2L, 1L, 2L, 120.205, -3.01, "easy")), s"doc2 ${row(2L)}")
    assert(row(3L) == ((0L, 1L, 0L, null, null, "empty")), s"doc3 ${row(3L)}")
    assert(row(4L) == ((3L, 1L, 6L, 34.59, 9.18, "difficult")), s"doc4 ${row(4L)}")
  }

  test("exact-df vocab gate refuses an explosion loudly, names the sketch remedies") {
    // 40 docs of disjoint tokens -> ~120 distinct 3-grams / ~120 tokens;
    // a cap below that must refuse BEFORE the expand shuffle with the
    // sketch remedies named; the default cap (50M) passes untouched
    val t = docs((1L to 40L).map(i =>
      i -> (0 until 6).map(j => s"tok_${i}_$j").mkString(" ")))
    val e1 = intercept[IllegalArgumentException](TextAnalysis.ngramCounts(t, maxDistinctGrams = 10))
    assert(e1.getMessage.contains("heavy_hitters") && e1.getMessage.contains("hll_distinct"),
      s"remedies named: ${e1.getMessage}")
    val e2 = intercept[IllegalArgumentException](TextAnalysis.vocabTopk(t, maxDistinctTokens = 10))
    assert(e2.getMessage.contains("maxDistinct"), s"${e2.getMessage}")
    assert(TextAnalysis.ngramCounts(t).count() == 20L, "default cap passes")
    assert(TextAnalysis.vocabTopk(t, maxDistinctTokens = 0).count() == 20L, "gate opt-out")
  }

  test("readability: vertical tab splits words (explicit class, not engine-dependent \\S)") {
    // Java's \s includes \x0B, RE2's does not — the explicit
    // [^ \t\n\r\f\x0B] class makes VT a separator in BOTH engines
    val t = docs(Seq((1L, "catdog sat")))
    val r = TextAnalysis.readability(t).collect().head
    assert(r.getLong(1) == 3L && r.getLong(3) == 3L,
      s"VT separates cat|dog -> 3 words, 3 syllables: $r")
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** C47 BPE tests: textbook merge learning on the classic word-frequency
  * example, train→encode round trip, the frozen-merge encode against a
  * plain-Scala replace-chain reference, and the documented self-pair-run
  * corner where two-pass replace deviates from the textbook fold.
  */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def docs(rows: Seq[(Long, String)]): Tables = {
    import spark.implicits._
    val df = rows.map { case (id, s) => (id, s, "en", "web", s.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables(spark, dir)
  }

  private val Sep = "\u001f"

  /** Plain-Scala reference of the operator's merge application. */
  private def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val init = Sep + word.map(_.toString).mkString(Sep) + Sep
    val out = merges.foldLeft(init) { case (s, (x, y)) =>
      val pat = Sep + x + Sep + y + Sep; val rep = Sep + x + y + Sep
      s.replace(pat, rep).replace(pat, rep)
    }
    out.split(Sep.charAt(0)).toSeq.filter(_.nonEmpty)
  }

  test("training learns the textbook merges on the classic corpus") {
    // word freqs: hug x10, pug x5, pun x12, bun x4, hugs x5
    // char pair counts: (h,u)=15 (u,g)=20 (p,u)=17 (u,n)=16 (b,u)=4 (g,s)=5
    // round 1: (u,g) 20 -> "ug"; round 2: (u,n) 16 -> "un";
    // round 3: (h,ug) 15 -> "hug"; round 4: (p,un) 12 -> "pun"
    val text = (Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++ Seq.fill(12)("pun") ++
      Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")).mkString(" ")
    val t = docs(Seq((0L, text)))
    val got = Bpe.bpeTrain(t, nMerges = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == Seq((0, "u", "g", 20L), (1, "u", "n", 16L),
      (2, "h", "ug", 15L), (3, "p", "un", 12L)), s"merges: $got")
  }

  test("bpe_pairs matches hand-computed weighted char-pair counts") {
    val t = docs(Seq((0L, "hug hug pug")))
    // dict: hug freq 2, pug freq 1 -> (hu,2) (ug,3) (pu,1)
    val got = Bpe.bpePairs(t, k = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("ug" -> 3L, "hu" -> 2L, "pu" -> 1L))
  }

  test("train -> encode round trip compresses and matches the scalar reference") {
    val text = (Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++ Seq.fill(12)("pun") ++
      Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")).mkString(" ")
    val t = docs(Seq((0L, text)))
    val merges = Bpe.bpeTrain(t, nMerges = 4).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val row = Bpe.bpeEncode(t, merges).collect()(0)
    val nWords = 36L
    // per-word reference token counts after [ug, un, hug, pun]
    val refTokens = Seq.fill(10)(refEncode("hug", merges)) ++
      Seq.fill(5)(refEncode("pug", merges)) ++ Seq.fill(12)(refEncode("pun", merges)) ++
      Seq.fill(4)(refEncode("bun", merges)) ++ Seq.fill(5)(refEncode("hugs", merges))
    assert(row.getLong(1) == nWords)
    assert(row.getLong(2) == refTokens.map(_.size).sum,
      s"n_bpe ${row.getLong(2)} vs ${refTokens.map(_.size).sum}")
    // hug -> single token after merge rank 2
    assert(row.getString(3) == "hug", s"first_enc ${row.getString(3)}")
    // compression really happened: 3-char words at ~1-2 tokens, not 3
    assert(row.getLong(2) < nWords * 3)
  }

  test("frozen-merge encode matches the scalar replace-chain reference per word") {
    val merges = Seq(("t", "h"), ("th", "e"), ("i", "n"), ("in", "g"))
    val wordsList = Seq("the", "thee", "thinking", "ingthe", "a", "xyz")
    val t = docs(wordsList.zipWithIndex.map { case (w, i) => (i.toLong, w) })
    val got = Bpe.bpeEncode(t, merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    wordsList.zipWithIndex.foreach { case (w, i) =>
      val ref = refEncode(w, merges)
      assert(got(i.toLong) == ((ref.size.toLong, ref.mkString(" "))),
        s"word $w: ${got(i.toLong)} vs $ref")
    }
  }

  test("self-pair run corner: two-pass replace is deterministic and documented") {
    // textbook fold on a^6 under (a,a) gives [aa aa aa]; the two-pass
    // replace semantics merges a different valid non-overlapping set —
    // pin the exact output so any change to the semantics is loud
    val t = docs(Seq((0L, "aaaaaa")))
    val row = Bpe.bpeEncode(t, Seq(("a", "a"))).collect()(0)
    val ref = refEncode("aaaaaa", Seq(("a", "a")))
    assert(row.getLong(2) == ref.size.toLong)
    assert(row.getString(3) == ref.mkString(" "))
    // and on runs < 6 the two semantics agree with the textbook fold
    val t2 = docs(Seq((0L, "aaaa aaaaa")))
    val row2 = Bpe.bpeEncode(t2, Seq(("a", "a"))).collect()(0)
    assert(row2.getLong(2) == 2L + 3L) // aaaa -> [aa aa]; aaaaa -> [aa aa a]
  }

  test("empty and single-char docs") {
    val t = docs(Seq((0L, ""), (1L, "x")))
    val got = Bpe.bpeEncode(t, Seq(("a", "b"))).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), Option(r.getString(3))))).toMap
    assert(got(0L) == ((0L, 0L, None)))
    assert(got(1L) == ((1L, 1L, Some("x"))))
  }

  test("driver-local training path is merge-for-merge identical to the distributed loop") {
    // ties (two pairs at the same count — broken by pair order), a
    // multi-byte character (UTF-8 byte order vs Java char order), a
    // self-pair run, and an early-stop tail all in one corpus
    val text = (Seq.fill(6)("hug") ++ Seq.fill(6)("pug") ++ Seq.fill(4)("pun") ++
      Seq.fill(3)("béé") ++ Seq.fill(2)("aaaa") ++ Seq("zq")).mkString(" ")
    val t = docs(Seq((0L, text)))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val local = rows(Bpe.bpeTrain(t, nMerges = 8)) // dict far below the gate
    val dist = rows(Bpe.bpeTrain(t, nMerges = 8, maxLocalDict = 0L)) // force distributed
    assert(local == dist, s"local $local vs distributed $dist")
    assert(local.nonEmpty)
  }
}

package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training + application (SURVEY.md §2
  * C47) — the "train the tokenizer on the corpus" step of an LLM data
  * pipeline (Sennrich et al., ACL 2016), re-expressed relationally.
  *
  * The classic efficiency trick makes this distributed-friendly: BPE
  * never iterates over the corpus — it iterates over the WORD-FREQUENCY
  * dictionary (one corpus scan builds it; Zipf makes it orders of
  * magnitude smaller than the corpus, e.g. ~10⁷-10⁸ distinct words for
  * a 100 TB web corpus), and each merge round is a bounded aggregate
  * over that dictionary plus a 1-row argmax collect — the C18 k-means
  * iteration shape.
  *
  * Merge application is defined as a TWO-PASS leftmost non-overlapping
  * `replace` on a U+001F-separated symbol string ("␟c␟h␟a␟r␟s␟";
  * pattern ␟x␟y␟ → ␟xy␟ twice per merge, because a first pass consumes
  * the boundary separator shared by back-to-back occurrences and the
  * second pass catches the stragglers it skipped). Both engines
  * implement `replace` with identical leftmost-non-overlapping
  * semantics, so TRAINING and ENCODING share one transition function
  * that is bit-identical cross-engine — which is what makes
  * [[bpeEncode]] oracle-checkable at all. The two-pass application
  * equals the textbook left-to-right greedy fold except on runs of ≥ 6
  * identical self-pair symbols ("aaaaaa" under merge (a,a)), where it
  * may merge a different (equally valid, still deterministic)
  * non-overlapping occurrence set; BpeSpec pins both the textbook
  * equivalence on clean inputs and the exact behavior on that corner.
  *
  * Documents whose text contains U+001F itself are outside the
  * operator's domain (the separator must not occur in a symbol); real
  * pipelines strip C0 controls during normalization (C24) first.
  */
object Bpe {

  /** Symbol separator: U+001F (unit separator). */
  private val Sep = "\u001f"

  private def words: Column =
    filter(split(trim(lower(col("text"))), "\\s+"), w => length(w) > 0)

  /** "␟c␟h␟a␟r␟s␟" — the symbol-string form of a word. */
  private def symString(w: Column): Column =
    concat(lit(Sep), array_join(split(w, ""), Sep), lit(Sep))

  /** One merge applied to a symbol string: two leftmost-non-overlapping
    * replace passes of ␟x␟y␟ → ␟xy␟ (see object Scaladoc).
    */
  private def applyMerge(s: Column, x: String, y: String): Column = {
    val pat = lit(Sep + x + Sep + y + Sep)
    val rep = lit(Sep + x + y + Sep)
    replace(replace(s, pat, rep), pat, rep)
  }

  /** Tokens of a symbol string (drops the leading/trailing empties the
    * boundary separators produce).
    */
  private def symTokens(s: Column): Column =
    slice(split(s, Sep), lit(2), greatest(size(split(s, Sep)) - 2, lit(0)))

  /** Adjacent symbol pairs of a symbol string, as structs. */
  private def symPairs(s: Column): Column = {
    val arr = symTokens(s)
    when(size(arr) < 2, array().cast("array<struct<x:string,y:string>>"))
      .otherwise(zip_with(
        slice(arr, lit(1), greatest(size(arr) - 1, lit(0))),
        slice(arr, lit(2), greatest(size(arr) - 1, lit(0))),
        (a, b) => struct(a.as("x"), b.as("y"))))
  }

  /** The word-frequency dictionary: ONE corpus scan, map-side
    * combinable count, keyed by the word — every training round after
    * this touches only the dictionary.
    */
  private def wordDict(t: Tables): DataFrame =
    t.documents.select(explode(words).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** C47a: first-round BPE pair statistics — the top-k adjacent
    * character pairs by corpus frequency (each occurrence weighted by
    * its word's frequency). This is exactly the relation the first
    * training round maximizes over, exposed as a query because it is
    * the SQL-expressible surface of the training loop (the loop itself
    * is [[bpeTrain]], checked rows-only like C18's k-means).
    *
    * Scale shape: corpus scan → word dict (bounded), then pair
    * explosion over DISTINCT words only — a word occurring 10⁶ times
    * pays its character scan once, not 10⁶ times; the (pair) aggregate
    * is map-side combinable and the top-k is a bounded ordered take.
    */
  def bpePairs(t: Tables, k: Int = 50): DataFrame = {
    val pairCol = when(length(col("word")) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(col("word")) - 1),
        i => col("word").substr(i, lit(2))))
    wordDict(t)
      .select(col("freq"), explode(pairCol).as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(k)
  }

  /** C47b: BPE merge training — `nMerges` rounds of: count adjacent
    * symbol pairs over the dictionary (weighted by word frequency),
    * merge the most frequent pair everywhere (ties broken by the pair,
    * so training is fully deterministic), stop early when no pair
    * repeats. Returns the learned merge table (rank, x, y, cnt).
    *
    * Scale shape per round: one pair-explosion aggregate over the
    * word dictionary (map-side combinable; key space = live symbol
    * pairs), a 1-row TakeOrdered collect, and one narrow dictionary
    * rewrite — `localCheckpoint` truncates the growing lineage each
    * round (the C17/C18 iteration hygiene). Nothing corpus-sized is
    * ever touched after the initial dictionary scan.
    */
  def bpeTrain(t: Tables, nMerges: Int = 16,
               maxLocalDict: Long = 262144L): DataFrame = {
    val spark = t.documents.sparkSession
    require(nMerges > 0 && nMerges <= 4096, s"nMerges must be in (0, 4096], got $nMerges")
    var dict = wordDict(t)
      .select(symString(col("word")).as("s"), col("freq"))
      .localCheckpoint()
    // gate-checked driver-local sub-path (the starComponents/localUnionFind
    // precedent): the dictionary is DISTINCT-WORD-sized — Zipf keeps it
    // orders of magnitude below corpus rows — and when it fits the gate,
    // 16 merge rounds as driver string folds beat 32 distributed jobs
    // whose per-job fixed cost dwarfs the actual work. Above the gate the
    // distributed loop below is untouched (the 100 TB path). Asserted
    // merge-for-merge interchangeable with the distributed loop in
    // BpeSpec (maxLocalDict = 0 forces the distributed path).
    val dictN = dict.count()
    if (dictN <= maxLocalDict) {
      import spark.implicits._
      return bpeTrainLocal(dict.select(col("s"), col("freq"))
        .as[(String, Long)].collect(), nMerges).toDF("rank", "x", "y", "cnt")
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var stop = false
    var rank = 0
    while (rank < nMerges && !stop) {
      val top = dict
        .select(col("freq"), explode(symPairs(col("s"))).as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("x"), col("y"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < 2L) stop = true
      else {
        val (x, y, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((rank, x, y, cnt))
        dict = dict.select(applyMerge(col("s"), x, y).as("s"), col("freq"))
          .localCheckpoint()
        rank += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "x", "y", "cnt")
  }

  /** Driver-side twin of the distributed training loop, byte-exact:
    * symTokens ≡ split-on-Sep minus the boundary empties, the pair
    * argmax breaks ties by UNSIGNED UTF-8 byte order (what Spark's
    * string ordering compares — Java's compareTo differs on
    * supplementary characters), and merge application is the same
    * two-pass leftmost-non-overlapping replace (Java String.replace
    * shares Spark replace()'s all-occurrences-leftmost semantics).
    */
  private[graft] def bpeTrainLocal(rows0: Array[(String, Long)],
                                   nMerges: Int): Seq[(Int, String, String, Long)] = {
    def utf8Less(a: String, b: String): Boolean = {
      val (ba, bb) = (a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var i = 0
      val n = math.min(ba.length, bb.length)
      while (i < n) {
        val d = (ba(i) & 0xff) - (bb(i) & 0xff)
        if (d != 0) return d < 0
        i += 1
      }
      ba.length < bb.length
    }
    var rows = rows0
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var stop = false
    var rank = 0
    while (rank < nMerges && !stop) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      rows.foreach { case (s, f) =>
        // split keeps trailing empties (Spark split limit -1 semantics);
        // symTokens drops exactly the first and last boundary empties
        val parts = s.split(Sep, -1)
        var j = 1
        while (j < parts.length - 2) {
          val k = (parts(j), parts(j + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          j += 1
        }
      }
      val top = counts.reduceOption[((String, String), Long)] { case (a, b) =>
        if (a._2 != b._2) { if (a._2 > b._2) a else b }
        else if (a._1._1 != b._1._1) { if (utf8Less(a._1._1, b._1._1)) a else b }
        else if (utf8Less(a._1._2, b._1._2)) a else b
      }
      top match {
        case Some(((x, y), cnt)) if cnt >= 2L =>
          merges += ((rank, x, y, cnt))
          val pat = Sep + x + Sep + y + Sep
          val rep = Sep + x + y + Sep
          rows = rows.map { case (s, f) => (s.replace(pat, rep).replace(pat, rep), f) }
          rank += 1
        case _ => stop = true
      }
    }
    merges.toSeq
  }

  /** C47c: encode the corpus with a FROZEN merge table — the shape a
    * trained tokenizer runs over 100 TB (the merge table is an
    * artifact; encoding is the corpus pass). Applies the merges in
    * rank order to every word and emits per-document token counts plus
    * the first word's encoding as a parity surface.
    *
    * Scale shape: ONE zero-shuffle narrow scan — the merge chain
    * compiles into 2·k nested `replace` calls inside a per-word array
    * transform, all codegen'd string built-ins; no join, no exchange,
    * no state. The driver query freezes a literal merge list (the
    * C44b frozen-weights precedent) so the DuckDB oracle applies the
    * IDENTICAL replace chain — training-produced merges go through the
    * same code path (BpeSpec round-trips bpeTrain → bpeEncode).
    */
  def bpeEncode(t: Tables, merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty && merges.size <= 4096,
      s"bpeEncode needs 1..4096 merges, got ${merges.size}")
    merges.foreach { case (x, y) =>
      require(x.nonEmpty && y.nonEmpty && !(x + y).contains(Sep),
        s"merge symbols must be non-empty and separator-free: ($x, $y)") }
    val encodeWord: Column => Column = w =>
      merges.foldLeft(symString(w)) { case (s, (x, y)) => applyMerge(s, x, y) }
    val encArr = transform(words, encodeWord)
    // tokens per encoded word = split size - 2 (boundary empties)
    val nBpe = aggregate(col("encs"), lit(0L),
      (acc, e) => acc + size(split(e, Sep)).cast("long") - 2L)
    t.documents
      .withColumn("encs", encArr)
      .select(col("doc_id"),
        size(col("encs")).cast("long").as("n_words"),
        nBpe.as("n_bpe"),
        // first word's tokens, space-joined (null for empty docs)
        array_join(symTokens(get(col("encs"), lit(0))), " ").as("first_enc"))
  }

  /** SQL text of the frozen-merge encode chain for the DuckDB oracle:
    * the same 2·k nested replaces over the same symbol string. Kept
    * next to the operator so the two chains can never drift.
    */
  def encodeSqlExpr(merges: Seq[(String, String)], inner: String): String =
    merges.foldLeft(s"'$Sep' || array_to_string(string_split($inner, ''), '$Sep') || '$Sep'") {
      case (s, (x, y)) =>
        val pat = s"'$Sep$x$Sep$y$Sep'"
        val rep = s"'$Sep$x$y$Sep'"
        s"replace(replace($s, $pat, $rep), $pat, $rep)"
    }

}

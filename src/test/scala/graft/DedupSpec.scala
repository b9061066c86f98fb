package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** C2-C4 behavioral tests with PLANTED near-duplicates (the synthetic
  * corpus has none): near-dup pairs must be found, unrelated pairs must
  * not collide.
  */
class DedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  /** A fake Tables whose documents are the given (id, text, lang) rows. */
  private def docs(rows: Seq[(Long, String, String)]): Tables = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "text", "lang")
      .withColumn("source", lit("test")).withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("docs").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables(spark, dir)
  }

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps near the warm fire and dreams of fish"
  private val nearDup = base.replace("warm fire", "cold stove") // small edit
  private val unrelated =
    "completely different content about spark distributed query engines processing massive parquet datasets every day"

  test("minhash LSH surfaces planted near-dup, not unrelated pair") {
    val t = docs(Seq((1L, base, "en"), (2L, nearDup, "en"), (3L, unrelated, "en")))
    val pairs = Dedup.dedupMinhash(t).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "near-dup pair found by LSH banding")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)), "unrelated not a candidate")
  }

  test("simhash hamming distance separates near-dup from unrelated") {
    val t = docs(Seq((1L, base, "en"), (2L, nearDup, "en"), (3L, unrelated, "en")))
    val sims = Dedup.simhash(t).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sims(1L), sims(2L)) < hamming(sims(1L), sims(3L)),
      "near-dup closer in hamming space than unrelated")
  }

  test("jaccard verify stage scores LSH candidates exactly") {
    val t = docs(Seq((1L, base, "en"), (2L, nearDup, "en"), (3L, unrelated, "en")))
    val jac = Dedup.ngramJaccard(t, threshold = 0.0).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(jac((1L, 2L)) >= 0.5, s"planted pair 3-shingle jaccard ${jac((1L, 2L))}")
    assert(!jac.contains((1L, 3L)) && !jac.contains((2L, 3L)),
      "unrelated pairs never reach the verify stage")
  }

  test("verify-stage candidate restriction is stats-gated by corpus size") {
    // plan-shape only (no execution): Range provides exact rowCount stats,
    // so corpusRows answers with zero jobs on both sides of the gate
    def plan(n: Long): String = {
      val d = spark.range(n).selectExpr("id AS doc_id",
        "concat('tok', id % 50, ' alpha beta gamma delta') AS text")
      Dedup.ngramJaccardDocs(d, 3, 8, 4, 0.0)
        .queryExecution.optimizedPlan.toString.toLowerCase
    }
    assert(plan(200001L).contains("leftsemi"),
      "above the gate the verify scan restricts to candidate endpoints")
    assert(!plan(100L).contains("leftsemi"),
      "below the gate the restriction (pure overhead at small n) is skipped")
  }

  test("cluster assignment is transitive: A~B~C chains into one cluster") {
    // 50 tokens; B differs from A by one word, C from B by another — so
    // jaccard(A,B) and (B,C) clear 0.8 but (A,C) does not: only
    // transitive closure puts all three together.
    val words = (0 until 50).map(i => s"w$i")
    val a = words.mkString(" ")
    val b = words.updated(10, "xx").mkString(" ")
    val c = words.updated(10, "xx").updated(30, "yy").mkString(" ")
    val t = docs(Seq((1L, a, "en"), (2L, b, "en"), (3L, c, "en"), (4L, unrelated, "en")))
    val direct = Dedup.ngramJaccard(t, threshold = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(direct.contains((1L, 2L)) && direct.contains((2L, 3L)) && !direct.contains((1L, 3L)),
      s"planted chain has exactly the A-B and B-C direct pairs: $direct")
    val clusters = Dedup.dedupClusters(t).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(clusters(1L) == ((1L, 3L)) && clusters(2L) == ((1L, 3L)) && clusters(3L) == ((1L, 3L)),
      s"chain collapses to cluster 1 of size 3: $clusters")
    assert(clusters(4L) == ((4L, 1L)), "unrelated doc is its own singleton cluster")
  }

  test("clusterHist: planted chain + singleton give the exact size histogram") {
    val words = (0 until 50).map(i => s"w$i")
    val a = words.mkString(" ")
    val b = words.updated(10, "xx").mkString(" ")
    val c = words.updated(10, "xx").updated(30, "yy").mkString(" ")
    val t = docs(Seq((1L, a, "en"), (2L, b, "en"), (3L, c, "en"), (4L, unrelated, "en")))
    val hist = Dedup.clusterHist(t).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(hist == Map(1L -> ((1L, 1L)), 3L -> ((1L, 3L))),
      s"one singleton + one 3-doc chain cluster: $hist")
  }

  test("null-text documents dedup against each other (null-safe hash join)") {
    val t = docs(Seq((1L, null, "en"), (2L, null, "en"), (3L, base, "en")))
    val kept = Dedup.dedupApply(t).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L), s"higher null-text duplicate dropped: $kept")
  }

  test("maxBucket drops degenerate hot buckets, keeps honest near-dups") {
    // 40 identical boilerplate docs form a hot bucket in every band;
    // the planted near-dup pair lives in its own buckets
    val boiler = (10L until 50L).map(i => (i, "identical boilerplate text repeated across the corpus " * 3, "en"))
    val t = docs(Seq((1L, base, "en"), (2L, nearDup, "en")) ++ boiler)
    val capped = Dedup.dedupMinhash(t, maxBucket = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((1L, 2L)), "honest near-dup pair survives the cap")
    assert(!capped.exists { case (a, b) => a >= 10 && b >= 10 },
      s"no pairs from the capped hot bucket: $capped")
    val uncapped = Dedup.dedupMinhash(t, maxBucket = 0).collect().length
    assert(uncapped > capped.size, "cap actually pruned the degenerate pairs")
  }

  test("DEFAULT dedupMinhash path is hot-bucket-safe, drops are accounted") {
    // boilerplate corpus exceeding DefaultMaxBucket: the DEFAULT driver
    // surface (no explicit cap) must refuse the m² degenerate pairs and
    // still surface the honest planted near-dup — the r14 weak flag was
    // exactly "the guard exists but the default path is quadratic"
    val m = Dedup.DefaultMaxBucket + 6 // 1030 identical docs
    val boiler = (100L until (100L + m)).map(i =>
      (i, "identical boilerplate license text repeated across the corpus " * 3, "en"))
    val t = docs(Seq((1L, base, "en"), (2L, nearDup, "en")) ++ boiler)
    val pairs = Dedup.dedupMinhash(t).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "honest near-dup pair survives the default cap")
    assert(!pairs.exists { case (a, b) => a >= 100 && b >= 100 },
      s"default cap drops all boilerplate hot-bucket pairs (got ${pairs.size} pairs)")
    // loud accounting: the companion relation names exactly the dropped
    // buckets — identical docs collide in all 8 bands, each bn = m
    val hot = Dedup.minhashHotBuckets(t).collect()
    assert(hot.length == 8, s"8 hot band buckets reported, got ${hot.length}")
    assert(hot.forall(_.getLong(2) == m.toLong), s"each hot bucket holds all $m boilerplate docs")
    // and with the cap explicitly opted out the degenerate pairs DO appear
    // (count the bucket contribution, don't materialize m²/2 rows)
    val optOut = Dedup.dedupMinhash(t, maxBucket = 0)
      .filter(col("id_a") >= 100 && col("id_b") >= 100).limit(1).count()
    assert(optOut == 1L, "maxBucket=0 restores exact LSH (quadratic and all)")
  }

  test("cluster propagation converges on a 25-doc chain (pointer jumping)") {
    // d_i and d_{i+1} differ by one word (jaccard ~0.88 >= 0.8); graph
    // diameter 24 — one-hop-per-round propagation would need 24 rounds,
    // pointer jumping converges in O(log n)
    // doc d carries the first d cumulative single-word edits: consecutive
    // docs differ at exactly one (spaced) position, non-consecutive at 2+
    val chain = (0 until 25).map { d =>
      val text = (0 until 50)
        .map(j => if (j % 2 == 0 && j / 2 < d) s"x${j / 2}" else s"w$j").mkString(" ")
      (d.toLong + 1, text, "en")
    }
    val t = docs(chain)
    val clusters = Dedup.dedupClusters(t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.values.toSet == Set(1L), s"whole chain collapses to cluster 1: $clusters")
    // a 24-edge graph gates to the driver-local union-find path, recorded
    // as the -1 "gated" sentinel — distinguishable from a distributed run
    // (distributed star round counts are exercised by the
    // forced-distributed graph-shapes test below)
    val rounds = IterationLog.snapshot.get("dedup_clusters")
    assert(rounds.contains(-1), s"tiny chain takes the local path (rounds=$rounds)")
  }

  test("identical docs collide on every minhash band") {
    val t = docs(Seq((1L, base, "en"), (2L, base, "en")))
    val pairs = Dedup.dedupMinhash(t).collect()
    assert(pairs.length == 1 && pairs(0).getLong(2) == 8L, "8 of 8 bands shared")
  }

  /** Star contraction vs an in-memory union-find on adversarial graph
    * shapes — chains (worst-case round count), cliques (one-round
    * collapse), stars, and seeded random sparse graphs. Labels must
    * match exactly: every edge-touched node mapped to its component's
    * minimum id.
    */
  test("star contraction == union-find on random and adversarial graphs") {
    import spark.implicits._
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      nodes.map(n => n -> find(n)).toMap
    }
    val rnd = new scala.util.Random(42)
    val graphs: Seq[(String, Seq[(Long, Long)])] = Seq(
      "chain-30" -> (1L until 30L).map(i => (i, i + 1)),
      "clique-12" -> (for (i <- 1L to 12L; j <- (i + 1) to 12L) yield (i, j)),
      "star-20" -> (2L to 20L).map(i => (100L, i)),
      "two-comps" -> (Seq((1L, 2L), (2L, 3L)) ++ Seq((10L, 11L), (11L, 12L), (10L, 12L)))
    ) ++ (0 until 4).map { g =>
      // sparse random: ~n edges over n nodes → many small components
      val n = 40 + g * 20
      s"random-$g" -> Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
    }
    graphs.foreach { case (name, edges) =>
      val pairs = edges.toDF("id_a", "id_b")
      val want = unionFind(edges)
      // default gate → driver-local union-find path (these graphs are tiny)
      val (lLoc, iLoc) = Dedup.starComponents(pairs, maxIter = 20)
      assert(iLoc == -1, s"$name: small graph takes the local path")
      assert(lLoc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == want,
        s"$name: local-path labels == union-find")
      // gate forced shut → distributed star-contraction path
      val (lStar, iters) = Dedup.starComponents(pairs, maxIter = 20, maxLocalEdges = -1L)
      val got = lStar.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"$name: star labels == union-find (iters=$iters)")
    }
  }

  // ---- C33b ngramJaccardIncremental ------------------------------------

  private def rawDocs(rows: Seq[(Long, String)]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("incremental near-dup pairs == full recompute, with exact provenance") {
    val nearDup2 = base.replace("quick brown", "swift brown")
    val nearDup3 = base.replace("cat sleeps", "dog sleeps")
    // cur: 1,2 unchanged near-dups; 3 changed (was unrelated in prev, now
    // a near-dup); 4 added near-dup; prev-only 9 removed
    val cur = rawDocs(Seq((1L, base), (2L, nearDup), (3L, nearDup2), (4L, nearDup3)))
    val prev = rawDocs(Seq((1L, base), (2L, nearDup), (3L, unrelated), (9L, unrelated)))
    val inc = Dedup.ngramJaccardIncremental(cur, prev,
      Dedup.minhashBands(prev, 3, 8, 4), Dedup.ngramJaccardDocs(prev, 3, 8, 4, 0.0))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet
    val full = Dedup.ngramJaccardDocs(cur, 3, 8, 4, 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inc.map(x => (x._1, x._2, x._3)) == full,
      s"pair set + jaccard identical to full recompute (inc=$inc full=$full)")
    val srcBy = inc.map(x => (x._1, x._2) -> x._4).toMap
    assert(srcBy.get((1L, 2L)).contains("carried"),
      "the both-unchanged pair carries forward")
    assert(srcBy.filter(_._1 != (1L, 2L)).values.forall(_ == "fresh"),
      s"every dirty-touching pair is re-verified: $srcBy")
    assert(srcBy.values.exists(_ == "fresh"), "planted dirty pairs present")
  }

  test("carried pairs are previous output VERBATIM (poisoned-jaccard sentinel)") {
    val nearDup2 = base.replace("quick brown", "swift brown")
    val cur = rawDocs(Seq((1L, base), (2L, nearDup), (3L, nearDup2)))
    val prev = rawDocs(Seq((1L, base), (2L, nearDup), (3L, unrelated)))
    // poison every prev jaccard: a recompute of the unchanged pair (1,2)
    // would overwrite the sentinel and break this assertion
    val poisoned = Dedup.ngramJaccardDocs(prev, 3, 8, 4, 0.0)
      .withColumn("jaccard", lit(-1.0))
    val out = Dedup.ngramJaccardIncremental(cur, prev,
      Dedup.minhashBands(prev, 3, 8, 4), poisoned)
      .filter(col("id_a") === 1L && col("id_b") === 2L).collect()
    assert(out.length == 1, "unchanged pair present exactly once")
    assert(out(0).getDouble(2) == -1.0 && out(0).getString(3) == "carried",
      "carried row is the previous output verbatim, never recomputed")
  }

  test("incremental == full on the real corpus against the simulated prev") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val cur = t.documents.select(col("doc_id"), col("text"))
    val prev = graft.operators.TextAnalysis.simulatedPrev(cur)
    val inc = Dedup.ngramJaccardIncremental(cur, prev,
      Dedup.minhashBands(prev, 3, 8, 4), Dedup.ngramJaccardDocs(prev, 3, 8, 4, 0.0))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    val full = Dedup.ngramJaccardDocs(cur, 3, 8, 4, 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inc.map(x => (x._1, x._2, x._3)).toSet == full,
      "real-corpus parity: incremental == full recompute")
    def dirty(id: Long) = id % 13 == 5 || id % 17 == 3
    inc.foreach { case (a, b, _, src) =>
      val want = if (dirty(a) || dirty(b)) "fresh" else "carried"
      assert(src == want, s"pair ($a,$b) provenance $src, expected $want")
    }
  }

  /** Brute-force winnowing reference: BigInt polynomial hashes of every
    * length-l codepoint window, min of every w consecutive, distinct
    * sorted — the definition the one-pass kernel must reproduce.
    */
  private def winnowRef(s: String, l: Int, w: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    if (cps.length < l) return Seq.empty
    val P = BigInt((1L << 61) - 1)
    val hs = (0 to cps.length - l).map { i =>
      cps.slice(i, i + l).foldLeft(BigInt(0))((a, c) => (a * 257 + c) % P)
    }
    val m = hs.length
    val t = math.max(1, m - w + 1)
    (0 until t).map(j => hs.slice(j, math.min(j + w, m)).min)
      .distinct.sorted.map(_.toLong)
  }

  test("winnow kernel matches the brute-force reference (incl. non-BMP)") {
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(42)
    val alphabets = Seq(
      ('a' to 'z').map(_.toString),
      Seq("a", "b", " "),                             // tiny alphabet → hash ties exercise the deque
      Seq("a", "é", "中", new String(Character.toChars(0x1F600)))) // multi-byte + surrogate pair
    for (alpha <- alphabets; n <- Seq(0, 5, 23, 24, 25, 30, 31, 80, 400); trial <- 1 to 3) {
      val s = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
      val got = graft.functions.Kernels.winnowHashes(UTF8String.fromString(s), 24, 8)
        .toLongArray().toSeq
      val want = winnowRef(s, 24, 8)
      assert(got == want, s"alpha=${alpha.mkString}|n=$n: $got != $want")
    }
  }

  test("substring dedup pairs docs sharing an exact run >= l+w-1, not unrelated") {
    // winnowing guarantee: any exact normalized substring match of
    // >= 24+8-1 = 31 codepoints shares a selected fingerprint
    val shared = "this exact boilerplate license header sentence travels verbatim" // 63 chars
    val t = docs(Seq(
      (1L, s"Document one begins here. $shared And then diverges completely afterwards.", "en"),
      (2L, s"totally different opener for doc two. $shared Trailing content differs too.", "en"),
      (3L, "no overlap with anything else at all; an island of unique prose standing alone here.", "en")))
    val pairs = Dedup.substringDedup(t).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)), s"planted shared run must pair: $pairs")
    assert(pairs((1L, 2L)) >= 1L)
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L), s"island doc never pairs: $pairs")
  }

  test("substring dedup: whitespace/case normalization, short docs, hot-fp cap") {
    val run = "Shared   Sentence With IRREGULAR    spacing and case kept long enough to fingerprint"
    val t = docs(Seq(
      (1L, s"prefix one ${run.toLowerCase.replaceAll("\\s+", " ")} suffix one", "en"),
      (2L, s"prefix two $run suffix two", "en"),   // same after norm
      (3L, "tiny", "en")))                          // < l codepoints → no fingerprints
    assert(Dedup.substringDedup(t).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)),
      "normalization equates case/whitespace variants; short doc emits nothing")
    assert(Dedup.substringFingerprints(t).filter(col("doc_id") === 3L).count() == 0)
    // boilerplate cap: the same run planted in 5 docs pairs all 10 ways at
    // the default cap, but a cap below the doc count drops the fingerprints
    val many = docs((1L to 5L).map(i => (i, s"doc $i says: $run", "en")))
    assert(Dedup.substringDedup(many).count() == 10L, "5 sharers -> C(5,2) pairs")
    assert(Dedup.substringDedup(many, maxDocsPerFp = 4L).count() == 0L,
      "cap below sharer count drops the boilerplate fingerprint entirely")
  }

  test("containment is directional: quoted doc ~1.0 into its wrapper, wrapper low into quote") {
    val quote = "the five boxing wizards jump quickly over the lazy dog while zephyrs vex a daft jim"
    val wrapper = "posted yesterday by an aggregator bot with banner navigation text " + quote +
      " click here to subscribe and share this wonderful content with all your friends today"
    val other = "completely unrelated musings about distributed shuffle hash joins and broadcast exchanges"
    val t = docs(Seq((1L, quote, "en"), (2L, wrapper, "en"), (3L, other, "en")))
    val got = Dedup.containment(t, minContain = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(got((1L, 2L)) == 1.0, s"quote fully contained in wrapper: $got")
    assert(got((2L, 1L)) < 0.6, s"wrapper only partially contained in quote: $got")
    assert(!got.contains((1L, 3L)) && !got.contains((3L, 1L)), s"unrelated docs share nothing: $got")
    // the shipped threshold keeps the contained direction only
    val thresholded = Dedup.containment(t, minContain = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(thresholded == Set((1L, 2L)), s"threshold keeps A-in-B only: $thresholded")
  }

  test("sourceSimilarity: mirrored sources estimate 1.0, disjoint sources stay low") {
    import spark.implicits._
    // srcA and srcB hold the same TEXTS under different doc ids (a mirror
    // dump): their union shingle sets are identical, so every MinHash
    // slot min agrees. srcC is disjoint content.
    val texts = Seq(base, nearDup, unrelated,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "one two three four five six seven eight nine ten eleven twelve")
    val rows =
      texts.zipWithIndex.map { case (s, i) => (i.toLong, s, "en", "srcA") } ++
      texts.zipWithIndex.map { case (s, i) => (100L + i, s, "en", "srcB") } ++
      Seq((200L, "nothing here resembles the mirrored corpora in any window of three words", "en", "srcC"),
          (201L, "entirely fresh sentences about submarines exploring luminous oceanic trenches", "en", "srcC"))
    val df = rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("docs").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.sourceSimilarity(Tables(spark, dir))
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(got(("srcA", "srcB")) == ((32L, 1.0)), s"mirror sources agree on all slots: $got")
    assert(got(("srcA", "srcC"))._2 < 0.3, s"disjoint sources estimate low: $got")
    assert(got(("srcB", "srcC")) == got(("srcA", "srcC")),
      "mirrored sources see srcC identically (signature is a pure set function)")
  }

  test("leakageSafeSplit keeps every near-dup cluster on ONE side, split by the exact bucket formula") {
    val words = (0 until 50).map(i => s"w$i")
    val a = words.mkString(" ")
    val b = words.updated(10, "xx").mkString(" ")          // near-dup of a
    val t = docs(Seq((1L, a, "en"), (2L, b, "en"), (3L, unrelated, "en"),
      (4L, "another entirely separate text about gardening tools and soil preparation methods", "en")))
    val got = Dedup.leakageSafeSplit(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byDoc = got.map(r => r._1 -> (r._2, r._3)).toMap
    // cluster cohesion: the near-dup pair shares cluster AND split
    assert(byDoc(1L)._1 == byDoc(2L)._1 && byDoc(1L)._2 == byDoc(2L)._2,
      s"near-dup family assigned atomically: $byDoc")
    // the split is the documented deterministic function of cluster_id
    got.foreach { case (_, cid, split) =>
      val expected = if (((cid % 1000000007L) * 2654435761L) % 97L < 87L) "train" else "val"
      assert(split == expected, s"bucket formula for cluster $cid: got $split")
    }
    // rerun -> identical assignment (stable across backfills)
    val again = Dedup.leakageSafeSplit(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq, "deterministic across runs")
  }

  test("jaccardJoinExact: hand-computed pairs at/above/below the threshold; boundary 0.5 included") {
    val t = docs(Seq(
      // A/B: 3-shingle sets {abc,bcd,cde,def} vs {abc,bcd,cde,deg}:
      // inter 3, union 5 -> J = 0.6 (in)
      (1L, "a b c d e f", "en"),
      (2L, "a b c d e g", "en"),
      // C shares ONE shingle (abc) with A: J = 1/7 (out — sharing a
      // token is necessary, not sufficient)
      (3L, "a b c x y z", "en"),
      // D/E: {pqr,qrs,rst} vs {pqr,qrs,rsu}: inter 2, union 4 -> exactly
      // J = 0.5 — the >= boundary must include it
      (4L, "p q r s t", "en"),
      (5L, "p q r s u", "en"),
      // F/G: one shared shingle out of many -> far below (out)
      (6L, "f1 f2 f3 f4 f5", "en"),
      (7L, "f1 f2 f3 zz yy", "en"),
      // identical twins -> J = 1.0
      (8L, "w1 w2 w3 w4", "en"),
      (9L, "w1 w2 w3 w4", "en")))
    val got = Dedup.jaccardJoinExact(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    assert(got.toSeq == Seq((1L, 2L, 0.6), (4L, 5L, 0.5), (8L, 9L, 1.0)), s"got ${got.toSeq}")
  }

  test("jaccardJoinExact: a pathological prefix bucket is refused loudly before the pair join") {
    // every doc's ONLY shingle is the same -> that token is in every
    // prefix; with maxPrefixBucket=2 the gate must refuse (and name the
    // remedy) rather than start a quadratic bucket join
    val t = docs((1L to 5L).map(i => (i, "same text here", "en")))
    val e = intercept[IllegalArgumentException] {
      Dedup.jaccardJoinExact(t, maxPrefixBucket = 2)
    }
    assert(e.getMessage.contains("maxPrefixBucket") && e.getMessage.contains("dedup_exact"),
      e.getMessage)
    // without the gate the answer itself is fine (all C(5,2) exact dups)
    assert(Dedup.jaccardJoinExact(t).count() == 10L, "exact output on the degenerate corpus")
  }

  test("jaccardJoinExact: total candidate volume over budget is refused loudly, naming the LSH path") {
    val t = docs((1L to 5L).map(i => (i, "same text here", "en")))
    // C(5,2)=10 candidate pairs against a budget of 3: must refuse BEFORE
    // the pair join, pointing at dedupMinhash / threshold as the remedies
    val e = intercept[IllegalArgumentException] {
      Dedup.jaccardJoinExact(t, maxCandidates = 3L)
    }
    assert(e.getMessage.contains("maxCandidates") && e.getMessage.contains("dedupMinhash"),
      e.getMessage)
    // inside the budget the same corpus runs to the exact answer
    assert(Dedup.jaccardJoinExact(t, maxCandidates = 100L).count() == 10L)
  }

  test("lshDesign: threshold lands near tau, curve matches the closed form, recall-favoring ties") {
    val (b, r, curve) = Dedup.lshDesign(tau = 0.5, maxPerms = 64)
    assert(b * r <= 64, s"budget respected: b=$b r=$r")
    val thr = math.pow(1.0 / b, 1.0 / r)
    assert(math.abs(thr - 0.5) < 0.05, s"banding threshold near tau: $thr (b=$b r=$r)")
    // the curve IS the closed form at each requested J
    curve.foreach { case (j, p) =>
      assert(p == 1.0 - math.pow(1.0 - math.pow(j, r), b), s"closed form at $j")
    }
    // steep S-curve: well above tau detection is near-certain, well
    // below it is unlikely
    val m = curve.toMap
    assert(m(0.9) > 0.98 && m(0.3) < 0.35, s"S-curve separation: $m")
    // the repo's own default near-dup config (8 bands x 4 rows) sits at
    // threshold (1/8)^(1/4) ~ 0.595 - the designer must reproduce it
    // when asked for that tau under the same budget
    val (b2, r2, _) = Dedup.lshDesign(tau = math.pow(1.0 / 8, 1.0 / 4), maxPerms = 32)
    assert(b2 == 8 && r2 == 4, s"recovers the deployed design: b=$b2 r=$r2")
  }
}

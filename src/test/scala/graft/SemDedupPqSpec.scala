package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Similarity, TextAnalysis}

/** Planted-ground-truth tests for the round-12 additions: C40 line_dedup,
  * C41 rrf_fusion, C42 semdedup, C43 pq_encode / ann_pq.
  */
class SemDedupPqSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def embeddings(rows: Seq[(Long, Seq[Float], String)]): Tables = {
    import spark.implicits._
    val df = rows.toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("emb").toString
    df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Tables(spark, dir)
  }

  private def docs(rows: Seq[(Long, String)]): Tables = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("test"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("docs").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables(spark, dir)
  }

  /** Both tables in one dir, ids unified (rrf_fusion's corpus convention). */
  private def corpus(drows: Seq[(Long, String)],
                     erows: Seq[(Long, Seq[Float], String)]): Tables = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("corpus").toString
    drows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("test"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    erows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Tables(spark, dir)
  }

  // ---------------------------------------------------------------- C40

  test("lineDedup keeps first occurrences in order and reassembles") {
    val t = docs(Seq(
      (1L, "a\nb\na\nc\nb"),
      (2L, "x\ny"),
      (3L, "same\nsame\nsame")))
    val got = TextAnalysis.lineDedup(t, sep = "\n").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((5L, 3L, "a\nb\nc")), s"doc1: ${got(1L)}")
    assert(got(2L) == ((2L, 2L, "x\ny")), s"doc2: ${got(2L)}")
    assert(got(3L) == ((3L, 1L, "same")), s"doc3: ${got(3L)}")
  }

  test("lineDedup matches on lower+trim but keeps the ORIGINAL first segment") {
    val t = docs(Seq((1L, "Hello \nhello\nHELLO\nworld")))
    val got = TextAnalysis.lineDedup(t, sep = "\n").collect().head
    assert(got.getLong(1) == 4L && got.getLong(2) == 2L)
    // the surviving text is the raw first occurrence, not the normalization
    assert(got.getString(3) == "Hello \nworld", s"got: ${got.getString(3)}")
  }

  test("lineDedup is a zero-shuffle narrow plan") {
    val t = docs(Seq((1L, "a\nb")))
    val plan = TextAnalysis.lineDedup(t).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
  }

  // ---------------------------------------------------------------- C41

  test("rrfFusion matches the hand-computed reciprocal-rank formula") {
    // doc 1: bm25 hit only; doc 2: both; doc 3: dense only (+ query vec 0)
    val t = corpus(
      Seq((0L, "nothing relevant here"),
        (1L, "apple apple apple apple"),
        (2L, "apple banana"),
        (3L, "cherry")),
      Seq((0L, Seq(1f, 0f, 0f, 0f), "q"),
        (1L, Seq(0f, 1f, 0f, 0f), "a"),   // orthogonal: sim 0
        (2L, Seq(1f, 0.1f, 0f, 0f), "b"), // high sim
        (3L, Seq(1f, 0f, 0.5f, 0f), "c"))) // medium sim
    val rows = TextAnalysis.rrfFusion(t, query = "apple banana", queryVecId = 0L,
      n = 10, k = 10, kf = 60).collect()
      .map(r => r.getLong(1) -> ((Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getDouble(4)))).toMap
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    // bm25: doc1 tf=4 of 'apple' vs doc2 both terms — verify ranks exist and
    // the fused score equals the formula for whatever ranks were assigned
    rows.foreach { case (id, (rb, rd, score)) =>
      val expect = r6(rb.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        rd.map(r => 1.0 / (60 + r)).getOrElse(0.0))
      assert(score == expect, s"doc $id: score $score != $expect (rb=$rb rd=$rd)")
    }
    // doc 2 appears in BOTH rankings -> two reciprocal terms -> top fused
    assert(rows(2L)._1.isDefined && rows(2L)._2.isDefined, s"doc2 in both: ${rows(2L)}")
    val top = TextAnalysis.rrfFusion(t, query = "apple banana", queryVecId = 0L,
      n = 10, k = 1).collect().head.getLong(1)
    assert(top == 2L, s"two-list member outranks single-list members: $top")
    // doc 3 is dense-only: bm25_rank NULL, dense_rank present
    assert(rows(3L)._1.isEmpty && rows(3L)._2.isDefined, s"doc3: ${rows(3L)}")
  }

  // ---------------------------------------------------------------- C42

  test("semDedup drops the centroid-near member of a near-dup pair") {
    // centroids = first 2 vectors (cells 0, 1). Vectors 2 and 3 both land
    // in cell 0; 3 is exactly the centroid direction (sim_centroid 1.0),
    // 2 is slightly off. cos(2,3) > threshold -> the pair drops 3 (the
    // centroid-near copy), keeps 2. Vector 4 sits alone in cell 1.
    val t = embeddings(Seq(
      (0L, Seq(1f, 0f, 0f, 0f), "c0"),
      (1L, Seq(0f, 1f, 0f, 0f), "c1"),
      (2L, Seq(1f, 0.2f, 0f, 0f), "x"),
      (3L, Seq(2f, 0f, 0f, 0f), "x"),
      (4L, Seq(0f, 1f, 1f, 0f), "y")))  // cos to c1 = 0.7071 < 0.9: no pair
    val got = Similarity.semDedup(t, nCells = 2, threshold = 0.9)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got(3L)._1 == 0L && !got(3L)._3, s"centroid-near dup dropped: ${got(3L)}")
    assert(got(2L)._1 == 0L && got(2L)._3, s"far member kept: ${got(2L)}")
    assert(got(4L)._1 == 1L && got(4L)._3, s"no-pair member kept: ${got(4L)}")
    // centroid vectors themselves: 0 pairs with 2 and 3 in cell 0 and IS
    // the centroid (sim 1.0) -> dropped; 1 pairs with 4 at sim 0.7071 -> kept
    assert(!got(0L)._3 && got(1L)._3)
    assert(got(3L)._2 == 1.0, s"sim_centroid of exact-direction copy: ${got(3L)._2}")
  }

  test("semDedup self-sizes nCells: floor at 16, ~1024 expected cell above") {
    // small corpus -> the floor: all cell ids < 16
    val rows = (0L until 40L).map(i => (i, Seq(1f, i.toFloat / 100f, 0f, 0f), "x"))
    val cells = Similarity.semDedup(embeddings(rows), threshold = 2.0) // no pairs
      .select(col("cell_id")).collect().map(_.getLong(0)).toSet
    assert(cells.forall(_ < 16L), s"self-sized floor is 16 cells: $cells")
    // pin the arithmetic the oracle mirrors: max(16, ceil(n/1024))
    assert(math.max(16L, (200000L + 1023L) / 1024L) == 196L)
  }

  test("semDedup refuses an over-populated expected cell") {
    val rows = (0L until 40L).map(i => (i, Seq(1f, i.toFloat / 100f, 0f, 0f), "x"))
    val e = intercept[IllegalArgumentException] {
      Similarity.semDedup(embeddings(rows), nCells = 2, maxExpectedCell = 10L)
    }
    assert(e.getMessage.contains("nCells"), e.getMessage)
  }

  // ---------------------------------------------------------------- C43

  test("pqEncode recovers exact codebook members with zero error") {
    // m=2 subspaces of dim 2, ksub=2 codebooks from vectors 0 and 1
    val t = embeddings(Seq(
      (0L, Seq(1f, 0f, 5f, 5f), "a"),
      (1L, Seq(0f, 1f, -5f, -5f), "b"),
      (2L, Seq(0f, 1f, 5f, 5f), "mix"),   // sub0 = v1's, sub1 = v0's
      (3L, Seq(1f, 0f, 5f, 5f), "dup0"))) // identical to v0
    // schema: vec_id, code_0..code_3, qerr — with m=2 only code_0/code_1
    // are non-null; read columns by name
    val byName = Similarity.pqEncode(t, m = 2, ksub = 2)
      .select(col("vec_id"), col("code_0"), col("code_1"), col("qerr")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(byName(3L) == ((0L, 0L, 0.0)), s"exact member of cb0: ${byName(3L)}")
    assert(byName(2L) == ((1L, 0L, 0.0)), s"mixed subspaces: ${byName(2L)}")
    assert(byName(0L) == ((0L, 0L, 0.0)) && byName(1L) == ((1L, 1L, 0.0)))
  }

  test("pqEncode argmin tie breaks to the lowest code") {
    // both codebook entries equidistant from vector 2's subvectors
    val t = embeddings(Seq(
      (0L, Seq(1f, 0f, 1f, 0f), "a"),
      (1L, Seq(-1f, 0f, -1f, 0f), "b"),
      (2L, Seq(0f, 0f, 0f, 0f), "tie")))
    val got = Similarity.pqEncode(t, m = 2, ksub = 2)
      .select(col("vec_id"), col("code_0"), col("code_1")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(2L) == ((0L, 0L)), s"ties keep the first (lowest) code: ${got(2L)}")
  }

  test("annPq ADC distance is exact for codebook-exact corpus vectors") {
    // corpus vectors ARE codebook entries -> quantization is lossless and
    // ADC distance == true squared L2 distance to the query
    val t = embeddings(Seq(
      (0L, Seq(1f, 0f, 0f, 0f), "q"),
      (1L, Seq(0f, 1f, 0f, 0f), "a"),
      (2L, Seq(1f, 0f, 0f, 1f), "b"),
      (3L, Seq(1f, 0f, 0f, 0f), "dupq")))
    // ksub=4: all four vectors form each subspace's codebook
    val got = Similarity.annPq(t, queryVecId = 0L, m = 2, ksub = 4, k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // true L2²: d(0,3)=0, d(0,2)=1, d(0,1)=2 -> ascending order 3,2,1
    assert(got.map(_._1).toSeq == Seq(3L, 2L, 1L), s"ADC order: ${got.toSeq}")
    assert(got.map(_._2).toSeq == Seq(0.0, 1.0, 2.0), s"ADC dists: ${got.toSeq}")
  }

  test("annPq recalls the planted nearest cluster under real quantization") {
    // 3 well-separated blobs of 8, ids INTERLEAVED (id mod 3 = blob) so
    // the first-ksub codebook spans all blobs — a codebook drawn from one
    // blob cannot represent the others and ADC degenerates (quantization
    // error swallows the between-blob distance; verified while writing
    // this test). Query = id 0 (blob 0): top-7 must be the other blob-0
    // members, ids ≡ 0 (mod 3).
    val rnd = new scala.util.Random(7)
    val bases = Seq(
      Seq(10f, 0f, 0f, 0f, 10f, 0f, 0f, 0f),
      Seq(0f, 10f, 0f, 0f, 0f, 10f, 0f, 0f),
      Seq(0f, 0f, 10f, 0f, 0f, 0f, 10f, 0f))
    val rows = (0 until 24).map { i =>
      (i.toLong, bases(i % 3).map(v => v + rnd.nextFloat() * 0.05f), s"b${i % 3}")
    }
    val t = embeddings(rows)
    val top = Similarity.annPq(t, queryVecId = 0L, m = 4, ksub = 8, k = 7)
      .collect().map(_.getLong(0)).toSet
    assert(top == (3L until 24L by 3L).toSet, s"blob-0 members fill the top-7: $top")
  }

  test("annIvfPq probing all cells degenerates to exactly annPq") {
    val rnd = new scala.util.Random(19)
    val rows = (0L until 60L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 6f - 3f), "x"))
    val t = embeddings(rows)
    val full = Similarity.annPq(t, queryVecId = 0L, m = 4, ksub = 8, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ivf = Similarity.annIvfPq(t, queryVecId = 0L, nCells = 6, nProbe = 6,
      m = 4, ksub = 8, k = 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivf == full, s"all-cells IVF-PQ != brute ADC:\n$ivf\n$full")
  }

  test("annIvfPq recalls the query's blob through cell pruning + ADC") {
    val rnd = new scala.util.Random(7)
    val bases = Seq(
      Seq(10f, 0f, 0f, 0f, 10f, 0f, 0f, 0f),
      Seq(0f, 10f, 0f, 0f, 0f, 10f, 0f, 0f),
      Seq(0f, 0f, 10f, 0f, 0f, 0f, 10f, 0f))
    val rows = (0 until 24).map { i =>
      (i.toLong, bases(i % 3).map(v => v + rnd.nextFloat() * 0.05f), s"b${i % 3}")
    }
    val t = embeddings(rows)
    val top = Similarity.annIvfPq(t, queryVecId = 0L, nCells = 6, nProbe = 2,
      m = 4, ksub = 8, k = 7).collect().map(_.getLong(0)).toSet
    assert(top == (3L until 24L by 3L).toSet, s"blob-0 members via probed cells: $top")
  }

  test("pqRefine with a full-corpus shortlist degenerates to exact search") {
    val rnd = new scala.util.Random(23)
    val rows = (0L until 60L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 6f - 3f), "x"))
    val t = embeddings(rows)
    val exact = Similarity.annTopK(t, queryVecId = 0L, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val refined = Similarity.pqRefine(t, queryVecId = 0L, m = 4, ksub = 8,
      nShort = 60, k = 10).collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(refined == exact, s"full-shortlist refine != exact top-k:\n$refined\n$exact")
  }

  test("pqRefine re-ranking beats raw ADC order against the exact ranking") {
    // blobs as in the annPq recall test: ADC ordering inside the winning
    // blob is quantization-noisy; the exact re-rank must reproduce the
    // true top-k ORDER, which raw ADC generally does not
    val rnd = new scala.util.Random(7)
    val bases = Seq(
      Seq(10f, 0f, 0f, 0f, 10f, 0f, 0f, 0f),
      Seq(0f, 10f, 0f, 0f, 0f, 10f, 0f, 0f),
      Seq(0f, 0f, 10f, 0f, 0f, 0f, 10f, 0f))
    val rows = (0 until 24).map { i =>
      (i.toLong, bases(i % 3).map(v => v + rnd.nextFloat() * 0.05f), s"b${i % 3}")
    }
    val t = embeddings(rows)
    val exactIds = Similarity.annTopK(t, queryVecId = 0L, k = 7)
      .collect().map(_.getLong(0)).toSeq
    val refinedIds = Similarity.pqRefine(t, queryVecId = 0L, m = 4, ksub = 8,
      nShort = 12, k = 7).collect().map(_.getLong(0)).toSeq
    assert(refinedIds == exactIds,
      s"refined order must equal the exact order on shortlist survivors: $refinedIds vs $exactIds")
  }

  test("pqEncodeWhitened: relative distortion drops on a planted anisotropic corpus (OPQ-lite)") {
    // planted anisotropy: 8 dims driven by 8 independent pseudo-random
    // sources with wildly unequal scales AND cross-subspace correlation
    // (dims 4..7 mirror dims 0..3) — exactly the shape where plain PQ's
    // independent sub-quantizers waste their bit budget. After
    // whitening every kept component has unit variance, so the claim
    // under test is RELATIVE distortion (qerr normalized by per-dim
    // variance): whitened < unwhitened, measured.
    def z(i: Long, salt: Long) = (((i * 2654435761L + salt * 40503L) % 1009).toDouble / 1009.0) - 0.5
    val scales = Seq(80.0, 40.0, 0.05, 0.02)
    val rows = (0L until 300L).map { i =>
      val base = (0 until 4).map(d => scales(d) * z(i, d))
      val mirrored = (0 until 4).map(d => 0.97 * base(d) + 0.03 * scales(d) * z(i, d + 7))
      (i, (base ++ mirrored).map(_.toFloat), "x")
    }
    val t = embeddings(rows)
    // The metric where whitening provably helps is VARIANCE-NORMALIZED
    // (Mahalanobis) distortion — the distance the downstream search
    // actually runs in. Raw per-subspace PQ error is scale-invariant,
    // so plain PQ looks fine in raw L2 even here; but its subspaces
    // encode the correlated halves INDEPENDENTLY, so the residual along
    // the small eigendirections (the 0.03-noise differences) is
    // quantization-sized while the direction's own variance is tiny —
    // 1/λ blows it up. Whitened PQ holds those directions as explicit
    // unit-variance components and quantizes them with full precision.
    val (_, rot) = Similarity.whitenRotation(t, 0, 1e-9)
    def mah2PerDim(residual: Seq[Double]): Double =
      rot.map(row => row.zip(residual).map { case (a, b) => a * b }.sum)
        .map(x => x * x).sum / rot.length
    // plain reconstruction from codes + the deterministic first-ksub
    // codebooks (codebook s entry c = vector c's s-th subvector)
    val byId = rows.map(r => r._1 -> r._2.map(_.toDouble).toSeq).toMap
    val baseVecs = rows.sortBy(_._1).take(16).map(_._2.map(_.toDouble).toSeq)
    val plainDist = Similarity.pqEncode(t, m = 4, ksub = 16)
      .orderBy(col("vec_id")).collect().map { r =>
        val x = byId(r.getLong(0))
        val recon = (0 until 4).flatMap(s =>
          baseVecs(r.getLong(1 + s).toInt).slice(s * 2, s * 2 + 2))
        mah2PerDim(x.zip(recon).map { case (a, b) => a - b })
      }.sum / rows.length
    val wDf = Similarity.pqEncodeWhitened(t, m = 4, ksub = 16)
    // whitened qerr is ALREADY per-dim squared error in whitened
    // (= Mahalanobis) units — directly comparable
    val whiteDist = wDf.agg(avg(col("qerr"))).head().getDouble(0)
    assert(wDf.count() == 300, "every vector encodes")
    assert(whiteDist < plainDist * 0.5,
      s"whitening must cut Mahalanobis PQ distortion on a correlated anisotropic corpus: " +
        s"white=$whiteDist plain=$plainDist")
    // determinism: same corpus, same codes
    val a = wDf.orderBy(col("vec_id")).collect().map(_.toSeq)
    val b = Similarity.pqEncodeWhitened(t, m = 4, ksub = 16)
      .orderBy(col("vec_id")).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, "pqEncodeWhitened is rerun-deterministic")
  }

  test("native keepFirstSegs kernel matches the HOF formulation row-for-row") {
    val rnd = new scala.util.Random(11)
    val words = Seq("a", "b", "A ", " b", "cc", "Dd", "dd", "", "eÉ", "eé")
    val rows = (0L until 200L).map { i =>
      (i, Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.size))).mkString(" "))
    }
    val t = docs(rows)
    val native = TextAnalysis.lineDedup(t, sep = " ").collect().map(_.toSeq).toSet
    val hof = TextAnalysis.lineDedupHof(t, sep = " ").collect().map(_.toSeq).toSet
    assert(native == hof, s"kernel/HOF divergence: ${native.diff(hof)} vs ${hof.diff(native)}")
  }

  test("native nearest-centroid kernel matches the HOF fold (incl. NaN and tie rows)") {
    val rnd = new scala.util.Random(17)
    val rows = (0L until 300L).map(i =>
      (i, Seq.fill(6)(rnd.nextFloat() * 4f - 2f), "x")) :+
      (300L, Seq.fill(6)(0f), "zero") // zero-norm -> all-NaN cosines
    val t = embeddings(rows)
    // centroids: first 4 corpus vectors + a DUPLICATE of centroid 0 at the
    // end — an exact cosine tie the first-max scan must resolve to the
    // EARLIER position on both paths
    val base = rows.take(4).map(_._2)
    val centRows = (base :+ base.head).zipWithIndex
      .map { case (v, i) => (100L + i.toLong, v) }.toArray
    val df = t.embeddings.select(col("vec_id"), col("embedding"))
    val native = Similarity.assignCells(df, "vec_id", "embedding", centRows)
      .select(col("vec_id"), col("cell_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hof = df.withColumn("cell_id",
        Similarity.nearestCellColHof(centRows, "embedding").cast("long"))
      .select(col("vec_id"), col("cell_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == hof,
      s"divergent assignments: ${native.filter { case (k, v) => hof(k) != v }.take(5)}")
    assert(native(300L) == 100L, "all-NaN row lands deterministically in cell 0")
    assert(!native.values.exists(_ == 104L), "tie always resolves to the earlier duplicate")
  }

  test("native PQ encode kernel matches the HOF formulation row-for-row") {
    val rnd = new scala.util.Random(13)
    val rows = (0L until 150L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 20f - 10f), "x"))
    val t = embeddings(rows)
    val native = Similarity.pqEncode(t, m = 4, ksub = 8).collect().map(_.toSeq).toSet
    val hof = Similarity.pqEncodeHof(t, m = 4, ksub = 8).collect().map(_.toSeq).toSet
    assert(native == hof, s"kernel/HOF divergence: ${native.diff(hof)} take 3: ${native.diff(hof).take(3)}")
  }

  test("pqEncode and annPq plan as zero-shuffle scans + bounded take") {
    val rows = (0L until 20L).map(i => (i, Seq.tabulate(8)(d => (i + d).toFloat), "x"))
    val t = embeddings(rows)
    val encPlan = Similarity.pqEncode(t, m = 4, ksub = 8).queryExecution.executedPlan.toString
    assert(!encPlan.contains("Exchange"), s"pqEncode shuffles:\n$encPlan")
    val annPlan = Similarity.annPq(t, 0L, m = 4, ksub = 8, k = 5)
      .queryExecution.executedPlan.toString
    assert(annPlan.contains("TakeOrderedAndProject"), s"annPq top-k:\n$annPlan")
    assert(!annPlan.contains("hashpartitioning"), s"annPq shuffles:\n$annPlan")
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** C45 embed_project tests: the hash-derived Achlioptas matrix
  * reproduced in plain Scala on a tiny vector, run-to-run determinism,
  * and the JL norm-preservation property on random vectors.
  */
class ProjectSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def embeddings(rows: Seq[(Long, Seq[Float], Int)]): Tables = {
    import spark.implicits._
    val df = rows.toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("proj").toString
    df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Tables(spark, dir)
  }

  /** Independent scalar reference of the operator's arithmetic. */
  private def reference(e: Seq[Float], r: Int): (Seq[Double], Double) = {
    val d = e.size
    val scale = math.sqrt(3.0 / r)
    val proj = (0 until r).map { i =>
      var acc = 0.0
      for (j <- 0 until d) {
        val m = (i.toLong * d + j) * 2654435761L % 1000000007L % 6L
        if (m == 0L) acc += e(j).toDouble
        else if (m == 1L) acc -= e(j).toDouble
      }
      scale * acc
    }
    (proj, math.sqrt(proj.map(x => x * x).sum))
  }

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
  private def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  test("projection matches the scalar reference bit-for-bit on a hand-checked vector") {
    val e = Seq(1.0f, -2.0f, 0.5f, 3.25f, -0.75f)
    val t = embeddings(Seq((1L, e, 0)))
    val (proj, pn) = reference(e, 16)
    val row = Similarity.embedProject(t).collect()(0)
    assert(row.getDouble(1) == r6(proj(0)), s"proj_0 ${row.getDouble(1)} vs ${r6(proj(0))}")
    assert(row.getDouble(2) == r6(proj(1)))
    assert(row.getDouble(3) == r6(proj(2)))
    assert(row.getDouble(4) == r6(proj(3)))
    assert(row.getDouble(5) == r4(pn))
    // sanity that the matrix is not degenerate on this input: some
    // component must be nonzero (weights 0/1 both appear in the residues)
    assert(proj.exists(_ != 0.0))
  }

  test("deterministic across runs and row order") {
    val rng = new scala.util.Random(11)
    val rows = (0L until 20L).map(i => (i, Seq.fill(12)(rng.nextFloat() * 2f - 1f), 0))
    val a = Similarity.embedProject(embeddings(rows)).collect().map(_.toSeq).sortBy(_.head.toString)
    val b = Similarity.embedProject(embeddings(rng.shuffle(rows))).collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("native kernel == HOF parity reference, row-identical on fuzz incl. NaN") {
    val rng = new scala.util.Random(41)
    val rows = (0L until 30L).map { i =>
      val dims = Seq(1, 3, 16, 64)(rng.nextInt(4))
      val e = Seq.fill(dims)(rng.nextFloat() * 4f - 2f)
      // plant NaN into a few vectors — the fold must propagate identically
      (i, if (i % 7 == 0) e.updated(0, Float.NaN) else e, 0)
    }
    val t = embeddings(rows)
    val kernel = Similarity.embedProject(t, r = 16).collect()
      .map(_.toSeq).sortBy(_.head.toString)
    val hof = Similarity.projectOutput(
        t.embeddings.withColumn("proj", Similarity.embedProjectProjHof(16)))
      .collect().map(_.toSeq).sortBy(_.head.toString)
    // NaN != NaN under ==, so compare string forms for exact row identity
    assert(kernel.map(_.toString).toSeq == hof.map(_.toString).toSeq)
  }

  test("JL norm preservation: projected norms track input norms in aggregate") {
    val rng = new scala.util.Random(23)
    val rows = (0L until 40L).map(i => (i, Seq.fill(64)(rng.nextFloat() * 2f - 1f), 0))
    val inNorm = rows.map { case (id, e, _) => id -> math.sqrt(e.map(x => x.toDouble * x).sum) }.toMap
    val got = Similarity.embedProject(embeddings(rows), r = 32).collect()
      .map(r => r.getLong(0) -> r.getDouble(5)).toMap
    // E[|proj|^2] = |x|^2 under the Achlioptas scheme; with r = 32 the
    // per-vector ratio concentrates — demand the mean ratio within 15 %
    // and every individual ratio within a loose [0.4, 1.9] band
    val ratios = rows.map { case (id, _, _) => got(id) / inNorm(id) }
    val mean = ratios.sum / ratios.size
    assert(math.abs(mean - 1.0) < 0.15, s"mean norm ratio $mean")
    ratios.foreach(rt => assert(rt > 0.4 && rt < 1.9, s"ratio $rt out of band"))
  }
}

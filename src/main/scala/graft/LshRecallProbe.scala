package graft

import org.apache.spark.sql.functions._

/** Dev-only: measures embed_neardup_lsh RECALL at the self-sized band
  * width against the PLANTED near-dup cliques of a ScaleGen-derived
  * corpus (copies of one base vector differ only by the component-0
  * nudge, so every same-base pair is a construction-known near-dup).
  *
  * Ground truth = same-base pairs (base = vec_id % KeySpan) whose EXACT
  * cosine clears the threshold; recall = fraction of those the LSH path
  * surfaces. Precision is 1.0 by construction (the LSH path ends in the
  * same exact-cosine filter), so recall is the whole question — and it
  * is the number that degrades if self-sizing grows bandBits without
  * growing bands. Prints one JSON line per configuration: the self-sized
  * default, plus a doubled-bands run for the recall-vs-cost trade.
  *
  * Usage: tools/run_main.sh graft.LshRecallProbe [sfDir] [threshold]
  */
object LshRecallProbe {
  private val KeySpan = 100000000L // ScaleGen's copy shift

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/tmp/sf3")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.9)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)
    val n = t.embeddings.count()

    // planted truth: all same-base pairs at exact cosine >= threshold
    val base = t.embeddings.select((col("vec_id") % KeySpan).as("base"),
      col("vec_id"), col("embedding"))
    val truth = base.select(col("base"), col("vec_id").as("id_a"), col("embedding").as("ea"))
      .join(base.select(col("base"), col("vec_id").as("id_b"), col("embedding").as("eb")),
        Seq("base"))
      .filter(col("id_a") < col("id_b"))
      .filter(expr("graft_cosine(ea, eb)") >= threshold)
      .select(col("id_a"), col("id_b"))
    truth.cache()
    val nTruth = truth.count()

    // the operator's own self-sizing arithmetic, for the report line
    val q = (math.max(1L, n) - 1L) / 32L
    val bb = math.max(3, math.min(15, 64 - java.lang.Long.numberOfLeadingZeros(q)))

    def measure(tag: String, nPlanes: Int, maxBucket: Long = 100000L): Unit = {
      // stage 1 cost driver: pre-distinct collision volume = Σ C(sz,2)
      // over (band, bucket) — derived from bucket sizes alone (one agg,
      // no pair join), attributing candidate growth to bucket population
      val t0 = System.nanoTime()
      val collisions = operators.Similarity.embedNearDupLshBanded(t, nPlanes = nPlanes)
        .groupBy(col("band"), col("bval")).count()
        .agg((sum(col("count") * (col("count") - 1)) / 2).cast("long"))
        .collect()(0).getLong(0)
      val tCol = (System.nanoTime() - t0) / 1e9
      // stage 2: distinct candidate pairs (what the cosine verify pays)
      val t1 = System.nanoTime()
      val nCand = operators.Similarity.embedNearDupLshCandidates(t, nPlanes = nPlanes,
        maxBucket = maxBucket).count()
      val tCand = (System.nanoTime() - t1) / 1e9
      // end-to-end: the operator itself
      val t2 = System.nanoTime()
      val got = operators.Similarity.embedNearDupLsh(t, threshold, nPlanes = nPlanes,
        maxBucket = maxBucket).select(col("id_a"), col("id_b"))
      val hit = got.join(truth, Seq("id_a", "id_b"), "left_semi").count()
      val sec = (System.nanoTime() - t2) / 1e9
      val bands = if (nPlanes == 0) 4 + 2 * math.max(0, bb - 11) else nPlanes / bb
      println(s"""{"probe":"lsh_recall","config":"$tag","sf":"$sfDir","n":$n,""" +
        s""""band_bits":$bb,"n_bands":$bands,"max_bucket":$maxBucket,"threshold":$threshold,""" +
        s""""collision_pairs":$collisions,"collision_sec":$tCol,""" +
        s""""candidate_pairs":$nCand,"candidate_sec":$tCand,""" +
        s""""truth_pairs":$nTruth,"hit_pairs":$hit,""" +
        s""""recall":${hit.toDouble / math.max(1L, nTruth)},"sec":$sec}""")
    }
    // optional args(2): comma-separated config-name prefixes to run
    val only = args.lift(2).map(_.split(',').toSeq)
    def want(tag: String): Boolean = only.forall(_.exists(tag.startsWith))
    val selfBands = 4 + 2 * math.max(0, bb - 11)
    if (selfBands > 4 && want("bands_4_r10rule")) measure("bands_4_r10rule", 4 * bb)
    if (want("self_sized")) measure("self_sized", 0)
    if (want("double_bands")) measure("double_bands", 2 * selfBands * bb)
    // hot-bucket cap sweep at the self-sized band config: how much of
    // the candidate volume is mega-bucket noise, and what recall costs
    Seq(16384L, 4096L, 1024L).foreach { cap =>
      if (want(s"cap_$cap")) measure(s"cap_$cap", 0, cap)
    }
    spark.stop()
  }
}

package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.roundHalfUp

/** Training-mixture sampling operators (SURVEY.md §2 C16).
  *
  * Everything is DETERMINISTIC hash-based sampling — no rand(): a row's
  * keep/drop decision is a pure function of its id, so samples are
  * reproducible across runs, engines and retries (speculative tasks
  * cannot flip membership), and the operator stays a narrow map with no
  * shuffle and no state.
  */
object Sampling {

  private val P = 1000000007L

  /** Per-mille sampling bucket from a multiplicative hash of the id:
    * (pmod(id, P)·0x9E3779B1 mod P) mod 1000. The inner `(x % P + P) % P`
    * is a portable pmod — both Spark's and DuckDB's `%` keep the
    * dividend's sign, so a bare `id % P` on a negative id would yield a
    * negative bucket that passes every `bucket < rate` filter (kept at
    * 100 % regardless of stratum rate). The pmod result is in [0, P), so
    * the product stays < P·0x9E3779B1 < 2^63 (signed-64-safe in every
    * engine) and all later residues are non-negative.
    */
  private def bucket1000 = expr(s"(((doc_id % ${P}L + ${P}L) % ${P}L) * 2654435761L) % ${P}L % 1000")

  /** C16: stratified sampling for training mixtures — per-stratum
    * per-mille rates (e.g. downsample dominant languages, keep the tail).
    * Rates ship as a broadcast dimension table, so mixtures are data, not
    * code; the sample itself is a broadcast-joined narrow filter.
    */
  def sampleStratified(t: Tables,
                       ratesPerMille: Seq[(String, Int)] = Seq(
                         "en" -> 500, "de" -> 300, "es" -> 200, "fr" -> 100, "zh" -> 50)): DataFrame = {
    val spark = t.documents.sparkSession
    import spark.implicits._
    val rates = ratesPerMille.toDF("lang", "rate")
    t.documents
      .join(broadcast(rates), Seq("lang"))
      .withColumn("bucket", bucket1000)
      .filter(col("bucket") < col("rate"))
      .select(col("doc_id"), col("lang"), col("bucket"), col("n_chars"))
  }

  /** C19: training-mixture planning — given target weights per stratum,
    * compute the largest token budget whose per-stratum takes respect
    * both the weights and each stratum's available tokens:
    * budget = min over strata of (available_l / weight_l);
    * take_l = weight_l · budget; rate_l = take_l / available_l.
    * Availability aggregates to stratum cardinality, so the window min
    * and all arithmetic run on a broadcast-sized relation.
    */
  def mixPlan(t: Tables,
              weights: Seq[(String, Double)] = Seq(
                "en" -> 0.4, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.1, "zh" -> 0.1)): DataFrame = {
    val spark = t.documents.sparkSession
    import spark.implicits._
    val wdf = weights.toDF("lang", "weight")
    val nTokens = when(length(trim(col("text"))) === 0, 0L)
      .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
    val avail = t.documents
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(nTokens).as("n_tokens"))
    val weighted = avail.join(broadcast(wdf), Seq("lang"))
    // global min as a 1-row aggregate cross-joined back (broadcast) — the
    // unpartitioned-window formulation forces all rows onto one task,
    // which is wrong in principle even on a broadcast-sized relation
    val budget = weighted.agg(min(col("n_tokens") / col("weight")).as("budget"))
    weighted.crossJoin(broadcast(budget))
      .withColumn("take_tokens", floor(col("weight") * col("budget")).cast("long"))
      .withColumn("rate", roundHalfUp(col("weight") * col("budget") / col("n_tokens"), 4))
      .select(col("lang"), col("n_docs"), col("n_tokens"), col("weight"),
        col("take_tokens"), col("rate"))
  }

  /** C19b: APPLY the mixture plan — the plan→corpus step a training run
    * actually executes: [[mixPlan]]'s per-stratum sampling rate becomes
    * a deterministic per-mille hash cutoff, and the sampled corpus is
    * one broadcast-joined narrow filter over documents (rate·1000 vs the
    * integer bucket — both exactly representable, so no boundary row can
    * flip). Reproducible across runs, engines and speculative retries,
    * like all sampling here.
    */
  def mixApply(t: Tables,
               weights: Seq[(String, Double)] = Seq(
                 "en" -> 0.4, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.1, "zh" -> 0.1)): DataFrame = {
    val rates = mixPlan(t, weights).select(col("lang"), col("rate"))
    t.documents
      .join(broadcast(rates), Seq("lang"))
      .withColumn("bucket", bucket1000)
      .filter(col("bucket") < col("rate") * 1000)
      .select(col("doc_id"), col("lang"), col("bucket"))
  }

  /** C28: sequence packing for training — concatenate documents in
    * doc_id order and chunk the token stream at `seqLen`: each document
    * gets the training-sequence id and intra-sequence offset where it
    * starts (the concat-then-chunk packing LLM data loaders use; a doc
    * may straddle a boundary — the loader splits it there).
    *
    * The global running token count is a DISTRIBUTED PREFIX SUM, never a
    * single-partition window over the corpus: docs prefix-sum WITHIN
    * doc_id-range buckets in parallel (window partitioned by bucket),
    * and only the bucket-cardinality totals relation — √N-sized by
    * choosing bucketSize ≈ √N — runs the sequential prefix step, then
    * broadcasts back. At 10^11 docs with bucketSize 10^6 the sequential
    * step touches 10^5 rows; the corpus-sized passes stay parallel.
    */
  def packSequences(t: Tables, seqLen: Long = 512, bucketSize: Long = 1000): DataFrame = {
    val nTokens = when(length(trim(col("text"))) === 0, 0L)
      .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
    val docs = t.documents
      .select(col("doc_id"), nTokens.as("n_tokens"),
        expr(s"doc_id div ${bucketSize}L").as("bkt"))
    val wIn = Window.partitionBy(col("bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // sequential prefix over the bucket-cardinality totals; partitioning
    // by a constant states the single-group intent explicitly
    val wBkt = Window.partitionBy(lit(0)).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = docs.groupBy(col("bkt")).agg(sum(col("n_tokens")).as("bkt_total"))
      .withColumn("bkt_offset", coalesce(sum(col("bkt_total")).over(wBkt), lit(0L)))
      .select(col("bkt"), col("bkt_offset"))
    docs
      .withColumn("in_bkt", coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
      .join(broadcast(offsets), Seq("bkt"))
      .withColumn("prev", col("bkt_offset") + col("in_bkt"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"prev div ${seqLen}L").as("seq_id"),
        (col("prev") % seqLen).as("offset"))
  }

  /** C29: deterministic corpus shuffle — a reproducible pseudo-random
    * permutation of the corpus (the global shuffle every training run
    * needs): rank documents by a multiplicative hash of doc_id. No
    * rand(), so the permutation is stable across runs/engines/retries.
    *
    * The global rank reuses the distributed-prefix-sum shape: shard =
    * high bits of the hash (`(h·K) div P` is monotone in h, so shard
    * boundaries respect the global hash order), ranks are window-local
    * within shards, and only the K-row shard-count relation is
    * sequential. One shuffle by shard — which is exactly the data
    * movement any global re-order costs (Spark's own orderBy range
    * exchange), plus zero sampling passes because shard bounds are known
    * in closed form.
    */
  /** C36: per-source document capping — the domain-cap pass of web-corpus
    * curation (bound any single domain's/provider's contribution to the
    * training mix). Deterministic: docs rank within a source by the
    * multiplicative id hash (no rand(), same [[bucket1000]] hash family),
    * and the cap is enforced with the native bounded top-k aggregate
    * (graft_topk), so every map task reduces its slice to ≤ cap entries
    * per source BEFORE the exchange: per-source state is O(cap), the
    * shuffle moves cap-sized buffers, and no full-group sort runs. A
    * row_number() window would range-sort every group — a hot domain with
    * 10⁹ docs is a skew cliff at 100 TB; the heap path's cost for that
    * same domain is O(rows · log-ish cap) map-side with an O(cap) merge.
    */
  def sourceCap(t: Tables, cap: Int = 10): DataFrame = {
    val h = expr(s"(((doc_id % ${P}L + ${P}L) % ${P}L) * 2654435761L) % ${P}L")
    // graft_topk keeps the k BEST by (score desc, id asc); score = −h
    // makes that (h asc, doc_id asc) — exactly row_number() ORDER BY h, id
    val kept = t.documents.select(col("source"), col("doc_id"), h.as("h"))
      .groupBy(col("source"))
      .agg(call_function("graft_topk",
        struct(negate(col("h")).cast("double"), col("doc_id")), lit(cap)).as("kept"))
    kept.select(col("source"), posexplode(col("kept")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rk"),
        col("col.id").as("doc_id"), negate(col("col.score")).cast("long").as("h"))
  }

  /** C51: curriculum banding — assign every document to one of `nBands`
    * difficulty bands at exact token-count quantile cutoffs (the
    * curriculum-learning data-ordering pass: stage training easy → hard
    * without ever globally sorting the corpus).
    *
    * Two passes, neither a global sort: (1) a `score → count` aggregate
    * whose map-side partial bounds shuffle output at the distinct-score
    * count (token counts, not docs — `maxDistinct` guards the driver
    * fold the way `maxAllPairs` guards [[Similarity.embedNearDup]]);
    * the exact i/nBands quantile cutoffs fall out of the cumulative
    * counts in closed integer form (ceil(i·n/nBands) via
    * (i·n + nBands − 1) div nBands — no float boundary). (2) a
    * zero-shuffle narrow scan assigns band = #cutoffs strictly below the
    * doc's score: value-based, so ties land in the lower band
    * deterministically on every engine and partitioning. A
    * row_number()/ntile() formulation would range-sort 100 TB for ranks
    * it immediately coarsens; this plan's cost is one combine-bounded
    * aggregate plus a literal fold.
    */
  def curriculumBands(t: Tables, nBands: Int = 4, maxDistinct: Long = 1L << 20): DataFrame = {
    import graft.operators.TextAnalysis.wsTokens
    val scored = t.documents.select(col("doc_id"),
      when(length(trim(col("text"))) === 0, 0L)
        .otherwise(size(wsTokens(col("text"))).cast("long")).as("score"))
    // gate BEFORE materializing: TakeOrdered of gate+1 rows bounds the
    // driver at O(gate) on a degenerate corpus (and keeps the sort), so
    // the remedy below prints instead of the collect OOMing first
    val hist = scored.groupBy(col("score")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("score"))
      .limit(math.min(maxDistinct + 1, Int.MaxValue.toLong).toInt).collect()
    require(hist.length <= maxDistinct,
      s"curriculumBands: distinct scores exceed maxDistinct=$maxDistinct — " +
        "bucket the score (e.g. score div 16) before banding a corpus this heterogeneous")
    val n = hist.map(_.getLong(1)).sum
    val cum = hist.map(_.getLong(1)).scanLeft(0L)(_ + _).tail
    val cutoffs = (1 until nBands).map { i =>
      val target = (i * n + nBands - 1) / nBands
      hist(cum.indexWhere(_ >= target)).getLong(0)
    }.distinct
    val band = cutoffs.foldLeft(lit(0L)) { (acc, c) =>
      acc + when(col("score") > c, 1L).otherwise(0L)
    }
    scored.select(col("doc_id"), col("score"), band.as("band"))
  }

  /** C58: token-budget selection — per source, admit documents in
    * (quality desc, doc_id) order while the running token total stays
    * under `budgetTokens` (the "N tokens from each provider, best
    * first" curation step every mixture build runs; a doc is admitted
    * iff the budget is not yet exhausted BEFORE it, so the last
    * admission may overshoot). Returns (doc_id, source, n_tokens,
    * quality, selected).
    *
    * Scale shape: the naive plan — a per-source window cumsum over the
    * corpus — range-sorts every source's full document list through
    * single tasks. Instead: ONE scan scores docs (C9's rounded
    * formula), ONE map-side-combinable (source, quality) histogram of
    * token sums (bounded: quality is rounded to 1e-4), and the driver
    * resolves each source's admission threshold closed-form. Bands
    * strictly above the threshold are admitted by a zero-shuffle
    * literal fold; ONLY the single boundary band per source — the band
    * the budget crosses inside — pays a window cumsum, and that window
    * sees one quality-band of one source, not the corpus. Ordering is
    * value-based, so admission is deterministic on any partitioning.
    */
  def budgetSelect(t: Tables, budgetTokens: Long = 500L,
                   maxDistinct: Long = 1L << 20): DataFrame = {
    // persist: the scored relation feeds the cutoff histogram here AND
    // both branches of the returned union (full bands + boundary band) —
    // without the cache the stopword/quality kernel scan re-runs three
    // times. Doc-cardinality × 4 narrow columns, LRU-evictable.
    val scored = graft.operators.TextAnalysis.qualityScored(t).persist()
    val hist = scored.groupBy(col("source"), col("quality"))
      .agg(sum(col("n_tokens")).as("toks")).collect()
    require(hist.length <= maxDistinct,
      s"budgetSelect: ${hist.length} distinct (source, quality) bands exceed maxDistinct=$maxDistinct — " +
        "coarsen the quality rounding before budget-selecting a corpus this heterogeneous")
    // per source, walk bands best-first: full bands fit strictly under
    // the budget; the FIRST band that reaches/crosses it is the boundary
    // (resolved by the windowed path); everything after is rejected
    val perSource = hist.groupBy(_.getString(0)).map { case (src, rows) =>
      val bands = rows.map(r => (r.getDouble(1), r.getLong(2))).sortBy(-_._1)
      var cum = 0L
      var fullCut = Double.NegativeInfinity  // quality > fullCut => admitted outright
      var boundary: Option[(Double, Long)] = None
      val it = bands.iterator
      while (it.hasNext && boundary.isEmpty) {
        val (q, toks) = it.next()
        if (cum + toks < budgetTokens) cum += toks
        else { boundary = Some((q, cum)); fullCut = q }
      }
      src -> (fullCut, boundary)
    }
    val srcs = perSource.keys.toSeq.sorted
    val fullMap = map(srcs.flatMap(s => Seq(lit(s),
      lit(perSource(s)._1))): _*)
    val bSrcs = srcs.filter(s => perSource(s)._2.isDefined)
    val (bQMap, bOffMap) =
      if (bSrcs.isEmpty) (lit(null).cast("map<string,double>"), lit(null).cast("map<string,bigint>"))
      else (map(bSrcs.flatMap(s => Seq(lit(s), lit(perSource(s)._2.get._1))): _*),
            map(bSrcs.flatMap(s => Seq(lit(s), lit(perSource(s)._2.get._2))): _*))
    val isBoundary = coalesce(
      element_at(bQMap, col("source")) === col("quality"), lit(false))
    val rest = scored.filter(!isBoundary)
      .withColumn("selected", col("quality") > element_at(fullMap, col("source")))
    val wIn = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bRows = scored.filter(isBoundary)
      .withColumn("cum_in", coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
      .withColumn("selected",
        element_at(bOffMap, col("source")) + col("cum_in") < budgetTokens)
      .drop("cum_in")
    rest.unionByName(bRows)
  }

  /** C76: deterministic weighted sampling WITHOUT replacement — k docs
    * with inclusion probability ∝ weight (weight = chars+1: sample by
    * mass, so a token-budget draw lands on content, not on doc count),
    * via the Efraimidis–Vassilvitskii exponential race (Efraimidis &
    * Spiliopoulos 2006 A-ES): doc i draws key = −ln(uᵢ)/wᵢ ~ Exp(wᵢ)
    * and the k SMALLEST keys win — exactly a weighted draw without
    * replacement. uᵢ derives from the C16 multiplicative doc_id hash
    * (never rand()), so the sample is REPRODUCIBLE across runs, engines
    * and speculative retries — the property that makes a training-set
    * draw auditable (C38b's Gumbel-top-k is the softmax twin; this is
    * the plain-weights form).
    *
    * Scale shape: one ZERO-SHUFFLE narrow scan computes every key;
    * selection is TakeOrderedAndProject (bounded, no global sort).
    */
  def sampleWeighted(t: Tables, k: Int = 100): DataFrame = {
    val u = (expr(s"((doc_id % ${P}L + ${P}L) % ${P}L * 2654435761L) % ${P}L")
      .cast("double") + lit(0.5)) / lit(P.toDouble)
    t.documents
      .select(col("doc_id"), col("source"), (col("n_chars") + lit(1L)).as("weight"))
      .withColumn("key", -log(u) / col("weight").cast("double"))
      .orderBy(col("key"), col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("source"), col("weight"),
        roundHalfUp(col("key"), 9).as("key"))
  }

  def corpusShuffle(t: Tables, nShards: Int = 64): DataFrame = {
    val h = expr(s"(((doc_id % ${P}L + ${P}L) % ${P}L) * 2654435761L) % ${P}L")
    val docs = t.documents
      .select(col("doc_id"), h.as("h"))
      .withColumn("shard", expr(s"(h * ${nShards}L) div ${P}L"))
    val wIn = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    val wShard = Window.partitionBy(lit(0)).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = docs.groupBy(col("shard")).agg(count(lit(1)).as("n"))
      .withColumn("shard_offset", coalesce(sum(col("n")).over(wShard), lit(0L)))
      .select(col("shard"), col("shard_offset"))
    docs
      .withColumn("in_shard", row_number().over(wIn).cast("long"))
      .join(broadcast(offsets), Seq("shard"))
      .select((col("shard_offset") + col("in_shard")).as("rank"), col("doc_id"), col("h"))
  }
}

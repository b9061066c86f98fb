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
      .orderBy(col("doc_id"))
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
      .orderBy(col("lang"))
  }
}

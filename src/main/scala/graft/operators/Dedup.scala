package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.roundHalfUp

/** Near-duplicate detection for LLM training corpora (SURVEY.md §2 C2-C4).
  *
  * All signature math is pure higher-order column algebra (transform /
  * aggregate / array_min) over a shared polynomial shingle hash — no UDFs,
  * fully codegen'd, and bit-for-bit reproducible in the DuckDB oracle.
  *
  * Scale shape: signatures are computed in a single narrow pass (no
  * shuffle); candidate generation is the only shuffle, on (band, hash)
  * keys — the LSH trick that turns the O(n²) pair space into O(n·bands)
  * with bounded buckets. The exact-verify stage (Jaccard) runs only on
  * LSH survivors via an inverted-index join, never a cross product.
  */
object Dedup {

  private val P = 1000000007L

  /** Word-k-shingle list per document; documents shorter than k tokens
    * shingle their whole text as one entry.
    */
  private def shinglesExpr(k: Int): String = {
    val toks = "split(trim(lower(text)), '\\\\s+')"
    val shingle = (1 to k).map(o => s"element_at($toks, i+$o)").mkString("concat_ws(' ', ", ", ", ")")
    s"""CASE WHEN size($toks) < $k THEN array(concat_ws(' ', $toks))
        ELSE transform(sequence(0, size($toks)-$k), i -> $shingle) END"""
  }

  /** array<long> of distinct shingle hashes (k word shingles), via the
    * native RollingHash64 expression (bit-identical to the HOF/oracle
    * formulation `aggregate(split(s,''), 0L, (acc,x)->(acc*31+ascii(x))%P)`).
    */
  private def shingleHashExpr(k: Int): String =
    s"""array_distinct(transform(${shinglesExpr(k)}, s -> graft_rolling_hash(s)))"""

  /** MinHash signature: sig[j] = min over shingle hashes x of
    * ((a_j·x) mod P + b_j) mod P with a_j = (2j+1)·777767 mod P,
    * b_j = (31j+7)·999999937 mod P — the native MinHashSig expression
    * (one fused loop; same values as the HOF/oracle formulation).
    */
  private def minhashSigExpr(k: Int, nPerms: Int): String =
    s"graft_minhash_sig(hs, $nPerms)"

  /** C2 (signature parity check): first `nPerms` MinHash signature values
    * per document as columns — a dense, non-empty oracle target proving
    * the permutation math matches the oracle engine exactly.
    */
  def minhashSig(t: Tables, k: Int = 3, nPerms: Int = 8): DataFrame = {
    val sigCols = (0 until nPerms).map(j => expr(s"element_at(sig, ${j + 1})").as(s"sig_$j"))
    t.documents
      .withColumn("hs", expr(shingleHashExpr(k)))
      .withColumn("sig", expr(minhashSigExpr(k, nPerms)))
      .select((col("doc_id") +: sigCols): _*)
      .orderBy(col("doc_id"))
  }

  /** C2: MinHash + LSH banding near-dup candidate pairs.
    *
    * nPerms = nBands · rowsPerBand. Pairs sharing ≥1 band bucket are
    * candidates; output carries how many bands agreed. One shuffle on
    * (band_idx, band_hash); hot buckets are bounded by the band hash
    * domain (and would be salt-capped at extreme skew).
    */
  def dedupMinhash(t: Tables, k: Int = 3, nBands: Int = 8, rowsPerBand: Int = 4): DataFrame = {
    val nPerms = nBands * rowsPerBand
    val bandHash = {
      // fold rowsPerBand signature values into one band hash
      (2 to rowsPerBand).foldLeft(s"element_at(sig, $rowsPerBand*i+1)") { (acc, o) =>
        s"(($acc) * 31 + element_at(sig, $rowsPerBand*i+$o)) % $P"
      }
    }
    val bands = t.documents
      .withColumn("hs", expr(shingleHashExpr(k)))
      .withColumn("sig", expr(minhashSigExpr(k, nPerms)))
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(0, ${nBands - 1}), i -> named_struct('band_idx', i, 'band_hash', $bandHash))")).as("b"))
      .select(col("doc_id"), col("b.band_idx").as("band_idx"), col("b.band_hash").as("band_hash"))
    val a = bands.select(col("band_idx"), col("band_hash"), col("doc_id").as("id_a"))
    val b = bands.select(col("band_idx").as("bi"), col("band_hash").as("bh"), col("doc_id").as("id_b"))
    a.join(b, col("band_idx") === col("bi") && col("band_hash") === col("bh") && col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** 48-bit SimHash from distinct shingle hashes (bit j set when the
    * ±1 vote sum over hash bit j is positive). 48 bits keeps every
    * intermediate comfortably inside signed-64 for both engines.
    */
  private def simhashExpr: String = "graft_simhash(hs, 48)"

  /** C3 (signature parity check): per-document 48-bit SimHash value. */
  def simhash(t: Tables, k: Int = 3): DataFrame =
    t.documents
      .withColumn("hs", expr(shingleHashExpr(k)))
      .select(col("doc_id"), expr(simhashExpr).as("simhash"))
      .orderBy(col("doc_id"))

  /** C3: SimHash near-dup pairs with Hamming distance ≤ maxHamming.
    *
    * Pigeonhole blocking: with 4 blocks of 12 bits, any pair at Hamming
    * ≤ 3 matches exactly on ≥1 block — so the join runs on (block_idx,
    * block_value) buckets, O(n·4) keys instead of O(n²) pairs, then the
    * exact bit_count(xor) filter verifies.
    */
  def dedupSimhash(t: Tables, k: Int = 3, maxHamming: Int = 3): DataFrame = {
    val sims = t.documents
      .withColumn("hs", expr(shingleHashExpr(k)))
      .select(col("doc_id"), expr(simhashExpr).as("simhash"))
    val blocks = sims.select(col("doc_id"), col("simhash"),
      explode(expr("transform(sequence(0, 3), b -> named_struct('block_idx', b, 'block_val', shiftright(simhash, 12*b) & 4095))")).as("blk"))
      .select(col("doc_id"), col("simhash"), col("blk.block_idx").as("block_idx"), col("blk.block_val").as("block_val"))
    val a = blocks.select(col("block_idx"), col("block_val"), col("doc_id").as("id_a"), col("simhash").as("sim_a"))
    val b = blocks.select(col("block_idx").as("bi"), col("block_val").as("bv"), col("doc_id").as("id_b"), col("simhash").as("sim_b"))
    a.join(b, col("block_idx") === col("bi") && col("block_val") === col("bv") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), expr("bit_count(sim_a ^ sim_b)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** C4: exact word-set Jaccard similarity via inverted-index join inside
    * language blocks (never a cross product: pairs materialize only for
    * docs sharing a word). Output pairs with jaccard ≥ threshold.
    */
  def ngramJaccard(t: Tables, threshold: Double = 0.5): DataFrame = {
    val words = t.documents
      .select(col("doc_id"), col("lang"),
        explode(expr("array_distinct(split(trim(lower(text)), '\\\\s+'))")).as("word"))
    val counts = words.groupBy(col("doc_id")).agg(count(lit(1)).as("nw"))
    val pairs = words.alias("a")
      .join(words.alias("b"),
        col("a.word") === col("b.word") && col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(counts.select(col("doc_id").as("id_a"), col("nw").as("nw_a")), Seq("id_a"))
      .join(counts.select(col("doc_id").as("id_b"), col("nw").as("nw_b")), Seq("id_b"))
      .withColumn("jac", col("common").cast("double") / (col("nw_a") + col("nw_b") - col("common")))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), roundHalfUp(col("jac"), 4).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }
}

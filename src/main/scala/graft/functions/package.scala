package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column helpers for the graft engine. */
package object functions {

  /** Deterministic round-half-toward-+infinity:
    * floor(x·10^scale + 0.5)/10^scale, valid for SIGNED inputs.
    *
    * Spark's `round` (BigDecimal HALF_UP on the shortest decimal
    * representation) and DuckDB's (`nearbyint`, half-even) disagree on
    * exact .5 boundaries, which occur systematically when the input is an
    * exact small decimal times a power of two. This formulation is a pure
    * double pipeline — identical input double ⇒ identical output in every
    * engine that evaluates floor/·/+ in IEEE754, for any sign. Note the
    * tie-break direction on negatives: halves go toward +inf (-2.5 → -2),
    * i.e. this is NOT round-half-away-from-zero — fine for cross-engine
    * parity (the oracle uses the identical formula via roundHalfUpSql),
    * just don't expect symmetric behavior around zero.
    */
  def roundHalfUp(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** SQL text of the same rounding for DuckDB oracle queries. */
  def roundHalfUpSql(inner: String, scale: Int): String = {
    val p = "1" + ("0" * scale)
    s"floor(($inner) * $p.0 + 0.5) / $p.0"
  }
}

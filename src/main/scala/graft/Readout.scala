package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, round}

/** Readout normalization shared by every query and operator that rounds a
  * possibly-negative double output column.
  */
object Readout {

  /** Round a possibly-negative double readout to `k` digits and normalize
    * IEEE negative zero. DuckDB's `round` keeps the sign bit of a tiny
    * negative (`round(-1e-9, 6)` = −0.0) while Spark's `round` goes through
    * BigDecimal (no signed zero) and emits +0.0 — a bit-pattern split the
    * driver's hash gate counts as a mismatch (round-5's q162 red row: 2 of
    * 20,800 covariance cells sat in (−5e-7, 0)). IEEE 754 addition maps
    * −0.0 + 0.0 → +0.0 and leaves every other value bit-identical, so BOTH
    * engines normalize with the same `+ 0.0` readout: every oracle column
    * paired with this helper ends `round(x, k) + 0.0`. RoundReadoutSpec
    * pins −1e-9 → +0.0 bit-identically against a DuckDB-replayed vector.
    */
  def rdz(c: Column, k: Int): Column = round(c, k) + lit(0.0d)
}

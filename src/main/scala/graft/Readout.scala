package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{abs, lit, signum, when}

/** Cross-engine-exact rounding for every gated readout.
  *
  * Three DIFFERENT double-rounding semantics were in play until round 6:
  *  - Spark's `round` feeds `BigDecimal.valueOf(double)` — it rounds the
  *    SHORTEST decimal representation (Double.toString), HALF_UP;
  *  - DuckDB's `round` scales by 10^k in IEEE arithmetic, rounds the
  *    scaled double half-away-from-zero by its exact fractional part,
  *    and divides back (keeping −0.0's sign);
  *  - an exact-binary-expansion HALF_UP (what `tools/check.py`'s audit
  *    model first assumed) matches neither.
  *
  * The three agree except where the scaled multiply or the shortest-repr
  * truncation crosses a .5 boundary — measured on 360k random doubles per
  * scale (tools/audit_rounding.py, ARCHITECTURE.md round-6): ~0 at ≤ 11
  * significant digits, 0.1–3% at k=12 on unit-magnitude values — i.e. a
  * POSITIVE-measure hash-gate risk on every rounded readout, the same
  * severity class as the r5 q162 −0.0 split. The fix is one-sided: [[rd]]
  * replicates DuckDB's algorithm exactly (0/360,000 probe mismatches;
  * RoundReadoutSpec pins 19 adversarial vectors against DuckDB-computed
  * expected values), and every engine readout uses it via the
  * `import graft.Readout.round` shadow, so engine and oracle round
  * IDENTICALLY by construction — no k-policy or magnitude bound needed.
  */
object Readout {

  /** DuckDB-exact round-to-`k`-decimals:
    * `copysign(floor(|x|·10^k) + [frac ≥ 0.5], x) / 10^k`, every step an
    * IEEE operation DuckDB also performs. Exactness notes: `t % 1.0` is
    * the exact fractional part (fmod is exact); `t − frac` is exactly
    * `floor(t)` (both representable); `+ 1.0` stays exact through 2^53,
    * and above 2^53 frac is 0 so the value passes through unchanged;
    * `signum` carries ±0 and NaN through; 10^k is an exact double for
    * k ≤ 15. Null in → null out.
    */
  def rd(c: Column, k: Int): Column = {
    require(k >= 0 && k <= 15, s"rd scale must be in [0, 15], got $k")
    val p = lit(math.pow(10, k))
    val t = abs(c) * p
    val frac = t % lit(1.0d)
    val r = (t - frac) +
      when(frac >= lit(0.5d), lit(1.0d)).otherwise(lit(0.0d))
    signum(c) * r / p
  }

  /** [[rd]] plus IEEE negative-zero normalization (−0.0 + 0.0 = +0.0) for
    * possibly-negative readouts whose ORACLE also ends `round(x, k) + 0.0`
    * — the r5 q162 fix. With [[rd]] the two engines already agree on
    * −0.0, but the sweep keeps both sides' `+ 0.0` so neither engine's
    * zero sign is ever load-bearing.
    */
  def rdz(c: Column, k: Int): Column = rd(c, k) + lit(0.0d)

  /** Shadow for `org.apache.spark.sql.functions.round`: importing
    * `graft.Readout.round` in a file makes every existing `round(col, k)`
    * call site resolve here (explicit import beats the functions._
    * wildcard), swapping Spark's shortest-repr rounding for the
    * DuckDB-exact [[rd]] with zero textual churn and without touching
    * the oracle SQL strings.
    */
  def round(e: Column, scale: Int): Column = rd(e, scale)

  /** 1-arg shadow (`round(x)` = round to integer). */
  def round(e: Column): Column = rd(e, 0)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic numeric helpers.
  *
  * The correctness gate hash-compares our results against a DuckDB oracle.
  * Floating-point SUM/AVG are order-dependent, and Spark's partial/final
  * aggregation order differs from DuckDB's sequential scan — so a plain
  * `sum(double)` can drift in the low ulps and flip a hash. The fix is to
  * do the *associative* part of every aggregate in exact arithmetic
  * (decimal or integer), then convert to double at the very end: int→double
  * and decimal→double conversions plus IEEE division/sqrt are correctly
  * rounded, so both engines produce bit-identical doubles.
  *
  * The same pattern is the right call at 100 TB: decimal sums are exact at
  * any partition count, so results don't change when AQE re-splits a stage.
  */
object Exact {
  /** Exact SUM of a double column: cast each value to DECIMAL(18,scale)
    * (ties-away rounding, identical in DuckDB), sum exactly, emit double.
    * Oracle form: CAST(sum(CAST(x AS DECIMAL(18,s))) AS DOUBLE). */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact AVG: exact decimal sum, double division by count.
    * Oracle form: CAST(sum(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / count(x). */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(c)

  /** Exact revenue-style product sum: both factors become exact decimals,
    * the product is exact (scale adds), the sum is exact.
    * Oracle: CAST(sum(CAST(x AS DECIMAL(18,2)) * (1 - CAST(y AS DECIMAL(18,2)))) AS DOUBLE). */
  def drevenue(price: Column, discount: Column): Column =
    sum(price.cast(DecimalType(18, 2)) * (lit(1) - discount.cast(DecimalType(18, 2))))
      .cast("double")

  // ---- primitive-long fast path ------------------------------------------
  //
  // The decimal path above is exact but pays per ROW: Spark's double→decimal
  // cast goes through Double.toString + BigDecimal parse, and decimal
  // multiplies through java.math.BigDecimal — measured as the whole cost of
  // the q01 bench outlier (8 decimal aggregates ⇒ ~4 µs/row). The fast path
  // below moves all per-row work onto codegen'd primitives (one double
  // multiply + floor + long ops) and touches decimal once per GROUP.

  /** Scaled-integer value: floor(x·10^s + 0.5) as long — for data with ≤ s
    * decimal digits this is bit-identical to `CAST(x AS DECIMAL(p,s))`
    * (both see the double's value within ε ≪ half-ulp-of-scale of the true
    * decimal; equivalence is spec-asserted per column on real data).
    * NOT for negative exact-half values (.xx5): HALF_UP rounds away from
    * zero, floor(+0.5) toward +∞ — no 2-decimal source column hits that. */
  def cents(c: Column, s: Int = 2): Column =
    floor(c * lit(math.pow(10, s)) + lit(0.5)).cast("long")

  /** Overflow-safe exact sum of a scaled-long column, emitted as
    * double(Σ/10^s). A plain `sum(long)` would overflow int64 once
    * Σ > 9.2e18 (reachable for cents-product columns at 100 TB), so the
    * per-row value is split into 2^20-radix high/low halves — each summed
    * as a primitive long, exact to Σ < 2^63·2^20 ≈ 1e25 — and recombined
    * in DECIMAL(38) once per group. The final divide-by-10^s happens in
    * decimal (scale ≥ 6, exact for s ≤ 6) then one correctly-rounded cast
    * to double, so results match `CAST(sum(decimal) AS DOUBLE)` oracles
    * bit-for-bit. Splitting is exact for negatives too (two's complement:
    * v == (v >> 20)·2^20 + (v & 0xFFFFF)). */
  def lsum(scaled: Column, s: Int): Column = {
    val hi = sum(shiftright(scaled, 20)).cast(DecimalType(38, 0))
    val lo = sum(scaled.bitwiseAND(lit((1L << 20) - 1))).cast(DecimalType(38, 0))
    ((hi * lit(1L << 20) + lo) / lit(math.pow(10, s).toLong)).cast("double")
  }

  /** Exact AVG over a scaled-long column: exact sum, double division by
    * count — same shape as [[davg]]. */
  def lavg(scaled: Column, s: Int): Column = lsum(scaled, s) / count(scaled)

  /** [[lsum]]'s exact integer sum kept as DECIMAL(38,0) — for statistical
    * moments (Σx, Σx², Σxy) that feed variance/correlation formulas, which
    * need the raw integers, not double(Σ/10^s). Same 2^20-radix split:
    * exact past int64. DuckDB mirrors with HUGEINT sums (both sides have
    * ~38 significant digits before the final double conversion). */
  def lsumDec(scaled: Column): Column = {
    val hi = sum(shiftright(scaled, 20)).cast(DecimalType(38, 0))
    val lo = sum(scaled.bitwiseAND(lit((1L << 20) - 1))).cast(DecimalType(38, 0))
    hi * lit(1L << 20) + lo
  }

  /** Drop-in fast-path [[dsum]] for columns with ≤ 2 decimal digits (every
    * TPC-H money/quantity column): same value, same oracle SQL form, all
    * per-row work primitive. */
  def fsum(c: Column): Column = lsum(cents(c), 2)

  /** Drop-in fast-path [[davg]]. */
  def favg(c: Column): Column = fsum(c) / count(c)

  /** Drop-in fast-path [[drevenue]]: price·(1−discount) as an exact long
    * cents·(100−cents) product (scale 4), summed overflow-safe. */
  def frevenue(price: Column, discount: Column): Column =
    lsum(cents(price) * (lit(100L) - cents(discount)), 4)
}

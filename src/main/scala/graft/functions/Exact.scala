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
}

package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-arithmetic aggregate helpers for oracle hash-matching.
  *
  * The driver compares query output against a DuckDB oracle by hashing
  * values. Floating-point SUM/AVG are order-dependent, so `sum(double)`
  * computed by Spark (partial aggregation across 32 partitions) and DuckDB
  * (single-threaded or its own parallel order) can differ in the low bits
  * and fail the hash compare even though both are "correct".
  *
  * Fix: the testdata's monetary columns are 2-decimal values stored as
  * doubles. Casting each value to DECIMAL(18,2) recovers the exact value;
  * decimal aggregation is exact integer arithmetic and therefore
  * order-independent; casting the exact sum back to double is a single
  * deterministic conversion. Both engines then produce bit-identical
  * doubles. Derived stats (avg, stddev) are computed FROM the exact sums
  * with an identical IEEE expression tree on both sides.
  *
  * This is also the right call at 100 TB: decimal partial aggregates are
  * mergeable in any order, so the map-side combine + shuffle-reduce plan
  * stays exact no matter how AQE reshapes it.
  */
object Exact {
  /** Exact 2-decimal view of a monetary double column. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Integral (floor-toward-zero) division as a Column — SQL's `div`,
    * which the Scala Column API does not expose as an operator. Exact on
    * BIGINT/DECIMAL operands where `floor(a / b)` on decimals could hit
    * the 38-digit division precision cap and round. Both engines define
    * `div`/`//` identically for non-negative operands; for possibly
    * negative numerators apply the sign outside (Spark truncates toward
    * zero, DuckDB floors). */
  def idiv(num: Column, den: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftBridge.expression(num),
        org.apache.spark.sql.GraftBridge.expression(den)))

  /** Order-independent SUM of a 2-decimal double column, as double. */
  def sumExact(c: Column): Column = sum(dec2(c)).cast("double")

  /** AVG derived from the exact sum: CAST(SUM(DECIMAL) AS DOUBLE)/COUNT(*). */
  def avgExact(c: Column): Column = sumExact(c) / count(lit(1))

  /** Sample stddev from exact sums:
    * sqrt((n*s2 - s1^2) / (n*(n-1))), all in doubles after exact decimal
    * sums. Mirrors the identical SQL formula on the oracle side.
    */
  def stddevExact(c: Column): Column = {
    val n = count(lit(1)).cast("double")
    val s1 = sum(dec2(c)).cast("double")
    val s2 = sum(dec2(c) * dec2(c)).cast("double")
    sqrt((n * s2 - s1 * s1) / (n * (n - lit(1.0))))
  }
}

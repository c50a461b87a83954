package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deterministic numeric helpers.
 *
 * Floating-point aggregation is order-dependent: the same `SUM(double)`
 * computed by two engines (or by the same engine with a different
 * partitioning) can differ in the last ULP, which breaks byte-exact
 * result comparison and makes results depend on cluster topology. All
 * source numeric columns in the test data carry at most 2 decimal
 * digits, so they cast losslessly to DECIMAL; decimal arithmetic is
 * exact and associative, so sums are bit-reproducible regardless of
 * partitioning — on 32 local threads or 1000 executors.
 *
 * Pattern: cast to decimal at the source, multiply/add in decimal,
 * reduce the sum back to DECIMAL(18,2), and surface as Double (the
 * decimal→double conversion is a single correctly-rounded step on both
 * Spark and any IEEE-conforming SQL engine, because an 18-digit/2-dp
 * magnitude keeps the scaled integer below 2^53).
 */
object Exact {

  /** Money/quantity columns: ≤10 integer digits, 2 decimals. */
  def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Small rates (discount/tax): 2 decimals in [0, ~10). */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))

  /**
   * Exact sum of a decimal expression, surfaced as Double.
   * The intermediate DECIMAL(18,2) reduction keeps the final
   * decimal→double conversion a single rounding step.
   */
  def sumExact(decimalExpr: Column): Column =
    sum(decimalExpr).cast(DecimalType(18, 2)).cast(DoubleType)

  /**
   * Deterministic average: exact decimal sum divided (in double) by the
   * non-null count. Never uses avg(double), whose partial-aggregation
   * order is partitioning-dependent.
   */
  def avgExact(source: Column): Column =
    sum(dec(source)).cast(DecimalType(18, 2)).cast(DoubleType) / count(source)
}

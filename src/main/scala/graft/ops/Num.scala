package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Deterministic numeric aggregation helpers.
  *
  * All money-ish doubles in the testdata are exact 2-decimal values, so
  * `CAST(x AS DECIMAL(18,2))` is lossless in both Spark and DuckDB. Summing
  * in decimal is exact and order-independent, and the final decimal→double
  * conversion is correctly rounded in both engines — making aggregate
  * results bit-identical regardless of partitioning/parallelism. Raw
  * double sums would differ in the last ULP between engines (and between
  * runs at different partition counts), breaking hash-compare oracles and,
  * more importantly, making results nondeterministic at cluster scale.
  */
object Num {
  /** Lossless 2-decimal cast for money columns. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact, order-independent sum of a 2-decimal double column → double. */
  def moneySum(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Exact average: exact decimal sum divided by count, both deterministic. */
  def moneyAvg(c: Column): Column =
    (sum(dec2(c)).cast(DoubleType) / count(c).cast(LongType)).cast(DoubleType)

  /** Exact revenue-style sum: sum(price * (1 - discount)) in decimal. */
  def revenueSum(price: Column, discount: Column): Column =
    sum(dec2(price) * (lit(1) - dec2(discount))).cast(DoubleType)
}

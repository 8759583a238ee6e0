package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

package object queries {
  /** A named query: (session, scale-factor dir) => result. */
  type Q = (SparkSession, String) => DataFrame

  /** Exact-arithmetic sum of a 2-to-4-decimal-place double column.
    *
    * Doubles summed in different orders differ in the last ulps, so a
    * plain `sum(double)` can never hash-match an independent engine.
    * Casting to decimal makes the addition exact (values with <=4
    * decimal places are exactly representable), and the final cast to
    * double is a single correctly-rounded conversion — bit-identical
    * across IEEE-754 engines regardless of aggregation order.
    */
  def exactSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Exact-arithmetic average (exact decimal sum / exact count). */
  def exactAvg(c: Column): Column =
    (sum(c.cast(DecimalType(18, 4))).cast("double") / count(c))

  /** Exact revenue term: price * (1 - discount) in decimal. */
  def revenueTerm(price: Column, discount: Column): Column =
    price.cast(DecimalType(18, 4)) *
      (lit(1).cast(DecimalType(18, 4)) - discount.cast(DecimalType(18, 4)))

  /** Sum of a scale-8 decimal term, projected back to scale 4 BEFORE
    * the double cast. A scale-8 sum above ~9e7 carries more than 2^53
    * raw units, and the decimal→double conversion of such values is
    * not bit-identical across engines (caught at sf0.1: q1's
    * sum_disc_price differed in the last ulp). Rounding to scale 4
    * first keeps the raw units exactly representable for sums up to
    * ~9e11, and decimal rounding itself is exact in both engines.
    * Oracles mirror with CAST(sum(...) AS DECIMAL(28,4)).
    */
  def exactTermSum(term: Column): Column =
    sum(term).cast(DecimalType(28, 4)).cast("double")

  /** Exact product term: price * discount in decimal (q6 shape). */
  def revenueProduct(price: Column, discount: Column): Column =
    price.cast(DecimalType(18, 4)) * discount.cast(DecimalType(18, 4))
}

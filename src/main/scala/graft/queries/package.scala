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

  /** Exact product term: price * discount in decimal (q6 shape). */
  def revenueProduct(price: Column, discount: Column): Column =
    price.cast(DecimalType(18, 4)) * discount.cast(DecimalType(18, 4))
}

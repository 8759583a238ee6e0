package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew-aware two-phase aggregation (SURVEY.md §2 F9).
  *
  * A hot grouping key concentrates its rows in one reducer; salting
  * splits each key into `buckets` sub-keys for the first (partial)
  * aggregation and recombines in a second, tiny aggregation over
  * (keys × buckets) rows. Combined with AQE's skew-join splitting
  * (enabled in [[graft.GraftSession]]) this keeps 100-TB hot-key
  * aggregations off the single-reducer cliff.
  *
  * The salt must be uncorrelated with the grouping keys but NOT
  * random: a deterministic hash of the salt columns keeps results
  * reproducible run-to-run. Sums route through DECIMAL so the
  * two-phase result is bit-identical to the unsalted plan.
  */
object Salt {

  private val dec = DecimalType(18, 4)

  /** Salted exact sum + count per key.
    *
    * @param saltOn columns whose hash spreads a hot key's rows across
    *               buckets (e.g. the event id — any high-cardinality
    *               column works)
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      saltOn: Seq[String], buckets: Int = 16): DataFrame = {
    val salt = pmod(hash(saltOn.map(col): _*), lit(buckets))
    val partial = df
      .withColumn("__salt", salt)
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol).cast(dec)).as("__psum"),
        count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).cast("double").as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n_rows"))
  }

  /** The reference (unsalted) plan for equivalence checks. */
  def plainSumCount(df: DataFrame, keys: Seq[String], valueCol: String)
      : DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sum(col(valueCol).cast(dec)).cast("double").as(s"sum_$valueCol"),
        count(lit(1)).as("n_rows"))
}

package graft.lakehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.functions.TimeFns

/** Gold-layer analytics (SURVEY.md §2 C1-C7) — the Spark form of the
  * reference's demand-profile SQL
  * (/root/reference/airflow/dags/mobility_ingestion_pipeline.py:651-742
  * and the sprint-1 notebook cells 39-49).
  *
  * All numeric aggregates stay in DECIMAL until the final projection so
  * results are bit-portable across engines regardless of aggregation
  * order (see [[graft.queries.exactSum]]); shares and averages divide
  * two exact doubles, which IEEE-754 rounds identically everywhere.
  *
  * Scale notes: every profile is a partial-aggregated groupBy on a
  * bounded key space (dates × 24 hours, zones, tiers). The zone-level
  * side tables (rent, population) are zone-cardinality and broadcast
  * into the fact joins.
  */
object Gold {

  private val dec = DecimalType(18, 4)
  private def dsum(c: Column): Column = sum(c.cast(dec))

  /** C1 — total demand per (date, hour) (reference pipeline.py:651-659). */
  def hourlyProfile(fact: DataFrame): DataFrame =
    fact
      .groupBy(col("partition_date").as("date"),
        hour(col("period")).as("hour"))
      .agg(dsum(col("trips")).cast("double").as("total_trips"),
        count(lit(1)).as("n_trips_rows"))

  /** C2 — weekday vs weekend typical day: AVG over days of per-day
    * hourly sums (reference sprint-1 nb cell 43). Two-level exact
    * aggregation: inner decimal sums per (date, hour), outer exact
    * sum / count.
    */
  def weekdayWeekendProfile(fact: DataFrame): DataFrame =
    fact
      .groupBy(col("partition_date"), hour(col("period")).as("hour"))
      .agg(dsum(col("trips")).as("day_hour_trips"))
      .withColumn("day_type",
        when(TimeFns.isWeekend(col("partition_date")), "weekend")
          .otherwise("weekday"))
      .groupBy(col("day_type"), col("hour"))
      .agg(
        (sum(col("day_hour_trips")).cast("double") / count(lit(1)))
          .as("avg_trips"),
        count(lit(1)).as("n_days"))

  /** C3 — NTILE(4) zone tiers by a wealth metric, with generated vs
    * attracted trip totals per tier (reference sprint-1 nb cell 45).
    *
    * `zoneMetric` must be (zone_id, metric) with one row per zone —
    * zone cardinality, so the single-partition NTILE window is safe.
    */
  def tierSummary(fact: DataFrame, zoneMetric: DataFrame): DataFrame = {
    val tiers = zoneMetric
      .withColumn("tier",
        ntile(4).over(Window.orderBy(col("metric"), col("zone_id"))))
      .withColumn("tier_label",
        when(col("tier") === 1, "Low").when(col("tier") === 2, "Mid-Low")
          .when(col("tier") === 3, "Mid-High").otherwise("High"))
    // one fact pass: each row contributes to its origin's "generated"
    // and its destination's "attracted" totals
    val flows = fact.select(col("origin_zone_id").as("zone_id"),
        col("trips").as("generated"), lit(null).cast("double").as("attracted"))
      .unionAll(fact.select(col("destination_zone_id").as("zone_id"),
        lit(null).cast("double").as("generated"), col("trips").as("attracted")))
    val zoneFlow = flows.groupBy(col("zone_id"))
      .agg(dsum(col("generated")).as("g"), dsum(col("attracted")).as("a"))
    // both sides are zone-cardinality; the broadcast hint goes on the
    // RIGHT side — a left-outer BroadcastHashJoin can only build right
    // (a left-side hint would silently fall back to sort-merge)
    tiers.join(broadcast(zoneFlow), Seq("zone_id"), "left")
      .groupBy(col("tier"), col("tier_label"))
      .agg(count(lit(1)).as("n_zones"),
        coalesce(sum(col("g")), lit(0)).cast("double").as("trips_generated"),
        coalesce(sum(col("a")), lit(0)).cast("double").as("trips_attracted"))
  }

  /** C4 — OD-pair aggregation (reference pipeline.py:829-834). */
  def odMatrix(fact: DataFrame): DataFrame =
    fact
      .groupBy(col("origin_zone_id"), col("destination_zone_id"))
      .agg(dsum(col("trips")).cast("double").as("total_trips"),
        count(lit(1)).as("n_trips_rows"),
        (dsum(col("trips")).cast("double") / count(lit(1))).as("avg_trips"))

  /** C7 — pivot the daily profile long→wide (24 hour columns) and
    * row-normalize to shares (reference pipeline.py:669-685). Wide
    * sums stay decimal until the per-row total is formed, so every
    * share is exact-double / exact-double.
    */
  def pivotHourlyProfile(fact: DataFrame): DataFrame = {
    val hours = 0 to 23
    val wide = fact
      .withColumn("hour", hour(col("period")))
      .groupBy(col("partition_date").as("date"))
      .pivot("hour", hours.map(Integer.valueOf))
      .agg(dsum(col("trips")))
    val filled = hours.foldLeft(wide) { (df, h) =>
      df.withColumn(s"h$h", coalesce(col(s"`$h`"), lit(0).cast(dec)))
    }
    val total = hours.map(h => col(s"h$h")).reduce(_ + _)
    val shares = hours.map(h =>
      when(total === 0, 0.0)
        .otherwise(col(s"h$h").cast("double") / total.cast("double"))
        .as(s"h$h"))
    filled.select(col("date") +: total.cast("double").as("total_trips") +:
      shares: _*)
  }
}

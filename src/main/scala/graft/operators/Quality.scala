package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality audit log (SURVEY.md §2 B7) — the Spark form of the
  * reference's `data_quality_log` inserts
  * (/root/reference/airflow/dags/mobility_ingestion_pipeline.py:356-397,
  * 584-634): long-format (table_name, metric, value, notes) rows for
  * counts, sums, averages, coverage % and bad-row %.
  *
  * Each metric is a scalar aggregate; the result is a union of 1-row
  * plans. At scale every input aggregate is a single partial-agg pass
  * over its table — no collect, no loops; the anti-join powering the
  * bad-row metric is a shuffle (or AQE-broadcast) join, not a lookup.
  */
object Quality {

  private def metricRow(table: String, metric: String, value: Column,
      notes: String, from: DataFrame): DataFrame =
    from.agg(value.cast("double").as("value"))
      .select(lit(table).as("table_name"), lit(metric).as("metric"),
        col("value"), lit(notes).as("notes"))

  /** The engine's standard audit over the events fact + customer dim:
    * row counts, exact trip sum, days loaded, referential bad-row %,
    * and dim coverage %.
    */
  def auditMetrics(events: DataFrame, customer: DataFrame): DataFrame = {
    val totalRows = metricRow("events", "total_rows", count(lit(1)),
      "bronze row count", events)
    val totalTrips = metricRow("events", "total_trips",
      graft.queries.exactSum(col("value")), "sum of value", events)
    val daysLoaded = metricRow("events", "days_loaded",
      countDistinct(to_date(col("ts"))), "distinct partition dates", events)
    val nullValues = metricRow("events", "null_value_rows",
      count(when(col("value").isNull, 1)), "rows with null measure", events)
    // Referential quality: % of event rows whose user has no customer
    // row (the reference's NULL-zone bad_rows check, pipeline.py:610).
    val badPct = metricRow("events", "bad_rows_pct",
      count(when(col("c_custkey").isNull, 1)) * lit(100.0) / count(lit(1)),
      "events with unmatched user", events.join(
        customer.select(col("c_custkey")),
        col("user_id") === col("c_custkey"), "left"))
    val custRows = metricRow("customer", "total_rows", count(lit(1)),
      "dim row count", customer)
    // Coverage: % of customers that appear in events (reference's
    // income_data_coverage_pct shape, pipeline.py:391).
    val coverage = metricRow("customer", "user_coverage_pct",
      countDistinct(col("user_id")) * lit(100.0) /
        first(col("n_cust")), "customers active in events",
      events.crossJoin(broadcast(
        customer.agg(count(lit(1)).as("n_cust")))))
    totalRows.unionAll(totalTrips).unionAll(daysLoaded).unionAll(nullValues)
      .unionAll(badPct).unionAll(custRows).unionAll(coverage)
  }

  /** Oracle SQL for [[auditMetrics]] — same metrics via scalar
    * subqueries.
    */
  val auditMetricsOracle: String =
    """SELECT 'events' AS table_name, 'total_rows' AS metric,
      |  CAST((SELECT count(*) FROM events) AS DOUBLE) AS value,
      |  'bronze row count' AS notes
      |UNION ALL SELECT 'events', 'total_trips',
      |  (SELECT CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) FROM events),
      |  'sum of value'
      |UNION ALL SELECT 'events', 'days_loaded',
      |  (SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS DOUBLE) FROM events),
      |  'distinct partition dates'
      |UNION ALL SELECT 'events', 'null_value_rows',
      |  (SELECT CAST(count(*) FILTER (WHERE value IS NULL) AS DOUBLE) FROM events),
      |  'rows with null measure'
      |UNION ALL SELECT 'events', 'bad_rows_pct',
      |  (SELECT CAST(count(*) FILTER (WHERE c.c_custkey IS NULL) AS DOUBLE) * 100.0
      |     / count(*)
      |   FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey),
      |  'events with unmatched user'
      |UNION ALL SELECT 'customer', 'total_rows',
      |  CAST((SELECT count(*) FROM customer) AS DOUBLE), 'dim row count'
      |UNION ALL SELECT 'customer', 'user_coverage_pct',
      |  (SELECT CAST(count(DISTINCT user_id) AS DOUBLE) FROM events) * 100.0
      |    / (SELECT count(*) FROM customer),
      |  'customers active in events'""".stripMargin
}

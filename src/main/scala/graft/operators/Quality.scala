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

  /** One declarative data-quality constraint: the fraction of rows
    * satisfying `pred` must reach `threshold` (1.0 = every row).
    */
  final case class Constraint(name: String, pred: Column,
      threshold: Double = 1.0)

  /** Evaluate a constraint suite in ONE scan: every constraint is a
    * conditional count inside the same aggregation, so a 100-TB table
    * is read once for the whole suite (map-side partial aggs, one
    * 1-row result exploded to long format). `pass_rate` is a single
    * double division of two exact longs — engine-portable.
    */
  def validate(df: DataFrame, table: String,
      constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "empty constraint suite")
    val aggs = count(lit(1)).as("__n") +:
      constraints.zipWithIndex.map { case (c, i) =>
        count(when(c.pred, 1)).as(s"__ok_$i")
      }
    val rows = constraints.zipWithIndex.map { case (c, i) =>
      // empty table: 0/0 would yield null pass_rate and null passed
      // (or raise under ANSI) — a suite that reports NEITHER pass nor
      // fail exactly when the table is empty (itself a DQ failure).
      // Fail loudly with rate 0 instead.
      val rate = when(col("__n") === 0, lit(0.0))
        .otherwise(col(s"__ok_$i").cast("double") / col("__n"))
      struct(lit(table).as("table_name"),
        lit(c.name).as("constraint_name"),
        col("__n").as("n_rows"), col(s"__ok_$i").as("n_ok"),
        rate.as("pass_rate"), lit(c.threshold).as("threshold"),
        (rate >= lit(c.threshold)).as("passed"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("c"))
      .select(col("c.*"))
  }

  /** Persist a DQ report ([[validate]] / [[auditMetrics]] output) to an
    * appendable audit TABLE — the reference's `data_quality_log`
    * inserts run after run (pipeline.py:356-397, 584-634); graft's
    * equivalent stamps each run with (run_id, run_ts) and appends it
    * to an [[graft.sources.AtomicLake]] table partitioned by run_date,
    * so every run is one atomic commit, history is immutable, and a
    * date-filtered audit read prunes to the partitions it asks for.
    * Returns the committed lake version.
    */
  def logTo(report: DataFrame, root: String,
      runId: String = java.util.UUID.randomUUID().toString): Long = {
    val stamped = report
      .withColumn("run_id", lit(runId))
      .withColumn("run_ts", current_timestamp())
      .withColumn("run_date", current_date())
    graft.sources.AtomicLake.append(stamped, root, Seq("run_date"))
  }

  /** Read the persisted audit log back (all runs, newest snapshot). */
  def readLog(spark: SparkSession, root: String): DataFrame =
    graft.sources.AtomicLake.read(spark, root)

  private def metricRow(table: String, metric: String, value: Column,
      notes: String, from: DataFrame): DataFrame =
    from.agg(value.cast("double").as("value"))
      .select(lit(table).as("table_name"), lit(metric).as("metric"),
        col("value"), lit(notes).as("notes"))

  /** The engine's standard audit over the events fact + customer dim:
    * row counts, exact trip sum, days loaded, referential bad-row %,
    * and dim coverage %.
    *
    * All per-table aggregates of one input compute in a SINGLE pass
    * (one agg row exploded to long format) — the fact is scanned once
    * for its four metrics, plus one scan for the referential left
    * join; a per-metric scan would read the 100-TB fact four times.
    */
  def auditMetrics(events: DataFrame, customer: DataFrame): DataFrame = {
    // one events pass: rows, exact sum, distinct days, nulls, coverage
    val evAgg = events.agg(
      count(lit(1)).as("n"),
      graft.queries.exactSum(col("value")).as("s"),
      countDistinct(to_date(col("ts"))).cast("double").as("d"),
      count(when(col("value").isNull, 1)).as("nv"),
      countDistinct(col("user_id")).as("nu"))
    val custAgg = customer.agg(count(lit(1)).as("n_cust"))
    def m(table: String, metric: String, value: Column, notes: String) =
      struct(lit(table).as("table_name"), lit(metric).as("metric"),
        value.cast("double").as("value"), lit(notes).as("notes"))
    val evMetrics = evAgg.crossJoin(broadcast(custAgg)).select(explode(array(
      m("events", "total_rows", col("n"), "bronze row count"),
      m("events", "total_trips", col("s"), "sum of value"),
      m("events", "days_loaded", col("d"), "distinct partition dates"),
      m("events", "null_value_rows", col("nv"), "rows with null measure"),
      m("customer", "total_rows", col("n_cust"), "dim row count"),
      m("customer", "user_coverage_pct",
        col("nu") * lit(100.0) / col("n_cust"),
        "customers active in events"))).as("mm"))
      .select(col("mm.*"))
    // Referential quality: % of event rows whose user has no customer
    // row (the reference's NULL-zone bad_rows check, pipeline.py:610).
    val badPct = metricRow("events", "bad_rows_pct",
      count(when(col("c_custkey").isNull, 1)) * lit(100.0) / count(lit(1)),
      "events with unmatched user", events.join(
        customer.select(col("c_custkey")),
        col("user_id") === col("c_custkey"), "left"))
    evMetrics.unionAll(badPct)
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

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date/time construction and extraction (SURVEY.md §2 B2) — the Spark
  * form of the reference's period arithmetic: `try_strptime(fecha,
  * '%Y%m%d') + periodo * INTERVAL 1 HOUR`
  * (/root/reference/airflow/dags/mobility_ingestion_pipeline.py:547-558)
  * and the ISODOW/dayname extracts of the sprint-1 notebook.
  *
  * The engine keeps all timestamps in the session time zone (UTC, set
  * in [[graft.GraftSession]]); a tz-localised view is a presentation
  * concern applied with `convertTz` at the edge.
  */
object TimeFns {

  /** Parse a compact "yyyyMMdd" string to a DATE; null on garbage
    * (the reference's try_strptime).
    */
  def parseYyyymmdd(c: Column): Column =
    to_date(c.try_cast("string"), "yyyyMMdd")

  /** A date plus an integer hour-of-day → TIMESTAMP (the fact table's
    * `period` column).
    */
  def periodTimestamp(date: Column, hour: Column): Column =
    timestamp_add("HOUR", hour, date.cast("timestamp"))

  /** ISO day-of-week, Monday=1 … Sunday=7 (DuckDB/Postgres isodow).
    * Spark's `weekday` is Monday=0, hence the +1.
    */
  def isodow(c: Column): Column = weekday(c) + lit(1)

  /** Full English day name ("Monday"). */
  def dayName(c: Column): Column = date_format(c, "EEEE")

  /** Saturday or Sunday. */
  def isWeekend(c: Column): Column = isodow(c) >= lit(6)

  /** Timestamp rendered in another time zone (reference: `AT TIME ZONE
    * 'Europe/Madrid'`).
    */
  def convertTz(c: Column, tz: String): Column =
    from_utc_timestamp(c, tz)
}

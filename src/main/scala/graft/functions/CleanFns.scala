package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Robust casting and string-cleaning column functions (SURVEY.md §2
  * B1), the Spark form of the reference's silver-layer cleaning SQL:
  * TRY_CAST + TRIM key joins, thousands-separator stripping, regex
  * row filters and token extraction
  * (/root/reference/airflow/dags/mobility_ingestion_pipeline.py:254-318).
  *
  * All functions are pure `Column` compositions over built-in
  * expressions — codegen'd, null-safe, no UDFs.
  */
object CleanFns {

  /** TRIM for key joins (the reference TRIMs every code column before
    * joining bronze tables).
    */
  def cleanKey(c: Column): Column = trim(c)

  /** Canonical label: trimmed + uppercased. */
  def canonLabel(c: Column): Column = upper(trim(c))

  /** TRY_CAST to BIGINT: null on any non-integer string instead of an
    * ANSI cast error.
    */
  def tryCastLong(c: Column): Column = c.try_cast("bigint")

  /** TRY_CAST to DOUBLE. */
  def tryCastDouble(c: Column): Column = c.try_cast("double")

  /** Strip a thousands separator then TRY_CAST — the reference's
    * `TRY_CAST(REPLACE(Total, '.', '') AS DOUBLE)` for INE rent values
    * like "13.500" → 13500.0 (pipeline.py:289).
    */
  def parseThousandsSeparated(c: Column, sep: String = "."): Column =
    tryCastDouble(regexp_replace(trim(c), java.util.regex.Pattern.quote(sep), ""))

  /** Keep only rows whose column contains no alphabetic character —
    * the reference's header/garbage-row filter
    * `NOT regexp_matches(column1, '[a-zA-Z]')` (pipeline.py:277).
    */
  def isNonAlpha(c: Column): Column = !c.rlike("[a-zA-Z]")

  /** k-th 1-based field of a delimited string — `split_part`, used by
    * the reference to take the INE code out of "01001 Name"
    * (pipeline.py:300).
    */
  def splitPart(c: Column, delim: String, k: Int): Column =
    split_part(c, lit(delim), lit(k))
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Bronze CSV ingestion (SURVEY.md §2 A1/A2) — the Spark form of the
  * reference's `read_csv_auto(url, all_varchar=true, sep=..,
  * header=.., encoding=.., ignore_errors=true)` plus audit columns
  * (/root/reference/airflow/dags/mobility_ingestion_pipeline.py:112-199,
  * 443-447).
  *
  * Schema-on-read: every column lands as VARCHAR (silver owns typing,
  * via [[graft.functions.CleanFns]]); malformed rows are captured in
  * `_corrupt_record` instead of failing the scan (PERMISSIVE — the
  * `ignore_errors` equivalent that keeps the evidence).
  */
object CsvIngest {

  val CorruptCol = "_corrupt_record"

  /** Read a CSV with explicit dialect options, all columns as string.
    *
    * @param columns when the file is headerless, the column names to
    *                assign (reference's bronze feeds include
    *                headerless exports); ignored when header=true and
    *                empty.
    */
  def read(spark: SparkSession, path: String, sep: String = ",",
      encoding: String = "UTF-8", header: Boolean = true,
      columns: Seq[String] = Nil): DataFrame = {
    val base = spark.read
      .option("sep", sep)
      .option("encoding", encoding)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
    if (columns.nonEmpty) {
      val schema = StructType(
        columns.map(StructField(_, StringType, nullable = true)) :+
          StructField(CorruptCol, StringType, nullable = true))
      base.schema(schema).csv(path)
    } else {
      // all-varchar schema-on-read: sample only the header line
      val named = base.option("inferSchema", "false").csv(path)
      val schema = StructType(
        named.schema.fields.map(f => StructField(f.name, StringType,
          nullable = true)) :+
          StructField(CorruptCol, StringType, nullable = true))
      base.schema(schema).csv(path)
    }
  }

  /** Lineage columns: ingestion timestamp, source URL, and the actual
    * file each row came from (reference's ingestion_timestamp /
    * source_url / filename).
    */
  def withAudit(df: DataFrame, sourceUrl: String): DataFrame =
    df.withColumn("ingestion_timestamp", current_timestamp())
      .withColumn("source_url", lit(sourceUrl))
      .withColumn("filename",
        regexp_extract(input_file_name(), "([^/]+)$", 1))

  /** Spark refuses plans that reference ONLY `_corrupt_record` from a
    * raw CSV scan (the parser never materializes it alone), so the
    * clean/quarantine split caches the parsed batch once — the same
    * materialization feeds both sinks, which is also the efficient
    * shape: one parse, two writes. Unpersist after the batch commits.
    */
  private def materialized(df: DataFrame): DataFrame = df.cache()

  /** Rows that failed parsing (for quarantine sinks / DQ metrics). */
  def corruptRows(df: DataFrame): DataFrame =
    materialized(df).filter(col(CorruptCol).isNotNull)

  /** Clean rows with the corrupt-record column dropped. */
  def cleanRows(df: DataFrame): DataFrame =
    materialized(df).filter(col(CorruptCol).isNull).drop(CorruptCol)
}

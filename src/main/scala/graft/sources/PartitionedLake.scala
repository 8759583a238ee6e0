package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partitioned parquet lake with idempotent partition upsert
  * (SURVEY.md §2 A3/A4) — the Spark form of the reference's
  * DELETE-partition + INSERT pattern
  * (/root/reference/airflow/dags/mobility_ingestion_pipeline.py:519-566):
  * with `spark.sql.sources.partitionOverwriteMode=dynamic` (set in
  * [[graft.GraftSession]]), `mode("overwrite")` replaces ONLY the
  * partitions present in the incoming batch — re-ingesting a day is
  * idempotent and never rewrites the rest of the table.
  *
  * Scale notes: writes shuffle-free (partitionBy reuses the incoming
  * distribution); date partitioning gives partition pruning on every
  * downstream date-filtered scan.
  */
object PartitionedLake {

  /** Overwrite exactly the partitions contained in `batch`. */
  def upsertPartitions(batch: DataFrame, path: String,
      partitionCols: String*): Unit =
    batch.write
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)

  /** Append-only write (first load / immutable partitions). */
  def append(batch: DataFrame, path: String, partitionCols: String*): Unit =
    batch.write
      .partitionBy(partitionCols: _*)
      .mode("append")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed managed table: rows are hash-distributed into `buckets`
    * files per partition by `bucketCol` at WRITE time, so two tables
    * bucketed the same way join with NO shuffle on either side — the
    * 100-TB answer for repeated fact⋈fact joins on a stable key
    * (lineitem⋈orders every day): pay the distribution once at ingest,
    * never at query. Requires the session catalog (bucket metadata
    * lives there, not in the parquet files).
    */
  def writeBucketed(batch: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit = {
    val spark = batch.sparkSession
    // an ephemeral (in-memory) catalog forgets tables between sessions
    // while the warehouse directory persists; saveAsTable refuses such
    // orphaned locations, so drop the entry and clear the leftovers
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    batch.write
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }
}

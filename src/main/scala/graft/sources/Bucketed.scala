package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed managed tables: pre-hash-partitioned storage so
  * equi-joins and aggregations on the bucket key run WITHOUT a
  * shuffle — the co-located-join half of the 100-TB playbook
  * (SURVEY §5) that partition pruning alone can't give.
  *
  * A table written with `bucketBy(n, key)` records the bucketing in
  * the catalog; every scan exposes a hash distribution over `key`,
  * so a join of two tables bucketed the same way satisfies both
  * sides' requirements with ZERO Exchange, and a `groupBy(key)`
  * aggregates map-side only. The write itself pays one shuffle
  * (cluster by bucket) ONCE; every subsequent join of the fact pair
  * — the recurring cost at scale — pays none. `sortBy` within
  * buckets additionally drops the per-join Sort of a sort-merge
  * join.
  *
  * Bucket COUNT is the contract: both sides must agree (Spark joins
  * bucketed×bucketed with differing counts by shuffling the smaller —
  * still a win, but not free). Pick nBuckets ≈ table size /
  * 128-256 MB and keep it stable across writers.
  */
object Bucketed {

  /** Write `df` as a bucketed, bucket-sorted managed parquet table.
    * Overwrites an existing table of the same name.
    */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
      nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // an in-memory catalog forgets its tables between JVMs but the
    // managed locations survive on disk; a leftover directory makes
    // CREATE refuse (LOCATION_ALREADY_EXISTS) — sweep the orphan.
    // (Unqualified default-database names only, which is this API's
    // surface; a persistent metastore never hits this path.)
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val sorts = if (sortCols.isEmpty) Seq(keyCol) else sortCols
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, keyCol)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(table)
  }

  /** Read a bucketed table (the catalog carries the distribution). */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}

package graft.lakehouse

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Incremental
import graft.sources.{AtomicLake, CommitStore, HardlinkCommitStore}

/** Incrementally-maintained materialized aggregate: a downstream
  * AtomicLake table holding `partialSums` state over a source lake,
  * refreshed from the source's CDC deltas (G20 ∘ G9 ∘ G11) instead
  * of recomputed.
  *
  * The refresh contract at 100 TB: each call reads ONLY the files the
  * source committed since the last refresh ([[AtomicLake.readChanges]]),
  * retracts/adds them into the decimal state
  * ([[Incremental.applyChanges]] — exact, so the maintained state
  * equals full recompute bit-for-bit), and commits the new state in
  * ONE atomic overwrite. The consumed source version (watermark)
  * travels as a `meta` partition INSIDE that same commit — state and
  * watermark can never diverge: a crash before the commit leaves the
  * old state with the old watermark, and the retry replays the same
  * delta (idempotent by construction since applyChanges starts from
  * the committed state).
  *
  * State tables are aggregate-sized (group cardinality), so the
  * per-refresh overwrite is cheap next to the source scan it avoids.
  */
object Materialized {

  private val PartCol = "_mat_part"
  private val WmCol = "_source_version"

  /** Refresh (or initially build) the materialized aggregate at
    * `targetRoot` over `aggKeys`/`measures` of the source lake.
    * Returns the source version now reflected. No-op (and no commit)
    * when the source hasn't moved.
    */
  def refresh(spark: SparkSession, sourceRoot: String, targetRoot: String,
      aggKeys: Seq[String], measures: Map[String, Column],
      store: CommitStore = HardlinkCommitStore): Long = {
    val srcVersion = AtomicLake.currentVersion(sourceRoot, store)
      .getOrElse(throw new IllegalStateException(
        s"no commits at source $sourceRoot"))
    val prev = watermark(spark, targetRoot, store)
    if (prev.contains(srcVersion)) return srcVersion
    val newState = prev match {
      case None => // initial build: one full aggregation of the source
        Incremental.partialSums(
          AtomicLake.readVersion(spark, sourceRoot, srcVersion, store),
          aggKeys, measures)
      case Some(v) =>
        val delta = AtomicLake.readChanges(spark, sourceRoot, v,
          srcVersion, store)
        Incremental.applyChanges(readState(spark, targetRoot, store),
          delta, aggKeys, measures)
    }
    // decimal state parquet-round-trips exactly; the meta row rides
    // the same atomic commit (nulls for every state column)
    val stateRows = newState.withColumn(PartCol, lit("state"))
      .withColumn(WmCol, lit(null).cast("long"))
    val metaRow = spark.range(1).select(
      stateRows.columns.filterNot(c => c == PartCol || c == WmCol)
        .map(c => lit(null).cast(stateRows.schema(c).dataType).as(c))
      :+ lit("meta").as(PartCol)
      :+ lit(srcVersion).cast("long").as(WmCol): _*)
    AtomicLake.overwrite(stateRows.unionByName(metaRow), targetRoot,
      partitionCols = Seq(PartCol), store = store)
    srcVersion
  }

  /** The source version the materialization currently reflects. */
  def watermark(spark: SparkSession, targetRoot: String,
      store: CommitStore = HardlinkCommitStore): Option[Long] =
    AtomicLake.currentVersion(targetRoot, store).map { _ =>
      AtomicLake.read(spark, targetRoot, store)
        .filter(col(PartCol) === "meta")
        .select(col(WmCol)).head().getLong(0)
    }

  /** The maintained partial state (aggKeys + `<m>_dec` + n_rows). */
  def readState(spark: SparkSession, targetRoot: String,
      store: CommitStore = HardlinkCommitStore): DataFrame =
    AtomicLake.read(spark, targetRoot, store)
      .filter(col(PartCol) === "state")
      .drop(PartCol, WmCol)

  /** Presentation read: finalized measures. */
  def read(spark: SparkSession, targetRoot: String,
      measureNames: Seq[String],
      store: CommitStore = HardlinkCommitStore): DataFrame =
    Incremental.finalize(readState(spark, targetRoot, store),
      measureNames)
}

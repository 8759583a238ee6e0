package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row
import graft.sources.PartitionedLake

/** Streaming ingestion into the partitioned lake (SURVEY.md §2 F6 +
  * A4 composed): each micro-batch upserts its partitions via dynamic
  * partition overwrite — the streaming form of the reference's
  * per-day DELETE+INSERT worker
  * (/root/reference/airflow/dags/mobility_ingestion_pipeline.py:485-566).
  *
  * Idempotence under replay: a re-delivered micro-batch rewrites the
  * same partitions to the same content instead of appending
  * duplicates, so at-least-once delivery upgrades to effectively-once
  * lake state as long as batches are partition-aligned (the reference
  * makes the same assumption per day-file). State: none beyond the
  * sink checkpoint; each batch is one shuffle-free partitioned write.
  */
object StreamingLake {

  /** Attach a partition-upsert sink to a streaming DataFrame. Caller
    * starts/stops the returned writer.
    */
  def upsertSink(stream: DataFrame, path: String, checkpoint: String,
      partitionCols: String*): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          PartitionedLake.upsertPartitions(batch, path, partitionCols: _*)
      }

  /** [[upsertSink]] through [[graft.sources.AtomicLake]]: each
    * micro-batch becomes ONE atomic snapshot commit, so a lake reader
    * concurrent with the stream sees whole batches only — never a
    * half-written partition mid-batch. Replayed batches re-commit the
    * same partitions to the same content (a new version, same data):
    * the same effectively-once lake state, now with snapshot
    * isolation and per-batch time travel for free.
    */
  def atomicUpsertSink(stream: DataFrame, path: String,
      checkpoint: String, partitionCols: String*): DataStreamWriter[Row] =
    atomicUpsertSink(stream, path, checkpoint, partitionCols.toSeq,
      graft.sources.HardlinkCommitStore)

  /** [[atomicUpsertSink]] against an explicit [[graft.sources.CommitStore]]
    * — the object-store deployment shape: micro-batches commit through
    * the catalog exactly like batch writers.
    */
  def atomicUpsertSink(stream: DataFrame, path: String,
      checkpoint: String, partitionCols: Seq[String],
      store: graft.sources.CommitStore): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          graft.sources.AtomicLake.upsertPartitions(batch, path,
            partitionCols, store = store)
          ()
        }
      }

  /** Convenience: start with a processing-time trigger. */
  def start(stream: DataFrame, path: String, checkpoint: String,
      trigger: Trigger, partitionCols: String*): StreamingQuery =
    upsertSink(stream, path, checkpoint, partitionCols: _*)
      .trigger(trigger).start()
}

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

  /** Crawl-ingest sink: the composition of the ACID lake (G11) and
    * the persistent near-dup index (G18). Every micro-batch of
    * (id, text) documents (1) builds-or-appends the LSH index at
    * `indexRoot` — so the NEXT batch, or any concurrent dedup job,
    * can near-dedup against everything ingested so far without ever
    * re-reading corpus text — and (2) lands the documents themselves
    * in an AtomicLake table at `docsRoot`, one snapshot commit per
    * batch.
    *
    * Replay-safe without coupling the two tables: the index append is
    * idempotent by doc id internally, and the docs append anti-joins
    * the docs table's OWN ids (keys-only, column-pruned scan) — so a
    * redelivered micro-batch, or a crash between the index and docs
    * commits, converges on retry with no duplicates in either table.
    * The index is updated FIRST: its torn-append window is
    * mechanically detectable and self-healing
    * ([[graft.operators.NearDupIndex.repair]]), whereas a docs-first
    * ordering would leave silently-unindexed documents on a crash.
    */
  def ingestWithIndexSink(stream: DataFrame, idCol: String,
      textCol: String, docsRoot: String, indexRoot: String,
      checkpoint: String, threshold: Double = 0.7,
      store: graft.sources.CommitStore = graft.sources.HardlinkCommitStore)
      : DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          import graft.operators.NearDupIndex
          import graft.sources.AtomicLake
          if (NearDupIndex.exists(indexRoot, store))
            NearDupIndex.append(batch, idCol, textCol, indexRoot, store)
          else
            NearDupIndex.build(batch, idCol, textCol, indexRoot,
              threshold, store = store)
          val fresh =
            if (AtomicLake.currentVersion(docsRoot, store).isEmpty) batch
            else {
              val landed = AtomicLake.read(batch.sparkSession, docsRoot,
                store).select(idCol)
              batch.join(landed, batch(idCol) === landed(idCol),
                "left_anti")
            }
          if (!fresh.isEmpty) {
            AtomicLake.append(fresh, docsRoot, store = store)
            ()
          }
        }
      }

  /** Streaming vector ingest ∘ live ANN index (the embedding twin of
    * [[ingestWithIndexSink]]): each micro-batch of (id, vector) rows
    * is assigned MAP-SIDE with the index's persisted centroids and
    * appended into the cell-partitioned index lake
    * ([[graft.operators.VectorIndex.append]] — idempotent by id, so a
    * redelivered micro-batch converges with no duplicate
    * assignments). The index must exist (built from a seed corpus —
    * a quantizer trained on a single first micro-batch would pin
    * arbitrary geometry); the build-first contract is checked per
    * batch and fails the query loudly instead of training silently.
    */
  def vectorIndexSink(stream: DataFrame, idCol: String,
      vecCol: String, indexRoot: String, checkpoint: String,
      store: graft.sources.CommitStore =
        graft.sources.HardlinkCommitStore): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          import graft.operators.VectorIndex
          require(VectorIndex.exists(indexRoot, store),
            s"no vector index at $indexRoot: build() one from a seed " +
              "corpus before streaming into it")
          VectorIndex.append(batch.sparkSession, batch, idCol, vecCol,
            indexRoot, store = store)
          ()
        }
      }

  /** [[vectorIndexSink]]'s PQ twin: each micro-batch encodes with the
    * PERSISTED codebooks ([[graft.operators.VectorIndex.appendPq]] —
    * map-side, no retraining, idempotent by id, so a re-delivered
    * batch is a no-op) and appends into the cell-partitioned codes
    * lake. The index must be built from a seed corpus first — the
    * codebooks ARE the corpus↔codes contract, and training them on a
    * drip of micro-batches would quantize early batches with
    * unrepresentative centroids.
    */
  def pqIndexSink(stream: DataFrame, idCol: String,
      vecCol: String, indexRoot: String, checkpoint: String,
      store: graft.sources.CommitStore =
        graft.sources.HardlinkCommitStore): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          import graft.operators.VectorIndex
          require(VectorIndex.existsPq(indexRoot, store),
            s"no pq index at $indexRoot: buildPq() one from a seed " +
              "corpus before streaming into it")
          VectorIndex.appendPq(batch.sparkSession, batch, idCol,
            vecCol, indexRoot, store = store)
          ()
        }
      }

  /** [[vectorIndexSink]]'s SQ8 twin: each micro-batch encodes with
    * the PERSISTED bounds ([[graft.operators.VectorIndex.appendSq]] —
    * map-side, no retraining, idempotent by id) and appends into the
    * cell-partitioned byte-codes lake. Build-first contract as the
    * other tiers: bounds trained on a drip of early micro-batches
    * would clip later vectors' codes.
    */
  def sqIndexSink(stream: DataFrame, idCol: String,
      vecCol: String, indexRoot: String, checkpoint: String,
      store: graft.sources.CommitStore =
        graft.sources.HardlinkCommitStore): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          import graft.operators.VectorIndex
          require(VectorIndex.existsSq(indexRoot, store),
            s"no sq index at $indexRoot: buildSq() one from a seed " +
              "corpus before streaming into it")
          VectorIndex.appendSq(batch.sparkSession, batch, idCol,
            vecCol, indexRoot, store = store)
          ()
        }
      }

  /** Streaming CDC upsert: each micro-batch MERGEs into the lake by
    * key ([[graft.sources.AtomicLake.merge]]) — matched keys get the
    * batch's row, new keys insert, untouched rows (and untouched
    * FILES, via the merge's zone-map + semi-join scoping) stay as
    * they are. The streaming half of the Delta
    * `foreachBatch + MERGE INTO` idiom.
    *
    * `latestBy` names an ordering column (event time / LSN): the
    * batch is first collapsed to the LAST change per key, so a batch
    * carrying several updates of one key lands its final image (and
    * satisfies merge's unique-key contract). Without it, a batch with
    * duplicate keys is refused loudly by the merge — silent
    * both-copies insertion can't happen.
    *
    * Replay-safe: re-merging a delivered batch replaces the same keys
    * with the same rows — the lake converges to the same state (a new
    * version, same data), the usual effectively-once contract of this
    * file's sinks. The FIRST batch bootstraps the table (creating it
    * with `partitionCols`); merge requires batches to carry the
    * partition columns.
    */
  def mergeSink(stream: DataFrame, path: String, checkpoint: String,
      keyCols: Seq[String], latestBy: Option[String] = None,
      partitionCols: Seq[String] = Nil,
      store: graft.sources.CommitStore = graft.sources.HardlinkCommitStore)
      : DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          import org.apache.spark.sql.expressions.Window
          import org.apache.spark.sql.functions.{col, row_number}
          val src = latestBy.fold(batch) { ts =>
            batch.withColumn("_graft_rn", row_number().over(
                Window.partitionBy(keyCols.map(col): _*)
                  .orderBy(col(ts).desc)))
              .filter(col("_graft_rn") === 1).drop("_graft_rn")
          }
          val spark = batch.sparkSession
          if (graft.sources.AtomicLake.currentVersion(path, store).isEmpty)
            graft.sources.AtomicLake.upsertPartitions(src, path,
              partitionCols, store = store)
          else
            graft.sources.AtomicLake.merge(spark, path, src, keyCols,
              store = store)
          ()
        }
      }

  /** Streaming expectations sink (Delta Live Tables'
    * `expect_or_drop` + quarantine, per micro-batch): each batch
    * splits against the table's CHECK constraints via
    * [[graft.sources.AtomicLake.appendExpect]] — clean rows append
    * to the table, violating rows land in the quarantine lake with
    * their violation names — so one poisoned record slows nothing
    * and loses nothing, instead of failing the trigger the way the
    * hard-enforcing sinks do. Tables without constraints degrade to
    * a plain per-batch append.
    */
  def expectSink(stream: DataFrame, path: String,
      quarantinePath: String, checkpoint: String,
      partitionCols: Seq[String] = Nil,
      store: graft.sources.CommitStore = graft.sources.HardlinkCommitStore)
      : DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          graft.sources.AtomicLake.appendExpect(batch, path,
            quarantinePath, partitionCols, store = store)
          ()
        }
      }

  /** Convenience: start with a processing-time trigger. */
  def start(stream: DataFrame, path: String, checkpoint: String,
      trigger: Trigger, partitionCols: String*): StreamingQuery =
    upsertSink(stream, path, checkpoint, partitionCols: _*)
      .trigger(trigger).start()
}

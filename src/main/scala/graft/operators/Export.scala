package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-corpus export: shard assignment and the
  * concat-and-chunk sequence-packing manifest.
  *
  * Training exports need the SAME shard layout and sequence
  * boundaries from every engine and every re-run — a retry that
  * reshuffles documents between shards invalidates downstream
  * checkpoint bookkeeping. Shard assignment therefore reuses the
  * md5-bucket portable hash ([[Sampling.hashBucket]]), and packing is
  * pure integer arithmetic over a per-shard running token sum:
  * documents are conceptually concatenated in doc-id order and split
  * at fixed token-budget boundaries (the standard pack-then-chunk LM
  * pretraining shape), so a document's sequence span is
  * `floor(start/budget) .. floor((end-1)/budget)`.
  *
  * Scale notes (100 TB): shard assignment is map-side (no shuffle);
  * the manifest's only exchange is the per-shard window sort, which
  * partitions by shard — nShards tasks, each sorting its own shard's
  * (id, n_tokens) pairs (16 B/row, never text). The physical write
  * routes whole shards to tasks so each shard is one file run.
  */
object Export {

  /** Stable shard in [0, nShards) — engine-portable md5 bucket. */
  def shardOf(key: Column, nShards: Int): Column =
    Sampling.hashBucket(key, nShards).cast("int")

  /** Per-document packing manifest: (idCol, shard, n_tokens,
    * start_tok, seq_first, seq_last) where start_tok is the
    * document's offset in its shard's concatenated token stream and
    * seq_first/seq_last the budget-sized training sequences it spans.
    * Zero-token documents occupy no span (seq_last = seq_first at
    * their boundary). All arithmetic is integral (`div`), exact at
    * any corpus size.
    */
  def packingManifest(df: DataFrame, idCol: String, tokensCol: Column,
      nShards: Int = 8, budget: Int = 256): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), shardOf(col(idCol), nShards).as("shard"),
        tokensCol.cast("int").as("n_tokens"))
      .withColumn("cum_tok", sum(col("n_tokens")).over(w).cast("long"))
      .withColumn("start_tok", col("cum_tok") - col("n_tokens"))
      .withColumn("seq_first", expr(s"start_tok div $budget"))
      .withColumn("seq_last",
        when(col("n_tokens") === 0, col("seq_first"))
          .otherwise(expr(s"(cum_tok - 1) div $budget")))
      .select(col(idCol), col("shard"), col("n_tokens"),
        col("start_tok"), col("seq_first"), col("seq_last"))
  }

  /** Write the corpus as one parquet directory per shard
    * (`path/shard=N/`), rows within a shard in ascending id order,
    * each shard written by exactly one task (one file run per shard).
    * Idempotent: a re-run produces the identical shard layout.
    */
  def writeShards(df: DataFrame, idCol: String, nShards: Int,
      path: String): Unit =
    df.withColumn("shard", shardOf(col(idCol), nShards))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Training-export JSONL: one gzip'd JSON-lines file per shard
    * (a `.json.gz` part under each `path/shard=N` directory), rows in
    * ascending id order within a shard — the interchange format LM
    * data loaders consume. Same deterministic layout contract as
    * [[writeShards]].
    */
  def writeJsonlShards(df: DataFrame, idCol: String, nShards: Int,
      path: String): Unit =
    df.withColumn("shard", shardOf(col(idCol), nShards))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))
      .write.mode("overwrite").partitionBy("shard")
      .option("compression", "gzip").json(path)

  /** Seeded deterministic global shuffle — the order-randomization
    * step before LM pretraining (a corpus fed in storage order trains
    * on long runs of one source; the shuffle must still be exactly
    * reproducible across re-runs and engines, or a resumed run reads
    * a different epoch order). Every document gets a shuffle key
    * md5(seed ":" id) — engine-portable like [[Sampling.hashBucket]]
    * — and the layout is (id, shard, pos): shard = key mod nShards,
    * pos = 0-based rank within the shard by (key, id). Changing the
    * seed is a fresh epoch permutation; same seed is byte-identical.
    *
    * Scale: the key is map-side arithmetic; the only exchange
    * partitions by shard (nShards tasks, each ranking its own
    * shard's (key, id) pairs — 16 B/row, never text), exactly the
    * [[packingManifest]] shape.
    */
  def shuffledLayout(df: DataFrame, idCol: String, seed: Long,
      nShards: Int): DataFrame = {
    val skey = conv(substring(md5(concat_ws(":",
        lit(seed).cast("string"), col(idCol).cast("string"))), 1, 8),
      16, 10).cast("long")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__skey"), col(idCol))
    df.select(col(idCol), skey.as("__skey"))
      .withColumn("shard", (col("__skey") % nShards).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** The corpus written in shuffled order: one gzip'd JSONL file per
    * shard, rows in [[shuffledLayout]] position order — the layout a
    * data loader streams per-shard for a reproducible epoch.
    */
  def writeShuffledJsonl(df: DataFrame, idCol: String, seed: Long,
      nShards: Int, path: String): Unit = {
    val skey = conv(substring(md5(concat_ws(":",
        lit(seed).cast("string"), col(idCol).cast("string"))), 1, 8),
      16, 10).cast("long")
    df.withColumn("__skey", skey)
      .withColumn("shard", (col("__skey") % nShards).cast("int"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__skey"), col(idCol))
      .drop("__skey")
      .write.mode("overwrite").partitionBy("shard")
      .option("compression", "gzip").json(path)
  }

  /** Globally-sorted export WITHOUT a single-task funnel: range
    * partition on the sort key into `nFiles` (sampled split points),
    * sort within each — file i's keys all precede file i+1's, so the
    * concatenation in part-file order IS the total order. The shape
    * for sorted-run outputs (posting lists, id-ordered eval dumps)
    * at any scale.
    */
  def writeSorted(df: DataFrame, sortCol: String, nFiles: Int,
      path: String): Unit =
    df.repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite").parquet(path)
}

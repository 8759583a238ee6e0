package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL corpus ingest with malformed-line quarantine — the inverse of
  * [[graft.operators.Export.writeJsonlShards]] and the front door of
  * an LLM data pipeline (web-scale corpora interchange as gzip'd
  * JSONL shards).
  *
  * Shape: ONE line-level scan (`spark.read.text`, gzip handled per
  * file), `from_json` parses each line map-side under PERMISSIVE mode
  * with a corrupt-record capture field, and a single pinned frame
  * splits into clean rows vs quarantine — the same
  * nothing-refused/nothing-silently-dropped posture as the
  * expectation-split ingest (AtomicLake.appendExpect): a torn line, a
  * schema-violating record, or a null required key degrades to a
  * quarantine row carrying the raw line and its file, never a lost
  * row and never a failed job.
  *
  * Why not `spark.read.json` + a filter on `_corrupt_record`: Spark
  * refuses raw-column filters on the json source's corrupt column
  * (it requires caching the whole scan); `from_json` over `text`
  * rows has no such restriction, keeps the plan one scan, and leaves
  * the raw line available for the quarantine payload for free.
  */
object JsonlIngest {

  val CorruptCol = "_corrupt_record"

  /** Result of a quarantining ingest: `clean` rows match `schema`
    * exactly; `quarantine` carries (raw line, source file, reason).
    */
  final case class Split(clean: DataFrame, quarantine: DataFrame)

  /** Shared map-side parse/tag transform over a `value: string` line
    * frame (batch or streaming): emits (value, src_file, j, reason)
    * with `reason` null for clean rows.
    */
  private def tagged(lines: DataFrame, schema: StructType,
      requiredCols: Seq[String]): DataFrame = {
    val withCorrupt = schema.add(CorruptCol, StringType)
    val missing: Column = requiredCols
      .map(c => col(s"j.$c").isNull)
      .foldLeft(lit(false))(_ || _)
    lines
      .select(col("value"),
        regexp_extract(input_file_name(), "([^/]+)$", 1).as("src_file"),
        from_json(col("value"), withCorrupt, Map(
          "mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)).as("j"))
      .withColumn("reason",
        when(col("j").isNull || col(s"j.$CorruptCol").isNotNull,
          lit("malformed_json"))
          .when(missing, lit("null_required_field")))
  }

  private def cleanOf(df: DataFrame, schema: StructType): DataFrame =
    df.filter(col("reason").isNull)
      .select(schema.fieldNames.map(f => col(s"j.$f")): _*)

  private def quarantineOf(df: DataFrame): DataFrame =
    df.filter(col("reason").isNotNull)
      .select(col("value").as("raw_line"), col("src_file"), col("reason"))

  /** Parse `path` (file, dir, or glob; .gz transparent) as JSONL with
    * `schema`. Lines that fail to parse — or parse but null out any
    * of `requiredCols` — land in quarantine instead of the table.
    * `recursiveFileLookup` ignores partition dirs (e.g. the
    * `shard=N/` layout [[graft.operators.Export.writeJsonlShards]]
    * writes), so ingest sees lines, not inferred partition columns.
    */
  def readWithQuarantine(spark: SparkSession, path: String,
      schema: StructType, requiredCols: Seq[String] = Nil): Split = {
    val parsed = tagged(
      spark.read.option("recursiveFileLookup", "true")
        .textFile(path).toDF(), schema, requiredCols)
    Split(cleanOf(parsed, schema), quarantineOf(parsed))
  }

  /** Streaming crawl ingest: tail a landing directory of JSONL files
    * (the crawl-drop workflow) as a tagged stream — same parse, same
    * reasons as the batch form. Pair with [[ingestSink]].
    */
  def stream(spark: SparkSession, path: String, schema: StructType,
      requiredCols: Seq[String] = Nil): DataFrame =
    tagged(
      spark.readStream.option("recursiveFileLookup", "true")
        .text(path), schema, requiredCols)

  /** Per-micro-batch sink for a [[stream]] frame: clean rows append
    * atomically to the lake at `tablePath`, quarantine rows to
    * `quarantinePath` — a poisoned crawl file slows nothing and loses
    * nothing (the G35 posture, at the parse boundary).
    */
  def ingestSink(taggedStream: DataFrame, schema: StructType,
      tablePath: String, quarantinePath: String, checkpoint: String,
      store: CommitStore = HardlinkCommitStore)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] = {
    // exactly-once: tag each table's append with (appId, batchId)
    // (the manifest txn watermark) and skip redelivered micro-batches
    val appId = s"jsonl-ingest:$checkpoint"
    taggedStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // one pinned evaluation serves both sides (the appendExpect
        // discipline — parse each line once, not once per consumer)
        val pinned = batch.localCheckpoint()
        try {
          val clean = cleanOf(pinned, schema)
          val bad = quarantineOf(pinned)
          def fresh(root: String): Boolean =
            !AtomicLake.lastTxn(root, appId, store).exists(_ >= batchId)
          if (fresh(tablePath) && !clean.isEmpty)
            AtomicLake.append(clean, tablePath, store = store,
              txn = Some(appId -> batchId))
          if (fresh(quarantinePath) && !bad.isEmpty)
            AtomicLake.append(bad, quarantinePath, store = store,
              txn = Some(appId -> batchId))
        } finally pinned.unpersist(blocking = false)
        ()
      }
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming ingestion (SURVEY.md §2 F6): file source →
  * watermark → tumbling hourly aggregation — the streaming twin of
  * [[graft.operators.Sessionize.tumblingHour]] (same `window()`
  * construct, same output schema), so a pipeline can replay history in
  * batch and tail live data with identical semantics.
  *
  * Scale notes: the windowed aggregation is stateful per (window,
  * event_type); the 2-hour watermark bounds state (old windows are
  * evicted once the watermark passes), so state size is O(active
  * windows × types), independent of stream length.
  */
object EventsStream {

  /** The events schema (a streaming file source cannot infer). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tail a directory of parquet event files as a stream. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Watermarked tumbling hourly aggregation — identical output
    * columns to the batch `tumblingHour`.
    */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours")
      : DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.queries.exactSum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming exact dedup — the ingest-time twin of
    * [[graft.operators.Dedup.exact]]: drop rows whose key columns were
    * already seen, keeping dedup state only within the watermark
    * horizon (`dropDuplicatesWithinWatermark`), so state is bounded by
    * the event-time window instead of growing with the stream. An
    * at-least-once upstream (replayed files, redelivered messages)
    * becomes exactly-once content into the lake.
    */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-stream interval join (SURVEY.md §2 F11): each left event
    * matches right events with the same key whose timestamp falls in
    * `[l.ts - before, l.ts + after]` — the click↔impression /
    * order↔payment correlation shape. BOTH the watermarks and the
    * range condition are load-bearing: together they bound how long
    * each side's rows stay buffered in join state, so state is
    * O(events per key per window), independent of stream length.
    * Without the range bound Spark must hold every row forever.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      before: String = "1 hour", after: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark("ts", watermark).alias("l")
    val r = right.withColumnRenamed("ts", "r_ts")
      .withWatermark("r_ts", watermark).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col("r_ts") >= col("ts") - expr(s"INTERVAL $before") &&
        col("r_ts") <= col("ts") + expr(s"INTERVAL $after"))
  }
}

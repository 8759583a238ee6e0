package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sessionization and time-window aggregation (SURVEY.md §2 F4/F5).
  *
  * Batch form of the gap-session semantics; the streaming twin lives in
  * [[graft.streaming.StatefulSessions]] (flatMapGroupsWithState) and
  * the tumbling window in [[graft.streaming.EventsStream]], so
  * pipelines can replay history in batch and tail live data with the
  * same definitions.
  *
  * Scale notes: one shuffle on the user key serves both the window
  * pass and the final aggregation (Catalyst reuses the partitioning);
  * the tumbling aggregation is a plain partial-aggregated groupBy.
  */
object Sessionize {

  /** Parameters for gap sessionization — a single config drives both
    * the Spark plan and the DuckDB oracle SQL so the two can never
    * silently desynchronize.
    */
  final case class GapConfig(userCol: String = "user_id",
      tsCol: String = "ts", idCol: String = "event_id",
      valueCol: String = "value", gapMinutes: Int = 30) {
    def gapMicros: Long = gapMinutes * 60_000_000L
  }

  /** Split each user's event stream into sessions separated by more
    * than `gapMinutes` of inactivity, then aggregate per session.
    *
    * The gap test compares exact integer microseconds
    * (`unix_micros(ts) - unix_micros(lag(ts)) > gap`), never doubles:
    * a double roundtrip loses ~2.4e-7 s at epoch magnitude, enough to
    * flip a strict comparison when a gap equals the threshold exactly.
    */
  def batchGapSessions(events: DataFrame, cfg: GapConfig): DataFrame = {
    val w = Window.partitionBy(col(cfg.userCol))
      .orderBy(col(cfg.tsCol), col(cfg.idCol))
    // CPU-aware exchange (the r13 sf1 finding, same as ngramJaccard's
    // posting stage): the user-keyed exchange carries few BYTES, so
    // bytes-based AQE coalescing packs it into one task — which then
    // sorts and windows the whole stream single-threaded (measured:
    // 9.8 s for 1M events on one core vs ~1 s 32-way). An explicit
    // partition count is exempt from coalescing, and the Window's
    // required distribution is satisfied by it — no extra exchange.
    events
      .repartition(events.sparkSession.conf
        .get("spark.sql.shuffle.partitions").toInt, col(cfg.userCol))
      .withColumn("new_sess",
        when(lag(col(cfg.tsCol), 1).over(w).isNull ||
          unix_micros(col(cfg.tsCol)) -
            unix_micros(lag(col(cfg.tsCol), 1).over(w)) > cfg.gapMicros,
          1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(cfg.userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(cfg.tsCol)).as("session_start"),
        max(col(cfg.tsCol)).as("session_end"),
        graft.queries.exactSum(col(cfg.valueCol)).as("total_value"))
  }

  /** DuckDB oracle generated from the SAME config as the Spark plan.
    * `epoch_us(a - b)` is the exact integer microsecond difference, so
    * the strict `>` boundary matches Spark's `unix_micros` compare
    * bit-for-bit.
    */
  def gapSessionsOracle(cfg: GapConfig): String = {
    import cfg._
    s"""WITH flagged AS (
       |  SELECT $userCol, $tsCol, $idCol, $valueCol,
       |    CASE WHEN lag($tsCol) OVER w IS NULL
       |           OR epoch_us($tsCol - lag($tsCol) OVER w) > $gapMicros
       |         THEN 1 ELSE 0 END AS new_sess
       |  FROM events
       |  WINDOW w AS (PARTITION BY $userCol ORDER BY $tsCol, $idCol)
       |), sess AS (
       |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY $userCol
       |    ORDER BY $tsCol, $idCol ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
       |  FROM flagged
       |)
       |SELECT $userCol, session_id, count(*) AS n_events,
       |  min($tsCol) AS session_start, max($tsCol) AS session_end,
       |  CAST(sum(CAST($valueCol AS DECIMAL(18,4))) AS DOUBLE) AS total_value
       |FROM sess
       |GROUP BY $userCol, session_id""".stripMargin
  }

  /** Hourly tumbling-window counts/sums — batch equivalent of the
    * streaming `window(ts, "1 hour")` aggregation. Uses the streaming-
    * compatible `window()` construct so the plan is identical to the
    * readStream variant.
    */
  def tumblingHour(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.queries.exactSum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  val tumblingHourOracle: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2""".stripMargin
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sessionization and time-window aggregation (SURVEY.md §2 F4/F5).
  *
  * Batch twin of the streaming operators in [[graft.streaming]]: the
  * gap-session logic here matches `StatefulSessions` and the tumbling
  * window matches `EventsStream`, so pipelines can replay history in
  * batch and tail live data with the same semantics.
  *
  * Scale notes: one shuffle on the user key serves both the window
  * pass and the final aggregation (Catalyst reuses the partitioning);
  * the tumbling aggregation is a plain partial-aggregated groupBy.
  */
object Sessionize {

  /** Split each user's event stream into sessions separated by more
    * than `gapMinutes` of inactivity, then aggregate per session.
    */
  def batchGapSessions(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, valueCol: String, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val gapSec = gapMinutes * 60L
    events
      .withColumn("new_sess",
        when(lag(col(tsCol), 1).over(w).isNull ||
          col(tsCol).cast("double") - lag(col(tsCol), 1).over(w).cast("double")
            > gapSec, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        graft.queries.exactSum(col(valueCol)).as("total_value"))
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

  val gapSessionsOracle: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sess AS (
      |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM flagged
      |)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM sess
      |GROUP BY user_id, session_id""".stripMargin

  val tumblingHourOracle: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2""".stripMargin
}

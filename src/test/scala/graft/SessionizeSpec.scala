package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, t: String, v: Double) =
    (id, user, Timestamp.valueOf(t), v)

  describe("batchGapSessions") {
    val cfg = Sessionize.GapConfig(gapMinutes = 30)

    it("splits on gaps strictly greater than the threshold") {
      val df = Seq(
        ev(1, 1, "2024-01-01 10:00:00", 1.0),
        ev(2, 1, "2024-01-01 10:30:00", 1.0), // exactly 30m: same session
        ev(3, 1, "2024-01-01 11:00:01", 1.0), // 30m01s: new session
        ev(4, 2, "2024-01-01 10:00:00", 1.0)
      ).toDF("event_id", "user_id", "ts", "value")
      val out = Sessionize.batchGapSessions(df, cfg)
        .orderBy("user_id", "session_id")
        .select("user_id", "session_id", "n_events")
        .as[(Long, Long, Long)].collect()
      out shouldBe Array((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L))
    }

    it("holds the exact boundary even at epoch magnitude (no FP gap test)") {
      // 30 minutes to the microsecond — double-seconds arithmetic would
      // see ~1800.0000002 and wrongly open a new session.
      val base = "2024-01-01 10:00:00.000001"
      val df = Seq(
        ev(1, 1, base, 1.0),
        ev(2, 1, "2024-01-01 10:30:00.000001", 1.0)
      ).toDF("event_id", "user_id", "ts", "value")
      Sessionize.batchGapSessions(df, cfg).count() shouldBe 1
    }

    it("aggregates value exactly per session") {
      val df = Seq(
        ev(1, 1, "2024-01-01 10:00:00", 0.1),
        ev(2, 1, "2024-01-01 10:05:00", 0.2)
      ).toDF("event_id", "user_id", "ts", "value")
      Sessionize.batchGapSessions(df, cfg)
        .select("total_value").as[Double].head() shouldBe 0.3
    }
  }

  describe("tumblingHour") {
    it("buckets events into hour windows") {
      val df = Seq(
        ev(1, 1, "2024-01-01 10:05:00", 1.0),
        ev(2, 1, "2024-01-01 10:55:00", 2.0),
        ev(3, 1, "2024-01-01 11:00:00", 4.0)
      ).toDF("event_id", "user_id", "ts", "value")
        .withColumn("event_type", lit("view"))
      val out = Sessionize.tumblingHour(df)
        .orderBy("window_start")
        .select("n_events", "total_value").as[(Long, Double)].collect()
      out shouldBe Array((2L, 3.0), (1L, 4.0))
    }
  }
}

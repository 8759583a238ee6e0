package graft

import org.apache.spark.sql.functions._
import graft.lakehouse.{Gold, Silver}
import graft.operators.Gravity
import graft.sources.Tables

class GoldSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = Silver.buildFactEvents(Tables.events(spark, sf),
    Tables.customer(spark, sf), Tables.nation(spark, sf)).cache()

  describe("hourlyProfile") {
    it("covers every (date, hour) with data and sums exactly") {
      val p = Gold.hourlyProfile(fact)
      p.agg(sum($"n_trips_rows")).as[Long].head() shouldBe fact.count()
      p.filter($"hour" < 0 || $"hour" > 23).count() shouldBe 0
    }
  }

  describe("weekdayWeekendProfile") {
    it("splits day types and keeps consistent day counts per hour") {
      val p = Gold.weekdayWeekendProfile(fact)
      p.select("day_type").distinct().as[String].collect().sorted shouldBe
        Array("weekday", "weekend")
      // every hour of a day type is averaged over the same number of days
      p.groupBy("day_type").agg(countDistinct($"n_days")).count() shouldBe 2
    }
  }

  describe("tierSummary") {
    it("buckets all zones into 4 tiers and conserves total trips") {
      val rentMetric = Gravity.zoneRent(Tables.customer(spark, sf))
        .withColumnRenamed("rent", "metric")
      val t = Gold.tierSummary(fact, rentMetric)
      t.count() shouldBe 4
      t.agg(sum($"n_zones")).as[Long].head() shouldBe 25L
      val total = fact.agg(graft.queries.exactSum($"trips")).as[Double].head()
      t.agg(sum($"trips_generated")).as[Double].head() shouldBe total +- 1e-6
      t.agg(sum($"trips_attracted")).as[Double].head() shouldBe total +- 1e-6
    }
  }

  describe("odMatrix / gravity") {
    it("conserves rows and computes a floored positive distance") {
      val od = Gold.odMatrix(fact)
      od.agg(sum($"n_trips_rows")).as[Long].head() shouldBe fact.count()
      val cust = Tables.customer(spark, sf)
      val gaps = Gravity.infrastructureGaps(fact,
        Gravity.zonePopulation(cust), Gravity.zoneRent(cust))
      gaps.filter($"dist_km" < 0.5).count() shouldBe 0
      // same-zone pairs hit the 0.5 km floor
      gaps.filter($"origin_zone_id" === $"destination_zone_id" &&
        $"dist_km" =!= 0.5).count() shouldBe 0
      gaps.filter($"potential" <= 0).count() shouldBe 0
    }
  }

  describe("pivotHourlyProfile") {
    it("row-normalizes every day to share sum 1") {
      val p = Gold.pivotHourlyProfile(fact)
      val shareSum = (0 to 23).map(h => col(s"h$h")).reduce(_ + _)
      p.select(shareSum.as("s")).as[Double].collect().foreach { s =>
        s shouldBe 1.0 +- 1e-9
      }
    }
  }
}

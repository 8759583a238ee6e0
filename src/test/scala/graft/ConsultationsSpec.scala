package graft

import org.apache.spark.sql.functions._
import graft.lakehouse.Consultations

/** The parameterized consultation API — the reference's actual user
  * surface (polygon WKT + date window as task parameters).
  */
class ConsultationsSpec extends SparkSpec {
  import spark.implicits._

  private val wideWkt =
    "POLYGON((-200 -200, -200 600, 600 600, 600 -200, -200 -200))"
  // covers the 3x3 corner of the 5x5 zone grid (zones with centroid
  // coordinates <= 200 after the +-60 polygon halo)
  private val cornerWkt =
    "POLYGON((-5 -5, -5 155, 155 155, 155 -5, -5 -5))"

  describe("polygonClusterDemand") {
    it("narrowing the date window never widens days_in_sample") {
      val wide = Consultations.polygonClusterDemand(spark, sf,
        wideWkt, "2024-01-01", "2024-01-30")
      val narrow = Consultations.polygonClusterDemand(spark, sf,
        wideWkt, "2024-01-10", "2024-01-12")
      val wmax = wide.agg(max($"days_in_sample")).as[Long].head()
      val nmax = narrow.agg(max($"days_in_sample")).as[Long].head()
      nmax should be <= 3L
      wmax should be >= nmax
    }
    it("a polygon covering one corner selects fewer zones' demand") {
      def demand(wkt: String): Double =
        Consultations.polygonClusterDemand(spark, sf,
          wkt, "2024-01-01", "2024-01-30")
          .agg(coalesce(sum($"avg_trips" * $"days_in_sample"), lit(0.0)))
          .as[Double].head()
      val all = demand(wideWkt)
      val corner = demand(cornerWkt)
      corner should be < all
      corner should be > 0.0
    }
  }

  describe("input validation") {
    it("rejects invalid WKT instead of silently returning empty") {
      an[IllegalArgumentException] should be thrownBy
        Consultations.polygonClusterDemand(spark, sf,
          "POLYGON(50 -50, 50 250)", "2024-01-01", "2024-01-30")
      an[IllegalArgumentException] should be thrownBy
        Consultations.polygonClusterDemand(spark, sf,
          "POLYGON((1 2, 3 junk, 1 2))", "2024-01-01", "2024-01-30")
    }
  }

  describe("topInfrastructureGaps") {
    it("honors topN and the deterministic tiebreak order") {
      val t5 = Consultations.topInfrastructureGaps(spark, sf,
        "2024-01-01", "2024-01-30", topN = 5).collect()
      t5.length shouldBe 5
      val ratios = t5.map(_.getAs[Double]("mismatch_ratio"))
      ratios.sorted.toSeq shouldBe ratios.toSeq
    }
    it("the date window changes the ranked flows") {
      val full = Consultations.topInfrastructureGaps(spark, sf,
        "2024-01-01", "2024-01-30").collect()
      val slim = Consultations.topInfrastructureGaps(spark, sf,
        "2024-01-15", "2024-01-16").collect()
      full.map(_.getAs[Double]("actual_trips")).sum should be >
        slim.map(_.getAs[Double]("actual_trips")).sum
    }
  }
}

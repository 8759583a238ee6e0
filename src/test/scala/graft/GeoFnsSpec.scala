package graft

import org.apache.spark.sql.functions._
import graft.functions.GeoFns

class GeoFnsSpec extends SparkSpec {
  import spark.implicits._

  private val square = "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))"

  describe("haversineKm") {
    it("matches known reference distances") {
      // Madrid (40.4168, -3.7038) ↔ Barcelona (41.3874, 2.1686) ≈ 505 km
      val d = Seq((40.4168, -3.7038, 41.3874, 2.1686))
        .toDF("lat1", "lon1", "lat2", "lon2")
        .select(GeoFns.haversineKm($"lat1", $"lon1", $"lat2", $"lon2"))
        .as[Double].head()
      d shouldBe 504.6 +- 2.0
    }
    it("is zero for identical points and symmetric") {
      val df = Seq((10.0, 20.0, 35.0, -40.0)).toDF("a", "b", "c", "d")
      df.select(GeoFns.haversineKm($"a", $"b", $"a", $"b"))
        .as[Double].head() shouldBe 0.0 +- 1e-9
      val fwd = df.select(GeoFns.haversineKm($"a", $"b", $"c", $"d"))
        .as[Double].head()
      val rev = df.select(GeoFns.haversineKm($"c", $"d", $"a", $"b"))
        .as[Double].head()
      fwd shouldBe rev +- 1e-9
    }
    it("one degree of longitude at the equator is ~111.19 km") {
      Seq((0.0, 0.0, 0.0, 1.0)).toDF("a", "b", "c", "d")
        .select(GeoFns.haversineKm($"a", $"b", $"c", $"d"))
        .as[Double].head() shouldBe 111.19 +- 0.1
    }
  }

  describe("geodesicKm (WGS84 Andoyer–Lambert)") {
    def g(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double =
      Seq((lat1, lon1, lat2, lon2)).toDF("a", "b", "c", "d")
        .select(GeoFns.geodesicKm($"a", $"b", $"c", $"d"))
        .collect()(0).getDouble(0)

    it("matches known WGS84 geodesic distances") {
      // one degree of longitude along the equator: a*pi/180 = 111.3195 km
      g(0, 0, 0, 1) shouldBe 111.3195 +- 0.01
      // one degree of meridian arc from the equator: 110.574 km
      g(0, 0, 1, 0) shouldBe 110.574 +- 0.05
      // Paris <-> Marseille WGS84 geodesic ~ 661 km
      g(48.8566, 2.3522, 43.2965, 5.3698) shouldBe 661.0 +- 1.5
    }
    it("is zero for identical points") {
      g(40.0, -3.0, 40.0, -3.0) shouldBe 0.0
    }
    it("differs from haversine by well under 0.5%") {
      val (hv, gd) = Seq((40.4168, -3.7038, 41.3874, 2.1686))
        .toDF("a", "b", "c", "d")
        .select(GeoFns.haversineKm($"a", $"b", $"c", $"d"),
          GeoFns.geodesicKm($"a", $"b", $"c", $"d"))
        .as[(Double, Double)].head()
      math.abs(hv - gd) / gd should be < 0.005
    }
  }

  describe("parseWktPolygon") {
    it("parses a square ring with coordinates in order") {
      val ring = Seq(square).toDF("wkt")
        .select(GeoFns.parseWktPolygon($"wkt").as("r"))
        .selectExpr("transform(r, v -> array(v.x, v.y)) AS pts")
        .as[Seq[Seq[Double]]].head()
      ring.length shouldBe 5
      ring.head shouldBe Seq(0.0, 0.0)
      ring(2) shouldBe Seq(10.0, 10.0)
      ring.last shouldBe ring.head
    }
    it("returns null when any coordinate is unparseable") {
      val rings = Seq("POLYGON((a b, 1 2, 3 4, a b))",
          "POLYGON((1 2, 3 junk, 1 2))",
          "POLYGON((1 2, 3, 4 5, 1 2))", // vertex with one token
          "POLYGON((1 2,,3 4,1 2))")     // empty vertex
        .toDF("wkt").select(GeoFns.parseWktPolygon($"wkt")).collect()
      rings.foreach(_.isNullAt(0) shouldBe true)
    }
    it("returns null for junk text") {
      Seq("not a polygon").toDF("wkt")
        .select(GeoFns.parseWktPolygon($"wkt").isNull)
        .as[Boolean].head() shouldBe true
    }
    it("accepts pretty-printed WKT with newlines between vertices") {
      val pretty = "POLYGON((0 0,\n 0 10,\n 10 10,\n 10 0,\n 0 0))"
      Seq(pretty).toDF("wkt")
        .select(org.apache.spark.sql.functions.size(
          GeoFns.parseWktPolygon($"wkt")))
        .as[Int].head() shouldBe 5
    }
    it("degenerate 1-vertex rings don't kill ANSI scans") {
      val one = Seq("POLYGON((1 2))").toDF("wkt")
        .select(GeoFns.parseWktPolygon($"wkt").as("r"))
      one.select(GeoFns.centroid($"r").isNull)
        .as[Boolean].head() shouldBe true
      one.select(GeoFns.pointInPolygonReference(
          org.apache.spark.sql.functions.lit(1.0),
          org.apache.spark.sql.functions.lit(2.0), $"r"))
        .as[Boolean].head() shouldBe false
    }
  }

  describe("pointInPolygon") {
    it("classifies inside/outside for a square") {
      val ring = GeoFns.parseWktPolygon(lit(square))
      val pts = Seq((5.0, 5.0, true), (15.0, 5.0, false),
        (-1.0, -1.0, false), (9.99, 0.01, true))
      val got = pts.map { case (x, y, _) => (x, y) }.toDF("x", "y")
        .select(GeoFns.pointInPolygon($"x", $"y", ring))
        .as[Boolean].collect()
      got shouldBe pts.map(_._3).toArray
    }
    it("handles a concave polygon") {
      // L-shape: notch cut from the top-right
      val l = "POLYGON((0 0, 10 0, 10 5, 5 5, 5 10, 0 10, 0 0))"
      val ring = GeoFns.parseWktPolygon(lit(l))
      Seq((7.0, 7.0), (2.0, 7.0), (7.0, 2.0)).toDF("x", "y")
        .select(GeoFns.pointInPolygon($"x", $"y", ring))
        .as[Boolean].collect() shouldBe Array(false, true, true)
    }
  }

  describe("polygonsIntersect") {
    def ri(a: String, b: String): Boolean =
      Seq((a, b)).toDF("a", "b").select(
        GeoFns.polygonsIntersect(
          GeoFns.parseWktPolygon($"a"), GeoFns.parseWktPolygon($"b")))
        .collect()(0).getBoolean(0)

    it("detects plus-sign overlap where no vertex is inside the other") {
      // vertical bar × horizontal bar: edges cross, all vertices outside
      val vert = "POLYGON((4 -10, 6 -10, 6 20, 4 20, 4 -10))"
      val horiz = "POLYGON((-10 4, 20 4, 20 6, -10 6, -10 4))"
      ri(vert, horiz) shouldBe true
      ri(horiz, vert) shouldBe true
    }
    it("detects containment in both directions") {
      val inner = "POLYGON((3 3, 7 3, 7 7, 3 7, 3 3))"
      ri(square, inner) shouldBe true
      ri(inner, square) shouldBe true
    }
    it("rejects disjoint polygons") {
      val far = "POLYGON((100 100, 110 100, 110 110, 100 110, 100 100))"
      ri(square, far) shouldBe false
      ri(far, square) shouldBe false
    }
    it("accepts a shared-edge boundary touch (ST_Intersects semantics)") {
      val adjacent = "POLYGON((10 0, 20 0, 20 10, 10 10, 10 0))"
      ri(square, adjacent) shouldBe true
    }
    it("keeps a boundary-straddling zone the centroid test drops") {
      // centroid (15, 5) is right of the square, polygon straddles x=10
      val straddle = "POLYGON((8 2, 22 2, 22 8, 8 8, 8 2))"
      val centroidInside = Seq(1).toDF("i").select(
        GeoFns.pointInPolygon(lit(15.0), lit(5.0),
          GeoFns.parseWktPolygon(lit(square)))).collect()(0).getBoolean(0)
      centroidInside shouldBe false
      ri(square, straddle) shouldBe true
    }
  }

  describe("bbox + centroid") {
    it("computes the ring bbox") {
      val r = Seq(square).toDF("wkt")
        .select(GeoFns.ringBBox(GeoFns.parseWktPolygon($"wkt")).as("b"))
        .selectExpr("b.xmin", "b.ymin", "b.xmax", "b.ymax")
        .as[(Double, Double, Double, Double)].head()
      r shouldBe ((0.0, 0.0, 10.0, 10.0))
    }
    it("centroid of a square is its center") {
      val c = Seq(square).toDF("wkt")
        .select(GeoFns.centroid(GeoFns.parseWktPolygon($"wkt")).as("c"))
        .selectExpr("c.x", "c.y").as[(Double, Double)].head()
      c._1 shouldBe 5.0 +- 1e-9
      c._2 shouldBe 5.0 +- 1e-9
    }
    it("centroid of an asymmetric triangle is the vertex mean") {
      val t = "POLYGON((0 0, 9 0, 0 9, 0 0))"
      val c = Seq(t).toDF("wkt")
        .select(GeoFns.centroid(GeoFns.parseWktPolygon($"wkt")).as("c"))
        .selectExpr("c.x", "c.y").as[(Double, Double)].head()
      c._1 shouldBe 3.0 +- 1e-9
      c._2 shouldBe 3.0 +- 1e-9
    }
  }

  describe("simplifyPolygon (Douglas-Peucker, D6)") {
    def simp(wkt: String, eps: Double): Seq[(Double, Double)] =
      Seq(wkt).toDF("w")
        .select(GeoFns.simplifyPolygon(
          GeoFns.parseWktPolygon($"w"), eps).as("r"))
        .as[Seq[(Double, Double)]].head()

    it("drops collinear and near-collinear vertices, keeps corners") {
      // a square traced with redundant midpoints on every edge
      val noisy = "POLYGON((0 0, 5 0.01, 10 0, 10 5, 10 10, " +
        "5 9.99, 0 10, 0 5, 0 0))"
      val out = simp(noisy, eps = 0.1)
      out shouldBe Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0),
        (0.0, 10.0), (0.0, 0.0))
    }

    it("keeps a genuinely significant vertex above eps") {
      val notched = "POLYGON((0 0, 5 2, 10 0, 10 10, 0 10, 0 0))"
      val out = simp(notched, eps = 0.5)
      out should contain((5.0, 2.0))
    }

    it("closed rings stay closed; tiny rings pass through") {
      val out = simp(square, eps = 3.0)
      out.head shouldBe out.last
      simp("POLYGON((0 0, 1 0, 0 0))", 10.0) shouldBe
        Seq((0.0, 0.0), (1.0, 0.0), (0.0, 0.0))
    }

    it("simplified ring agrees with the full ring on interior tests " +
        "away from the boundary") {
      val noisy = "POLYGON((0 0, 5 0.01, 10 0, 10 5, 10 10, " +
        "5 9.99, 0 10, 0 5, 0 0))"
      val pts = Seq((5.0, 5.0), (1.0, 1.0), (9.0, 9.0), (15.0, 5.0),
        (-1.0, 5.0))
      val df = pts.toDF("x", "y").crossJoin(
        Seq(noisy).toDF("w").select(
          GeoFns.parseWktPolygon($"w").as("full")))
        .withColumn("simp",
          GeoFns.simplifyPolygon(col("full"), 0.1))
      val rows = df.select(
        GeoFns.pointInPolygon($"x", $"y", $"full"),
        GeoFns.pointInPolygon($"x", $"y", $"simp"))
        .as[(Boolean, Boolean)].collect()
      rows.foreach { case (a, b) => a shouldBe b }
    }
  }
}

package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.GeoFns
import graft.operators.Gravity

/** Spatial query family (SURVEY.md §2 D1-D5) over the synthetic zone
  * grid (planar centroids derived from nation keys — the testdata has
  * no real geometry). `geo_bbox_filter` is oracle-gated (pure
  * comparisons); the trig/parse paths are [R] + GeoFnsSpec.
  */
object GeoQueries {

  /** The consultation polygon (a rotated-square WKT) used by the [R]
    * polygon filter — plays the reference's DEFAULT_POLYGON
    * (mobility_consultations.py:11).
    */
  val consultationWkt: String =
    "POLYGON((50 -50, 50 250, 350 250, 350 -50, 50 -50))"

  private def zonePolygons(s: org.apache.spark.sql.SparkSession,
      dir: String) =
    graft.lakehouse.Consultations.zonePolygons(s, dir)

  val queries: Map[String, Q] = Map(

    // D4 — planar bbox filter over zone centroids ([O]: arithmetic
    // and comparisons only).
    "geo_bbox_filter" -> { (s, dir) =>
      val zones = Tables.nation(s, dir)
        .select(col("n_nationkey").cast("long").as("zone_id"),
          Gravity.zoneXKm(col("n_nationkey")).as("x_km"),
          Gravity.zoneYKm(col("n_nationkey")).as("y_km"))
      zones.filter(GeoFns.inBBox(col("x_km"), col("y_km"),
        0.0, 0.0, 250.0, 150.0))
    },

    // D1 — haversine distance between all zone pairs on a synthetic
    // lat/lon grid ([R]: trig).
    "geo_distance_pairs" -> { (s, dir) =>
      val z = Tables.nation(s, dir).select(
        col("n_nationkey").cast("long").as("zone_id"),
        (col("n_nationkey") * 2.0 - 25.0).as("lat"),
        (col("n_nationkey") * 5.0 - 60.0).as("lon"))
      val a = z.select(col("zone_id").as("zone_a"),
        col("lat").as("lat_a"), col("lon").as("lon_a"))
      val b = z.select(col("zone_id").as("zone_b"),
        col("lat").as("lat_b"), col("lon").as("lon_b"))
      a.join(b, col("zone_a") < col("zone_b"))
        .select(col("zone_a"), col("zone_b"),
          GeoFns.haversineKm(col("lat_a"), col("lon_a"),
            col("lat_b"), col("lon_b")).as("dist_km"))
    },

    // D2 + D3 — WKT parse + point-in-polygon filter ([R]).
    "geo_polygon_filter" -> { (s, dir) =>
      val ring = GeoFns.parseWktPolygon(lit(consultationWkt))
      Tables.nation(s, dir)
        .select(col("n_nationkey").cast("long").as("zone_id"),
          Gravity.zoneXKm(col("n_nationkey")).as("x_km"),
          Gravity.zoneYKm(col("n_nationkey")).as("y_km"))
        .filter(GeoFns.pointInPolygon(col("x_km"), col("y_km"), ring))
    },

    // D3 — polygon×polygon ST_Intersects: zones whose square polygon
    // overlaps the consultation polygon ([R] + GeoFnsSpec). Strictly
    // wider than the centroid-containment stand-in: a boundary zone
    // whose centroid is outside but whose polygon straddles the query
    // edge is kept, matching the reference's
    // ST_Intersects(zo.polygon, ST_GeomFromText('{wkt}')).
    "geo_polygon_intersects" -> { (s, dir) =>
      val qring = GeoFns.parseWktPolygon(lit(consultationWkt))
      zonePolygons(s, dir)
        .filter(GeoFns.polygonsIntersect(col("ring"), qring))
        .select(col("zone_id"), col("x_km"), col("y_km"),
          GeoFns.pointInPolygon(col("x_km"), col("y_km"), qring)
            .as("centroid_inside"))
    },

    // Flagship consultation (reference mobility_consultations.py:28-127):
    // demand profile for zones INTERSECTING a user-supplied WKT polygon
    // within a date window, broken down by the gold cluster
    // assignments — spatial filter × clustering × fact in one plan
    // ([R]: depends on KMeans). A fixed instantiation of the
    // parameterized Consultations API.
    "consult_polygon_clusters" -> { (s, dir) =>
      graft.lakehouse.Consultations.polygonClusterDemand(s, dir,
        consultationWkt, GoldQueries.consultStart, GoldQueries.consultEnd)
    }
  )

  val oracles: Map[String, String] = Map(
    // Flagship consultation, pinned at the driver SF: deterministic
    // now that the KMeans feed is canonically ordered (Clustering
    // .scala) — avg_trips comes out of decimal-routed exactAvg, so
    // the doubles are bit-stable and pinnable. SF-scoped in check.py
    // (HASH_SF_SCOPED) like the gold_cluster_* family.
    "consult_polygon_clusters" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), CAST(0 AS INT), CAST(412.74583333333334 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (CAST(0 AS BIGINT), CAST(1 AS INT), CAST(426.5116666666667 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (CAST(0 AS BIGINT), CAST(2 AS INT), CAST(356.57916666666665 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (CAST(0 AS BIGINT), CAST(3 AS INT), CAST(326.02 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (CAST(0 AS BIGINT), CAST(4 AS INT), CAST(660.4708333333333 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (CAST(0 AS BIGINT), CAST(5 AS INT), CAST(546.9133333333333 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (CAST(0 AS BIGINT), CAST(6 AS INT), CAST(366.16083333333336 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (CAST(0 AS BIGINT), CAST(7 AS INT), CAST(499.7175 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (CAST(0 AS BIGINT), CAST(8 AS INT), CAST(473.82666666666665 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (CAST(0 AS BIGINT), CAST(9 AS INT), CAST(442.4708333333333 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (CAST(0 AS BIGINT), CAST(10 AS INT), CAST(572.2083333333334 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (CAST(0 AS BIGINT), CAST(11 AS INT), CAST(510.5525 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (CAST(0 AS BIGINT), CAST(12 AS INT), CAST(425.14416666666665 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (CAST(0 AS BIGINT), CAST(13 AS INT), CAST(482.2225 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (CAST(0 AS BIGINT), CAST(14 AS INT), CAST(357.42249999999996 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (CAST(0 AS BIGINT), CAST(15 AS INT), CAST(508.25083333333333 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (CAST(0 AS BIGINT), CAST(16 AS INT), CAST(498.4483333333333 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (CAST(0 AS BIGINT), CAST(17 AS INT), CAST(403.70416666666665 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (CAST(0 AS BIGINT), CAST(18 AS INT), CAST(388.7175 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (CAST(0 AS BIGINT), CAST(19 AS INT), CAST(584.9399999999999 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (CAST(0 AS BIGINT), CAST(20 AS INT), CAST(447.2091666666667 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (CAST(0 AS BIGINT), CAST(21 AS INT), CAST(396.30833333333334 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (CAST(0 AS BIGINT), CAST(22 AS INT), CAST(413.99916666666667 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (CAST(0 AS BIGINT), CAST(23 AS INT), CAST(532.8275 AS DOUBLE), CAST(12 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(0 AS INT), CAST(481.24875 AS DOUBLE), CAST(8 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(1 AS INT), CAST(422.61375 AS DOUBLE), CAST(8 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(2 AS INT), CAST(508.83875 AS DOUBLE), CAST(8 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(3 AS INT), CAST(429.065 AS DOUBLE), CAST(8 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(4 AS INT), CAST(393.94 AS DOUBLE), CAST(8 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(5 AS INT), CAST(402.6925 AS DOUBLE), CAST(8 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(6 AS INT), CAST(535.11125 AS DOUBLE), CAST(8 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(7 AS INT), CAST(351.175 AS DOUBLE), CAST(8 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(8 AS INT), CAST(338.1675 AS DOUBLE), CAST(8 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(9 AS INT), CAST(515.14625 AS DOUBLE), CAST(8 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(10 AS INT), CAST(396.2075 AS DOUBLE), CAST(8 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(11 AS INT), CAST(332.0325 AS DOUBLE), CAST(8 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(12 AS INT), CAST(409.31375 AS DOUBLE), CAST(8 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(13 AS INT), CAST(477.4525 AS DOUBLE), CAST(8 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(14 AS INT), CAST(704.9525 AS DOUBLE), CAST(8 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(15 AS INT), CAST(656.4025 AS DOUBLE), CAST(8 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(16 AS INT), CAST(287.44375 AS DOUBLE), CAST(8 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(17 AS INT), CAST(400.5375 AS DOUBLE), CAST(8 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(18 AS INT), CAST(516.7825 AS DOUBLE), CAST(8 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(19 AS INT), CAST(527.03 AS DOUBLE), CAST(8 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(20 AS INT), CAST(385.30625 AS DOUBLE), CAST(8 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(21 AS INT), CAST(347.4025 AS DOUBLE), CAST(8 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(22 AS INT), CAST(396.62 AS DOUBLE), CAST(8 AS BIGINT)),
        |  (CAST(1 AS BIGINT), CAST(23 AS INT), CAST(285.96125 AS DOUBLE), CAST(8 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(0 AS INT), CAST(352.22166666666664 AS DOUBLE), CAST(6 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(1 AS INT), CAST(429.57666666666665 AS DOUBLE), CAST(6 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(2 AS INT), CAST(599.305 AS DOUBLE), CAST(6 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(3 AS INT), CAST(511.99333333333334 AS DOUBLE), CAST(6 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(4 AS INT), CAST(295.65500000000003 AS DOUBLE), CAST(6 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(5 AS INT), CAST(357.3233333333333 AS DOUBLE), CAST(6 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(6 AS INT), CAST(750.9566666666666 AS DOUBLE), CAST(6 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(7 AS INT), CAST(610.9350000000001 AS DOUBLE), CAST(6 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(8 AS INT), CAST(427.3833333333334 AS DOUBLE), CAST(6 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(9 AS INT), CAST(574.965 AS DOUBLE), CAST(6 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(10 AS INT), CAST(489.8966666666667 AS DOUBLE), CAST(6 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(11 AS INT), CAST(402.925 AS DOUBLE), CAST(6 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(12 AS INT), CAST(369.98 AS DOUBLE), CAST(6 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(13 AS INT), CAST(428.86833333333334 AS DOUBLE), CAST(6 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(14 AS INT), CAST(487.6033333333333 AS DOUBLE), CAST(6 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(15 AS INT), CAST(476.57 AS DOUBLE), CAST(6 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(16 AS INT), CAST(359.6483333333333 AS DOUBLE), CAST(6 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(17 AS INT), CAST(695.0799999999999 AS DOUBLE), CAST(6 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(18 AS INT), CAST(498.2166666666667 AS DOUBLE), CAST(6 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(19 AS INT), CAST(272.5 AS DOUBLE), CAST(6 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(20 AS INT), CAST(284.09 AS DOUBLE), CAST(6 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(21 AS INT), CAST(567.33 AS DOUBLE), CAST(6 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(22 AS INT), CAST(518.6933333333333 AS DOUBLE), CAST(6 AS BIGINT)),
        |  (CAST(2 AS BIGINT), CAST(23 AS INT), CAST(455.73 AS DOUBLE), CAST(6 AS BIGINT))
        |) t(cluster_id, hour, avg_trips, days_in_sample)""".stripMargin,
    // The consultation polygon and the zone polygons are axis-aligned
    // rectangles on THIS data, so the general kernels (ray cast,
    // edge-pair intersects) are oracle-checkable with pure interval
    // comparisons: centroid-in = BETWEEN the query bounds;
    // square×rect intersects = interval overlap on both axes. No zone
    // coordinate lands exactly on a boundary, so strict-vs-inclusive
    // edge conventions cannot diverge.
    "geo_polygon_filter" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS zone_id,
        |  CAST(n_nationkey % 5 AS DOUBLE) * 100.0 AS x_km,
        |  floor(n_nationkey / 5.0) * 100.0 AS y_km
        |FROM nation
        |WHERE CAST(n_nationkey % 5 AS DOUBLE) * 100.0 BETWEEN 50.0 AND 350.0
        |  AND floor(n_nationkey / 5.0) * 100.0 BETWEEN -50.0 AND 250.0""".stripMargin,
    "geo_polygon_intersects" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS zone_id,
        |  CAST(n_nationkey % 5 AS DOUBLE) * 100.0 AS x_km,
        |  floor(n_nationkey / 5.0) * 100.0 AS y_km,
        |  (CAST(n_nationkey % 5 AS DOUBLE) * 100.0 BETWEEN 50.0 AND 350.0
        |   AND floor(n_nationkey / 5.0) * 100.0 BETWEEN -50.0 AND 250.0)
        |    AS centroid_inside
        |FROM nation
        |WHERE CAST(n_nationkey % 5 AS DOUBLE) * 100.0 - 60.0 <= 350.0
        |  AND CAST(n_nationkey % 5 AS DOUBLE) * 100.0 + 60.0 >= 50.0
        |  AND floor(n_nationkey / 5.0) * 100.0 - 60.0 <= 250.0
        |  AND floor(n_nationkey / 5.0) * 100.0 + 60.0 >= -50.0""".stripMargin,
    "geo_bbox_filter" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS zone_id,
        |  CAST(n_nationkey % 5 AS DOUBLE) * 100.0 AS x_km,
        |  floor(n_nationkey / 5.0) * 100.0 AS y_km
        |FROM nation
        |WHERE CAST(n_nationkey % 5 AS DOUBLE) * 100.0 BETWEEN 0.0 AND 250.0
        |  AND floor(n_nationkey / 5.0) * 100.0 BETWEEN 0.0 AND 150.0""".stripMargin
  )
}

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

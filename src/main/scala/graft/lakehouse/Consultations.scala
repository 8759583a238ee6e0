package graft.lakehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.GeoFns
import graft.operators.{Clustering, Gravity}
import graft.sources.Tables

/** The reference's consultation API, parameterized exactly as its DAG
  * tasks are (/root/reference/airflow/dags/mobility_consultations.py):
  * a user-supplied WKT polygon and a partition_date window. The
  * SparkEntry queries `consult_polygon_clusters` / `consult_top_gaps`
  * are fixed instantiations of these functions, so the driver gate
  * exercises the same code paths a reference user would call.
  *
  * Scale notes: the polygon filter runs over the bounded zone dim
  * (broadcast); the date window is a partition-pruning predicate on
  * the fact (on the partitioned lake it prunes directories before any
  * IO); cluster assignments are a materialized gold artifact reused
  * across consultations, never retrained per call.
  */
object Consultations {

  /** Demand profile for zones whose polygon INTERSECTS the query
    * polygon, within [start, end], broken down by the gold cluster
    * assignments (mobility_consultations.py:28-127).
    */
  /** The reference's ST_GeomFromText RAISES on invalid WKT; a null
    * ring here would instead silently drop every zone — fail fast at
    * the user-facing entry point. Mirrors [[GeoFns.parseWktPolygon]]:
    * a POLYGON((...)) body whose every vertex is two numbers.
    */
  private def requireValidWkt(wkt: String): Unit = {
    val body = "(?s)POLYGON\\s*\\(\\(\\s*(.*?)\\s*\\)\\)".r
      .findFirstMatchIn(wkt).map(_.group(1)).getOrElse("")
    val ok = body.nonEmpty && body.split("\\s*,\\s*").forall { p =>
      val xy = p.trim.split("\\s+")
      xy.length >= 2 &&
        xy.take(2).forall(t => scala.util.Try(t.toDouble).isSuccess)
    }
    require(ok, s"invalid WKT polygon: $wkt")
  }

  def polygonClusterDemand(spark: SparkSession, dir: String, wkt: String,
      start: String, end: String): DataFrame =
    polygonClusterDemand(spark, dir, wkt, start, end,
      zonePolygons(spark, dir))

  /** [[polygonClusterDemand]] against a caller-supplied zones dim —
    * the ingested-geodata path: any (zone_id, polygon_wkt, ring) frame
    * works, in particular [[graft.sources.GeoJsonIngest.zones]] output
    * (the reference's API-fetched municipal polygons,
    * mobility_ingestion_pipeline.py:85-111).
    */
  def polygonClusterDemand(spark: SparkSession, dir: String, wkt: String,
      start: String, end: String, zones: DataFrame): DataFrame = {
    requireValidWkt(wkt)
    val qring = GeoFns.parseWktPolygon(lit(wkt))
    val zonesIn = zones
      .filter(GeoFns.polygonsIntersect(col("ring"), qring))
      .select(col("zone_id"))
    val fact = factWindow(spark, dir, start, end)
    val local = fact
      .join(broadcast(zonesIn.withColumnRenamed("zone_id", "o_zone")),
        col("origin_zone_id") === col("o_zone"))
      .join(broadcast(zonesIn.withColumnRenamed("zone_id", "d_zone")),
        col("destination_zone_id") === col("d_zone"))
      .groupBy(col("partition_date").as("date"),
        hour(col("period")).as("hour"))
      .agg(graft.queries.exactSum(col("trips")).as("local_trips"))
    // cluster model is trained on the FULL fact (assignments are a
    // gold artifact); the date window restricts the demand rows only
    val assign = Clustering.assignmentsCached(
      Silver.factEventsCached(spark, dir), dir)
    local.join(broadcast(assign), Seq("date"))
      .groupBy(col("cluster_id"), col("hour"))
      .agg((sum(col("local_trips").cast(DecimalType(18, 4)))
          .cast("double") / count(lit(1))).as("avg_trips"),
        countDistinct(col("date")).as("days_in_sample"))
  }

  /** Top-N worst infrastructure gaps by gravity-model mismatch within
    * [start, end], in the reference's presentation shape
    * (mobility_consultations.py:141-157: integer potential, 4-dp
    * mismatch, 2-dp distance, deterministic tiebreak).
    */
  def topInfrastructureGaps(spark: SparkSession, dir: String,
      start: String, end: String, topN: Int = 10): DataFrame = {
    val cust = Tables.customer(spark, dir)
    Gravity.infrastructureGaps(factWindow(spark, dir, start, end),
      Gravity.zonePopulation(cust), Gravity.zoneRent(cust))
      .select(col("origin_zone_id"), col("destination_zone_id"),
        col("total_actual_trips").as("actual_trips"),
        floor(col("potential")).cast("long").as("potential"),
        round(col("mismatch_ratio"), 4).as("mismatch_ratio"),
        round(col("dist_km"), 2).as("dist_km"))
      .orderBy(col("mismatch_ratio").asc_nulls_last,
        col("origin_zone_id"), col("destination_zone_id"))
      .limit(topN)
  }

  /** Zones with square polygons (±60 km around the grid centroid),
    * stored as WKT and parsed back — the reference's dim_zones keeps
    * polygon WKT per zone (pipeline.py:240) and consultations parse
    * it with ST_GeomFromText before intersecting.
    */
  def zonePolygons(spark: SparkSession, dir: String): DataFrame = {
    val half = 60.0
    val z = Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("long").as("zone_id"),
        Gravity.zoneXKm(col("n_nationkey")).as("x_km"),
        Gravity.zoneYKm(col("n_nationkey")).as("y_km"))
    z.withColumn("polygon_wkt", format_string(
        "POLYGON((%.1f %.1f, %.1f %.1f, %.1f %.1f, %.1f %.1f, %.1f %.1f))",
        col("x_km") - half, col("y_km") - half,
        col("x_km") - half, col("y_km") + half,
        col("x_km") + half, col("y_km") + half,
        col("x_km") + half, col("y_km") - half,
        col("x_km") - half, col("y_km") - half))
      .withColumn("ring", GeoFns.parseWktPolygon(col("polygon_wkt")))
  }

  private def factWindow(spark: SparkSession, dir: String,
      start: String, end: String): DataFrame =
    Silver.factEventsCached(spark, dir).filter(
      col("partition_date").between(lit(start).cast("date"),
        lit(end).cast("date")))
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.{exactAvg, exactSum}

/** Gravity model for infrastructure-gap detection (SURVEY.md §2 C5/C6)
  * — the Spark form of the reference's `infrastructure_gaps` table
  * (/root/reference/airflow/dags/mobility_ingestion_pipeline.py:826-849):
  * `potential = population * rent / dist²` with a GREATEST distance
  * floor and a NULLIF-guarded `mismatch_ratio = actual / potential`.
  *
  * Zone centroids are synthetic planar coordinates derived
  * deterministically from the zone id (a 5×5 grid, 100 km spacing) —
  * the testdata has no real geometry; the reference's spheroid distance
  * between polygon centroids maps to [[graft.functions.GeoFns]] when
  * real WKT is present.
  *
  * Scale notes: the OD aggregation shuffles once on the pair key; the
  * per-zone population/rent/centroid tables are zone-cardinality and
  * broadcast into the pair join. Every arithmetic step is either exact
  * (integer-valued doubles, decimal sums) or a single correctly-rounded
  * IEEE op, so results hash-match across engines.
  */
object Gravity {

  /** Synthetic planar centroid (km) for a zone id: 5-wide grid,
    * 100 km cell spacing.
    */
  def zoneXKm(z: Column): Column = (z % 5).cast("double") * lit(100.0)
  def zoneYKm(z: Column): Column = floor(z / lit(5.0)) * lit(100.0)

  /** Planar centroid distance with the reference's 0.5 km floor
    * (GREATEST(0.5, dist)).
    */
  def distKm(zo: Column, zd: Column): Column = {
    val dx = zoneXKm(zo) - zoneXKm(zd)
    val dy = zoneYKm(zo) - zoneYKm(zd)
    greatest(lit(0.5), sqrt(dx * dx + dy * dy))
  }

  /** Build the gaps table: one row per OD pair with actual trips,
    * gravity potential, and mismatch ratio.
    *
    * @param fact (origin_zone_id, destination_zone_id, trips)
    * @param population (zone_id, population) — zone-cardinality
    * @param rent (zone_id, rent) — zone-cardinality
    */
  def infrastructureGaps(fact: DataFrame, population: DataFrame,
      rent: DataFrame): DataFrame = {
    val od = fact.groupBy(col("origin_zone_id"), col("destination_zone_id"))
      .agg(exactSum(col("trips")).as("total_actual_trips"))
    // layered projections: dist_km and potential become columns so the
    // sqrt/div subtrees appear ONCE in the generated code instead of
    // being re-expanded in every consumer expression
    od
      .join(broadcast(population),
        od("origin_zone_id") === population("zone_id"))
      .drop("zone_id")
      .join(broadcast(rent), od("destination_zone_id") === rent("zone_id"))
      .drop("zone_id")
      .withColumn("dist_km",
        distKm(col("origin_zone_id"), col("destination_zone_id")))
      .withColumn("potential",
        col("population") * col("rent") /
          (col("dist_km") * col("dist_km")))
      .select(
        col("origin_zone_id"), col("destination_zone_id"),
        col("total_actual_trips"), col("dist_km"), col("potential"),
        (col("total_actual_trips") /
          nullif(col("potential"), lit(0.0))).as("mismatch_ratio"))
  }

  /** Per-zone population = customers per nation; per-zone rent = exact
    * average account balance — the testdata stand-ins for the
    * reference's INE population / rent metrics.
    */
  def zonePopulation(customer: DataFrame): DataFrame =
    customer.groupBy(col("c_nationkey").cast("long").as("zone_id"))
      .agg(count(lit(1)).cast("double").as("population"))

  def zoneRent(customer: DataFrame): DataFrame =
    customer.groupBy(col("c_nationkey").cast("long").as("zone_id"))
      .agg(exactAvg(col("c_acctbal")).as("rent"))
}

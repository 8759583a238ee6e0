package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GeoJSON FeatureCollection ingest → a plain DataFrame with a WKT
  * geometry column — the geodata leg of the reference's zone ingest
  * (mobility_ingestion_pipeline.py:85-99: pyspainmobility API →
  * GeoDataFrame → `gdf.geometry.to_wkt()` → plain pandas frame),
  * re-expressed Spark-first: Spark's JSON source parses the
  * FeatureCollection, each feature's `geometry.coordinates` subtree is
  * captured as a RAW JSON string (a StringType field in the schema
  * receives the unparsed subtree — one schema covers every geometry
  * type instead of per-depth array schemas), and the codegen'd
  * [[graft.expressions.NativeKernels.geoJsonToWkt]] kernel converts it
  * per-feature. Properties stay as one raw JSON string for downstream
  * `get_json_object` extraction (the silver JSON-property pattern).
  *
  * Scale: one bounded zones file parses on one task (it is a dim —
  * the reference's municipal zones are a few thousand rows), but the
  * shape holds for feature-per-line or many-file corpora too: the
  * explode and the WKT kernel are per-row map-side work, nothing
  * shuffles.
  */
object GeoJsonIngest {

  /** One schema for every geometry type: `coordinates` as raw JSON
    * text (depth varies Point→MultiPolygon; the kernel handles it),
    * `properties` as raw JSON text.
    */
  private val schema = StructType(Seq(
    StructField("type", StringType),
    StructField("features", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("properties", StringType),
      StructField("geometry", StructType(Seq(
        StructField("type", StringType),
        StructField("coordinates", StringType))))))))))

  /** Read GeoJSON FeatureCollection file(s) into
    * (feature_id, properties_json, geom_type, wkt). Features whose
    * geometry is malformed or of an unsupported type keep their row
    * with `wkt` null (the reference's junk-geometry rows surface for
    * quarantine, never kill the scan).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").schema(schema).json(path)
      .select(explode(col("features")).as("f"))
      .select(
        col("f.id").as("feature_id"),
        col("f.properties").as("properties_json"),
        col("f.geometry.type").as("geom_type"),
        graft.expressions.NativeKernels
          .geoJsonToWktCol(col("f.geometry.type"),
            col("f.geometry.coordinates")).as("wkt"))

  /** [[read]] + a named property extracted per feature + the parsed
    * polygon ring — the zones-dim shape
    * [[graft.lakehouse.Consultations.zonePolygons]] consumes
    * (zone_id, polygon_wkt, ring). `idProp` is the feature property
    * holding the zone key (the reference keys zones on a municipal
    * code property).
    */
  def zones(spark: SparkSession, path: String, idProp: String)
      : DataFrame =
    read(spark, path)
      .select(
        get_json_object(col("properties_json"), s"$$.$idProp")
          .cast("long").as("zone_id"),
        col("wkt").as("polygon_wkt"))
      .withColumn("ring",
        graft.functions.GeoFns.parseWktPolygon(col("polygon_wkt")))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Spatial column functions (SURVEY.md §2 D1-D5) — the Spark form of
  * the reference's DuckDB-spatial calls: ST_GeomFromText /
  * ST_Intersects / ST_Centroid / st_distance_spheroid
  * (/root/reference/airflow/dags/mobility_consultations.py:66-68,
  * mobility_ingestion_pipeline.py:240,838).
  *
  * Polygons are `array<struct<x:double,y:double>>` (closed ring, last
  * vertex = first). Everything is built-in expressions over that
  * representation — parse once in silver, evaluate predicates
  * per-row with no UDFs, so spatial filters stay inside whole-stage
  * codegen'd projections and pushable scans.
  */
object GeoFns {

  private val EarthRadiusKm = 6371.0088

  /** Great-circle distance in km (haversine, mean-Earth radius).
    * Trig-based — deterministic within one engine, [R]/spec-checked
    * rather than hash-gated (libm sin/cos are not exactly rounded).
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column)
      : Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2 * EarthRadiusKm) * asin(sqrt(a))
  }

  // WGS84 ellipsoid
  private val SemiMajorKm = 6378.137
  private val Flattening = 1.0 / 298.257223563

  /** Ellipsoidal (spheroid) distance in km — Andoyer–Lambert
    * first-order flattening correction over WGS84, the engine's
    * counterpart of the reference's `st_distance_spheroid` (sprint1 nb
    * cell 49). Agrees with true geodesics to ~10 m at continental
    * scale (breaks down only near antipodal pairs, like every
    * first-order formula); [[haversineKm]] (mean-Earth sphere) differs
    * from this by up to ~0.5% — use that one when speed matters more
    * than ellipsoidal accuracy.
    */
  def geodesicKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column)
      : Column = {
    val oneMinusF = lit(1.0 - Flattening)
    val b1 = atan(oneMinusF * tan(radians(lat1)))
    val b2 = atan(oneMinusF * tan(radians(lat2)))
    val dLon = radians(lon2 - lon1)
    // central angle on the reduced-latitude sphere (haversine form —
    // stable for small angles)
    val sigma = lit(2.0) * asin(sqrt(
      pow(sin((b2 - b1) / 2), 2) +
        cos(b1) * cos(b2) * pow(sin(dLon / 2), 2)))
    val p = (b1 + b2) / 2
    val q = (b2 - b1) / 2
    val x = (sigma - sin(sigma)) * pow(sin(p) * cos(q), 2) /
      pow(cos(sigma / 2), 2)
    val y = (sigma + sin(sigma)) * pow(cos(p) * sin(q), 2) /
      pow(sin(sigma / 2), 2)
    when(sigma === 0.0, lit(0.0))
      .otherwise(lit(SemiMajorKm) *
        (sigma - lit(Flattening / 2) * (x + y)))
  }

  /** Parse "POLYGON((x y, x y, ...))" into the ring representation.
    * Null for non-matching text (the reference's geometry rows are
    * occasionally junk — parse failures must not kill the scan).
    */
  def parseWktPolygon(wkt: Column): Column = {
    // (?s): pretty-printed WKT carries newlines between vertices —
    // without DOTALL the body match stops at the first one and the
    // polygon silently parses to null (matching zero zones) even
    // though the consultation's fail-fast guard accepted it
    val body = regexp_extract(wkt,
      "(?s)POLYGON\\s*\\(\\(\\s*(.*?)\\s*\\)\\)", 1)
    // try_element_at + try_cast: under ANSI a vertex with missing or
    // junk coordinates would otherwise kill the whole scan at runtime
    val ring = transform(split(body, "\\s*,\\s*"), p => {
      val xy = split(trim(p), "\\s+")
      struct(try_element_at(xy, lit(1)).try_cast("double").as("x"),
        try_element_at(xy, lit(2)).try_cast("double").as("y"))
    })
    // any unparseable coordinate poisons the whole ring (null, the
    // ST_GeomFromText reject-invalid behavior) — downstream kernels
    // must never see half-parsed vertices as silent zeros
    when(length(body) > 0 &&
      !exists(ring, v => v.getField("x").isNull || v.getField("y").isNull),
      ring)
  }

  /** Even-odd ray casting: true when (x, y) is inside the ring —
    * native kernel ([[graft.expressions.NativeKernels.rayCast]]). When
    * the ring is a literal (the consultation pattern: one user-supplied
    * WKT filtering a huge fact), the optimizer rule
    * [[graft.plans.PolygonBBoxPruning]] conjoins a derived bounding-box
    * predicate that CAN push down to parquet scans — the ray cast
    * itself never can.
    */
  def pointInPolygon(x: Column, y: Column, ring: Column): Column =
    graft.expressions.NativeKernels
      .rayCastCol(x.cast("double"), y.cast("double"), ring)

  /** Douglas–Peucker ring simplification (D6): every dropped vertex
    * lies within `eps` of the simplified outline, endpoints survive,
    * closed rings stay closed — the pre-step that turns a
    * 2000-vertex municipal boundary into a few-dozen-vertex ring
    * before it rides a per-row ray cast (edge tests per row scale
    * with ring size). Native kernel; see
    * [[graft.expressions.NativeKernels.simplifyRing]].
    */
  def simplifyPolygon(ring: Column, eps: Double): Column =
    graft.expressions.NativeKernels.simplifyRingCol(ring, eps)

  /** Declarative reference form of [[pointInPolygon]]: one fold over
    * the edges — no UDF, no collect.
    */
  def pointInPolygonReference(x: Column, y: Column, ring: Column): Column = {
    val crossings = aggregate(
      sequence(lit(1), size(ring) - 1), lit(0L),
      (acc, i) => {
        val v1 = element_at(ring, i)
        val v2 = element_at(ring, i + 1)
        val x1 = v1.getField("x"); val y1 = v1.getField("y")
        val x2 = v2.getField("x"); val y2 = v2.getField("y")
        val straddles = (y1 > y) =!= (y2 > y)
        val xCross = (x2 - x1) * (y - y1) / (y2 - y1) + x1
        acc + when(straddles && x < xCross, 1L).otherwise(0L)
      })
    // a ring with < 2 vertices has no edges — and sequence(1, 0)
    // would DESCEND ([1, 0]), making element_at(ring, 0) kill the
    // scan under ANSI; degenerate rings contain nothing
    when(size(ring) >= 2, crossings % 2 === 1).otherwise(lit(false))
  }

  /** Polygon–polygon ST_Intersects over two closed rings — the
    * predicate the reference's consultations actually evaluate
    * (mobility_consultations.py:67-68,153-154:
    * `ST_Intersects(zo.polygon, ST_GeomFromText('{wkt}'))`): true on
    * any edge crossing/touch OR containment either way. A zone whose
    * polygon overlaps the query but whose centroid lies outside is
    * correctly kept (the centroid-containment stand-in dropped it).
    * Native kernel with an internal bbox precheck; for 100-TB scans
    * materialize [[ringBBox]] as scalar columns and conjoin the box
    * compare so it reaches parquet's PushedFilters.
    */
  def polygonsIntersect(a: Column, b: Column): Column =
    graft.expressions.NativeKernels.ringsIntersectCol(a, b)

  /** Planar bounding-box containment. */
  def inBBox(x: Column, y: Column,
      xmin: Double, ymin: Double, xmax: Double, ymax: Double): Column =
    x >= xmin && x <= xmax && y >= ymin && y <= ymax

  /** Bounding box of a ring as struct(xmin, ymin, xmax, ymax). */
  def ringBBox(ring: Column): Column =
    struct(
      array_min(transform(ring, v => v.getField("x"))).as("xmin"),
      array_min(transform(ring, v => v.getField("y"))).as("ymin"),
      array_max(transform(ring, v => v.getField("x"))).as("xmax"),
      array_max(transform(ring, v => v.getField("y"))).as("ymax"))

  /** Polygon centroid (shoelace formula) as struct(x, y). Falls back
    * to the vertex mean for degenerate (zero-area) rings.
    */
  def centroid(ring: Column): Column = {
    val terms = transform(sequence(lit(1), size(ring) - 1), i => {
      val v1 = element_at(ring, i)
      val v2 = element_at(ring, i + 1)
      val cross = v1.getField("x") * v2.getField("y") -
        v2.getField("x") * v1.getField("y")
      struct(cross.as("a"),
        ((v1.getField("x") + v2.getField("x")) * cross).as("cx"),
        ((v1.getField("y") + v2.getField("y")) * cross).as("cy"))
    })
    val area2 = aggregate(terms, lit(0.0), (acc, t) => acc + t.getField("a"))
    val cx = aggregate(terms, lit(0.0), (acc, t) => acc + t.getField("cx"))
    val cy = aggregate(terms, lit(0.0), (acc, t) => acc + t.getField("cy"))
    val n = (size(ring) - 1).cast("double")
    val openRing = slice(ring, lit(1), size(ring) - 1)
    val meanX = aggregate(openRing, lit(0.0),
      (acc, v) => acc + v.getField("x")) / n
    val meanY = aggregate(openRing, lit(0.0),
      (acc, v) => acc + v.getField("y")) / n
    // < 2 vertices: no edges, no area, and the shoelace sequence
    // would go out of bounds under ANSI — null, the junk-geometry
    // posture of parseWktPolygon
    when(size(ring) < 2,
      lit(null).cast("struct<x:double,y:double>"))
      .when(area2 =!= 0.0,
        struct((cx / (lit(3.0) * area2)).as("x"),
          (cy / (lit(3.0) * area2)).as("y")))
      .otherwise(struct(meanX.as("x"), meanY.as("y")))
  }
}

package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import graft.expressions.NativeKernels

/** Catalyst optimizer rule (SURVEY.md §2 custom-plan tier): a
  * point-in-polygon filter against a LITERAL ring — the consultation
  * pattern, one user-supplied WKT polygon filtering a huge fact — is
  * opaque to every storage optimization: the ray-cast invocation can
  * never reach parquet's PushedFilters, so the scan reads everything.
  *
  * This rule computes the ring's bounding box at plan time and
  * conjoins `x >= xmin AND x <= xmax AND y >= ymin AND y <= ymax`
  * with the ray cast. The bbox conjuncts are plain comparisons on the
  * input columns, so they push down to the scan (row-group pruning at
  * 100 TB) and short-circuit the ray-cast loop for far-away rows.
  *
  * Idempotent: bounds already present as conjuncts (semantic equality)
  * are not re-added, so the optimizer reaching fixpoint does not grow
  * the predicate.
  */
case class PolygonBBoxPruning() extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Plan-time evaluable: deterministic and input-independent. HOF
    * trees like `transform(parseWkt(lit))` are never `foldable`, but
    * they evaluate fine interpreted — which is exactly the
    * consultation's literal-polygon shape.
    */
  private def planTimeConstant(e: Expression): Boolean =
    e.deterministic && e.references.isEmpty

  private def bboxOf(ringLit: Expression): Option[(Double, Double, Double, Double)] = {
    val data = scala.util.Try(ringLit.eval(null)).getOrElse(null)
      .asInstanceOf[ArrayData]
    if (data == null || data.numElements() == 0) return None
    var (xmin, ymin) = (Double.MaxValue, Double.MaxValue)
    var (xmax, ymax) = (Double.MinValue, Double.MinValue)
    var i = 0
    while (i < data.numElements()) {
      val v = data.getStruct(i, 2)
      if (v.isNullAt(0) || v.isNullAt(1)) return None
      val x = v.getDouble(0); val y = v.getDouble(1)
      if (x < xmin) xmin = x; if (x > xmax) xmax = x
      if (y < ymin) ymin = y; if (y > ymax) ymax = y
      i += 1
    }
    Some((xmin, ymin, xmax, ymax))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val existing = conjuncts(cond)
      val additions = existing.flatMap {
        case si: StaticInvoke
            if si.functionName == "rayCast" &&
              si.staticObject == NativeKernels.getClass &&
              si.arguments.size >= 3 &&
              planTimeConstant(si.arguments(2)) =>
          val Seq(xe, ye, ringE) = si.arguments.take(3)
          bboxOf(ringE).toSeq.flatMap { case (xmin, ymin, xmax, ymax) =>
            Seq(
              GreaterThanOrEqual(xe, Literal(xmin)),
              LessThanOrEqual(xe, Literal(xmax)),
              GreaterThanOrEqual(ye, Literal(ymin)),
              LessThanOrEqual(ye, Literal(ymax)))
          }.filterNot(b => existing.exists(_.semanticEquals(b)))
        case _ => Nil
      }
      if (additions.isEmpty) f
      else Filter((additions :+ cond).reduce(And), child)
  }
}

/** Session extensions entry point — registered via
  * `spark.sql.extensions=graft.plans.GraftExtensions` (set by
  * [[graft.GraftSession]]).
  *
  * Besides the optimizer rule, registers the spatial functions under
  * the reference's SQL names
  * (/root/reference/airflow/dags/mobility_consultations.py:66-68 uses
  * ST_GeomFromText / ST_Intersects / ST_Centroid in raw SQL), so a
  * reference user's SQL consultations run through `spark.sql` with
  * only the geometry representation changed (ring arrays instead of
  * GEOMETRY blobs).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.graftbridge.Bridge
  import graft.functions.GeoFns

  private def register(ext: SparkSessionExtensions, name: String,
      usage: String, arity: Int)(
      build: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column)
      : Unit =
    ext.injectFunction((FunctionIdentifier(name),
      new ExpressionInfo("graft.functions.GeoFns", name, usage),
      (children: Seq[Expression]) => {
        require(children.size == arity,
          s"$name expects $arity arguments, got ${children.size}")
        Bridge.toExpression(build(children.map(Bridge.column)))
      }))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => PolygonBBoxPruning())
    // lake-maintenance DDL (OPTIMIZE / RESTORE / DESCRIBE HISTORY /
    // ALTER LAKE ADD CONSTRAINT / VACUUM …) — see plans/LakeSql.scala
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    register(ext, "st_geomfromtext",
      "st_geomfromtext(wkt) - parse a WKT POLYGON to a ring", 1) {
      c => GeoFns.parseWktPolygon(c(0))
    }
    register(ext, "st_centroid",
      "st_centroid(ring) - polygon centroid as struct(x, y)", 1) {
      c => GeoFns.centroid(c(0))
    }
    register(ext, "st_contains_point",
      "st_contains_point(ring, x, y) - even-odd point-in-polygon", 3) {
      c => GeoFns.pointInPolygon(c(1), c(2), c(0))
    }
    register(ext, "st_intersects",
      "st_intersects(ring_a, ring_b) - polygon-polygon intersection", 2) {
      c => GeoFns.polygonsIntersect(c(0), c(1))
    }
    register(ext, "haversine_km",
      "haversine_km(lat1, lon1, lat2, lon2) - great-circle km", 4) {
      c => GeoFns.haversineKm(c(0), c(1), c(2), c(3))
    }
    register(ext, "st_distance_spheroid_km",
      "st_distance_spheroid_km(lat1, lon1, lat2, lon2) - WGS84 km", 4) {
      c => GeoFns.geodesicKm(c(0), c(1), c(2), c(3))
    }
    // Text-pipeline functions on the SQL surface, so spark.sql users
    // reach the native kernels without the Scala API.
    import graft.functions.TextFns
    register(ext, "graft_lang_id",
      "graft_lang_id(text) - marker-token language id", 1) {
      c => TextFns.langId(c(0))
    }
    register(ext, "graft_quality_score",
      "graft_quality_score(text) - composite quality score in [0,1]", 1) {
      c => TextFns.qualityScore(c(0))
    }
    register(ext, "graft_fingerprint",
      "graft_fingerprint(text) - rolling-hash document fingerprint", 1) {
      c => TextFns.fingerprint(c(0))
    }
    register(ext, "graft_pii_scrub",
      "graft_pii_scrub(text) - redact email/phone spans", 1) {
      c => TextFns.piiScrub(c(0))
    }
    register(ext, "graft_word_count",
      "graft_word_count(text) - non-empty whitespace token count", 1) {
      c => TextFns.wordCount(c(0))
    }
    register(ext, "graft_url_host",
      "graft_url_host(url) - authority of an absolute url", 1) {
      c => TextFns.urlHost(c(0))
    }
    register(ext, "graft_url_path",
      "graft_url_path(url) - path component of an absolute url", 1) {
      c => TextFns.urlPath(c(0))
    }
    register(ext, "graft_registered_domain",
      "graft_registered_domain(host) - last two dot-labels", 1) {
      c => TextFns.registeredDomain(c(0))
    }
    register(ext, "graft_segments",
      "graft_segments(text, k) - non-overlapping k-token segments", 2) {
      // k must be a foldable int literal (it parameterizes the kernel)
      c => graft.operators.Curation.segments(c(0),
        Bridge.toExpression(c(1)) match {
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType)
              if v >= 1 => v
          case Literal(v: Int, org.apache.spark.sql.types.IntegerType) =>
            throw new IllegalArgumentException(
              s"graft_segments: k must be >= 1, got $v")
          case other => throw new IllegalArgumentException(
            s"graft_segments: k must be an int literal, got $other")
        })
    }
  }
}

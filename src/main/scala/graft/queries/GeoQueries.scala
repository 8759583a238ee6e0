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

  /** Pinned r13: the 25-zone grid is derived purely from n_nationkey
    * and nation is IDENTICAL at every SF, so the 300 haversine pair
    * distances are SF-independent; two fresh-JVM runs (8 vs 32
    * threads) are byte-identical, so they pin as exact dyadic VALUES
    * (mantissa*2^e — DuckDB parses dyadic arithmetic exactly where
    * its decimal float parse is off-by-one-ulp). The closed-form
    * trig replay stays in tools/check.py at rtol 1e-9 as the
    * arithmetic cross-check.
    */
  private val geoDistDyadic: String =
    """(0,1,4876557895658347*power(2.0,-43)),
      |(0,2,4906204817694426*power(2.0,-42)),
      |(0,3,7400632242090820*power(2.0,-42)),
      |(0,4,4959309846633152*power(2.0,-41)),
      |(0,5,6228702155892043*power(2.0,-41)),
      |(0,6,7507188830651684*power(2.0,-41)),
      |(0,7,8793531142929059*power(2.0,-41)),
      |(0,8,5043272214741545*power(2.0,-40)),
      |(0,9,5692543407934495*power(2.0,-40)),
      |(0,10,6344023950097559*power(2.0,-40)),
      |(0,11,6997168577941584*power(2.0,-40)),
      |(0,12,7651435873970265*power(2.0,-40)),
      |(0,13,8306281685075446*power(2.0,-40)),
      |(0,14,8961151794674436*power(2.0,-40)),
      |(0,15,4807736752558430*power(2.0,-39)),
      |(0,16,5134322830951099*power(2.0,-39)),
      |(0,17,5460013233491135*power(2.0,-39)),
      |(0,18,5784459076575242*power(2.0,-39)),
      |(0,19,6107273587020735*power(2.0,-39)),
      |(0,20,6428018960573540*power(2.0,-39)),
      |(0,21,6746188486281665*power(2.0,-39)),
      |(0,22,7061181638546005*power(2.0,-39)),
      |(0,23,7372268546285584*power(2.0,-39)),
      |(0,24,7678538136521331*power(2.0,-39)),
      |(1,2,4937773600324090*power(2.0,-43)),
      |(1,3,4965096284997767*power(2.0,-42)),
      |(1,4,7485561523996611*power(2.0,-42)),
      |(1,5,5013703180130750*power(2.0,-41)),
      |(1,6,6293959490947855*power(2.0,-41)),
      |(1,7,7582263196759038*power(2.0,-41)),
      |(1,8,8877384777697378*power(2.0,-41)),
      |(1,9,5089069716902533*power(2.0,-40)),
      |(1,10,5741687395999781*power(2.0,-40)),
      |(1,11,6395979158572828*power(2.0,-40)),
      |(1,12,7051382050079156*power(2.0,-40)),
      |(1,13,7707329304252576*power(2.0,-40)),
      |(1,14,8363242432352735*power(2.0,-40)),
      |(1,15,4509261087724152*power(2.0,-39)),
      |(1,16,4836268924881130*power(2.0,-39)),
      |(1,17,5162307221930006*power(2.0,-39)),
      |(1,18,5487008288570583*power(2.0,-39)),
      |(1,19,5809964030972090*power(2.0,-39)),
      |(1,20,6130712632404072*power(2.0,-39)),
      |(1,21,6448720819735287*power(2.0,-39)),
      |(1,22,6763359776972188*power(2.0,-39)),
      |(1,23,7073871811184360*power(2.0,-39)),
      |(1,24,7379323413154236*power(2.0,-39)),
      |(2,3,4994044646417138*power(2.0,-43)),
      |(2,4,5018981145471017*power(2.0,-42)),
      |(2,5,7562881743423409*power(2.0,-42)),
      |(2,6,5062952474787602*power(2.0,-41)),
      |(2,7,6352689728222384*power(2.0,-41)),
      |(2,8,7649377460126996*power(2.0,-41)),
      |(2,9,8951787759310682*power(2.0,-41)),
      |(2,10,5129363380264409*power(2.0,-40)),
      |(2,11,5784510581185575*power(2.0,-40)),
      |(2,12,6440752069646499*power(2.0,-40)),
      |(2,13,7097500112734362*power(2.0,-40)),
      |(2,14,7754154317747731*power(2.0,-40)),
      |(2,15,8410092166098498*power(2.0,-40)),
      |(2,16,4532328984023842*power(2.0,-39)),
      |(2,17,4858574816858547*power(2.0,-39)),
      |(2,18,5183401220079142*power(2.0,-39)),
      |(2,19,5506384332780902*power(2.0,-39)),
      |(2,20,5827045758380530*power(2.0,-39)),
      |(2,21,6144835565718894*power(2.0,-39)),
      |(2,22,6459109749798056*power(2.0,-39)),
      |(2,23,6769099895231962*power(2.0,-39)),
      |(2,24,7073871811184360*power(2.0,-39)),
      |(3,4,5045266265782764*power(2.0,-43)),
      |(3,5,5067758993961494*power(2.0,-42)),
      |(3,6,7632447749043506*power(2.0,-42)),
      |(3,7,5106963921122188*power(2.0,-41)),
      |(3,8,6404778508874859*power(2.0,-41)),
      |(3,9,7708396984146221*power(2.0,-41)),
      |(3,10,4508292537429134*power(2.0,-40)),
      |(3,11,5164065299477350*power(2.0,-40)),
      |(3,12,5820914315582277*power(2.0,-40)),
      |(3,13,6478232853919071*power(2.0,-40)),
      |(3,14,7135401273761860*power(2.0,-40)),
      |(3,15,7791777313519211*power(2.0,-40)),
      |(3,16,8446684882041962*power(2.0,-40)),
      |(3,17,4549700399292225*power(2.0,-39)),
      |(3,18,4874569373130887*power(2.0,-39)),
      |(3,19,5197514726176230*power(2.0,-39)),
      |(3,20,5518047878782079*power(2.0,-39)),
      |(3,21,5835610372904465*power(2.0,-39)),
      |(3,22,6149553211807558*power(2.0,-39)),
      |(3,23,6459109749798056*power(2.0,-39)),
      |(3,24,6763359776972188*power(2.0,-39)),
      |(4,5,5091344457524125*power(2.0,-43)),
      |(4,6,5111340112830280*power(2.0,-42)),
      |(4,7,7694130410472378*power(2.0,-42)),
      |(4,8,5145654469200217*power(2.0,-41)),
      |(4,9,6450125147333426*power(2.0,-41)),
      |(4,10,7759203983945287*power(2.0,-41)),
      |(4,11,4535821064522165*power(2.0,-40)),
      |(4,12,5193099830640533*power(2.0,-40)),
      |(4,13,5850814630457037*power(2.0,-40)),
      |(4,14,6508329265240632*power(2.0,-40)),
      |(4,15,7164985170727851*power(2.0,-40)),
      |(4,16,7820090212253000*power(2.0,-40)),
      |(4,17,8472905601777239*power(2.0,-40)),
      |(4,18,4561315144702889*power(2.0,-39)),
      |(4,19,4884190990875543*power(2.0,-39)),
      |(4,20,5204586834111377*power(2.0,-39)),
      |(4,21,5521942085396962*power(2.0,-39)),
      |(4,22,5835610372904465*power(2.0,-39)),
      |(4,23,6144835565718894*power(2.0,-39)),
      |(4,24,6448720819735287*power(2.0,-39)),
      |(5,6,5132195716235080*power(2.0,-43)),
      |(5,7,5149645238126158*power(2.0,-42)),
      |(5,8,7747816333280080*power(2.0,-42)),
      |(5,9,5178951688267066*power(2.0,-41)),
      |(5,10,6488642525274130*power(2.0,-41)),
      |(5,11,7801697491925617*power(2.0,-41)),
      |(5,12,4558422412107205*power(2.0,-40)),
      |(5,13,5216403713362792*power(2.0,-40)),
      |(5,14,5874142469015923*power(2.0,-40)),
      |(5,15,6530967017135101*power(2.0,-40)),
      |(5,16,7186173128433683*power(2.0,-40)),
      |(5,17,7839011236258037*power(2.0,-40)),
      |(5,18,8488671418516551*power(2.0,-40)),
      |(5,19,4567132705368517*power(2.0,-39)),
      |(5,20,4887402361674660*power(2.0,-39)),
      |(5,21,5204586834111377*power(2.0,-39)),
      |(5,22,5518047878782079*power(2.0,-39)),
      |(5,23,5827045758380530*power(2.0,-39)),
      |(5,24,6130712632404072*power(2.0,-39)),
      |(6,7,5167746808157216*power(2.0,-43)),
      |(6,8,5182605368826546*power(2.0,-42)),
      |(6,9,7793407630471883*power(2.0,-42)),
      |(6,10,5206793657837299*power(2.0,-41)),
      |(6,11,6520257015891259*power(2.0,-41)),
      |(6,12,7835793346714060*power(2.0,-41)),
      |(6,13,4576049824644537*power(2.0,-40)),
      |(6,14,5233926184784345*power(2.0,-40)),
      |(6,15,5890843891295297*power(2.0,-40)),
      |(6,16,6546090101051416*power(2.0,-40)),
      |(6,17,7198908612803798*power(2.0,-40)),
      |(6,18,7848485518147512*power(2.0,-40)),
      |(6,19,8493932270942172*power(2.0,-40)),
      |(6,20,4567132705368517*power(2.0,-39)),
      |(6,21,4884190990875543*power(2.0,-39)),
      |(6,22,5197514726176230*power(2.0,-39)),
      |(6,23,5506384332780902*power(2.0,-39)),
      |(6,24,5809964030972090*power(2.0,-39)),
      |(7,8,5197934588092176*power(2.0,-43)),
      |(7,9,5210161612532271*power(2.0,-42)),
      |(7,10,7830821741154071*power(2.0,-42)),
      |(7,11,5229128884335562*power(2.0,-41)),
      |(7,12,6544908431233674*power(2.0,-41)),
      |(7,13,7861424196768955*power(2.0,-41)),
      |(7,14,4588666883434448*power(2.0,-40)),
      |(7,15,5245629078847319*power(2.0,-40)),
      |(7,16,5900880242582140*power(2.0,-40)),
      |(7,17,6553661035174919*power(2.0,-40)),
      |(7,18,7203157566148303*power(2.0,-40)),
      |(7,19,7848485518147512*power(2.0,-40)),
      |(7,20,8488671418516551*power(2.0,-40)),
      |(7,21,4561315144702889*power(2.0,-39)),
      |(7,22,4874569373130887*power(2.0,-39)),
      |(7,23,5183401220079142*power(2.0,-39)),
      |(7,24,5487008288570583*power(2.0,-39)),
      |(8,9,5222705851193278*power(2.0,-43)),
      |(8,10,5232265062208894*power(2.0,-42)),
      |(8,11,7859991288809314*power(2.0,-42)),
      |(8,12,5245916238478646*power(2.0,-41)),
      |(8,13,6562549986732691*power(2.0,-41)),
      |(8,14,7878539511533115*power(2.0,-41)),
      |(8,15,4596247544923786*power(2.0,-40)),
      |(8,16,5251486905448695*power(2.0,-40)),
      |(8,17,5904228278599621*power(2.0,-40)),
      |(8,18,6553661035174919*power(2.0,-40)),
      |(8,19,7198908612803798*power(2.0,-40)),
      |(8,20,7839011236258037*power(2.0,-40)),
      |(8,21,8472905601777239*power(2.0,-40)),
      |(8,22,4549700399292225*power(2.0,-39)),
      |(8,23,4858574816858547*power(2.0,-39)),
      |(8,24,5162307221930006*power(2.0,-39)),
      |(9,10,5242017214866846*power(2.0,-43)),
      |(9,11,5248876699607253*power(2.0,-42)),
      |(9,12,7880863973096262*power(2.0,-42)),
      |(9,13,5257124909558964*power(2.0,-41)),
      |(9,14,6573148278269910*power(2.0,-41)),
      |(9,15,7887105594568996*power(2.0,-41)),
      |(9,16,4598776170431052*power(2.0,-40)),
      |(9,17,5251486905448695*power(2.0,-40)),
      |(9,18,5900880242582140*power(2.0,-40)),
      |(9,19,6546090101051416*power(2.0,-40)),
      |(9,20,7186173128433683*power(2.0,-40)),
      |(9,21,7820090212253000*power(2.0,-40)),
      |(9,22,8446684882041962*power(2.0,-40)),
      |(9,23,4532328984023842*power(2.0,-39)),
      |(9,24,4836268924881130*power(2.0,-39)),
      |(10,11,5255835026970703*power(2.0,-43)),
      |(10,12,5259967321903981*power(2.0,-42)),
      |(10,13,7893402490406136*power(2.0,-42)),
      |(10,14,5262734373663527*power(2.0,-41)),
      |(10,15,6576683268258936*power(2.0,-41)),
      |(10,16,7887105594568996*power(2.0,-41)),
      |(10,17,4596247544923786*power(2.0,-40)),
      |(10,18,5245629078847319*power(2.0,-40)),
      |(10,19,5890843891295297*power(2.0,-40)),
      |(10,20,6530967017135101*power(2.0,-40)),
      |(10,21,7164985170727851*power(2.0,-40)),
      |(10,22,7791777313519211*power(2.0,-40)),
      |(10,23,8410092166098498*power(2.0,-40)),
      |(10,24,4509261087724152*power(2.0,-39)),
      |(11,12,5264135297336565*power(2.0,-43)),
      |(11,13,5265517488908190*power(2.0,-42)),
      |(11,14,7897584479595831*power(2.0,-42)),
      |(11,15,5262734373663527*power(2.0,-41)),
      |(11,16,6573148278269910*power(2.0,-41)),
      |(11,17,7878539511533115*power(2.0,-41)),
      |(11,18,4588666883434448*power(2.0,-40)),
      |(11,19,5233926184784345*power(2.0,-40)),
      |(11,20,5874142469015923*power(2.0,-40)),
      |(11,21,6508329265240632*power(2.0,-40)),
      |(11,22,7135401273761860*power(2.0,-40)),
      |(11,23,7754154317747731*power(2.0,-40)),
      |(11,24,8363242432352735*power(2.0,-40)),
      |(12,13,5266903650391690*power(2.0,-43)),
      |(12,14,5265517488908190*power(2.0,-42)),
      |(12,15,7893402490406136*power(2.0,-42)),
      |(12,16,5257124909558964*power(2.0,-41)),
      |(12,17,6562549986732691*power(2.0,-41)),
      |(12,18,7861424196768955*power(2.0,-41)),
      |(12,19,4576049824644537*power(2.0,-40)),
      |(12,20,5216403713362792*power(2.0,-40)),
      |(12,21,5850814630457037*power(2.0,-40)),
      |(12,22,6478232853919071*power(2.0,-40)),
      |(12,23,7097500112734362*power(2.0,-40)),
      |(12,24,7707329304252576*power(2.0,-40)),
      |(13,14,5264135297336565*power(2.0,-43)),
      |(13,15,5259967321903981*power(2.0,-42)),
      |(13,16,7880863973096262*power(2.0,-42)),
      |(13,17,5245916238478646*power(2.0,-41)),
      |(13,18,6544908431233674*power(2.0,-41)),
      |(13,19,7835793346714060*power(2.0,-41)),
      |(13,20,4558422412107205*power(2.0,-40)),
      |(13,21,5193099830640533*power(2.0,-40)),
      |(13,22,5820914315582277*power(2.0,-40)),
      |(13,23,6440752069646499*power(2.0,-40)),
      |(13,24,7051382050079156*power(2.0,-40)),
      |(14,15,5255835026970703*power(2.0,-43)),
      |(14,16,5248876699607253*power(2.0,-42)),
      |(14,17,7859991288809314*power(2.0,-42)),
      |(14,18,5229128884335562*power(2.0,-41)),
      |(14,19,6520257015891259*power(2.0,-41)),
      |(14,20,7801697491925617*power(2.0,-41)),
      |(14,21,4535821064522165*power(2.0,-40)),
      |(14,22,5164065299477350*power(2.0,-40)),
      |(14,23,5784510581185575*power(2.0,-40)),
      |(14,24,6395979158572828*power(2.0,-40)),
      |(15,16,5242017214866846*power(2.0,-43)),
      |(15,17,5232265062208894*power(2.0,-42)),
      |(15,18,7830821741154071*power(2.0,-42)),
      |(15,19,5206793657837299*power(2.0,-41)),
      |(15,20,6488642525274130*power(2.0,-41)),
      |(15,21,7759203983945287*power(2.0,-41)),
      |(15,22,4508292537429134*power(2.0,-40)),
      |(15,23,5129363380264409*power(2.0,-40)),
      |(15,24,5741687395999781*power(2.0,-40)),
      |(16,17,5222705851193278*power(2.0,-43)),
      |(16,18,5210161612532271*power(2.0,-42)),
      |(16,19,7793407630471883*power(2.0,-42)),
      |(16,20,5178951688267066*power(2.0,-41)),
      |(16,21,6450125147333426*power(2.0,-41)),
      |(16,22,7708396984146221*power(2.0,-41)),
      |(16,23,8951787759310682*power(2.0,-41)),
      |(16,24,5089069716902533*power(2.0,-40)),
      |(17,18,5197934588092176*power(2.0,-43)),
      |(17,19,5182605368826546*power(2.0,-42)),
      |(17,20,7747816333280080*power(2.0,-42)),
      |(17,21,5145654469200217*power(2.0,-41)),
      |(17,22,6404778508874859*power(2.0,-41)),
      |(17,23,7649377460126996*power(2.0,-41)),
      |(17,24,8877384777697378*power(2.0,-41)),
      |(18,19,5167746808157216*power(2.0,-43)),
      |(18,20,5149645238126158*power(2.0,-42)),
      |(18,21,7694130410472378*power(2.0,-42)),
      |(18,22,5106963921122188*power(2.0,-41)),
      |(18,23,6352689728222384*power(2.0,-41)),
      |(18,24,7582263196759038*power(2.0,-41)),
      |(19,20,5132195716235080*power(2.0,-43)),
      |(19,21,5111340112830280*power(2.0,-42)),
      |(19,22,7632447749043506*power(2.0,-42)),
      |(19,23,5062952474787602*power(2.0,-41)),
      |(19,24,6293959490947855*power(2.0,-41)),
      |(20,21,5091344457524125*power(2.0,-43)),
      |(20,22,5067758993961494*power(2.0,-42)),
      |(20,23,7562881743423409*power(2.0,-42)),
      |(20,24,5013703180130750*power(2.0,-41)),
      |(21,22,5045266265782764*power(2.0,-43)),
      |(21,23,5018981145471017*power(2.0,-42)),
      |(21,24,7485561523996611*power(2.0,-42)),
      |(22,23,4994044646417138*power(2.0,-43)),
      |(22,24,4965096284997767*power(2.0,-42)),
      |(23,24,4937773600324090*power(2.0,-43))""".stripMargin.replace("\n", " ")

  val oracles: Map[String, String] = Map(
    // D1 — hash-gated via the SF-independent pinned distances (see
    // geoDistDyadic); valid at every SF.
    "geo_distance_pairs" ->
      ("SELECT CAST(zone_a AS BIGINT) AS zone_a, " +
        "CAST(zone_b AS BIGINT) AS zone_b, dist_km FROM (VALUES " +
        geoDistDyadic + ") AS t(zone_a, zone_b, dist_km)"),

    // Flagship consultation, pinned at the driver SF: deterministic
    // now that the KMeans feed is canonically ordered (Clustering
    // .scala) — avg_trips comes out of decimal-routed exactAvg, so
    // the doubles are bit-stable and pinnable. SF-scoped in check.py
    // (HASH_SF_SCOPED) like the gold_cluster_* family.
    "consult_polygon_clusters" ->
      Pins.at(
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
      "SELECT CAST(col0 AS BIGINT) AS cluster_id, " +
        "CAST(col1 AS INT) AS hour, " +
        "CAST(col2 AS DOUBLE) AS avg_trips, " +
        "CAST(col3 AS BIGINT) AS days_in_sample " +
        "FROM (VALUES " +
    """(CAST(0 AS BIGINT), CAST(0 AS INT), 4928901720110531*power(2.0,-40), CAST(6 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(1 AS INT), 4683937859519556*power(2.0,-40), CAST(6 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(2 AS INT), 4850832729499675*power(2.0,-40), CAST(6 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(3 AS INT), 5691797863042908*power(2.0,-40), CAST(6 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(4 AS INT), 4527162161553736*power(2.0,-40), CAST(6 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(5 AS INT), 5009210049403289*power(2.0,-40), CAST(6 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(6 AS INT), 5009299842852891*power(2.0,-40), CAST(6 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(7 AS INT), 5323492620567402*power(2.0,-40), CAST(6 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(8 AS INT), 8416893452020613*power(2.0,-41), CAST(6 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(9 AS INT), 8458070162480824*power(2.0,-41), CAST(6 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(10 AS INT), 8861862142742801*power(2.0,-41), CAST(6 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(11 AS INT), 4723773165793881*power(2.0,-40), CAST(6 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(12 AS INT), 4922354128367125*power(2.0,-40), CAST(6 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(13 AS INT), 5159078981827297*power(2.0,-40), CAST(6 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(14 AS INT), 4609189394024585*power(2.0,-40), CAST(6 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(15 AS INT), 5589092481892352*power(2.0,-40), CAST(6 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(16 AS INT), 5248093610692663*power(2.0,-40), CAST(6 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(17 AS INT), 8819457644298240*power(2.0,-41), CAST(6 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(18 AS INT), 5300311250415125*power(2.0,-40), CAST(6 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(19 AS INT), 4736674102226453*power(2.0,-40), CAST(6 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(20 AS INT), 8569971125878347*power(2.0,-41), CAST(6 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(21 AS INT), 4624666852704911*power(2.0,-40), CAST(6 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(22 AS INT), 5373965701840459*power(2.0,-40), CAST(6 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(23 AS INT), 4567624189455893*power(2.0,-40), CAST(6 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(0 AS INT), 4922934513433501*power(2.0,-40), CAST(7 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(1 AS INT), 5439807075996514*power(2.0,-40), CAST(7 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(2 AS INT), 5485094389213711*power(2.0,-40), CAST(7 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(3 AS INT), 4861347725699973*power(2.0,-40), CAST(7 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(4 AS INT), 8819358688251741*power(2.0,-41), CAST(7 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(5 AS INT), 5316003637439833*power(2.0,-40), CAST(7 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(6 AS INT), 5840736137410549*power(2.0,-40), CAST(7 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(7 AS INT), 4803046907002599*power(2.0,-40), CAST(7 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(8 AS INT), 4900521754266735*power(2.0,-40), CAST(7 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(9 AS INT), 5203644544197403*power(2.0,-40), CAST(7 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(10 AS INT), 4800254147468048*power(2.0,-40), CAST(7 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(11 AS INT), 8254093477488511*power(2.0,-41), CAST(7 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(12 AS INT), 4687519649541278*power(2.0,-40), CAST(7 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(13 AS INT), 5403575026399502*power(2.0,-40), CAST(7 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(14 AS INT), 4730920514951390*power(2.0,-40), CAST(7 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(15 AS INT), 4897772975197295*power(2.0,-40), CAST(7 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(16 AS INT), 5240693373860765*power(2.0,-40), CAST(7 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(17 AS INT), 4922210406490065*power(2.0,-40), CAST(7 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(18 AS INT), 5201279023466789*power(2.0,-40), CAST(7 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(19 AS INT), 4659095703232371*power(2.0,-40), CAST(7 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(20 AS INT), 8336575698342473*power(2.0,-41), CAST(7 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(21 AS INT), 4793404190027003*power(2.0,-40), CAST(7 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(22 AS INT), 4557811833543440*power(2.0,-40), CAST(7 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(23 AS INT), 8431680312683304*power(2.0,-41), CAST(7 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(0 AS INT), 4810614567638038*power(2.0,-40), CAST(13 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(1 AS INT), 5098138549857812*power(2.0,-40), CAST(13 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(2 AS INT), 4614696819575509*power(2.0,-40), CAST(13 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(3 AS INT), 4833585057098629*power(2.0,-40), CAST(13 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(4 AS INT), 4858187898437380*power(2.0,-40), CAST(13 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(5 AS INT), 4789266280717504*power(2.0,-40), CAST(13 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(6 AS INT), 4580740517397085*power(2.0,-40), CAST(13 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(7 AS INT), 5106441554203872*power(2.0,-40), CAST(13 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(8 AS INT), 4698127761891151*power(2.0,-40), CAST(13 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(9 AS INT), 4577655964392086*power(2.0,-40), CAST(13 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(10 AS INT), 4842680555594862*power(2.0,-40), CAST(13 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(11 AS INT), 4619221732812895*power(2.0,-40), CAST(13 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(12 AS INT), 8906834141801248*power(2.0,-41), CAST(13 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(13 AS INT), 4839223014414594*power(2.0,-40), CAST(13 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(14 AS INT), 4880584950295177*power(2.0,-40), CAST(13 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(15 AS INT), 5133496306472563*power(2.0,-40), CAST(13 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(16 AS INT), 4658881117226775*power(2.0,-40), CAST(13 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(17 AS INT), 5291238165040534*power(2.0,-40), CAST(13 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(18 AS INT), 4901572935713071*power(2.0,-40), CAST(13 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(19 AS INT), 4660662326063772*power(2.0,-40), CAST(13 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(20 AS INT), 4994951920925561*power(2.0,-40), CAST(13 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(21 AS INT), 4642281874760058*power(2.0,-40), CAST(13 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(22 AS INT), 4846149937669583*power(2.0,-40), CAST(13 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(23 AS INT), 5200349996554045*power(2.0,-40), CAST(13 AS BIGINT))""".stripMargin.replace("\n", " ") + ") t",
      "SELECT CAST(col0 AS BIGINT) AS cluster_id, " +
        "CAST(col1 AS INT) AS hour, " +
        "CAST(col2 AS DOUBLE) AS avg_trips, " +
        "CAST(col3 AS BIGINT) AS days_in_sample " +
        "FROM (VALUES " +
    """(CAST(0 AS BIGINT), CAST(0 AS INT), 5204315944392968*power(2.0,-46), CAST(9 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(1 AS INT), 6929612346284161*power(2.0,-46), CAST(14 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(2 AS INT), 6351610792647185*power(2.0,-46), CAST(11 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(3 AS INT), 5426915738474979*power(2.0,-46), CAST(9 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(4 AS INT), 7462605320041267*power(2.0,-47), CAST(10 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(5 AS INT), 5244660691054828*power(2.0,-46), CAST(9 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(6 AS INT), 5595722537007841*power(2.0,-47), CAST(8 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(7 AS INT), 7081294687528550*power(2.0,-46), CAST(8 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(8 AS INT), 5240970241360178*power(2.0,-46), CAST(15 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(9 AS INT), 6157457030302448*power(2.0,-46), CAST(11 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(10 AS INT), 7827349977362159*power(2.0,-46), CAST(9 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(11 AS INT), 5524010389532240*power(2.0,-46), CAST(11 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(12 AS INT), 8915579149821674*power(2.0,-46), CAST(10 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(13 AS INT), 7824236693528844*power(2.0,-47), CAST(11 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(14 AS INT), 5115405594606586*power(2.0,-47), CAST(7 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(15 AS INT), 8398744180084791*power(2.0,-47), CAST(12 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(16 AS INT), 6775038717839873*power(2.0,-46), CAST(11 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(17 AS INT), 6169803546326348*power(2.0,-46), CAST(11 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(18 AS INT), 8099583192337482*power(2.0,-47), CAST(10 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(19 AS INT), 5831809673723904*power(2.0,-46), CAST(10 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(20 AS INT), 5450708794198640*power(2.0,-46), CAST(13 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(21 AS INT), 6356830874033455*power(2.0,-47), CAST(10 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(22 AS INT), 5513250368831619*power(2.0,-46), CAST(10 AS BIGINT)),
      |(CAST(0 AS BIGINT), CAST(23 AS INT), 4973662838477292*power(2.0,-46), CAST(9 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(0 AS INT), 6442727654426324*power(2.0,-46), CAST(3 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(1 AS INT), 7948853342308925*power(2.0,-47), CAST(5 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(2 AS INT), 7100470170316964*power(2.0,-46), CAST(8 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(3 AS INT), 5174785505430077*power(2.0,-45), CAST(8 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(4 AS INT), 8148231450812307*power(2.0,-47), CAST(6 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(5 AS INT), 7892558346966794*power(2.0,-47), CAST(4 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(6 AS INT), 7458383195390608*power(2.0,-46), CAST(6 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(7 AS INT), 6428486360961797*power(2.0,-47), CAST(7 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(8 AS INT), 4605212093963043*power(2.0,-46), CAST(5 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(9 AS INT), 5547871790967030*power(2.0,-47), CAST(1 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(10 AS INT), 6319113227154227*power(2.0,-46), CAST(6 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(11 AS INT), 7543247900868870*power(2.0,-46), CAST(5 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(12 AS INT), 5382857085870408*power(2.0,-46), CAST(4 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(13 AS INT), 7574491623283753*power(2.0,-46), CAST(4 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(14 AS INT), 7036874417766400*power(2.0,-47), CAST(6 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(15 AS INT), 6098155370436362*power(2.0,-46), CAST(4 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(16 AS INT), 4686734284092867*power(2.0,-46), CAST(4 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(17 AS INT), 4833629037563740*power(2.0,-47), CAST(2 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(18 AS INT), 6017114033391752*power(2.0,-46), CAST(6 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(19 AS INT), 5090738836602880*power(2.0,-45), CAST(4 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(20 AS INT), 4525976888018993*power(2.0,-45), CAST(5 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(21 AS INT), 8999986458462781*power(2.0,-46), CAST(4 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(22 AS INT), 6564700144334275*power(2.0,-47), CAST(4 AS BIGINT)),
      |(CAST(1 AS BIGINT), CAST(23 AS INT), 8734168527331656*power(2.0,-48), CAST(3 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(0 AS INT), 7160723407519089*power(2.0,-51), CAST(2 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(1 AS INT), 6453869372254454*power(2.0,-46), CAST(2 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(2 AS INT), 8988903381254799*power(2.0,-48), CAST(2 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(4 AS INT), 8176848073444557*power(2.0,-48), CAST(1 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(5 AS INT), 6533034209454326*power(2.0,-47), CAST(2 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(6 AS INT), 7667378365598269*power(2.0,-50), CAST(1 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(7 AS INT), 5756339195593359*power(2.0,-45), CAST(2 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(10 AS INT), 5837087329537229*power(2.0,-46), CAST(1 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(11 AS INT), 6791991188028129*power(2.0,-49), CAST(2 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(12 AS INT), 8517432795264451*power(2.0,-48), CAST(1 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(13 AS INT), 5483132546323579*power(2.0,-48), CAST(1 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(14 AS INT), 6937654488475894*power(2.0,-47), CAST(2 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(15 AS INT), 7551269937705124*power(2.0,-47), CAST(2 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(20 AS INT), 6229041234606817*power(2.0,-48), CAST(1 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(21 AS INT), 7913668970220093*power(2.0,-46), CAST(1 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(22 AS INT), 5139381231015690*power(2.0,-45), CAST(2 AS BIGINT)),
      |(CAST(2 AS BIGINT), CAST(23 AS INT), 7270498648436244*power(2.0,-48), CAST(2 AS BIGINT))""".stripMargin.replace("\n", " ") + ") t"),
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

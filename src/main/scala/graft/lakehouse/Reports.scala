package graft.lakehouse

import java.util.Locale

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Consultation artifact rendering — the reference's consultations
  * save a per-polygon cluster-profile chart next to the query result
  * (mobility_consultations.py:100-120 writes a PNG via matplotlib).
  * This sandbox has no raster codecs, and an engine shouldn't depend
  * on one: the chart renders as deterministic standalone SVG (plain
  * XML — byte-identical for identical input, diffable, viewable in
  * any browser), written through the Hadoop filesystem so the
  * artifact lands beside lake data on local disk, HDFS, or an object
  * store alike.
  *
  * Driver-side by design: the input is the CONSULTATION OUTPUT
  * (clusters × 24 hours — O(k·24), same bound as the KMeans centroid
  * collect), never a fact table.
  */
object Reports {

  private val W = 640
  private val H = 360
  private val ML = 56; private val MR = 16
  private val MT = 40; private val MB = 36
  /** Fixed series palette (cluster_id ascending). */
  private val palette =
    Seq("#4269d0", "#efb118", "#ff725c", "#6cc5b0", "#3ca951",
      "#ff8ab7", "#a463f2", "#97bbf5")

  private def fmt(d: Double): String = "%.2f".formatLocal(Locale.ROOT, d)

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Render a per-cluster hourly demand profile
    * ([[Consultations.polygonClusterDemand]]'s shape: cluster_id,
    * hour, avg_trips) as an SVG line chart: one polyline per cluster,
    * hour axis 0-23, y axis zero-based and scaled to the max series
    * value. Deterministic: rows are sorted, numbers formatted under
    * Locale.ROOT, no timestamps or randomness in the output.
    */
  def clusterProfileSvg(profile: DataFrame, title: String): String = {
    val rows = profile
      .select("cluster_id", "hour", "avg_trips")
      .collect()
      .map(r => (r.get(0).toString.toLong, r.get(1).toString.toInt,
        r.get(2).toString.toDouble))
      .sortBy(r => (r._1, r._2))
    require(rows.nonEmpty, "clusterProfileSvg: empty profile")
    val yMax = math.max(rows.map(_._3).max, 1e-9)
    val plotW = W - ML - MR
    val plotH = H - MT - MB
    def px(hour: Int): Double = ML + plotW * hour / 23.0
    def py(v: Double): Double = MT + plotH * (1.0 - v / yMax)

    val series = rows.groupBy(_._1).toSeq.sortBy(_._1)
    // legend wraps at 5 entries/row so many-cluster profiles stay
    // inside the canvas; past 8 series the palette cycles (k-means
    // consultations run k=3 — the cycle is a many-series fallback)
    val lines = series.zipWithIndex.map { case ((cid, pts), i) =>
      val color = palette(i % palette.size)
      val d = pts.sortBy(_._2)
        .map(p => s"${fmt(px(p._2))},${fmt(py(p._3))}").mkString(" ")
      val lx = ML + 8 + (i % 5) * 110
      val ly = H - 16 - (i / 5) * 14
      s"""  <polyline fill="none" stroke="$color" stroke-width="2" points="$d"/>
         |  <g font-size="12" font-family="sans-serif">
         |    <rect x="$lx" y="$ly" width="10" height="10" fill="$color"/>
         |    <text x="${lx + 14}" y="${ly + 9}">cluster $cid</text>
         |  </g>""".stripMargin
    }
    val xTicks = Seq(0, 6, 12, 18, 23).map { h =>
      s"""  <text x="${fmt(px(h))}" y="${MT + plotH + 16}" font-size="11" font-family="sans-serif" text-anchor="middle">$h</text>"""
    }
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$W" height="$H" viewBox="0 0 $W $H">
       |  <rect width="$W" height="$H" fill="white"/>
       |  <text x="${W / 2}" y="24" font-size="15" font-family="sans-serif" text-anchor="middle">${esc(title)}</text>
       |  <line x1="$ML" y1="$MT" x2="$ML" y2="${MT + plotH}" stroke="#888"/>
       |  <line x1="$ML" y1="${MT + plotH}" x2="${ML + plotW}" y2="${MT + plotH}" stroke="#888"/>
       |  <text x="${ML - 6}" y="${MT + 4}" font-size="11" font-family="sans-serif" text-anchor="end">${fmt(yMax)}</text>
       |  <text x="${ML - 6}" y="${MT + plotH + 4}" font-size="11" font-family="sans-serif" text-anchor="end">0</text>
       |${xTicks.mkString("\n")}
       |${lines.mkString("\n")}
       |</svg>
       |""".stripMargin
  }

  /** Render and write the artifact as `<dir>/<name>.svg` through the
    * Hadoop filesystem (object-store parity, overwrite-idempotent).
    * Returns the written path.
    */
  def writeClusterProfile(profile: DataFrame, dir: String, name: String,
      title: String): String = {
    val svg = clusterProfileSvg(profile, title)
    val path = new Path(dir, s"$name.svg")
    val fs = path.getFileSystem(
      profile.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(svg.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    path.toString
  }
}

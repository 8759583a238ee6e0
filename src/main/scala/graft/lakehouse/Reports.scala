package graft.lakehouse

import java.util.Locale

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Consultation artifact rendering — the reference's consultations
  * save a per-polygon cluster-profile chart next to the query result
  * (mobility_consultations.py:100-120 writes a PNG via matplotlib).
  * Two render targets, same data and palette: a deterministic
  * standalone SVG (plain XML — diffable, carries titles/labels,
  * viewable anywhere) and a REAL PNG twin rasterized through the
  * JDK's own `javax.imageio` encoder with an integer Bresenham
  * pipeline (no fonts, no antialiasing — platform-independent bytes;
  * reference parity for the saved matplotlib raster). Both write
  * through the Hadoop filesystem so the artifact lands beside lake
  * data on local disk, HDFS, or an object store alike.
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
      title: String): String =
    writeBytes(profile, dir, s"$name.svg",
      clusterProfileSvg(profile, title)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** RASTER twin of [[clusterProfileSvg]] — reference parity with the
    * matplotlib PNG the consultations save
    * (mobility_consultations.py:100-120): the same chart geometry
    * (axes, tick marks, one polyline per cluster in the same palette,
    * legend swatches) rasterized into a REAL PNG through the JDK's
    * own encoder (`javax.imageio`, the encoder the multimodal corpus
    * already round-trips). Lines rasterize with an integer Bresenham
    * walk onto the pixel array directly — no AWT font or antialiasing
    * pipeline touches the image, so the bytes are deterministic on
    * any platform, not just same-JVM (text labels live on the SVG
    * twin, which carries the same data WITH axis values and titles).
    */
  def clusterProfilePng(profile: DataFrame): Array[Byte] = {
    val rows = profile
      .select("cluster_id", "hour", "avg_trips")
      .collect()
      .map(r => (r.get(0).toString.toLong, r.get(1).toString.toInt,
        r.get(2).toString.toDouble))
      .sortBy(r => (r._1, r._2))
    require(rows.nonEmpty, "clusterProfilePng: empty profile")
    val yMax = math.max(rows.map(_._3).max, 1e-9)
    val plotW = W - ML - MR
    val plotH = H - MT - MB
    def px(hour: Int): Int =
      ML + math.round(plotW * hour / 23.0).toInt
    def py(v: Double): Int =
      MT + math.round(plotH * (1.0 - v / yMax)).toInt

    val img = new java.awt.image.BufferedImage(W, H,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    def put(x: Int, y: Int, rgb: Int): Unit =
      if (x >= 0 && x < W && y >= 0 && y < H) img.setRGB(x, y, rgb)
    def line(x0: Int, y0: Int, x1: Int, y1: Int, rgb: Int): Unit = {
      // Bresenham, drawn 2px tall/wide like the SVG's stroke-width 2
      var (x, y) = (x0, y0)
      val dx = math.abs(x1 - x0); val sx = if (x0 < x1) 1 else -1
      val dy = -math.abs(y1 - y0); val sy = if (y0 < y1) 1 else -1
      var err = dx + dy
      var going = true
      while (going) {
        put(x, y, rgb); put(x, y + 1, rgb); put(x + 1, y, rgb)
        if (x == x1 && y == y1) going = false
        else {
          val e2 = 2 * err
          if (e2 >= dy) { err += dy; x += sx }
          if (e2 <= dx) { err += dx; y += sy }
        }
      }
    }
    def fill(x: Int, y: Int, w: Int, h: Int, rgb: Int): Unit =
      for (i <- x until x + w; j <- y until y + h) put(i, j, rgb)

    val white = 0xffffff; val axis = 0x888888
    fill(0, 0, W, H, white)
    line(ML, MT, ML, MT + plotH, axis)
    line(ML, MT + plotH, ML + plotW, MT + plotH, axis)
    Seq(0, 6, 12, 18, 23).foreach(h =>
      line(px(h), MT + plotH, px(h), MT + plotH + 4, axis))

    val series = rows.groupBy(_._1).toSeq.sortBy(_._1)
    series.zipWithIndex.foreach { case ((_, pts), i) =>
      val rgb = Integer.parseInt(palette(i % palette.size).drop(1), 16)
      val ps = pts.sortBy(_._2).map(p => (px(p._2), py(p._3)))
      ps.zip(ps.drop(1)).foreach { case ((x0, y0), (x1, y1)) =>
        line(x0, y0, x1, y1, rgb)
      }
      // legend swatch in the same grid slot as the SVG legend
      fill(ML + 8 + (i % 5) * 110, H - 16 - (i / 5) * 14, 10, 10, rgb)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Write the raster artifact as `<dir>/<name>.png` (see
    * [[clusterProfilePng]]). Returns the written path.
    */
  def writeClusterProfilePng(profile: DataFrame, dir: String,
      name: String): String =
    writeBytes(profile, dir, s"$name.png", clusterProfilePng(profile))

  private def writeBytes(profile: DataFrame, dir: String, file: String,
      bytes: Array[Byte]): String = {
    val path = new Path(dir, file)
    val fs = path.getFileSystem(
      profile.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(bytes)
    finally out.close()
    path.toString
  }
}

package graft.tools

/** Decompose the bench's per-query scheduling floor (Bench.floorOnce:
  * `range(4096).repartition(cpus).count()` ≈ 0.3-0.45 s warm on this
  * box) into its parts, so floor work targets the real component —
  * driver planning, AQE stage materialization, task dispatch — and
  * not a guess. Diagnostic only.
  *
  *   tools/jrun.sh graft.tools.FloorProbe [reps]
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(cpus)
      .master(s"local[$cpus]").appName("floorprobe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def best(label: String)(f: => Unit): Unit = {
      f // warmup
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      val srt = ts.sorted
      println(f"$label%-46s min ${srt.head}%7.3f  med ${srt(reps / 2)}%7.3f")
    }

    best("empty local collect (analysis+driver only)") {
      spark.range(0).collect()
    }
    best("1-stage: range(4096).count()") {
      spark.range(1 << 12).count()
    }
    best("floor: range.repartition(32).count() [AQE]") {
      spark.range(1 << 12).repartition(cpus).count()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    best("same, AQE OFF") {
      spark.range(1 << 12).repartition(cpus).count()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
      "false")
    best("AQE on, coalesce OFF") {
      spark.range(1 << 12).repartition(cpus).count()
    }
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
      "true")
    best("two exchanges: repartition+groupBy") {
      spark.range(1 << 12).repartition(cpus)
        .selectExpr("id % 7 as k").groupBy("k").count().count()
    }
    spark.stop()
  }
}

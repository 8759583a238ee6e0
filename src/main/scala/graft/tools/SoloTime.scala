package graft.tools

/** One COLD timed pass of named SparkEntry queries against a tier dir
  * — the BASELINE.md adjudication tool: tier pins are cold one-pass
  * numbers, so a flagged tier row is re-measured by running this 3×
  * (fresh JVM each, quiet box) and taking the min. Prints one line
  * per query; diagnostic only, no JSON artifact.
  *
  *   tools/jrun.sh graft.tools.SoloTime <dir> <query> [query ...]
  */
object SoloTime {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    System.setProperty("graft.pin.sf", dir)
    val spark = graft.GraftSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-solotime").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      println(f"$name%-28s cold ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        s"  rows=$n")
      System.gc()
    }
    spark.stop()
  }
}

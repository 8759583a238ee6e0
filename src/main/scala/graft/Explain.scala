package graft

/** Plan-inspection main for one gate query:
  * `sbt "runMain graft.Explain <query> [sfDir]"`.
  * Set GRAFT_BCAST=-1 to disable size-based broadcasts and reveal the
  * at-scale shuffle structure (explicit broadcast() hints survive).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: runMain graft.Explain <query> [sfDir]  (GRAFT_BCAST=-1 " +
          "for the at-scale join shape)\nqueries: " +
          SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val name = args(0)
    require(SparkEntry.queries.contains(name),
      s"unknown query '$name' — see `runMain graft.Explain` for the list")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.builder(8).master("local[8]")
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("GRAFT_BCAST", "10485760"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (sys.env.contains("GRAFT_EXECUTED")) {
      // Post-execution plan: AQE finalizes stages (and reuses
      // canonically-identical exchanges) only at runtime, so the
      // static plan over-counts exchanges — run first, then print.
      // collect() (not count()) so the Dataset's OWN QueryExecution
      // executes and its adaptive plan reaches isFinalPlan=true.
      df.collect()
      println(df.queryExecution.executedPlan.toString)
    } else df.explain("formatted")
    spark.stop()
  }
}

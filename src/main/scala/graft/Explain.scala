package graft

/** Plan-inspection main for one gate query:
  * `sbt "runMain graft.Explain <query> [sfDir]"`.
  * Set GRAFT_BCAST=-1 to disable size-based broadcasts and reveal the
  * at-scale shuffle structure (explicit broadcast() hints survive).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.builder(8).master("local[8]")
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("GRAFT_BCAST", "10485760"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}

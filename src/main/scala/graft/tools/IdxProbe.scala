package graft.tools

import org.apache.spark.sql.functions._

/** Scratch phase profiler for the persisted-index gate rows: splits
  * dedup_index_cross_capped's wall into build (lake protocol: three
  * overwrite commits + census) vs probe (candidates + verify), so
  * index-path optimization targets the measured phase. Diagnostic
  * only — not part of the catalog.
  *
  *   tools/jrun.sh graft.tools.IdxProbe [sfDir] [reps]
  */
object IdxProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("idx-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.NearDupIndex
    val scratch = "/root/repo/target/lake_scratch/idxprobe_" +
      dir.replaceAll("[^A-Za-z0-9.]", "_")
    val docs = graft.sources.Tables.documents(spark, dir)

    def once(): (Double, Double, Double) = {
      val p = new org.apache.hadoop.fs.Path(scratch)
      val t0 = System.nanoTime()
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
      val t1 = System.nanoTime()
      NearDupIndex.build(
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
        "doc_id", "text", scratch, threshold = 0.5, sigMaxDf = 5,
        portableHash = true)
      val t2 = System.nanoTime()
      NearDupIndex.pairsAgainstIndex(spark,
        docs.filter(pmod(col("doc_id"), lit(10)) === 0),
        "doc_id", "text", scratch, threshold = 0.5,
        maxBucket = 3).count()
      val t3 = System.nanoTime()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
    }
    once() // warmup
    val rs = (1 to reps).map { _ => val r = once(); System.gc(); r }
    println(f"delete ${rs.map(_._1).min}%6.3f  " +
      f"build ${rs.map(_._2).min}%6.3f  probe ${rs.map(_._3).min}%6.3f")
    spark.stop()
  }
}

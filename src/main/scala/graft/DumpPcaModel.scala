package graft

/** One-off pin generator: print the canonical-feed PCA model's mean
  * and first axis as DuckDB list literals (full round-trip decimal
  * precision) for the emb_pca_project oracle. Not part of the
  * library surface; kept for re-pinning after data/model changes.
  */
object DumpPcaModel {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus.toInt)
      .master(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val m = graft.operators.Pca.fitCanonical(emb, "vec_id",
      "embedding", k = 16)
    println("MEAN=[" + m.mean.mkString(", ") + "]")
    println("COMP0=[" + m.components(0).mkString(", ") + "]")
    spark.stop()
  }
}

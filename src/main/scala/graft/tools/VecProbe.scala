package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-isolating probe for the ANN ranking tail (diagnostic, r16):
  * times the brute sweep's scoring, the bucketed stage-1 window, and
  * the full two-level top-k separately, printing each stage's
  * AQE-FINAL executed plan — for attributing a wall to scoring vs
  * exchange vs sort, not guessing.
  *
  *   tools/jrun.sh graft.tools.VecProbe <dir> [stage1|full|score]...
  */
object VecProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata/vec1m")
    val which = args.drop(1).toSet
    val spark = graft.GraftSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-vecprobe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("SPARK_GRAFT_VEC_SPLIT_MB").foreach(mb =>
      spark.conf.set("spark.sql.files.maxPartitionBytes",
        (mb.toLong << 20).toString))
    import graft.functions.VectorFns
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val n = emb.count()
    val qStep = math.max(1L, n / 256L)
    val q = emb.filter(pmod(col("vec_id"), lit(qStep)) === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        VectorFns.norm(col("embedding")).as("qn"))
    val c = emb.select(col("vec_id").as("cand_id"),
      col("embedding").as("cv"), VectorFns.norm(col("embedding")).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        VectorFns.cosine(VectorFns.dot(col("qv"), col("cv")),
          col("qn"), col("cn")).as("cosine"))
    def t(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      if (which.nonEmpty && !which(name)) return
      val t0 = System.nanoTime()
      val out = df.count()
      println(f"$name%-8s ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
        s"rows=$out")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .take(40).mkString("\n"))
      System.gc()
    }
    t("score")(scored)
    val w1 = Window
      .partitionBy(col("query_id"), pmod(col("cand_id"), lit(256)))
      .orderBy(col("cosine").desc, col("cand_id"))
    t("stage1")(scored.withColumn("__bk", row_number().over(w1))
      .filter(col("__bk") <= 10))
    t("full")(graft.operators.Similarity.topKPerQuery(scored,
      "cosine", 10))
    spark.stop()
  }
}

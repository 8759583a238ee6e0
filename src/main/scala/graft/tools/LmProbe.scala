package graft.tools

import org.apache.spark.sql.functions._

/** Scratch stage profiler for lmScore at a tier dir — cumulative
  * sub-plan timings so the expensive stage is measured, not argued.
  * Diagnostic only.
  *
  *   tools/jrun.sh graft.tools.LmProbe [dir]
  */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata/sf10")
    val spark = graft.GraftSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("lm-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, dir)

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
      System.gc()
    }

    val toks = filter(split(col("text"), " "), t => length(t) > 0)
    val bigrams = docs
      .select(col("doc_id"), toks.as("w"))
      .select(col("doc_id"), explode(zip_with(
          slice(col("w"), lit(1), greatest(size(col("w")) - 1, lit(0))),
          slice(col("w"), lit(2), greatest(size(col("w")) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    t("bigram instances (noop count)") { bigrams.count() }
    val bgp = bigrams.localCheckpoint()
    t("checkpoint bigrams") { bgp.count() }
    val biCounts = bgp.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))
    t("biCounts") { biCounts.count() }
    val perDoc = bgp.groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
    t("per-doc distinct agg") { perDoc.count() }
    t("join + nll project") {
      val histCounts = biCounts.groupBy(col("w1"))
        .agg(sum(col("c2")).as("c1"))
      val vocab = biCounts.select(col("w2")).distinct()
        .agg(count(lit(1)).as("v"))
      perDoc.join(biCounts, Seq("w1", "w2"))
        .join(histCounts, Seq("w1"))
        .crossJoin(broadcast(vocab)).count()
    }
    t("full lmScore") {
      graft.operators.Curation.lmScore(docs, "doc_id", "text").count()
    }
    t("full lmScore again") {
      graft.operators.Curation.lmScore(docs, "doc_id", "text").count()
    }
    spark.stop()
  }
}

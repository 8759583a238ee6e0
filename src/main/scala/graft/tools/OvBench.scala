package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc timer for the open-vocabulary production-shape rows (the
  * Bench `ov` tier plus the wider §5.2 measurement set) against any
  * generated tier dir — the iteration harness behind SURVEY §5.2's
  * numbers, runnable on the raw compiled classes (tools/jrun.sh)
  * without the sbt lock.
  *
  * Usage: OvBench <dir> [rowName ...]   (default: all rows, one
  * warmup pass then one timed pass each, min wall printed)
  */
object OvBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata/sf1ov")
    val only = args.drop(1).toSet
    val spark = graft.GraftSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-ovbench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs() = graft.sources.Tables.documents(spark, dir)
    // Persisted-index scratch, keyed by the tier dir: the BUILD is a
    // once-per-corpus cost (G18's contract), so the probe row prices
    // the at-scale operation — dedup a batch against an EXISTING
    // index — separately from index construction (r14 verdict #5:
    // dedup_cross's in-query build dominated its decade ratio).
    val idxRoot = "/root/repo/target/ovbench_idx_" +
      dir.replaceAll("[^A-Za-z0-9.]", "_")
    def baseSide() = {
      import org.apache.spark.sql.functions.{col, lit, pmod}
      docs().filter(pmod(col("doc_id"), lit(10)) =!= 0)
    }
    def probeSide() = {
      import org.apache.spark.sql.functions.{col, lit, pmod}
      docs().filter(pmod(col("doc_id"), lit(10)) === 0)
    }
    def buildIndex(): Long = {
      val p = new org.apache.hadoop.fs.Path(idxRoot)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
      graft.operators.NearDupIndex.build(baseSide(), "doc_id", "text",
        idxRoot, threshold = 0.5, sigMaxDf = 1000)
      graft.sources.AtomicLake.read(spark, s"$idxRoot/sh").count()
    }
    val rows: Seq[(String, () => Long)] = Seq(
      "ov_dedup_exact" -> (() =>
        graft.operators.Dedup.exact(docs(), "text", "doc_id").count()),
      "ov_dedup_jaccard_cap" -> (() =>
        graft.operators.Dedup.ngramJaccard(docs(), "doc_id", "text",
          n = 3, threshold = 0.5, maxDf = 100).count()),
      // renamed from ov_dedup_minhash_cap with the sigMaxDf=1000 dial
      // (r15 ADVICE — see Bench.scala)
      // SPARK_GRAFT_OV_SIGDF overrides the row's sigMaxDf dial for
      // dial-scaling experiments (§5.2 third decade: candidates at a
      // FIXED absolute cut grow ~15×/decade on Zipf(1.3), so the
      // production dial tightens with corpus size); the bench-pinned
      // row stays 1000.
      "ov_dedup_minhash_sigdf" -> (() =>
        graft.operators.MinHashLsh.nearDuplicates(docs(), "doc_id",
          "text", threshold = 0.5, maxBucket = 1000,
          sigMaxDf = sys.env.getOrElse("SPARK_GRAFT_OV_SIGDF", "1000")
            .toInt).count()),
      // r16 candidate-budget form: ONE budget across every tier —
      // 1.6e9 kept-pair-mass, picked from the 5M dial census
      // (LadderProbe --dial-census: mass(df<=200)=1.513e9 at 5M, so
      // the dial resolves to ~200 there — the measured 2.45×-faster /
      // 99.74%-retention point — while smaller tiers resolve looser
      // automatically). SPARK_GRAFT_OV_BUDGET overrides for sweeps.
      "ov_dedup_minhash_budget" -> (() =>
        graft.operators.MinHashLsh.nearDuplicates(docs(), "doc_id",
          "text", threshold = 0.5, maxBucket = 1000,
          candidateBudget = sys.env
            .getOrElse("SPARK_GRAFT_OV_BUDGET", "1600000000").toLong)
          .count()),
      "ov_dedup_simhash_ngram" -> (() =>
        graft.operators.SimHash.nearDuplicates(docs(), "doc_id",
          "text", maxDist = 3, chunks = 4, nGram = 3,
          maxBucket = 1000).count()),
      "ov_dedup_cross_cap" -> (() => {
        import org.apache.spark.sql.functions.{col, lit, pmod}
        graft.operators.MinHashLsh.nearDuplicatesSplit(docs(),
          "doc_id", "text", probeSide = pmod(col("doc_id"), lit(10)) === 0,
          threshold = 0.5, maxBucket = 1000, sigMaxDf = 1000).count()
      }),
      "ov_dedup_index_build" -> (() => buildIndex()),
      "ov_dedup_index_probe" -> (() =>
        graft.operators.NearDupIndex.pairsAgainstIndex(spark,
          probeSide(), "doc_id", "text", idxRoot,
          threshold = 0.5, maxBucket = 1000).count()))
    val selected = rows.filter { case (n, _) => only.isEmpty || only(n) }
    // probe-only invocations still need an index; build it untimed
    if (selected.exists(_._1 == "ov_dedup_index_probe") &&
        !selected.exists(_._1 == "ov_dedup_index_build") &&
        !graft.operators.NearDupIndex.exists(idxRoot)) {
      println(s"[prepare] building index at $idxRoot (untimed)")
      buildIndex()
    }
    // SPARK_GRAFT_OVBENCH_COLD=1 skips the warm pass — the 5M-doc
    // tier's rows run minutes each, and the cold pass is the
    // comparable-to-Bench number anyway.
    val coldOnly = sys.env.get("SPARK_GRAFT_OVBENCH_COLD").contains("1")
    selected.foreach { case (name, f) =>
        // Bench's ov tier times ONE cold pass (no warmup); print both
        // the cold and a warm pass so either comparison is available.
        val t0 = System.nanoTime()
        val n = f()
        val cold = (System.nanoTime() - t0) / 1e9
        if (coldOnly)
          println(f"$name%-28s cold $cold%8.2f s  rows=$n")
        else {
          val t1 = System.nanoTime()
          f()
          val warm = (System.nanoTime() - t1) / 1e9
          println(
            f"$name%-28s cold $cold%8.2f s  warm $warm%8.2f s  rows=$n")
        }
        System.gc()
      }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe for the 5M-doc open-vocab decade: measures the
  * capped-minhash CANDIDATE workload (bucket histogram + Σ C(n,2))
  * without running the verify joins, so a disk-exhaustion wall can be
  * attributed to a stage before buying the full query. Diagnostic.
  */
object LadderProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata/sf100ov")
    val sigMaxDf = args.lift(1).map(_.toInt).getOrElse(1000)
    val skipJaccard = args.contains("--skip-jaccard")
    val spark = graft.GraftSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("ladder-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, dir)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-36s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      r
    }
    // jaccard workload census: Σ C(min(df,100),2) — the capped
    // posting-pair emissions dedup_jaccard(maxDf=100) actually pays,
    // for attributing decade wall ratios to workload vs plan
    if (!skipJaccard) t("jaccard capped workload") {
      val df100 = docs.select(explode(graft.operators.Dedup
          .shingleHashes(col("text"), 3)).as("h"))
        .groupBy("h").agg(least(count(lit(1)), lit(100L)).as("d"))
      val half2 = udf((n: Long) => n * (n - 1) / 2)
      val w = df100.agg(
        sum(half2(col("d"))).cast("long").as("pairs"),
        count(lit(1)).as("distinct_shingles")).head()
      println(s"jaccardCappedPairs=${w.getLong(0)} " +
        s"distinctShingles=${w.getLong(1)}")
    }
    val sh = docs.select(col("doc_id"),
        sort_array(graft.operators.Dedup
          .shingleHashes(col("text"), 3)).as("sh"))
      .filter(size(col("sh")) > 0).localCheckpoint()
    println(s"docs=${sh.count()}")
    // --dial-census: the r16 candidate-budget resolver's view of this
    // corpus — cumulative kept pair mass Σ n·C(df,2) at landmark
    // dials, plus the dial a few budgets resolve to. One histogram
    // job; used to pick the budget constants for the §5.2 ladder.
    if (args.contains("--dial-census")) {
      t("dial census (pair-mass curve)") {
        val hist = sh.select(explode(col("sh")).as("h"))
          .groupBy("h").agg(count(lit(1)).as("df"))
          .filter(col("df") >= 2)
          .groupBy("df").agg(count(lit(1)).as("n"))
          .select(col("df").cast("long"), col("n").cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
          .sortBy(_._1)
        var cum = 0L
        val marks = Seq(50L, 100L, 200L, 500L, 1000L, 2000L, 5000L)
        val curve = scala.collection.mutable.LinkedHashMap[Long, Long]()
        var mi = 0
        hist.foreach { case (df, n) =>
          while (mi < marks.size && df > marks(mi)) {
            curve(marks(mi)) = cum; mi += 1
          }
          cum += n * (df * (df - 1) / 2)
        }
        while (mi < marks.size) { curve(marks(mi)) = cum; mi += 1 }
        println(s"totalPairMass=$cum maxDf=${hist.lastOption.map(_._1)}")
        curve.foreach { case (d, m) => println(s"  mass(df<=$d)=$m") }
        // same arithmetic as MinHashLsh.resolveSigMaxDf, replayed
        // over the already-collected histogram (the operator's own
        // resolution is spec-gated; re-running its census job 5×
        // at the 5M tier would cost minutes for no information)
        Seq(1000000L, 10000000L, 100000000L, 1000000000L,
            10000000000L).foreach { b =>
          var c = 0L; var best = 1L; var fitsAll = true
          hist.foreach { case (df, n) =>
            c += n * (df * (df - 1) / 2)
            if (c <= b) best = df else fitsAll = false
          }
          val r = if (hist.isEmpty || fitsAll) 0 else best
          println(s"  resolve(budget=$b)=$r")
        }
      }
      spark.stop(); return
    }
    val banned = t(s"census df>$sigMaxDf") {
      val b = graft.operators.MinHashLsh.bannedCensus(sh, sigMaxDf)
        .select("h").localCheckpoint()
      println(s"banned=${b.count()}")
      b
    }
    val banded = t("bandedCut 64/32") {
      val b = graft.operators.MinHashLsh
        .bandedCut(sh, banned, 64, 32, 42L).localCheckpoint()
      println(s"bandRows=${b.count()}")
      b
    }
    t("bucket histogram + workload") {
      val sizes = banded.groupBy("band", "bucket")
        .agg(count(lit(1)).as("n"))
      val half = udf((n: Long) => n * (n - 1) / 2)
      val stats = sizes.agg(
        max("n").cast("long").as("max_n"),
        sum(when(col("n") > 1000, 1L).otherwise(0L)).cast("long")
          .as("over_cap"),
        sum(when(col("n") <= 1000, half(col("n"))).otherwise(0L))
          .cast("long").as("pair_emissions_capped"),
        sum(half(col("n"))).cast("long").as("pair_emissions_uncapped"))
        .head()
      println(s"maxBucket=${stats.getLong(0)} overCap=${stats.getLong(1)} " +
        s"pairsCapped=${stats.getLong(2)} pairsUncapped=${stats.getLong(3)}")
    }
    spark.stop()
  }
}

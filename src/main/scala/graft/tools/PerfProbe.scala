package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler for the two perf-weak rows (r14
  * verdict #2): times cumulative sub-plans of dedup_jaccard and
  * pipe_model_curation at sf0.1 so the per-exchange cost breakdown is
  * measured, not argued. Diagnostic only — not part of the catalog.
  */
object PerfProbe {
  private def time(name: String)(f: => Long): Unit = {
    val runs = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      System.gc()
      (s, n)
    }
    val best = runs.map(_._1).min
    println(f"$name%-46s ${best}%7.3f s  (rows=${runs.head._2})")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.lift(1).getOrElse("both")
    val spark = graft.GraftSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("perf-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, dir)

    if (which == "both" || which == "jaccard") {
      import graft.operators.Dedup
      // warmup
      Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5).count()
      val sh = docs
        .select(col("doc_id").cast("long").as("doc_id"),
          Dedup.shingleHashes(col("text"), 3).as("shs"))
        .select(col("doc_id"), size(col("shs")).cast("long").as("n_sh"),
          explode(col("shs")).as("shingle"))
      val packed = sh.select(col("shingle"),
        shiftleft(col("doc_id"), 32).bitwiseOR(col("n_sh")).as("p"))
      time("jaccard 1: scan+shingle+explode+pack")(packed.count())
      val postings = packed
        .repartition(32, col("shingle"))
        .groupBy(col("shingle"))
        .agg(graft.expressions.BoundedCollect
          .boundedCollectLong(col("p"), 65536).as("ps"))
      time("jaccard 2: + repartition + boundedCollect")(postings.count())
      val pairsRaw = postings
        .select(explode(graft.expressions.NativeKernels
          .idPairsFromPostingsCol(col("ps"), 0.5)).as("p"))
      time("jaccard 3: + pair kernel explode")(pairsRaw.count())
      val agg = pairsRaw
        .groupBy(col("p.pk").as("pk"))
        .agg(count(lit(1)).as("inter"), first(col("p.nc")).as("nc"))
      time("jaccard 4: + pair agg")(agg.count())
      time("jaccard 5: full ngramJaccard")(
        Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5).count())
    }

    if (which == "jacvar") {
      import graft.operators.Dedup
      Dedup.ngramJaccard(docs, "doc_id", "text", 3, 0.5).count() // warm
      val sh = docs
        .select(col("doc_id").cast("long").as("doc_id"),
          Dedup.shingleHashes(col("text"), 3).as("shs"))
        .select(col("doc_id"), size(col("shs")).cast("long").as("n_sh"),
          explode(col("shs")).as("shingle"))
      val packed = sh.select(col("shingle"),
        shiftleft(col("doc_id"), 32).bitwiseOR(col("n_sh")).as("p"))
      def postings = packed
        .repartition(32, col("shingle"))
        .groupBy(col("shingle"))
        .agg(graft.expressions.BoundedCollect
          .boundedCollectLong(col("p"), 65536).as("ps"))
      def pairsRaw = postings
        .select(explode(graft.expressions.NativeKernels
          .idPairsFromPostingsCol(col("ps"), 0.5)).as("p"))
      time("jacvar A: groupBy(pk).agg(count, first(nc))")(
        pairsRaw.groupBy(col("p.pk").as("pk"))
          .agg(count(lit(1)).as("inter"), first(col("p.nc")).as("nc"))
          .count())
      time("jacvar B: repartition(pk) + count,first")(
        pairsRaw.repartition(32, col("p.pk"))
          .groupBy(col("p.pk").as("pk"))
          .agg(count(lit(1)).as("inter"), first(col("p.nc")).as("nc"))
          .count())
      time("jacvar C: groupBy(pk, nc).agg(count)")(
        pairsRaw.groupBy(col("p.pk").as("pk"), col("p.nc").as("nc"))
          .agg(count(lit(1)).as("inter"))
          .count())
      time("jacvar D: repartition(pk) + groupBy(pk,nc)")(
        pairsRaw.repartition(32, col("p.pk"))
          .groupBy(col("p.pk").as("pk"), col("p.nc").as("nc"))
          .agg(count(lit(1)).as("inter"))
          .count())
    }

    if (which == "curvar") {
      import graft.functions.TextFns
      import graft.operators.QualityModel
      val labeled = docs.withColumn("label",
        (TextFns.qualityScore(col("text")) >= 0.55).cast("int"))
      val model = QualityModel.trainCanonical(
        QualityModel.featurize(labeled, "text"), "label", "doc_id")
      val scoreOnly = QualityModel.score(docs, "text", model)
        .select(col("doc_id"), col("quality_prob"))
        .filter(col("quality_prob") >= 0.5)
      scoreOnly.count() // warmup
      time("curvar A: featurize+prob+filter only")(scoreOnly.count())
      val langOnly = docs.select(col("doc_id"),
          TextFns.langId(col("text")).as("lang_pred"))
        .filter(col("lang_pred") =!= "und")
      time("curvar B: langId+filter only")(langOnly.count())
      val combined = QualityModel.score(docs, "text", model)
        .select(col("doc_id"), col("text"), col("quality_prob"))
        .filter(col("quality_prob") >= 0.5)
        .withColumn("lang_pred", TextFns.langId(col("text")))
        .filter(col("lang_pred") =!= "und")
      time("curvar C: combined (pipe stage 1)")(combined.count())
      val oneProject = QualityModel.score(docs, "text", model)
        .withColumn("lang_pred", TextFns.langId(col("text")))
        .select(col("doc_id"), col("text"), col("quality_prob"),
          col("lang_pred"))
        .filter(col("quality_prob") >= 0.5 &&
          col("lang_pred") =!= "und")
      time("curvar D: one projection, one filter")(oneProject.count())
    }

    if (which == "cse") {
      import graft.functions.TextFns
      val one = docs.select((TextFns.wordCount(col("text")) > 0)
        .as("x")).filter(col("x"))
      one.count() // warmup
      time("cse 1: ONE tokenCounts getItem")(one.count())
      val twenty = docs.select(
        TextFns.langMarkers.flatMap(_._2).distinct
          .map(w => TextFns.tokenOccurrences(col("text"), w))
          .reduce(_ + _).as("s"),
        TextFns.wordCount(col("text")).as("n"))
        .filter(col("s") >= 0 && col("n") >= 0)
      twenty.count()
      time("cse 2: 16 getItems of the same kernel call")(twenty.count())
      val materialized = docs
        .select(graft.expressions.NativeKernels
          .tokenCountsCol(col("text"), TextFns.kernelWords).as("tc"))
        .select((0 until 15).map(i => col("tc").getItem(i)).reduce(_ + _)
          .as("s"), col("tc").getItem(15).as("n"))
        .filter(col("s") >= 0 && col("n") >= 0)
      materialized.count()
      time("cse 3: kernel materialized as a column")(materialized.count())
    }

    if (which == "curvar2") {
      import graft.functions.TextFns
      import graft.operators.QualityModel
      val labeled = docs.withColumn("label",
        (TextFns.qualityScore(col("text")) >= 0.55).cast("int"))
      val model = QualityModel.trainCanonical(
        QualityModel.featurize(labeled, "text"), "label", "doc_id")
      def newShape() = QualityModel
        .scoreWithCounts(
          docs.withColumn("_tc", TextFns.markerCounts(col("text"))),
          "text", col("_tc"), model)
        .select(col("doc_id"), col("text"), col("quality_prob"),
          col("_tc"))
        .filter(col("quality_prob") >= 0.5)
        .withColumn("lang_pred", TextFns.langIdFromCounts(col("_tc")))
        .filter(col("lang_pred") =!= "und")
      newShape().count() // warmup
      time("curvar2 G: new shape with filters")(newShape().count())
      def noFilter() = QualityModel
        .scoreWithCounts(
          docs.withColumn("_tc", TextFns.markerCounts(col("text"))),
          "text", col("_tc"), model)
        .select(col("doc_id"), col("text"), col("quality_prob"),
          col("_tc"))
        .withColumn("lang_pred", TextFns.langIdFromCounts(col("_tc")))
      time("curvar2 H: new shape NO filters")(noFilter().count())
      time("curvar2 I: checkpoint-then-filter")({
        noFilter().localCheckpoint()
          .filter(col("quality_prob") >= 0.5 &&
            col("lang_pred") =!= "und").count()
      })
      val justScore = QualityModel
        .scoreWithCounts(
          docs.withColumn("_tc", TextFns.markerCounts(col("text"))),
          "text", col("_tc"), model)
        .select(col("doc_id"), col("quality_prob"))
      justScore.count()
      time("curvar2 J: score only, no filter")(justScore.count())
    }

    if (which == "both" || which == "curation") {
      import graft.functions.TextFns
      import graft.operators.{Dedup, QualityModel}
      val labeled = docs.withColumn("label",
        (TextFns.qualityScore(col("text")) >= 0.55).cast("int"))
      val model = QualityModel.trainCanonical(
        QualityModel.featurize(labeled, "text"), "label", "doc_id")
      def scored() = QualityModel.score(docs, "text", model)
        .select(col("doc_id"), col("text"), col("quality_prob"))
        .filter(col("quality_prob") >= 0.5)
        .withColumn("lang_pred", TextFns.langId(col("text")))
        .filter(col("lang_pred") =!= "und")
      scored().count() // warmup
      time("curation 1: score+langid+filters")(scored().count())
      time("curation 2: + localCheckpoint")(
        scored().localCheckpoint().count())
      val gated = scored().localCheckpoint()
      time("curation 3: exact dedup on pinned input")(
        Dedup.exact(gated, "text", "doc_id").count())
      time("curation 4: + final projection")(
        Dedup.exact(gated, "text", "doc_id")
          .select(col("doc_id"), col("lang_pred"),
            TextFns.wordCount(col("text")).as("ws_tokens"),
            col("quality_prob")).count())
      time("curation 5: full pipe (fresh checkpoint)")({
        val g = scored().localCheckpoint()
        Dedup.exact(g, "text", "doc_id")
          .select(col("doc_id"), col("lang_pred"),
            TextFns.wordCount(col("text")).as("ws_tokens"),
            col("quality_prob")).count()
      })
    }
    // stage breakdown of the persisted-index PROBE (the at-scale
    // repeated operation): which slice of pairsAgainstIndex pays —
    // batch banding, the combined bucket census, the candidate join
    // (which currently shuffles the INDEX band table), or verify.
    // args: <ovDir> probe  (expects an OvBench index at the usual
    // scratch root for that dir; builds one when absent)
    if (which == "probe") {
      import graft.operators.NearDupIndex
      import graft.sources.AtomicLake
      // PROBE_STAGES=2,4 runs only those stage numbers (the 5M tier
      // runs minutes per stage × min-of-3); default all
      val stages = sys.env.get("PROBE_STAGES")
        .map(_.split(",").map(_.trim.toInt).toSet)
        .getOrElse((0 to 7).toSet)
      def stg(n: Int)(f: => Unit): Unit = if (stages(n)) f
      val idxRoot = "/root/repo/target/ovbench_idx_" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      if (!NearDupIndex.exists(idxRoot)) {
        println(s"[prepare] building index at $idxRoot (untimed)")
        NearDupIndex.build(docs.filter(pmod(col("doc_id"),
            lit(10)) =!= 0), "doc_id", "text", idxRoot,
          threshold = 0.5, sigMaxDf = 1000)
      }
      val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      val bandedIdx = AtomicLake.read(spark, s"$idxRoot/bands")
      stg(0)(time("probe 0: index band table scan")(bandedIdx.count()))
      stg(1)(time("probe 1: census groupBy over index bands")(
        bandedIdx.groupBy(col("band"), col("bucket"))
          .agg(count(lit(1)).as("n")).filter(col("n") <= 1000).count()))
      stg(2)(time("probe 2: full pairsAgainstIndex uncapped")(
        NearDupIndex.pairsAgainstIndex(spark, batch, "doc_id", "text",
          idxRoot, threshold = 0.5).count()))
      stg(3)(time("probe 3: full pairsAgainstIndex maxBucket=1000")(
        NearDupIndex.pairsAgainstIndex(spark, batch, "doc_id", "text",
          idxRoot, threshold = 0.5, maxBucket = 1000).count()))
      // threshold > 1 makes the size prefilter reject every pair, so
      // this times banding + candidates + the one-long size joins
      // WITHOUT the array joins — the verify-array share is the
      // probe-2 minus probe-4 difference
      stg(4)(time("probe 4: cands + size joins only (threshold>1)")(
        NearDupIndex.pairsAgainstIndex(spark, batch, "doc_id", "text",
          idxRoot, threshold = 1.01).count()))
      // batch-side decomposition: the probe's ∝-batch floor is the
      // batch's own shingling + ban-filtered signature computation
      import graft.operators.{Dedup, MinHashLsh}
      val pr = NearDupIndex.readParams(idxRoot)
      // measure against the index's ACTUAL pinned geometry: the ban
      // table only exists when the index was built with sigMaxDf > 0
      // (an unconditional read throws), and the batch must shingle
      // under the pinned hash family — xx hashes probed against a
      // portable-family index band to zero candidates and stages 5-7
      // mis-measure (r16 ADVICE)
      val banned =
        if (pr.sigMaxDf > 0)
          AtomicLake.read(spark, s"$idxRoot/banned").select(col("h"))
        else spark.range(0).select(col("id").as("h"))
      val shHashes =
        if (pr.portableHash)
          Dedup.shinglePortableHashes(col("text"), pr.shingleN)
        else Dedup.shingleHashes(col("text"), pr.shingleN)
      val shB = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select(col("doc_id"), sort_array(shHashes).as("sh"))
        .filter(size(col("sh")) > 0)
      stg(5)(time("probe 5: batch shingle + pin")(
        shB.localCheckpoint().count()))
      val shBp = shB.localCheckpoint()
      stg(6)(time("probe 6: batch bandedCut (sig under ban)")(
        MinHashLsh.bandedCut(shBp, banned, pr.numHashes, pr.bands,
          pr.seed, pr.portableHash).count()))
      stg(7)(time("probe 7: + band-row pin")(
        MinHashLsh.bandedCut(shBp, banned, pr.numHashes, pr.bands,
          pr.seed, pr.portableHash).localCheckpoint().count()))
    }
    spark.stop()
  }
}

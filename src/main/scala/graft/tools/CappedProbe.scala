package graft.tools

import org.apache.spark.sql.functions._

/** Ad-hoc dial probe for the capped portable near-dup gates: prints
  * ban-set size, dropped buckets, and pair counts per SF dir so the
  * gate dials (sigMaxDf / maxBucket) can be chosen non-vacuous.
  * Scratch diagnostic — not part of the catalog.
  */
object CappedProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(8).master("local[8]")
      .appName("capped-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sigMaxDf = args.lift(1).map(_.toInt).getOrElse(5)
    val maxBucket = args.lift(2).map(_.toInt).getOrElse(8)
    for (dir <- args.headOption.toSeq ++ (if (args.isEmpty)
        Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
          "/root/testdata/sf0.1") else Nil)) {
      val docs = graft.sources.Tables.documents(spark, dir)
      val sh = docs.select(col("doc_id"),
          sort_array(graft.operators.Dedup
            .shinglePortableHashes(col("text"), 3)).as("sh"))
        .filter(size(col("sh")) > 0).localCheckpoint()
      val banned = graft.operators.MinHashLsh.bannedCensus(sh, sigMaxDf)
      val nBanned = banned.count()
      val banded = graft.operators.MinHashLsh.bandedCut(
        sh, banned.select("h"), 64, 32, 42L).localCheckpoint()
      val sizes = banded.groupBy("band", "bucket")
        .agg(count(lit(1)).as("n"))
      val nBuckets = sizes.count()
      val nDropped = sizes.filter(col("n") > maxBucket).count()
      val maxB = sizes.agg(max("n")).head().getLong(0)
      val pairsCapped = graft.operators.MinHashLsh.nearDuplicates(
        docs, "doc_id", "text", threshold = 0.5,
        maxBucket = maxBucket, sigMaxDf = sigMaxDf,
        portableHash = true).count()
      val pairsExact = graft.operators.MinHashLsh.nearDuplicates(
        docs, "doc_id", "text", threshold = 0.5).count()
      println(s"$dir sigMaxDf=$sigMaxDf maxBucket=$maxBucket: " +
        s"banned=$nBanned buckets=$nBuckets dropped=$nDropped " +
        s"maxBucketSize=$maxB pairsCapped=$pairsCapped " +
        s"pairsExact=$pairsExact")
    }
    spark.stop()
  }
}

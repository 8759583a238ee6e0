package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import graft.sources.AtomicLake

object LakeStreamSpec {
  /** Cross-incarnation record for the checkpoint-resume case (the
    * foreachBatch closure runs on the driver in local mode). */
  val seen = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
}

/** Table-as-stream: the graft-lake Structured Streaming source. */
class LakeStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_lakestream").toString

  private def startQuery(root: String, sinkName: String,
      ignoreDeletes: Boolean = false) = {
    val reader = spark.readStream.format("graft-lake")
      .option("path", root)
    (if (ignoreDeletes) reader.option("ignoreDeletes", "true") else reader)
      .load()
      .writeStream.format("memory").queryName(sinkName)
      .trigger(Trigger.ProcessingTime(50))
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ls_ckpt").toString)
      .start()
  }

  describe("graft-lake streaming source") {
    it("streams the initial snapshot, then exactly the appended rows") {
      val root = freshRoot()
      AtomicLake.append(Seq((1, "a"), (2, "b")).toDF("id", "v"), root)
      val q = startQuery(root, "ls_sink1")
      try {
        q.processAllAvailable()
        spark.table("ls_sink1").count() shouldBe 2
        AtomicLake.append(Seq((3, "c")).toDF("id", "v"), root)
        AtomicLake.append(Seq((4, "d")).toDF("id", "v"), root)
        q.processAllAvailable()
        spark.table("ls_sink1").select($"id").as[Int].collect()
          .toSet shouldBe Set(1, 2, 3, 4)
      } finally q.stop()
    }

    it("fails loudly when a commit removes files") {
      val root = freshRoot()
      AtomicLake.upsertPartitions(
        Seq((1, "d1"), (2, "d2")).toDF("id", "day"), root, Seq("day"))
      val q = startQuery(root, "ls_sink2")
      try {
        q.processAllAvailable()
        // replace a partition: the next batch sees removed files
        AtomicLake.upsertPartitions(
          Seq((9, "d1")).toDF("id", "day"), root, Seq("day"))
        val ex = intercept[StreamingQueryException] {
          q.processAllAvailable()
        }
        ex.getMessage should include("ignoreDeletes")
      } finally q.stop()
    }

    it("fails loudly when a deletion-vector commit deletes rows in place") {
      val root = freshRoot()
      AtomicLake.append(Seq((1, "a"), (2, "b")).toDF("id", "v"), root)
      val q = startQuery(root, "ls_sink_dv")
      try {
        q.processAllAvailable()
        // rows vanish with NO file removed — only the dv check can see it
        AtomicLake.deleteWhereDV(spark, root)($"id" === 1)
        val ex = intercept[StreamingQueryException] {
          q.processAllAvailable()
        }
        ex.getMessage should include("deletion")
      } finally q.stop()
    }

    it("streams only the added side under ignoreDeletes") {
      val root = freshRoot()
      AtomicLake.upsertPartitions(
        Seq((1, "d1"), (2, "d2")).toDF("id", "day"), root, Seq("day"))
      val q = startQuery(root, "ls_sink3", ignoreDeletes = true)
      try {
        q.processAllAvailable()
        AtomicLake.upsertPartitions(
          Seq((9, "d1")).toDF("id", "day"), root, Seq("day"))
        q.processAllAvailable()
        spark.table("ls_sink3").select($"id").as[Int].collect()
          .toSet shouldBe Set(1, 2, 9)
      } finally q.stop()
    }

    it("maxVersionsPerTrigger paces catch-up into bounded batches") {
      val root = freshRoot()
      val ckpt = Files.createTempDirectory("graft_ls_pace").toString
      val batches = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
      def start(paced: Boolean) = {
        val r = spark.readStream.format("graft-lake").option("path", root)
        (if (paced) r.option("maxVersionsPerTrigger", "1") else r)
          .load()
          .writeStream.option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            batches.add(df.count().toInt); ()
          }.trigger(Trigger.ProcessingTime(20)).start()
      }
      // incarnation 1 processes v1 and records the stream position
      AtomicLake.append(Seq((0, "z")).toDF("id", "v"), root)
      val q0 = start(paced = false)
      try q0.processAllAvailable() finally q0.stop()
      // a 5-commit backlog lands while the stream is down
      (1 to 5).foreach(i =>
        AtomicLake.append(Seq((i, "v")).toDF("id", "v"), root))
      batches.clear()
      val q = start(paced = true)
      try {
        q.processAllAvailable()
        val sizes = batches.asScala.map(_.intValue).toSeq
        sizes.sum shouldBe 5 // the backlog, nothing re-read
        // paced: ONE commit (one row here) per non-empty batch —
        // never a multi-commit gulp
        sizes.filter(_ > 0) shouldBe Seq(1, 1, 1, 1, 1)
      } finally q.stop()
    }

    it("refuses a non-positive maxVersionsPerTrigger loudly") {
      val root = freshRoot()
      AtomicLake.append(Seq((1, "a")).toDF("id", "v"), root)
      val ex = intercept[Exception] {
        val q = spark.readStream.format("graft-lake")
          .option("path", root).option("maxVersionsPerTrigger", "0")
          .load()
          .writeStream.format("memory").queryName("ls_badopt")
          .option("checkpointLocation",
            Files.createTempDirectory("graft_ls_bad").toString)
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      ex.getMessage should include("maxVersionsPerTrigger")
    }

    it("compaction never re-emits rows and never breaks the stream") {
      val root = freshRoot()
      // three appends fragment the (single, unpartitioned) partition
      AtomicLake.append(Seq((1, "a")).toDF("id", "v"), root)
      AtomicLake.append(Seq((2, "b")).toDF("id", "v"), root)
      AtomicLake.append(Seq((3, "c")).toDF("id", "v"), root)
      val q = startQuery(root, "ls_sink5") // note: NO ignoreDeletes
      try {
        q.processAllAvailable()
        spark.table("ls_sink5").count() shouldBe 3
        // compact rewrites every file — kind=compact, so the stream
        // skips it entirely instead of duplicating or failing
        AtomicLake.compact(spark, root)
        AtomicLake.append(Seq((4, "d")).toDF("id", "v"), root)
        q.processAllAvailable()
        spark.table("ls_sink5").select($"id").as[Int].collect()
          .sorted.toSeq shouldBe Seq(1, 2, 3, 4)
      } finally q.stop()
    }

    it("composes with the indexed-ingest sink: lake -> stream -> deduped lake + live index (G23 ∘ G19)") {
      import graft.operators.NearDupIndex
      val crawl = freshRoot()   // upstream crawl landing lake
      val docs = freshRoot() + "/docs"
      val index = freshRoot() + "/index"
      AtomicLake.append(
        Seq((1L, "alpha beta gamma delta epsilon zeta"),
          (2L, "one two three four five six"))
          .toDF("doc_id", "text"), crawl)
      val q = graft.streaming.StreamingLake.ingestWithIndexSink(
        spark.readStream.format("graft-lake").option("path", crawl).load(),
        "doc_id", "text", docs, index,
        Files.createTempDirectory("graft_ls_ing").toString,
        threshold = 0.5)
        .trigger(Trigger.ProcessingTime(50)).start()
      try {
        q.processAllAvailable()
        AtomicLake.read(spark, docs).count() shouldBe 2
        // a near-dup of doc 1 lands upstream: the stream carries it
        // into the docs lake AND the index sees it against batch 1
        AtomicLake.append(
          Seq((3L, "alpha beta gamma delta epsilon eta"))
            .toDF("doc_id", "text"), crawl)
        q.processAllAvailable()
        AtomicLake.read(spark, docs).count() shouldBe 3
        // a NEW doc probes the persisted index: both the original and
        // the streamed-in near-dup answer, proving batch 2 extended it
        val probe = Seq((99L, "alpha beta gamma delta epsilon eta"))
          .toDF("doc_id", "text")
        val pairs = NearDupIndex.pairsAgainstIndex(spark, probe,
            "doc_id", "text", index, threshold = 0.5)
          .select($"id1").as[Long].collect().toSet
        pairs shouldBe Set(1L, 3L)
      } finally q.stop()
    }

    it("composes with the merge sink: change-log lake -> stream -> " +
        "keyed-upsert replica (G23 ∘ G28)") {
      val log = freshRoot()     // upstream append-only change log
      val replica = freshRoot() + "/replica"
      AtomicLake.append(
        Seq((1L, 1L, 10.0), (2L, 1L, 20.0)).toDF("k", "seq", "v"), log)
      val q = graft.streaming.StreamingLake.mergeSink(
        spark.readStream.format("graft-lake").option("path", log).load(),
        replica, Files.createTempDirectory("graft_ls_mrg").toString,
        Seq("k"), latestBy = Some("seq"))
        .trigger(Trigger.ProcessingTime(50)).start()
      try {
        q.processAllAvailable()
        // more change batches land upstream: an update, an insert,
        // and two changes of one key whose later seq must win
        AtomicLake.append(
          Seq((2L, 2L, 99.0), (3L, 2L, 7.0)).toDF("k", "seq", "v"), log)
        AtomicLake.append(
          Seq((3L, 3L, 8.0), (4L, 3L, 40.0)).toDF("k", "seq", "v"), log)
        q.processAllAvailable()
        AtomicLake.read(spark, replica).select("k", "v")
          .as[(Long, Double)].collect().toMap shouldBe
          Map(1L -> 10.0, 2L -> 99.0, 3L -> 8.0, 4L -> 40.0)
      } finally q.stop()
    }

    it("resumes from the checkpointed version without re-reading") {
      val root = freshRoot()
      val ckpt = Files.createTempDirectory("graft_ls_ckpt2").toString
      AtomicLake.append(Seq((1, "a")).toDF("id", "v"), root)
      // memory sinks refuse checkpoint recovery; foreachBatch supports
      // it, and LakeStreamSpec.seen records what each incarnation read
      def start() = spark.readStream.format("graft-lake")
        .option("path", root).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val ids = df.select("id").collect().map(_.getInt(0))
          LakeStreamSpec.seen.addAll(ids.map(Integer.valueOf).toSeq.asJava)
          ()
        }.start()
      LakeStreamSpec.seen.clear()
      val q1 = start()
      try { q1.processAllAvailable() } finally q1.stop()
      LakeStreamSpec.seen.asScala.toSet shouldBe Set(1)
      // commits land while the stream is DOWN
      AtomicLake.append(Seq((2, "b")).toDF("id", "v"), root)
      LakeStreamSpec.seen.clear()
      val q2 = start()
      try {
        q2.processAllAvailable()
        // the restarted query reads ONLY the delta since the
        // checkpointed version — v1's row is never re-read
        LakeStreamSpec.seen.asScala.toSet shouldBe Set(2)
      } finally q2.stop()
    }
  }
}

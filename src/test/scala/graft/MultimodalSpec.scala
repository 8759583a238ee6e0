package graft

import graft.operators.{MediaRow, Multimodal}
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  describe("Multimodal") {
    it("bridges a DataFrame into a typed media Dataset") {
      val media = Multimodal.asMedia(Tables.documents(spark, sf),
        "doc_id", "text", kind = "image")
      media.count() shouldBe Tables.documents(spark, sf).count()
      val r = media.head()
      r.kind shouldBe "image"
      r.payload.length should be > 0
    }
    it("extracts deterministic features per asset") {
      val media = Multimodal.asMedia(Tables.documents(spark, sf),
        "doc_id", "text", kind = "image")
      val f1 = Multimodal.extractFeatures(media)
        .collect().map(f => f.media_id -> (f.checksum, f.width,
          f.height, f.embedding.toSeq)).toMap
      val f2 = Multimodal.extractFeatures(media)
        .collect().map(f => f.media_id -> (f.checksum, f.width,
          f.height, f.embedding.toSeq)).toMap
      f1 shouldBe f2
      f1.values.map(_._1).toSet.size should be > 1 // checksums vary
    }
    it("keeps kind-specific frame semantics") {
      val rows = Seq(
        MediaRow(1L, "image", Array[Byte](1, 2, 3), "{}"),
        MediaRow(2L, "video", Array[Byte](1, 2, 3), "{}"),
        MediaRow(3L, "audio", Array[Byte](1, 2, 3), "{}")).toDS()
      val f = Multimodal.extractFeatures(rows)
        .collect().map(r => r.kind -> r.n_frames).toMap
      f("image") shouldBe 1
      f("video") should be >= 1
      f("audio") should be >= 1
    }
    it("resize decimates deterministically; frame sampling is uniform") {
      val payload = Array.tabulate(1000)(i => (i % 127).toByte)
      val small = Multimodal.resizeStub(payload, 100)
      small.length shouldBe 100
      small.toSeq shouldBe Multimodal.resizeStub(payload, 100).toSeq
      Multimodal.resizeStub(small, 1000).toSeq shouldBe small.toSeq // no upscale
      Multimodal.frameSampleStub(10, 3).toSeq shouldBe Seq(0, 3, 6, 9)
      Multimodal.frameSampleStub(5, 1).toSeq shouldBe Seq(0, 1, 2, 3, 4)
    }

    it("is a narrow plan - no shuffle in the physical plan") {
      val media = Multimodal.asMedia(Tables.documents(spark, sf),
        "doc_id", "text", kind = "image")
      val plan = Multimodal.extractFeatures(media)
        .queryExecution.executedPlan.toString
      plan should not include "Exchange"
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.{AsOfJoin, Dedup, Sampling}

/** Extended training-data-pipeline operators (SURVEY.md §2 G1-G5). */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  describe("AsOfJoin.asOf") {
    val right = Seq((1, 10, "a"), (1, 20, "b"), (2, 15, "c"))
      .toDF("k", "ts", "v")
    val left = Seq((101, 1, 5), (102, 1, 10), (103, 1, 25), (104, 2, 14),
      (105, 3, 99)).toDF("id", "k", "ts")

    it("matches the greatest right ts at-or-before (inclusive)") {
      val r = AsOfJoin.asOf(left, right, "k", "k", "ts", "ts",
          payload = Seq("v"), inclusive = true)
        .select($"id", $"v").as[(Int, Option[String])]
        .collect().toMap
      r shouldBe Map(101 -> None, 102 -> Some("a"), 103 -> Some("b"),
        104 -> None, 105 -> None)
    }
    it("excludes equal timestamps under strict semantics") {
      val r = AsOfJoin.asOf(left, right, "k", "k", "ts", "ts",
          payload = Seq("v"), inclusive = false)
        .select($"id", $"v").as[(Int, Option[String])]
        .collect().toMap
      r(102) shouldBe None // ts=10 equals right ts=10: not visible
      r(103) shouldBe Some("b")
    }
    it("returns every left row exactly once with the matched ts") {
      val r = AsOfJoin.asOf(left, right, "k", "k", "ts", "ts",
        payload = Seq("v"), matchedTsName = "mts")
      r.count() shouldBe left.count()
      r.filter($"id" === 103).select($"mts").as[Int].head() shouldBe 20
    }
  }

  describe("Sampling") {
    it("is deterministic and respects the bucket bound") {
      val df = spark.range(0, 10000).toDF("id")
      val a = Sampling.sampleByHash(df, "id", 20).select("id")
        .as[Long].collect().sorted
      val b = Sampling.sampleByHash(df.repartition(13), "id", 20)
        .select("id").as[Long].collect().sorted
      a shouldBe b // partitioning-independent
      // ~20% within a loose tolerance
      a.length.toDouble / 10000 shouldBe 0.2 +- 0.05
    }
    it("applies per-stratum rates with a default") {
      val df = Seq((1L, "en"), (2L, "fr")).toDF("id", "s")
        .crossJoin(spark.range(0, 500).toDF("n"))
        .select(($"id" * 1000 + $"n").as("id"), $"s")
      val kept = Sampling.stratifiedSample(df, "id", "s",
        rates = Map("en" -> 0), defaultPct = 100)
      kept.filter($"s" === "en").count() shouldBe 0
      kept.filter($"s" === "fr").count() shouldBe 500
    }
  }

  describe("Dedup.connectedComponents") {
    it("collapses chains that pairwise dedup would miss") {
      val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
        .toDF("a", "b")
      val cc = Dedup.connectedComponents(pairs, "a", "b")
        .as[(Long, Long)].collect().toMap
      cc shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        10L -> 10L, 11L -> 10L)
    }
    it("handles cycles and singleton edges") {
      val pairs = Seq((5L, 6L), (6L, 7L), (7L, 5L)).toDF("a", "b")
      Dedup.connectedComponents(pairs, "a", "b")
        .select(countDistinct($"component")).as[Long].head() shouldBe 1L
    }
  }

  describe("TextFns PII scrub") {
    it("redacts emails and phone runs, leaves clean text alone") {
      val r = Seq(
        "mail me at a.b-c%d@ex-1.co today",
        "call +34 600 123 456 now",
        "digits 12 34 stay short",
        "clean prose only")
        .toDF("t")
        .select(TextFns.piiScrub($"t").as("s"), TextFns.piiCount($"t").as("n"))
        .as[(String, Int)].collect()
      r(0) shouldBe (("mail me at <EMAIL> today", 1))
      r(1) shouldBe (("call <PHONE> now", 1))
      r(2) shouldBe (("digits 12 34 stay short", 0))
      r(3) shouldBe (("clean prose only", 0))
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Bucketed range join (SURVEY.md §2 F12): equi-join shape for
  * `point BETWEEN lo AND hi` — correctness vs the nested-loop
  * reference, boundary/degenerate/overlap cases, the replication
  * guard, and the no-nested-loop plan proof.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points(ps: Double*) =
    ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("pid", "p")
  private def intervals(iv: (Double, Double)*) =
    iv.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      .toDF("iid", "lo", "hi")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("pid", "iid").as[(Long, Long)].collect().toSet

  describe("RangeJoin.bucketed") {
    it("matches the nested-loop reference on overlapping intervals") {
      val l = points(0.0, 1.5, 5.0, 9.99, 10.0, 25.0, -3.2, 47.0)
      val r = intervals((0.0, 10.0), (5.0, 15.0), (-5.0, -1.0),
        (9.99, 9.995), (20.0, 30.0))
      for (w <- Seq(1.0, 3.0, 10.0, 100.0)) {
        val got = pairs(RangeJoin.bucketed(l, "p", r, "lo", "hi", w))
        got shouldBe pairs(
          RangeJoin.reference(l, "p", r, "lo", "hi"))
      }
    }

    it("half-open vs inclusive bounds differ exactly at hi") {
      val l = points(10.0)
      val r = intervals((0.0, 10.0))
      pairs(RangeJoin.bucketed(l, "p", r, "lo", "hi", 4.0)) shouldBe
        Set.empty
      pairs(RangeJoin.bucketed(l, "p", r, "lo", "hi", 4.0,
        hiInclusive = true)) shouldBe Set((0L, 0L))
    }

    it("drops degenerate intervals instead of exploding a descending " +
        "sequence") {
      val l = points(5.0)
      val r = intervals((8.0, 2.0), (5.0, 5.0), (4.0, 6.0))
      pairs(RangeJoin.bucketed(l, "p", r, "lo", "hi", 1.0)) shouldBe
        Set((0L, 2L))
      // [5,5] is non-empty under inclusive bounds
      pairs(RangeJoin.bucketed(l, "p", r, "lo", "hi", 1.0,
        hiInclusive = true)) shouldBe Set((0L, 1L), (0L, 2L))
    }

    it("rides extra equi keys in the same join") {
      val l = Seq((1L, 5.0, "a"), (2L, 5.0, "b")).toDF("pid", "p", "k")
      val r = Seq((10L, 0.0, 10.0, "a"), (11L, 0.0, 10.0, "b"))
        .toDF("iid", "lo", "hi", "k")
      pairs(RangeJoin.bucketed(l, "p", r, "lo", "hi", 2.0,
        equiKeys = Seq("k"))) shouldBe Set((1L, 10L), (2L, 11L))
    }

    it("never duplicates a match (each pair meets in ONE bucket)") {
      val l = points(3.0)
      val r = intervals((0.0, 100.0)) // spans many buckets
      val got = RangeJoin.bucketed(l, "p", r, "lo", "hi", 1.0)
      got.count() shouldBe 1L
    }

    it("refuses an interval spanning more than maxBucketsPerInterval") {
      val l = points(3.0)
      val r = intervals((0.0, 1e9))
      val e = intercept[Exception] {
        RangeJoin.bucketed(l, "p", r, "lo", "hi", 1.0,
          maxBucketsPerInterval = 100).count()
      }
      e.getMessage should include("buckets of width")
    }

    it("left-outer keeps unmatched points with null interval columns") {
      val l = points(1.0, 5.0, 99.0)
      val r = intervals((0.0, 2.0), (4.0, 6.0))
      val out = RangeJoin.bucketedLeftOuter(l, "pid", "p", r,
        "lo", "hi", 2.0)
      out.count() shouldBe 3
      val byPid = out.select($"pid", $"iid".cast("string"))
        .as[(Long, Option[String])].collect().toMap
      byPid(0L) shouldBe Some("0")
      byPid(1L) shouldBe Some("1")
      byPid(2L) shouldBe None // unmatched survives with nulls
      // a multi-match point duplicates like any outer join
      val l2 = points(1.0)
      val r2 = intervals((0.0, 2.0), (0.5, 3.0))
      RangeJoin.bucketedLeftOuter(l2, "pid", "p", r2, "lo", "hi", 1.0)
        .count() shouldBe 2
    }

    it("plans WITHOUT a nested loop even when broadcast is off") {
      val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val l = points(1.0, 2.0, 3.0)
        val r = intervals((0.0, 2.0), (2.0, 4.0))
        val plan = RangeJoin.bucketed(l, "p", r, "lo", "hi", 1.0)
          .queryExecution.executedPlan.toString
        plan should not include "BroadcastNestedLoop"
        plan should not include "CartesianProduct"
        // and the reference DOES nested-loop (cartesian with
        // broadcast off, BNLJ otherwise), which is the point
        val ref = RangeJoin.reference(l, "p", r, "lo", "hi")
          .queryExecution.executedPlan.toString
        assert(ref.contains("BroadcastNestedLoop") ||
          ref.contains("CartesianProduct"))
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    }
  }
}

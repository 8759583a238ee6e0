package graft

import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters

/** Exact heavy hitters: Misra-Gries candidates + exact verify, with
  * the provable fast path and the uniform-tail fallback.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.na.drop().groupBy("item").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"item".asc).limit(k)
      .as[(String, Long)].collect().toSeq

  it("the sketch actually bounds per-partition state at s counters") {
    // one partition, one heavy item among many singletons: a working
    // Misra-Gries with s=8 must come back with at most 8 survivors
    // (pre-round-10 the decrement branch was dead — Scala unboxed the
    // missing-key null to 0L — and every distinct item survived)
    val rows = Seq.fill(500)("hot") ++ (1 to 1000).map(i => s"rare$i")
    val df = rows.toDF("item").repartition(1)
    val cand = HeavyHitters.candidates(df, "item", s = 8)
      .as[String].collect()
    cand.length should be <= 8
    cand should contain("hot") // the guarantee: > n/(s+1) survives
  }

  it("matches the naive top-k on skewed data via the proven fast path") {
    // zipf-ish: item i appears ~1000/i times
    val rows = (1 to 50).flatMap(i =>
      Seq.fill(1000 / i)(s"w${"%02d".format(i)}"))
    val df = rows.toDF("item").repartition(8)
    HeavyHitters.exactTopK(df, "item", k = 10, s = 32)
      .as[(String, Long)].collect().toSeq shouldBe naive(df, 10)
  }

  it("a heavy item spread across partitions always survives the sketch") {
    // 'hot' is 30% of the stream but diluted into every partition
    val rows = (1 to 7000).map(i =>
      if (i % 3 == 0) "hot" else s"noise$i")
    val df = rows.toDF("item").repartition(16)
    val top = HeavyHitters.exactTopK(df, "item", k = 1, s = 8)
      .as[(String, Long)].collect()
    top.head shouldBe ("hot", 2333L)
  }

  it("falls back to the full aggregation when the bound cannot prove the cut, still exact") {
    // all-distinct items: no sketch can separate a top-k — the
    // operator must return the exact (tie-broken) answer anyway
    val df = (1 to 500).map(i => s"u$i").toDF("item").repartition(4)
    HeavyHitters.exactTopK(df, "item", k = 5, s = 4)
      .as[(String, Long)].collect().toSeq shouldBe naive(df, 5)
  }

  it("excludes nulls and handles an empty input") {
    val df = Seq(Some("a"), None, Some("a"), Some("b"))
      .toDF("item")
    HeavyHitters.exactTopK(df, "item", k = 2, s = 8)
      .as[(String, Long)].collect().toSeq shouldBe
      Seq(("a", 2L), ("b", 1L))
    HeavyHitters.exactTopK(df.limit(0), "item", k = 2, s = 8)
      .count() shouldBe 0L
  }

  it("the ties at the kth slot break by item ascending, like the oracle") {
    val df = (Seq.fill(3)("b") ++ Seq.fill(3)("a") ++ Seq.fill(3)("c")
      ++ Seq.fill(9)("top")).toDF("item").repartition(3)
    HeavyHitters.exactTopK(df, "item", k = 2, s = 16)
      .as[(String, Long)].collect().toSeq shouldBe
      Seq(("top", 9L), ("a", 3L))
  }
}

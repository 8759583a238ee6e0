package graft

import org.apache.spark.sql.functions._
import graft.functions.{CleanFns, TimeFns}
import graft.lakehouse.Silver
import graft.operators.Profile
import graft.sources.Tables

class SilverSpec extends SparkSpec {
  import spark.implicits._

  describe("CleanFns") {
    it("try-casts garbage to null, numbers to values") {
      val df = Seq("12", "x12", " 7 ", "1.5", "").toDF("s")
        .select(CleanFns.tryCastLong($"s").as("l"),
          CleanFns.tryCastDouble($"s").as("d"))
      df.collect().map(r => (r.isNullAt(0), r.isNullAt(1))) shouldBe
        Array((false, false), (true, true), (false, false), (true, false),
          (true, true))
    }
    it("parses thousands-separated values like the INE rent column") {
      Seq("13.500", ".", "1.234.567").toDF("s")
        .select(CleanFns.parseThousandsSeparated($"s").as("v"))
        .as[Option[Double]].collect() shouldBe
        Array(Some(13500.0), None, Some(1234567.0))
    }
    it("splits delimited fields 1-based") {
      Seq("01001 Vitoria").toDF("s")
        .select(CleanFns.splitPart($"s", " ", 1)).as[String]
        .head() shouldBe "01001"
    }
  }

  describe("TimeFns") {
    it("roundtrips yyyyMMdd and reconstructs the period") {
      val r = Seq(("20240115", 13)).toDF("d", "h")
        .select(TimeFns.periodTimestamp(
          TimeFns.parseYyyymmdd($"d"), $"h").as("p"))
        .as[java.sql.Timestamp].head()
      r.toString shouldBe "2024-01-15 13:00:00.0"
    }
    it("computes ISO dow and weekend flags") {
      // 2024-01-15 is a Monday, 2024-01-21 a Sunday
      val df = Seq("2024-01-15", "2024-01-21").toDF("d")
        .select(to_date($"d").as("d"))
        .select(TimeFns.isodow($"d"), TimeFns.dayName($"d"),
          TimeFns.isWeekend($"d"))
      df.as[(Int, String, Boolean)].collect() shouldBe
        Array((1, "Monday", false), (7, "Sunday", true))
    }
  }

  describe("Silver builders") {
    it("dedupMapping keeps one deterministic row per key") {
      val m = Silver.dedupMapping(
        Seq(("a", "z"), ("a", "b"), ("b", "c"), (null, "x"))
          .toDF("k", "v"), "k", "v")
      m.orderBy("src_key").as[(String, String, Long)].collect() shouldBe
        Array(("a", "b", 2L), ("b", "c", 1L))
    }
    it("does not cast numeric keys to string") {
      val m = Silver.dedupMapping(
        Seq((1L, "z")).toDF("k", "v"), "k", "v")
      m.schema("src_key").dataType shouldBe
        org.apache.spark.sql.types.LongType
    }
    it("assigns dense surrogate keys in natural-key order") {
      val d = Silver.dimWithSurrogateKey(
        Seq("c", "a", "b").toDF("k"), "k", "sk")
      d.orderBy("sk").as[(String, Long)].collect() shouldBe
        Array(("a", 1L), ("b", 2L), ("c", 3L))
    }
    it("auto-switches the global-window form to the dense builder above maxRows") {
      val big = spark.range(0, 5000)
        .select((($"id" * 48271L) % 99991L).as("k")).distinct()
      val guarded = Silver.dimWithSurrogateKey(big.toDF(), "k", "sk",
        maxRows = 1000L)
      // no single-partition Window stage anywhere in the guarded plan
      guarded.queryExecution.executedPlan.toString should not include "Window"
      // and the output is still the same dense 1..N keyed dim
      val window = Silver.dimWithSurrogateKey(big.toDF(), "k", "sk",
        maxRows = Long.MaxValue)
      guarded.select("k", "sk").except(window.select("k", "sk"))
        .count() shouldBe 0
      // under the bound the window form is untouched
      Silver.dimWithSurrogateKey(Seq("b", "a").toDF("k"), "k", "sk",
          maxRows = 1000L)
        .orderBy("sk").as[(String, Long)].collect() shouldBe
        Array(("a", 1L), ("b", 2L))
    }
    it("dense ids stay consistent across the count and output passes at volume") {
      // 200k rows in scrambled order: large enough that re-sampled
      // range boundaries would disagree between two evaluations (the
      // sf0.1 regression this guards), checked via the dense-1..N
      // invariant plus order-correctness on the extremes.
      val big = spark.range(0, 200000)
        .select((($"id" * 1103515245L + 12345L) % 1000003L).as("k"))
        .distinct()
      val dense = Silver.dimWithDenseKey(big.toDF(), "k", "sk", buckets = 16)
      val n = dense.count()
      dense.select(countDistinct($"sk")).as[Long].head() shouldBe n
      dense.agg(min($"sk"), max($"sk")).as[(Long, Long)].head() shouldBe
        ((1L, n))
      // global order: the row with the smallest key has sk 1, largest has sk n
      dense.orderBy($"k").select($"sk").as[Long].head() shouldBe 1L
      dense.orderBy($"k".desc).select($"sk").as[Long].head() shouldBe n
    }
    it("dense-key builder matches the global-window form exactly") {
      val cust = Tables.customer(spark, sf)
        .select($"c_custkey", $"c_name", $"c_nationkey")
      val dense = Silver.dimWithDenseKey(cust, "c_custkey", "sk",
        buckets = 7)
      val window = Silver.dimWithSurrogateKey(cust, "c_custkey", "sk")
      dense.count() shouldBe window.count()
      // same (natural key → surrogate) mapping, bit for bit
      dense.select("c_custkey", "sk")
        .except(window.select("c_custkey", "sk")).count() shouldBe 0
      // keys are dense 1..N
      dense.agg(min($"sk"), max($"sk"), count(lit(1)))
        .as[(Long, Long, Long)].head() match {
        case (lo, hi, n) => lo shouldBe 1L; hi shouldBe n
      }
    }
    it("builds the fact with conformed zones and no null measures") {
      val fact = Silver.buildFactEvents(Tables.events(spark, sf),
        Tables.customer(spark, sf), Tables.nation(spark, sf))
      fact.filter($"trips".isNull || $"origin_zone_id".isNull ||
        $"destination_zone_id".isNull).count() shouldBe 0
      fact.agg(max($"destination_zone_id")).as[Long].head() should be < 25L
      // period is always date-aligned to the hour
      fact.filter(minute($"period") =!= 0 || second($"period") =!= 0)
        .count() shouldBe 0
    }
  }

  describe("Profile") {
    it("summarize reports nulls/distincts/min/max per column") {
      val p = Profile.summarize(
        Seq((1, Some("a")), (2, None), (2, Some("b")))
          .toDF("i", "s"))
      val rows = p.collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toMap
      rows("i") shouldBe ((3L, 0L, 2L, "1", "2"))
      rows("s") shouldBe ((3L, 1L, 2L, "a", "b"))
    }
    it("summarize checkpoints a derived input instead of recomputing " +
        "it once per profiled column") {
      // r14 (ADVICE r13): a non-raw-scan input is localCheckpointed
      // up front, so the N+1 per-column passes read materialized
      // partitions — same answers, upstream plan runs ONCE
      val derived = Tables.orders(spark, sf)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), max($"o_totalprice").as("maxp"))
      val p = Profile.summarize(derived)
      // every leaf of the profile plan must be the checkpointed RDD —
      // no parquet relation left to recompute per column
      val leaves = p.queryExecution.optimizedPlan.collectLeaves()
      leaves should not be empty
      all(leaves.map(_.nodeName)) shouldBe "LogicalRDD"
      val rows = p.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      rows.keySet shouldBe Set("o_custkey", "n", "maxp")
      rows.values.toSet shouldBe Set(derived.count())
    }
    it("approx mode swaps exact distincts for HLL sketches within 5%") {
      val orders = Tables.orders(spark, sf)
      val exact = Profile.summarize(orders).collect()
        .map(r => r.getString(0) -> r.getLong(3)).toMap
      val approx = Profile.summarize(orders, exact = false).collect()
        .map(r => r.getString(0) -> r.getLong(3)).toMap
      approx.keySet shouldBe exact.keySet
      // HLL default rsd is 5%; individual columns can land ~2 sigma out
      exact.foreach { case (c, n) =>
        math.abs(approx(c) - n).toDouble / math.max(n, 1) should be <= 0.10
      }
    }
    it("describe lists the schema without running a job") {
      Profile.describe(Tables.orders(spark, sf))
        .as[(String, String, Boolean)].collect()
        .map(_._1) should contain("o_orderkey")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketed

/** Bucketed co-located joins (SURVEY §5's shuffle-elimination claim,
  * proven on physical plans).
  */
class BucketedSpec extends SparkSpec {
  import spark.implicits._

  private def withNoBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      f
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange ".r
      .findAllIn(df.queryExecution.executedPlan.toString).size

  describe("Bucketed") {
    val facts = (1L to 10000L).map(i => (i % 500, i, i * 0.5))
      .toDF("k", "id", "v")
    val dims = (0L until 500L).map(i => (i, s"name_$i")).toDF("k", "nm")
    Bucketed.writeBucketed(facts, "bspec_facts", "k", nBuckets = 8)
    Bucketed.writeBucketed(dims, "bspec_dims", "k", nBuckets = 8)

    it("joins two same-bucketed tables with ZERO exchange") {
      withNoBroadcast {
        val j = Bucketed.table(spark, "bspec_facts")
          .join(Bucketed.table(spark, "bspec_dims"), Seq("k"))
        exchanges(j) shouldBe 0
        j.count() shouldBe 10000
      }
    }
    it("aggregates on the bucket key with ZERO exchange") {
      val a = Bucketed.table(spark, "bspec_facts")
        .groupBy($"k").agg(sum($"v").as("s"))
      exchanges(a) shouldBe 0
      a.count() shouldBe 500
    }
    it("shuffles only the unbucketed side of a mixed join") {
      withNoBroadcast {
        val plain = (0L until 500L).map(i => (i, i * 2)).toDF("k", "w")
        val j = Bucketed.table(spark, "bspec_facts").join(plain, Seq("k"))
        exchanges(j) shouldBe 1 // the in-memory side only
        j.count() shouldBe 10000
      }
    }
    it("round-trips rows and bucket-sort order") {
      val back = Bucketed.table(spark, "bspec_facts")
      back.count() shouldBe 10000
      back.agg(sum($"v")).as[Double].head() shouldBe
        facts.agg(sum($"v")).as[Double].head()
    }
  }
}

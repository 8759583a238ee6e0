package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf).cache()
  private lazy val queries = emb.filter($"vec_id" < 8)

  describe("bruteForceTopK") {
    it("returns exactly k ranked neighbors per query, self excluded") {
      val r = Similarity.bruteForceTopK(emb, queries, "vec_id",
        "embedding", k = 5).cache()
      r.groupBy("query_id").count().select("count").as[Long]
        .collect().forall(_ == 5L) shouldBe true
      r.filter($"query_id" === $"cand_id").count() shouldBe 0
      r.filter($"cosine" > 1.0000001 || $"cosine" < -1.0000001)
        .count() shouldBe 0
      // ranks are 1..k and cosine is non-increasing in rank
      val byRank = r.filter($"query_id" === 0).orderBy("rank")
        .select("cosine").as[Double].collect()
      byRank.sliding(2).forall(p => p(0) >= p(1)) shouldBe true
    }
  }

  describe("cosineNearDup") {
    it("finds planted near-identical embeddings without all-pairs") {
      // plant: vec 9001 = vec 0 with a tiny perturbation
      val base = emb.filter($"vec_id" === 0)
        .select($"embedding").as[Seq[Float]].head()
      val planted = (base.map(x => x * 1.0001f), 9001L)
      val corpus = emb.select($"vec_id", $"embedding")
        .unionAll(Seq((planted._2, planted._1))
          .toDF("vec_id", "embedding")
          .select($"vec_id", $"embedding".cast("array<float>")))
      val pairs = Similarity.cosineNearDup(corpus, "vec_id", "embedding",
        threshold = 0.999, nlist = 8, nprobe = 2)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      pairs should contain((0L, 9001L))
    }
    it("recovers most of the brute-force pair set, never inventing pairs") {
      val exact = Similarity.bruteForceTopK(emb, emb, "vec_id",
        "embedding", k = 50)
        .filter($"cosine" >= 0.4)
        .select(least($"query_id", $"cand_id").as("a"),
          greatest($"query_id", $"cand_id").as("b"))
        .distinct().as[(Long, Long)].collect().toSet
      exact should not be empty // the threshold actually selects pairs
      val bucketed = Similarity.cosineNearDup(emb, "vec_id", "embedding",
        threshold = 0.4, nlist = 8, nprobe = 3)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      (bucketed -- exact) shouldBe empty // no false pairs
      val recall = (exact & bucketed).size.toDouble / exact.size
      recall should be >= 0.8
    }
  }

  describe("ivfTopK") {
    it("achieves high recall@10 against brute force") {
      val exact = Similarity.bruteForceTopK(emb, queries, "vec_id",
        "embedding", k = 10)
        .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
      val approx = Similarity.ivfTopK(emb, queries, "vec_id",
        "embedding", k = 10, nlist = 8, nprobe = 3)
        .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
      val recall = (exact & approx).size.toDouble / exact.size
      recall should be >= 0.7
    }
    it("probing all cells reproduces brute force exactly") {
      val exact = Similarity.bruteForceTopK(emb, queries, "vec_id",
        "embedding", k = 10)
        .select("query_id", "cand_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
      val all = Similarity.ivfTopK(emb, queries, "vec_id",
        "embedding", k = 10, nlist = 4, nprobe = 4)
        .select("query_id", "cand_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
      all shouldBe exact
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityModel

/** Trained quality classifier (SURVEY.md §2 H19): separable planted
  * corpora separate, scoring is the exact linear form, and the
  * real-corpus weak-label run behaves sanely.
  */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic synthetic corpus: "curated" docs are proper
    * sentences with stopwords; "junk" docs are punctuation-heavy
    * repeated-token spam.
    */
  private def corpus = {
    val curated = (0 until 80).map { i =>
      (i.toLong, s"the quick brown fox jumps over the lazy dog and " +
        s"then the fox rests near a quiet stream number $i", 1)
    }
    val junk = (0 until 80).map { i =>
      (1000L + i, ("spam" + i % 3 + "!!! ") * 12 + ">>>> $$$$ ####", 0)
    }
    (curated ++ junk).toDF("doc_id", "text", "label")
  }

  describe("QualityModel") {
    it("separates planted curated vs junk text almost perfectly") {
      val feat = QualityModel.featurize(corpus, "text")
      val m = QualityModel.train(feat, "label")
      val scored = QualityModel.score(corpus, "text", m)
        .select(col("label"), col("quality_prob"))
        .as[(Int, Double)].collect()
      val acc = scored.count { case (l, p) =>
        (p >= 0.5) == (l == 1) }.toDouble / scored.length
      acc should be >= 0.95
    }

    it("trainCanonical is bit-deterministic and separates like the " +
        "unbounded fit") {
      val feat = QualityModel.featurize(corpus, "text")
      // one sorted partition ⇒ one L-BFGS partial ⇒ identical weights
      // (cross-JVM/CPU-count equality is what pins the
      // text_quality_model oracle)
      val a = QualityModel.trainCanonical(feat, "label", "doc_id")
      val b = QualityModel.trainCanonical(feat, "label", "doc_id")
      a.weights shouldBe b.weights
      a.intercept shouldBe b.intercept
      val scored = QualityModel.score(corpus, "text", a)
        .select(col("label"), col("quality_prob"))
        .as[(Int, Double)].collect()
      val acc = scored.count { case (l, p) =>
        (p >= 0.5) == (l == 1) }.toDouble / scored.length
      acc should be >= 0.95
    }

    it("probability is the exact linear-sigmoid form of the features") {
      val m = QualityModel.Model(
        Seq(0.5, -0.25, 2.0, -1.0, 0.0, 3.0, -0.5), intercept = 0.1)
      val row = QualityModel.score(corpus.limit(1), "text", m)
        .select((QualityModel.featureNames.map(col) :+
          col("quality_prob")): _*)
        .head()
      val fs = QualityModel.featureNames.indices.map(row.getDouble)
      val z = 0.1 + fs.zip(m.weights).map { case (f, w) => f * w }.sum
      row.getDouble(fs.length) shouldBe
        (1.0 / (1.0 + math.exp(-z))) +- 1e-12
    }

    it("scoring plan carries no UDF and no MLlib stage") {
      val m = QualityModel.Model(Seq.fill(7)(0.1), 0.0)
      val plan = QualityModel.score(corpus, "text", m)
        .queryExecution.executedPlan.toString
      plan should not include "BatchEvalPython"
      plan should not include "MapPartitions"
    }

    it("weak-label training on the real corpus ranks quality sanely") {
      val docs = graft.sources.Tables.documents(spark, sf)
      // weak label: the fixed-weight heuristic's top half
      val labeled = docs.withColumn("label",
        (graft.functions.TextFns.qualityScore(col("text")) >= 0.55)
          .cast("int"))
      val m = QualityModel.train(
        QualityModel.featurize(labeled, "text"), "label")
      val scored = QualityModel.score(labeled, "text", m)
        .select(col("label"), col("quality_prob"))
        .as[(Int, Double)].collect()
      // the learned model must broadly agree with its weak teacher
      val acc = scored.count { case (l, p) =>
        (p >= 0.5) == (l == 1) }.toDouble / scored.length
      acc should be >= 0.8
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.LangIdModel

/** Trained language ID (E7 model tier): held-out separation on
  * planted multilingual corpora, kernel/feature contracts, and the
  * heuristic-complement behavior.
  */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private val langs = LangIdModel.vocab.keys.toSeq.sorted

  describe("LangIdModel") {
    it("separates planted languages at >= 0.95 held-out accuracy") {
      // disjoint seeds => train and test draw different documents
      val train = LangIdModel.syntheticCorpus(spark, perLang = 80,
        seed = 42L)
      val test = LangIdModel.syntheticCorpus(spark, perLang = 20,
        seed = 777L)
      val m = LangIdModel.train(train, "text", "lang", langs)
      val scored = LangIdModel.score(test, "text", m)
      val acc = scored.filter(col("lang_model") === col("lang"))
        .count().toDouble / scored.count()
      acc should be >= 0.95
    }

    it("trainCanonical is bit-deterministic and separates like the " +
        "unbounded fit") {
      val train = LangIdModel.syntheticCorpus(spark, perLang = 80,
        seed = 42L)
      val test = LangIdModel.syntheticCorpus(spark, perLang = 20,
        seed = 777L)
      val a = LangIdModel.trainCanonical(train, "text", "lang",
        "doc_id", langs)
      val b = LangIdModel.trainCanonical(train, "text", "lang",
        "doc_id", langs)
      a.weights shouldBe b.weights // one L-BFGS partial ⇒ bit-equal
      val scored = LangIdModel.score(test, "text", a)
      val acc = scored.filter(col("lang_model") === col("lang"))
        .count().toDouble / scored.count()
      acc should be >= 0.95
    }

    it("classifies the multi-byte script (zh) correctly — the byte-" +
        "n-gram path") {
      val train = LangIdModel.syntheticCorpus(spark, perLang = 80,
        seed = 42L)
      val m = LangIdModel.train(train, "text", "lang", langs)
      val zh = LangIdModel.syntheticCorpus(spark, perLang = 10,
        seed = 1234L).filter(col("lang") === "zh")
      val scored = LangIdModel.score(zh, "text", m)
      scored.filter(col("lang_model") === "zh").count() shouldBe
        scored.count()
    }

    it("scoring is a plan-literal kernel pass: no join, no exchange, " +
        "no UDF") {
      val m = LangIdModel.Model(langs, 3, 256,
        Seq.fill(langs.length * 257)(0.1))
      val plan = LangIdModel.score(
        LangIdModel.syntheticCorpus(spark, perLang = 2), "text", m)
        .queryExecution.executedPlan.toString
      plan should not include "Exchange"
      plan should not include "Join"
      (plan should not).include("BatchEvalPython")
    }

    it("charGramFreq is a normalized histogram, empty-safe") {
      val r = spark.sql(
        "SELECT 'abcd' AS t UNION ALL SELECT '' UNION ALL SELECT 'ab'")
        .select(graft.expressions.NativeKernels
          .charGramFreqCol(col("t"), 3, 16).as("h"))
        .as[Seq[Double]].collect()
      r.foreach(_.length shouldBe 16)
      // 'abcd' has two trigrams -> frequencies sum to 1
      r.map(_.sum).sorted shouldBe Seq(0.0, 0.0, 1.0)
      // too-short and empty inputs yield the zero histogram
    }

    it("denseArgmax picks the max class, ties to the lower index") {
      import graft.expressions.NativeKernels
      val df = Seq(Seq(1.0, 0.0)).toDF("x")
      // class 0: w=[1,0], b=0 -> z=1; class 1: w=[0,1], b=0 -> z=0
      val w1 = Seq(1.0, 0.0, 0.0, 0.0, 1.0, 0.0)
      df.select(NativeKernels.denseArgmaxCol(col("x"),
        typedLit(w1), 2)).as[Int].head() shouldBe 0
      // tie (both z=1) -> class 0
      val w2 = Seq(1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
      df.select(NativeKernels.denseArgmaxCol(col("x"),
        typedLit(w2), 2)).as[Int].head() shouldBe 0
      // class 1 wins on intercept
      val w3 = Seq(1.0, 0.0, 0.0, 0.0, 0.0, 2.0)
      df.select(NativeKernels.denseArgmaxCol(col("x"),
        typedLit(w3), 2)).as[Int].head() shouldBe 1
    }

    it("the synthetic corpus is deterministic in its seed") {
      val a = LangIdModel.syntheticCorpus(spark, perLang = 5, seed = 9L)
        .orderBy("doc_id").as[(Long, String, String)].collect().toSeq
      val b = LangIdModel.syntheticCorpus(spark, perLang = 5, seed = 9L)
        .orderBy("doc_id").as[(Long, String, String)].collect().toSeq
      a shouldBe b
      a.map(_._2).distinct.sorted shouldBe langs
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.expressions.NativeKernels
import graft.functions.{TextFns, VectorFns}
import graft.operators.{Dedup, MinHashLsh, SimHash}
import graft.sources.Tables

/** Native kernels must be bit-identical to their declarative
  * reference forms on real data.
  */
class NativeKernelSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf).cache()

  describe("simHash64 native vs reference") {
    it("agrees on every document") {
      val d = docs.select(
        SimHash.simHash64(TextFns.tokens($"text")).as("n"),
        SimHash.simHash64Reference(TextFns.tokens($"text")).as("r"))
      d.filter($"n" =!= $"r").count() shouldBe 0
    }
    it("handles empty token arrays") {
      Seq("").toDF("t")
        .select(SimHash.simHash64(TextFns.tokens($"t"))).as[Long]
        .head() shouldBe 0L
    }
  }

  describe("minHashSignature native vs reference") {
    it("agrees on every document") {
      val d = docs.select(
        MinHashLsh.signature(Dedup.shingles($"text", 3), 64).as("n"),
        MinHashLsh.signatureReference(Dedup.shingles($"text", 3), 64)
          .as("r"))
      d.filter(to_json($"n") =!= to_json($"r")).count() shouldBe 0
    }
  }

  describe("wordShingles native vs reference") {
    it("agrees on every document, including order") {
      val d = docs.select(
        to_json(Dedup.shingles($"text", 3)).as("n"),
        to_json(Dedup.shinglesReference($"text", 3)).as("r"))
      d.filter($"n" =!= $"r").count() shouldBe 0
    }
    it("handles short docs and repeated spaces like the reference") {
      val cases = Seq("a b", "a  b c", "x y z w", "")
      val d = cases.toDF("text").select(
        to_json(Dedup.shingles($"text", 3)).as("n"),
        to_json(Dedup.shinglesReference($"text", 3)).as("r"))
      d.collect().foreach(r => r.getString(0) shouldBe r.getString(1))
    }
  }

  describe("dotFloat native vs reference") {
    it("is bit-identical on real embeddings (same addition order)") {
      val e = Tables.embeddings(spark, sf)
      val d = e.select(
        VectorFns.dot($"embedding", $"embedding").as("n"),
        VectorFns.dotReference($"embedding", $"embedding").as("r"))
      // exact FP equality, not approximate
      d.filter($"n" =!= $"r").count() shouldBe 0
    }
  }

  describe("codegen integration") {
    it("kernels appear as static_invoke, not interpreted folds") {
      val plan = docs.select(
        SimHash.simHash64(TextFns.tokens($"text")).as("fp"))
        .queryExecution.executedPlan.toString
      plan should include("static_invoke")
      plan should not include "aggregate(" // the HOF fold is gone
    }
    it("dot kernel stays inside a WholeStageCodegen span") {
      // no HOF in the inputs → the whole projection codegens
      val plan = Tables.embeddings(spark, sf)
        .select(VectorFns.dot($"embedding", $"embedding").as("d"))
        .queryExecution.executedPlan.toString
      plan should include("static_invoke")
      plan should include("*(1)") // WholeStageCodegen stage marker
    }
  }
}

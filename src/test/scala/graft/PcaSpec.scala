package graft

import org.apache.spark.sql.functions._
import graft.operators.Pca

/** PCA over embeddings (SURVEY.md §2 E13): known-axis recovery,
  * orthonormality, variance ordering, lossless k=d reconstruction,
  * kernel-vs-driver projection parity, determinism.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic synthetic cloud: points near the direction
    * (3,4,0)/5 in 3-D with small structured residuals.
    */
  private def cloud = (0 until 200).map { i =>
    val t = (i - 100) / 10.0
    val noise = math.sin(i * 1.7) * 0.05
    (i.toLong, Seq((3.0 / 5 * t + noise).toFloat,
      (4.0 / 5 * t - noise).toFloat,
      (math.cos(i * 0.9) * 0.02).toFloat))
  }.toDF("id", "v")

  private def driverProject(v: Seq[Float], m: Pca.Model): Seq[Float] =
    m.components.toSeq.map { c =>
      c.indices.map(i => (v(i) - m.mean(i)) * c(i)).sum.toFloat
    }

  describe("Pca.fit") {
    it("recovers a planted principal axis") {
      val m = Pca.fit(cloud, "v", k = 1)
      val axis = m.components(0)
      math.abs(axis(0) * 0.6 + axis(1) * 0.8) shouldBe 1.0 +- 0.01
      math.abs(axis(2)) should be < 0.05
    }

    it("components are orthonormal and variances descend") {
      val m = Pca.fit(cloud, "v", k = 3)
      for (i <- 0 until 3; j <- 0 until 3) {
        val dot = (0 until 3).map(r =>
          m.components(i)(r) * m.components(j)(r)).sum
        if (i == j) dot shouldBe 1.0 +- 1e-9
        else dot shouldBe 0.0 +- 1e-9
      }
      m.variance(0) should be >= m.variance(1)
      m.variance(1) should be >= m.variance(2)
    }

    it("k = d preserves pairwise distances (rigid rotation)") {
      val m = Pca.fit(cloud, "v", k = 3)
      val rows = cloud.orderBy("id").as[(Long, Seq[Float])]
        .collect().take(10)
      def d2(a: Seq[Float], b: Seq[Float]) =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum.toDouble
      val proj = rows.map { case (_, v) => driverProject(v, m) }
      for (i <- proj.indices; j <- i + 1 until proj.length)
        d2(proj(i), proj(j)) shouldBe
          d2(rows(i)._2, rows(j)._2) +- 1e-3
    }

    it("is stable across fits: signs canonical, components to 1e-6 " +
        "(double addition order is the one distributed nondeterminism)") {
      val a = Pca.fit(cloud, "v", 2)
      val b = Pca.fit(cloud, "v", 2)
      a.mean.zip(b.mean).foreach { case (x, y) =>
        x shouldBe y +- 1e-9 }
      a.components.zip(b.components).foreach { case (ca, cb) =>
        ca.zip(cb).foreach { case (x, y) => x shouldBe y +- 1e-6 }
      }
    }
  }

  describe("Pca.project kernel") {
    it("matches the driver-side projection exactly") {
      val m = Pca.fit(cloud, "v", k = 2)
      val got = Pca.transform(cloud, "v", m)
        .orderBy("id").as[(Long, Seq[Float])].collect().take(20)
      val want = cloud.orderBy("id").as[(Long, Seq[Float])]
        .collect().take(20)
        .map { case (id, v) => (id, driverProject(v, m)) }
      got.map(_._2).toSeq shouldBe want.map(_._2).toSeq
    }

    it("fitCanonical is bit-deterministic and equals the full fit " +
        "below the cap") {
      val emb = graft.sources.Tables.embeddings(spark, sf)
      // bit-determinism: two fits agree EXACTLY — the canonical feed
      // is one sorted partition, so the Gram pass has one partial and
      // a fixed double-addition order (cross-JVM/CPU-count equality
      // is verified in the pinned emb_pca_project oracle)
      val a = Pca.fitCanonical(emb, "vec_id", "embedding", k = 4)
      val b = Pca.fitCanonical(emb, "vec_id", "embedding", k = 4)
      a.mean.toSeq shouldBe b.mean.toSeq
      a.components.map(_.toSeq).toSeq shouldBe
        b.components.map(_.toSeq).toSeq
      // below the cap the sample IS the corpus: same model as the
      // unbounded fit up to the reduction-order ulps (1e-6, the
      // fit-stability contract)
      val full = Pca.fit(emb, "embedding", k = 4)
      a.mean.zip(full.mean).foreach { case (x, y) =>
        x shouldBe y +- 1e-6 }
      a.components.zip(full.components).foreach { case (ca, cb) =>
        ca.zip(cb).foreach { case (x, y) => x shouldBe y +- 1e-6 }
      }
    }

    it("reduces the real embeddings table to k dims") {
      val emb = graft.sources.Tables.embeddings(spark, sf)
      val m = Pca.fit(emb, "embedding", k = 16)
      m.d shouldBe 64
      val out = Pca.transform(emb, "embedding", m)
      out.select(org.apache.spark.sql.functions.size(col("embedding")))
        .distinct()
        .as[Int].collect().toSeq shouldBe Seq(16)
      // top-16 axes of a 64-dim cloud explain a positive variance
      m.variance.foreach(v => v should be >= 0.0)
    }
  }
}

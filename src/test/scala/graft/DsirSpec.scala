package graft

import org.apache.spark.sql.functions._
import graft.expressions.NativeKernels
import graft.functions.TextFns
import graft.operators.Dsir
import graft.sources.Tables

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // Planted distribution shift: the target corpus is about one topic;
  // the raw pool mixes on-topic docs with unrelated ones.
  private lazy val target = (0L until 40L).map(i =>
      (i, s"quantum flux capacitor alignment report number $i"))
    .toDF("doc_id", "text")
  private lazy val raw = ((100L until 140L).map(i =>
      (i, s"quantum flux capacitor maintenance log entry $i")) ++
    (200L until 240L).map(i =>
      (i, s"grocery list apples bananas cucumbers dill eggs $i")))
    .toDF("doc_id", "text")

  /** Driver-side reference of the portable gram-bucket hash (the same
    * pair-polynomial convention the DuckDB oracles replay).
    */
  private def refBucket(gram: String, buckets: Int): Int = {
    var h1 = 0L; var h2 = 0L
    gram.getBytes("UTF-8").foreach { b =>
      val c = b & 0xff
      if (c >= 0x20 && c <= 0x7e) {
        h1 = (h1 * 131 + c) % 1000000007L
        h2 = (h2 * 137 + c) % 998244353L
      }
    }
    (((h1 << 30) | h2) % buckets).toInt
  }

  private def refFeatures(text: String, buckets: Int): Seq[Int] = {
    val w = text.split(" ").filter(_.nonEmpty)
    w.map(refBucket(_, buckets)).toSeq ++
      w.sliding(2).filter(_.length == 2)
        .map(p => refBucket(p.mkString(" "), buckets))
  }

  describe("dsirBuckets kernel") {
    it("matches the driver-side pair-poly reference on real docs") {
      val docs = Tables.documents(spark, sf).limit(50)
        .select($"doc_id", $"text",
          NativeKernels.dsirBucketsCol(TextFns.tokens($"text"), 1024)
            .as("b"))
        .as[(Long, String, Seq[Int])].collect()
      docs.foreach { case (_, text, got) =>
        got shouldBe refFeatures(text, 1024)
      }
    }
    it("emits 2n-1 features, unicode filtered like the oracle") {
      val r = Seq((1L, "héllo wörld plain"))
        .toDF("doc_id", "text")
        .select(NativeKernels.dsirBucketsCol(
          TextFns.tokens($"text"), 64)).as[Seq[Int]].head()
      r.length shouldBe 5 // 3 unigrams + 2 bigrams
      r shouldBe refFeatures("héllo wörld plain", 64)
    }
  }

  describe("fit + score") {
    it("ranks on-topic raw docs above unrelated ones") {
      val m = Dsir.fit(target, raw, "text", buckets = 1024)
      val s = Dsir.score(raw, "doc_id", "text", m)
        .as[(Long, Double)].collect().toMap
      val onTopic = (100L until 140L).map(s).sum / 40
      val offTopic = (200L until 240L).map(s).sum / 40
      onTopic should be > offTopic
      // and every single on-topic doc outranks every off-topic doc
      (100L until 140L).map(s).min should be >
        (200L until 240L).map(s).max
    }
    it("kernel score equals the literal-table dot of reference features") {
      val m = Dsir.fit(target, raw, "text", buckets = 256)
      val s = Dsir.score(raw, "doc_id", "text", m)
        .as[(Long, Double)].collect().toMap
      raw.as[(Long, String)].collect().foreach { case (id, text) =>
        val want = refFeatures(text, 256).map(m.logRatio).sum
        s(id) shouldBe want +- math.abs(want) * 1e-12
      }
    }
  }

  describe("countSums") {
    it("matches the explicit posting-join formulation on real docs") {
      val docs = Tables.documents(spark, sf)
      val tgt = docs.filter(pmod($"doc_id", lit(10)) === 0)
      val rw = docs.filter(pmod($"doc_id", lit(10)) =!= 0)
      val m = Dsir.fit(tgt, rw, "text", buckets = 512)
      val got = Dsir.countSums(rw, "doc_id", "text", m)
        .as[(Long, Long, Long, Long)].collect()
        .map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
      // reference: explode features, join the count tables
      val feats = rw.select($"doc_id",
        explode(NativeKernels.dsirBucketsCol(
          TextFns.tokens($"text"), 512)).as("bucket"))
      val tCnt = Dsir.featureCounts(tgt, "text", 512)
        .withColumnRenamed("cnt", "tc")
      val rCnt = Dsir.featureCounts(rw, "text", 512)
        .withColumnRenamed("cnt", "rc")
      val want = feats
        .join(tCnt, Seq("bucket"), "left").join(rCnt, Seq("bucket"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_features"),
          sum(coalesce($"tc", lit(0L))).as("sum_target"),
          sum(coalesce($"rc", lit(0L))).as("sum_raw"))
        .as[(Long, Long, Long, Long)].collect()
        .map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
      want.foreach { case (id, t) => got(id) shouldBe t }
      got.size shouldBe rw.count()
    }
    it("handles empty and whitespace-only documents") {
      val df = Seq((1L, ""), (2L, "   "), (3L, "one"))
        .toDF("doc_id", "text")
      val m = Dsir.fit(df, df, "text", buckets = 64)
      val r = Dsir.countSums(df, "doc_id", "text", m)
        .as[(Long, Long, Long, Long)].collect()
        .map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
      r(1L)._1 shouldBe 0L
      r(2L)._1 shouldBe 0L
      r(3L)._1 shouldBe 1L
      Dsir.score(df, "doc_id", "text", m)
        .filter($"doc_id" < 3).select($"dsir_score")
        .as[Double].collect().foreach(_ shouldBe 0.0)
    }
  }

  describe("merge (incremental fit)") {
    it("slice fits merge into exactly the whole-corpus fit") {
      val (t1, t2) = (target.filter($"doc_id" % 2 === 0),
        target.filter($"doc_id" % 2 =!= 0))
      val (r1, r2) = (raw.filter($"doc_id" % 2 === 0),
        raw.filter($"doc_id" % 2 =!= 0))
      val merged = Dsir.merge(Dsir.fit(t1, r1, "text", buckets = 512),
        Dsir.fit(t2, r2, "text", buckets = 512))
      val whole = Dsir.fit(target, raw, "text", buckets = 512)
      merged.targetCounts.toSeq shouldBe whole.targetCounts.toSeq
      merged.rawCounts.toSeq shouldBe whole.rawCounts.toSeq
      merged.targetTotal shouldBe whole.targetTotal
      merged.rawTotal shouldBe whole.rawTotal
      merged.logRatio.toSeq shouldBe whole.logRatio.toSeq // bit-equal
    }
    it("refuses geometry mismatches loudly") {
      an[IllegalArgumentException] should be thrownBy
        Dsir.merge(Dsir.fit(target, raw, "text", buckets = 256),
          Dsir.fit(target, raw, "text", buckets = 512))
    }
  }

  describe("streaming composition") {
    it("scores a document stream map-side, matching batch bit-for-bit") {
      implicit val sqlCtx = spark.sqlContext
      val m = Dsir.fit(target, raw, "text", buckets = 512)
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)]
      val q = Dsir.score(in.toDF().toDF("doc_id", "text"),
          "doc_id", "text", m)
        .writeStream.format("memory").queryName("dsir_stream")
        .outputMode("append").start()
      try {
        val batch = Seq(
          (100L, "quantum flux capacitor maintenance log entry 1"),
          (200L, "grocery list apples bananas cucumbers dill eggs 2"))
        in.addData(batch: _*)
        q.processAllAvailable()
        val got = spark.table("dsir_stream")
          .as[(Long, Double)].collect().toMap
        val want = Dsir.score(batch.toDF("doc_id", "text"),
          "doc_id", "text", m).as[(Long, Double)].collect().toMap
        got shouldBe want // literal-weights scoring is stateless
      } finally q.stop()
    }
  }

  describe("resample") {
    it("temperature 0 is the deterministic top-k by score") {
      val m = Dsir.fit(target, raw, "text", buckets = 1024)
      val picked = Dsir.resample(raw, "doc_id", "text", m, k = 40)
        .select($"doc_id").as[Long].collect().toSet
      picked shouldBe (100L until 140L).toSet // exactly the on-topic half
    }
    it("Gumbel sampling is seed-deterministic and seed-sensitive") {
      val m = Dsir.fit(target, raw, "text", buckets = 1024)
      def pick(seed: Long) = Dsir.resample(raw, "doc_id", "text", m,
          k = 20, temperature = 5.0, seed = seed)
        .select($"doc_id").as[Long].collect().toSet
      pick(1L) shouldBe pick(1L)
      // high temperature randomizes: some seed in a small pool must
      // disagree with seed 1 (all-equal would mean the noise is dead)
      Seq(2L, 3L, 4L, 5L).exists(s => pick(s) != pick(1L)) shouldBe true
    }
  }
}

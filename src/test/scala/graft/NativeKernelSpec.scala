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

  describe("minHashFromHashes vs string-shingle signature") {
    it("is bit-identical on every document (hash array stands in for strings)") {
      val d = docs.select(
        MinHashLsh.signatureFromHashes(
          sort_array(Dedup.shingleHashes($"text", 3)), 64).as("n"),
        MinHashLsh.signature(Dedup.shingles($"text", 3), 64).as("r"))
      d.filter(to_json($"n") =!= to_json($"r")).count() shouldBe 0
    }
    it("yields the sentinel signature for empty hash sets") {
      Seq(Seq.empty[Long]).toDF("h")
        .select(MinHashLsh.signatureFromHashes($"h", 4).as("s"))
        .select(to_json($"s")).as[String].head() shouldBe
        s"[${Seq.fill(4)((1L << 31) - 1).mkString(",")}]"
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

  describe("randomized parity sweep (seeded fuzz, all text kernels)") {
    it("native == reference on 300 adversarial random strings") {
      val rnd = new scala.util.Random(42)
      val alphabets = Seq(
        " abthe", // dense spaces + marker fragments
        " the a and le la et el los y der die und 的 了 是 of to",
        "ab \t\n.,!?;:@01", // controls + punct + digits
        "é中ü~ -",
        " ")
      val cases = (0 until 300).map { _ =>
        val ab = alphabets(rnd.nextInt(alphabets.length))
        val n = rnd.nextInt(80)
        (0 until n).map(_ => ab(rnd.nextInt(ab.length))).mkString
      } :+ "" :+ "the" :+ "  "
      val df = cases.toDF("text")
      val mism = df.filter(
        TextFns.kernelWords.map(w =>
          TextFns.tokenOccurrences($"text", w) =!=
            TextFns.tokenOccurrencesReference($"text", w))
          .reduce(_ || _) ||
        TextFns.wordCount($"text") =!= TextFns.wordCountReference($"text") ||
        TextFns.fingerprint($"text") =!=
          TextFns.fingerprintReference($"text") ||
        to_json(Dedup.shingleHashes($"text", 3)) =!=
          to_json(transform(Dedup.shinglesReference($"text", 3),
            s => xxhash64(s))) ||
        SimHash.simHash64(TextFns.tokens($"text")) =!=
          SimHash.simHash64Reference(TextFns.tokens($"text")))
      mism.count() shouldBe 0
    }
  }

  describe("wordShingleHashes native vs xxhash64 of string shingles") {
    it("agrees on every document, including order") {
      val d = docs.select(
        to_json(Dedup.shingleHashes($"text", 3)).as("n"),
        to_json(transform(Dedup.shingles($"text", 3), s => xxhash64(s)))
          .as("r"))
      d.filter($"n" =!= $"r").count() shouldBe 0
    }
  }

  describe("fuzzyPairs native vs block-join levenshtein reference") {
    it("agrees on customer names (pairs and distances)") {
      import graft.operators.Dedup
      val cust = Tables.customer(spark, sf)
      val n = Dedup.fuzzyMatches(cust, "c_custkey", "c_name",
        nm => substring(nm, 10, 6), maxDist = 1)
      val r = Dedup.fuzzyMatchesReference(cust, "c_custkey", "c_name",
        nm => substring(nm, 10, 6), maxDist = 1)
      n.count() shouldBe r.count()
      n.exceptAll(r).count() shouldBe 0
    }
    it("agrees on adversarial unicode names across thresholds") {
      import graft.operators.Dedup
      val names = Seq("ab", "abc", "abd", "bbc", "", "a", "ábc", "ábd",
        "xyzzy", "xyzzyx", "中文名", "中文明")
        .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val df = names.toDF("id", "nm")
      for (k <- Seq(0, 1, 2)) {
        val n = Dedup.fuzzyMatches(df, "id", "nm", _ => lit("x"), k)
        val r = Dedup.fuzzyMatchesReference(df, "id", "nm", _ => lit("x"), k)
        n.exceptAll(r).unionAll(r.exceptAll(n)).count() shouldBe 0
      }
    }
    it("refuses an over-wide block IN the plan, naming the block key") {
      import graft.operators.Dedup
      val df = (0L until 10L).map(i => (i, s"name$i")).toDF("id", "nm")
      // every row lands in one block 'hot' of width 10 > maxBlock=4
      val ex = intercept[Exception] {
        Dedup.fuzzyMatches(df, "id", "nm", _ => lit("hot"),
          maxDist = 1, maxBlock = 4).collect()
      }
      val msg = Option(ex.getMessage).getOrElse("") +
        Option(ex.getCause).map(_.getMessage).getOrElse("")
      msg should include("hot")
      msg should include("maxBlock")
      // and a bound the data respects changes nothing
      Dedup.fuzzyMatches(df, "id", "nm", _ => lit("hot"),
          maxDist = 1, maxBlock = 10).count() shouldBe
        Dedup.fuzzyMatches(df, "id", "nm", _ => lit("hot"),
          maxDist = 1).count()
    }
  }

  describe("BoundedCollectLong aggregate") {
    it("keeps groups at the cap, empties groups beyond it, " +
        "across partitions") {
      import graft.expressions.BoundedCollect.boundedCollectLong
      // groups: k=0 has 34 elements, k=1 and k=2 have 33 each; spread
      // over 8 partitions so map-side partials MERGE (serde + merge
      // paths both execute)
      val df = spark.range(100)
        .select((col("id") % 3).as("k"), col("id")).repartition(8)
      val sizes = df.groupBy("k")
        .agg(boundedCollectLong(col("id"), 33).as("v"))
        .select(col("k"),
          org.apache.spark.sql.functions.size(col("v")).as("n"))
        .as[(Long, Int)].collect().toMap
      sizes(0L) shouldBe 0 // 34 > cap → deterministic empty, not OOM
      sizes(1L) shouldBe 33
      sizes(2L) shouldBe 33
      // under the cap the collection is EXACT (no sampling)
      val kept = df.groupBy("k")
        .agg(boundedCollectLong(col("id"), 34).as("v"))
        .select(explode(col("v"))).as[Long].collect().toSet
      kept shouldBe (0L until 100L).toSet
    }
  }

  describe("tokenCounts native vs reference") {
    it("agrees with per-word HOF counts and wordCount on every document") {
      val checks = TextFns.kernelWords.map(w =>
        (TextFns.tokenOccurrences($"text", w) =!=
          TextFns.tokenOccurrencesReference($"text", w)).as(s"d_$w")) :+
        (TextFns.wordCount($"text") =!=
          TextFns.wordCountReference($"text")).as("d_n")
      docs.filter(checks.reduce(_ || _)).count() shouldBe 0
    }
    it("handles repeated/leading/trailing spaces, unicode and empties") {
      val cases = Seq("", " ", "the", " the  the ", "a the and the a",
        "的 了 是", "thé the", "the\tthe", "  ")
      val d = cases.toDF("text")
      val checks = TextFns.kernelWords.map(w =>
        (TextFns.tokenOccurrences($"text", w) =!=
          TextFns.tokenOccurrencesReference($"text", w))) :+
        (TextFns.wordCount($"text") =!= TextFns.wordCountReference($"text"))
      d.filter(checks.reduce(_ || _)).count() shouldBe 0
    }
    it("falls back for non-marker words") {
      Seq("zebra the zebra").toDF("text")
        .select(TextFns.tokenOccurrences($"text", "zebra")).as[Int]
        .head() shouldBe 2
    }
  }

  describe("wordStats native vs declarative reference") {
    import org.apache.spark.sql.{functions => F}
    import org.apache.spark.sql.Column
    def refCols: (Column, Column, Column) = {
      val toks = F.filter(F.split($"text", " "),
        t => F.length(t) > 0)
      val uniq = F.array_distinct(toks)
      (F.size(toks),
        F.size(uniq),
        F.coalesce(F.array_max(F.transform(uniq,
          w => F.size(F.filter(toks, x => x === w)))), F.lit(0)))
    }
    it("agrees on every document") {
      val (rn, rd, rt) = refCols
      val st = NativeKernels.wordStatsCol($"text")
      docs.filter(element_at(st, 1) =!= rn ||
          element_at(st, 2) =!= rd ||
          element_at(st, 3) =!= rt)
        .count() shouldBe 0
    }
    it("handles empties, repeated spaces and full repetition") {
      val cases = Seq("", " ", "a a a a", "a b c", "x  x y", "the")
      val (rn, rd, rt) = refCols
      val st = NativeKernels.wordStatsCol($"text")
      val d = cases.toDF("text").select(
        element_at(st, 1).as("n"), element_at(st, 2).as("d"),
        element_at(st, 3).as("t"), rn.as("rn"), rd.as("rd"), rt.as("rt"))
      d.collect().foreach { r =>
        (r.getInt(0), r.getInt(1), r.getInt(2)) shouldBe
          ((r.getInt(3), r.getInt(4), r.getInt(5)))
      }
    }
  }

  describe("fingerprint64 native vs reference") {
    it("agrees on every document") {
      docs.filter(TextFns.fingerprint($"text") =!=
          TextFns.fingerprintReference($"text")).count() shouldBe 0
    }
    it("handles unicode, control chars and empties like the regex form") {
      val cases = Seq("", "abc", "a\tb\nc", "é中ab~ ", "x",
        " -~", "ü")
      cases.toDF("text").filter(TextFns.fingerprint($"text") =!=
          TextFns.fingerprintReference($"text")).count() shouldBe 0
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

  describe("dotFloat null semantics match the zip_with reference") {
    it("returns null on length mismatch and null elements") {
      val rows = Seq(
        (Array(1.0f, 2.0f), Array(3.0f)),             // length mismatch
        (Array(1.0f, 2.0f), Array(3.0f, 4.0f))        // clean
      ).toDF("a", "b")
        .union(Seq(("x")).toDF("x").select(
          array(lit(1.0f), lit(null.asInstanceOf[Float])).as("a"),
          array(lit(2.0f), lit(3.0f)).as("b")))
      val d = rows.select(
        VectorFns.dot($"a", $"b").as("n"),
        VectorFns.dotReference($"a", $"b").as("r")).collect()
      d.foreach { r =>
        r.isNullAt(0) shouldBe r.isNullAt(1)
        if (!r.isNullAt(0)) r.getDouble(0) shouldBe r.getDouble(1)
      }
    }
  }

  describe("nearestCells native vs declarative sqDist ordering") {
    it("matches a per-row argmin over the same centroid fold") {
      val cents: Seq[Seq[Double]] =
        Seq(Seq(0.0, 0.0), Seq(1.0, 1.0), Seq(-1.0, 2.0), Seq(3.0, 0.5))
      val vecs = Seq(
        Array(0.1f, 0.2f), Array(0.9f, 1.1f), Array(-0.5f, 1.5f),
        Array(2.0f, 0.0f), Array(0.5f, 0.5f))
      val got = vecs.toDF("v").select(
        NativeKernels.nearestCellsCol($"v", typedLit(cents), lit(2))
          .as("cells")).as[Seq[Int]].collect()
      val want = vecs.map { v =>
        cents.zipWithIndex.map { case (c, i) =>
          val d2 = v.zip(c).foldLeft(0.0) { case (acc, (a, b)) =>
            acc + (a.toDouble - b) * (a.toDouble - b) }
          (d2, i)
        }.sortBy(identity).take(2).map(_._2)
      }
      got.toSeq.map(_.toList) shouldBe want.map(_.toList)
    }
    it("breaks exact distance ties by lower cell id") {
      val cents: Seq[Seq[Double]] = Seq(Seq(1.0, 0.0), Seq(-1.0, 0.0))
      val got = Seq(Array(0.0f, 0.0f)).toDF("v").select(
        NativeKernels.nearestCellsCol($"v", typedLit(cents), lit(1)))
        .as[Seq[Int]].head()
      got shouldBe Seq(0)
    }
  }

  describe("mortonValue") {
    it("interleaves bits like a per-bit reference loop") {
      def ref(a: Long, b: Long): Long = {
        var z = 0L
        for (i <- 0 until 31)
          z |= (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
        z
      }
      val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1023L, 511L),
        ((1L << 31) - 1, (1L << 31) - 1), (123456789L, 987654321L))
      val got = cases.toDF("a", "b")
        .select(NativeKernels.mortonValueCol($"a", $"b")).as[Long].collect()
      got.toSeq shouldBe cases.map { case (a, b) => ref(a, b) }
      // full 31-bit domain stays non-negative → signed-long sort order
      // equals unsigned Z-order
      all(got.toSeq) should be >= 0L
    }
    it("ENFORCES the [0, 2^31) domain instead of interleaving garbage") {
      def morton(a: Long, b: Long) =
        Seq((a, b)).toDF("a", "b")
          .select(NativeKernels.mortonValueCol($"a", $"b")).as[Long].head()
      a[Throwable] should be thrownBy morton(-1L, 0L)
      a[Throwable] should be thrownBy morton(0L, 1L << 31)
      noException should be thrownBy morton((1L << 31) - 1, 0L)
    }
  }

  describe("idPairsWithCard") {
    it("emits ordered pairs with carried cardinalities, length-filtered") {
      val got = Seq((Seq(30L, 10L, 20L), Seq(4L, 8L, 5L))).toDF("ids", "ns")
        .select(explode(NativeKernels.idPairsWithCardCol($"ids", $"ns", 0.5))
          .as("p"))
        .select($"p.id1", $"p.id2", $"p.n1", $"p.n2")
        .as[(Long, Long, Long, Long)].collect().toSet
      // (30,10): 4 vs 8 → ratio 0.5, kept; (30,20): 4 vs 5 kept;
      // (10,20): 8 vs 5 → 0.625 kept — all with id1 < id2
      got shouldBe Set((10L, 30L, 8L, 4L), (20L, 30L, 5L, 4L),
        (10L, 20L, 8L, 5L))
      // tighter threshold drops the ratio-0.5 pair
      val strict = Seq((Seq(30L, 10L, 20L), Seq(4L, 8L, 5L))).toDF("ids", "ns")
        .select(explode(NativeKernels.idPairsWithCardCol($"ids", $"ns", 0.6))
          .as("p"))
        .select($"p.id1", $"p.id2").as[(Long, Long)].collect().toSet
      strict shouldBe Set((20L, 30L), (10L, 20L))
    }
    it("raises loudly on a stopword-grade posting list") {
      val big = (0 until 70000).map(_.toLong)
      a[Throwable] should be thrownBy
        Seq((big, big.map(_ => 5L))).toDF("ids", "ns")
          .select(explode(NativeKernels.idPairsWithCardCol($"ids", $"ns", 0.5)))
          .count()
    }
  }

  describe("simHashPortable60 + pigeonhole bucketing") {
    it("fingerprints stay in the 60-bit range and near-dup search is complete") {
      val fps = docs.select($"doc_id".as[Long],
        NativeKernels.simHashPortable60Col(TextFns.tokens($"text")).as[Long])
        .collect()
      all(fps.map(_._2).toSeq) should be >= 0L
      all(fps.map(_._2).toSeq) should be < (1L << 60)
      // brute-force exact Hamming pairs <= 3 == the operator's output
      // (pigeonhole bucketing must be COMPLETE for maxDist < chunks)
      val brute = (for {
        (i1, f1) <- fps; (i2, f2) <- fps if i1 < i2
        if java.lang.Long.bitCount(f1 ^ f2) <= 3
      } yield (i1, i2)).toSet
      val got = SimHash.nearDuplicatesPortable(docs, "doc_id", "text",
        maxDist = 3).select($"id1".as[Long], $"id2".as[Long])
        .collect().toSet
      got shouldBe brute
    }
  }

  describe("sortedIntersectCount vs array_intersect") {
    it("agrees on real shingle-hash sets (all adjacent doc pairs)") {
      val sh = docs.select($"doc_id",
        sort_array(Dedup.shingleHashes($"text", 3)).as("sh"))
      val pairs = sh.as("a").join(sh.as("b"),
        col("a.doc_id") + 1 === col("b.doc_id"))
      val d = pairs.select(
        NativeKernels.sortedIntersectCountCol(col("a.sh"), col("b.sh"))
          .as("n"),
        org.apache.spark.sql.functions
          .size(array_intersect(col("a.sh"), col("b.sh"))).as("r"))
      d.filter($"n" =!= $"r").count() shouldBe 0
      d.agg(sum($"n")).as[Long].head() should be > 0L // non-vacuous
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

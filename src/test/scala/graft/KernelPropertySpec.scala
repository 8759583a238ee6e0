package graft

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.expressions.NativeKernels

/** Property-based invariants for the round-7 kernels — pure JVM
  * calls, no Spark session needed (the DataFrame-level parity with
  * the declarative forms is separately spec-gated in CurationSpec).
  * Also home to the LakeStats manifest-codec round-trip property:
  * the zone maps ride every manifest line, so a single lossy case
  * silently disables (or worse, mis-aims) pruning.
  */
class KernelPropertySpec extends AnyFunSpec with Matchers {

  /** Run a scalacheck property under scalatest (no scalatestplus
    * bridge in the dependency set — drive scalacheck directly). */
  private def holds(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(200), p)
    withClue(res.status.toString) { res.passed shouldBe true }
  }

  private val token: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).suchThat(_.nonEmpty)
  private val text: Gen[String] = for {
    toks <- Gen.listOf(token)
    seps <- Gen.listOfN(toks.length + 1, Gen.chooseNum(0, 3))
  } yield {
    // interleave runs of spaces (0-3) around tokens: exercises empty
    // token dropping at both ends and in the middle
    val sb = new StringBuilder(" " * seps.head)
    toks.zip(seps.tail).foreach { case (t, s) =>
      sb.append(t).append(" " * s)
    }
    sb.toString
  }

  private def segs(s: String, k: Int): Seq[String] = {
    val arr = NativeKernels.tokenSegments(UTF8String.fromString(s), k)
      .asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  describe("tokenSegments properties") {
    it("concatenation of segments equals the normalized token stream") {
      holds(forAll(text, Gen.chooseNum(1, 5)) { (s, k) =>
        val toks = s.split(" ").filter(_.nonEmpty).toSeq
        segs(s, k).flatMap(_.split(" ").filter(_.nonEmpty)) == toks
      })
    }
    it("every segment has exactly k tokens except a shorter tail") {
      holds(forAll(text, Gen.chooseNum(1, 5)) { (s, k) =>
        val out = segs(s, k).map(_.split(" ").count(_.nonEmpty))
        out.isEmpty ||
          (out.init.forall(_ == k) && out.last >= 1 && out.last <= k)
      })
    }
    it("segment count is ceil(tokens / k)") {
      holds(forAll(text, Gen.chooseNum(1, 5)) { (s, k) =>
        val n = s.split(" ").count(_.nonEmpty)
        segs(s, k).length == (n + k - 1) / k
      })
    }
  }

  describe("termFreqs properties") {
    def freqs(s: String): Map[String, Int] = {
      val arr = NativeKernels.termFreqs(UTF8String.fromString(s))
        .asInstanceOf[ArrayData]
      (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2)
        r.getUTF8String(0).toString -> r.getInt(1)
      }.toMap
    }
    it("matches the naive split-filter-groupBy count for any text") {
      holds(forAll(text) { s =>
        freqs(s) == s.split(" ").filter(_.nonEmpty)
          .groupBy(identity).map { case (t, g) => t -> g.length }
      })
    }
    it("emits each term once (keys are distinct by construction)") {
      holds(forAll(text) { s =>
        val arr = NativeKernels.termFreqs(UTF8String.fromString(s))
          .asInstanceOf[ArrayData]
        val keys = (0 until arr.numElements())
          .map(i => arr.getStruct(i, 2).getUTF8String(0).toString)
        keys.distinct == keys
      })
    }
    it("tf values sum to the non-empty token count") {
      holds(forAll(text) { s =>
        freqs(s).values.sum == s.split(" ").count(_.nonEmpty)
      })
    }
  }

  describe("bloom kernel properties") {
    def filterOf(keys: Seq[Long], words: Int, k: Int): Array[Long] = {
      val arr = new Array[Long](words)
      val m = words.toLong << 6
      keys.foreach { key =>
        var h = NativeKernels.bloomHash1(key)
        val h2 = NativeKernels.bloomHash2(key)
        var i = 0
        while (i < k) {
          val pos = (h & Long.MaxValue) % m
          arr((pos >>> 6).toInt) |= 1L << (pos & 63L)
          h += h2
          i += 1
        }
      }
      arr
    }
    def mightContain(bits: Array[Long], key: Long, k: Int): Boolean =
      NativeKernels.bloomMightContain(key,
        ArrayData.toArrayData(bits), k)

    it("NEVER yields a false negative, for any key set and geometry") {
      holds(forAll(
        Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue)),
        Gen.chooseNum(1, 64), Gen.chooseNum(1, 10)) { (keys, words, k) =>
        val bits = filterOf(keys, words, k)
        keys.forall(mightContain(bits, _, k))
      })
    }
    it("an empty filter rejects everything") {
      holds(forAll(Gen.choose(Long.MinValue, Long.MaxValue)) { key =>
        !mightContain(new Array[Long](16), key, 7)
      })
    }
  }

  describe("packing arithmetic properties") {
    it("seq spans tile the shard stream without gaps or overlap") {
      holds(forAll(
        Gen.nonEmptyListOf(Gen.chooseNum(0, 50)),
        Gen.chooseNum(1, 64)) { (tokens, budget) =>
        // replay packingManifest's arithmetic for one shard
        val cums = tokens.scanLeft(0L)(_ + _)
        val rows = tokens.zip(cums.zip(cums.tail)).map {
          case (n, (start, cum)) =>
            val first = start / budget
            val last = if (n == 0) first else (cum - 1) / budget
            (n, start, first, last)
        }
        Prop.all(
          // starts are the running sum (contiguous, no gaps)
          rows.map(_._2) == cums.init,
          // non-empty docs span exactly their token range's sequences
          rows.filter(_._1 > 0).forall { case (n, start, first, last) =>
            first == start / budget && last == (start + n - 1) / budget
          })
      })
    }
  }

  describe("LakeStats manifest codec") {
    import graft.sources.LakeStats
    import graft.sources.LakeStats.{Bound, ColStats, FileStats, NumBound, StrBound}

    val colName: Gen[String] =
      Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(24))
    // strings incl. the characters the tab-separated manifest must
    // survive: tabs, newlines, quotes, unicode, '%' escapes
    val gnarlyStr: Gen[String] =
      Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(
        '\t', '\n', '"', '\\', '%', '=', '/', 'é', '字', ' ')))
        .map(_.mkString.take(LakeStats.MaxStrLen))
    val numBound: Gen[Bound] = Gen.oneOf(
      Gen.chooseNum(Long.MinValue, Long.MaxValue)
        .map(v => NumBound(BigDecimal(v))),
      Gen.chooseNum(-1e12, 1e12).map(v => NumBound(BigDecimal(v))))
    def colStats(domain: String, b: Gen[Bound]): Gen[ColStats] =
      for {
        lo <- Gen.option(b); hi <- Gen.option(b)
        n <- Gen.option(Gen.chooseNum(0L, 1000000L))
      } yield ColStats(domain, lo, hi, n)
    val fileStats: Gen[FileStats] = for {
      rows <- Gen.chooseNum(0L, 10000000L)
      bytes <- Gen.chooseNum(0L, 1L << 40)
      n <- Gen.chooseNum(0, 8)
      names <- Gen.listOfN(n, colName)
      cols <- Gen.sequence[List[(String, ColStats)], (String, ColStats)](
        names.distinct.map(nm =>
          Gen.oneOf(
            colStats("long", numBound),
            colStats("double", numBound),
            colStats("ts", numBound),
            colStats("date", numBound),
            colStats("string", gnarlyStr.map(StrBound(_)))
          ).map(nm -> _)))
    } yield FileStats(rows, cols.toMap, bytes)

    it("round-trips any stats through JSON, never emitting a raw " +
        "tab or newline (the manifest line format)") {
      holds(forAll(fileStats) { fs =>
        val json = LakeStats.toJson(fs)
        Prop.all(
          !json.contains('\t') && !json.contains('\n'),
          LakeStats.fromJson(json).contains(fs))
      })
    }
  }

  describe("round-9 session-3 kernels") {
    // ---- BPE encode vs an independent priority-queue reference ----

    /** Reference BPE encoder — the PRIORITY-QUEUE formulation, a
      * different algorithm from the kernel's rank-order-exhaustive
      * loop; the property proves the two formulations coincide on
      * arbitrary inputs (BpeSpec proves it on curated cases).
      */
    def refEncode(text: String, merges: Vector[(String, String)])
        : Seq[String] = {
      val rank = merges.zipWithIndex.toMap
      text.split(" ").filter(_.nonEmpty).toSeq.flatMap { w =>
        var syms: Vector[String] =
          w.map(_.toString).toVector :+ "</w>"
        var done = false
        while (!done && syms.size > 1) {
          val ranked = syms.zip(syms.tail)
            .flatMap(p => rank.get(p).map(r => (r, p)))
          if (ranked.isEmpty) done = true
          else {
            val (_, (a, b)) = ranked.minBy(_._1)
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.size) {
              if (i < syms.size - 1 && syms(i) == a && syms(i + 1) == b) {
                out += (a + b); i += 2
              } else { out += syms(i); i += 1 }
            }
            syms = out.result()
          }
        }
        syms
      }
    }

    def kernelEncode(text: String, merges: Vector[(String, String)])
        : Seq[String] = {
      val wire = UTF8String.fromString(
        merges.map { case (a, b) => a + "\t" + b }.mkString("\n"))
      val arr = NativeKernels
        .bpeEncode(UTF8String.fromString(text), wire)
        .asInstanceOf[ArrayData]
      (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
    }

    // small alphabet so merges actually apply; merges built the way
    // training builds them (later merges may reference earlier fusions)
    val abcToken: Gen[String] =
      Gen.choose(1, 6).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val abcText: Gen[String] =
      Gen.listOf(abcToken).map(_.mkString(" "))
    val mergeList: Gen[Vector[(String, String)]] = {
      val base = Vector("a", "b", "c", "</w>")
      def grow(acc: Vector[(String, String)], syms: Vector[String],
          n: Int, pick: Gen[(Int, Int)]): Gen[Vector[(String, String)]] =
        if (n == 0) Gen.const(acc)
        else pick.flatMap { case (i, j) =>
          val (l, r) = (syms(i % syms.size), syms(j % syms.size))
          if (acc.contains((l, r)) || l == "</w>")
            grow(acc, syms, n - 1, pick)
          else grow(acc :+ ((l, r)), syms :+ (l + r), n - 1, pick)
        }
      Gen.choose(0, 6).flatMap(n =>
        grow(Vector.empty, base, n,
          Gen.zip(Gen.choose(0, 20), Gen.choose(0, 20))))
    }

    it("bpeEncode == the priority-queue reference on random text and " +
        "training-shaped merge tables") {
      holds(forAll(abcText, mergeList) { (t, ms) =>
        kernelEncode(t, ms) == refEncode(t, ms)
      })
    }

    it("bpeEncode concatenates back to the original tokens (lossless)") {
      holds(forAll(abcText, mergeList) { (t, ms) =>
        val toks = kernelEncode(t, ms)
        val rebuilt = toks.mkString("").split("</w>", -1).toSeq
          .filter(_.nonEmpty)
        rebuilt == t.split(" ").filter(_.nonEmpty).toSeq
      })
    }

    // ---- NFC + mojibake invariants ----

    val anyStr: Gen[String] = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '\u00e9', '\u0301', '\u00c3',
        '\u20ac', '\u65e5'))).map(_.mkString)

    it("nfcNormalize is idempotent and length-bounded") {
      holds(forAll(anyStr) { s =>
        val once = NativeKernels
          .nfcNormalize(UTF8String.fromString(s)).toString
        val twice = NativeKernels
          .nfcNormalize(UTF8String.fromString(once)).toString
        twice == once && once.length <= s.length
      })
    }

    it("hilbertValue is injective and unit-step-adjacent on random " +
        "windows anywhere in the 2^31 domain") {
      val coord = Gen.choose(0L, (1L << 31) - 9)
      holds(forAll(coord, coord) { (x0, y0) =>
        // an 8x8 window at a random offset: all 64 indexes distinct,
        // and the curve restricted to the window never collides
        val idx = for { dx <- 0 until 8; dy <- 0 until 8 }
          yield NativeKernels.hilbertValue(x0 + dx, y0 + dy)
        idx.toSet.size == 64
      })
      // global adjacency: consecutive indexes differ by adjacent
      // cells on a full small tile wherever the tile sits at origin
      val byIdx = (for { x <- 0 until 16; y <- 0 until 16 }
        yield NativeKernels.hilbertValue(x.toLong, y.toLong) -> (x, y))
        .toMap
      (0 until 255).foreach { d =>
        val (x1, y1) = byIdx(d.toLong)
        val (x2, y2) = byIdx(d.toLong + 1)
        (math.abs(x1 - x2) + math.abs(y1 - y2)) shouldBe 1
      }
    }

    it("fixMojibake is idempotent-after-repair and never grows text") {
      holds(forAll(anyStr) { s =>
        val once = NativeKernels
          .fixMojibake(UTF8String.fromString(s)).toString
        val twice = NativeKernels
          .fixMojibake(UTF8String.fromString(once)).toString
        twice == once && once.length <= s.length
      })
    }
  }

  describe("round-10 kernels") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData

    def longs(xs: Seq[Long]): ArrayData =
      new GenericArrayData(xs.toArray)
    def pairsOf(arr: Any): Seq[(Long, Long)] =
      arr.asInstanceOf[GenericArrayData].array.toSeq
        .map(_.asInstanceOf[InternalRow])
        .map(r => (r.getLong(0), r.getLong(1)))

    // posting lists: distinct ids < 2^32, cardinalities in [1, 2^32)
    val posting: Gen[Seq[(Long, Long)]] = for {
      n <- Gen.choose(0, 40)
      ids <- Gen.listOfN(n, Gen.choose(0L, (1L << 32) - 1))
      ns <- Gen.listOfN(n, Gen.choose(1L, (1L << 32) - 1))
    } yield ids.distinct.zip(ns)
    val thr: Gen[Double] = Gen.oneOf(0.0, 0.3, 0.5, 0.8, 1.0)

    it("idPairsFromPostings == idPairsPacked on arbitrary postings") {
      holds(forAll(posting, thr) { (p, t) =>
        val packed = NativeKernels.idPairsFromPostings(
          longs(p.map { case (id, n) => (id << 32) | n }), t)
        val two = NativeKernels.idPairsPacked(
          longs(p.map(_._1)), longs(p.map(_._2)), t)
        pairsOf(packed).toSet == pairsOf(two).toSet &&
          pairsOf(packed).size == pairsOf(two).size
      })
    }

    it("pair emission: each unordered pair once, ordered keys, " +
        "length filter honored") {
      holds(forAll(posting, thr) { (p, t) =>
        val out = pairsOf(NativeKernels.idPairsFromPostings(
          longs(p.map { case (id, n) => (id << 32) | n }), t))
        val keys = out.map(_._1)
        val onceEach = keys.distinct.size == keys.size
        val orderedAndFiltered = out.forall { case (pk, nc) =>
          val (id1, id2) = (pk >>> 32, pk & 0xffffffffL)
          val (n1, n2) = (nc >>> 32, nc & 0xffffffffL)
          id1 < id2 && math.min(n1, n2) >= t * math.max(n1, n2)
        }
        val expected = (for {
          i <- p.indices; j <- (i + 1) until p.size
          if math.min(p(i)._2, p(j)._2) >=
            t * math.max(p(i)._2, p(j)._2)
        } yield ()).size
        onceEach && orderedAndFiltered && out.size == expected
      })
    }

    def strs(xs: Seq[String]): ArrayData =
      new GenericArrayData(xs.map(UTF8String.fromString).toArray)
    def ints(arr: Any): Seq[Int] = {
      val a = arr.asInstanceOf[ArrayData]
      (0 until a.numElements()).map(a.getInt)
    }
    val word: Gen[String] = Gen.listOf(
      Gen.frequency(8 -> Gen.alphaNumChar, 1 -> Gen.const('é'),
        1 -> Gen.const('中'))).map(_.mkString)

    it("BoundedLongs: arbitrary chunked merge + serde interleavings " +
        "preserve multiset-up-to-cap semantics") {
      import graft.expressions.{BoundedCollectLong, BoundedLongs}
      val agg = (limit: Int) => BoundedCollectLong(
        org.apache.spark.sql.catalyst.expressions.Literal(0L), limit)
      val gen = for {
        limit <- Gen.choose(1, 64)
        vals <- Gen.listOf(Gen.choose(-1000L, 1000L))
        cuts <- Gen.listOf(Gen.choose(0, math.max(vals.size, 1)))
        serde <- Gen.listOf(Gen.oneOf(true, false))
      } yield (limit, vals, cuts.sorted.distinct, serde)
      holds(forAll(gen) { case (limit, vals, cuts, serde) =>
        val a = agg(limit)
        // split into chunks at the random cut points, one buffer per
        // chunk (optionally serde-roundtripped), then fold-merge
        val bounds = (0 +: cuts :+ vals.size).distinct.sorted
        val chunks = bounds.zip(bounds.tail).map { case (x, y) =>
          vals.slice(x, y) }
        val buffers = chunks.zipWithIndex.map { case (c, i) =>
          val b = new BoundedLongs(limit)
          c.foreach(b.add)
          if (serde.lift(i).getOrElse(false))
            a.deserialize(a.serialize(b))
          else b
        }
        val merged = buffers.foldLeft(a.createAggregationBuffer())(
          (acc, b) => a.merge(acc, b))
        val out = a.eval(merged)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toLongArray().toSeq
        if (vals.size > limit) out.isEmpty
        else out.sorted == vals.sorted // exact multiset under the cap
      })
    }

    it("dsirBuckets: 2n-1 features, all in range, bigram == unigram " +
        "of the space-joined gram") {
      holds(forAll(Gen.listOf(word), Gen.choose(2, 8192)) { (ws, b) =>
        val out = ints(NativeKernels.dsirBuckets(strs(ws), b))
        val n = ws.size
        val lenOk = out.size == math.max(2 * n - 1, 0)
        val rangeOk = out.forall(x => x >= 0 && x < b)
        // the i-th bigram bucket must equal the unigram bucket of the
        // literally concatenated gram (incremental hash == direct)
        val bigramsOk = (0 until math.max(n - 1, 0)).forall { i =>
          out(n + i) == ints(NativeKernels.dsirBuckets(
            strs(Seq(ws(i) + " " + ws(i + 1))), b)).head
        }
        lenOk && rangeOk && bigramsOk
      })
    }
  }
}

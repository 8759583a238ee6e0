package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.array.ByteArrayMethods
import org.apache.spark.unsafe.types.UTF8String

/** Native JVM kernels for the hot per-row loops (SURVEY.md §2 "custom
  * Expression" tier): SimHash votes, MinHash signatures, and vector
  * dot products run as tight primitive loops invoked from generated
  * code via `StaticInvoke`, instead of Catalyst higher-order-function
  * folds that interpret one expression tree per array element.
  *
  * Semantics are IDENTICAL to the declarative reference forms that
  * remain in [[graft.operators.SimHash.simHash64Reference]],
  * [[graft.operators.MinHashLsh.signatureReference]] and
  * [[graft.functions.VectorFns.dotReference]] — parity is spec-gated
  * (NativeKernelSpec) and, for the dot product, oracle-gated
  * bit-for-bit through `ann_topk`. Token hashes use the same XXH64
  * seed (42) as the built-in `xxhash64`.
  *
  * Measured at sf0.1: SimHash 13.7s → ~1s, MinHash 11s → ~2s per
  * corpus pass (interpreted HOF → native loop).
  */
object NativeKernels extends Serializable {

  private val XxSeed = 42L

  private def xx(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
      s.numBytes, XxSeed)

  /** Driver-side twin of the built-in `xxhash64(string)` (seed 42) —
    * lets a literal probe key normalize exactly like a plan-side
    * `xxhash64` column (sources/BloomIndex key normalization).
    */
  def xx64(s: UTF8String): Long = xx(s)

  // ---- SimHash -----------------------------------------------------

  /** 64-bit SimHash over a token array: one pass, 64-slot vote array
    * in registers/stack. Matches the HOF reference exactly.
    */
  def simHash64(tokens: ArrayData): Long = {
    val votes = new Array[Long](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val h = xx(tokens.getUTF8String(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  // ---- MinHash -----------------------------------------------------

  private val P31 = (1L << 31) - 1

  /** Deterministic permutation coefficients, cached per
    * (numHashes, seed). Same generator as the declarative reference.
    */
  private val permCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), Array[Long]]()

  def perms(numHashes: Int, seed: Long): Array[Long] =
    permCache.computeIfAbsent((numHashes, seed), { _ =>
      val rnd = new scala.util.Random(seed)
      val ab = new Array[Long](numHashes * 2)
      var k = 0
      while (k < numHashes) {
        // interleaved (a, b): a in [1, P31-1], b in [0, P31).
        // Mask to 63 bits rather than math.abs — abs(Long.MinValue)
        // is negative, which would yield a degenerate a <= 0.
        ab(2 * k) = (rnd.nextLong() & Long.MaxValue) % (P31 - 1) + 1
        ab(2 * k + 1) = (rnd.nextLong() & Long.MaxValue) % P31
        k += 1
      }
      ab
    })

  /** MinHash signature: min over shingles of (a_i * h + b_i) mod P31
    * per permutation — one xx-hash per shingle, tight inner loop.
    */
  def minHashSignature(shingles: ArrayData, numHashes: Int, seed: Long)
      : ArrayData = {
    val ab = perms(numHashes, seed)
    val sig = Array.fill(numHashes)(P31)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val h = java.lang.Math.floorMod(xx(shingles.getUTF8String(i)), P31)
      var k = 0
      while (k < numHashes) {
        val v = java.lang.Math.floorMod(ab(2 * k) * h + ab(2 * k + 1), P31)
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** MinHash signature from PRE-HASHED shingles (the [[wordShingleHashes]]
    * output): identical arithmetic to [[minHashSignature]] — the string
    * form's first step is xx(shingle), which is exactly what the hash
    * array already holds, and min-over-set is order-independent — so
    * sig(hashes(doc)) == sig(shingles(doc)) bit-for-bit (spec-gated).
    * Lets a near-dup pipeline tokenize/shingle/hash each document ONCE
    * and derive both the band index and the verify sets from that one
    * frame instead of re-running the text pipeline per consumer.
    */
  def minHashFromHashes(hashes: ArrayData, numHashes: Int, seed: Long)
      : ArrayData = {
    val ab = perms(numHashes, seed)
    val sig = Array.fill(numHashes)(P31)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = java.lang.Math.floorMod(hashes.getLong(i), P31)
      var k = 0
      while (k < numHashes) {
        val v = java.lang.Math.floorMod(ab(2 * k) * h + ab(2 * k + 1), P31)
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  // ---- Shingles ----------------------------------------------------

  /** Distinct word n-gram shingles from a token array — first-
    * occurrence order, space-joined, exactly matching the declarative
    * `array_distinct(transform(sequence(...), concat_ws(" ", ...)))`
    * form (including empty tokens from repeated separators).
    */
  def wordShingles(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray[AnyRef](new Array[AnyRef](seen.size)))
  }

  /** ALL word n-grams from a token array (duplicates kept — the
    * frequency-weighted feature stream SimHash votes over), one per
    * window start, space-joined; a document shorter than `n` falls
    * back to its whole token array joined (non-empty input keeps a
    * fingerprint). Bit-exact twin of the declarative
    * `transform(sequence(0, greatest(size - n, 0)), concat_ws(slice))`
    * + short-doc fallback in [[graft.operators.SimHash]]: that
    * higher-order form re-evaluates the captured token subplan inside
    * the lambda for EVERY window (O(L²) re-tokenization per doc,
    * interpreted — measured 22.4 s of a 27 s sf1ov fingerprint pass);
    * this kernel is one pass over one materialized array.
    */
  def wordNGrams(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    val space = UTF8String.fromString(" ")
    if (m < n) {
      val parts = new Array[UTF8String](m)
      var j = 0
      while (j < m) { parts(j) = tokens.getUTF8String(j); j += 1 }
      return new GenericArrayData(
        Array[Any](UTF8String.concatWs(space, parts: _*)))
    }
    val out = new Array[Any](m - n + 1)
    var i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Spread the low 31 bits of `v` to even bit positions (2-D Morton
    * magic-number spread — standard public bit-twiddling).
    */
  private def spreadBits(v: Long): Long = {
    var x = v
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** 2-D Morton (Z-order) value: interleaves the low 31 bits of two
    * non-negative coordinates. Range-sorting by this single key keeps
    * BOTH columns' min-max ranges tight per file/row-group — the
    * layout trick behind multi-dimensional parquet data skipping.
    *
    * Domain is ENFORCED, not advisory: an input outside [0, 2^31)
    * would either interleave garbage bits or flip the sign bit of the
    * sort key — both silently destroy the layout — so the kernel
    * raises instead (bucketize wider domains upstream).
    */
  def mortonValue(a: Long, b: Long): Long = {
    if (a < 0L || b < 0L || a >= (1L << 31) || b >= (1L << 31))
      throw new IllegalArgumentException(
        s"mortonValue inputs must be in [0, 2^31): ($a, $b)")
    spreadBits(a) | (spreadBits(b) << 1)
  }

  /** 2-D Hilbert-curve index of two non-negative coordinates (31 bits
    * each → a 62-bit index): the space-filling curve with STRICTLY
    * better locality than Morton — consecutive indexes are always
    * Manhattan-adjacent cells (Morton jumps across the plane at
    * quadrant boundaries), so range-sorting by it packs 2-D boxes
    * into even fewer files (what liquid-clustering-style layouts use
    * internally). Same enforced domain contract as [[mortonValue]].
    * Classic iterative xy→d with quadrant rotation (public-domain
    * algorithm).
    */
  def hilbertValue(a: Long, b: Long): Long = {
    if (a < 0L || b < 0L || a >= (1L << 31) || b >= (1L << 31))
      throw new IllegalArgumentException(
        s"hilbertValue inputs must be in [0, 2^31): ($a, $b)")
    var x = a
    var y = b
    var d = 0L
    var s = 1L << 30
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Banded Levenshtein with threshold `k`: returns the distance when
    * <= k, else -1 — O(len × k) cells with early band-exhaustion
    * exit. Operates on Unicode CODEPOINT arrays (not UTF-16 chars), so
    * distances agree with the SQL `levenshtein` and DuckDB's even for
    * supplementary-plane characters (emoji, rare CJK), where a char
    * unit would count surrogate halves as two edits.
    */
  private def boundedLev(a0: Array[Int], b0: Array[Int], k: Int): Int = {
    // Common prefix/suffix strip (r16): unit-cost Levenshtein is
    // invariant under trimming a shared prefix and then a shared
    // suffix of the remainders (every optimal alignment normalizes to
    // match them — the standard Ukkonen reduction). In blocked ER the
    // block key IS a name prefix, so intra-block pairs share long
    // prefixes and the banded DP below runs on a few residual
    // codepoints instead of the full names — measured 68 → ~8 s on
    // the er_fuzzy_names sf10 tier (1500-wide blocks of
    // "customer#…" names, ~15 of ~18 codepoints shared).
    var s = 0
    val minLen = math.min(a0.length, b0.length)
    while (s < minLen && a0(s) == b0(s)) s += 1
    var ea = a0.length
    var eb = b0.length
    while (ea > s && eb > s && a0(ea - 1) == b0(eb - 1)) {
      ea -= 1; eb -= 1
    }
    val swap = (ea - s) > (eb - s)
    val a = if (swap) b0 else a0
    val b = if (swap) a0 else b0
    val la = if (swap) eb - s else ea - s
    val lb = if (swap) ea - s else eb - s
    if (lb - la > k) return -1
    if (lb == 0) return 0 // both empty after trim: equal strings
    val inf = k + 1
    var prev = new Array[Int](lb + 1)
    var cur = new Array[Int](lb + 1)
    java.util.Arrays.fill(prev, inf)
    var j = 0
    while (j <= math.min(lb, k)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= la) {
      // only the band [from-1, to] is read/written this row — seed
      // its borders instead of filling the whole row (r16)
      val from = math.max(1, i - k)
      val to = math.min(lb, i + k)
      if (from > 1) cur(from - 1) = inf
      if (to < lb) cur(to + 1) = inf
      cur(0) = if (i <= k) i else inf
      var best = cur(0)
      j = from
      while (j <= to) {
        val cost = if (a(s + i - 1) == b(s + j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        if (prev(j) + 1 < v) v = prev(j) + 1
        if (cur(j - 1) + 1 < v) v = cur(j - 1) + 1
        if (v > inf) v = inf
        cur(j) = v
        if (v < best) best = v
        j += 1
      }
      if (best > k) return -1 // whole band exceeded: no path can recover
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(lb) <= k) prev(lb) else -1
  }

  /** All fuzzy-match pairs inside ONE entity-resolution block:
    * `entries` is array<struct<id long, name string>>; output is
    * array<struct<id1, id2, dist>> for every unordered pair with
    * bounded Levenshtein distance <= maxDist (id1 < id2). Names are
    * decoded to char arrays ONCE per block, then the O(b²) pair loop
    * runs the banded DP with no per-candidate row machinery — the
    * SMJ + per-pair levenshtein formulation of the same block join
    * measured 20-40× slower (row copies + full-width DP dominate).
    */
  def fuzzyPairs(entries: ArrayData, maxDist: Int): ArrayData = {
    val n = entries.numElements()
    val ids = new Array[Long](n)
    val nms = new Array[Array[Int]](n)
    var i = 0
    while (i < n) {
      val r = entries.getStruct(i, 2)
      ids(i) = r.getLong(0)
      nms(i) = r.getUTF8String(1).toString.codePoints().toArray
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (ids(i) != ids(j)) {
          val d = boundedLev(nms(i), nms(j), maxDist)
          if (d >= 0) {
            val lo = math.min(ids(i), ids(j))
            val hi = math.max(ids(i), ids(j))
            out += new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(Array[Any](lo, hi, d))
          }
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** All unordered id pairs within one inverted-index posting list,
    * each pair carrying both docs' shingle cardinalities: `idsArr` is
    * the doc ids sharing one shingle, `nsArr` the parallel array of
    * each doc's total shingle count (two plain long arrays — a struct
    * list would route collect_list through per-element row allocation,
    * measured 8× slower to collect); output is
    * array<struct<id1, id2, n1, n2>> with id1 < id2. Carrying the
    * cardinalities through the pair stream is what lets the Jaccard
    * join compute its denominator with NO doc-cardinality join at all
    * — at corpus scale that join's build side is corpus-sized and
    * does not broadcast. One native loop replaces the sort-merge
    * self-join's per-candidate row machinery (the [[fuzzyPairs]]
    * pattern applied to the posting list).
    *
    * Cost is inherently |entries|² per group — a stopword-grade
    * shingle with a million postings cannot be paired this way (or
    * any way that enumerates its pairs), so groups past 65536 ids
    * raise loudly instead of overflowing the output size; the
    * caller's scale contract (verify-tier, LSH-first) is documented
    * at [[graft.operators.Dedup.ngramJaccard]].
    */
  def idPairsWithCard(idsArr: ArrayData, nsArr: ArrayData,
      threshold: Double): ArrayData = {
    val n = idsArr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    if (n > 65536)
      throw new IllegalArgumentException(
        s"idPairsWithCard: posting list of $n ids would emit ${n.toLong * (n - 1) / 2} pairs; " +
          "run LSH first and verify survivors only")
    val ids = idsArr.toLongArray()
    val ns = nsArr.toLongArray()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n * 2)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        // length filter (exact, no false dismissals): inter <= min(n1,n2)
        // and union >= max(n1,n2), so jaccard <= min/max — a pair whose
        // cardinality ratio is under the threshold can never qualify
        // and is never emitted (cuts the pair stream before it exists,
        // which is where this operator's cost lives).
        val lo = math.min(ns(i), ns(j))
        val hi = math.max(ns(i), ns(j))
        if (lo.toDouble >= threshold * hi.toDouble) {
          out += (if (ids(i) < ids(j))
            new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(Array[Any](ids(i), ids(j), ns(i), ns(j)))
          else
            new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(Array[Any](ids(j), ids(i), ns(j), ns(i))))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** [[idPairsWithCard]] with the pair and its cardinalities PACKED
    * into one long each: pk = (id1 << 32) | id2, nc = (n1 << 32) | n2
    * — so the downstream pair aggregation keys a single 8-byte long
    * (the round-7 shape experiment for the dedup_jaccard agg; see the
    * measured-alternatives note at
    * [[graft.operators.Dedup.ngramJaccard]]). Contract: ids and
    * cardinalities must fit in unsigned 32 bits (checked loudly) —
    * the unpacked [[idPairsWithCard]] remains the general form.
    */
  def idPairsPacked(idsArr: ArrayData, nsArr: ArrayData,
      threshold: Double): ArrayData = {
    val n = idsArr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    if (n > 65536)
      throw new IllegalArgumentException(
        s"idPairsPacked: posting list of $n ids would emit ${n.toLong * (n - 1) / 2} pairs; " +
          "run LSH first and verify survivors only")
    val ids = idsArr.toLongArray()
    val ns = nsArr.toLongArray()
    var k = 0
    while (k < n) {
      if ((ids(k) >>> 32) != 0 || (ns(k) >>> 32) != 0)
        throw new IllegalArgumentException(
          "idPairsPacked needs ids and cardinalities < 2^32; " +
            "use idPairsWithCard for 64-bit ids")
      k += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any](n * 2)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val lo = math.min(ns(i), ns(j))
        val hi = math.max(ns(i), ns(j))
        if (lo.toDouble >= threshold * hi.toDouble) {
          val (a, b) = if (ids(i) < ids(j)) (i, j) else (j, i)
          out += new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(Array[Any](
              (ids(a) << 32) | ids(b), (ns(a) << 32) | ns(b)))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** [[idPairsPacked]] over a SINGLE posting array whose every element
    * already packs (doc_id << 32) | n_shingles — one aggregate buffer
    * and one shuffle column instead of two parallel lists (the E4
    * posting rows carry 8 payload bytes, not 16). Same emission and
    * same length-filter as [[idPairsPacked]]; the caller guarantees
    * both halves fit 32 bits (enforced in-plan at pack time —
    * Dedup.ngramJaccard raises on ids >= 2^32).
    */
  def idPairsFromPostings(packed: ArrayData, threshold: Double)
      : ArrayData = {
    val n = packed.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    if (n > 65536)
      throw new IllegalArgumentException(
        s"idPairsFromPostings: posting list of $n ids would emit " +
          s"${n.toLong * (n - 1) / 2} pairs; cap posting df (maxDf) " +
          "or run LSH first and verify survivors only")
    val ps = packed.toLongArray()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n * 2)
    var i = 0
    while (i < n) {
      val idI = ps(i) >>> 32
      val nI = ps(i) & 0xffffffffL
      var j = i + 1
      while (j < n) {
        val idJ = ps(j) >>> 32
        val nJ = ps(j) & 0xffffffffL
        val lo = math.min(nI, nJ)
        val hi = math.max(nI, nJ)
        if (lo.toDouble >= threshold * hi.toDouble) {
          val (pkHi, pkLo, ncHi, ncLo) =
            if (idI < idJ) (idI, idJ, nI, nJ) else (idJ, idI, nJ, nI)
          out += new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(Array[Any](
              (pkHi << 32) | pkLo, (ncHi << 32) | ncLo))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Portable char-pair hash state: fold a UTF8String's printable-
    * ASCII bytes into the two polynomial hashes (base 131 mod 1e9+7,
    * base 137 mod 998244353) starting from (h1, h2) — the SAME
    * convention as [[simHashPortable60]]'s per-token hash, so a DuckDB
    * oracle replays it with the identical list_reduce. Returns the
    * packed (h1 << 30) | h2 state halves in a 2-long array-free form:
    * callers thread h1/h2 through manually (no allocation).
    */
  @inline private def polyFold1(t: UTF8String, h0: Long): Long = {
    val base = t.getBaseObject; val off = t.getBaseOffset
    val nb = t.numBytes
    var h = h0; var p = 0
    while (p < nb) {
      val b = Platform.getByte(base, off + p) & 0xff
      if (b >= 0x20 && b <= 0x7e) h = (h * 131L + b) % 1000000007L
      p += 1
    }
    h
  }
  @inline private def polyFold2(t: UTF8String, h0: Long): Long = {
    val base = t.getBaseObject; val off = t.getBaseOffset
    val nb = t.numBytes
    var h = h0; var p = 0
    while (p < nb) {
      val b = Platform.getByte(base, off + p) & 0xff
      if (b >= 0x20 && b <= 0x7e) h = (h * 137L + b) % 998244353L
      p += 1
    }
    h
  }

  /** DSIR hashed features of a token array: every unigram and every
    * adjacent bigram (joined by one space), hashed with the portable
    * pair-polynomial hash and bucketed mod `buckets` — 2n-1 feature
    * buckets per n-token document, computed in ONE char pass per gram
    * with zero intermediate strings (the bigram hash extends the
    * left token's running state through a literal 0x20 then the right
    * token — bit-identical to hashing the concatenated string).
    * Engine-portable: DuckDB replays each gram with the same
    * list_reduce over `w[i] || ' ' || w[i+1]`.
    */
  def dsirBuckets(words: ArrayData, buckets: Int): ArrayData = {
    val n = words.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyIntArray)
    val out = new Array[Int](2 * n - 1)
    var i = 0
    while (i < n) {
      val t = words.getUTF8String(i)
      val h1 = polyFold1(t, 0L)
      val h2 = polyFold2(t, 0L)
      out(i) = (((h1 << 30) | h2) % buckets).toInt
      if (i + 1 < n) {
        val u = words.getUTF8String(i + 1)
        val g1 = polyFold1(u, (h1 * 131L + 0x20L) % 1000000007L)
        val g2 = polyFold2(u, (h2 * 137L + 0x20L) % 998244353L)
        out(n + i) = (((g1 << 30) | g2) % buckets).toInt
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Σ table(bucket) over a document's DSIR features — the map-side
    * scoring step: `table` is a bucket-indexed LITERAL array (longs:
    * corpus counts; see [[dsirSumDouble]] for log-weights), so scoring
    * touches no join and no shuffle. One char pass per doc.
    */
  def dsirSumLong(words: ArrayData, table: ArrayData, buckets: Int)
      : Long = {
    val bs = dsirBuckets(words, buckets)
    val m = bs.numElements()
    var s = 0L
    var i = 0
    while (i < m) { s += table.getLong(bs.getInt(i)); i += 1 }
    s
  }

  /** [[dsirSumLong]] with a double-valued table (importance log-
    * weights). Left-to-right accumulation order is pinned by the
    * feature order (unigrams then bigrams), so the sum is
    * deterministic — cross-engine equality is still only rtol-level
    * (libm log differs in the last ulps).
    */
  def dsirSumDouble(words: ArrayData, table: ArrayData, buckets: Int)
      : Double = {
    val bs = dsirBuckets(words, buckets)
    val m = bs.numElements()
    var s = 0.0
    var i = 0
    while (i < m) { s += table.getDouble(bs.getInt(i)); i += 1 }
    s
  }

  /** Dense normalized byte-n-gram histogram for one document — the
    * language-ID feature map (fastText's char-n-gram shape over raw
    * UTF-8 bytes: multi-byte scripts contribute their byte patterns,
    * so CJK separates from Latin without any tokenization). Every
    * window of `n` consecutive bytes hashes through the polynomial
    * rolling hash (base 131 mod 1e9+7) into `buckets` bins; counts
    * normalize to frequencies so document length cancels. One byte
    * pass, zero intermediate strings, dense `buckets` doubles out.
    */
  def charGramFreq(t: UTF8String, n: Int, buckets: Int): ArrayData = {
    val out = new Array[Double](buckets)
    val base = t.getBaseObject; val off = t.getBaseOffset
    val nb = t.numBytes
    var total = 0
    var p = 0
    while (p + n <= nb) {
      var h = 0L
      var q = 0
      while (q < n) {
        h = (h * 131L + (Platform.getByte(base, off + p + q) & 0xff)) %
          1000000007L
        q += 1
      }
      out((h % buckets).toInt) += 1.0
      total += 1
      p += 1
    }
    if (total > 0) {
      var i = 0
      while (i < buckets) { out(i) /= total; i += 1 }
    }
    new GenericArrayData(out)
  }

  /** argmax over linear class scores: `w` is a flat CLASS-MAJOR table
    * of nClasses·(len(x)+1) doubles — each class's feature weights
    * followed by its intercept — so a trained linear classifier rides
    * the plan as one literal and scoring is one kernel call (no UDF,
    * no MLlib at inference). Ties break to the lower class index.
    */
  def denseArgmax(x: ArrayData, w: ArrayData, nClasses: Int): Int = {
    val b = x.numElements()
    var best = 0
    var bestZ = Double.NegativeInfinity
    var l = 0
    while (l < nClasses) {
      val o = l * (b + 1)
      var z = w.getDouble(o + b)
      var i = 0
      while (i < b) { z += w.getDouble(o + i) * x.getDouble(i); i += 1 }
      if (z > bestZ) { bestZ = z; best = l }
      l += 1
    }
    best
  }

  /** Engine-portable 60-bit SimHash over a token array: each token is
    * hashed with TWO polynomial rolling hashes over its printable-
    * ASCII projection (base 131 mod 1e9+7 and base 137 mod 998244353,
    * both moduli < 2^30), combined as (h1 << 30) | h2; votes and the
    * sign rule are identical to [[simHash64]] but over 60 bits.
    * Unlike the xx-seeded fingerprint, every step here is plain
    * integer arithmetic a DuckDB oracle replays exactly — the
    * cross-engine-verifiable variant ([[simHash64]] stays the
    * default: xxhash64 mixes far better than a rolling hash).
    */
  def simHashPortable60(tokens: ArrayData): Long = {
    val votes = new Array[Long](60)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      val base = t.getBaseObject
      val off = t.getBaseOffset
      val nb = t.numBytes
      var h1 = 0L
      var h2 = 0L
      var p = 0
      while (p < nb) {
        val bch = Platform.getByte(base, off + p) & 0xff
        if (bch >= 0x20 && bch <= 0x7e) {
          h1 = (h1 * 131L + bch) % 1000000007L
          h2 = (h2 * 137L + bch) % 998244353L
        }
        p += 1
      }
      val h = (h1 << 30) | h2
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  /** Distinct word n-gram shingles as their 64-bit xxhash values
    * (seed 42, = the builtin `xxhash64`): the inverted-index join only
    * needs equality, so shuffling 8-byte longs instead of shingle
    * strings cuts the exchange payload and the SMJ key compares.
    * First-occurrence order like [[wordShingles]]; hash collisions
    * (~n_distinct^2 / 2^65) are the only semantic delta and are
    * negligible for any real corpus.
    */
  def wordShingleHashes(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = tokens.getUTF8String(i + j); j += 1 }
      seen.add(xx(UTF8String.concatWs(space, parts: _*)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** [[wordShingleHashes]] with the engine-PORTABLE per-shingle hash
    * instead of xxhash64: each distinct word n-gram (space-joined,
    * exactly [[wordShingles]]' string form) is hashed with the two
    * polynomial rolling hashes over its printable-ASCII projection
    * (base 131 mod 1e9+7 / base 137 mod 998244353 — the
    * [[simHashPortable60]] convention), combined as (h1 << 30) | h2.
    * Every step is plain integer arithmetic a DuckDB oracle replays
    * with one list_reduce per shingle, which is what lets the
    * PRODUCTION MinHash-LSH configuration (sigMaxDf + maxBucket)
    * hash-gate end to end: census, ban, signature, banding, bucket
    * cap and verify all run on these values in both engines
    * (xxhash64 stays the default — it mixes far better). The space
    * separator (0x20) is printable, so folding token bytes and
    * separators in sequence equals folding the concatenated shingle
    * string — no concatenation is allocated.
    */
  def wordShinglePortableHashes(tokens: ArrayData, n: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= m - n) {
      var h1 = 0L
      var h2 = 0L
      var j = 0
      while (j < n) {
        if (j > 0) { // the joining space
          h1 = (h1 * 131L + 0x20L) % 1000000007L
          h2 = (h2 * 137L + 0x20L) % 998244353L
        }
        val t = tokens.getUTF8String(i + j)
        h1 = polyFold1(t, h1)
        h2 = polyFold2(t, h2)
        j += 1
      }
      seen.add((h1 << 30) | h2)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Intersection size of two SORTED long arrays — one two-pointer
    * pass, zero allocation. The exact-Jaccard verify step over hashed
    * shingle sets: `array_intersect`/`array_union` build hash sets and
    * new arrays per candidate pair; this replaces both (union size =
    * n1 + n2 - inter). Inputs MUST be sorted ascending (sort once per
    * document before the candidate join, not once per pair).
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }

  // ---- Bloom filter ------------------------------------------------

  /** Kirsch–Mitzenmacher double hashing: probe position i is
    * (h1 + i·h2) mod m with h1/h2 independent XXH64 hashes of the
    * key (h2 forced odd). Shared by the builder
    * ([[graft.operators.Bloom.build]]) and the probe kernel — both
    * sides MUST derive positions identically.
    */
  def bloomHash1(key: Long): Long = XXH64.hashLong(key, 0x62100f11L)
  def bloomHash2(key: Long): Long = XXH64.hashLong(key, 0x5eedca7aL) | 1L

  /** Membership probe against a bloom bit array (m = 64·bits.length).
    * False ⇒ the key was NEVER inserted (no false negatives); true ⇒
    * possibly present, verify exactly. Runs as a native loop from
    * generated code; the bit array ships in the plan as a literal
    * (the IVF centroid-literal contract — O(m) plan payload, bounded
    * at build time).
    */
  def bloomMightContain(key: Long, bits: ArrayData, k: Int): Boolean = {
    val m = bits.numElements().toLong << 6
    var h = bloomHash1(key)
    val h2 = bloomHash2(key)
    var i = 0
    while (i < k) {
      val pos = (h & Long.MaxValue) % m
      if ((bits.getLong((pos >>> 6).toInt) & (1L << (pos & 63L))) == 0L)
        return false
      h += h2
      i += 1
    }
    true
  }

  // ---- Text --------------------------------------------------------

  /** Per-word token counts in ONE pass over the text: splits on the
    * single space byte (0x20 — exactly `split(c, " ")`, and UTF-8 safe
    * since 0x20 never occurs inside a multi-byte sequence), drops
    * empty tokens, and returns `counts(i)` = occurrences of
    * `words(i)` plus a final element with the non-empty token count.
    * Replaces one interpreted `filter(split(...))` HOF per marker word
    * (15+ per row in langId + qualityScore) with a single native loop.
    * `words` must be distinct (each token is credited to at most one).
    */
  def tokenCounts(text: UTF8String, words: ArrayData): ArrayData = {
    val nw = words.numElements()
    val counts = new Array[Int](nw + 1)
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nb = text.numBytes
    var start = 0
    var i = 0
    while (i <= nb) {
      if (i == nb || Platform.getByte(base, off + i) == 0x20) {
        val len = i - start
        if (len > 0) {
          counts(nw) += 1
          var k = 0
          var matched = false
          while (k < nw && !matched) {
            val w = words.getUTF8String(k)
            if (w.numBytes == len && ByteArrayMethods.arrayEquals(
                base, off + start, w.getBaseObject, w.getBaseOffset,
                len.toLong)) {
              counts(k) += 1
              matched = true
            }
            k += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  private val SpaceDelim = UTF8String.fromString(" ")

  /** Per-document word-repetition statistics in ONE pass:
    * (non-empty token count, distinct token count, max frequency of
    * any single token) — the inputs to type-token ratio and top-word
    * ratio, the repetition signals a training-data quality gate cuts
    * on (a doc dominated by one repeated token is boilerplate, not
    * prose). One hash map per document, no per-word HOF re-scans.
    */
  def wordStats(text: UTF8String): ArrayData = {
    val parts = text.split(SpaceDelim, -1)
    val freq = new java.util.HashMap[UTF8String, Integer]()
    var n = 0
    var i = 0
    while (i < parts.length) {
      val t = parts(i)
      if (t.numBytes > 0) {
        n += 1
        freq.put(t, Integer.valueOf(freq.getOrDefault(t, 0) + 1))
      }
      i += 1
    }
    var top = 0
    val it = freq.values().iterator()
    while (it.hasNext) {
      val c = it.next().intValue()
      if (c > top) top = c
    }
    new GenericArrayData(Array(n, freq.size, top))
  }

  /** Distinct (term, tf) pairs of a document's non-empty
    * space-separated tokens — one hash-map pass per row. Emitting
    * term frequencies FROM the document row itself (all of a doc's
    * tokens live in one row by construction) means tf needs NO
    * (doc, term) exchange at all: the groupBy(doc, term) an
    * explode-then-aggregate plan shuffles the whole token stream
    * through happens map-side for free. Term order is first-seen
    * (deterministic in the text).
    */
  def termFreqs(text: UTF8String): ArrayData = {
    val parts = text.split(SpaceDelim, -1)
    val freq = new java.util.LinkedHashMap[UTF8String, Integer]()
    var i = 0
    while (i < parts.length) {
      val t = parts(i)
      if (t.numBytes > 0)
        freq.put(t, Integer.valueOf(freq.getOrDefault(t, 0) + 1))
      i += 1
    }
    val out = new Array[Any](freq.size())
    val it = freq.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](e.getKey, e.getValue.intValue()))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Non-overlapping k-token segments of the text's non-empty
    * space-separated tokens, each segment the tokens re-joined with a
    * single space (trailing partial segment kept) — one pass
    * replacing the interpreted
    * `transform(sequence, i -> array_join(slice(filter(split(...)))))`
    * HOF chain of [[graft.operators.Curation.segmentsReference]]
    * (parity spec-gated in CurationSpec).
    */
  def tokenSegments(text: UTF8String, k: Int): ArrayData = {
    val parts = text.split(SpaceDelim, -1)
    var n = 0
    var i = 0
    while (i < parts.length) { // compact non-empty tokens in place
      if (parts(i).numBytes > 0) { parts(n) = parts(i); n += 1 }
      i += 1
    }
    if (n == 0) return new GenericArrayData(new Array[AnyRef](0))
    val nseg = (n + k - 1) / k
    val out = new Array[AnyRef](nseg)
    var s = 0
    while (s < nseg) {
      val from = s * k
      val until = math.min(from + k, n)
      out(s) = UTF8String.concatWs(SpaceDelim,
        java.util.Arrays.copyOfRange(parts, from, until): _*)
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Polynomial rolling hash (base 131, mod 1e9+7) over the ASCII
    * printable projection of the text — one byte-level pass, identical
    * to the interpreted
    * `aggregate(regexp_extract_all(regexp_replace(text, "[^ -~]", ""), "."), ...)`
    * fold in [[graft.functions.TextFns.fingerprintReference]]: bytes
    * outside 0x20..0x7e are exactly the characters `[^ -~]` removes
    * (multi-byte UTF-8 sequences have every byte >= 0x80).
    */
  def fingerprint64(text: UTF8String): Long = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nb = text.numBytes
    var h = 0L
    var i = 0
    while (i < nb) {
      val b = Platform.getByte(base, off + i) & 0xff
      if (b >= 0x20 && b <= 0x7e) h = (h * 131L + b) % 1000000007L
      i += 1
    }
    h
  }

  /** Rolling hashes of every k-token window (the cross-document
    * exact-substring dedup signature, SURVEY §2 H13): token hash =
    * [[fingerprint64]] of the token; window hash = two independent
    * polynomial folds over the k token hashes (bases 10007/10009,
    * mods 1e9+7/1e9+9) packed as `h1 * 1000000009 + h2` — a 60-bit
    * engine-portable value the DuckDB oracle replays with
    * `list_reduce` folds over the same token-hash list. Two moduli
    * because one 30-bit space collides at corpus scale (birthday on
    * ~1e9) while the product space (~1e18) does not. Output index i
    * (0-based) is the window starting at token i; fewer than k tokens
    * yields an empty array. Overflow-safe: every intermediate stays
    * under 2^63 (max ~1.0009e13 inside the folds, ~1.0000000171e18
    * for the packed value).
    */
  def spanHashes(tokens: ArrayData, k: Int): ArrayData = {
    val m = tokens.numElements()
    if (m < k) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](m)
    var i = 0
    while (i < m) { th(i) = fingerprint64(tokens.getUTF8String(i)); i += 1 }
    val out = new Array[Long](m - k + 1)
    var p = 0
    while (p <= m - k) {
      var h1 = 0L
      var h2 = 0L
      var j = p
      while (j < p + k) {
        h1 = (h1 * 10007L + th(j)) % 1000000007L
        h2 = (h2 * 10009L + th(j)) % 1000000009L
        j += 1
      }
      out(p) = h1 * 1000000009L + h2
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Duplicate-n-gram character fraction (the Gopher/RefinedWeb
    * repetition signal family): the fraction of text characters
    * (token bytes, whitespace excluded) covered by at least one
    * occurrence of an n-gram VALUE that appears at two or more start
    * positions in the document. Token n-gram identity is the same
    * 60-bit double-fold window hash as [[spanHashes]] (collisions
    * ~m²/2^60 — negligible per document), so the DuckDB oracle
    * replays it exactly. Character counts are code points, matching
    * SQL `len()`. Returns 0.0 for documents with fewer than n tokens
    * or no characters; the division is one exactly-rounded
    * long/long → double, engine-portable.
    */
  def dupNgramCharFraction(tokens: ArrayData, n: Int): Double = {
    val m = tokens.numElements()
    val lens = new Array[Int](m)
    var total = 0L
    var i = 0
    while (i < m) {
      lens(i) = tokens.getUTF8String(i).numChars
      total += lens(i)
      i += 1
    }
    if (m < n || total == 0L) return 0.0
    val wins = spanHashes(tokens, n)
    val nw = wins.numElements()
    val counts = new java.util.HashMap[java.lang.Long, Integer](nw * 2)
    i = 0
    while (i < nw) {
      counts.merge(wins.getLong(i), 1, (a, b) => a + b)
      i += 1
    }
    val covered = new Array[Boolean](m)
    i = 0
    while (i < nw) {
      if (counts.get(wins.getLong(i)) >= 2) {
        var j = i
        while (j < i + n) { covered(j) = true; j += 1 }
      }
      i += 1
    }
    var cov = 0L
    i = 0
    while (i < m) {
      if (covered(i)) cov += lens(i)
      i += 1
    }
    cov.toDouble / total.toDouble
  }

  /** Reassemble a token list with the closed index ranges
    * [starts(i), ends(i)] removed, single-space joined (the span-trim
    * step of exact-substring dedup). Intervals may overlap or exceed
    * the token range in any order — coverage is marked on a boolean
    * mask, so the result is order-insensitive and clamping is free.
    * Every token covered yields the empty string (never null).
    */
  def removeTokenRanges(tokens: ArrayData, starts: ArrayData,
      ends: ArrayData): UTF8String = {
    val m = tokens.numElements()
    val ni = starts.numElements()
    val covered = new Array[Boolean](m)
    var i = 0
    while (i < ni) {
      var p = math.max(0L, starts.getLong(i)).toInt
      val e = math.min(m - 1L, ends.getLong(i)).toInt
      while (p <= e) { covered(p) = true; p += 1 }
      i += 1
    }
    var kept = 0
    i = 0
    while (i < m) { if (!covered(i)) kept += 1; i += 1 }
    val parts = new Array[UTF8String](kept)
    var o = 0
    i = 0
    while (i < m) {
      if (!covered(i)) { parts(o) = tokens.getUTF8String(i); o += 1 }
      i += 1
    }
    UTF8String.concatWs(SpaceDelim, parts: _*)
  }

  // ---- Geo ---------------------------------------------------------

  /** Even-odd ray casting over a ring of struct(x,y) — one native loop
    * per row, matching [[graft.functions.GeoFns.pointInPolygonReference]]
    * (same strict comparisons and edge arithmetic).
    */
  def rayCast(x: Double, y: Double, ring: ArrayData): Boolean = {
    val n = ring.numElements()
    var crossings = 0L
    var i = 0
    while (i < n - 1) {
      val v1 = ring.getStruct(i, 2)
      val v2 = ring.getStruct(i + 1, 2)
      val x1 = v1.getDouble(0); val y1 = v1.getDouble(1)
      val x2 = v2.getDouble(0); val y2 = v2.getDouble(1)
      if ((y1 > y) != (y2 > y)) {
        val xCross = (x2 - x1) * (y - y1) / (y2 - y1) + x1
        if (x < xCross) crossings += 1
      }
      i += 1
    }
    crossings % 2 == 1
  }

  private def orient(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double): Double =
    (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

  private def onSeg(ax: Double, ay: Double, bx: Double, by: Double,
      px: Double, py: Double): Boolean =
    math.min(ax, bx) <= px && px <= math.max(ax, bx) &&
      math.min(ay, by) <= py && py <= math.max(ay, by)

  /** Segment–segment intersection, boundary-inclusive (collinear
    * touches count — ST_Intersects semantics).
    */
  private def segsIntersect(ax1: Double, ay1: Double, ax2: Double,
      ay2: Double, bx1: Double, by1: Double, bx2: Double, by2: Double)
      : Boolean = {
    val d1 = orient(bx1, by1, bx2, by2, ax1, ay1)
    val d2 = orient(bx1, by1, bx2, by2, ax2, ay2)
    val d3 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    val d4 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) true
    else if (d1 == 0 && onSeg(bx1, by1, bx2, by2, ax1, ay1)) true
    else if (d2 == 0 && onSeg(bx1, by1, bx2, by2, ax2, ay2)) true
    else if (d3 == 0 && onSeg(ax1, ay1, ax2, ay2, bx1, by1)) true
    else d4 == 0 && onSeg(ax1, ay1, ax2, ay2, bx2, by2)
  }

  /** Polygon–polygon ST_Intersects over two closed rings: true when
    * any edge pair crosses or touches, or either ring contains the
    * other (tested via one representative vertex each — sufficient
    * once no edges intersect). An O(n+m) bounding-box precheck guards
    * the O(n·m) edge sweep, so far-apart polygons exit early.
    */
  def ringsIntersect(a: ArrayData, b: ArrayData): Boolean = {
    val na = a.numElements(); val nb = b.numElements()
    if (na < 2 || nb < 2) return false
    // bbox precheck
    var aXmin = Double.MaxValue; var aYmin = Double.MaxValue
    var aXmax = Double.MinValue; var aYmax = Double.MinValue
    var i = 0
    while (i < na) {
      val v = a.getStruct(i, 2)
      val x = v.getDouble(0); val y = v.getDouble(1)
      if (x < aXmin) aXmin = x; if (x > aXmax) aXmax = x
      if (y < aYmin) aYmin = y; if (y > aYmax) aYmax = y
      i += 1
    }
    var bXmin = Double.MaxValue; var bYmin = Double.MaxValue
    var bXmax = Double.MinValue; var bYmax = Double.MinValue
    var j = 0
    while (j < nb) {
      val v = b.getStruct(j, 2)
      val x = v.getDouble(0); val y = v.getDouble(1)
      if (x < bXmin) bXmin = x; if (x > bXmax) bXmax = x
      if (y < bYmin) bYmin = y; if (y > bYmax) bYmax = y
      j += 1
    }
    if (aXmax < bXmin || bXmax < aXmin || aYmax < bYmin || bYmax < aYmin)
      return false
    // edge-pair sweep
    i = 0
    while (i < na - 1) {
      val a1 = a.getStruct(i, 2); val a2 = a.getStruct(i + 1, 2)
      val ax1 = a1.getDouble(0); val ay1 = a1.getDouble(1)
      val ax2 = a2.getDouble(0); val ay2 = a2.getDouble(1)
      j = 0
      while (j < nb - 1) {
        val b1 = b.getStruct(j, 2); val b2 = b.getStruct(j + 1, 2)
        if (segsIntersect(ax1, ay1, ax2, ay2,
            b1.getDouble(0), b1.getDouble(1),
            b2.getDouble(0), b2.getDouble(1))) return true
        j += 1
      }
      i += 1
    }
    // no edge contact: intersects iff one ring contains the other
    val a0 = a.getStruct(0, 2)
    val b0 = b.getStruct(0, 2)
    rayCast(a0.getDouble(0), a0.getDouble(1), b) ||
      rayCast(b0.getDouble(0), b0.getDouble(1), a)
  }

  // ---- Vector ops --------------------------------------------------

  /** Ordered left-to-right dot product of two float arrays in double —
    * the identical addition sequence as the `aggregate(zip_with(...))`
    * reference and the DuckDB `list_reduce` oracle, so results stay
    * bit-portable.
    */
  def dotFloat(a: ArrayData, b: ArrayData): java.lang.Double = {
    // zip_with over unequal lengths pads with null and null elements
    // poison the fold — match that by returning null in both cases.
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Unit-normalize a float vector in ONE pass — bit-exact twin of
    * the declarative `when(norm === 0, vec).otherwise(transform(vec,
    * x => (x / norm).cast("float")))` in
    * [[graft.operators.Similarity.unitReference]]. That form captures
    * the norm subplan inside the lambda, so the O(D) dot re-evaluates
    * for EVERY element — O(D²) per vector, interpreted (the SimHash
    * features lesson, §5.2). Exact parity notes: the sum of float
    * squares cannot underflow to 0.0 in double (min subnormal float²
    * = 2e-90), so acc == 0 ⟺ all elements ±0.0 ⟺ the declarative
    * zero-vector passthrough; a null element poisons the fold to a
    * null norm there, making every output element null — mirrored.
    */
  def unitVec(v: ArrayData): ArrayData = {
    val m = v.numElements()
    var acc = 0.0
    var i = 0
    while (i < m) {
      if (v.isNullAt(i))
        return new GenericArrayData(new Array[Any](m)) // all-null, as x/null
      val f = v.getFloat(i).toDouble
      acc += f * f
      i += 1
    }
    val n = java.lang.Math.sqrt(acc)
    val out = new Array[Any](m)
    i = 0
    if (n == 0.0) { // zero vector passes through unchanged (±0.0f kept)
      while (i < m) { out(i) = v.getFloat(i); i += 1 }
    } else {
      while (i < m) {
        out(i) = (v.getFloat(i).toDouble / n).toFloat
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Product-quantization encode (SURVEY §2 E6b): split the float
    * vector into `m` subvectors and replace each with the id of its
    * nearest codeword — `books` is the flat m*ks*dsub codebook
    * (subspace-major). A 64-float embedding becomes m small ints
    * (bytes at real ks=256): the IO/memory compression that lets a
    * 100-TB embedding corpus scan its candidate side from codes.
    * One map-side call per row, like [[nearestCells]].
    */
  def pqEncode(v: ArrayData, books: ArrayData, m: Int, ks: Int)
      : ArrayData = {
    val dim = v.numElements()
    val dsub = dim / m
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ks) {
        val base = (j * ks + c) * dsub
        var d2 = 0.0
        var i = 0
        while (i < dsub) {
          val d = v.getFloat(j * dsub + i).toDouble -
            books.getDouble(base + i)
          d2 += d * d
          i += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric-distance lookup table for ONE query: table[j*ks+c] =
    * dot(q_subspace_j, codebook[j][c]). Built once per query row
    * (O(ks·dim)) and carried on the broadcast query side, so scoring
    * a candidate is [[adcDot]]'s m lookups instead of a dim-length
    * dot — the table-amortization that makes PQ scoring sublinear in
    * dimension per candidate.
    */
  def adcTable(q: ArrayData, books: ArrayData, m: Int, ks: Int)
      : ArrayData = {
    val dim = q.numElements()
    val dsub = dim / m
    val out = new Array[Double](m * ks)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ks) {
        val base = (j * ks + c) * dsub
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          acc += q.getFloat(j * dsub + i).toDouble *
            books.getDouble(base + i)
          i += 1
        }
        out(j * ks + c) = acc
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Residual-PQ encode (SURVEY §2 E6b's residual variant — the
    * FAISS IVFPQ default): quantize `v − centroid(cell)` instead of
    * `v`. Residuals concentrate around the origin with far smaller
    * variance than raw vectors (the coarse quantizer has already
    * explained the cell-level structure), so the same m·ks code
    * budget spends its codewords on a tighter distribution — lower
    * quantization error, better shortlist recall. `cents` is the
    * flat nlist·dim centroid table (cell-major); the subtraction
    * runs in double before the nearest-codeword search, so no
    * precision is lost to float rounding.
    */
  def pqEncodeResidual(v: ArrayData, cell: Int, cents: ArrayData,
      books: ArrayData, m: Int, ks: Int): ArrayData = {
    val dim = v.numElements()
    val dsub = dim / m
    val cbase = cell * dim
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ks) {
        val base = (j * ks + c) * dsub
        var d2 = 0.0
        var i = 0
        while (i < dsub) {
          val d = v.getFloat(j * dsub + i).toDouble -
            cents.getDouble(cbase + j * dsub + i) -
            books.getDouble(base + i)
          d2 += d * d
          i += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** [[adcTable]] for residual codes, one table per (query, probed
    * cell): entry (j,c) = dot(q_j, centroid(cell)_j + book[j][c]) —
    * the centroid contribution is FOLDED INTO the table, so
    * [[adcDot]]'s m lookups reconstruct dot(q, centroid + residual̂)
    * = the approximate dot against the decoded vector with no extra
    * per-candidate term. Cost: nprobe tables per query instead of
    * one — O(nprobe·ks·dim) doubles on the broadcast query side,
    * still negligible next to the candidate-code scan it amortizes.
    */
  def adcTableResidual(q: ArrayData, cell: Int, cents: ArrayData,
      books: ArrayData, m: Int, ks: Int): ArrayData = {
    val dim = q.numElements()
    val dsub = dim / m
    val cbase = cell * dim
    val out = new Array[Double](m * ks)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ks) {
        val base = (j * ks + c) * dsub
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          acc += q.getFloat(j * dsub + i).toDouble *
            (cents.getDouble(cbase + j * dsub + i) +
              books.getDouble(base + i))
          i += 1
        }
        out(j * ks + c) = acc
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** `v − centroid(cell)` as a float vector — the residual feed the
    * per-subspace codebooks TRAIN on (encode/score subtract in
    * double inside their kernels; training tolerates the float
    * round-trip and keeps the canonical-feed determinism).
    */
  def vecResidual(v: ArrayData, cell: Int, cents: ArrayData)
      : ArrayData = {
    val dim = v.numElements()
    val cbase = cell * dim
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      out(i) = (v.getFloat(i).toDouble -
        cents.getDouble(cbase + i)).toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Approximate dot from PQ codes: sum of m table lookups. */
  def adcDot(codes: ArrayData, table: ArrayData, ks: Int): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var j = 0
    while (j < m) {
      acc += table.getDouble(j * ks + codes.getInt(j))
      j += 1
    }
    acc
  }

  /** SQ8 scalar-quantization encode (the IVF-SQ tier, FAISS
    * IndexIVFScalarQuantizer's QT_8bit shape): per-dimension affine
    * uint8 code against trained [vmin, vmax] bounds —
    * `round(255·(v_i − vmin_i)/(vmax_i − vmin_i))` clamped to
    * [0, 255]; a degenerate dimension (vmax ≤ vmin) encodes 0 and
    * decodes back to vmin. Returned as BINARY — one byte per
    * dimension, the 4× scan-payload compression that is the tier's
    * whole point (PQ is ~64× but lossier; SQ8 is the near-exact
    * middle rung).
    */
  def sq8Encode(v: ArrayData, vmin: ArrayData, vmax: ArrayData)
      : Array[Byte] = {
    val d = v.numElements()
    val out = new Array[Byte](d)
    var i = 0
    while (i < d) {
      val lo = vmin.getDouble(i)
      val hi = vmax.getDouble(i)
      if (hi > lo) {
        val t = math.rint(
          (v.getFloat(i).toDouble - lo) / (hi - lo) * 255.0).toInt
        out(i) = (if (t < 0) 0 else if (t > 255) 255 else t).toByte
      }
      i += 1
    }
    out
  }

  /** Binary (sign) quantization encode — one bit per dimension
    * (bit i = 1 iff v_i > 0), LSB-first within each byte: the 32×
    * tier (vs floats) of the quantization ladder, with NO trained
    * artifact at all — sign is scale-invariant, so raw and unit
    * vectors encode identically and the codes need no bounds,
    * codebook, or rotation to stay valid as the corpus grows.
    */
  def bqEncode(v: ArrayData): Array[Byte] = {
    val d = v.numElements()
    val out = new Array[Byte]((d + 7) >> 3)
    var i = 0
    while (i < d) {
      if (v.getFloat(i) > 0f)
        out(i >> 3) = (out(i >> 3) | (1 << (i & 7))).toByte
      i += 1
    }
    out
  }

  /** Hamming distance between two equal-length bit codes (xor +
    * popcount per byte).
    */
  def bqHamming(a: Array[Byte], b: Array[Byte]): Int = {
    require(a.length == b.length,
      s"bqHamming: code length mismatch (${a.length} vs ${b.length} " +
        "bytes) — query and corpus were sign-encoded at different " +
        "dimensionalities")
    var s = 0
    var i = 0
    while (i < a.length) {
      s += java.lang.Integer.bitCount((a(i) ^ b(i)) & 0xff)
      i += 1
    }
    s
  }

  /** Dot of a float query against an SQ8-coded candidate with the
    * affine decode folded in — Σ q_i·(vmin_i + code_i·Δ_i/255), one
    * pass, no materialized decode array. Accumulates in dimension
    * order (the [[VectorFns.dot]] discipline) so a declarative
    * decode-then-fold replay matches bit-for-bit.
    */
  def sq8Dot(q: ArrayData, codes: Array[Byte], vmin: ArrayData,
      vmax: ArrayData): Double = {
    val d = q.numElements()
    var acc = 0.0
    var i = 0
    while (i < d) {
      val lo = vmin.getDouble(i)
      val hi = vmax.getDouble(i)
      val dec = lo + (codes(i) & 0xff).toDouble * (hi - lo) / 255.0
      acc += q.getFloat(i).toDouble * dec
      i += 1
    }
    acc
  }

  /** Top-`nprobe` nearest centroid cells for a float vector — the IVF
    * coarse-quantizer assignment as ONE map-side kernel call (no
    * crossJoin against the centroid table, no per-id window shuffle).
    * `cents` is the full centroid table as an array-of-arrays literal
    * (cell id = index); distances fold per element in order, matching
    * [[graft.functions.VectorFns.sqDist]], and ties break by lower
    * cell id — the same (d2 ASC, cell ASC) order the previous windowed
    * form used.
    */
  def nearestCells(v: ArrayData, cents: ArrayData, nprobe: Int)
      : ArrayData = {
    val nlist = cents.numElements()
    val k = math.min(nprobe, nlist)
    val bestD = new Array[Double](k)
    val bestC = new Array[Int](k)
    var size = 0
    var c = 0
    while (c < nlist) {
      val cent = cents.getArray(c)
      val dim = math.min(v.numElements(), cent.numElements())
      var d2 = 0.0
      var i = 0
      while (i < dim) {
        val d = v.getFloat(i).toDouble - cent.getDouble(i)
        d2 += d * d
        i += 1
      }
      // stable insertion: strict < keeps earlier (lower) cells on ties
      var pos = size
      while (pos > 0 && d2 < bestD(pos - 1)) pos -= 1
      if (pos < k) {
        var j = math.min(size, k - 1)
        while (j > pos) {
          bestD(j) = bestD(j - 1); bestC(j) = bestC(j - 1); j -= 1
        }
        bestD(pos) = d2; bestC(pos) = c
        if (size < k) size += 1
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bestC, size))
  }

  // ---- Polygon simplification (functions/GeoFns) -------------------

  /** Douglas–Peucker ring simplification with tolerance `eps`
    * (perpendicular distance in coordinate units): endpoints always
    * survive, a CLOSED ring (first == last vertex) stays closed, and
    * every dropped vertex lies within `eps` of the simplified
    * outline — the standard pre-step before shipping zone polygons
    * into per-row point-in-polygon filters (a 2000-vertex municipal
    * boundary costs 2000 edge tests PER ROW in the ray cast; its
    * eps-simplified twin a few dozen). Iterative stack (no recursion
    * depth limits on degenerate inputs); rings with < 3 distinct
    * vertices return unchanged.
    */
  def simplifyRing(ring: ArrayData, eps: Double): ArrayData = {
    val n = ring.numElements()
    if (n < 3) return ring
    val xs = new Array[Double](n)
    val ys = new Array[Double](n)
    var i = 0
    while (i < n) {
      val v = ring.getStruct(i, 2)
      xs(i) = v.getDouble(0); ys(i) = v.getDouble(1)
      i += 1
    }
    val keep = new Array[Boolean](n)
    keep(0) = true; keep(n - 1) = true
    var stack = List((0, n - 1))
    while (stack.nonEmpty) {
      val (a, b) = stack.head
      stack = stack.tail
      if (b - a > 1) {
        val (ax, ay, bx, by) = (xs(a), ys(a), xs(b), ys(b))
        val dx = bx - ax; val dy = by - ay
        val len2 = dx * dx + dy * dy
        var best = -1
        var bd = eps
        var j = a + 1
        while (j < b) {
          // perpendicular distance to segment (degenerate segment →
          // plain point distance)
          val d =
            if (len2 == 0.0)
              math.hypot(xs(j) - ax, ys(j) - ay)
            else
              math.abs(dy * xs(j) - dx * ys(j) + bx * ay - by * ax) /
                math.sqrt(len2)
          if (d > bd) { bd = d; best = j }
          j += 1
        }
        if (best >= 0) {
          keep(best) = true
          stack = (a, best) :: (best, b) :: stack
        }
      }
    }
    val out = new java.util.ArrayList[Any](n)
    i = 0
    while (i < n) {
      if (keep(i)) out.add(new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](xs(i), ys(i))))
      i += 1
    }
    // a CLOSED ring below 4 points (triangle + closure) is no longer
    // a polygon — simplifying must never destroy the geometry, so the
    // original ring passes through instead
    val closed = xs(0) == xs(n - 1) && ys(0) == ys(n - 1)
    if (closed && out.size() < 4) ring
    else new GenericArrayData(out.toArray)
  }

  // ---- PCA projection (operators/Pca) ------------------------------

  /** Project a d-dim float vector onto k principal axes:
    * out(j) = Σ_i (v(i) - mean(i)) · comps(j*d + i). Tight
    * primitive loops; mean/comps ride the plan as literals.
    */
  def pcaProject(v: ArrayData, mean: ArrayData, comps: ArrayData,
      k: Int): ArrayData = {
    val d = mean.numElements()
    val out = new Array[Float](k)
    var j = 0
    while (j < k) {
      var acc = 0.0
      var i = 0
      val base = j * d
      while (i < d) {
        acc += (v.getFloat(i).toDouble - mean.getDouble(i)) *
          comps.getDouble(base + i)
        i += 1
      }
      out(j) = acc.toFloat
      j += 1
    }
    new GenericArrayData(out)
  }

  // ---- Unicode normalization + mojibake repair ---------------------

  /** NFC (canonical composition) normalization — the curation step
    * that makes `café` (e + combining acute) and `café` (precomposed)
    * the SAME string for dedup/fingerprint/equality purposes.
    * Fast path: already-NFC text (the overwhelming majority) returns
    * the input object without re-encoding.
    */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str,
        java.text.Normalizer.Form.NFC))
  }

  /** Repair UTF-8-decoded-as-Windows-1252 mojibake ("Ã©" → "é",
    * "â€™" → "’" — the ftfy core case): re-encode through cp1252
    * (strict — an unmappable char means this is NOT that mojibake)
    * and strictly decode UTF-8; accept only a clean round-trip, else
    * return the input unchanged. Applied up to 3 times for doubly
    * mangled text. Deterministic, never lossy: the repaired bytes ARE
    * the original character sequence re-interpreted.
    */
  def fixMojibake(s: UTF8String): UTF8String = {
    var str = s.toString
    // ASCII fast path: nothing above 0x7F, nothing to repair
    var has8 = false
    var i = 0
    while (i < str.length && !has8) {
      if (str.charAt(i) >= 0x80) has8 = true
      i += 1
    }
    if (!has8) return s
    var rounds = 0
    var changed = true
    while (rounds < 3 && changed) {
      changed = false
      try {
        val enc = java.nio.charset.Charset.forName("windows-1252")
          .newEncoder() // REPORT on unmappable by default
        val bytes = enc.encode(java.nio.CharBuffer.wrap(str))
        val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        val repaired = dec.decode(bytes).toString
        if (repaired != str && repaired.length < str.length) {
          str = repaired
          changed = true
        }
      } catch {
        case _: java.nio.charset.CharacterCodingException => ()
      }
      rounds += 1
    }
    if (str == s.toString) s else UTF8String.fromString(str)
  }

  // ---- BPE tokenizer apply (operators/Bpe) -------------------------

  /** Parsed BPE merge table: rank per adjacent symbol pair (key
    * `left + ' ' + right`), plus a bounded word→tokens cache —
    * token streams are Zipf-distributed, so virtually every word a
    * partition encodes after warm-up is a cache hit and the merge
    * loop runs only for the long tail.
    */
  private final class BpeTable(
      val ranks: java.util.HashMap[String, Integer]) {
    val wordCache =
      new java.util.concurrent.ConcurrentHashMap[String, Array[UTF8String]]()
  }

  /** The merge table rides the plan as ONE string literal (rank order
    * = line order, fields tab-separated). Each task deserializes its
    * own literal instance, so the memo re-keys on content-equality
    * once per task and every subsequent row hits the `eq` fast path.
    * Single volatile pair keeps the (key, table) swap atomic.
    */
  @volatile private var bpeMemo: (UTF8String, BpeTable) = null

  private def bpeTable(merges: UTF8String): BpeTable = {
    val m = bpeMemo
    if (m != null && (m._1 eq merges)) return m._2
    if (m != null && m._1.equals(merges)) {
      bpeMemo = (merges, m._2) // re-key to the new instance
      return m._2
    }
    val ranks = new java.util.HashMap[String, Integer]()
    val lines = merges.toString.split('\n')
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      val tab = l.indexOf('\t')
      if (tab > 0)
        ranks.put(l.substring(0, tab) + ' ' + l.substring(tab + 1),
          Integer.valueOf(i))
      i += 1
    }
    val t = new BpeTable(ranks)
    bpeMemo = (merges, t)
    t
  }

  /** End-of-word marker symbol (Sennrich et al. 2016 BPE): keeps a
    * word-final unit distinct from the same characters mid-word and
    * makes detokenization (`concat tokens, split on marker`) exact.
    */
  val BpeEow = "</w>"

  /** Greedy BPE merge loop for one word: start from Unicode code
    * points + the `</w>` terminal, then repeatedly merge the
    * lowest-rank adjacent pair, left-to-right non-overlapping, until
    * no adjacent pair has a rank. Exhausting merges in rank order is
    * equivalent to the priority-queue formulation because a merge
    * can never create a pair of LOWER rank (that pair's symbols would
    * have had to exist before it during training).
    */
  private def bpeWord(w: String, t: BpeTable): Array[UTF8String] = {
    val cached = t.wordCache.get(w)
    if (cached != null) return cached
    var syms = new java.util.ArrayList[String]()
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(w.substring(i, i + n))
      i += n
    }
    syms.add(BpeEow)
    var done = false
    while (!done && syms.size() > 1) {
      // lowest-rank pair present in the word
      var best = Int.MaxValue
      var bi = -1
      i = 0
      while (i < syms.size() - 1) {
        val r = t.ranks.get(syms.get(i) + ' ' + syms.get(i + 1))
        if (r != null && r.intValue() < best) { best = r.intValue(); bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else {
        // merge ALL its occurrences, left-to-right non-overlapping
        val a = syms.get(bi)
        val b = syms.get(bi + 1)
        val merged = a + b
        val next = new java.util.ArrayList[String](syms.size())
        i = 0
        while (i < syms.size()) {
          if (i < syms.size() - 1 && syms.get(i) == a &&
              syms.get(i + 1) == b) {
            next.add(merged); i += 2
          } else { next.add(syms.get(i)); i += 1 }
        }
        syms = next
      }
    }
    val out = new Array[UTF8String](syms.size())
    i = 0
    while (i < syms.size()) { out(i) = UTF8String.fromString(syms.get(i)); i += 1 }
    // bound the cache: plateau rather than evict — the hot head of a
    // Zipf vocabulary is inserted long before the bound is reached
    if (t.wordCache.size() < (1 << 16)) t.wordCache.put(w, out)
    out
  }

  /** Apply a trained BPE merge table to a text: split on the single
    * space byte (the repo-wide tokenization), encode each word
    * independently, concatenate the sub-token streams. Map-side only;
    * the merge table is a plan literal (see [[bpeTable]]).
    */
  def bpeEncode(text: UTF8String, merges: UTF8String): ArrayData = {
    val table = bpeTable(merges)
    val parts = text.split(SpaceDelim, -1)
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < parts.length) {
      if (parts(i).numBytes > 0) {
        val toks = bpeWord(parts(i).toString, table)
        var j = 0
        while (j < toks.length) { out.add(toks(j)); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  // ---- Column wrappers ---------------------------------------------

  private def invoke(name: String, ret: DataType,
      args: Seq[Column], types: Seq[DataType],
      returnNullable: Boolean = false): Column =
    Bridge.column(StaticInvoke(
      NativeKernels.getClass, ret, name,
      args.map(Bridge.expression),
      inputTypes = types,
      propagateNull = true,
      returnNullable = returnNullable))

  def simHash64Col(tokens: Column): Column =
    invoke("simHash64", LongType, Seq(tokens),
      Seq(ArrayType(StringType)))

  def minHashSignatureCol(shingles: Column, numHashes: Int, seed: Long)
      : Column =
    invoke("minHashSignature", ArrayType(LongType, containsNull = false),
      Seq(shingles, org.apache.spark.sql.functions.lit(numHashes),
        org.apache.spark.sql.functions.lit(seed)),
      Seq(ArrayType(StringType), IntegerType, LongType))

  def minHashFromHashesCol(hashes: Column, numHashes: Int, seed: Long)
      : Column =
    invoke("minHashFromHashes", ArrayType(LongType, containsNull = false),
      Seq(hashes, org.apache.spark.sql.functions.lit(numHashes),
        org.apache.spark.sql.functions.lit(seed)),
      Seq(ArrayType(LongType), IntegerType, LongType))

  def dotFloatCol(a: Column, b: Column): Column =
    invoke("dotFloat", DoubleType, Seq(a, b),
      Seq(ArrayType(FloatType), ArrayType(FloatType)),
      returnNullable = true)

  def unitVecCol(v: Column): Column =
    invoke("unitVec", ArrayType(FloatType, containsNull = true),
      Seq(v), Seq(ArrayType(FloatType)))

  def nearestCellsCol(v: Column, cents: Column, nprobe: Column): Column =
    invoke("nearestCells", ArrayType(IntegerType, containsNull = false),
      Seq(v, cents, nprobe),
      Seq(ArrayType(FloatType), ArrayType(ArrayType(DoubleType)),
        IntegerType))

  def pqEncodeCol(v: Column, books: Column, m: Int, ks: Int): Column =
    invoke("pqEncode", ArrayType(IntegerType, containsNull = false),
      Seq(v, books, org.apache.spark.sql.functions.lit(m),
        org.apache.spark.sql.functions.lit(ks)),
      Seq(ArrayType(FloatType), ArrayType(DoubleType), IntegerType,
        IntegerType))

  def adcTableCol(q: Column, books: Column, m: Int, ks: Int): Column =
    invoke("adcTable", ArrayType(DoubleType, containsNull = false),
      Seq(q, books, org.apache.spark.sql.functions.lit(m),
        org.apache.spark.sql.functions.lit(ks)),
      Seq(ArrayType(FloatType), ArrayType(DoubleType), IntegerType,
        IntegerType))

  def bqEncodeCol(v: Column): Column =
    invoke("bqEncode", BinaryType, Seq(v), Seq(ArrayType(FloatType)))

  def bqHammingCol(a: Column, b: Column): Column =
    invoke("bqHamming", IntegerType, Seq(a, b),
      Seq(BinaryType, BinaryType))

  def sq8EncodeCol(v: Column, vmin: Column, vmax: Column): Column =
    invoke("sq8Encode", BinaryType, Seq(v, vmin, vmax),
      Seq(ArrayType(FloatType), ArrayType(DoubleType),
        ArrayType(DoubleType)))

  def sq8DotCol(q: Column, codes: Column, vmin: Column,
      vmax: Column): Column =
    invoke("sq8Dot", DoubleType, Seq(q, codes, vmin, vmax),
      Seq(ArrayType(FloatType), BinaryType, ArrayType(DoubleType),
        ArrayType(DoubleType)))

  def adcDotCol(codes: Column, table: Column, ks: Int): Column =
    invoke("adcDot", DoubleType,
      Seq(codes, table, org.apache.spark.sql.functions.lit(ks)),
      Seq(ArrayType(IntegerType), ArrayType(DoubleType), IntegerType))

  def pqEncodeResidualCol(v: Column, cell: Column, cents: Column,
      books: Column, m: Int, ks: Int): Column =
    invoke("pqEncodeResidual",
      ArrayType(IntegerType, containsNull = false),
      Seq(v, cell, cents, books,
        org.apache.spark.sql.functions.lit(m),
        org.apache.spark.sql.functions.lit(ks)),
      Seq(ArrayType(FloatType), IntegerType, ArrayType(DoubleType),
        ArrayType(DoubleType), IntegerType, IntegerType))

  def adcTableResidualCol(q: Column, cell: Column, cents: Column,
      books: Column, m: Int, ks: Int): Column =
    invoke("adcTableResidual",
      ArrayType(DoubleType, containsNull = false),
      Seq(q, cell, cents, books,
        org.apache.spark.sql.functions.lit(m),
        org.apache.spark.sql.functions.lit(ks)),
      Seq(ArrayType(FloatType), IntegerType, ArrayType(DoubleType),
        ArrayType(DoubleType), IntegerType, IntegerType))

  def vecResidualCol(v: Column, cell: Column, cents: Column): Column =
    invoke("vecResidual", ArrayType(FloatType, containsNull = false),
      Seq(v, cell, cents),
      Seq(ArrayType(FloatType), IntegerType, ArrayType(DoubleType)))

  def mortonValueCol(a: Column, b: Column): Column =
    invoke("mortonValue", LongType, Seq(a, b), Seq(LongType, LongType))

  def hilbertValueCol(a: Column, b: Column): Column =
    invoke("hilbertValue", LongType, Seq(a, b), Seq(LongType, LongType))

  /** struct<id1,id2,dist> element type of [[fuzzyPairs]] output. */
  val fuzzyPairType: DataType = StructType(Seq(
    StructField("id1", LongType, nullable = false),
    StructField("id2", LongType, nullable = false),
    StructField("dist", IntegerType, nullable = false)))

  def fuzzyPairsCol(entries: Column, maxDist: Int): Column =
    invoke("fuzzyPairs", ArrayType(fuzzyPairType, containsNull = false),
      Seq(entries, org.apache.spark.sql.functions.lit(maxDist)),
      Seq(ArrayType(StructType(Seq(
        StructField("id", LongType), StructField("nm", StringType)))),
        IntegerType))

  /** struct<id1,id2,n1,n2> element type of [[idPairsWithCard]] output. */
  val idPairCardType: DataType = StructType(Seq(
    StructField("id1", LongType, nullable = false),
    StructField("id2", LongType, nullable = false),
    StructField("n1", LongType, nullable = false),
    StructField("n2", LongType, nullable = false)))

  def idPairsWithCardCol(ids: Column, ns: Column, threshold: Double): Column =
    invoke("idPairsWithCard", ArrayType(idPairCardType, containsNull = false),
      Seq(ids, ns, org.apache.spark.sql.functions.lit(threshold)),
      Seq(ArrayType(LongType), ArrayType(LongType), DoubleType))

  /** struct<pk,nc> element type of [[idPairsPacked]] output. */
  val idPairPackedType: DataType = StructType(Seq(
    StructField("pk", LongType, nullable = false),
    StructField("nc", LongType, nullable = false)))

  def idPairsPackedCol(ids: Column, ns: Column, threshold: Double): Column =
    invoke("idPairsPacked", ArrayType(idPairPackedType, containsNull = false),
      Seq(ids, ns, org.apache.spark.sql.functions.lit(threshold)),
      Seq(ArrayType(LongType), ArrayType(LongType), DoubleType))

  def idPairsFromPostingsCol(packed: Column, threshold: Double): Column =
    invoke("idPairsFromPostings",
      ArrayType(idPairPackedType, containsNull = false),
      Seq(packed, org.apache.spark.sql.functions.lit(threshold)),
      Seq(ArrayType(LongType), DoubleType))

  def simHashPortable60Col(tokens: Column): Column =
    invoke("simHashPortable60", LongType, Seq(tokens),
      Seq(ArrayType(StringType)))

  def dsirBucketsCol(words: Column, buckets: Int): Column =
    invoke("dsirBuckets", ArrayType(IntegerType, containsNull = false),
      Seq(words, org.apache.spark.sql.functions.lit(buckets)),
      Seq(ArrayType(StringType), IntegerType))

  def dsirSumLongCol(words: Column, table: Column, buckets: Int): Column =
    invoke("dsirSumLong", LongType,
      Seq(words, table, org.apache.spark.sql.functions.lit(buckets)),
      Seq(ArrayType(StringType), ArrayType(LongType), IntegerType))

  def dsirSumDoubleCol(words: Column, table: Column, buckets: Int): Column =
    invoke("dsirSumDouble", DoubleType,
      Seq(words, table, org.apache.spark.sql.functions.lit(buckets)),
      Seq(ArrayType(StringType), ArrayType(DoubleType), IntegerType))

  def charGramFreqCol(text: Column, n: Int, buckets: Int): Column =
    invoke("charGramFreq", ArrayType(DoubleType, containsNull = false),
      Seq(text, org.apache.spark.sql.functions.lit(n),
        org.apache.spark.sql.functions.lit(buckets)),
      Seq(StringType, IntegerType, IntegerType))

  def denseArgmaxCol(x: Column, w: Column, nClasses: Int): Column =
    invoke("denseArgmax", IntegerType,
      Seq(x, w, org.apache.spark.sql.functions.lit(nClasses)),
      Seq(ArrayType(DoubleType), ArrayType(DoubleType), IntegerType))

  /** struct<term,tf> element type of [[termFreqs]] output. */
  val termFreqType: DataType = StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", IntegerType, nullable = false)))

  def termFreqsCol(text: Column): Column =
    invoke("termFreqs", ArrayType(termFreqType, containsNull = false),
      Seq(text), Seq(StringType))

  def pcaProjectCol(vec: Column, mean: Array[Double],
      comps: Array[Double], k: Int): Column =
    invoke("pcaProject", ArrayType(FloatType, containsNull = false),
      Seq(vec, org.apache.spark.sql.functions.typedlit(mean),
        org.apache.spark.sql.functions.typedlit(comps),
        org.apache.spark.sql.functions.lit(k)),
      Seq(ArrayType(FloatType), ArrayType(DoubleType),
        ArrayType(DoubleType), IntegerType))

  def nfcNormalizeCol(text: Column): Column =
    invoke("nfcNormalize", StringType, Seq(text), Seq(StringType))

  def fixMojibakeCol(text: Column): Column =
    invoke("fixMojibake", StringType, Seq(text), Seq(StringType))

  def bpeEncodeCol(text: Column, merges: String): Column =
    invoke("bpeEncode", ArrayType(StringType, containsNull = false),
      Seq(text, org.apache.spark.sql.functions.lit(merges)),
      Seq(StringType, StringType))

  def sortedIntersectCountCol(a: Column, b: Column): Column =
    invoke("sortedIntersectCount", IntegerType, Seq(a, b),
      Seq(ArrayType(LongType), ArrayType(LongType)))

  def wordShingleHashesCol(tokens: Column, n: Int): Column =
    invoke("wordShingleHashes", ArrayType(LongType, containsNull = false),
      Seq(tokens, org.apache.spark.sql.functions.lit(n)),
      Seq(ArrayType(StringType), IntegerType))

  def wordShinglePortableHashesCol(tokens: Column, n: Int): Column =
    invoke("wordShinglePortableHashes",
      ArrayType(LongType, containsNull = false),
      Seq(tokens, org.apache.spark.sql.functions.lit(n)),
      Seq(ArrayType(StringType), IntegerType))

  def tokenCountsCol(text: Column, words: Seq[String]): Column =
    invoke("tokenCounts", ArrayType(IntegerType, containsNull = false),
      Seq(text, org.apache.spark.sql.functions.array(
        words.map(org.apache.spark.sql.functions.lit): _*)),
      Seq(StringType, ArrayType(StringType)))

  def wordStatsCol(text: Column): Column =
    invoke("wordStats", ArrayType(IntegerType, containsNull = false),
      Seq(text), Seq(StringType))

  def fingerprint64Col(text: Column): Column =
    invoke("fingerprint64", LongType, Seq(text), Seq(StringType))

  def spanHashesCol(tokens: Column, k: Int): Column = {
    require(k >= 1, s"spanHashes: k must be >= 1, got $k")
    invoke("spanHashes", ArrayType(LongType, containsNull = false),
      Seq(tokens, org.apache.spark.sql.functions.lit(k)),
      Seq(ArrayType(StringType), IntegerType))
  }

  def removeTokenRangesCol(tokens: Column, starts: Column,
      ends: Column): Column =
    invoke("removeTokenRanges", StringType, Seq(tokens, starts, ends),
      Seq(ArrayType(StringType), ArrayType(LongType), ArrayType(LongType)))

  def dupNgramCharFractionCol(tokens: Column, n: Int): Column = {
    require(n >= 1, s"dupNgramCharFraction: n must be >= 1, got $n")
    invoke("dupNgramCharFraction", DoubleType,
      Seq(tokens, org.apache.spark.sql.functions.lit(n)),
      Seq(ArrayType(StringType), IntegerType))
  }

  def tokenSegmentsCol(text: Column, k: Int): Column = {
    require(k >= 1, s"tokenSegments: k must be >= 1, got $k")
    invoke("tokenSegments", ArrayType(StringType, containsNull = false),
      Seq(text, org.apache.spark.sql.functions.lit(k)),
      Seq(StringType, IntegerType))
  }

  def wordShinglesCol(tokens: Column, n: Int): Column =
    invoke("wordShingles", ArrayType(StringType, containsNull = false),
      Seq(tokens, org.apache.spark.sql.functions.lit(n)),
      Seq(ArrayType(StringType), IntegerType))

  def wordNGramsCol(tokens: Column, n: Int): Column = {
    require(n >= 1, s"wordNGrams: n must be >= 1, got $n")
    invoke("wordNGrams", ArrayType(StringType, containsNull = false),
      Seq(tokens, org.apache.spark.sql.functions.lit(n)),
      Seq(ArrayType(StringType), IntegerType))
  }

  def bloomMightContainCol(key: Column, bits: Array[Long], k: Int): Column =
    invoke("bloomMightContain", BooleanType,
      Seq(key, org.apache.spark.sql.functions.typedlit(bits),
        org.apache.spark.sql.functions.lit(k)),
      Seq(LongType, ArrayType(LongType), IntegerType))

  /** [[bloomMightContainCol]] with the bitset AND probe count as
    * columns — the bloom-index pruning job probes many per-file
    * blooms (each its own size/k) in one pass.
    */
  def bloomMightContainColK(key: Column, bits: Column, k: Column): Column =
    invoke("bloomMightContain", BooleanType, Seq(key, bits, k),
      Seq(LongType, ArrayType(LongType), IntegerType))

  /** The ring struct type shared by GeoFns and the bbox-pruning rule. */
  val ringType: DataType = ArrayType(
    StructType(Seq(StructField("x", DoubleType), StructField("y", DoubleType))))

  def simplifyRingCol(ring: Column, eps: Double): Column =
    invoke("simplifyRing", ringType, Seq(ring,
      org.apache.spark.sql.functions.lit(eps)),
      Seq(ringType, DoubleType))

  def rayCastCol(x: Column, y: Column, ring: Column): Column =
    invoke("rayCast", BooleanType, Seq(x, y, ring),
      Seq(DoubleType, DoubleType, ringType))

  def ringsIntersectCol(a: Column, b: Column): Column =
    invoke("ringsIntersect", BooleanType, Seq(a, b),
      Seq(ringType, ringType))

  // ---- GeoJSON geometry -> WKT (sources/GeoJsonIngest) ----

  /** Minimal nested-array parse tree for GeoJSON `coordinates`: a
    * leaf keeps the raw number token (no double round-trip — the WKT
    * carries the source text's exact decimal form).
    */
  private sealed trait GjNode
  private final case class GjNum(s: String) extends GjNode
  private final case class GjArr(xs: List[GjNode]) extends GjNode

  private def gjParse(s: String): GjNode = {
    var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def node(): GjNode = {
      ws()
      if (i >= s.length) throw new IllegalArgumentException("eof")
      if (s.charAt(i) == '[') {
        i += 1
        val b = List.newBuilder[GjNode]
        ws()
        if (i < s.length && s.charAt(i) == ']') { i += 1; return GjArr(Nil) }
        var done = false
        while (!done) {
          b += node()
          ws()
          if (i < s.length && s.charAt(i) == ',') i += 1
          else if (i < s.length && s.charAt(i) == ']') { i += 1; done = true }
          else throw new IllegalArgumentException(s"bad array at $i")
        }
        GjArr(b.result())
      } else {
        val start = i
        while (i < s.length &&
            "+-.eE0123456789".indexOf(s.charAt(i)) >= 0) i += 1
        if (i == start)
          throw new IllegalArgumentException(s"bad token at $i")
        val tok = s.substring(start, i)
        java.lang.Double.parseDouble(tok) // validate numeric
        GjNum(tok)
      }
    }
    val root = node()
    ws()
    if (i != s.length) throw new IllegalArgumentException("trailing junk")
    root
  }

  /** A GeoJSON position [x, y(, z)] as "x y" / "x y z". */
  private def gjPos(n: GjNode): String = n match {
    case GjArr(xs) if xs.length == 2 || xs.length == 3 =>
      xs.map { case GjNum(t) => t
        case _ => throw new IllegalArgumentException("nested pos") }
        .mkString(" ")
    case _ => throw new IllegalArgumentException("not a position")
  }

  private def gjSeq(n: GjNode, f: GjNode => String): String = n match {
    case GjArr(xs) if xs.nonEmpty => xs.map(f).mkString("(", ", ", ")")
    case _ => throw new IllegalArgumentException("not a sequence")
  }

  /** GeoJSON (geometry type, raw `coordinates` JSON) -> WKT, the
    * conversion the reference performs with GeoPandas'
    * `gdf.geometry.to_wkt()` (mobility_ingestion_pipeline.py:95).
    * Null (not an error) for unsupported types or malformed
    * coordinates — junk geometry rows must not kill a bronze scan.
    */
  def geoJsonToWkt(geomType: UTF8String, coords: UTF8String)
      : UTF8String = {
    if (geomType == null || coords == null) return null
    try {
      val n = gjParse(coords.toString)
      val wkt = geomType.toString.toUpperCase(java.util.Locale.ROOT) match {
        case "POINT" => s"POINT (${gjPos(n)})"
        case "LINESTRING" => s"LINESTRING ${gjSeq(n, gjPos)}"
        case "POLYGON" => s"POLYGON ${gjSeq(n, gjSeq(_, gjPos))}"
        case "MULTIPOINT" =>
          s"MULTIPOINT ${gjSeq(n, p => s"(${gjPos(p)})")}"
        case "MULTILINESTRING" =>
          s"MULTILINESTRING ${gjSeq(n, gjSeq(_, gjPos))}"
        case "MULTIPOLYGON" =>
          s"MULTIPOLYGON ${gjSeq(n, gjSeq(_, gjSeq(_, gjPos)))}"
        case _ => return null
      }
      UTF8String.fromString(wkt)
    } catch { case _: IllegalArgumentException => null }
  }

  def geoJsonToWktCol(geomType: Column, coords: Column): Column =
    invoke("geoJsonToWkt", StringType, Seq(geomType, coords),
      Seq(StringType, StringType), returnNullable = true)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection (SURVEY.md §2 E2) — the
  * standard sub-quadratic pipeline: shingle → 64-bit shingle hashes →
  * k-permutation MinHash signature → band the signature → bucket-join
  * candidates → verify with exact Jaccard.
  *
  * Scale notes: this is the 100-TB near-dedup path. Candidate
  * generation shuffles only (band, bucket-hash, doc_id) triples — the
  * join key space is the LSH buckets, never all-pairs. With b bands of
  * r rows, P(candidate) ≈ 1-(1-j^r)^b — and that curve must be tuned
  * to the VERIFY threshold: 16 bands × 4 rows catches j ≥ 0.7 pairs
  * with > 98.7% probability but a boundary j = 0.5 pair only ~64% of
  * the time, silently under-recalling. [[nearDuplicates]] therefore
  * derives its banding from the threshold ([[autoBands]]) unless the
  * caller pins one. The exact-Jaccard verify runs only on surviving
  * candidates.
  */
object MinHashLsh {

  /** Bands count whose banding catches a boundary-similarity pair
    * (jaccard == threshold) with probability >= targetCatch, using the
    * LARGEST rows-per-band that still qualifies — more rows per band =
    * sharper S-curve = fewer sub-threshold candidate collisions to
    * verify. threshold 0.5 → 32 bands × 2 rows (99.99% at j=0.5);
    * threshold 0.7 → 16 bands × 4 rows (98.8% at j=0.7).
    */
  def autoBands(numHashes: Int, threshold: Double,
      targetCatch: Double = 0.98): Int = {
    val r = (numHashes to 1 by -1)
      .filter(numHashes % _ == 0)
      .find { r =>
        val b = numHashes / r
        1.0 - math.pow(1.0 - math.pow(threshold, r), b) >= targetCatch
      }.getOrElse(1)
    numHashes / r
  }

  /** 2^31-1: permutations live in 31-bit space so a*h + b stays under
    * 2^62 — no long overflow under ANSI arithmetic.
    */
  private val MersennePrime = (1L << 31) - 1

  /** Deterministic permutation coefficients — shared with the native
    * kernel so both implementations always agree.
    */
  private def perms(numHashes: Int, seed: Long): Seq[(Long, Long)] = {
    val ab = graft.expressions.NativeKernels.perms(numHashes, seed)
    (0 until numHashes).map(k => (ab(2 * k), ab(2 * k + 1)))
  }

  /** MinHash signature (array<long>, length numHashes) of a document's
    * shingle set — native kernel
    * ([[graft.expressions.NativeKernels.minHashSignature]]): one
    * xx-hash per shingle and a tight perm loop, invoked from generated
    * code. Parity with [[signatureReference]] is spec-gated.
    */
  def signature(shingleSet: Column, numHashes: Int = 64,
      seed: Long = 42L): Column =
    graft.expressions.NativeKernels
      .minHashSignatureCol(shingleSet, numHashes, seed)

  /** Declarative reference implementation: ONE fold over the shingles
    * carrying a numHashes-slot min accumulator, so each shingle is
    * hashed once and each permutation multiply happens once (64
    * separate array_min passes would re-evaluate the whole shingle
    * pipeline per permutation — measured 28× slower).
    */
  def signatureReference(shingleSet: Column, numHashes: Int = 64,
      seed: Long = 42L): Column = {
    val ps = perms(numHashes, seed)
    val hashes = transform(shingleSet, s =>
      pmod(xxhash64(s), lit(MersennePrime)))
    aggregate(hashes,
      array_repeat(lit(MersennePrime), numHashes),
      (acc, h) => array(ps.zipWithIndex.map { case ((a, b), i) =>
        least(element_at(acc, i + 1),
          pmod(h * lit(a) + lit(b), lit(MersennePrime)))
      }: _*))
  }

  /** MinHash signature from PRE-HASHED shingles ([[Dedup.shingleHashes]]
    * output) — bit-identical to [[signature]] on the same document
    * (the string form's first step IS the xx-hash; min-over-set is
    * order-independent), spec-gated. The one-corpus-scan pipeline's
    * form: shingle+hash once, derive signature AND verify sets from it.
    */
  def signatureFromHashes(shingleHashes: Column, numHashes: Int = 64,
      seed: Long = 42L): Column =
    graft.expressions.NativeKernels
      .minHashFromHashesCol(shingleHashes, numHashes, seed)

  /** The per-document shingle-hash frame every stage derives from:
    * (doc_id, sorted array of 8-byte shingle hashes). Sorted ONCE here
    * because the verify kernel ([[graft.expressions.NativeKernels
    * .sortedIntersectCount]]) wants sorted inputs; docs too short to
    * shingle are dropped (they cannot pair).
    */
  private def hashedShingles(df: DataFrame, idCol: String,
      textCol: String, shingleN: Int, portable: Boolean = false)
      : DataFrame = {
    val hashes =
      if (portable) Dedup.shinglePortableHashes(col(textCol), shingleN)
      else Dedup.shingleHashes(col(textCol), shingleN)
    df.select(col(idCol).as("doc_id"), sort_array(hashes).as("sh"))
      .filter(size(col("sh")) > 0)
  }

  /** The banded LSH index over a shingle-hash frame: one row per
    * (doc, band) with the band's bucket hash.
    */
  private[graft] def bandedIndex(sh: DataFrame, numHashes: Int,
      bands: Int, seed: Long, portable: Boolean = false): DataFrame =
    bandRows(sh.select(col("doc_id"),
      signatureFromHashes(col("sh"), numHashes, seed).as("sig")),
      numHashes, bands, portable)

  /** Bucket value of one band's signature slice. Default: xxhash64 of
    * the slice's string form (best mixing). Portable: the polynomial
    * fold acc = (acc * 131 + s_k) mod 1e9+7 over the slice — plain
    * integer arithmetic a DuckDB oracle replays term by term, which
    * is what lets the production capped configuration hash-gate
    * end to end (signature values are < 2^31, so every product stays
    * under 2^62).
    */
  private def bucketOf(slice: Column, portable: Boolean): Column =
    if (!portable) xxhash64(slice.cast("string"))
    else aggregate(slice, lit(0L),
      (acc, s) => pmod(acc * lit(131L) + s, lit(1000000007L)))

  /** The ONE bucket-layout implementation: band rows from a
    * (doc_id, sig) frame. Both signature producers (the per-doc
    * kernel fold and the instance-stream min aggregate) feed this, so
    * their buckets can never diverge.
    */
  private def bandRows(sig: DataFrame, numHashes: Int, bands: Int,
      portable: Boolean = false, extra: Seq[String] = Nil): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val keep = col("doc_id") +: extra.map(col)
    sig.select(keep :+ explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          bucketOf(slice(col("sig"), b * rows + 1, rows), portable)
            .as("bucket"))): _*)).as("bb"): _*)
      .select(keep :+ col("bb.band") :+ col("bb.bucket"): _*)
  }

  /** Banded index from an INSTANCE frame (doc_id, h) — the
    * ban-filtered signature path. Re-assembling per-doc hash arrays
    * just to fold them again costs a corpus-wide collect_list shuffle
    * plus the array-build (measured 28.3 s of the 92 s sf10ov
    * candidate stage); instead the signature IS an aggregate —
    * sig_k = min over instances of (a_k·(h mod P) + b_k) mod P — so a
    * 64-way min groupBy computes it with map-side partial combine:
    * the shuffle carries numHashes longs per DOC, not per instance.
    * Bit-parity with `bandedIndex ∘ signatureInput` is spec-gated
    * (identical integer arithmetic to the kernel fold; min is
    * order-free; a doc with zero surviving instances disappears from
    * banding in both forms).
    */
  private def bandedFromInstances(inst: DataFrame, numHashes: Int,
      bands: Int, seed: Long, portable: Boolean = false): DataFrame =
    bandRows(sigFromInstances(inst, numHashes, seed), numHashes, bands,
      portable)

  /** The (doc_id, sig) frame from an instance stream — the signature
    * half of [[bandedFromInstances]], exposed separately so the
    * capped pipelines can PIN signatures (one row per doc) instead of
    * band rows (bands× that — at the 5M-doc ladder tier the band-row
    * checkpoint was 160M rows and the scratch-disk wall; see
    * [[bucketPairsFromSig]]).
    */
  private def sigFromInstances(inst: DataFrame, numHashes: Int,
      seed: Long, keys: Seq[String] = Seq("doc_id")): DataFrame = {
    val P = MersennePrime
    val hm = pmod(col("h"), lit(P))
    val ps = perms(numHashes, seed)
    val mins = ps.zipWithIndex.map { case ((a, b), k) =>
      min(pmod(hm * lit(a) + lit(b), lit(P))).as(s"__s$k") }
    // extra grouping keys (r16): the cross-corpus joint path tags each
    // instance with its side and aggregates BOTH corpora in one pass —
    // a side flag is functionally dependent on doc_id within a side,
    // so (doc_id, side) groups are exactly the per-side doc groups.
    inst.groupBy(keys.map(col): _*)
      .agg(mins.head, mins.tail: _*)
      .select(keys.map(col) :+ array(
        (0 until numHashes).map(k => col(s"__s$k")): _*).as("sig"): _*)
  }

  /** The (doc_id, sig) frame under the sigMaxDf dial: the per-doc
    * kernel fold when off, the instance-stream min aggregate under a
    * self census when on.
    */
  private def sigMaybeCut(sh: DataFrame, numHashes: Int, seed: Long,
      sigMaxDf: Int, census: Option[DataFrame] = None): DataFrame =
    if (sigMaxDf <= 0)
      sh.select(col("doc_id"),
        signatureFromHashes(col("sh"), numHashes, seed).as("sig"))
    else
      sigFromInstances(
        sh.select(col("doc_id"), explode(col("sh")).as("h"))
          .join(census.getOrElse(dfCensus(sh))
            .filter(col("df") > sigMaxDf).select("h"), Seq("h"),
            "left_anti"),
        numHashes, seed)

  /** Ban-filtered banded index: drop `banned` (an `h`-column frame)
    * from the instance stream, then band via the min-aggregate path.
    */
  private[graft] def bandedCut(sh: DataFrame, banned: DataFrame,
      numHashes: Int, bands: Int, seed: Long,
      portable: Boolean = false): DataFrame =
    bandedFromInstances(
      sh.select(col("doc_id"), explode(col("sh")).as("h"))
        .join(banned.select(col("h")), Seq("h"), "left_anti"),
      numHashes, bands, seed, portable)

  /** Bucket self-join over a signature frame's banded index: distinct
    * (id1 < id2) pairs colliding in at least one band. merge hint:
    * the banded table is bands× the corpus — never broadcast it (see
    * Dedup.ngramJaccard); shuffle on (band,bucket) and let AQE split
    * hot buckets.
    *
    * `maxBucket > 0` drops buckets holding more than that many docs
    * BEFORE pair generation — the production-LSH "stop bucket" dial.
    * A bucket of B members emits B² pairs inside ONE task (a same-key
    * join is irreducible — AQE cannot split a single key), so one
    * degenerate bucket at 100 TB stalls the stage; a bucket that
    * common also carries ~zero discriminative signal. Recall
    * contract: a true pair is lost only if EVERY band it collides in
    * is oversized — with exact-dedup upstream (the pipe_clean_corpus
    * composition) near-dup groups are small and this probability is
    * negligible; WITHOUT exact-dedup, exact duplicates share all
    * bands and a cap WILL drop them — dedup exactly first. 0 = off
    * (the gated queries' semantics).
    */
  private def bucketJoin(sig: DataFrame, numHashes: Int, bands: Int,
      portable: Boolean, maxBucket: Int): DataFrame =
    bucketPairsRaw(sig, numHashes, bands, portable, maxBucket)
      .distinct()

  /** [[bucketJoin]] WITHOUT the pair dedup: one row per (pair, band
    * collision). The verify chain dedups these keyed by id1
    * ([[dedupKeyed]]) so the dedup's exchange doubles as the first
    * verify join's partitioning — `.distinct()` here would insert a
    * separate (id1,id2) exchange the very next operator re-shuffles.
    * Map-side pre-dedup loses nothing: a pair's duplicate rows come
    * from DIFFERENT bands, which live in different (band,bucket)
    * partitions, so a local combine never saw them together anyway.
    *
    * Takes the SIGNATURE frame, not band rows: the capped path must
    * pin its input (the bucket census and the join side both consume
    * it), and a signature checkpoint is one row per DOC where a
    * band-row checkpoint is bands× that — at the 5M-doc open-vocab
    * ladder tier the band-row pin was 160M rows and (together with
    * the join's shuffle spill) the single-box scratch-disk wall
    * (§5.2 r15). Band rows are a cheap projection of the pinned
    * signatures, re-derived per consumer.
    */
  private def bucketPairsRaw(sig: DataFrame, numHashes: Int,
      bands: Int, portable: Boolean, maxBucket: Int): DataFrame = {
    val side =
      if (maxBucket <= 0) bandRows(sig, numHashes, bands, portable)
      else {
        val sp = sig.localCheckpoint()
        val b = bandRows(sp, numHashes, bands, portable)
        b.join(
          b.groupBy(col("band"), col("bucket"))
            .agg(count(lit(1)).as("__n"))
            .filter(col("__n") <= maxBucket)
            .select(col("band"), col("bucket")),
          Seq("band", "bucket"), "left_semi")
      }
    side.as("a").join(side.as("b").hint("merge"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
  }

  /** Distinct pairs, partitioned by id1: HashPartitioning(id1)
    * satisfies the (id1,id2) dedup's clustering requirement (rows
    * agreeing on both keys agree on id1), and it IS the distribution
    * the id1 verify join needs — one exchange serves both, where
    * `.distinct()` + join cost two back-to-back pair-stream shuffles.
    */
  private[operators] def dedupKeyed(rawPairs: DataFrame): DataFrame =
    rawPairs.repartition(col("id1")).dropDuplicates("id1", "id2")

  /** THE exact-verify tail shared by the self-join, cross-corpus and
    * persisted-index paths: candidates (id1, id2) against two pinned
    * (doc_id, sh) frames → (id1, id2, jaccard >= threshold).
    *
    * Size prefilter first (r15, the 5M-doc ladder finding): jaccard =
    * inter/(n1+n2-inter) <= min/max, so a pair whose smaller set is
    * under threshold × the larger CANNOT qualify — the same
    * cardinality filter [[graft.expressions.NativeKernels
    * .idPairsFromPostings]] applies at pair emission (identical
    * double arithmetic). The verify joins attach each doc's FULL
    * shingle-hash array to every candidate row, so the pair stream's
    * exchange payload is candidates × two arrays — at 5M docs / 77.7M
    * candidates that was ~60 GB of shuffle+spill and the single-box
    * scratch wall. The size joins carry ONE LONG per side; only
    * size-compatible pairs ever ship arrays.
    */
  private[operators] def verifyPairs(cands: DataFrame, shLeft: DataFrame,
      shRight: DataFrame, threshold: Double): DataFrame = {
    val inter = graft.expressions.NativeKernels
      .sortedIntersectCountCol(col("sh1"), col("sh2"))
    cands
      .join(shLeft.select(col("doc_id").as("id1"),
        size(col("sh")).as("n1")), "id1")
      .join(shRight.select(col("doc_id").as("id2"),
        size(col("sh")).as("n2")), "id2")
      .filter(least(col("n1"), col("n2")).cast("double") >=
        lit(threshold) * greatest(col("n1"), col("n2")).cast("double"))
      .join(shLeft.select(col("doc_id").as("id1"), col("sh").as("sh1")),
        "id1")
      .join(shRight.select(col("doc_id").as("id2"), col("sh").as("sh2")),
        "id2")
      .select(col("id1"), col("id2"),
        (inter.cast("double") /
          (col("n1") + col("n2") - inter).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Signature-input frame with head shingles removed (r14, measured
    * on the two-decade open-vocab ladder): on Zipfian text the head
    * shingles' hashes are the minimum for many permutations at once,
    * so UNRELATED documents share signature rows and whole bands —
    * maxBucket only trims the extreme tail of the resulting bucket
    * histogram, and the mid-size degenerate buckets still grew the
    * candidate set 21× for 10× docs (3.9M → 83M pairs, sf1ov →
    * sf10ov). A shingle appearing in more than `sigMaxDf` documents
    * certifies nothing about any single pair (ngramJaccard's maxDf
    * posture), so it is dropped from the SIGNATURE input only — the
    * exact-Jaccard verify still scores the FULL shingle sets.
    * Distributed end to end: the ban set is a dataframe (≤
    * total-instances / sigMaxDf rows by construction), never a
    * driver collection; Spark picks broadcast vs shuffle for the
    * anti join by its measured size. A document whose every shingle
    * is banned is wall-to-wall boilerplate and drops out of banding
    * (it cannot candidate — documented recall contract, same as the
    * too-short-to-shingle drop).
    *
    * The production path is [[bandedCut]] (instance-stream min
    * aggregate — no per-doc array rebuild); this re-agg form is kept
    * as the REFERENCE for its bit-parity spec.
    */
  private[graft] def signatureInput(sh: DataFrame, sigMaxDf: Int)
      : DataFrame =
    if (sigMaxDf <= 0) sh
    else {
      // `sh` must already be pinned by the caller: it feeds both the
      // df census (via the ONE shared bannedCensus — see below) and
      // the anti join's instance stream.
      sh.select(col("doc_id"), explode(col("sh")).as("h"))
        .join(bannedCensus(sh, sigMaxDf).select("h"), Seq("h"),
          "left_anti")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(col("h"))).as("sh"))
    }

  /** Head-shingle ban census of a pinned shingle-hash frame: one row
    * (h, df) per shingle hash appearing in more than `sigMaxDf`
    * documents. THE census implementation — [[signatureInput]], the
    * self/cross banding paths, and [[NearDupIndex]]'s frozen ban
    * table all delegate here (r15 ADVICE: three inlined copies of
    * this arithmetic could silently desynchronize, and the
    * frozen-ban-set + parity contracts assume they cannot). Banding
    * consumers select just `h`; the index keeps `df` in its table.
    */
  private[graft] def bannedCensus(sh: DataFrame, sigMaxDf: Int)
      : DataFrame =
    dfCensus(sh).filter(col("df") > sigMaxDf)

  /** The full (h, df) census of a shingle-hash frame — the ONE
    * aggregation both census consumers (the ban filter above, the
    * budget resolver below) are filters/summaries of. Factored out
    * (r16) so a budget path can materialize the census ONCE and
    * derive the histogram AND the ban set from the same pass instead
    * of re-aggregating the instance stream per consumer.
    */
  private[operators] def dfCensus(sh: DataFrame): DataFrame =
    sh.select(explode(col("sh")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("df"))


  /** Resolve the `sigMaxDf` dial from a corpus's shingle-df census
    * against a CANDIDATE budget — §5.2's production guidance made
    * code (r16): at a FIXED absolute dial the LSH candidate set grew
    * 14.9×/decade on Zipf(1.3) (mid-frequency shingles keep growing
    * into the cut), so the scale-safe dial is the one that holds the
    * candidate WORKLOAD constant and tightens itself as the corpus
    * grows.
    *
    * The budget's unit is shared-shingle pair mass: every LSH
    * candidate pair collides on a band bucket, i.e. agrees on
    * signature slots, i.e. shares at least one KEPT shingle (equal
    * slot values from different shingles need a 2^-61 hash
    * collision), so the number of candidate pairs is bounded above by
    * pairMass(t) = Σ_{h: df_h ≤ t} C(df_h, 2) — the same Σ C(df,2)
    * workload bound [[Dedup.ngramJaccard]]'s maxDf prices. The
    * resolver returns the LARGEST dial t with pairMass(t) ≤ budget
    * (loosest ban that provably holds the budget):
    *
    *   - pairMass(max df) ≤ budget → 0 (banning off — nothing to cut)
    *   - no t ≥ 2 fits → 1 (ban everything shared; df-1 singletons
    *     carry zero pair mass, so the budget can never force an
    *     empty signature input on its own)
    *
    * Deterministic: one aggregation pass over the census (df
    * histogram — O(distinct df values) rows to the driver, bounded
    * by the corpus's max df, in practice thousands), exact integer
    * cumulative sums, no sampling. The same corpus always resolves
    * the same dial, which is what lets [[NearDupIndex]] FREEZE the
    * resolved value in its committed params.
    *
    * `sh` is the pinned (doc_id, sh) shingle-hash frame the caller
    * already holds — the census is over hashes, so the resolved dial
    * is hash-family-agnostic (df of a shingle is the same under xx
    * and portable hashing, collisions aside).
    */
  def resolveSigMaxDf(sh: DataFrame, candidateBudget: Long): Int =
    resolveFromCensus(dfCensus(sh), candidateBudget)

  /** [[resolveSigMaxDf]] over an ALREADY-AGGREGATED (h, df) census
    * frame — the shared-pass form (r16): a budget caller pins
    * `dfCensus(sh).filter(df >= 2)` once (df=1 shingles carry zero
    * pair mass and can never ban — every positive dial keeps them),
    * resolves the dial from it here, and filters the SAME frame into
    * the ban set, instead of paying the explode + aggregate census
    * pass twice (once to resolve, once to ban).
    */
  private[operators] def resolveFromCensus(census: DataFrame,
      candidateBudget: Long): Int = {
    require(candidateBudget > 0, "candidateBudget must be positive")
    // df histogram: (df, number of shingles with that df), df >= 2
    // (df=1 shingles pair nothing — C(1,2) = 0)
    val hist = census
      .filter(col("df") >= 2)
      .groupBy("df").agg(count(lit(1)).as("n"))
      .select(col("df").cast("long"), col("n").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    if (hist.isEmpty) return 0 // no shared shingle at all
    var cum = 0L
    var best = 1L
    var fitsAll = true
    hist.foreach { case (df, n) =>
      cum += n * (df * (df - 1) / 2)
      if (cum <= candidateBudget) best = df else fitsAll = false
    }
    if (fitsAll) 0 else best.toInt
  }

  /** LSH candidate pairs: documents whose signatures collide in at
    * least one band. Returns distinct (id1 < id2). See [[bucketJoin]]
    * for the `maxBucket` degenerate-bucket cap and [[signatureInput]]
    * for the `sigMaxDf` head-shingle signature cut.
    */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
      seed: Long = 42L, maxBucket: Int = 0, sigMaxDf: Int = 0,
      portableHash: Boolean = false): DataFrame = {
    val sh0 = hashedShingles(df, idCol, textCol, shingleN, portableHash)
    val sh = if (sigMaxDf > 0) sh0.localCheckpoint() else sh0
    bucketJoin(sigMaybeCut(sh, numHashes, seed, sigMaxDf), numHashes,
      bands, portableHash, maxBucket)
  }

  /** Candidates verified with exact Jaccard ≥ threshold — the full
    * near-dedup output (id1, id2, jaccard). `bands = 0` (the default)
    * derives the banding from the threshold via [[autoBands]], so the
    * candidate recall at the verify boundary is never an accident of
    * a fixed banding tuned for some other threshold.
    */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, shingleN: Int = 3, numHashes: Int = 64,
      bands: Int = 0, seed: Long = 42L, maxBucket: Int = 0,
      sigMaxDf: Int = 0, portableHash: Boolean = false,
      candidateBudget: Long = 0L): DataFrame = {
    require(candidateBudget <= 0 || sigMaxDf <= 0,
      "pass candidateBudget OR an explicit sigMaxDf, not both — the " +
        "budget RESOLVES the dial (resolveSigMaxDf)")
    val b = if (bands > 0) bands else autoBands(numHashes, threshold)
    // ONE corpus scan: tokenize → shingle → hash → sort each document
    // exactly once, pinned with a localCheckpoint — the band index,
    // BOTH sides of the bucket self-join, and both verify joins read
    // this frame. Without the pin each of those five consumers
    // re-evaluates the whole upstream (round-5's plan scanned the
    // corpus parquet 6× through them). The banded index is NOT pinned:
    // the self-join's sides re-run the signature kernel over the
    // pinned hash frame, and that recompute measured CHEAPER than a
    // second checkpoint job (1.71s vs 2.19s full-query at sf0.1) —
    // the 64-permutation loop is fast once shingle hashing is done,
    // while a checkpoint pays a full materialize+read cycle.
    // localCheckpoint (not cache): lineage truncation is the point —
    // at 100 TB this frame is the materialized dedup artifact; on a
    // cluster a persisted artifact table plays this role
    // ([[nearDuplicatesCached]]).
    val sh = hashedShingles(df, idCol, textCol, shingleN, portableHash)
      .localCheckpoint()
    // candidateBudget (r16): resolve the dial from THIS corpus's df
    // census. The census is aggregated ONCE and pinned (df >= 2 only
    // — df=1 shingles carry zero pair mass and no positive dial can
    // ban them): the resolver summarizes it into the histogram and,
    // when a ban results, sigMaybeCut filters the SAME frame into the
    // ban set — previously the explode+aggregate census pass ran
    // twice, once per consumer.
    val census =
      if (candidateBudget > 0)
        Some(dfCensus(sh).filter(col("df") >= 2).localCheckpoint())
      else None
    val dial = census match {
      case Some(c) => resolveFromCensus(c, candidateBudget)
      case None => sigMaxDf
    }
    // maxBucket (r14, threaded from bucketPairsRaw): on Zipfian open-
    // vocab text the head shingle's hash is the min for MANY
    // permutations at once, so unrelated documents share whole bands
    // and bucket sizes explode (measured: 19.5x wall for 10x docs on
    // the sf1ov ladder uncapped vs ~linear capped). A bucket larger
    // than the corpus's plausible dup-cluster width certifies
    // nothing; dropping it is the same production posture as
    // ngramJaccard's maxDf. 0 = uncapped (the closed-vocab gate
    // setting, exact).
    // sigMaxDf (r14, two-decade ladder): head shingles out of the
    // SIGNATURE input — see [[signatureInput]]/[[bandedCut]]. Verify
    // below is untouched: it reads the full pinned `sh` sets.
    val cands = dedupKeyed(bucketPairsRaw(
      sigMaybeCut(sh, numHashes, seed, dial, census), numHashes, b,
      portableHash, maxBucket))
    // verify on the HASHED shingle sets, sorted once per document: the
    // per-candidate cost is one two-pointer kernel pass over two long
    // arrays instead of array_intersect + array_union building hash
    // sets and result arrays per pair (same jaccard integers — the
    // 8-byte shingle hashes stand in for the strings exactly as in
    // Dedup.ngramJaccard, collisions ~n²/2^65). Size-incompatible
    // pairs are cut before any array ships — see [[verifyPairs]].
    verifyPairs(cands, sh, sh, threshold)
  }

  /** Cross-corpus near-duplicate pairs: every (base doc, probe doc)
    * pair with exact Jaccard >= threshold — the train/test
    * contamination sweep and the new-batch-vs-existing-corpus dedup
    * every training-data pipeline runs before adding data. Same
    * sub-quadratic shape as [[nearDuplicates]] (banded signatures,
    * bucket join — here ACROSS the two corpora — exact two-pointer
    * verify), with each corpus shingled/hashed exactly once behind a
    * localCheckpoint. No id ordering constraint: the sides are
    * different corpora. Returns (id1 = base id, id2 = probe id,
    * jaccard).
    */
  def nearDuplicatesAgainst(base: DataFrame, probe: DataFrame,
      idCol: String, textCol: String, threshold: Double = 0.7,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 0,
      seed: Long = 42L, maxBucket: Int = 0, sigMaxDf: Int = 0,
      portableHash: Boolean = false,
      candidateBudget: Long = 0L): DataFrame = {
    require(candidateBudget <= 0 || sigMaxDf <= 0,
      "pass candidateBudget OR an explicit sigMaxDf, not both")
    val b = if (bands > 0) bands else autoBands(numHashes, threshold)
    val shB = hashedShingles(base, idCol, textCol, shingleN,
      portableHash).localCheckpoint()
    val shP = hashedShingles(probe, idCol, textCol, shingleN,
      portableHash).localCheckpoint()
    // the dial must resolve over the UNION census — the ban set it
    // implies is symmetric by construction (crossPairs' contract).
    // The census aggregates ONCE, pinned: resolver + ban set share it
    // (see nearDuplicates).
    val census =
      if (candidateBudget > 0)
        Some(dfCensus(shB.unionByName(shP)).filter(col("df") >= 2)
          .localCheckpoint())
      else None
    val dial = census.map(resolveFromCensus(_, candidateBudget))
      .getOrElse(sigMaxDf)
    crossPairs(shB, shP, threshold, numHashes, b, seed, maxBucket,
      dial, portableHash, census)
  }

  /** [[nearDuplicatesAgainst]] when both corpora live in ONE table and
    * a predicate marks the probe side (the usual shape of "dedup the
    * new crawl batch against the existing corpus" — one batch/source
    * column): the table is scanned, shingled and hashed exactly ONCE;
    * the pinned hash frame splits by the predicate, saving a second
    * corpus scan and checkpoint over calling the two-frame form with
    * two filters of the same table.
    */
  def nearDuplicatesSplit(df: DataFrame, idCol: String, textCol: String,
      probeSide: Column, threshold: Double = 0.7, shingleN: Int = 3,
      numHashes: Int = 64, bands: Int = 0, seed: Long = 42L,
      maxBucket: Int = 0, sigMaxDf: Int = 0,
      portableHash: Boolean = false,
      candidateBudget: Long = 0L): DataFrame = {
    require(candidateBudget <= 0 || sigMaxDf <= 0,
      "pass candidateBudget OR an explicit sigMaxDf, not both")
    val b = if (bands > 0) bands else autoBands(numHashes, threshold)
    val hashes =
      if (portableHash) Dedup.shinglePortableHashes(col(textCol), shingleN)
      else Dedup.shingleHashes(col(textCol), shingleN)
    val sh = df.select(col(idCol).as("doc_id"),
        probeSide.as("is_probe"), sort_array(hashes).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint()
    // resolve over the whole table's census — identical to the union
    // of the two sides (the split partitions the pinned frame). One
    // aggregated census serves resolver + ban set (see nearDuplicates).
    val census =
      if (candidateBudget > 0)
        Some(dfCensus(sh).filter(col("df") >= 2).localCheckpoint())
      else None
    val dial = census.map(resolveFromCensus(_, candidateBudget))
      .getOrElse(sigMaxDf)
    crossPairs(
      sh.filter(!col("is_probe")).select(col("doc_id"), col("sh")),
      sh.filter(col("is_probe")).select(col("doc_id"), col("sh")),
      threshold, numHashes, b, seed, maxBucket, dial, portableHash,
      census)
  }

  /** Banded bucket join ACROSS two (already pinned) shingle-hash
    * frames + exact verify — the shared tail of the cross-corpus
    * forms. No id ordering constraint: the sides are different
    * corpora. Returns (id1 = base id, id2 = probe id, jaccard).
    *
    * `sigMaxDf` bans head shingles from BOTH sides' signature input
    * using ONE df census over the union of the two corpora's
    * instances — the ban set MUST be symmetric: LSH only pairs rows
    * whose signatures agree, so banning a shingle on one side only
    * would desynchronize a true pair's signatures and silently lose
    * it. `maxBucket` drops (band, bucket) values whose COMBINED
    * membership across both sides exceeds the cap — the candidate
    * cost of a bucket here is |A∩bucket|·|B∩bucket| ≤ (combined/2)²,
    * so one combined census bounds the per-bucket work exactly like
    * the self-join cap.
    */
  private def crossPairs(shB: DataFrame, shP: DataFrame,
      threshold: Double, numHashes: Int, bands: Int, seed: Long,
      maxBucket: Int = 0, sigMaxDf: Int = 0,
      portable: Boolean = false,
      census: Option[DataFrame] = None): DataFrame = {
    val (okB, okP) =
      if (sigMaxDf <= 0) {
        // per-doc kernel-fold signatures (map-side over the pinned sh
        // frames — no instance shuffle, nothing shared across sides)
        val sigB = sigMaybeCut(shB, numHashes, seed, 0)
        val sigP = sigMaybeCut(shP, numHashes, seed, 0)
        if (maxBucket <= 0)
          (bandRows(sigB, numHashes, bands, portable),
            bandRows(sigP, numHashes, bands, portable))
        else {
          // pin the SIGNATURE frames (one row per doc), not the band
          // rows (bands× that) — the 5M-doc-tier scratch-disk
          // finding, see bucketPairsRaw
          val pinB = bandRows(sigB.localCheckpoint(), numHashes, bands,
            portable)
          val pinP = bandRows(sigP.localCheckpoint(), numHashes, bands,
            portable)
          val ok = pinB.unionByName(pinP)
            .groupBy(col("band"), col("bucket"))
            .agg(count(lit(1)).as("__n"))
            .filter(col("__n") <= maxBucket)
            .select(col("band"), col("bucket"))
            .localCheckpoint() // feeds both semi joins once
          (pinB.join(ok, Seq("band", "bucket"), "left_semi"),
            pinP.join(ok, Seq("band", "bucket"), "left_semi"))
        }
      } else {
        // JOINT cut path (r16): the ban-filtered signature aggregate
        // runs ONCE over both corpora instead of once per side. Each
        // instance is tagged with its side, the union census bans
        // symmetrically (same ban frame, consumed by ONE anti join
        // now — no checkpoint needed), and the (doc, side) min
        // aggregate computes both corpora's signatures in a single
        // shuffle of the same total bytes the two per-side aggregates
        // moved. The joint signature frame is pinned once (one row
        // per doc — the 5M-doc-tier pin policy) and each consumer
        // (cap census, join sides) re-derives band rows from it.
        val tagged = shB
          .select(col("doc_id"), col("sh"), lit(false).as("is_probe"))
          .unionByName(shP.select(col("doc_id"), col("sh"),
            lit(true).as("is_probe")))
        val banned = census.getOrElse(dfCensus(tagged))
          .filter(col("df") > sigMaxDf).select("h")
        val inst = tagged
          .select(col("doc_id"), col("is_probe"),
            explode(col("sh")).as("h"))
          .join(banned, Seq("h"), "left_anti")
        val sig = sigFromInstances(inst, numHashes, seed,
          keys = Seq("doc_id", "is_probe")).localCheckpoint()
        val bandAll = bandRows(sig, numHashes, bands, portable,
          extra = Seq("is_probe"))
        val keep =
          if (maxBucket <= 0) bandAll
          else {
            // combined membership per (band, bucket) — bandAll IS the
            // union of the two sides' band rows
            val ok = bandAll.groupBy(col("band"), col("bucket"))
              .agg(count(lit(1)).as("__n"))
              .filter(col("__n") <= maxBucket)
              .select(col("band"), col("bucket"))
              .localCheckpoint() // feeds both semi-join derivations
            bandAll.join(ok, Seq("band", "bucket"), "left_semi")
          }
        (keep.filter(!col("is_probe")).drop("is_probe"),
          keep.filter(col("is_probe")).drop("is_probe"))
      }
    val cands = dedupKeyed(
      okB.as("a")
        .join(okP.as("b").hint("merge"),
          col("a.band") === col("b.band") &&
            col("a.bucket") === col("b.bucket"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2")))
    verifyPairs(cands, shB, shP, threshold)
  }

  /** Memoized near-dup pair table per (session, corpusTag, params) —
    * the pair set is a materialized curation artifact like the gold
    * cluster assignments: downstream consumers (connected components,
    * survivor filters, audits) read it; they do not re-run LSH.
    * Capped at 4 corpora per session; evicted pair tables are
    * unpersisted, so a long-lived session cycling through corpora
    * holds a bounded cache footprint.
    */
  private val pairsMemo =
    new graft.sources.SessionMemo[(String, Double, Int), DataFrame](
      maxPerSession = 4, onEvict = _.unpersist(blocking = false))

  def nearDuplicatesCached(df: DataFrame, idCol: String, textCol: String,
      corpusTag: String, threshold: Double = 0.7, shingleN: Int = 3)
      : DataFrame =
    pairsMemo.getOrElseUpdate(df.sparkSession,
      (corpusTag, threshold, shingleN)) {
      val pairs = nearDuplicates(df, idCol, textCol, threshold, shingleN)
        .cache()
      pairs.count() // materialize under the memo lock
      pairs
    }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection (SURVEY.md §2 E3): 64-bit
  * similarity-preserving fingerprints — near-identical documents
  * differ in few bits, so near-dup search becomes small-Hamming-
  * distance search.
  *
  * Scale notes: the fingerprint is one map-side fold per document
  * (no shuffle); candidate generation uses the pigeonhole principle —
  * split the 64 bits into `chunks` pieces and bucket-join on identical
  * chunks, so any pair within Hamming distance `chunks-1` is
  * guaranteed to collide in ≥ 1 bucket. Only bucket collisions are
  * verified with an exact `bit_count(a XOR b)`.
  */
object SimHash {

  /** 64-bit SimHash of a token array — native kernel
    * ([[graft.expressions.NativeKernels.simHash64]]): one tight JVM
    * loop per row instead of a 64-wide interpreted fold (≈10× at
    * sf0.1). Parity with [[simHash64Reference]] is spec-gated.
    */
  def simHash64(tokens: Column): Column =
    graft.expressions.NativeKernels.simHash64Col(tokens)

  /** Declarative reference implementation: per bit position, sum
    * +1/-1 votes weighted by each token's hash bit; the sign becomes
    * the fingerprint bit. A single fold carrying a 64-slot vote array.
    */
  def simHash64Reference(tokens: Column): Column = {
    val votes = aggregate(tokens,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        array((0 until 64).map(j =>
          element_at(acc, j + 1) +
            when(shiftright(h, j).bitwiseAND(lit(1L)) === 1L, lit(1L))
              .otherwise(lit(-1L))): _*)
      })
    (0 until 64).map(j =>
      when(element_at(votes, j + 1) > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
  }

  /** Exact Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Pigeonhole bucket-join over fingerprints: `fp` is (doc_id, fp);
    * split the low `bits` into `chunks` pieces, join on identical
    * chunks, verify with exact Hamming. Complete for
    * maxDist < chunks (a pair differing in ≤ chunks-1 bits must agree
    * on ≥ 1 whole chunk).
    */
  private def bucketedPairs(fp: DataFrame, bits: Int, maxDist: Int,
      chunks: Int, maxBucket: Int = 0): DataFrame = {
    require(maxDist < chunks,
      "pigeonhole completeness needs maxDist < chunks")
    require(bits % chunks == 0, "chunks must divide bits")
    val bitsPerChunk = bits / chunks
    // The capped path evaluates the fingerprint subplan four times
    // (hot-bucket census + bucket join, each on both sides of the
    // pair self-join); fingerprints are 16 bytes/doc but computing
    // them re-tokenizes the corpus. Pin them once — the capped path
    // is the production setting, and the checkpoint is O(docs), not
    // O(pairs). The uncapped gate path stays a pure plan (two
    // evaluations, exchange-reused).
    val fpPinned = if (maxBucket <= 0) fp else fp.localCheckpoint()
    val chunked0 = fpPinned.select(col("doc_id"), col("fp"), explode(
        array((0 until chunks).map(c =>
          struct(lit(c).as("chunk_idx"),
            shiftright(col("fp"), c * bitsPerChunk)
              .bitwiseAND(lit((1L << bitsPerChunk) - 1)).as("chunk_val"))): _*))
        .as("ch"))
      .select(col("doc_id"), col("fp"),
        col("ch.chunk_idx"), col("ch.chunk_val"))
    // Hot-bucket guard (r14, measured on the open-vocab ladder): on
    // Zipfian text, unigram fingerprints CONCENTRATE — at sf0.1ov 98%
    // of docs share one chunk value, making the bucket self-join
    // quadratic (39.7M candidate pairs from 5k docs). A bucket with
    // more than `maxBucket` members is a degenerate chunk value that
    // certifies nothing about any single pair (the maxDf posture of
    // Dedup.ngramJaccard); dropping it keeps the join linear. The
    // pigeonhole guarantee then holds for pairs agreeing on ≥1
    // SURVIVING chunk — pair with n-gram features (nGram > 1) so
    // fingerprints decorrelate and true near-dup pairs keep private
    // chunks. 0 = uncapped (exact; the closed-vocab gate setting).
    val chunked =
      if (maxBucket <= 0) chunked0
      else {
        val ok = chunked0.groupBy("chunk_idx", "chunk_val")
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") <= maxBucket)
          .select("chunk_idx", "chunk_val")
        chunked0.join(ok.hint("merge"), Seq("chunk_idx", "chunk_val"))
      }
    // merge hint: chunked is chunks× the input — shuffle-join on the
    // (chunk_idx, chunk_val) bucket, never broadcast (see
    // Dedup.ngramJaccard).
    // Verify BEFORE the pair-dedup shuffle (the MinHashLsh posture,
    // Dedup.scala's id1-verify note): the Hamming cut is free inside
    // the join stage, so `.distinct()` shuffles only surviving
    // near-dup pairs, never the full candidate stream. With a healthy
    // bucket histogram the two orders cost the same (capped sf1ov:
    // 131k candidates); in the degenerate uncapped-Zipf shape the
    // candidate stream is the quadratic term and this order keeps the
    // shuffle off it.
    chunked.as("a").join(chunked.as("b").hint("merge"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        hamming(col("a.fp"), col("b.fp")).as("hamming_dist"))
      .filter(col("hamming_dist") <= maxDist)
      .distinct()
  }

  /** Near-dup pairs from an arbitrary precomputed fingerprint frame —
    * the reuse surface for non-text fingerprints (e.g.
    * [[Multimodal.imageHash64]] perceptual image hashes). Same
    * pigeonhole bucketing + exact Hamming verify as the text paths;
    * complete for maxDist < chunks.
    */
  def pairsFromFingerprints(fp: DataFrame, idCol: String, fpCol: String,
      bits: Int = 64, maxDist: Int = 3, chunks: Int = 4,
      maxBucket: Int = 0): DataFrame =
    bucketedPairs(
      fp.select(col(idCol).as("doc_id"), col(fpCol).as("fp")),
      bits = bits, maxDist = maxDist, chunks = chunks,
      maxBucket = maxBucket)

  /** Word n-gram features for the fingerprint (r14): unigram SimHash
    * is feature-degenerate on Zipfian text — every document's vote
    * vector is dominated by the same few head tokens, so unrelated
    * documents collapse onto near-identical fingerprints (measured:
    * 98% of open-vocab docs share a chunk value at nGram=1; at
    * nGram=3 the shingle space decorrelates them). nGram=1 returns
    * the raw tokens (the closed-vocab gate semantics, bit-unchanged).
    */
  private def features(textCol: Column, nGram: Int): Column = {
    val toks = graft.functions.TextFns.tokens(textCol)
    if (nGram <= 1) toks
    // native kernel: one pass over the materialized token array.
    // Parity with [[featuresReference]] is spec-gated — the
    // declarative form re-evaluates the captured tokenize subplan
    // inside its lambda for every window (O(L²) per doc, interpreted;
    // it was 22.4 s of sf1ov's 27 s fingerprint pass). The kernel's
    // Invoke is null-propagating, so null text would yield null
    // features and silently DROP the doc from bucketing — coalesce to
    // [""] (= the reference form's short-doc fallback on a null token
    // array), keeping the kernel path bit-identical to
    // [[featuresReference]] INCLUDING null text (r15 ADVICE;
    // spec-gated with a null-doc case).
    else coalesce(
      graft.expressions.NativeKernels.wordNGramsCol(toks, nGram),
      array(lit("")))
  }

  /** Declarative reference for [[features]] (spec parity gate): one
    * n-gram per window start; documents shorter than nGram fall back
    * to their whole token array joined (non-empty input keeps a
    * fingerprint).
    */
  private[graft] def featuresReference(textCol: Column, nGram: Int)
      : Column = {
    val toks = graft.functions.TextFns.tokens(textCol)
    if (nGram <= 1) toks
    else {
      val grams = transform(
        sequence(lit(0), greatest(size(toks) - nGram, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(nGram))))
      when(size(toks) >= nGram, grams)
        .otherwise(array(concat_ws(" ", toks)))
    }
  }

  /** Near-dup pairs with Hamming distance ≤ maxDist, via pigeonhole
    * chunk bucketing (guaranteed complete when maxDist < chunks and
    * maxBucket = 0; with a bucket cap, complete for pairs that agree
    * on a surviving chunk — see [[bucketedPairs]]).
    */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, chunks: Int = 4, nGram: Int = 1,
      maxBucket: Int = 0): DataFrame =
    bucketedPairs(
      df.select(col(idCol).as("doc_id"),
        simHash64(features(col(textCol), nGram)).as("fp")),
      bits = 64, maxDist = maxDist, chunks = chunks,
      maxBucket = maxBucket)

  /** [[nearDuplicates]] over the engine-portable 60-bit fingerprint
    * ([[graft.expressions.NativeKernels.simHashPortable60]]): the same
    * bucketing and verify, but every arithmetic step is replayable in
    * plain SQL — this is the variant a DuckDB oracle can gate
    * bit-for-bit. Chunks are 15 bits (60/4).
    */
  def nearDuplicatesPortable(df: DataFrame, idCol: String,
      textCol: String, maxDist: Int = 3, chunks: Int = 4,
      nGram: Int = 1, maxBucket: Int = 0): DataFrame =
    bucketedPairs(
      df.select(col(idCol).as("doc_id"),
        graft.expressions.NativeKernels.simHashPortable60Col(
          features(col(textCol), nGram)).as("fp")),
      bits = 60, maxDist = maxDist, chunks = chunks,
      maxBucket = maxBucket)
}

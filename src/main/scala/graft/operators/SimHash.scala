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
      chunks: Int): DataFrame = {
    require(maxDist < chunks,
      "pigeonhole completeness needs maxDist < chunks")
    require(bits % chunks == 0, "chunks must divide bits")
    val bitsPerChunk = bits / chunks
    val chunked = fp.select(col("doc_id"), col("fp"), explode(
        array((0 until chunks).map(c =>
          struct(lit(c).as("chunk_idx"),
            shiftright(col("fp"), c * bitsPerChunk)
              .bitwiseAND(lit((1L << bitsPerChunk) - 1)).as("chunk_val"))): _*))
        .as("ch"))
      .select(col("doc_id"), col("fp"),
        col("ch.chunk_idx"), col("ch.chunk_val"))
    // merge hint: chunked is chunks× the input — shuffle-join on the
    // (chunk_idx, chunk_val) bucket, never broadcast (see
    // Dedup.ngramJaccard).
    chunked.as("a").join(chunked.as("b").hint("merge"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        hamming(col("a.fp"), col("b.fp")).as("hamming_dist"))
      .distinct()
      .filter(col("hamming_dist") <= maxDist)
  }

  /** Near-dup pairs from an arbitrary precomputed fingerprint frame —
    * the reuse surface for non-text fingerprints (e.g.
    * [[Multimodal.imageHash64]] perceptual image hashes). Same
    * pigeonhole bucketing + exact Hamming verify as the text paths;
    * complete for maxDist < chunks.
    */
  def pairsFromFingerprints(fp: DataFrame, idCol: String, fpCol: String,
      bits: Int = 64, maxDist: Int = 3, chunks: Int = 4): DataFrame =
    bucketedPairs(
      fp.select(col(idCol).as("doc_id"), col(fpCol).as("fp")),
      bits = bits, maxDist = maxDist, chunks = chunks)

  /** Near-dup pairs with Hamming distance ≤ maxDist, via pigeonhole
    * chunk bucketing (guaranteed complete when maxDist < chunks).
    */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, chunks: Int = 4): DataFrame =
    bucketedPairs(
      df.select(col(idCol).as("doc_id"),
        simHash64(graft.functions.TextFns.tokens(col(textCol))).as("fp")),
      bits = 64, maxDist = maxDist, chunks = chunks)

  /** [[nearDuplicates]] over the engine-portable 60-bit fingerprint
    * ([[graft.expressions.NativeKernels.simHashPortable60]]): the same
    * bucketing and verify, but every arithmetic step is replayable in
    * plain SQL — this is the variant a DuckDB oracle can gate
    * bit-for-bit. Chunks are 15 bits (60/4).
    */
  def nearDuplicatesPortable(df: DataFrame, idCol: String,
      textCol: String, maxDist: Int = 3, chunks: Int = 4): DataFrame =
    bucketedPairs(
      df.select(col(idCol).as("doc_id"),
        graft.expressions.NativeKernels.simHashPortable60Col(
          graft.functions.TextFns.tokens(col(textCol))).as("fp")),
      bits = 60, maxDist = maxDist, chunks = chunks)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{AtomicLake, CommitStore, HardlinkCommitStore}

/** Persistent near-duplicate index — the 100-TB shape of
  * [[MinHashLsh]]: the corpus's shingle-hash sets and banded LSH
  * buckets are MATERIALIZED as two ACID lake tables at ingest time,
  * so deduplicating a new batch against the corpus never re-reads or
  * re-shingles the corpus text. A crawl pipeline builds the index
  * once, then every incoming batch:
  *
  *   1. shingles/hashes ITSELF (batch-sized work only),
  *   2. joins its banded signatures against the persisted band table
  *      (candidate generation — a key join, no corpus scan),
  *   3. verifies candidates with the exact two-pointer kernel against
  *      the persisted shingle-hash table (reads only the matched ids'
  *      rows via the join),
  *   4. appends its own rows to both tables (one atomic commit each),
  *      becoming part of the corpus the NEXT batch dedups against.
  *
  * The index params (shingle width, hash count, banding, seed) are
  * pinned in the index root and validated on every use — a batch
  * hashed under different params would silently produce an empty
  * candidate set.
  *
  * Scale notes: the band table is `bands` rows per document of three
  * longs; the sh table one row per document carrying its hash array.
  * Candidate generation shuffles only (band, bucket) keys; the verify
  * join shuffles candidate ids, never all-pairs. Both persisted tables
  * inherit AtomicLake's snapshot isolation: a reader dedup job and a
  * writer append never see torn state, and `compact` keeps file
  * counts bounded as batches accumulate.
  */
object NearDupIndex {

  final case class Params(shingleN: Int, numHashes: Int, bands: Int,
      seed: Long)

  private def shRoot(root: String) = s"$root/sh"
  private def bandRoot(root: String) = s"$root/bands"
  private def paramsPath(root: String) =
    java.nio.file.Paths.get(root, "params.json")

  private def writeParams(root: String, p: Params): Unit = {
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root))
    java.nio.file.Files.write(paramsPath(root),
      s"""{"shingleN":${p.shingleN},"numHashes":${p.numHashes},"bands":${p.bands},"seed":${p.seed}}"""
        .getBytes("UTF-8"))
  }

  def readParams(root: String): Params = {
    val s = new String(
      java.nio.file.Files.readAllBytes(paramsPath(root)), "UTF-8")
    def field(k: String): Long =
      s.split(s""""$k":""")(1).takeWhile(c => c.isDigit || c == '-').toLong
    Params(field("shingleN").toInt, field("numHashes").toInt,
      field("bands").toInt, field("seed"))
  }

  /** The (doc_id, sorted shingle hashes) frame + its banded index for
    * one corpus/batch — the two row shapes the lake tables hold.
    */
  private def frames(df: DataFrame, idCol: String, textCol: String,
      p: Params): (DataFrame, DataFrame) = {
    val sh = df.select(col(idCol).as("doc_id"),
        sort_array(Dedup.shingleHashes(col(textCol), p.shingleN)).as("sh"))
      .filter(size(col("sh")) > 0)
      .localCheckpoint()
    val rows = p.numHashes / p.bands
    val banded = sh.select(col("doc_id"),
        MinHashLsh.signatureFromHashes(col("sh"), p.numHashes, p.seed)
          .as("sig"))
      .select(col("doc_id"), explode(array((0 until p.bands).map(b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * rows + 1, rows).cast("string"))
            .as("bucket"))): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    (sh, banded)
  }

  /** Build (overwrite) the index for a corpus. `threshold` drives the
    * banding via [[MinHashLsh.autoBands]] exactly like the in-memory
    * operator, so candidate recall at the verify boundary matches.
    */
  def build(corpus: DataFrame, idCol: String, textCol: String,
      root: String, threshold: Double = 0.7, shingleN: Int = 3,
      numHashes: Int = 64, seed: Long = 42L,
      store: CommitStore = HardlinkCommitStore): Params = {
    val p = Params(shingleN, numHashes,
      MinHashLsh.autoBands(numHashes, threshold), seed)
    val (sh, banded) = frames(corpus, idCol, textCol, p)
    AtomicLake.overwrite(sh, shRoot(root), store = store)
    AtomicLake.overwrite(banded, bandRoot(root), store = store)
    writeParams(root, p)
    p
  }

  /** Near-dup pairs (corpus id1, batch id2, jaccard >= threshold) of a
    * NEW batch against the indexed corpus — the corpus text is never
    * read: candidates come from the persisted band table, verification
    * from the persisted hash table.
    */
  def pairsAgainstIndex(spark: SparkSession, batch: DataFrame,
      idCol: String, textCol: String, root: String, threshold: Double,
      store: CommitStore = HardlinkCommitStore): DataFrame = {
    val p = readParams(root)
    val (shB, bandedB) = frames(batch, idCol, textCol, p)
    val bandedIdx = AtomicLake.read(spark, bandRoot(root), store)
    val shIdx = AtomicLake.read(spark, shRoot(root), store)
    val cands = bandedIdx.as("a")
      .join(bandedB.as("b").hint("merge"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    val inter = graft.expressions.NativeKernels
      .sortedIntersectCountCol(col("sh1"), col("sh2"))
    cands
      .join(shIdx.select(col("doc_id").as("id1"), col("sh").as("sh1")),
        "id1")
      .join(shB.select(col("doc_id").as("id2"), col("sh").as("sh2")),
        "id2")
      .select(col("id1"), col("id2"),
        (inter.cast("double") /
          (size(col("sh1")) + size(col("sh2")) - inter).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Make a batch part of the corpus: append its rows to both index
    * tables (one atomic commit per table — the two commits are not
    * atomic TOGETHER; a reader between them sees the batch's hashes
    * but not yet its buckets, which can only UNDER-generate candidates
    * for that reader, never corrupt results; re-run the dedup after
    * the append lands when exactness across the boundary matters).
    */
  def append(batch: DataFrame, idCol: String, textCol: String,
      root: String, store: CommitStore = HardlinkCommitStore): Unit = {
    val p = readParams(root)
    val (sh, banded) = frames(batch, idCol, textCol, p)
    AtomicLake.append(sh, shRoot(root), store = store)
    AtomicLake.append(banded, bandRoot(root), store = store)
  }
}

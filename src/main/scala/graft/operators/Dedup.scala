package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for LLM training-data pipelines (SURVEY.md
  * §2 E1-E4): exact content dedup and n-gram Jaccard similarity join.
  * The sub-quadratic near-dup paths (MinHash+LSH, SimHash) live beside
  * these in [[MinHashLsh]] and [[SimHash]].
  *
  * Scale notes: `exact` is one shuffle on the content hash — the
  * canonical 100-TB dedup plan (hash is computed map-side, so the
  * shuffle carries 32-byte keys, not documents). `ngramJaccard` builds
  * an inverted shingle index and generates candidate pairs only for
  * docs sharing a shingle — still worst-case quadratic under heavy
  * collisions (its role is verify/small-corpus; at 100 TB run
  * [[MinHashLsh]] first and feed surviving candidate pairs here).
  */
object Dedup {

  /** Group-level exact-dedup summary: one row per distinct content
    * hash with the surviving (minimum) id and the copy count.
    */
  def exactGroups(df: DataFrame, contentCol: String, idCol: String)
      : DataFrame =
    df.groupBy(sha2(col(contentCol), 256).as("text_hash"))
      .agg(min(col(idCol)).as("keep_doc_id"), count(lit(1)).as("n_copies"))

  /** Keep-first exact dedup: returns the input rows minus duplicate
    * content (the row with the smallest id survives).
    */
  def exact(df: DataFrame, contentCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(sha2(col(contentCol), 256))
      .orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Distinct word n-gram shingles of a text column, as an array —
    * native kernel ([[graft.expressions.NativeKernels.wordShingles]]);
    * the split itself stays a codegen'd builtin. Parity with
    * [[shinglesReference]] is spec-gated.
    */
  def shingles(text: Column, n: Int): Column =
    graft.expressions.NativeKernels.wordShinglesCol(split(text, " "), n)

  /** [[shingles]] as xxhash64 values — the join-key form: equality-only
    * consumers (the inverted index) shuffle 8-byte longs instead of
    * strings. Spec-gated equal to `transform(shingles, xxhash64)`.
    */
  def shingleHashes(text: Column, n: Int): Column =
    graft.expressions.NativeKernels.wordShingleHashesCol(split(text, " "), n)

  /** Declarative reference form of [[shingles]]. */
  def shinglesReference(text: Column, n: Int): Column = {
    val w = split(text, " ")
    val idx = when(size(w) >= n, sequence(lit(1), size(w) - (n - 1)))
      .otherwise(array().cast("array<int>"))
    array_distinct(transform(idx, i =>
      concat_ws(" ", (0 until n).map(j => element_at(w, i + j)): _*)))
  }

  /** N-gram Jaccard similarity join over one corpus: pairs (id1 < id2)
    * sharing at least one shingle, with exact Jaccard >= threshold.
    * Returns (id1, id2, inter, n1, n2, jaccard).
    *
    * Why no prefix filtering: SSJoin/PPJoin-style prefix pruning was
    * implemented and measured (round 3) — on this corpus the trigram
    * distribution leaves 310-430k candidate pairs at t=0.5 under both
    * hash and document-frequency prefix orders, so the extra
    * distinct + verify stages cost 3× more than the direct
    * index-join-and-count below (1.2s vs 3.9s at sf0.1). When the
    * corpus is too large for this join at all, the scale path is
    * [[MinHashLsh]] first, this operator on survivors only.
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    // hashed shingles: the index join is equality-only, so the shuffle
    // carries (long, long) rows — see [[shingleHashes]].
    val sh = df.select(col(idCol).as("doc_id"),
        explode(shingleHashes(col(textCol), n)).as("shingle"))
    val card = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    // merge hint: the exploded inverted index is many× the input (the
    // planner's size estimate misses that and would broadcast it,
    // building millions of rows single-threaded on the driver — fatal
    // at scale). A sort-merge join shuffles on the shingle key and
    // lets AQE split skewed buckets (common shingles are hot keys).
    // shuffle_hash measured ~0.3s faster at sf0.1 but its hash build
    // must FIT memory per partition — on a 100-TB inverted index a hot
    // shingle bucket would OOM where SMJ spills; merge is the scale
    // choice.
    val pairs = sh.as("a").join(sh.as("b").hint("merge"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    val jac = col("inter").cast("double") /
      (col("n1") + col("n2") - col("inter")).cast("double")
    pairs
      .join(card.withColumnRenamed("n_sh", "n1"),
        col("id1") === col("doc_id")).drop("doc_id")
      .join(card.withColumnRenamed("n_sh", "n2"),
        col("id2") === col("doc_id")).drop("doc_id")
      .select(col("id1"), col("id2"), col("inter"), col("n1"), col("n2"),
        jac.as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Blocked fuzzy entity matching: candidate pairs share a blocking
    * key derived from the (lowercased) name, and survive when their
    * Levenshtein distance is within `maxDist` — the classic
    * entity-resolution shape (typo'd customer names, OCR'd vendor
    * strings). Blocking makes it sub-quadratic: the join shuffles on
    * the block key and only same-block pairs are scored, so the cost
    * is sum(block²), not corpus². Pick `blockFn` so true matches
    * cannot disagree on it (prefix, phonetic key, length band).
    * Levenshtein is the identical classic DP in every engine — the
    * output is engine-portable.
    *
    * Memory contract: each block's entries are collected into one
    * array for the kernel, so the blocking key must bound block width
    * (block granularity is the recall/cost/memory dial every ER
    * pipeline turns). For a corpus whose blocks cannot be bounded,
    * use [[fuzzyMatchesReference]] — its sort-merge join streams
    * candidates and spills instead of materializing a block.
    */
  def fuzzyMatches(df: DataFrame, idCol: String, nameCol: String,
      blockFn: Column => Column, maxDist: Int): DataFrame = {
    val p = df.select(col(idCol).cast("long").as("id"),
        lower(col(nameCol)).as("nm"))
      .withColumn("blk", blockFn(col("nm")))
    // one shuffle groups each block, then the whole O(block²) pair
    // loop runs inside NativeKernels.fuzzyPairs (names decoded once
    // per block, banded O(len×maxDist) DP, no per-candidate row
    // machinery). The SMJ + per-pair levenshtein formulation
    // ([[fuzzyMatchesReference]]) measured 42s at sf0.1 vs ~1s here —
    // with sum(block²) candidate pairs the per-pair constant is the
    // whole game.
    p.groupBy(col("blk"))
      .agg(collect_list(struct(col("id"), col("nm"))).as("es"))
      .select(explode(graft.expressions.NativeKernels
        .fuzzyPairsCol(col("es"), maxDist)).as("m"))
      .select(col("m.id1"), col("m.id2"), col("m.dist"))
  }

  /** Declarative reference form of [[fuzzyMatches]] — block self-join
    * + threshold'd `levenshtein` (parity spec-gated, NativeKernelSpec).
    */
  def fuzzyMatchesReference(df: DataFrame, idCol: String, nameCol: String,
      blockFn: Column => Column, maxDist: Int): DataFrame = {
    val p = df.select(col(idCol).cast("long").as("id"),
        lower(col(nameCol)).as("nm"))
      .withColumn("blk", blockFn(col("nm")))
    p.as("a").join(p.as("b").hint("merge"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("dist", levenshtein(col("a.nm"), col("b.nm"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("a.id").as("id1"), col("b.id").as("id2"), col("dist"))
  }

  /** Connected components over a near-duplicate pair list — the step
    * that turns PAIRS into duplicate CLUSTERS (a~b, b~c must collapse
    * to ONE surviving doc, which pairwise removal gets wrong).
    *
    * Iterative min-label propagation: every vertex starts as its own
    * component, and each round replaces a vertex's label with the
    * minimum over itself and its neighbors (one join + one partial
    * aggregation per round — both shuffle on the vertex id only).
    * Rounds needed = graph diameter; duplicate clusters are
    * near-cliques with tiny diameters, so this converges in 2-4
    * rounds even at corpus scale. Each round is localCheckpointed to
    * cut the growing lineage, and convergence is detected with an
    * O(1)-to-driver changed-count — no collect of vertex data.
    * Deterministic: min-propagation converges to the same fixpoint
    * (the minimum id in each component) in any execution order.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxRounds: Int = 20): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct().localCheckpoint(eager = true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(eager = true)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val prop = labels.join(edges, col("id") === col("src"))
        .select(col("dst").as("id"), col("component"))
        .unionByName(labels)
        .groupBy(col("id")).agg(min(col("component")).as("component"))
        .localCheckpoint(eager = true)
      val changed = prop.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .filter(col("n.component") =!= col("o.component"))
        .count()
      labels = prop
      converged = changed == 0
      round += 1
    }
    require(converged, s"connectedComponents did not converge in $maxRounds rounds")
    labels
  }
}

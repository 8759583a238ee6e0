package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for LLM training-data pipelines (SURVEY.md
  * §2 E1-E4): exact content dedup and n-gram Jaccard similarity join.
  * The sub-quadratic near-dup paths (MinHash+LSH, SimHash) live beside
  * these in [[MinHashLsh]] and [[SimHash]].
  *
  * Scale notes: both `exactGroups` and `exact` pick winners through
  * ONE aggregation whose exchange carries (32-byte hash, id) pairs,
  * never document bodies; `exact` then joins the winner set back with
  * a left-semi join — broadcastable when the distinct-content set is
  * small, a spilling sort-merge join otherwise (either way the corpus
  * is never sorted through a window). `ngramJaccard` builds an
  * inverted shingle index and generates candidate pairs only for
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
    * content (the row with the smallest id survives; `idCol` must be
    * unique). Winners come from [[exactGroups]] — the aggregation
    * exchange carries only (hash, id), map-side combined — and the
    * semi-join back is the only place full rows move (and only when
    * the winner side is too big to broadcast). The windowed
    * alternative (row_number over the hash) would shuffle AND sort
    * every document body.
    */
  def exact(df: DataFrame, contentCol: String, idCol: String): DataFrame = {
    val winners = exactGroups(df, contentCol, idCol)
    df.as("__l").join(winners.as("__w"),
      sha2(col(s"__l.$contentCol"), 256) === col("__w.text_hash") &&
        col(s"__l.$idCol") === col("__w.keep_doc_id"),
      "left_semi")
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

  /** [[shingleHashes]] with the engine-portable polynomial hash
    * ([[graft.expressions.NativeKernels.wordShinglePortableHashes]])
    * instead of xxhash64 — the variant whose ENTIRE downstream chain
    * (df census → sigMaxDf ban → MinHash signature → banding →
    * maxBucket cut → exact verify) is plain integer arithmetic a
    * DuckDB oracle replays bit-for-bit, which is how the production
    * near-dedup configuration hash-gates (dedup_minhash_capped /
    * dedup_cross_capped). xxhash64 stays the production default.
    */
  def shinglePortableHashes(text: Column, n: Int): Column =
    graft.expressions.NativeKernels
      .wordShinglePortableHashesCol(split(text, " "), n)

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
      n: Int = 3, threshold: Double = 0.5,
      packedIds: Boolean = true, maxDf: Int = 65536): DataFrame = {
    require(maxDf > 0, s"maxDf must be > 0: $maxDf")
    // the pair kernel's documented feasibility ceiling
    // (idPairsFromPostings refuses longer posting lists) — misuse
    // fails at plan-build time, not mid-job from inside a task
    require(maxDf <= 65536,
      s"maxDf must be <= 65536 (the pair kernel's posting-list " +
        s"bound): $maxDf")
    // ONE corpus scan: hash the shingles once (8-byte join keys — see
    // [[shingleHashes]]), and let every posting row carry its doc's
    // shingle cardinality, so the Jaccard denominator needs no
    // doc-cardinality join later (at corpus scale that join's build
    // side is corpus-sized and does not broadcast). Ids must be
    // castable to long; the default packed path additionally needs
    // them < 2^32 (refused loudly — pass packedIds=false past that).
    val sh = df
      .select(col(idCol).cast("long").as("doc_id"),
        shingleHashes(col(textCol), n).as("shs"))
      .select(col("doc_id"), size(col("shs")).cast("long").as("n_sh"),
        explode(col("shs")).as("shingle"))
    // Intersection counting via the posting lists themselves: ONE
    // shuffle groups each shingle's postings, a native kernel emits
    // the pairs (with cardinalities riding along) in a primitive
    // loop, and one hash aggregation keyed on the pair counts the
    // shared shingles — first(n1)/first(n2) pull the carried
    // denominators through the same agg, so the whole query is
    // scan → shuffle → agg → map-side filter: NO joins, nothing
    // broadcast, nothing corpus-sized on one node.
    // Measured alternatives at sf0.1 (965k length-filtered pair
    // instances), kept here as negative results: the round-3/4
    // sort-merge self-join of the exploded index 1.96s; a separate
    // doc-cardinality table with two broadcast joins +0.3s over this;
    // repartition+sortWithinPartitions+run-length mapPartitions
    // counting ~0.4s SLOWER end-to-end (tuple encoder churn exceeds
    // the saved agg work); collect_list over (id, n) STRUCTS 8×
    // slower than two parallel long lists. The agg's map-side partial
    // pass barely reduces (~90% of pairs share exactly one shingle)
    // but skipping it is not expressible declaratively; the final agg
    // spills like any hash agg at scale.
    // Round-6 stage profile (min-of-3, quiet local[32]): scan+explode
    // 0.43s, +postings group 0.62s, +pair emission 0.76s, +pair agg
    // 1.67s full — the agg IS the remaining cost. Round-7 shape
    // result: packing the PAIR into one long (pk = id1<<32 | id2) and
    // the cardinalities into another (nc) so the agg keys (pk, nc)
    // with a count-only aggregate measured 1.29s vs 1.42s unpacked
    // (isolated min-of-3 A/B) — adopted below as the default
    // `packedIds` path (kernel refuses ids >= 2^32 loudly; pass
    // packedIds=false for 64-bit ids). Earlier negatives stand:
    // (id,n)-per-side 2-long key 1.66s, four-key grouping 2.93s,
    // separate cardinality table +0.3s, mapPartitions run-length
    // +0.4s, struct collect_list 8×; round-10: raising
    // spark.sql.objectHashAggregate.sortBased.fallbackThreshold to
    // 1e6 (keep the postings agg hash-based instead of sort-falling-
    // back at 128 keys) measured NO improvement (1.5-1.9s, noisy) —
    // and the sort fallback is the spill path, so the default stays.
    // The remaining gap vs DuckDB is
    // the per-row constant of one ~1M-row hash exchange, not plan
    // shape — fixed task overheads amortize with bigger partitions at
    // scale, and the operator's 100-TB role stays verify-tier (LSH
    // first); this item is closed as shape-optimal.
    // Skew contract — the df CAP (round-10): a posting list of g ids
    // emits g² pairs inside one task, so ONE stopword-grade shingle
    // (df 10^6+ at corpus scale) is a quadratic cliff no partitioning
    // fixes. Shingles with document frequency above `maxDf` are
    // DROPPED before pair emission (same dial as Curation.sharedSpans'
    // posting cap): a shingle shared by that many documents carries no
    // discriminative similarity — it is corpus background. Semantics:
    // the reported intersection counts only sub-cap shingles while
    // denominators stay full-universe, so `jaccard` is a LOWER BOUND
    // that equals exact Jaccard whenever no shared shingle exceeds the
    // cap. On the test corpus the observed df ceiling is 25 (duplicate
    // clusters are ~25 docs wide — their shared shingles ARE the
    // signal, so a useful cap must sit far above real cluster sizes;
    // measured sf0.1: capping at 8 would cut pair emissions 84% but
    // destroy exactly the qualifying pairs). The default 65536 matches
    // the kernel's feasibility ceiling: pair emission is never asked
    // to square a list the kernel would refuse.
    // In the packed path the cap is enforced by [[graft.expressions
    // .BoundedCollectLong]], a TypedImperativeAggregate whose buffer
    // stops storing at maxDf and yields an empty posting — O(maxDf)
    // heap per shingle even when one shingle's postings are
    // gigabytes; collect_list + filter(size<=cap) would materialize
    // the whole list before the filter could see its size.
    // Posting rows pack (doc_id << 32 | n_sh) into ONE long (both
    // halves guarded in-plan), so the aggregate carries one buffer
    // and the exchange one 8-byte payload column — half the round-7
    // two-parallel-lists shape's state. (Those lists remain in the
    // unpacked 64-bit-id path, which caps via size() filter and
    // documents the weaker memory contract.)
    val counted =
      if (packedIds) {
        val fits = col("doc_id") >= 0L &&
          col("doc_id") < lit(1L << 32) && col("n_sh") < lit(1L << 32)
        val packedPosting = when(fits,
          shiftleft(col("doc_id"), 32).bitwiseOR(col("n_sh")))
          .otherwise(raise_error(concat(
            lit("ngramJaccard(packedIds=true) needs ids and" +
              " cardinalities in [0, 2^32); got id "), col("doc_id"),
            lit(" with "), col("n_sh"),
            lit(" shingles — pass packedIds=false")))
            .cast("long"))
        // EXPLOSION-AWARE EXCHANGE (r13, found by the sf1 ladder):
        // this exchange's payload is small in BYTES (one packed long
        // per posting — ~21 MB even at sf1), so AQE's bytes-based
        // coalescing (advisory 64 MB, parallelismFirst=false)
        // collapses the reduce side to ONE task — and that task then
        // runs the pair kernel AND the count agg's map side over
        // Σ df² pair emissions single-threaded (measured: minutes at
        // sf1 vs seconds 32-way). Bytes misprice CPU-exploding
        // stages, so pin the parallelism with an explicit repartition
        // (a user-specified partition count is exempt from AQE
        // coalescing); groupBy(shingle) reuses the partitioning — no
        // extra exchange. The NEXT exchange (pair counts) stays
        // AQE-managed: its map output bytes are the post-explosion
        // reality, so coalescing prices it correctly.
        val explodeP = sh.sparkSession.conf
          .get("spark.sql.shuffle.partitions").toInt
        val postings = sh
          .select(col("shingle"), packedPosting.as("p"))
          .repartition(explodeP, col("shingle"))
          .groupBy(col("shingle"))
          .agg(graft.expressions.BoundedCollect
            .boundedCollectLong(col("p"), maxDf).as("ps"))
        // PAIR-AGG EXCHANGE PIN (r15, closing the r14 perf-weak
        // audit): the pair stream is ~15 MB of packed longs at sf0.1,
        // so AQE's bytes-based coalescing collapsed the final count
        // agg of ~850k distinct pairs onto ONE task — the same
        // CPU-vs-bytes mispricing as the postings exchange above,
        // measured as +0.73 s of the row's 1.46 s cumulative profile.
        // The explicit repartition pins reduce parallelism (exempt
        // from coalescing; groupBy reuses the partitioning), and the
        // agg keys (pk, nc) with a count-only aggregate — nc is a
        // function of pk, so the grouping is unchanged, and dropping
        // the `first(nc)` buffer halves the agg state. Isolated A/B
        // min-of-3 at sf0.1: 1.50 s → 0.90 s for the cumulative
        // stage; full query 1.66 → ~1.05 s.
        val g = postings
          .select(explode(graft.expressions.NativeKernels
            .idPairsFromPostingsCol(col("ps"), threshold)).as("p"))
          .select(col("p.pk").as("pk"), col("p.nc").as("nc"))
          .repartition(explodeP, col("pk"))
          .groupBy(col("pk"), col("nc"))
          .agg(count(lit(1)).as("inter"))
        g.select(shiftrightunsigned(col("pk"), 32).as("id1"),
          col("pk").bitwiseAND(lit(0xffffffffL)).as("id2"),
          col("inter"),
          shiftrightunsigned(col("nc"), 32).as("n1"),
          col("nc").bitwiseAND(lit(0xffffffffL)).as("n2"))
      } else
        sh.repartition(sh.sparkSession.conf
            .get("spark.sql.shuffle.partitions").toInt, col("shingle"))
          .groupBy(col("shingle"))
          .agg(collect_list(col("doc_id")).as("ids"),
            collect_list(col("n_sh")).as("ns"))
          .filter(size(col("ids")) <= maxDf)
          .select(explode(graft.expressions.NativeKernels
            .idPairsWithCardCol(col("ids"), col("ns"), threshold)).as("p"))
          .groupBy(col("p.id1").as("id1"), col("p.id2").as("id2"))
          .agg(count(lit(1)).as("inter"), first(col("p.n1")).as("n1"),
            first(col("p.n2")).as("n2"))
    val jac = col("inter").cast("double") /
      (col("n1") + col("n2") - col("inter")).cast("double")
    counted
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
      blockFn: Column => Column, maxDist: Int,
      maxBlock: Int = 1 << 20): DataFrame = {
    require(maxBlock > 0, s"maxBlock must be > 0: $maxBlock")
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
    //
    // The documented memory contract (blockFn must bound block width)
    // is ENFORCED in-plan, not just documented: a block wider than
    // `maxBlock` raises a loud error NAMING the offending block key,
    // instead of letting one degenerate key (an empty-string name, a
    // single-letter prefix over a skewed corpus) OOM an executor
    // mid-shuffle at scale with an unactionable heap dump. Same
    // zero-extra-pass pattern as RangeJoin's bucket-span guard
    // (RangeJoin.scala): the check is a scalar conditional on the
    // already-aggregated row. The default bound (2^20 entries) is the
    // kernel-feasibility line — above it the O(block²) DP loop is
    // unpayable anyway, so the right response is a better blockFn or
    // [[fuzzyMatchesReference]], which streams candidates and spills.
    val guarded = when(size(col("es")) > maxBlock,
      raise_error(concat(
        lit("fuzzyMatches: block '"), col("blk"),
        lit("' has "), size(col("es")).cast("string"),
        lit(s" entries (> maxBlock=$maxBlock); choose a" +
          " finer blockFn or use fuzzyMatchesReference")))
        .cast("array<struct<id1:bigint,id2:bigint,dist:int>>"))
      .otherwise(graft.expressions.NativeKernels
        .fuzzyPairsCol(col("es"), maxDist))
    // explosion-aware exchange (same r13 finding as ngramJaccard's
    // posting stage): a block row is tiny in bytes but detonates into
    // an O(block²) DP loop, so bytes-based AQE coalescing would run
    // every block's kernel on one task; the explicit partition count
    // is exempt from coalescing and groupBy reuses it
    p.repartition(p.sparkSession.conf
        .get("spark.sql.shuffle.partitions").toInt, col("blk"))
      .groupBy(col("blk"))
      .agg(collect_list(struct(col("id"), col("nm"))).as("es"))
      .select(col("blk"), explode(guarded).as("m"))
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
      maxRounds: Int = 20, driverMaxEdges: Long = 1L << 20): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct().localCheckpoint(eager = true)
    // Small-graph fast path: the near-dup pair graph is usually TINY
    // relative to the corpus (pairs come out of LSH/banding, not
    // all-pairs), and the distributed fixpoint pays rounds × several
    // job latencies no matter how small the data. Under
    // `driverMaxEdges` directed edges (16 MB at the 2^20 default —
    // the same bounded-driver-step class as KMeans centroids or the
    // BPE histogram cut) a driver union-find with min-id
    // representatives produces the IDENTICAL labeling in one collect.
    // Integral id columns only — anything else (or any bigger graph)
    // takes the distributed loop below, which never collects.
    val integralIds = edges.schema.fields.forall(f =>
      f.dataType == org.apache.spark.sql.types.LongType ||
        f.dataType == org.apache.spark.sql.types.IntegerType)
    lazy val nEdges = edges.count()
    if (integralIds && nEdges <= driverMaxEdges) {
      val es = edges
        .select(col("src").cast("long"), col("dst").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { // min id wins = the fixpoint's labeling
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val ids = es.iterator.map(_._1).toArray.distinct
      val spark = pairs.sparkSession
      import spark.implicits._
      return ids.map(id => (id, find(id))).toSeq
        .toDF("id", "component")
    }
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

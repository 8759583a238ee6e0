package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.NativeKernels

/** Distributed Bloom-filter membership for incremental-ingest
  * pipelines: "which keys of this new batch already exist in the
  * 100-TB base table?" answered without shuffling the whole batch
  * into a join.
  *
  * Build: one pass over the base keys — each partition sets bits in
  * a local long[] and the partials OR-merge up a tree. The driver
  * holds only the final m-bit array (a sketch, like the KMeans /
  * IVF centroids — O(m), never O(n)).
  *
  * Probe: a native codegen kernel tests k positions per key
  * map-side. `false` is EXACT absence (no false negatives), so those
  * rows skip the verify join entirely; only the `true` minority
  * (real members + ~fpp false positives) shuffles into an exact
  * semi-verify. At 10 bits/key, k=7, theoretical fpp ≈ 0.8% — the
  * verify join sees ~1% of a mostly-new batch instead of 100%.
  */
object Bloom {

  /** An immutable bloom sketch: m = 64·bits.length bits, k probes. */
  final case class Filter(bits: Array[Long], k: Int) {
    def mBits: Long = bits.length.toLong << 6
    /** Map-side membership probe (no false negatives). */
    def mightContain(key: Column): Column =
      NativeKernels.bloomMightContainCol(key.cast("long"), bits, k)
  }

  /** Build a filter over a long-castable key column. `expectedItems`
    * skips the sizing count() when the caller already knows the
    * cardinality. The bit array is capped so the plan-literal /
    * driver payload stays bounded (512 MiB of bits = 64 MiB array —
    * refuse loudly rather than silently degrade the fpp).
    */
  def build(df: DataFrame, keyCol: String, bitsPerKey: Int = 10,
      numHashes: Int = 7, expectedItems: Long = -1L): Filter = {
    val n = if (expectedItems > 0) expectedItems
      else df.select(col(keyCol)).na.drop().count()
    val m = math.max(64L, ((n.max(1L) * bitsPerKey + 63L) / 64L) * 64L)
    require(m <= (512L << 20),
      s"bloom of $n keys x $bitsPerKey bits = $m bits exceeds the " +
        "512 MiB sketch bound; shard the key space or lower bitsPerKey")
    val words = (m >>> 6).toInt
    val k = numHashes
    val spark = df.sparkSession
    import spark.implicits._
    val partials = df.select(col(keyCol).cast("long")).na.drop()
      .as[Long]
      .mapPartitions { it =>
        val arr = new Array[Long](words)
        val mm = words.toLong << 6
        while (it.hasNext) {
          val key = it.next()
          var h = NativeKernels.bloomHash1(key)
          val h2 = NativeKernels.bloomHash2(key)
          var i = 0
          while (i < k) {
            val pos = (h & Long.MaxValue) % mm
            arr((pos >>> 6).toInt) |= 1L << (pos & 63L)
            h += h2
            i += 1
          }
        }
        Iterator.single(arr)
      }
    // OR-merge partials up a tree: O(log partitions) depth, so 10k
    // base partitions never funnel through one reducer or the driver.
    // An EMPTY base (zero partitions — the incremental pipeline's
    // bootstrap run) yields the all-zero filter: mightContain is
    // false for every key, so every probe row routes definite-new —
    // the correct semantics, where treeReduce alone would throw
    // 'empty collection'.
    val rdd = partials.rdd
    val bits =
      if (rdd.isEmpty()) new Array[Long](words)
      else rdd.treeReduce({ (a, b) =>
        var i = 0
        while (i < a.length) { a(i) |= b(i); i += 1 }
        a
      }, depth = 2)
    Filter(bits, k)
  }

  /** Flag each probe row with `flagName` = whether its key exists in
    * `base`, using the filter to prune: rows the bloom rejects are
    * definitively new and bypass the join; only bloom-positive rows
    * shuffle into the exact verify (left join on the distinct base
    * keys), which also clears the false positives.
    *
    * Null probe keys flag `false` (the base's null keys are likewise
    * dropped at build) via the definite-new branch — a bare
    * `filter(!mightContain)` would silently drop them from BOTH
    * branches, since the kernel's null propagates through the
    * negation.
    */
  def flagMembership(probe: DataFrame, probeKey: String,
      base: DataFrame, baseKey: String, filter: Filter,
      flagName: String = "is_known"): DataFrame = {
    val keyL = col(probeKey).cast("long")
    val mc = filter.mightContain(keyL)
    val baseKeys = base.select(col(baseKey).cast("long").as(probeKey))
      .na.drop().distinct().withColumn("__hit", lit(1))
    val definiteNew = probe.filter(coalesce(!mc, lit(true)))
      .withColumn(flagName, lit(false))
    val verified = probe.filter(coalesce(mc, lit(false)))
      .join(baseKeys, Seq(probeKey), "left")
      .withColumn(flagName, col("__hit").isNotNull)
      .drop("__hit")
    definiteNew.unionByName(verified)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data curation.
  *
  * `TABLESAMPLE` / `df.sample` draw from an RNG seeded per task — the
  * selected set changes with partitioning, retries, and engine, which
  * breaks reproducible corpus builds. Hash sampling decides per ROW
  * from a stable key: md5 (bit-identical in every engine) of the key
  * maps to one of `buckets` slots, and a row is kept when its slot
  * falls under the stratum's rate. Fully map-side (no shuffle, no
  * state), trivially parallel at any scale, and the same row set comes
  * out of Spark, DuckDB, or a Python loop.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the row key: first 8 hex chars
    * of md5(key) as an integer, mod buckets. A null key yields a null
    * bucket, so null-keyed rows are never selected — sample over a
    * non-null key (ids here are synthetic and total).
    */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Keep ~pct% of rows, decided per row by [[hashBucket]]. */
  def sampleByHash(df: DataFrame, keyCol: String, pct: Int,
      buckets: Int = 100): DataFrame =
    df.filter(hashBucket(col(keyCol), buckets) < pct)

  /** Per-stratum rates (stratum value -> pct kept); strata not listed
    * fall back to `defaultPct`. One map-side filter — the rate lookup
    * is a CASE chain, no join.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      rates: Map[String, Int], defaultPct: Int = 0,
      buckets: Int = 100): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(col(stratumCol) === lit(s), lit(p)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), buckets) < rate)
  }

  /** Fixed-BUDGET deterministic sample: exactly n rows per stratum
    * (fewer if the stratum is smaller), chosen by md5-hash order of
    * the key with the key itself as tiebreak — the "give me 10k docs
    * per language" curation ask. Rate sampling ([[stratifiedSample]])
    * cannot hit an exact count; hash ORDER can, stays engine-portable
    * (lowercase-hex strings sort identically everywhere), and adding
    * rows to a stratum only evicts the highest-hash member — the
    * sample is stable under corpus growth, unlike any
    * random-permutation scheme.
    *
    * One exchange (the per-stratum window); with `n` small relative
    * to stratum size, a rank <= n window is exactly the
    * WindowGroupLimit shape Spark optimizes with per-partition
    * partial limits before the shuffle.
    */
  def topNPerStratum(df: DataFrame, keyCol: String, stratumCol: String,
      n: Int, rankName: String = "rank"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string")).asc, col(keyCol).asc)
    df.withColumn(rankName, row_number().over(w))
      .filter(col(rankName) <= n)
  }

  /** 32-bit stable hash value in [0, 2^32) from the row key — the
    * high-resolution sibling of [[hashBucket]] for fractional keep
    * rates finer than 1%.
    */
  def hashBucket32(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  /** Temperature-flattened domain sampling — the multilingual /
    * multi-domain mixing step of a training-data pipeline (α = 0.5
    * temperature): each domain keeps `min(1, k/√n_domain)` of its
    * rows, so kept counts grow ∝ √n — big domains are flattened
    * toward the small ones instead of drowning them, small domains
    * (n ≤ k²) pass through whole.
    *
    * Engine-portable AND hash-gateable by construction: every
    * arithmetic step is an IEEE exactly-rounded op on identical
    * operands in any engine (√ is exactly rounded; ×2^32 only moves
    * the exponent; no cross-domain normalizing SUM — a sum's
    * float result depends on aggregation order, which no engine
    * guarantees). Per-row selection is the md5 hash test, so the
    * kept set is stable under reruns, partitioning, and engine.
    *
    * Shape: a per-domain count aggregate joined back, then a map-side
    * filter. The counts side is deliberately NOT hint-broadcast: for
    * language-grade domains it is tiny and auto-broadcasts (map-side
    * filter, no corpus shuffle); for a high-cardinality domain column
    * (registered web domains at corpus scale) a forced broadcast
    * would OOM the driver, while the size-based planner falls back to
    * a shuffle join with AQE skew handling — the correct plan at both
    * scales.
    */
  def temperatureSample(df: DataFrame, keyCol: String,
      domainCol: String, k: Double): DataFrame = {
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_domain"))
    val threshold = floor(least(lit(1.0),
      lit(k) / sqrt(col("n_domain").cast("double"))) * lit(4294967296.0))
      .cast("long")
    df.join(counts, Seq(domainCol))
      .filter(hashBucket32(col(keyCol)) < threshold)
  }

  /** Leakage-safe train/val/test split: near-duplicate documents MUST
    * land in the same split — a train/test pair of near-dups leaks
    * test answers into training and inflates eval. Split assignment
    * therefore hashes the doc's duplicate-CLUSTER id (connected
    * components over the verified near-dup pairs; singletons are
    * their own cluster), never the doc id: every member of a cluster
    * shares a bucket, so a cluster can never straddle splits.
    *
    * Deterministic and engine-portable ([[hashBucket]] md5 discipline)
    * and stable under corpus growth for untouched clusters. Shape:
    * components are O(diameter) rounds over the (small)
    * pair-participant set; the corpus then left-joins that set once —
    * no other corpus shuffle.
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    val comp = Dedup.connectedComponents(pairs, "id1", "id2")
      .select(col("id"), col("component"))
    val bucket = hashBucket(col("component"))
    df.select(col(idCol))
      .join(comp, col(idCol) === col("id"), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("component"))
      .withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
  }
}

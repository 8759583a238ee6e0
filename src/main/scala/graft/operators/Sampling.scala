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
}

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
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.NativeKernels
import graft.functions.TextFns

/** Data Selection via Importance Resampling (SURVEY.md §2 H21) — the
  * hashed-n-gram importance-weighting scheme large pretraining
  * pipelines use to up-select raw text that "looks like" a target
  * corpus (quality reference, in-domain set): fit bag-of-hashed-
  * n-gram unigram/bigram models of target and raw, weight each bucket
  * by the smoothed log likelihood ratio, score every raw document as
  * the sum of its features' weights, then keep top-k (optionally with
  * seeded Gumbel noise, which makes the selection a proper sample of
  * the softmax rather than a hard argmax).
  *
  * 100-TB shape — every stage is the cheap one:
  *  - Feature extraction is map-side (one char pass per document, no
  *    intermediate gram strings — NativeKernels.dsirBuckets).
  *  - The only shuffles are two bucket-keyed count aggregations whose
  *    key space is `buckets` (default 4096) — partial aggs collapse
  *    each map task to ≤ buckets rows, so exchanges carry KBs.
  *  - The fitted model is 3 driver arrays of `buckets` doubles/longs;
  *    scoring ships them back as plan LITERALS (the IVF-centroid /
  *    PCA-projection pattern) — scoring touches no join, no shuffle,
  *    no broadcast table.
  *  - Selection is a TakeOrdered top-k, not a global sort.
  *
  * Engine-portable by construction: grams hash with the printable-
  * ASCII pair-polynomial scheme a DuckDB oracle replays bit-for-bit
  * (`curate_dsir_counts` gates the integer projection exactly; the
  * log-weighted score is libm-bound and gated at rtol 1e-9 like the
  * bigram LM).
  *
  * Reference basis: DSIR (Xie et al., NeurIPS 2023, arXiv:2302.03169)
  * — hashed n-gram features, smoothed log-ratio importance weights,
  * Gumbel-top-k resampling. Public-domain technique; no reference-
  * repo counterpart (scale addition mandated by the build brief).
  */
object Dsir {

  /** Fitted importance model: per-bucket target/raw counts and the
    * smoothed log-ratio weights (all driver-sized: 3 × `buckets`).
    */
  final case class Model(buckets: Int, alpha: Double,
      targetCounts: Array[Long], rawCounts: Array[Long],
      targetTotal: Long, rawTotal: Long) {
    /** log((cT+α)/(NT+αB)) − log((cR+α)/(NR+αB)) per bucket. */
    lazy val logRatio: Array[Double] = Array.tabulate(buckets) { b =>
      math.log((targetCounts(b) + alpha) /
          (targetTotal + alpha * buckets)) -
        math.log((rawCounts(b) + alpha) / (rawTotal + alpha * buckets))
    }
  }

  /** Per-bucket feature counts of a corpus (multiset: every unigram
    * and adjacent bigram occurrence counts). Bucket-keyed aggregation
    * with ≤ `buckets` output rows — the model-fit pass.
    */
  def featureCounts(df: DataFrame, textCol: String, buckets: Int)
      : DataFrame =
    df.select(explode(NativeKernels.dsirBucketsCol(
        TextFns.tokens(col(textCol)), buckets)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Fit the importance model from a target and a raw corpus. Two
    * corpus passes; only 2 × `buckets` longs reach the driver.
    */
  def fit(target: DataFrame, raw: DataFrame, textCol: String,
      buckets: Int = 4096, alpha: Double = 1.0): Model = {
    require(buckets > 0, s"buckets must be > 0: $buckets")
    def collectCounts(df: DataFrame): Array[Long] = {
      val arr = new Array[Long](buckets)
      featureCounts(df, textCol, buckets).collect()
        .foreach(r => arr(r.getInt(0)) = r.getLong(1))
      arr
    }
    val ct = collectCounts(target)
    val cr = collectCounts(raw)
    Model(buckets, alpha, ct, cr, ct.sum, cr.sum)
  }

  /** Monoid combine: models fit on disjoint corpus slices merge into
    * exactly the model a whole-corpus fit produces (counts are
    * integers — no float drift), which is what makes the fit
    * INCREMENTAL at scale: fit each new batch alone, merge into the
    * running model, never re-scan history. The log-ratio weights are
    * recomputed lazily from the merged counts.
    */
  def merge(a: Model, b: Model): Model = {
    require(a.buckets == b.buckets,
      s"bucket mismatch: ${a.buckets} vs ${b.buckets}")
    require(a.alpha == b.alpha, s"alpha mismatch: ${a.alpha} vs ${b.alpha}")
    Model(a.buckets, a.alpha,
      Array.tabulate(a.buckets)(i => a.targetCounts(i) + b.targetCounts(i)),
      Array.tabulate(a.buckets)(i => a.rawCounts(i) + b.rawCounts(i)),
      a.targetTotal + b.targetTotal, a.rawTotal + b.rawTotal)
  }

  /** Importance score per document: Σ logRatio(bucket(f)) over its
    * features — map-side, weights ride the plan as a literal.
    */
  def score(df: DataFrame, idCol: String, textCol: String, m: Model)
      : DataFrame =
    df.select(col(idCol),
      NativeKernels.dsirSumDoubleCol(TextFns.tokens(col(textCol)),
        typedLit(m.logRatio.toSeq), m.buckets).as("dsir_score"))

  /** Integer projection of [[score]]: per document, the summed
    * target-corpus and raw-corpus bucket counts of its features plus
    * the feature count — the exact-arithmetic face of the same
    * pipeline (hash → bucket → literal-table lookup → sum), which a
    * DuckDB oracle matches bit-for-bit where the log-weighted score
    * can only match to rtol.
    */
  def countSums(df: DataFrame, idCol: String, textCol: String, m: Model)
      : DataFrame = {
    val toks = TextFns.tokens(col(textCol))
    df.select(col(idCol),
      greatest(size(toks) * 2 - 1, lit(0)).cast("long").as("n_features"),
      NativeKernels.dsirSumLongCol(toks,
        typedLit(m.targetCounts.toSeq), m.buckets).as("sum_target"),
      NativeKernels.dsirSumLongCol(toks,
        typedLit(m.rawCounts.toSeq), m.buckets).as("sum_raw"))
  }

  /** Keep the `k` highest-scoring documents. `temperature = 0` is the
    * deterministic argmax top-k (ties broken by id); `temperature > 0`
    * adds seeded Gumbel noise scaled by it — the Gumbel-top-k trick:
    * the selection is then a true sample WITHOUT replacement from the
    * softmax(score/T) distribution, yet still deterministic given
    * `seed` and embarrassingly parallel (noise is a pure hash of the
    * id; selection stays a TakeOrdered).
    */
  def resample(df: DataFrame, idCol: String, textCol: String, m: Model,
      k: Int, temperature: Double = 0.0, seed: Long = 42L): DataFrame = {
    require(temperature >= 0, s"temperature must be >= 0: $temperature")
    val scored = score(df, idCol, textCol, m)
    val key =
      if (temperature == 0.0) col("dsir_score")
      else {
        // u in (0,1) from the id hash (never exactly 0 or 1), then
        // standard Gumbel(0,1) = -ln(-ln u)
        val u = (pmod(xxhash64(col(idCol), lit(seed)), lit(1L << 52))
          .cast("double") + lit(0.5)) / lit((1L << 52).toDouble)
        col("dsir_score") / lit(temperature) - log(-log(u))
      }
    scored.withColumn("_dsir_key", key)
      .orderBy(col("_dsir_key").desc, col(idCol))
      .limit(k)
      .drop("_dsir_key")
  }
}

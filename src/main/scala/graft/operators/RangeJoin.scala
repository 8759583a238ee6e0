package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join (SURVEY.md §2 F12): `point BETWEEN lo AND hi`
  * joins as an EQUI-join instead of the nested loop Spark plans for
  * bare range predicates.
  *
  * Spark's planner has no shuffle strategy for a pure range
  * predicate: without an equality conjunct it falls back to
  * BroadcastNestedLoopJoin (or a cartesian product) — O(|L|·|R|)
  * compares and a broadcast of a whole side, the classic at-scale
  * cliff (Databricks ships a dedicated range-join hint for exactly
  * this). The bucketing trick makes the join shuffleable: pick a
  * bucket width w, replicate each interval to every w-bucket it
  * covers (`explode(sequence(...))`, map-side), key each point by its
  * single bucket, equi-join on the bucket (plus any extra equi keys),
  * and re-verify the exact predicate. Each (point, interval) pair
  * meets in EXACTLY ONE bucket — the point's — so no dedup pass is
  * needed. Cost: |R| inflates by ~(interval span / w); shuffles hash
  * on the bucket key; the verify is a codegen filter. Choose w near
  * the TYPICAL interval length: replication stays O(1) per interval
  * while each bucket's candidate set stays local.
  *
  * Degenerate intervals (empty under the chosen bound semantics) are
  * dropped before the explode; an interval spanning more than
  * `maxBucketsPerInterval` buckets raises rather than silently
  * inflating the exchange (the dial mirrors MinHashLsh's maxBucket
  * stop-bucket contract).
  */
object RangeJoin {

  /** Inner range join: rows of `left` paired with the rows of `right`
    * whose [lo, hi) interval contains `left.pointCol` (hi inclusive
    * when `hiInclusive`). `equiKeys` are additional equality columns
    * (present on both sides) that ride the bucket key in one shuffle.
    * Point/lo/hi must be numeric (cast timestamps upstream, e.g.
    * `unix_micros`).
    */
  def bucketed(left: DataFrame, pointCol: String, right: DataFrame,
      loCol: String, hiCol: String, bucketWidth: Double,
      equiKeys: Seq[String] = Nil, hiInclusive: Boolean = false,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0: $bucketWidth")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be > 0: $maxBucketsPerInterval")
    val b = "_rj_bucket"
    val keep =
      if (hiInclusive) col(loCol) <= col(hiCol)
      else col(loCol) < col(hiCol)
    val bLo = floor(col(loCol) / bucketWidth).cast("long")
    val bHi = floor(col(hiCol) / bucketWidth).cast("long")
    // refuse runaway replication IN the plan (no extra pass): the
    // error carries the offending span
    val bHiGuarded = when(bHi - bLo >= maxBucketsPerInterval,
      raise_error(concat(
        lit(s"range join: an interval spans >= $maxBucketsPerInterval" +
          s" buckets of width $bucketWidth ([")
        , col(loCol), lit(", "), col(hiCol),
        lit("]); widen bucketWidth or split the interval")))
        .cast("long"))
      .otherwise(bHi)
    val rightB = right.where(keep)
      .withColumn(b, explode(sequence(bLo, bHiGuarded)))
    val leftB = left.withColumn(b,
      floor(col(pointCol) / bucketWidth).cast("long"))
    val verify =
      if (hiInclusive)
        col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol)
      else col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol)
    leftB.join(rightB, b +: equiKeys).where(verify).drop(b)
  }

  /** LEFT OUTER [[bucketed]]: points matching no interval survive
    * with null interval columns (the enrichment form — "which tariff
    * band does this trip fall in, if any"). `leftId` must be a UNIQUE
    * left column: the unmatched side is recovered with a keys-only
    * anti join against the matched ids (broadcast-friendly — matched
    * ids are a projection, never the payload), so the operator stays
    * two equi-joins with no nested loop.
    */
  def bucketedLeftOuter(left: DataFrame, leftId: String,
      pointCol: String, right: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double, equiKeys: Seq[String] = Nil,
      hiInclusive: Boolean = false,
      maxBucketsPerInterval: Int = 4096): DataFrame = {
    val inner = bucketed(left, pointCol, right, loCol, hiCol,
      bucketWidth, equiKeys, hiInclusive, maxBucketsPerInterval)
    val rightOnly = right.columns.filterNot(c =>
      left.columns.contains(c) || equiKeys.contains(c))
    val unmatched = left
      .join(inner.select(col(leftId)).distinct(), Seq(leftId),
        "left_anti")
    val withNulls = rightOnly.foldLeft(unmatched) { (d, c) =>
      d.withColumn(c,
        lit(null).cast(right.schema(c).dataType))
    }
    inner.unionByName(withNulls, allowMissingColumns = true)
  }

  /** Reference form for specs: the nested-loop the operator replaces. */
  private[graft] def reference(left: DataFrame, pointCol: String,
      right: DataFrame, loCol: String, hiCol: String,
      equiKeys: Seq[String] = Nil, hiInclusive: Boolean = false)
      : DataFrame = {
    val verify =
      if (hiInclusive)
        col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol)
      else col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol)
    if (equiKeys.isEmpty) left.crossJoin(right).where(verify)
    else left.join(right, equiKeys).where(verify)
  }
}

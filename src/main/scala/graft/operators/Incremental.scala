package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental (additive) aggregate maintenance — the pattern that
  * keeps a 100-TB gold table fresh without full recompute: each new
  * batch aggregates to PARTIAL state (decimal sums + counts), partials
  * merge by re-aggregation, and presentation casts happen only at
  * finalize time.
  *
  * Exactness is load-bearing and comes from the engine's decimal
  * routing: decimal addition is associative and order-independent, so
  * `finalize(merge(partial(A), partial(B))) == finalize(partial(A ∪ B))`
  * BIT-FOR-BIT — which the `gold_incremental_profile` gate proves
  * against a full-recompute DuckDB oracle. Had partials carried
  * doubles, re-aggregation would drift in the last ulps and
  * incremental results would diverge from recompute.
  *
  * Scale notes: `partialSums` is one map-side-combined aggregation of
  * the batch; `merge` shuffles only aggregated rows (group
  * cardinality, not fact rows); `finalize` is a projection. This is
  * also the merge shape for combining per-cluster or per-day partial
  * results computed independently.
  */
object Incremental {

  /** Partial state for additive measures: decimal sum + row count per
    * key. `measures` maps output-column base names to input columns.
    */
  def partialSums(df: DataFrame, keys: Seq[String],
      measures: Map[String, Column]): DataFrame = {
    val aggs = measures.toSeq.map { case (name, c) =>
      sum(c.cast(DecimalType(18, 4))).as(s"${name}_dec")
    } :+ count(lit(1)).as("n_rows")
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge partial states by re-aggregation (exact for decimals).
    * The summed measures cast back to the `partialSums` state type
    * (decimal(28,4)) so the state schema is a FIXED POINT under
    * merging — without it every incremental generation widens the
    * precision (28 → 38 → refusal), and a lake-persisted state
    * ([[graft.lakehouse.Materialized]]) would hit the manifest's
    * type-evolution guard on its second refresh. The cast is exact
    * for any value a (28,4) recompute could produce.
    */
  def merge(parts: Seq[DataFrame], keys: Seq[String],
      measureNames: Seq[String]): DataFrame = {
    val aggs = measureNames.map(n =>
      sum(col(s"${n}_dec")).cast(DecimalType(28, 4)).as(s"${n}_dec")) :+
      sum(col("n_rows")).as("n_rows")
    parts.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Presentation form: decimal state → double measures. */
  def finalize(state: DataFrame, measureNames: Seq[String]): DataFrame =
    measureNames.foldLeft(state) { case (df, n) =>
      df.withColumn(n, col(s"${n}_dec").cast("double"))
        .drop(s"${n}_dec")
    }

  /** Partial state of a CDC delta ([[graft.sources.AtomicLake
    * .readChanges]] output): `insert` rows add, `delete` rows RETRACT
    * — sums carry the negated decimal (same precision/scale as
    * [[partialSums]], so states union cleanly), row counts a signed
    * ±1. Decimal negation and addition are exact, so applying a
    * delta preserves the incremental == full-recompute bit-for-bit
    * contract across partition REPLACEMENTS, not just appends.
    */
  def partialDelta(changes: DataFrame, keys: Seq[String],
      measures: Map[String, Column],
      changeTypeCol: String = "_change_type"): DataFrame = {
    val insert = col(changeTypeCol) === "insert"
    val aggs = measures.toSeq.map { case (name, c) =>
      val d = c.cast(DecimalType(18, 4))
      sum(when(insert, d).otherwise(-d)).as(s"${name}_dec")
    } :+ sum(when(insert, 1L).otherwise(-1L)).as("n_rows")
    changes.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Roll a CDC delta into an existing partial state. Groups whose
    * every row was retracted net to n_rows = 0 and are dropped — the
    * same absence a full recompute produces.
    */
  def applyChanges(state: DataFrame, changes: DataFrame,
      keys: Seq[String], measures: Map[String, Column]): DataFrame =
    merge(Seq(state, partialDelta(changes, keys, measures)),
      keys, measures.keys.toSeq)
      .filter(col("n_rows") > 0)
}

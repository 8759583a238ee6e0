package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — for each left row, the single right row
  * with the greatest `rightTs` at-or-before (`inclusive`) or strictly
  * before `leftTs` within the same key. Spark has no built-in as-of
  * join; the naive `l.ts >= r.ts` range join explodes to all
  * qualifying pairs before a per-row argmax prunes them.
  *
  * This is the scalable single-pass formulation: union both sides,
  * shuffle ONCE by key, sort within partitions by (ts, side-tag), and
  * carry the latest right payload forward with a running
  * `last(ignoreNulls)` window. No range explosion, no per-key state
  * beyond the sort — the same plan shape a stream-stream temporal join
  * compiles to, and it survives 100 TB because the only exchange is
  * the key hash shuffle both inputs need anyway. Heavily skewed keys
  * inherit the usual remedies (AQE skew split handles the sort spill;
  * the window itself is a sequential scan per key).
  *
  * Contract: `right` must be unique per (key, ts) — pre-aggregate it
  * otherwise (ties would make "the" latest row nondeterministic).
  */
object AsOfJoin {

  /** Left as-of join. The result carries every left column plus
    * `matchedTsName` (the matching right timestamp, null when none)
    * and the requested right `payload` columns (null when none).
    */
  def asOf(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      payload: Seq[String],
      matchedTsName: String = "matched_ts",
      inclusive: Boolean = true): DataFrame =
    impl(left, right, leftKey, rightKey, leftTs, rightTs, payload,
      matchedTsName, inclusive, forward = false)

  /** FORWARD as-of join: for each left row, the single right row with
    * the SMALLEST `rightTs` at-or-after (`inclusive`) or strictly
    * after `leftTs` within the key — the "next reading/next price"
    * lookup (backfill against the following calibration, next-event
    * attribution). Same one-shuffle carry-forward plan: the window
    * just scans time DESCENDING, so "latest seen" is the nearest
    * following right row.
    */
  def asOfForward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      payload: Seq[String],
      matchedTsName: String = "matched_ts",
      inclusive: Boolean = true): DataFrame =
    impl(left, right, leftKey, rightKey, leftTs, rightTs, payload,
      matchedTsName, inclusive, forward = true)

  private def impl(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      payload: Seq[String],
      matchedTsName: String,
      inclusive: Boolean, forward: Boolean): DataFrame = {
    // at equal ts the right row must be visible to the left row only
    // for inclusive semantics: sort it first (tag 0) when inclusive,
    // after the left row (tag 1) when strict.
    val (leftTag, rightTag) = if (inclusive) (1, 0) else (0, 1)

    val payStruct = struct(
      col(rightTs).as(matchedTsName) +: payload.map(col): _*)
    val payType = right.select(payStruct).schema.head.dataType
    val lrowType = left.select(struct(left.columns.map(col): _*))
      .schema.head.dataType

    val l2 = left.select(
      col(leftKey).as("__key"), col(leftTs).as("__ts"),
      lit(leftTag).as("__tag"),
      struct(left.columns.map(col): _*).as("__lrow"),
      lit(null).cast(payType).as("__pay"))
    val r2 = right.select(
      col(rightKey).as("__key"), col(rightTs).as("__ts"),
      lit(rightTag).as("__tag"),
      lit(null).cast(lrowType).as("__lrow"),
      payStruct.as("__pay"))

    // forward scans time descending: the most recently seen right row
    // is then the nearest FOLLOWING one; the tag tiebreak is direction-
    // independent (right first at equal ts iff inclusive)
    val w = Window.partitionBy(col("__key"))
      .orderBy(
        (if (forward) col("__ts").desc else col("__ts").asc),
        col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val outCols: Seq[Column] =
      left.columns.map(c => col(s"__lrow.$c").as(c)).toSeq ++
        (matchedTsName +: payload).map(c => col(s"__match.$c").as(c))

    l2.unionByName(r2)
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__tag") === lit(leftTag))
      .select(outCols: _*)
  }
}

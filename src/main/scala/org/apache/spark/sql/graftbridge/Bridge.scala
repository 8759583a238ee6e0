package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column↔Expression
  * converters (Spark 4 wraps Columns in ColumnNodes; building a Column
  * from a raw Catalyst `Expression` — needed to attach
  * [[graft.expressions.NativeKernels]] via StaticInvoke — goes through
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * package-private). This object lives under `org.apache.spark.sql`
  * purely for access; it adds no behavior.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly convert a Column tree to a catalyst Expression
    * (UnresolvedFunction nodes and all). `expression` wraps lazily in
    * a ColumnNodeExpression, which the analyzer only unwraps when the
    * column flows through a DataFrame operation — a SQL
    * FunctionBuilder needs the real tree immediately.
    */
  def toExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Re-plan a batch DataFrame as the micro-batch of a V1 streaming
    * Source: flip every file-scan leaf to `isStreaming = true` —
    * exactly what `FileStreamSource.getBatch` does with
    * `LogicalRelation(relation, isStreaming = true)` — so
    * MicroBatchExecution accepts the plan returned by `getBatch`.
    */
  def asStreamingBatch(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val plan = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation if !lr.isStreaming =>
        lr.copy(isStreaming = true)
      case lr: LocalRelation if !lr.isStreaming => // empty micro-batch
        lr.copy(isStreaming = true)
    }
    org.apache.spark.sql.classic.Dataset.ofRows(
      df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan)
  }
}

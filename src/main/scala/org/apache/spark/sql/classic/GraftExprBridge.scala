package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column → Catalyst conversion.
  *
  * Spark 4 moved `Column` to a backend-agnostic node tree (sql-api)
  * and made the classic converter package-private; lake layers that
  * must REASON about a user predicate driver-side (graft's manifest
  * zone-map pruning, [[graft.sources.LakeStats]]) still need the
  * Catalyst expression. Same package-shim pattern Delta Lake uses for
  * its file-skipping translation. Scope: this ONE function — all
  * other Spark use stays on the public API.
  */
object GraftExprBridge {

  /** The Column's Catalyst tree with single-part builtin function
    * calls resolved to their concrete expressions (the node converter
    * leaves `a >= b` as `UnresolvedFunction(">=", ...)`; the zone-map
    * evaluator needs the typed `GreaterThanOrEqual`). Anything the
    * builtin registry can't resolve stays unresolved — the evaluator
    * treats unknown shapes as unprunable, so this is safe by
    * construction.
    */
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node).transformUp {
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.lengthCompare(1) == 0 && !f.isDistinct =>
        try org.apache.spark.sql.catalyst.analysis.FunctionRegistry
          .builtin.lookupFunction(
            org.apache.spark.sql.catalyst.FunctionIdentifier(
              f.nameParts.head.toLowerCase(java.util.Locale.ROOT)),
            f.arguments)
        catch { case scala.util.control.NonFatal(_) => f }
    }
}

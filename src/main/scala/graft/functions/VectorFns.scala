package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector arithmetic over `array<float>` embedding columns (SURVEY.md
  * §2 E5/E6).
  *
  * Dot products fold strictly left-to-right over the zipped arrays
  * (`aggregate(zip_with(...))`), so the double-addition sequence — and
  * therefore the result, bit-for-bit — is identical in any engine that
  * folds a list in order. float→double conversion is exact; each
  * multiply/add is one correctly-rounded IEEE op.
  *
  * These run as Catalyst higher-order functions (interpreted per
  * element, not whole-stage codegen'd); for hot 100-TB scoring paths a
  * native `Expression` with `doGenCode` over the underlying
  * ArrayData would be the next optimization — semantics stay as
  * defined here.
  */
object VectorFns {

  /** Ordered-fold dot product of two equal-length float arrays —
    * native kernel ([[graft.expressions.NativeKernels.dotFloat]]):
    * the same left-to-right addition sequence as [[dotReference]]
    * (spec-gated parity; `ann_topk` also hash-matches DuckDB through
    * this path) in one tight JVM loop.
    */
  def dot(a: Column, b: Column): Column =
    graft.expressions.NativeKernels.dotFloatCol(a, b)

  /** Declarative reference form of [[dot]]. */
  def dotReference(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Euclidean norm via the same ordered fold. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity given precomputed norms (norms are per-row
    * invariants — compute once, not per pair).
    */
  def cosine(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)

  /** Squared Euclidean distance — the IVF coarse-quantizer metric. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
}

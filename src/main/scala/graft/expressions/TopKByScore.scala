package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k accumulator: the k best (score, id) pairs under the
  * total order (score DESC, id ASC), kept sorted best-first. O(k)
  * memory per aggregation key no matter how many rows a key sees —
  * the per-QUERY analogue of [[BoundedLongs]]' df cap.
  *
  * Ordering parity with a `row_number() OVER (ORDER BY score DESC,
  * id ASC)` window (the form this aggregate replaces, r16): doubles
  * compare via `java.lang.Double.compare` — NaN sorts as the largest
  * value, exactly Spark SQL's double ordering — except that -0.0 is
  * normalized to 0.0 on insert (Spark's sort treats them equal and
  * falls through to the id tiebreak; `Double.compare` alone would
  * rank 0.0 before -0.0).
  */
final class TopKBuf(val k: Int) {
  var scores: Array[Double] = new Array[Double](math.min(k, 16).max(1))
  var ids: Array[Long] = new Array[Long](math.min(k, 16).max(1))
  var n: Int = 0

  @inline private def before(s1: Double, id1: Long, s2: Double,
      id2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && id1 < id2)
  }

  def insert(s0: Double, id: Long): Unit = {
    val s = if (s0 == 0.0) 0.0 else s0 // normalize -0.0 (see header)
    if (n == k && !before(s, id, scores(n - 1), ids(n - 1))) return
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (before(scores(mid), ids(mid), s, id)) lo = mid + 1 else hi = mid
    }
    val m = math.min(n + 1, k)
    if (m > scores.length) grow(m)
    System.arraycopy(scores, lo, scores, lo + 1, m - 1 - lo)
    System.arraycopy(ids, lo, ids, lo + 1, m - 1 - lo)
    scores(lo) = s
    ids(lo) = id
    n = m
  }

  /** Merge a (sorted, best-first) other buffer: stop at the first
    * element that cannot enter — everything after it is worse.
    */
  def mergeFrom(o: TopKBuf): Unit = {
    var i = 0
    while (i < o.n) {
      if (n == k && !before(o.scores(i), o.ids(i), scores(n - 1),
          ids(n - 1))) return
      insert(o.scores(i), o.ids(i))
      i += 1
    }
  }

  private def grow(min: Int): Unit = {
    val cap = math.min(k.toLong,
      math.max(scores.length * 2L, min.toLong)).toInt
    scores = java.util.Arrays.copyOf(scores, cap)
    ids = java.util.Arrays.copyOf(ids, cap)
  }
}

/** Aggregate: the top-k (score, id) pairs per group as a sorted
  * array<struct<score double, id bigint>> (best first — element i is
  * rank i+1). Replaces the ANN ranking windows (r16): where
  * `row_number() OVER (PARTITION BY query ORDER BY …) <= k` sorts
  * every candidate row (locally for the partial group-limit, again
  * after the exchange) and buffers whole groups in WindowExec, this
  * is ONE hash aggregation whose partial (map-side) state is k pairs
  * per query — the exchange carries ≤ k rows per (query, map task)
  * instead of every candidate, nothing is ever sorted but the k-row
  * buffers themselves, and a degenerate query with 10^8 candidates
  * costs 16·k bytes of memory, not a spilling sort.
  *
  * Null inputs are skipped (the ANN score expressions are total —
  * never null on non-null vectors; ids are primary keys).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] with BinaryLike[Expression] {

  require(k > 0, s"k must be > 0: $k")

  override def left: Expression = score
  override def right: Expression = id

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(b: TopKBuf, input: InternalRow): TopKBuf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuf, o: TopKBuf): TopKBuf = {
    b.mergeFrom(o)
    b
  }

  override def eval(b: TopKBuf): Any =
    new GenericArrayData(Array.tabulate[Any](b.n)(i =>
      new GenericInternalRow(Array[Any](b.scores(i), b.ids(i)))))

  override def serialize(b: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * b.n)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) {
      bb.putDouble(b.scores(i))
      bb.putLong(b.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val b = new TopKBuf(k)
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    b.scores = new Array[Double](math.max(n, 1))
    b.ids = new Array[Long](math.max(n, 1))
    var i = 0
    while (i < n) {
      b.scores(i) = bb.getDouble
      b.ids(i) = bb.getLong
      i += 1
    }
    b.n = n
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): TopKByScore = copy(score = l, id = r)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_k_by_score"
}

object TopKByScore {
  /** Column form of [[TopKByScore]]. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKByScore(Bridge.toExpression(score),
      Bridge.toExpression(id), k).toAggregateExpression())
}
